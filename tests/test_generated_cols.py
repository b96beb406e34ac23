"""Generated columns in the snapshot log (snapshot_write
generated_cols): compute-on-absent, validate-on-present, table-level
inheritance, derived-partition pruning, compaction carry."""

from __future__ import annotations

import tempfile

import pytest
from pyspark.sql import functions as F

from harmony_energy_data_pipeline_spark.sinks import snapshots as snap
from harmony_energy_data_pipeline_spark.sinks.snapshots import (
    ConstraintViolationError,
)


def _tmp():
    return tempfile.mkdtemp(prefix="gen_") + "/t"


def _df(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id").alias("k"),
        (
            F.to_timestamp(F.lit("2024-01-01 00:00:00"))
            + F.make_interval(hours=(F.col("id") % 96).cast("int"))
        ).alias("ts"),
    )


SPEC = {"day": "CAST(ts AS DATE)"}


def test_compute_on_absent_and_inherit(spark):
    t = _tmp()
    snap.snapshot_write(_df(spark, 0, 50), t, generated_cols=SPEC)
    got = snap.read_snapshot(spark, t)
    assert "day" in got.columns
    assert got.filter(
        ~F.col("day").eqNullSafe(F.expr("CAST(ts AS DATE)"))
    ).count() == 0
    # append WITHOUT the column: inherited spec computes it
    snap.snapshot_write(_df(spark, 50, 60), t, mode="append")
    assert snap.read_snapshot(spark, t).filter(
        F.col("day").isNull()
    ).count() == 0
    m = snap._read_manifest(t, snap.latest_version(t))
    assert m["generated_cols"] == SPEC


def test_validate_on_present(spark):
    t = _tmp()
    snap.snapshot_write(_df(spark, 0, 10), t, generated_cols=SPEC)
    good = _df(spark, 10, 20).withColumn("day", F.expr("CAST(ts AS DATE)"))
    snap.snapshot_write(good, t, mode="append")  # matches: accepted
    bad = _df(spark, 20, 30).withColumn(
        "day", F.expr("DATE'1999-01-01'")
    )
    with pytest.raises(ConstraintViolationError, match="generated day"):
        snap.snapshot_write(bad, t, mode="append")
    # nothing committed by the failed append
    assert snap.read_snapshot(spark, t).count() == 20


def test_conflicting_append_spec_raises(spark):
    t = _tmp()
    snap.snapshot_write(_df(spark, 0, 10), t, generated_cols=SPEC)
    with pytest.raises(ValueError, match="generated columns"):
        snap.snapshot_write(
            _df(spark, 10, 20), t, mode="append",
            generated_cols={"day": "date_add(CAST(ts AS DATE), 1)"},
        )


def test_derived_partition_prunes(spark):
    t = _tmp()
    snap.snapshot_write(
        _df(spark, 0, 200), t, generated_cols=SPEC,
        partition_by=["day"],
    )
    import datetime as dt

    d = dt.date(2024, 1, 2)
    kept, total = snap.prune_files(t, [("day", d, d)])
    assert 0 < len(kept) < total
    got = snap.read_snapshot(spark, t, where=[("day", d, d)])
    assert got.count() == 48  # 96 hourly slots over 4 days, 2 cycles+
    assert got.select("day").distinct().collect()[0][0] == d


def test_compact_carries_spec(spark):
    t = _tmp()
    snap.snapshot_write(_df(spark, 0, 100), t, generated_cols=SPEC,
                        partition_by=["day"])
    snap.snapshot_compact(spark, t, target_file_mb=1)
    m = snap._read_manifest(t, snap.latest_version(t))
    assert m["generated_cols"] == SPEC
    # appends after compaction still compute
    snap.snapshot_write(_df(spark, 100, 110), t, mode="append")
    assert snap.read_snapshot(spark, t).filter(
        F.col("day").isNull()
    ).count() == 0


def test_rename_guards(spark):
    t = _tmp()
    snap.snapshot_write(_df(spark, 0, 10), t, generated_cols=SPEC)
    with pytest.raises(ValueError, match="generated column"):
        snap.snapshot_rename_column(t, "day", "d2")
    with pytest.raises(ValueError, match="referenced by generated"):
        snap.snapshot_rename_column(t, "ts", "event_ts")
    snap.snapshot_rename_column(t, "k", "key")  # unrelated: fine
