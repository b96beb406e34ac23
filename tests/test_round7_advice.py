"""Round-7 advisory regression tests: NULL semantics in row-level
rewrites, IVM NULL-key merge, WAP constraint validation, HLL NULL
filtering."""
from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from harmony_energy_data_pipeline_spark.operators import analytics as an
from harmony_energy_data_pipeline_spark.pipeline import ivm
from harmony_energy_data_pipeline_spark.sinks import snapshots as snap


def _nullable_table(spark, path):
    """1000 rows plus 10 with NULL ts, co-located so every file holds
    some NULL-ts rows (the dangerous layout for a ts-predicate
    rewrite)."""
    base = spark.range(0, 1000).select(
        F.col("id").alias("k"), F.col("id").cast("long").alias("ts")
    )
    nulls = spark.range(0, 10).select(
        (F.col("id") + 10_000).alias("k"), F.lit(None).cast("long").alias("ts")
    )
    snap.snapshot_write(
        base.unionByName(nulls).repartition(4), path, stats_cols=["ts"]
    )


def test_delete_where_keeps_null_predicate_rows(spark, tmp_path):
    path = str(tmp_path / "t")
    _nullable_table(spark, path)
    snap.snapshot_delete_where(spark, path, [("ts", 100, 199)])
    rows = snap.read_snapshot(spark, path).collect()
    ks = sorted(r.k for r in rows)
    # deleted window gone, NULL-ts rows SURVIVE (SQL DELETE keeps
    # rows where the predicate is NULL)
    assert [k for k in ks if k < 10_000] == [
        k for k in range(1000) if not (100 <= k <= 199)
    ]
    assert [k for k in ks if k >= 10_000] == list(range(10_000, 10_010))


def test_update_where_leaves_null_predicate_rows_untouched(spark, tmp_path):
    path = str(tmp_path / "t")
    _nullable_table(spark, path)
    snap.snapshot_update_where(
        spark, path, [("ts", 0, 49)], {"ts": F.lit(-1).cast("long")}
    )
    rows = {r.k: r.ts for r in snap.read_snapshot(spark, path).collect()}
    assert len(rows) == 1010
    assert all(rows[k] == -1 for k in range(50))
    assert all(rows[k] is None for k in range(10_000, 10_010))
    assert rows[999] == 999


def test_ivm_null_key_group_merges_not_splits(spark, tmp_path):
    src, view = str(tmp_path / "src"), str(tmp_path / "view")

    def batch(n):
        return spark.range(0, n).select(
            F.when(F.col("id") % 3 == 0, None)
            .otherwise(F.col("id") % 2)
            .cast("long")
            .alias("g"),
            F.col("id").alias("v"),
        )

    snap.snapshot_write(batch(30), src)
    ivm.refresh_agg_view(spark, src, view, ["g"], ["v"])
    snap.snapshot_write(batch(20), src, mode="append")
    ivm.refresh_agg_view(spark, src, view, ["g"], ["v"])
    got = {
        r.g: (r.n, r.sum_v)
        for r in ivm.read_view(spark, view).collect()
    }
    # recompute ground truth: groupBy folds ALL NULL keys together
    exp = {
        r.g: (r.n, r.sum_v)
        for r in snap.read_snapshot(spark, src)
        .groupBy("g")
        .agg(F.count("*").alias("n"), F.sum("v").alias("sum_v"))
        .collect()
    }
    assert got == exp
    assert None in got  # exactly ONE row for the NULL-key group
    assert len(got) == 3


def test_wap_append_validates_parent_constraints(spark, tmp_path):
    path = str(tmp_path / "t")
    ok = spark.range(0, 100).select(F.col("id").alias("v"))
    snap.snapshot_write(ok, path, constraints=["v >= 0"])
    bad = spark.range(0, 10).select((F.col("id") - 5).alias("v"))
    with pytest.raises(snap.ConstraintViolationError):
        snap.snapshot_write_audited(
            bad, path, audits={"nonempty": lambda d: d.count() > 0},
            mode="append",
        )
    # nothing published, constraints still declared
    assert snap.latest_version(path) == 0
    m = snap._read_manifest(path, 0)
    assert m["constraints"] == ["v >= 0"]
    # a clean audited append still goes through
    v = snap.snapshot_write_audited(
        ok, path, audits={"nonempty": lambda d: d.count() > 0},
        mode="append",
    )
    assert v == 1
    assert snap._read_manifest(path, 1)["constraints"] == ["v >= 0"]


def test_hll_ignores_nulls(spark):
    vals = spark.range(0, 500).select(F.col("id").cast("string").alias("s"))
    with_nulls = vals.unionByName(
        spark.range(0, 200).select(F.lit(None).cast("string").alias("s"))
    )
    clean = an.hll_estimate(an.hll_registers(vals, "s")).first()
    dirty = an.hll_estimate(an.hll_registers(with_nulls, "s")).first()
    assert clean == dirty  # NULLs contribute nothing to the sketch
