"""Schema evolution through the snapshot log: add-column appends,
null backfill for old files, type-conflict refusal, evolved reads
through CDC/compact/restore."""
from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from harmony_energy_data_pipeline_spark.sinks import snapshots as snap


def _v1(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("a")
    )


def _v2(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id").alias("k"),
        (F.col("id") * 2).alias("a"),
        F.concat(F.lit("x"), F.col("id").cast("string")).alias("b"),
    )


def test_add_column_append_backfills_null(spark, tmp_path):
    path = str(tmp_path / "t")
    snap.snapshot_write(_v1(spark, 0, 5), path)
    snap.snapshot_write(_v2(spark, 5, 8), path, mode="append")
    df = snap.read_snapshot(spark, path)
    assert df.columns == ["k", "a", "b"]  # stable union order
    rows = {r.k: (r.a, r.b) for r in df.collect()}
    assert len(rows) == 8
    assert rows[0] == (0, None)  # old file: new column reads null
    assert rows[7] == (14, "x7")


def test_missing_column_append_keeps_table_column(spark, tmp_path):
    path = str(tmp_path / "t")
    snap.snapshot_write(_v2(spark, 0, 5), path)
    snap.snapshot_write(_v1(spark, 5, 8), path, mode="append")
    df = snap.read_snapshot(spark, path)
    assert df.columns == ["k", "a", "b"]
    rows = {r.k: r.b for r in df.collect()}
    assert rows[0] == "x0" and rows[7] is None


def test_type_conflict_refused(spark, tmp_path):
    path = str(tmp_path / "t")
    snap.snapshot_write(_v1(spark, 0, 5), path)
    bad = spark.range(5, 8).select(
        F.col("id").alias("k"), F.col("id").cast("string").alias("a")
    )
    with pytest.raises(snap.SchemaEvolutionError, match="'a'"):
        snap.snapshot_write(bad, path, mode="append")
    # nothing committed
    assert snap.latest_version(path) == 0


def test_time_travel_sees_pre_evolution_schema(spark, tmp_path):
    path = str(tmp_path / "t")
    snap.snapshot_write(_v1(spark, 0, 5), path)
    snap.snapshot_write(_v2(spark, 5, 8), path, mode="append")
    assert snap.read_snapshot(spark, path, 0).columns == ["k", "a"]
    assert snap.read_snapshot(spark, path, 1).columns == ["k", "a", "b"]


def test_cdc_and_compact_read_evolved_schema(spark, tmp_path):
    path = str(tmp_path / "t")
    snap.snapshot_write(_v1(spark, 0, 5), path)
    snap.snapshot_write(_v2(spark, 5, 8), path, mode="append")
    delta = snap.read_snapshot_changes(spark, path, 0, 1)
    assert delta.columns == ["k", "a", "b"]
    assert sorted(r.k for r in delta.collect()) == [5, 6, 7]
    v = snap.snapshot_compact(spark, path, target_file_mb=1)
    df = snap.read_snapshot(spark, path, v)
    assert df.columns == ["k", "a", "b"] and df.count() == 8
    # restore to the evolved append: schema comes along
    snap.snapshot_restore(path, 1)
    assert snap.read_snapshot(spark, path).columns == ["k", "a", "b"]


def test_untracked_parent_poisons_schema_tracking(spark, tmp_path):
    """Appending onto a manifest with no recorded schema must not
    claim the batch schema for the parent's files (their extra
    columns would silently vanish)."""
    import json
    import os

    path = str(tmp_path / "t")
    snap.snapshot_write(_v2(spark, 0, 5), path)
    # simulate a legacy manifest: strip the schema key
    mp = os.path.join(path, "_snapshots", f"v{0:012d}.json")
    m = json.load(open(mp))
    del m["schema"]
    os.remove(mp)
    json.dump(m, open(mp, "w"))
    snap.snapshot_write(_v1(spark, 5, 8), path, mode="append")
    m1 = json.load(open(os.path.join(path, "_snapshots", f"v{1:012d}.json")))
    assert "schema" not in m1
