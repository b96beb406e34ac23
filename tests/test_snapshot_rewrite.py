"""Row-level DELETE/UPDATE scoped to affected files: content
exactness, untouched-file carry, metadata upkeep, no-op proofs."""
from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from harmony_energy_data_pipeline_spark.sinks import snapshots as snap


def _table(spark, path):
    df = spark.range(0, 1000).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("v")
    )
    snap.snapshot_write(
        df.repartitionByRange(8, "k").sortWithinPartitions("k"),
        path, stats_cols=["k"],
    )


def test_delete_rewrites_only_affected_files(spark, tmp_path):
    path = str(tmp_path / "t")
    _table(spark, path)
    m0 = snap._read_manifest(path, 0)
    v = snap.snapshot_delete_where(spark, path, [("k", 100, 199)])
    assert v == 1
    m1 = snap._read_manifest(path, 1)
    # untouched files carried byte-identically (same relative paths)
    carried = set(m0["files"]) & set(m1["files"])
    assert m1["rewrite"]["carried_files"] == len(carried) >= 6
    assert m1["rewrite"]["rewritten_files"] <= 2
    # content = everything but the deleted window
    got = sorted(r.k for r in snap.read_snapshot(spark, path).collect())
    assert got == [k for k in range(1000) if not (100 <= k <= 199)]
    # zone maps stay correct: pruned read over the new version
    pr = snap.read_snapshot(spark, path, where=[("k", 0, 99)])
    assert pr.count() == 100


def test_update_changes_only_matching_rows(spark, tmp_path):
    path = str(tmp_path / "t")
    _table(spark, path)
    snap.snapshot_update_where(
        spark, path, [("k", 500, 509)], {"v": F.lit(-1).cast("long")}
    )
    rows = {r.k: r.v for r in snap.read_snapshot(spark, path).collect()}
    assert all(rows[k] == -1 for k in range(500, 510))
    assert rows[0] == 0 and rows[999] == 2997  # untouched rows intact
    assert len(rows) == 1000


def test_noop_when_pruning_proves_no_match(spark, tmp_path):
    path = str(tmp_path / "t")
    _table(spark, path)
    v = snap.snapshot_delete_where(spark, path, [("k", 5000, 6000)])
    assert v == 0  # no affected files -> no new version


def test_delete_everything_leaves_readable_empty_table(spark, tmp_path):
    path = str(tmp_path / "t")
    _table(spark, path)
    v = snap.snapshot_delete_where(spark, path, [("k", None, None)])
    assert v == 1
    got = snap.read_snapshot(spark, path)
    assert got.count() == 0 and got.columns == ["k", "v"]
    assert snap.read_snapshot(spark, path, 0).count() == 1000  # time travel


def test_transform_schema_change_refused(spark, tmp_path):
    path = str(tmp_path / "t")
    _table(spark, path)
    with pytest.raises(ValueError, match="column set"):
        snap.snapshot_rewrite_matching(
            spark, path, [("k", 0, 10)], lambda df: df.drop("v")
        )


def test_member_sketches_maintained_through_rewrite(spark, tmp_path):
    path = str(tmp_path / "t")
    df = spark.range(0, 400).select(
        (F.col("id") % 4).cast("string").alias("tag"), F.col("id").alias("v")
    )
    snap.snapshot_write(df.repartition(4, "tag"), path, member_cols=["tag"])
    snap.snapshot_delete_where(spark, path, [("tag", "2", "2")])
    got = snap.read_snapshot(spark, path)
    assert got.filter(F.col("tag") == "2").count() == 0
    assert got.count() == 300
    # the deleted tag now proves absent for every file
    kept, total = snap.prune_files(path, [("tag", "2", "2")])
    assert len(kept) < total or total == 1
    # time travel still sees the pre-delete table
    assert snap.read_snapshot(spark, path, 0).count() == 400
