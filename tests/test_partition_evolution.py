"""Round 10: partition spec EVOLUTION (the Iceberg shape) —
metadata-only spec change, per-file pruning across the boundary,
exact reads of mixed layouts, compaction completing the migration."""

import os
import tempfile

import pytest

from harmony_energy_data_pipeline_spark.sinks import snapshots as snap


def _tmp():
    return os.path.join(tempfile.mkdtemp(), "t")


def _df(spark, lo, hi):
    return spark.range(lo, hi).selectExpr(
        "id AS k", "CAST(id % 3 AS STRING) AS region",
        "CAST(id % 4 AS STRING) AS day", "CAST(id AS DOUBLE) AS v",
    )


def test_spec_evolution_end_to_end(spark):
    t = _tmp()
    snap.snapshot_write(_df(spark, 0, 120), t, partition_by=["region"],
                        stats_cols=["k"])
    v = snap.snapshot_set_partition_spec(t, ["day"])
    assert v == 1  # metadata-only: one commit, zero data files moved
    m = snap._read_manifest(t, v)
    assert m["partition_cols"] == ["day"]
    assert m["partition_specs"] == [["region"], ["day"]]
    # appends inherit the NEW spec immediately
    snap.snapshot_write(
        _df(spark, 0, 120).selectExpr("k + 1000 AS k", "region",
                                      "day", "v"),
        t, mode="append",
    )
    m2 = snap._read_manifest(t, 2)
    assert any("day=" in f for f in m2["files"])
    # reads are exact across the layout boundary: every historical
    # partition column reconstructs from each file's own path
    got = snap.read_snapshot(spark, t)
    assert got.count() == 240
    assert got.filter("region IS NULL OR day IS NULL").count() == 0
    assert got.filter("region = '1'").count() == 80
    assert got.filter("day = '2'").count() == 60
    # pruning consults each file's own spec: old files prune on
    # region, new files on day; neither predicate scans everything
    kr, total = snap.prune_files(t, [("region", "1", "1")])
    kd, _ = snap.prune_files(t, [("day", "2", "2")])
    assert len(kr) < total and len(kd) < total
    # results identical to unpruned reads
    assert snap.read_snapshot(
        spark, t, where=[("day", "2", "2")]
    ).count() == 60


def test_compaction_completes_migration(spark):
    t = _tmp()
    snap.snapshot_write(_df(spark, 0, 120), t, partition_by=["region"])
    snap.snapshot_set_partition_spec(t, ["day"])
    snap.snapshot_compact(spark, t)
    m = snap._read_manifest(t, snap.latest_version(t))
    # one spec again: the overwrite resets the history
    assert not snap._spec_evolved(m)
    assert m["partition_cols"] == ["day"]
    assert all("day=" in f for f in m["files"])
    got = snap.read_snapshot(spark, t)
    assert got.count() == 120
    assert got.filter("region = '1'").count() == 40  # column survives
    kd, total = snap.prune_files(t, [("day", "2", "2")])
    assert len(kd) < total


def test_unpartition_and_validation(spark):
    t = _tmp()
    snap.snapshot_write(_df(spark, 0, 60), t, partition_by=["region"])
    with pytest.raises(ValueError, match="columns .* the table lacks"):
        snap.snapshot_set_partition_spec(t, ["nope"])
    with pytest.raises(ValueError, match="already partitioned"):
        snap.snapshot_set_partition_spec(t, ["region"])
    snap.snapshot_set_partition_spec(t, [])
    snap.snapshot_write(_df(spark, 60, 90).coalesce(1), t, mode="append")
    m = snap._read_manifest(t, snap.latest_version(t))
    assert not m.get("partition_cols")
    got = snap.read_snapshot(spark, t)
    assert got.count() == 90
    # old files still prune on their region segments
    kr, total = snap.prune_files(t, [("region", "1", "1")])
    assert len(kr) < total
    assert snap.read_snapshot(
        spark, t, where=[("region", "1", "1")]
    ).count() == 30


def test_row_level_ops_across_evolved_layout(spark):
    t = _tmp()
    snap.snapshot_write(_df(spark, 0, 120), t, partition_by=["region"],
                        stats_cols=["k"])
    snap.snapshot_set_partition_spec(t, ["day"])
    snap.snapshot_write(
        _df(spark, 0, 120).selectExpr("k + 1000 AS k", "region",
                                      "day", "v"),
        t, mode="append",
    )
    snap.snapshot_delete_where(spark, t, [("k", 0, 9)])
    snap.snapshot_update_where(
        spark, t, [("k", 1000, 1009)], {"v": "-1.0"}
    )
    got = snap.read_snapshot(spark, t)
    assert got.count() == 230
    assert got.filter("v = -1.0").count() == 10
    assert got.filter("region IS NULL OR day IS NULL").count() == 0