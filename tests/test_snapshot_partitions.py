"""Hive partition tracking in the snapshot log (round 8): partition
values are path-derived per file, readers reconstruct the columns,
and the planner prunes partitions exactly — no stats required."""
from __future__ import annotations

import os

import pytest

from pyspark.sql import functions as F

from harmony_energy_data_pipeline_spark.sinks import snapshots as snap


def _df(spark, lo, hi):
    return spark.range(lo, hi).select(
        (F.col("id") % 4).alias("g"),
        F.col("id").alias("k"),
        (F.col("id") * 2).alias("v"),
    )


def test_partitioned_write_roundtrip(spark, tmp_path):
    path = str(tmp_path / "t")
    snap.snapshot_write(_df(spark, 0, 100), path, partition_by=["g"])
    m = snap._read_manifest(path, 0)
    assert m["partition_cols"] == ["g"]
    assert all("/g=" in f or f.startswith("g=") for f in m["files"])
    got = snap.read_snapshot(spark, path)
    assert got.columns == ["g", "k", "v"]
    rows = {r.k: (r.g, r.v) for r in got.collect()}
    assert len(rows) == 100
    assert all(rows[k] == (k % 4, k * 2) for k in range(100))


def test_partition_pruning_is_exact_without_stats(spark, tmp_path):
    path = str(tmp_path / "t")
    snap.snapshot_write(_df(spark, 0, 400), path, partition_by=["g"])
    kept, total = snap.prune_files(path, [("g", 2, 2)])
    assert total > len(kept)
    assert all("/g=2/" in f for f in kept)
    got = snap.read_snapshot(spark, path, where=[("g", 2, 2)])
    assert got.count() == 100
    assert got.select("g").distinct().collect()[0].g == 2
    # range predicate on the int partition column
    kept2, _ = snap.prune_files(path, [("g", 1, 2)])
    assert all("/g=1/" in f or "/g=2/" in f for f in kept2)
    assert snap.read_snapshot(spark, path, where=[("g", 1, 2)]).count() == 200


def test_unpartitioned_append_keeps_column_values(spark, tmp_path):
    path = str(tmp_path / "t")
    snap.snapshot_write(_df(spark, 0, 40), path, partition_by=["g"])
    # a bare append INHERITS the table layout (round 10): new files
    # land under g= dirs like the bucket spec always did
    snap.snapshot_write(_df(spark, 40, 80).coalesce(1), path, mode="append")
    m = snap._read_manifest(path, 1)
    assert all("/g=" in f or "g=" in f for f in m["files"])
    rows = {r.k: r.g for r in snap.read_snapshot(spark, path).collect()}
    assert len(rows) == 80
    assert all(rows[k] == k % 4 for k in range(80))
    # a batch MISSING the partition column stages layout-less: g reads
    # as NULL on those rows, pruning keeps the file conservatively
    snap.snapshot_write(
        spark.range(80, 100).selectExpr("id AS k", "id * 2 AS v")
        .coalesce(1),
        path, mode="append",
    )
    got = snap.read_snapshot(spark, path)
    assert got.count() == 100
    assert got.filter("g IS NULL").count() == 20
    kept, _ = snap.prune_files(path, [("g", 3, 3)])
    assert sum("/g=" not in f for f in kept) == 1
    assert snap.read_snapshot(
        spark, path, where=[("g", 3, 3)]
    ).count() == 20


def test_conflicting_partition_spec_on_append_raises(spark, tmp_path):
    path = str(tmp_path / "t")
    snap.snapshot_write(_df(spark, 0, 40), path, partition_by=["g"])
    with pytest.raises(ValueError, match="partitioned by"):
        snap.snapshot_write(
            _df(spark, 40, 80), path, mode="append", partition_by=["k"]
        )
    # same spec appends fine; spec carries through plain appends
    snap.snapshot_write(
        _df(spark, 40, 80), path, mode="append", partition_by=["g"]
    )
    snap.snapshot_write(_df(spark, 80, 90).coalesce(1), path, mode="append")
    assert snap._read_manifest_raw(
        path, snap.latest_version(path)
    )["partition_cols"] == ["g"]


def test_null_partition_values(spark, tmp_path):
    path = str(tmp_path / "t")
    df = spark.range(0, 30).select(
        F.when(F.col("id") % 3 == 0, None)
        .otherwise(F.col("id") % 2).cast("long").alias("g"),
        F.col("id").alias("k"), (F.col("id") * 2).alias("v"),
    )
    snap.snapshot_write(df, path, partition_by=["g"])
    rows = {r.k: r.g for r in snap.read_snapshot(spark, path).collect()}
    assert len(rows) == 30
    assert all(rows[k] is None for k in range(0, 30, 3))
    assert rows[1] == 1 and rows[2] == 0
    # NULL partitions are conservatively kept by pruning
    assert snap.read_snapshot(spark, path, where=[("g", 1, 1)]).count() \
        == len([k for k in range(30) if k % 3 and k % 2 == 1])


def test_dv_delete_and_feed_on_partitioned_table(spark, tmp_path):
    path = str(tmp_path / "t")
    snap.snapshot_write(_df(spark, 0, 100), path, partition_by=["g"])
    v = snap.snapshot_delete_where_dv(spark, path, [("k", 0, 9)])
    assert snap.read_snapshot(spark, path).count() == 90
    feed = snap.read_snapshot_changes_feed(spark, path, 0, v)
    dels = {r.k: r.g for r in feed.collect() if r._change_type == "delete"}
    assert sorted(dels) == list(range(10))
    # deleted-row recovery reconstructs the partition column
    assert all(dels[k] == k % 4 for k in range(10))


def test_string_partition_with_special_chars(spark, tmp_path):
    path = str(tmp_path / "t")
    df = spark.createDataFrame(
        [("a b", 1), ("c/d", 2), ("plain", 3)], "s string, k long"
    )
    snap.snapshot_write(df, path, partition_by=["s"])
    rows = {r.k: r.s for r in snap.read_snapshot(spark, path).collect()}
    assert rows == {1: "a b", 2: "c/d", 3: "plain"}
    # equality pruning on the encoded value stays CORRECT (the python
    # path decodes; files must never be wrongly skipped)
    got = snap.read_snapshot(spark, path, where=[("s", "a b", "a b")])
    assert [r.k for r in got.collect()] == [1]


def test_partition_spec_survives_restore_and_clone(spark, tmp_path):
    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    snap.snapshot_write(_df(spark, 0, 40), src, partition_by=["g"])
    snap.snapshot_write(_df(spark, 40, 60).coalesce(1), src, mode="append")
    rv = snap.snapshot_restore(src, 0)
    assert snap._read_manifest(src, rv)["partition_cols"] == ["g"]
    assert snap.read_snapshot(spark, src).count() == 40
    snap.snapshot_clone(src, dst)
    m = snap._read_manifest(dst, 0)
    assert m["partition_cols"] == ["g"]
    rows = {r.k: r.g for r in snap.read_snapshot(spark, dst).collect()}
    assert all(rows[k] == k % 4 for k in range(40))


def test_table_info_reports_partition_layout_debt(spark, tmp_path):
    path = str(tmp_path / "t")
    snap.snapshot_write(_df(spark, 0, 40), path, partition_by=["g"])
    info = snap.snapshot_table_info(path)
    assert info["partition_cols"] == ["g"]
    assert info["partitioned_files"] == info["n_files"]
    # round 9: a COW update restages its rewritten rows INTO the hive
    # layout (stage_in_layout), so row-level rewrites no longer accrue
    # the layout debt they did in round 8 — the debt metric stays zero
    snap.snapshot_update_where(
        spark, path, [("g", 2, 2), ("k", 0, 10)],
        {"v": F.lit(-1).cast("long")},
    )
    info = snap.snapshot_table_info(path)
    assert info["partitioned_files"] == info["n_files"]
    # the metric still exists for files staged OUTSIDE snapshot_write's
    # layout path (e.g. a raw staged publish); compaction keeps it zero
    snap.snapshot_compact(spark, path, target_file_mb=1)
    info = snap.snapshot_table_info(path)
    assert info["partitioned_files"] == info["n_files"]


def test_streaming_partitioned_table_reconstructs_columns(spark, tmp_path):
    from harmony_energy_data_pipeline_spark.sources.snapstream import (
        SnapshotTableDataSource,
    )

    spark.dataSource.register(SnapshotTableDataSource)
    path = str(tmp_path / "t")
    snap.snapshot_write(_df(spark, 0, 40), path, partition_by=["g"])
    q = (
        spark.readStream.format("snapshot_table").option("path", path)
        .load().writeStream.format("memory")
        .queryName("r8_part_stream").outputMode("append")
        .trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    rows = {r.k: r.g for r in spark.table("r8_part_stream").collect()}
    assert len(rows) == 40
    assert all(rows[k] == k % 4 for k in range(40))


def test_clean_partitioned_scan_uses_literal_groups(spark, tmp_path):
    # the clean-scan plan must attach partition values as per-group
    # literals (no per-row path regex/url-decode), and an equality
    # predicate must constant-fold non-matching groups away
    path = str(tmp_path / "t")
    snap.snapshot_write(
        _df(spark, 0, 400).repartition(8, "g"), path, partition_by=["g"]
    )
    df = snap.read_snapshot(spark, path, where=[("g", 2, 2)])
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "url_decode" not in plan
    # every scan branch for other partitions folded away: only g=2
    # files appear in the final plan
    opt = df._jdf.queryExecution().optimizedPlan().toString()
    assert "g=2" in opt or "Relation" in opt
    assert df.count() == 100
    # a DV commit flips the table to the expression route (the anti
    # join needs _metadata above one scan) — still correct
    snap.snapshot_delete_where_dv(spark, path, [("k", 0, 3)])
    got = snap.read_snapshot(spark, path, where=[("g", 2, 2)])
    assert got.count() == 99
    assert got.select("g").distinct().collect()[0].g == 2


def test_compaction_restores_hive_layout(spark, tmp_path):
    path = str(tmp_path / "t")
    snap.snapshot_write(_df(spark, 0, 100), path, partition_by=["g"])
    # round 9: a COW rewrite stages its surviving rows back INTO the
    # hive layout, so pruning stays exact straight through it
    snap.snapshot_delete_where(spark, path, [("k", 0, 9)])
    kept_mid, total_mid = snap.prune_files(path, [("g", 2, 2)])
    assert all("/g=" in f for f in kept_mid)
    assert all("/g=2/" in f for f in kept_mid) and len(kept_mid) < total_mid
    # …and compaction keeps the exact layout
    v = snap.snapshot_compact(spark, path, target_file_mb=1)
    m = snap._read_manifest(path, v)
    assert m["partition_cols"] == ["g"]
    assert all("/g=" in f for f in m["files"])
    kept, total = snap.prune_files(path, [("g", 2, 2)])
    assert kept and all("/g=2/" in f for f in kept) and len(kept) < total
    rows = {r.k: r.g for r in snap.read_snapshot(spark, path).collect()}
    assert len(rows) == 90
    assert all(rows[k] == k % 4 for k in range(10, 100))


def test_partition_pruning_through_columnar_checkpoint(spark, tmp_path):
    path = str(tmp_path / "t")
    n = snap._CHECKPOINT_INTERVAL + 2
    for i in range(n):
        snap.snapshot_write(
            _df(spark, i * 40, (i + 1) * 40), path,
            mode="append" if i else "overwrite", partition_by=["g"],
        )
    snap._RESOLVE_CACHE.clear()
    v = snap.latest_version(path)
    snap._read_manifest(path, v)  # force the checkpoint
    assert os.path.exists(snap._ckpt_path_pq(path, v))
    fast = snap._prune_files_arrow(path, v, [("g", 2, 2)])
    assert fast is not None
    kept, total = fast
    assert kept and all("/g=2/" in f for f in kept)
    assert total == len(snap._read_manifest(path, v)["files"])
    # identical to the dict path
    snap._RESOLVE_CACHE.clear()
    os.remove(snap._ckpt_path_pq(path, v))
    ref = snap.prune_files(path, [("g", 2, 2)], version=v)
    assert (sorted(kept), total) == (sorted(ref[0]), ref[1])
    assert snap.read_snapshot(
        spark, path, where=[("g", 2, 2)]
    ).count() == n * 10


def test_snapshot_files_metadata_table(spark, tmp_path):
    path = str(tmp_path / "t")
    snap.snapshot_write(
        _df(spark, 0, 100), path, partition_by=["g"], stats_cols=["k"]
    )
    snap.snapshot_delete_where_dv(spark, path, [("k", 0, 4)])
    mf = snap.snapshot_files(spark, path)
    rows = mf.collect()
    m = snap._read_manifest(path, snap.latest_version(path))
    assert len(rows) == len(m["files"])
    assert sum(r.n_rows for r in rows) == 100  # recorded, pre-DV
    assert all(r.bytes and r.bytes > 0 for r in rows)
    assert {r.partition["g"] for r in rows} == {"0", "1", "2", "3"}
    assert sum(r.dv_vectors for r in rows) >= 1
    # stats round-trip: every file records k bounds, JSON-decodable
    import json as _json

    ks = [(_json.loads(r.stats["k"].min_json),
           _json.loads(r.stats["k"].max_json)) for r in rows]
    assert min(lo for lo, _ in ks) == 0 and max(hi for _, hi in ks) == 99
    # ops aggregation works with plain DataFrame code
    from pyspark.sql import functions as _F

    small = mf.filter(_F.col("bytes") < 10**9).count()
    assert small == len(rows)
