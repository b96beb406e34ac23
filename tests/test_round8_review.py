"""Round-8 self-review regression tests: DV identity on encoded
partition paths, float partition-value comparisons, widened stats
through the columnar checkpoint, star-view dim pinning (by contract),
snapshot_files checkpoint path."""
from __future__ import annotations

import os

import pytest

from pyspark.sql import functions as F

from harmony_energy_data_pipeline_spark.sinks import snapshots as snap


def test_dv_delete_on_percent_encoded_partition_path(spark, tmp_path):
    # 'page view' hive-stages as 'page view' on disk but reads as
    # 'page%20view' through the _metadata URI — the vector identity
    # must decode the URI layer or the delete silently no-ops
    path = str(tmp_path / "t")
    df = spark.createDataFrame(
        [("page view", i, i * 2) for i in range(10)]
        + [("click", i, i * 3) for i in range(10)],
        "et string, k long, v long",
    )
    snap.snapshot_write(df, path, partition_by=["et"])
    v = snap.snapshot_delete_where_dv(spark, path, [("k", 0, 4)])
    assert snap.read_snapshot(spark, path).count() == 10
    covered = snap._read_manifest_raw(path, v)["dv_adds"]
    assert any("page%20view" in f or "page view" in f for f in covered)
    # MOR update on the same layout
    snap.snapshot_update_where_dv(
        spark, path, [("k", 8, 9)], {"v": F.lit(-1).cast("long")}
    )
    rows = {(r.et, r.k): r.v for r in snap.read_snapshot(spark, path).collect()}
    assert len(rows) == 10
    assert rows[("page view", 8)] == -1 and rows[("click", 9)] == -1
    # and the row-level feed recovers the encoded partition's deletes
    feed = snap.read_snapshot_changes_feed(spark, path, 0, v)
    dels = [r for r in feed.collect() if r._change_type == "delete"]
    assert sorted((r.et, r.k) for r in dels) == sorted(
        [("page view", k) for k in range(5)]
        + [("click", k) for k in range(5)]
    )


def test_float_partition_values_compare_numerically(spark, tmp_path):
    path = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(9.5, 1), (10.0, 2), (2.0, 3)], "temp double, k long"
    )
    snap.snapshot_write(df, path, partition_by=["temp"])
    # lexicographically '9.5' > '10.0' — numerically it is NOT: the
    # file must be kept
    kept, total = snap.prune_files(path, [("temp", None, 10.0)])
    assert len(kept) == 3
    got = snap.read_snapshot(spark, path, where=[("temp", None, 10.0)])
    assert sorted(r.k for r in got.collect()) == [1, 2, 3]
    got2 = snap.read_snapshot(spark, path, where=[("temp", 9.0, 9.9)])
    assert [r.k for r in got2.collect()] == [1]


def test_widened_stats_fall_back_through_checkpoint(spark, tmp_path):
    # checkpoint typed smin/smax as int64; a post-widen append records
    # FLOAT stats — the arrow replay must refuse (pyarrow silently
    # truncates 9.7 -> 9) and the dict path must stay exact
    path = str(tmp_path / "t")
    n = snap._CHECKPOINT_INTERVAL + 2
    for i in range(n):
        df = spark.range(i * 10, (i + 1) * 10).select(
            F.col("id").alias("k"), F.col("id").cast("int").alias("m")
        ).coalesce(1)
        snap.snapshot_write(df, path, mode="append" if i else "overwrite",
                            stats_cols=["m"])
    snap._RESOLVE_CACHE.clear()
    v = snap.latest_version(path)
    snap._read_manifest(path, v)  # persist the int64-typed checkpoint
    assert os.path.exists(snap._ckpt_path_pq(path, v))
    snap.snapshot_widen_column(path, "m", "double")
    tail = spark.createDataFrame([(10_000, 9.7)], "k long, m double")
    snap.snapshot_write(tail.coalesce(1), path, mode="append",
                        stats_cols=["m"])
    # the 9.7 file's bounds must not truncate to 9: a [9.65, 9.75]
    # interval read must keep it and return exactly that row
    got = snap.read_snapshot(spark, path, where=[("m", 9.65, 9.75)])
    assert [r.k for r in got.collect()] == [10_000]
    agg = snap.snapshot_stats_agg(path, ["m"])
    assert agg["max"]["m"] == 219  # the int era's true maximum
    assert agg["n_rows"] == (snap._CHECKPOINT_INTERVAL + 2) * 10 + 1


def test_snapshot_files_identical_via_checkpoint_and_dicts(spark, tmp_path):
    path = str(tmp_path / "t")
    n = snap._CHECKPOINT_INTERVAL + 1
    for i in range(n):
        df = spark.range(i * 10, (i + 1) * 10).select(
            (F.col("id") % 2).alias("g"), F.col("id").alias("k")
        ).coalesce(1)
        snap.snapshot_write(df, path, mode="append" if i else "overwrite",
                            stats_cols=["k"])
    snap._RESOLVE_CACHE.clear()
    v = snap.latest_version(path)
    snap._read_manifest(path, v)
    assert os.path.exists(snap._ckpt_path_pq(path, v))
    via_ckpt = sorted(
        (r.file, r.bytes, r.n_rows, r.dv_vectors,
         r.stats["k"].min_json, r.stats["k"].max_json)
        for r in snap.snapshot_files(spark, path).collect()
    )
    os.remove(snap._ckpt_path_pq(path, v))
    snap._RESOLVE_CACHE.clear()
    via_dicts = sorted(
        (r.file, r.bytes, r.n_rows, r.dv_vectors,
         r.stats["k"].min_json, r.stats["k"].max_json)
        for r in snap.snapshot_files(spark, path).collect()
    )
    assert via_ckpt == via_dicts and len(via_ckpt) == n
