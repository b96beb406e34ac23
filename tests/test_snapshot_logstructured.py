"""Log-structured snapshot metadata (round 7): delta manifests are
O(commit) not O(table files); checkpoints bound resolution walks;
vacuum keeps delta chains resolvable; CDC has an adds-only fast path."""
from __future__ import annotations

import json
import os

import pytest

from pyspark.sql import functions as F

from harmony_energy_data_pipeline_spark.sinks import snapshots as snap


def _append_chain(spark, path, n_commits, rows_per=50, stats=True):
    for i in range(n_commits):
        df = spark.range(i * rows_per, (i + 1) * rows_per).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("v")
        ).coalesce(1)
        snap.snapshot_write(
            df, path, mode="append" if i else "overwrite",
            stats_cols=["k"] if stats else None,
        )


def test_appends_write_delta_manifests_of_bounded_size(spark, tmp_path):
    path = str(tmp_path / "t")
    _append_chain(spark, path, 30)
    # raw shape: v0 full, later commits are adds-only deltas
    assert "files" in snap._read_manifest_raw(path, 0)
    for v in (1, 15, 29):
        raw = snap._read_manifest_raw(path, v)
        assert "files" not in raw and raw["adds"] and not raw["removes"]
        assert raw["n_live_files"] == v + 1
    # commit metadata cost is flat: the 29th manifest is no bigger
    # than the 2nd (each records ONE file + its stats)
    sz = lambda v: os.path.getsize(snap._manifest_path(path, v))
    assert sz(29) <= sz(1) * 1.5
    # resolved view is the full union, in append order
    m = snap._read_manifest(path, 29)
    assert len(m["files"]) == 30
    assert len(m["stats"]) == 30  # zone maps accumulate through deltas
    got = snap.read_snapshot(spark, path)
    assert got.count() == 1500
    # pruning still plans from accumulated per-file stats
    kept, total = snap.prune_files(path, [("k", 0, 49)])
    assert total == 30 and len(kept) == 1


def test_long_chain_resolution_persists_a_checkpoint(spark, tmp_path):
    path = str(tmp_path / "t")
    n = snap._CHECKPOINT_INTERVAL + 5
    _append_chain(spark, path, n)
    latest = n - 1
    snap._RESOLVE_CACHE.clear()
    assert not os.path.exists(snap._ckpt_path_pq(path, latest))
    snap._read_manifest(path, latest)  # walk >= interval -> checkpoint
    assert os.path.exists(snap._ckpt_path_pq(path, latest))
    raw = snap._read_manifest_raw(path, latest)
    tbl = snap._read_ckpt_arrow(path, latest, raw["txid"])
    meta, state = snap._ckpt_from_arrow(tbl)
    assert len(state["files"]) == n
    assert len(state["stats"]) == n  # zone maps survive the round trip
    assert meta["txid"] == raw["txid"]
    # a LATER commit resolves through the checkpoint, not the chain
    df = spark.range(9000, 9010).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    ).coalesce(1)
    snap.snapshot_write(df, path, mode="append", stats_cols=["k"])
    snap._RESOLVE_CACHE.clear()
    m = snap._read_manifest(path, latest + 1)
    assert len(m["files"]) == n + 1


def test_vacuum_checkpoints_oldest_kept_delta(spark, tmp_path):
    path = str(tmp_path / "t")
    _append_chain(spark, path, 10)
    snap.vacuum(path, keep_last=3, orphan_grace_s=0.0)
    # expired manifests gone, kept ones resolvable WITHOUT the chain
    assert snap._versions(path) == [7, 8, 9]
    assert os.path.exists(snap._ckpt_path_pq(path, 7))
    snap._RESOLVE_CACHE.clear()
    for v, want in ((7, 8), (8, 9), (9, 10)):
        m = snap._read_manifest(path, v)
        assert len(m["files"]) == want
    assert snap.read_snapshot(spark, path, 7).count() == 400
    assert snap.read_snapshot(spark, path).count() == 500
    # a second vacuum drops the now-expired checkpoint with its version
    _append_chain_more = spark.range(10_000, 10_050).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    )
    snap.snapshot_write(_append_chain_more, path, mode="append",
                        stats_cols=["k"])
    snap.vacuum(path, keep_last=2, orphan_grace_s=0.0)
    assert not os.path.exists(snap._ckpt_path_pq(path, 7))
    assert snap.read_snapshot(spark, path).count() == 550


def test_cdc_fast_path_over_delta_appends(spark, tmp_path):
    path = str(tmp_path / "t")
    _append_chain(spark, path, 8)
    delta = snap.read_snapshot_changes(spark, path, 2, 6)
    ks = sorted(r.k for r in delta.collect())
    assert ks == list(range(150, 350))
    # a partial rewrite in-range still raises (operation=overwrite)
    snap.snapshot_delete_where(spark, path, [("k", 0, 9)])
    with pytest.raises(ValueError, match="not append-only"):
        snap.read_snapshot_changes(spark, path, 6, snap.latest_version(path))


def test_partial_rewrite_delta_drops_removed_file_metadata(spark, tmp_path):
    path = str(tmp_path / "t")
    _append_chain(spark, path, 6)
    v = snap.snapshot_delete_where(spark, path, [("k", 100, 149)])
    raw = snap._read_manifest_raw(path, v)
    assert raw["removes"] and raw["adds"] is not None
    m = snap._read_manifest(path, v)
    removed = set(raw["removes"])
    assert not removed & set(m["files"])
    assert not removed & set(m.get("stats", {}))
    # table content and pruning both correct post-rewrite
    assert snap.read_snapshot(spark, path).count() == 250
    kept, total = snap.prune_files(path, [("k", 200, 249)], version=v)
    # the [200,249] block plus at most the rewrite's (empty,
    # stat-less) staged file — never the other four blocks
    assert len(kept) <= 2
    assert snap.read_snapshot(
        spark, path, where=[("k", 200, 249)]
    ).count() == 50


def test_mixed_full_and_delta_chain_resolves(spark, tmp_path):
    """A stats backfill writes a FULL manifest mid-chain (the legacy/
    checkpoint shape); deltas stacked on top must resolve through it."""
    path = str(tmp_path / "t")
    _append_chain(spark, path, 4, stats=False)
    bv = snap.snapshot_backfill_stats(spark, path, stats_cols=["k"])
    assert "files" in snap._read_manifest_raw(path, bv)
    df = spark.range(500, 520).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    ).coalesce(1)
    snap.snapshot_write(df, path, mode="append", stats_cols=["k"])
    m = snap._read_manifest(path, snap.latest_version(path))
    assert len(m["files"]) == 5
    assert len(m["stats"]) == 5  # backfilled maps + the new add's
    assert snap.read_snapshot(spark, path).count() == 220
    # CDC across the backfill (full-manifest append) takes the
    # set-diff fallback and sees ONLY the real new rows
    delta = snap.read_snapshot_changes(spark, path, bv - 1, bv + 1)
    assert sorted(r.k for r in delta.collect()) == list(range(500, 520))


def test_restore_of_delta_version_is_standalone(spark, tmp_path):
    path = str(tmp_path / "t")
    _append_chain(spark, path, 5)
    rv = snap.snapshot_restore(path, 2)
    raw = snap._read_manifest_raw(path, rv)
    assert "files" in raw and len(raw["files"]) == 3  # full: no chain dep
    assert snap.read_snapshot(spark, path).count() == 150
    assert snap._read_manifest(path, rv)["restored_from"] == 2
