"""Columnar (parquet) checkpoints — round 8: the resolution sidecar
is arrow-native, planning-time pruning and manifest-only aggregates
evaluate vectorized, and every fast path is value-identical to the
per-file dict walk."""
from __future__ import annotations

import os

import pytest

from pyspark.sql import functions as F

from harmony_energy_data_pipeline_spark.sinks import snapshots as snap


def _chain(spark, path, n, rows_per=50, stats=True, members=False):
    for i in range(n):
        df = spark.range(i * rows_per, (i + 1) * rows_per).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("v"),
            (F.col("id") % 7).alias("g"),
        ).coalesce(1)
        snap.snapshot_write(
            df, path, mode="append" if i else "overwrite",
            stats_cols=["k", "v"] if stats else None,
            member_cols=["g"] if members else None,
        )


def _force_ckpt(path):
    snap._RESOLVE_CACHE.clear()
    v = snap.latest_version(path)
    snap._read_manifest(path, v)  # long walk persists the checkpoint
    assert os.path.exists(snap._ckpt_path_pq(path, v))
    return v


def _dict_prune(path, where, version):
    """The reference per-file dict walk, fast path bypassed."""
    from harmony_energy_data_pipeline_spark.sinks.filestats import (
        file_matches,
        file_matches_members,
    )

    m = snap._read_manifest(path, version)
    stats = {snap._rel_file(path, f): s
             for f, s in m.get("stats", {}).items()}
    membs = {snap._rel_file(path, f): s
             for f, s in m.get("members", {}).items()}
    kept = [
        snap._abs_file(path, f) for f in m["files"]
        if file_matches(stats.get(snap._rel_file(path, f)), where)
        and file_matches_members(membs.get(snap._rel_file(path, f)), where)
    ]
    return kept, len(m["files"])


def test_ckpt_roundtrip_is_lossless(spark, tmp_path):
    path = str(tmp_path / "t")
    n = snap._CHECKPOINT_INTERVAL + 3
    _chain(spark, path, n, members=True)
    v = _force_ckpt(path)
    snap._RESOLVE_CACHE.clear()
    # dict state rebuilt FROM the parquet checkpoint == replaying chain
    raw = snap._read_manifest_raw(path, v)
    tbl = snap._read_ckpt_arrow(path, v, raw["txid"])
    _, st = snap._ckpt_from_arrow(tbl)
    ref = {"files": [], "stats": {}, "members": {}, "dvs": {}}
    # reference: resolve with the checkpoint removed
    os.remove(snap._ckpt_path_pq(path, v))
    snap._RESOLVE_CACHE.clear()
    ref = snap._resolve_state(path, v)
    assert st["files"] == ref["files"]
    assert st["stats"] == ref["stats"]
    assert st["members"] == ref["members"]
    assert st["dvs"] == ref["dvs"]


def test_arrow_prune_matches_dict_prune(spark, tmp_path):
    path = str(tmp_path / "t")
    n = snap._CHECKPOINT_INTERVAL + 4
    _chain(spark, path, n, members=True)
    v = _force_ckpt(path)
    cases = [
        [("k", 0, 49)],
        [("k", 120, 180)],
        [("k", None, 99)],
        [("k", 10_000, None)],
        [("v", 100, 198)],
        [("k", 0, 49), ("v", 0, 98)],
        [("g", 3, 3)],               # member equality
        [("k", 0, 99), ("g", 2, 2)],
        [("missing_col", 0, 1)],     # no stats: keep all
    ]
    for where in cases:
        fast = snap._prune_files_arrow(path, v, where)
        assert fast is not None, f"fast path unavailable for {where}"
        ref = _dict_prune(path, where, v)
        assert fast == ref, f"mismatch for {where}"
    # a real pruned read returns correct rows through the fast path
    assert snap.read_snapshot(
        spark, path, where=[("k", 200, 249)]
    ).count() == 50


def test_arrow_prune_covers_deltas_after_checkpoint(spark, tmp_path):
    path = str(tmp_path / "t")
    n = snap._CHECKPOINT_INTERVAL + 2
    _chain(spark, path, n)
    _force_ckpt(path)
    # two more commits past the checkpoint + a partial rewrite
    df = spark.range(5000, 5050).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v"),
        (F.col("id") % 7).alias("g"),
    ).coalesce(1)
    snap.snapshot_write(df, path, mode="append", stats_cols=["k", "v"])
    snap.snapshot_delete_where(spark, path, [("k", 0, 49)])
    v = snap.latest_version(path)
    for where in ([("k", 5000, 5010)], [("k", 0, 60)], [("k", 60, 110)]):
        fast = snap._prune_files_arrow(path, v, where)
        assert fast is not None
        assert fast == _dict_prune(path, where, v), where
    got = snap.read_snapshot(spark, path, where=[("k", 5000, 5049)])
    assert got.count() == 50


def test_arrow_stats_agg_matches_dict_path(spark, tmp_path):
    path = str(tmp_path / "t")
    n = snap._CHECKPOINT_INTERVAL + 2
    _chain(spark, path, n)
    v = _force_ckpt(path)
    fast = snap._stats_agg_arrow(path, v, ["k", "v", "nope"])
    assert fast is not None
    os.remove(snap._ckpt_path_pq(path, v))
    snap._RESOLVE_CACHE.clear()
    ref = snap.snapshot_stats_agg(path, ["k", "v", "nope"], version=v)
    assert fast == ref
    assert fast["n_rows"] == n * 50
    assert fast["min"]["k"] == 0 and fast["max"]["k"] == n * 50 - 1
    assert fast["min"]["nope"] is None


def test_arrow_stats_agg_subtracts_dv_overlay(spark, tmp_path):
    path = str(tmp_path / "t")
    n = snap._CHECKPOINT_INTERVAL + 1
    _chain(spark, path, n)
    _force_ckpt(path)
    snap.snapshot_delete_where_dv(spark, path, [("k", 0, 9)])
    v = snap.latest_version(path)
    agg = snap.snapshot_stats_agg(path, ["k"], version=v)
    assert agg["n_rows"] == n * 50 - 10
    assert agg["min"]["k"] is None  # DVs present: bounds unprovable
    # and the plain read agrees
    assert snap.read_snapshot(spark, path).count() == n * 50 - 10


def test_legacy_json_checkpoint_still_resolves(spark, tmp_path):
    path = str(tmp_path / "t")
    n = snap._CHECKPOINT_INTERVAL + 1
    _chain(spark, path, n)
    v = snap.latest_version(path)
    # hand-write a LEGACY JSON checkpoint (pre-round-8 format)
    import json as _json

    snap._RESOLVE_CACHE.clear()
    state = snap._resolve_state(path, v)
    os.remove(snap._ckpt_path_pq(path, v))
    raw = snap._read_manifest_raw(path, v)
    with open(snap._ckpt_path(path, v), "w") as fh:
        _json.dump({
            "version": v, "txid": raw["txid"], "files": state["files"],
            "stats": state["stats"],
        }, fh)
    snap._RESOLVE_CACHE.clear()
    m = snap._read_manifest(path, v)
    assert len(m["files"]) == n
    assert snap.read_snapshot(spark, path).count() == n * 50


def test_stale_parquet_checkpoint_is_ignored(spark, tmp_path):
    # same-path table dropped and recreated: txid guard must reject
    path = str(tmp_path / "t")
    n = snap._CHECKPOINT_INTERVAL + 1
    _chain(spark, path, n)
    v = _force_ckpt(path)
    assert snap._read_ckpt_arrow(path, v, "not-the-txid") is None
    assert snap._resolve_arrow(path, v) is not None  # real txid resolves
