"""Scheduled snapshot maintenance: locked compact+vacuum passes,
lock contention/staleness, and the streaming-ingest +
background-maintenance composition (round 5)."""
from __future__ import annotations

import json
import os
import time

import pytest

from pyspark.sql import functions as F

from harmony_energy_data_pipeline_spark.pipeline import maintenance as mnt
from harmony_energy_data_pipeline_spark.sinks import snapshots as snap


def _df(spark, lo, hi):
    return spark.range(lo, hi).select(F.col("id").alias("k"))


def _pile(spark, path, n_commits=5, parts=3):
    for i in range(n_commits):
        snap.snapshot_write(
            _df(spark, i * 10, i * 10 + 10).repartition(parts), path,
            mode="append" if i else "overwrite",
        )


def test_run_maintenance_compacts_and_vacuums(spark, tmp_path):
    path = str(tmp_path / "tbl")
    _pile(spark, path)
    files_before = len(
        snap._read_manifest(path, snap.latest_version(path))["files"]
    )
    assert files_before >= 10
    out = mnt.run_maintenance(spark, path, vacuum_keep=1)
    assert out["compacted"] is True
    assert out["files_before"] == files_before
    assert out["files_after"] < files_before
    assert out["vacuum_removed"] > 0
    assert sorted(
        r.k for r in snap.read_snapshot(spark, path).collect()
    ) == list(range(50))
    # lock released: a second pass runs — and skips (already compact)
    out2 = mnt.run_maintenance(spark, path, vacuum_keep=1)
    assert out2["compacted"] is False
    assert "already compact" in out2["skipped_reason"]


def test_run_maintenance_empty_table_is_noop(spark, tmp_path):
    path = str(tmp_path / "empty")
    out = mnt.run_maintenance(spark, path)
    assert out["skipped_reason"] == "no snapshots"
    assert not os.path.exists(mnt._lock_path(path))  # lock released


def test_lock_contention_refuses_second_maintainer(spark, tmp_path):
    path = str(tmp_path / "tbl")
    _pile(spark, path, n_commits=2)
    mnt.acquire_maintenance_lock(path)
    try:
        with pytest.raises(mnt.MaintenanceLockHeld, match="run one"):
            mnt.run_maintenance(spark, path)
    finally:
        mnt.release_maintenance_lock(path)
    # after release the pass proceeds
    assert mnt.run_maintenance(spark, path)["compacted"] is True


def test_stale_lock_is_broken(spark, tmp_path):
    path = str(tmp_path / "tbl")
    _pile(spark, path, n_commits=2)
    lp = mnt._lock_path(path)
    os.makedirs(os.path.dirname(lp), exist_ok=True)
    # a dead pid's leftover lock (pid 2^22+ is above default pid_max)
    with open(lp, "w", encoding="utf-8") as fh:
        json.dump({"pid": 2**22 + 12345, "at_unix": time.time()}, fh)
    assert mnt.run_maintenance(spark, path)["compacted"] is True
    # an EXPIRED live-pid lock is also broken
    with open(lp, "w", encoding="utf-8") as fh:
        json.dump({"pid": os.getpid(), "at_unix": time.time() - 7200}, fh)
    out = mnt.run_maintenance(spark, path, stale_after_s=3600)
    assert out["skipped_reason"] is not None or out["compacted"] is not None
    # a corrupt lock never wedges the table
    with open(lp, "w", encoding="utf-8") as fh:
        fh.write("{torn")
    assert mnt.run_maintenance(spark, path) is not None
    assert not os.path.exists(lp)


def test_streaming_ingest_with_background_maintenance(spark, tmp_path, sf_dir):
    """The VERDICT-8 composition: N streaming append commits with
    INLINE compaction OFF, then the scheduled maintenance job takes
    over — file count drops, content stays exact, commit markers
    survive, and the single-writer lock is what serializes passes."""
    from harmony_energy_data_pipeline_spark.io import load_table
    from harmony_energy_data_pipeline_spark.streaming.incremental import (
        file_stream,
        start_snapshot_append_sink,
    )

    ev = load_table(spark, "events", sf_dir).select("event_id", "value")
    src = str(tmp_path / "src")
    for i in range(4):
        ev.filter(F.col("event_id") % 4 == i).repartition(3).write.mode(
            "append"
        ).parquet(src)
    schema = spark.read.parquet(src).schema
    table = str(tmp_path / "tbl")
    q = start_snapshot_append_sink(
        file_stream(spark, src, schema, max_files_per_trigger=1),
        table, str(tmp_path / "ckpt"),
        # inline maintenance OFF: the background job owns hygiene
        compact_every=None, vacuum_keep=None,
    )
    q.awaitTermination(120)
    files_before = len(
        snap._read_manifest(table, snap.latest_version(table))["files"]
    )
    assert files_before >= 8  # one small pile per micro-batch
    sched = mnt.schedule_maintenance(
        spark, table, interval_seconds=0.5, vacuum_keep=2,
    )
    try:
        deadline = time.monotonic() + 60
        while sched.run_count < 2 and time.monotonic() < deadline:
            time.sleep(0.2)
        assert sched.run_count >= 2, "scheduler never fired twice"
    finally:
        sched.stop()
    final = snap.read_snapshot(spark, table)
    assert final.count() == ev.count()
    assert final.select("event_id").distinct().count() == ev.count()
    n_live = len(
        snap._read_manifest(table, snap.latest_version(table))["files"]
    )
    assert n_live < files_before
    assert len(snap.snapshot_history(table)) <= 3  # vacuumed
    # exactly-once markers survived the maintenance vacuums
    assert len(snap.committed_marker_values(table, "stream_commit_id")) >= 4
    # the lock is not left behind
    assert not os.path.exists(mnt._lock_path(table))


def test_auto_maintain_policy_decisions(spark, tmp_path):
    from harmony_energy_data_pipeline_spark.pipeline.maintenance import (
        auto_maintain,
    )

    path = str(tmp_path / "t")
    df = spark.range(0, 5000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    )
    # fragmented: 16 tiny files
    snap.snapshot_write(df.repartition(16), path, stats_cols=["k"])
    r1 = auto_maintain(spark, path, target_file_mb=64)
    assert r1["compacted"] and "fragmentation" in r1["reason"]
    assert r1["files_after"] < r1["files_before"]
    # now healthy: second pass is a no-op
    r2 = auto_maintain(spark, path, target_file_mb=64)
    assert not r2["compacted"] and r2["reason"] == "healthy"
    # merge-on-read debt triggers even on a compact table
    snap.snapshot_delete_where_dv(spark, path, [("k", 0, 9)])
    r3 = auto_maintain(spark, path, target_file_mb=64)
    assert r3["compacted"] and "dv_debt" in r3["reason"]
    assert snap.snapshot_table_info(path)["dv_files"] == 0
    assert snap.read_snapshot(spark, path).count() == 4990
    # retention applies through the same pass
    r4 = auto_maintain(spark, path, target_file_mb=64, vacuum_keep=1,
                       orphan_grace_s=0.0)
    assert len(snap._versions(path)) == 1
