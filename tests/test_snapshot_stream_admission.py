"""Admission control on the snapshot streaming source (round 8):
max_files_per_trigger caps batches, the initial snapshot chunks into
resumable offsets, and offset arithmetic is deterministic."""
from __future__ import annotations

import time

import pytest

from pyspark.sql import functions as F

from harmony_energy_data_pipeline_spark.sinks import snapshots as snap
from harmony_energy_data_pipeline_spark.sources.snapstream import (
    SnapshotStreamReader,
    SnapshotTableDataSource,
)


@pytest.fixture(scope="module")
def registered(spark):
    spark.dataSource.register(SnapshotTableDataSource)
    return spark


def _write(spark, path, lo, hi, mode="append", files=1):
    df = spark.range(lo, hi).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    ).repartition(files)
    snap.snapshot_write(df, path, mode=mode)


def _reader(path, **opts) -> SnapshotStreamReader:
    from pyspark.sql.types import LongType, StructType

    schema = StructType().add("k", LongType()).add("v", LongType())
    return SnapshotStreamReader(path, schema, {"path": path, **opts})


def test_initial_snapshot_chunks_and_completes(spark, tmp_path):
    path = str(tmp_path / "t")
    _write(spark, path, 0, 70, mode="overwrite", files=7)
    r = _reader(path, max_files_per_trigger="3")
    offs = [r.initialOffset()]
    for _ in range(5):
        nxt = r.latestOffset()
        if nxt == offs[-1]:
            break
        offs.append(nxt)
    assert offs == [
        {"version": -1, "snapshot": True},
        {"snap_v": 0, "idx": 3},
        {"snap_v": 0, "idx": 6},
        {"version": 0},
    ]
    # per-chunk partitions: 3 + 3 + 1 files, no overlap, full cover
    seen: list[str] = []
    for a, b in zip(offs, offs[1:]):
        parts = r.partitions(a, b)
        assert len(parts) <= 3
        seen.extend(p.file for p in parts)
    assert len(seen) == 7 and len(set(seen)) == 7
    m = snap._read_manifest(path, 0)
    assert set(seen) == {snap._abs_file(path, f) for f in m["files"]}


def test_tail_batches_admit_whole_versions_within_budget(spark, tmp_path):
    path = str(tmp_path / "t")
    _write(spark, path, 0, 10, mode="overwrite", files=1)   # v0
    _write(spark, path, 10, 20, files=2)                    # v1: 2 files
    _write(spark, path, 20, 30, files=2)                    # v2: 2 files
    _write(spark, path, 30, 40, files=4)                    # v3: 4 files
    r = _reader(path, max_files_per_trigger="4")
    r._cursor = {"version": 0}
    # v1+v2 fit the 4-file budget; v3 would blow it -> next batch
    assert r.latestOffset() == {"version": 2}
    assert r.latestOffset() == {"version": 3}
    # an oversized single version still admits (progress guarantee)
    _write(spark, path, 40, 50, files=6)                    # v4: 6 files
    assert r.latestOffset() == {"version": 4}
    assert r.latestOffset() == {"version": 4}  # caught up: no new data


def test_restart_mid_snapshot_resumes_from_chunk_offset(spark, tmp_path):
    path = str(tmp_path / "t")
    _write(spark, path, 0, 60, mode="overwrite", files=6)
    r1 = _reader(path, max_files_per_trigger="2")
    a = r1.initialOffset()
    b = r1.latestOffset()
    first = [p.file for p in r1.partitions(a, b)]
    # fresh reader (process restart), WAL hands partitions the start:
    # a recovered batch replays EXACTLY the same files…
    r2 = _reader(path, max_files_per_trigger="2")
    replay = [p.file for p in r2.partitions(a, b)]
    assert replay == first
    # …and the cursor learned from the WAL keeps capping from there
    c = r2.latestOffset()
    assert c == {"snap_v": 0, "idx": 4}
    second = [p.file for p in r2.partitions(b, c)]
    assert len(second) == 2 and not set(second) & set(first)


def test_fresh_stream_first_latest_offset_is_capped(spark, tmp_path):
    # the REAL fresh-stream order: Spark calls latestOffset BEFORE
    # initialOffset — batch zero must still be capped
    path = str(tmp_path / "t")
    _write(spark, path, 0, 40, mode="overwrite", files=4)
    r = _reader(path, max_files_per_trigger="2")
    assert r.latestOffset() == {"snap_v": 0, "idx": 2}


def test_restart_replay_teaches_cursor_before_advance(spark, tmp_path):
    # the REAL restart order: partitions(WAL start, WAL end) replays
    # before any latestOffset — the next advance caps from the WAL
    path = str(tmp_path / "t")
    _write(spark, path, 0, 40, mode="overwrite", files=4)
    _write(spark, path, 40, 50, files=1)  # v1 lands mid-snapshot
    r = _reader(path, max_files_per_trigger="2")
    parts = r.partitions({"snapshot": True, "version": -1},
                         {"snap_v": 0, "idx": 2})
    assert len(parts) == 2
    nxt = r.latestOffset()
    assert nxt == {"version": 0}  # snapshot completes (2 files left)
    rest = r.partitions({"snap_v": 0, "idx": 2}, nxt)
    assert len(rest) == 2 and {p.version for p in rest} == {0}
    assert r.latestOffset() == {"version": 1}


def test_snapshot_remainder_plus_tail_in_one_batch(spark, tmp_path):
    # a chunk start with a tail end spans the snapshot remainder at
    # the PINNED version plus the commits after it
    path = str(tmp_path / "t")
    _write(spark, path, 0, 40, mode="overwrite", files=4)
    _write(spark, path, 40, 50, files=1)
    r = _reader(path, max_files_per_trigger="2")
    parts = r.partitions({"snap_v": 0, "idx": 2}, {"version": 1})
    assert len(parts) == 3
    assert {p.version for p in parts} == {0, 1}


def test_inconsistent_offset_pairs_fail_closed(spark, tmp_path):
    path = str(tmp_path / "t")
    _write(spark, path, 0, 40, mode="overwrite", files=4)
    r = _reader(path, max_files_per_trigger="2")
    with pytest.raises(ValueError, match="inconsistent"):
        r.partitions({"version": 0}, {"snap_v": 0, "idx": 2})
    with pytest.raises(ValueError, match="inconsistent"):
        r.partitions({"snap_v": 1, "idx": 0}, {"snap_v": 0, "idx": 2})
    with pytest.raises(ValueError, match="inconsistent"):
        r.partitions({"version": 3}, {"version": 1})


def test_end_to_end_capped_stream_delivers_everything(registered, tmp_path):
    spark = registered
    path = str(tmp_path / "t")
    ckpt = str(tmp_path / "ck")
    _write(spark, path, 0, 50, mode="overwrite", files=5)
    _write(spark, path, 50, 60, files=2)
    q = (
        spark.readStream.format("snapshot_table")
        .option("path", path).option("max_files_per_trigger", "2")
        .load().writeStream.format("memory")
        .queryName("r8_capped").outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(processingTime="50 milliseconds").start()
    )
    try:
        deadline = time.time() + 120
        while time.time() < deadline:
            if spark.table("r8_capped").count() == 60:
                break
            time.sleep(0.5)
        got = sorted(r.k for r in spark.table("r8_capped").collect())
        assert got == list(range(60))
        # batches were actually capped: >1 microbatch ran
        prog = q.recentProgress
        assert len(prog) >= 3
    finally:
        q.stop()


def test_byte_budget_chunks_snapshot_and_tail(spark, tmp_path):
    import os

    path = str(tmp_path / "t")
    _write(spark, path, 0, 40, mode="overwrite", files=4)
    m = snap._read_manifest(path, 0)
    sizes = [os.path.getsize(snap._abs_file(path, f)) for f in m["files"]]
    # budget just under two files: the 4-file snapshot chunks at 2
    r = _reader(path, max_bytes_per_trigger=str(sizes[0] + sizes[1] - 1))
    r.initialOffset()
    assert r.latestOffset() == {"snap_v": 0, "idx": 2}
    assert r.latestOffset() == {"version": 0}
    # tail: versions admit while bytes fit; an oversized version still
    # admits ALONE (progress guarantee)
    _write(spark, path, 40, 50, files=1)   # v1
    _write(spark, path, 50, 60, files=1)   # v2
    _write(spark, path, 60, 100, files=4)  # v3: over budget by itself
    seen = []
    for _ in range(6):
        o = r.latestOffset()
        if seen and o["version"] == seen[-1]:
            break
        seen.append(o["version"])
        if o == {"version": 3}:
            break
    assert seen[-1] == 3 and len(seen) >= 2  # capped into >1 batch
    assert seen == sorted(seen)


def test_byte_and_file_budgets_compose(spark, tmp_path):
    path = str(tmp_path / "t")
    _write(spark, path, 0, 60, mode="overwrite", files=6)
    import os

    m = snap._read_manifest(path, 0)
    per_file = os.path.getsize(snap._abs_file(path, m["files"][0]))
    # byte budget allows ~4 files, file budget only 3 -> 3 wins
    r = _reader(
        path, max_files_per_trigger="3",
        max_bytes_per_trigger=str(int(per_file * 4)),
    )
    r.initialOffset()
    assert r.latestOffset() == {"snap_v": 0, "idx": 3}
    # byte budget of 1 file beats the 3-file cap
    r2 = _reader(
        path, max_files_per_trigger="3",
        max_bytes_per_trigger=str(int(per_file * 0.5)),
    )
    r2.initialOffset()
    assert r2.latestOffset() == {"snap_v": 0, "idx": 1}


def test_cap_zero_or_absent_means_unlimited(spark, tmp_path):
    path = str(tmp_path / "t")
    _write(spark, path, 0, 30, mode="overwrite", files=3)
    r = _reader(path)
    r.initialOffset()
    assert r.latestOffset() == {"version": 0}
    with pytest.raises(ValueError):
        _reader(path, max_files_per_trigger="-1")
