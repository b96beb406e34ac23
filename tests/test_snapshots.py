"""Snapshot log: atomic manifest commits, time travel, CAS, vacuum."""
from __future__ import annotations

import glob
import os

import pytest

from pyspark.sql import functions as F

from harmony_energy_data_pipeline_spark.sinks import snapshots as snap


def _df(spark, lo, hi):
    return spark.range(lo, hi).select(F.col("id").alias("k"))


def _keys(spark, path, version=None):
    return sorted(
        r.k for r in snap.read_snapshot(spark, path, version).collect()
    )


def test_overwrite_append_and_time_travel(spark, tmp_path):
    path = str(tmp_path / "tbl")
    v0 = snap.snapshot_write(_df(spark, 0, 5), path, mode="overwrite")
    v1 = snap.snapshot_write(_df(spark, 5, 8), path, mode="append")
    v2 = snap.snapshot_write(_df(spark, 100, 102), path, mode="overwrite")
    assert (v0, v1, v2) == (0, 1, 2)
    # latest = the overwrite
    assert _keys(spark, path) == [100, 101]
    # time travel to every prior version
    assert _keys(spark, path, 0) == [0, 1, 2, 3, 4]
    assert _keys(spark, path, 1) == [0, 1, 2, 3, 4, 5, 6, 7]
    hist = snap.snapshot_history(path)
    assert [(h["version"], h["parent"], h["operation"]) for h in hist] == [
        (0, None, "overwrite"), (1, 0, "append"), (2, 1, "overwrite"),
    ]


def test_reader_is_frozen_across_commits(spark, tmp_path):
    path = str(tmp_path / "tbl")
    snap.snapshot_write(_df(spark, 0, 3), path)
    frozen = snap.read_snapshot(spark, path)  # resolve latest NOW
    snap.snapshot_write(_df(spark, 10, 20), path, mode="overwrite")
    # the old DataFrame still sees its version's file list
    assert sorted(r.k for r in frozen.collect()) == [0, 1, 2]
    assert _keys(spark, path) == list(range(10, 20))


def test_orphaned_data_invisible_without_manifest(spark, tmp_path):
    path = str(tmp_path / "tbl")
    snap.snapshot_write(_df(spark, 0, 3), path)
    # simulate a crash BEFORE manifest publish: data files exist,
    # no manifest references them
    _df(spark, 50, 60).write.parquet(os.path.join(path, "data", "deadbeef"))
    assert _keys(spark, path) == [0, 1, 2]
    # round 6: a YOUNG never-referenced file may be a live writer's
    # in-flight stage — default vacuum leaves it for the grace period
    assert snap.vacuum(path, keep_last=1) == 0
    assert glob.glob(os.path.join(path, "data", "deadbeef", "*.parquet"))
    # past the grace period (here: forced to zero) it is a crash orphan
    removed = snap.vacuum(path, keep_last=1, orphan_grace_s=0.0)
    assert removed > 0
    assert not glob.glob(os.path.join(path, "data", "deadbeef", "*.parquet"))
    assert _keys(spark, path) == [0, 1, 2]


def test_cas_collision_retries_to_next_version(spark, tmp_path):
    path = str(tmp_path / "tbl")
    snap.snapshot_write(_df(spark, 0, 3), path)
    # an adversary claims version 1 out from under the writer
    snap._publish_manifest(path, 1, {
        "version": 1, "parent": 0, "operation": "overwrite",
        "txid": "adversary", "committed_at_unix": 0,
        "files": snap._read_manifest(path, 0)["files"],
    })
    v = snap.snapshot_write(_df(spark, 7, 9), path, mode="overwrite")
    assert v == 2  # retried, did not overwrite the adversary's commit
    assert _keys(spark, path, 2) == [7, 8]


def test_publish_is_exclusive(spark, tmp_path):
    path = str(tmp_path / "tbl")
    snap.snapshot_write(_df(spark, 0, 2), path)
    with pytest.raises(FileExistsError):
        snap._publish_manifest(path, 0, {"version": 0, "parent": None,
                                         "operation": "overwrite",
                                         "txid": "x", "committed_at_unix": 0,
                                         "files": []})


def test_vacuum_expires_versions_keeps_latest(spark, tmp_path):
    path = str(tmp_path / "tbl")
    snap.snapshot_write(_df(spark, 0, 4), path)
    snap.snapshot_write(_df(spark, 4, 6), path, mode="append")
    snap.snapshot_write(_df(spark, 9, 12), path, mode="overwrite")
    removed = snap.vacuum(path, keep_last=1)
    assert removed > 0
    assert _keys(spark, path) == [9, 10, 11]
    with pytest.raises(FileNotFoundError):
        snap.read_snapshot(spark, path, 0)
    # append chains share files: vacuum keeping an append version must
    # keep its inherited parent files too
    path2 = str(tmp_path / "tbl2")
    snap.snapshot_write(_df(spark, 0, 4), path2)
    snap.snapshot_write(_df(spark, 4, 6), path2, mode="append")
    snap.vacuum(path2, keep_last=1)
    assert _keys(spark, path2) == [0, 1, 2, 3, 4, 5]


def test_incremental_read_between_versions(spark, tmp_path):
    path = str(tmp_path / "tbl")
    snap.snapshot_write(_df(spark, 0, 3), path)                    # v0
    snap.snapshot_write(_df(spark, 3, 7), path, mode="append")     # v1
    snap.snapshot_write(_df(spark, 7, 9), path, mode="append")     # v2
    delta = snap.read_snapshot_changes(spark, path, 0, 2)
    assert sorted(r.k for r in delta.collect()) == [3, 4, 5, 6, 7, 8]
    # consuming (1, 2] yields only v2's batch
    d2 = snap.read_snapshot_changes(spark, path, 1, 2)
    assert sorted(r.k for r in d2.collect()) == [7, 8]
    # empty range -> zero rows with the table schema
    d0 = snap.read_snapshot_changes(spark, path, 2, 2)
    assert d0.count() == 0 and d0.columns == ["k"]


def test_incremental_read_refuses_overwrite_in_range(spark, tmp_path):
    path = str(tmp_path / "tbl")
    snap.snapshot_write(_df(spark, 0, 3), path)                    # v0
    snap.snapshot_write(_df(spark, 10, 12), path, mode="overwrite")  # v1
    snap.snapshot_write(_df(spark, 12, 14), path, mode="append")   # v2
    with pytest.raises(ValueError, match="overwrite"):
        snap.read_snapshot_changes(spark, path, 0, 2)
    # but the post-overwrite append range is fine
    d = snap.read_snapshot_changes(spark, path, 1, 2)
    assert sorted(r.k for r in d.collect()) == [12, 13]


def test_streaming_snapshot_sink_exactly_once_across_restart(spark, tmp_path, sf_dir):
    """Append-only stream → versioned snapshot commits, one per
    micro-batch, exactly-once across a restart: re-delivered batch ids
    are skipped via the manifest commit log (no natural key needed)."""
    from harmony_energy_data_pipeline_spark.io import load_table
    from harmony_energy_data_pipeline_spark.streaming.incremental import (
        file_stream,
        start_snapshot_append_sink,
    )

    ev = load_table(spark, "events", sf_dir).select("event_id", "value")
    src = tmp_path / "snap_stream_src"
    table = str(tmp_path / "snap_stream_tbl")
    ckpt = str(tmp_path / "snap_stream_ckpt")

    half1 = ev.filter(F.col("event_id") % 2 == 0)
    half1.repartition(2).write.mode("overwrite").parquet(str(src))
    schema = spark.read.parquet(str(src)).schema
    q1 = start_snapshot_append_sink(
        file_stream(spark, str(src), schema, max_files_per_trigger=1),
        table, ckpt,
    )
    q1.awaitTermination(120)
    assert snap.read_snapshot(spark, table).count() == half1.count()
    v_after_run1 = snap.latest_version(table)

    # the commit log records every stream batch id durably — the
    # foreachBatch replay guard keys off this set
    from harmony_energy_data_pipeline_spark.sinks.snapshots import (
        committed_marker_values,
    )

    assert 0 in committed_marker_values(table, "stream_batch_id")

    # run 2: second half arrives; restart from the same checkpoint
    half2 = ev.filter(F.col("event_id") % 2 == 1)
    half2.coalesce(1).write.mode("append").parquet(str(src))
    q2 = start_snapshot_append_sink(
        file_stream(spark, str(src), schema, max_files_per_trigger=1),
        table, ckpt,
    )
    q2.awaitTermination(120)

    final = snap.read_snapshot(spark, table)
    assert final.count() == ev.count()
    assert final.select("event_id").distinct().count() == ev.count()
    # versions advanced (new commits), run-1 versions untouched
    assert snap.latest_version(table) > v_after_run1
    # every commit is consumable incrementally, exactly once
    total = 0
    for v in range(0, snap.latest_version(table) + 1):
        if v == 0:
            total += snap.read_snapshot(spark, table, 0).count()
        else:
            total += snap.read_snapshot_changes(spark, table, v - 1, v).count()
    assert total == ev.count()


def test_streaming_snapshot_sink_commit_ids_are_query_scoped(spark, tmp_path, sf_dir):
    """Two different queries (distinct checkpoints, batch ids both
    starting at 0) appending to the SAME table must not skip each
    other's batches."""
    from harmony_energy_data_pipeline_spark.io import load_table
    from harmony_energy_data_pipeline_spark.streaming.incremental import (
        file_stream,
        start_snapshot_append_sink,
    )

    ev = load_table(spark, "events", sf_dir).select("event_id", "value")
    a = ev.filter(F.col("event_id") % 2 == 0)
    b = ev.filter(F.col("event_id") % 2 == 1)
    table = str(tmp_path / "shared_tbl")
    for name, part in (("a", a), ("b", b)):
        src = str(tmp_path / f"src_{name}")
        part.coalesce(1).write.mode("overwrite").parquet(src)
        schema = spark.read.parquet(src).schema
        q = start_snapshot_append_sink(
            file_stream(spark, src, schema),
            table, str(tmp_path / f"ckpt_{name}"),
        )
        q.awaitTermination(120)
    # query B's batch 0 must have landed despite A's batch 0 marker
    assert snap.read_snapshot(spark, table).count() == ev.count()


def test_manifest_paths_are_relative_and_table_relocates(spark, tmp_path):
    """Round-4 hardening: manifests store table-root-relative paths, so
    copying the table directory relocates it wholesale."""
    import json
    import shutil

    path = str(tmp_path / "tbl")
    snap.snapshot_write(_df(spark, 0, 4), path)
    snap.snapshot_write(_df(spark, 4, 6), path, mode="append")
    m = snap._read_manifest(path, 1)
    assert m["files"], "manifest lists files"
    assert all(not os.path.isabs(f) for f in m["files"]), m["files"]
    # relocate: plain directory copy, read from the new root
    moved = str(tmp_path / "tbl_moved")
    shutil.copytree(path, moved)
    shutil.rmtree(path)  # the old root is gone — nothing may resolve to it
    assert _keys(spark, moved) == [0, 1, 2, 3, 4, 5]
    assert _keys(spark, moved, 0) == [0, 1, 2, 3]
    # maintenance works at the new root too
    snap.snapshot_write(_df(spark, 9, 11), moved, mode="overwrite")
    removed = snap.vacuum(moved, keep_last=1)
    assert removed > 0
    assert _keys(spark, moved) == [9, 10]


def test_vacuum_is_cwd_independent(spark, tmp_path, monkeypatch):
    """ADVICE r3: vacuum used abspath against the CALLER's cwd; with
    relative manifests it must resolve the same live set from any
    working directory (a wrong resolution deletes every live file)."""
    path = str(tmp_path / "tbl")
    snap.snapshot_write(_df(spark, 0, 5), path)
    snap.snapshot_write(_df(spark, 5, 7), path, mode="append")
    elsewhere = tmp_path / "unrelated_cwd"
    elsewhere.mkdir()
    monkeypatch.chdir(elsewhere)
    snap.vacuum(path, keep_last=1)
    assert _keys(spark, path) == [0, 1, 2, 3, 4, 5, 6]


def test_rename_protocol_write_read_vacuum(spark, tmp_path):
    """The object-store-shaped publish path (tmp + check + rename +
    read-back verify) supports the full lifecycle."""
    path = str(tmp_path / "tbl")
    v0 = snap.snapshot_write(_df(spark, 0, 3), path, protocol="rename")
    v1 = snap.snapshot_write(
        _df(spark, 3, 5), path, mode="append", protocol="rename"
    )
    assert (v0, v1) == (0, 1)
    assert _keys(spark, path) == [0, 1, 2, 3, 4]
    assert _keys(spark, path, 0) == [0, 1, 2]
    snap.snapshot_write(_df(spark, 8, 9), path, protocol="rename")
    assert snap.vacuum(path, keep_last=1) > 0
    assert _keys(spark, path) == [8]


def test_rename_protocol_detects_lost_race(spark, tmp_path):
    """Rename is last-writer-wins; the read-back verify must surface a
    lost race as FileExistsError so snapshot_write retries at N+1."""
    path = str(tmp_path / "tbl")
    snap.snapshot_write(_df(spark, 0, 2), path)
    # version 1 already claimed by an adversary
    snap._publish_manifest(path, 1, {
        "version": 1, "parent": 0, "operation": "overwrite",
        "txid": "adversary", "committed_at_unix": 0,
        "files": snap._read_manifest(path, 0)["files"],
    })
    with pytest.raises(FileExistsError):
        snap._publish_manifest(path, 1, {
            "version": 1, "parent": 0, "operation": "overwrite",
            "txid": "loser", "committed_at_unix": 0, "files": [],
        }, protocol="rename")
    # and the writer-level retry lands on v2
    v = snap.snapshot_write(_df(spark, 7, 9), path, protocol="rename")
    assert v == 2


def test_vacuum_preserves_commit_markers(spark, tmp_path):
    """ADVICE r3 (medium): expiring a manifest must not forget its
    stream commit marker — otherwise a restarted query's replayed
    batch looks uncommitted and commits twice. vacuum folds expired
    markers into the compacted commit log."""
    path = str(tmp_path / "tbl")
    snap.snapshot_write(
        _df(spark, 0, 3), path, extra={"stream_commit_id": "qA-0"}
    )
    snap.snapshot_write(
        _df(spark, 3, 5), path, mode="append",
        extra={"stream_commit_id": "qB-0"},
    )
    snap.snapshot_write(
        _df(spark, 5, 6), path, mode="append",
        extra={"stream_commit_id": "qA-1"},
    )
    before = snap.committed_marker_values(path, "stream_commit_id")
    assert before == {"qA-0", "qB-0", "qA-1"}
    snap.vacuum(path, keep_last=1)
    after = snap.committed_marker_values(path, "stream_commit_id")
    assert after == {"qA-0", "qB-0", "qA-1"}
    # idempotent across repeated vacuums and survives further commits
    snap.snapshot_write(
        _df(spark, 6, 7), path, mode="append",
        extra={"stream_commit_id": "qB-1"},
    )
    snap.vacuum(path, keep_last=1)
    assert snap.committed_marker_values(path, "stream_commit_id") == {
        "qA-0", "qB-0", "qA-1", "qB-1"
    }


def test_snapshot_compact_preserves_content_and_history(spark, tmp_path):
    """Round-4: compaction rewrites many small append files into few,
    commits as a new overwrite version, keeps old versions readable
    (MVCC), and survives a vacuum."""
    path = str(tmp_path / "tbl")
    # 6 appends × multi-partition writes = a small-file pile
    for i in range(6):
        snap.snapshot_write(
            _df(spark, i * 10, i * 10 + 10).repartition(4), path,
            mode="append" if i else "overwrite",
        )
    v_before = snap.latest_version(path)
    n_files_before = len(snap._read_manifest(path, v_before)["files"])
    assert n_files_before >= 20
    v = snap.snapshot_compact(spark, path, target_file_mb=128)
    assert v == v_before + 1
    m = snap._read_manifest(path, v)
    assert len(m["files"]) < n_files_before / 4
    assert m["compacted_from"] == v_before
    assert _keys(spark, path) == list(range(60))
    # pre-compaction version still time-travels
    assert _keys(spark, path, v_before) == list(range(60))
    # vacuum drops the small files; content intact
    snap.vacuum(path, keep_last=1)
    assert _keys(spark, path) == list(range(60))


def test_snapshot_compact_refuses_jsonl_tables(spark, tmp_path, sf_dir):
    import pytest as _pytest

    from harmony_energy_data_pipeline_spark.io import load_table
    from harmony_energy_data_pipeline_spark.sinks.export import write_jsonl_shards

    docs = load_table(spark, "documents", sf_dir).select("doc_id", "text").limit(20)
    out = str(tmp_path / "jsonl")
    write_jsonl_shards(docs, out, n_shards=2, shard_key="doc_id")
    with _pytest.raises(ValueError, match="parquet"):
        snap.snapshot_compact(spark, out)


def test_snapshot_log_random_lifecycle_preserves_content(spark, tmp_path):
    """Property-style: any interleaving of append/overwrite/compact/
    vacuum must keep read_snapshot() equal to the model (a plain set
    the test maintains), and maintenance must never lose markers."""
    import random

    rng = random.Random(42)
    for trial in range(3):
        path = str(tmp_path / f"tbl{trial}")
        model: list[int] = []
        nxt = 0
        markers = set()
        ops = []
        for step in range(8):
            op = rng.choice(["append", "append", "overwrite", "compact", "vacuum"])
            if op in ("append", "overwrite") or snap.latest_version(path) is None:
                if snap.latest_version(path) is None:
                    op = "overwrite"
                lo, hi = nxt, nxt + rng.randint(1, 12)
                nxt = hi
                marker = f"m{trial}-{step}"
                snap.snapshot_write(
                    _df(spark, lo, hi).repartition(rng.randint(1, 3)),
                    path, mode=op, extra={"stream_commit_id": marker},
                )
                markers.add(marker)
                if op == "overwrite":
                    model = list(range(lo, hi))
                else:
                    model.extend(range(lo, hi))
            elif op == "compact":
                snap.snapshot_compact(spark, path, target_file_mb=64)
            else:
                snap.vacuum(path, keep_last=rng.randint(1, 2))
            ops.append(op)
            assert _keys(spark, path) == sorted(model), (trial, step, ops)
        assert snap.committed_marker_values(path, "stream_commit_id") >= markers, ops


def test_concurrent_writers_all_commit_distinct_versions(spark, tmp_path):
    """Real-thread CAS exercise: N writers racing the same table must
    each commit (retrying through lost races) with distinct versions
    and no lost updates, for both publish protocols."""
    import threading

    for protocol in ("link", "rename"):
        path = str(tmp_path / f"tbl_{protocol}")
        snap.snapshot_write(_df(spark, 0, 2), path, protocol=protocol)
        results: list[int] = []
        errors: list[Exception] = []
        lock = threading.Lock()

        def writer(i: int) -> None:
            try:
                v = snap.snapshot_write(
                    _df(spark, 100 + i * 10, 100 + i * 10 + 3), path,
                    mode="append", max_retries=50, protocol=protocol,
                )
                with lock:
                    results.append(v)
            except Exception as exc:  # surfaced below
                with lock:
                    errors.append(exc)

        threads = [threading.Thread(target=writer, args=(i,)) for i in range(4)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(120)
        assert not errors, errors
        assert sorted(results) == [1, 2, 3, 4], (protocol, results)
        # all four appends landed exactly once
        keys = _keys(spark, path)
        assert keys == [0, 1] + sorted(
            k for i in range(4) for k in range(100 + i * 10, 100 + i * 10 + 3)
        ), (protocol, keys)


def test_vacuum_rejects_keep_last_zero(spark, tmp_path):
    path = str(tmp_path / "tbl")
    snap.snapshot_write(_df(spark, 0, 3), path)
    with pytest.raises(ValueError, match="keep_last"):
        snap.vacuum(path, keep_last=0)
    assert _keys(spark, path) == [0, 1, 2]


def test_snapshot_restore_rolls_back_without_deleting_history(spark, tmp_path):
    """Restore = a new overwrite commit pointing at an old version's
    files: metadata-only, history intact, vacuum-safe afterward."""
    path = str(tmp_path / "tbl")
    snap.snapshot_write(_df(spark, 0, 5), path)                     # v0 good
    snap.snapshot_write(_df(spark, 100, 103), path, mode="append")  # v1 bad
    snap.snapshot_write(_df(spark, 200, 201), path, mode="append")  # v2 bad
    v = snap.snapshot_restore(path, 0)
    assert v == 3
    assert _keys(spark, path) == [0, 1, 2, 3, 4]
    # the bad history is still inspectable (time travel) until vacuum
    assert _keys(spark, path, 2) == [0, 1, 2, 3, 4, 100, 101, 102, 200]
    m = snap._read_manifest(path, v)
    assert m["restored_from"] == 0 and m["operation"] == "overwrite"
    # vacuum keeps only the restore; shared files with v0 survive
    snap.vacuum(path, keep_last=1)
    assert _keys(spark, path) == [0, 1, 2, 3, 4]
    with pytest.raises(FileNotFoundError):
        snap.read_snapshot(spark, path, 1)
    # append after restore continues the chain
    snap.snapshot_write(_df(spark, 50, 52), path, mode="append")
    assert _keys(spark, path) == [0, 1, 2, 3, 4, 50, 51]


def test_snapshot_restore_unknown_version_raises(spark, tmp_path):
    path = str(tmp_path / "tbl")
    snap.snapshot_write(_df(spark, 0, 2), path)
    with pytest.raises(FileNotFoundError):
        snap.snapshot_restore(path, 7)


def test_vacuum_time_based_retention(spark, tmp_path):
    """keep_newer_than_s keeps recent snapshots beyond the count
    window; an aged commit log expires normally."""
    import json
    import os as _os

    path = str(tmp_path / "tbl")
    for i in range(4):
        # overwrites: each version owns its files, so expiry frees data
        snap.snapshot_write(_df(spark, 0, (i + 1) * 5), path)
    # age the first two manifests artificially
    for v in (0, 1):
        mp = _os.path.join(path, "_snapshots", f"v{v:012d}.json")
        m = json.load(open(mp))
        m["committed_at_unix"] -= 7 * 86400
        _os.remove(mp)
        json.dump(m, open(mp, "w"))
    # count window alone would keep only v3; the time window saves v2
    removed = snap.vacuum(path, keep_last=1, orphan_grace_s=0.0,
                          keep_newer_than_s=3600.0)
    vs = [h["version"] for h in snap.snapshot_history(path)]
    assert vs == [2, 3]
    assert removed >= 1  # v0/v1's overwrite files freed
    # survivors still read
    assert len(_keys(spark, path, 3)) == 20
    assert len(_keys(spark, path, 2)) == 15


def test_snapshot_log_random_lifecycle_with_row_ops(spark, tmp_path):
    """Round-7 extension of the random-lifecycle property: interleave
    COW deletes, DV deletes, and MOR updates with appends/overwrites/
    compactions/vacuums — ``read_snapshot()`` must equal the model (a
    plain dict k→v the test maintains) after EVERY step."""
    import random

    from pyspark.sql import functions as F

    rng = random.Random(7)

    def df(lo, hi):
        return spark.range(lo, hi).select(
            F.col("id").alias("k"), (F.col("id") * 10).alias("v")
        )

    for trial in range(3):
        path = str(tmp_path / f"tbl{trial}")
        model: dict[int, int] = {}
        nxt = 0
        ops = []
        for step in range(10):
            op = rng.choice([
                "append", "append", "overwrite", "compact", "vacuum",
                "cow_delete", "dv_delete", "mor_update", "dv_delete",
                "replace", "merge",
            ])
            if snap.latest_version(path) is None:
                op = "overwrite"
            if op in ("append", "overwrite"):
                lo, hi = nxt, nxt + rng.randint(3, 15)
                nxt = hi
                snap.snapshot_write(
                    df(lo, hi).repartition(rng.randint(1, 3)),
                    path, mode=op, stats_cols=["k"],
                )
                fresh = {k: k * 10 for k in range(lo, hi)}
                model = fresh if op == "overwrite" else {**model, **fresh}
            elif op == "compact":
                snap.snapshot_compact(spark, path, target_file_mb=64)
            elif op == "vacuum":
                snap.vacuum(path, keep_last=rng.randint(1, 2),
                            orphan_grace_s=0.0)
            elif model:
                ks = sorted(model)
                a = rng.choice(ks)
                b = a + rng.randint(0, 8)
                where = [("k", a, b)]
                if op == "cow_delete":
                    try:
                        snap.snapshot_delete_where(
                            spark, path, where,
                            record_cdf=rng.random() < 0.5,
                        )
                    except ValueError:
                        continue  # would delete every row: refused
                    model = {k: v for k, v in model.items()
                             if not (a <= k <= b)}
                elif op == "dv_delete":
                    snap.snapshot_delete_where_dv(spark, path, where)
                    model = {k: v for k, v in model.items()
                             if not (a <= k <= b)}
                elif op == "replace":
                    # the region swaps to replacement rows (v = k+7);
                    # the batch may mint keys past the high-water mark,
                    # so advance it or a later append would duplicate
                    # them (the model is a dict: keys must stay unique)
                    nxt = max(nxt, b + 1)
                    batch = df(a, b + 1).withColumn(
                        "v", F.col("k") + F.lit(7)
                    )
                    try:
                        snap.snapshot_replace_where(
                            spark, path, where, batch,
                            record_cdf=rng.random() < 0.5,
                        )
                    except ValueError:
                        continue  # would empty the table: refused
                    model = {k: v for k, v in model.items()
                             if not (a <= k <= b)}
                    model.update({k: k + 7 for k in range(a, b + 1)})
                elif op == "merge":
                    # revise the range's rows AND insert two new keys;
                    # the range itself may mint keys past the
                    # high-water mark (see "replace")
                    nxt = max(nxt, b + 1)
                    new_lo = nxt
                    nxt += 2
                    src = df(a, b + 1).withColumn(
                        "v", F.col("k") - F.lit(3)
                    ).unionByName(df(new_lo, new_lo + 2))
                    snap.snapshot_merge_into(
                        spark, path, src, key="k",
                        record_cdf=rng.random() < 0.5,
                    )
                    model.update({k: k - 3 for k in range(a, b + 1)})
                    model.update(
                        {k: k * 10 for k in range(new_lo, new_lo + 2)}
                    )
                else:
                    snap.snapshot_update_where_dv(
                        spark, path, where, {"v": F.col("v") + 1}
                    )
                    model = {
                        k: (v + 1 if a <= k <= b else v)
                        for k, v in model.items()
                    }
            ops.append(op)
            got = {
                r.k: r.v
                for r in snap.read_snapshot(spark, path).collect()
            }
            assert got == model, (trial, step, ops)
            agg = snap.snapshot_stats_agg(path)
            if agg["n_rows"] is not None:
                assert agg["n_rows"] == len(model), (trial, step, ops)


def test_snapshot_write_many_matches_sequential(spark, tmp_path):
    """Concurrent staging + ordered publish ≡ a sequential write loop."""
    seq = str(tmp_path / "seq")
    par = str(tmp_path / "par")
    batches = [(_df(spark, 0, 5), "overwrite"),
               (_df(spark, 5, 8), "append"),
               (_df(spark, 100, 103), "overwrite"),
               (_df(spark, 103, 104), "append")]
    for df, mode in batches:
        snap.snapshot_write(df, seq, mode=mode)
    versions = snap.snapshot_write_many(batches, par)
    assert versions == [0, 1, 2, 3]
    for v in range(4):
        assert _keys(spark, par, v) == _keys(spark, seq, v)
    hist_ops = [(h["version"], h["parent"], h["operation"])
                for h in snap.snapshot_history(par)]
    assert hist_ops == [(0, None, "overwrite"), (1, 0, "append"),
                        (2, 1, "overwrite"), (3, 2, "append")]


def test_snapshot_write_many_falls_back_on_spec_tables(spark, tmp_path):
    """A parent carrying table-level specs routes through the
    sequential path so constraint/layout inheritance sees the true
    parent of each batch."""
    path = str(tmp_path / "tbl")
    snap.snapshot_write(
        _df(spark, 0, 5).withColumn("p", F.col("k") % 2), path,
        partition_by=["p"],
    )
    vs = snap.snapshot_write_many(
        [(_df(spark, 5, 8).withColumn("p", F.col("k") % 2), "append"),
         (_df(spark, 8, 9).withColumn("p", F.col("k") % 2), "append")],
        path,
    )
    assert vs == [1, 2]
    # appends inherited the partition layout from their true parents
    m = snap._read_manifest(path, 2)
    assert m.get("partition_cols") == ["p"]
    assert _keys(spark, path) == list(range(9))


def test_snapshot_write_many_rejects_bad_mode(spark, tmp_path):
    with pytest.raises(ValueError):
        snap.snapshot_write_many(
            [(_df(spark, 0, 3), "merge")], str(tmp_path / "t"))
