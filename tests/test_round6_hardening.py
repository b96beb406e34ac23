"""Round-6 hardening: the round-5 review's ADVICE items, each with a
test that fails on the pre-fix behavior.

1 (high)  vacuum orphan grace — maintenance running CONCURRENTLY with
          a live streaming writer must not delete the writer's
          staged-but-unpublished files (the silent-data-loss window
          between parquet stage and manifest publish).
2 (med)   stale maintenance-lock breaking is rename-first (no unlink
          TOCTOU — two contenders can never both hold the lock);
          release verifies ownership before unlinking.
3 (low)   snapshot_compact(max_redo<1) raises ValueError up front
          instead of `raise None`.
4 (low)   apply_changes folds equal-seq non-delete ties
          deterministically (content-hash tiebreak).
"""

import glob
import json
import os
import threading
import time

import pytest
from pyspark.sql import functions as F

from harmony_energy_data_pipeline_spark.io import load_table
from harmony_energy_data_pipeline_spark.pipeline import maintenance as mnt
from harmony_energy_data_pipeline_spark.sinks import snapshots as snap
from harmony_energy_data_pipeline_spark.sinks.upsert import apply_changes


def _df(spark, lo, hi):
    return spark.range(lo, hi).select(F.col("id").alias("k"))


# ---------------------------------------------------------------------------
# 1. vacuum orphan grace + maintenance concurrent with a live writer
# ---------------------------------------------------------------------------

def test_vacuum_grace_spares_young_stage_sweeps_old_orphan(spark, tmp_path):
    path = str(tmp_path / "tbl")
    snap.snapshot_write(_df(spark, 0, 3), path)
    stage = os.path.join(path, "data", "inflight-txid")
    _df(spark, 50, 55).write.parquet(stage)
    # young + never-referenced: could be a live writer mid-commit
    assert snap.vacuum(path, keep_last=1) == 0
    staged = glob.glob(os.path.join(stage, "*.parquet"))
    assert staged
    # backdate the stage past the grace period: now it is a crash orphan
    old = time.time() - 7200
    for f in staged:
        os.utime(f, (old, old))
    assert snap.vacuum(path, keep_last=1, orphan_grace_s=3600) >= len(staged)
    assert not glob.glob(os.path.join(stage, "*.parquet"))


def test_maintenance_concurrent_with_streaming_append_loses_nothing(
    spark, tmp_path, sf_dir
):
    """The ADVICE-high scenario: scheduled compact+vacuum passes run
    WHILE the snapshot append sink is actively committing micro-batches.
    Pre-fix, vacuum would sweep the sink's staged txid dir between its
    parquet stage and manifest publish; the publish then committed a
    manifest referencing deleted files. Post-fix every kept manifest's
    files must exist and the final table must hold every source row."""
    from harmony_energy_data_pipeline_spark.streaming.incremental import (
        file_stream,
        start_snapshot_append_sink,
    )

    ev = load_table(spark, "events", sf_dir).select("event_id", "value")
    src = str(tmp_path / "src")
    for i in range(8):
        ev.filter(F.col("event_id") % 8 == i).repartition(2).write.mode(
            "append"
        ).parquet(src)
    schema = spark.read.parquet(src).schema
    table = str(tmp_path / "tbl")
    # maintenance starts FIRST and keeps firing while the stream commits
    sched = mnt.schedule_maintenance(
        spark, table, interval_seconds=0.2, vacuum_keep=1, min_files=2,
    )
    try:
        q = start_snapshot_append_sink(
            file_stream(spark, src, schema, max_files_per_trigger=1),
            table, str(tmp_path / "ckpt"),
            compact_every=None, vacuum_keep=None,
        )
        q.awaitTermination(180)
        # let at least one more maintenance pass land after the stream
        runs = sched.run_count
        deadline = time.monotonic() + 30
        while sched.run_count <= runs and time.monotonic() < deadline:
            time.sleep(0.1)
    finally:
        sched.stop()
    # no kept manifest references a vanished file
    for v in snap.snapshot_history(table):
        for f in snap._read_manifest(table, v["version"])["files"]:
            full = f if os.path.isabs(f) else os.path.join(table, f)
            assert os.path.exists(full), (
                f"manifest v{v['version']} references deleted file {f}"
            )
    # and every source row survived ingest + concurrent maintenance
    final = snap.read_snapshot(spark, table)
    assert final.count() == ev.count()
    assert final.select("event_id").distinct().count() == ev.count()


# ---------------------------------------------------------------------------
# 2. stale-lock break exclusivity + release ownership
# ---------------------------------------------------------------------------

def _plant_stale_lock(table_path, age_s=7200):
    """A lock whose owner pid is dead and whose timestamp is ancient."""
    lp = mnt._lock_path(table_path)
    os.makedirs(os.path.dirname(lp), exist_ok=True)
    # a pid that cannot be alive: fork-and-reap gives a dead child pid,
    # but pid reuse makes that flaky — use one beyond pid_max instead.
    with open(lp, "w", encoding="utf-8") as fh:
        json.dump(
            {"pid": 2 ** 22 + 1, "at_unix": time.time() - age_s,
             "token": "stale"},
            fh,
        )
    return lp


def test_stale_lock_broken_by_exactly_one_contender(tmp_path):
    path = str(tmp_path / "tbl")
    _plant_stale_lock(path)
    won, lost, errs = [], [], []
    barrier = threading.Barrier(8)

    def contend():
        barrier.wait()
        try:
            won.append(mnt.acquire_maintenance_lock(path))
        except mnt.MaintenanceLockHeld:
            lost.append(1)
        except Exception as e:  # noqa: BLE001 - fail loudly below
            errs.append(e)

    ts = [threading.Thread(target=contend) for _ in range(8)]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    assert not errs
    assert len(won) == 1, f"{len(won)} contenders hold 'exclusive' locks"
    assert len(lost) == 7
    lp = mnt._lock_path(path)
    assert os.path.exists(lp)  # the winner's lock survived every loser
    with open(lp, encoding="utf-8") as fh:
        assert json.load(fh)["token"] == won[0]
    # no stale tombstones left behind
    assert not glob.glob(lp + ".stale-*")


def test_release_verifies_ownership(tmp_path):
    path = str(tmp_path / "tbl")
    token = mnt.acquire_maintenance_lock(path)
    lp = mnt._lock_path(path)
    # wrong token: not ours any more (e.g. we overran and were broken)
    mnt.release_maintenance_lock(path, token="someone-elses")
    assert os.path.exists(lp)
    # right token releases
    mnt.release_maintenance_lock(path, token=token)
    assert not os.path.exists(lp)
    # tokenless release falls back to pid ownership (same process: ours)
    mnt.acquire_maintenance_lock(path)
    mnt.release_maintenance_lock(path)
    assert not os.path.exists(lp)
    # a successor's lock (other pid, no token given) is left alone
    _plant_stale_lock(path, age_s=0)
    mnt.release_maintenance_lock(path)
    assert os.path.exists(lp)
    os.unlink(lp)


def test_overrunning_maintainer_cannot_delete_successor_lock(tmp_path):
    """A maintainer that overruns stale_after_s has its lock broken and
    re-taken; its deferred release must not unlink the successor's."""
    path = str(tmp_path / "tbl")
    old_token = mnt.acquire_maintenance_lock(path)
    # successor judges it stale (simulate by planting its own lock)
    lp = mnt._lock_path(path)
    os.unlink(lp)
    new_token = mnt.acquire_maintenance_lock(path)
    # the overrunner finally finishes and releases with ITS token
    mnt.release_maintenance_lock(path, token=old_token)
    assert os.path.exists(lp), "overrunner deleted the successor's lock"
    mnt.release_maintenance_lock(path, token=new_token)
    assert not os.path.exists(lp)


# ---------------------------------------------------------------------------
# 3. snapshot_compact max_redo validation
# ---------------------------------------------------------------------------

def test_compact_rejects_nonpositive_max_redo(spark, tmp_path):
    path = str(tmp_path / "tbl")
    snap.snapshot_write(_df(spark, 0, 3), path)
    with pytest.raises(ValueError, match="max_redo"):
        snap.snapshot_compact(spark, path, max_redo=0)
    with pytest.raises(ValueError, match="max_redo"):
        snap.snapshot_compact(spark, path, max_redo=-2)


# ---------------------------------------------------------------------------
# 4. apply_changes equal-seq determinism
# ---------------------------------------------------------------------------

def test_apply_changes_equal_seq_tie_is_deterministic(spark):
    target = spark.createDataFrame(
        [(1, "old"), (2, "keep")], "_id int, val string"
    )
    rows = [(1, "U", 5, "aaa"), (1, "U", 5, "bbb")]
    schema = "_id int, op string, seq int, val string"

    def fold(ordering):
        ch = spark.createDataFrame(ordering, schema).select(
            "_id", "op", "seq", "val"
        )
        out = apply_changes(target, ch, key="_id", seq_col="seq")
        return {(r["_id"], r["val"]) for r in out.collect()}

    a = fold(rows)
    b = fold(list(reversed(rows)))
    assert a == b, "equal-seq tie folded differently across runs"
    assert (2, "keep") in a and len(a) == 2
    # delete still wins an equal-seq tie against an upsert
    ch = spark.createDataFrame(
        [(1, "U", 5, "zzz"), (1, "D", 5, None)], schema
    )
    out = apply_changes(target, ch, key="_id", seq_col="seq")
    assert {r["_id"] for r in out.collect()} == {2}


# ---------------------------------------------------------------------------
# 5. dedup_keep_last strategies agree (round-6 A/B kept both forms)
# ---------------------------------------------------------------------------

def test_dedup_keep_last_agg_strategy_matches_window(spark, sf_dir):
    from harmony_energy_data_pipeline_spark.operators.cleaning import (
        dedup_keep_last,
    )

    # deterministic subset (NOT limit): the split route evaluates its
    # input in several plan branches, which is only coherent for
    # deterministic lineage — the same contract every multi-branch
    # plan in the engine states.
    ev = (
        load_table(spark, "events", sf_dir)
        .select("event_id", "ts", "user_id", "value")
        .filter(F.col("event_id") < 2000)
    )
    win = dedup_keep_last(ev, key="user_id", order="ts")
    expect = sorted(map(tuple, win.collect()))
    for kwargs in (
        {"strategy": "agg"},
        {"strategy": "split"},               # broadcast census route
        {"strategy": "split", "max_dup_keys": 0},  # census refuses -> window
    ):
        alt = dedup_keep_last(ev, key="user_id", order="ts", **kwargs)
        assert sorted(map(tuple, alt.collect())) == expect, kwargs
        assert alt.schema == win.schema, kwargs
    with pytest.raises(ValueError, match="strategy"):
        dedup_keep_last(ev, strategy="bogus")


def test_dedup_two_phase_split_strategy_matches_window(spark, sf_dir):
    from harmony_energy_data_pipeline_spark.operators.cleaning import (
        dedup_two_phase,
    )

    ev = load_table(spark, "events", sf_dir).select(
        F.col("event_id").alias("_id"), F.col("ts").alias("DATETIME"), "value"
    ).filter(F.col("_id") < 3000)
    # plant duplicates on both phase keys (deterministic subset — see above)
    dup = ev.filter(F.col("_id") < 50)
    frame = ev.unionByName(dup).unionByName(
        dup.withColumn("value", F.col("value") + 1)
    )
    win = dedup_two_phase(frame)
    spl = dedup_two_phase(frame, strategy="split")
    assert sorted(map(tuple, win.collect())) == sorted(map(tuple, spl.collect()))


# ---------------------------------------------------------------------------
# 6. volume-derived shuffle-partition sizing (round-5 top action item)
# ---------------------------------------------------------------------------

def test_auto_initial_partitions_tracks_volume(tmp_path, monkeypatch):
    from harmony_energy_data_pipeline_spark.session import (
        auto_initial_partitions,
    )

    monkeypatch.delenv("SPARK_GRAFT_INITIAL_PARTITIONS", raising=False)
    # tiny fixture: floor (the sf0.1-tuned 32)
    small = tmp_path / "small"
    small.mkdir()
    (small / "t.parquet").write_bytes(b"x" * 1024)
    assert auto_initial_partitions(str(small)) == 32
    # the real sf0.1 fixture also lands on the floor (17.5 MB * 4 < 64 MB*32)
    assert auto_initial_partitions("/root/testdata/sf0.1") == 32
    # a big fixture scales: bytes * explode / 64 MB
    big = tmp_path / "big"
    big.mkdir()
    with open(big / "t.parquet", "wb") as fh:
        fh.truncate(5 << 30)  # sparse 5 GiB
    n = auto_initial_partitions(str(big))
    assert 250 <= n <= 400, n
    # cap and env override
    assert auto_initial_partitions(str(big), cap=64) == 64
    monkeypatch.setenv("SPARK_GRAFT_INITIAL_PARTITIONS", "777")
    assert auto_initial_partitions(str(big)) == 777
    # no dir: floor (library embedders rely on the env knob)
    monkeypatch.delenv("SPARK_GRAFT_INITIAL_PARTITIONS")
    assert auto_initial_partitions(None) == 32


# ---------------------------------------------------------------------------
# 7. pluggable conditional-PUT CAS publish (multi-writer safety hook)
# ---------------------------------------------------------------------------

def test_cas_protocol_contended_commits_lose_nothing(spark, tmp_path):
    """Eight threads append concurrently through protocol='cas' with an
    atomic fake conditional-PUT (lock + create-if-absent). Every
    thread's rows must land in the final table and versions must be a
    contiguous chain — the property the rename emulation can only
    promise under single-writer."""
    lock = threading.Lock()

    def fake_cas(tmp, final):
        with lock:  # the object store's atomicity, emulated
            if os.path.exists(final):
                return False
            os.rename(tmp, final)
            return True

    snap.register_cas_publish(fake_cas)
    try:
        path = str(tmp_path / "tbl")
        snap.snapshot_write(_df(spark, 0, 1), path, protocol="cas")
        errs = []
        barrier = threading.Barrier(8)

        def writer(i):
            barrier.wait()
            try:
                snap.snapshot_write(
                    _df(spark, 100 * (i + 1), 100 * (i + 1) + 3), path,
                    mode="append", protocol="cas",
                )
            except Exception as e:  # noqa: BLE001
                errs.append(e)

        ts = [threading.Thread(target=writer, args=(i,)) for i in range(8)]
        for t in ts:
            t.start()
        for t in ts:
            t.join()
        assert not errs, errs
        vs = [h["version"] for h in snap.snapshot_history(path)]
        assert vs == list(range(9)), vs  # contiguous: no overwrites
        rows = {r["k"] for r in snap.read_snapshot(spark, path).collect()}
        expect = {0} | {
            100 * (i + 1) + d for i in range(8) for d in range(3)
        }
        assert rows == expect  # zero lost commits
    finally:
        snap.register_cas_publish(None)


def test_cas_protocol_requires_registered_hook(spark, tmp_path):
    snap.register_cas_publish(None)
    with pytest.raises(ValueError, match="register_cas_publish"):
        snap.snapshot_write(_df(spark, 0, 2), str(tmp_path / "t"),
                            protocol="cas")


# ---------------------------------------------------------------------------
# 8. GEMM-prefiltered exact near-dup (101s -> ms full-surface bench find)
# ---------------------------------------------------------------------------

def test_exact_near_dup_gemm_prefilter_matches_expression_join(spark):
    """Planted near-duplicates: the GEMM candidate prefilter + expr
    rescore must reproduce the old all-pairs expression join exactly —
    including pairs sitting right at the threshold."""
    import random as _random

    from harmony_energy_data_pipeline_spark.functions.vector import (
        cosine_similarity,
    )
    from harmony_energy_data_pipeline_spark.operators.similarity import (
        embedding_near_dup_pairs,
    )

    rng = _random.Random(7)
    rows = []
    for i in range(120):
        rows.append((i, [rng.gauss(0, 1) for _ in range(16)]))
    # planted: exact dup, near dup (tiny perturbation), negated vector
    for j, (src, eps) in enumerate([(3, 0.0), (5, 0.01), (9, 0.03)]):
        base = rows[src][1]
        rows.append((1000 + j, [v + eps * rng.gauss(0, 1) for v in base]))
    rows.append((2000, [0.0] * 16))  # zero vector: never a pair
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    a = emb.select(F.col("vec_id").alias("id_a"),
                   F.col("embedding").alias("__va"))
    b = emb.select(F.col("vec_id").alias("id_b"),
                   F.col("embedding").alias("__vb"))
    old = (
        a.join(b, on=F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b",
                cosine_similarity("__va", "__vb").alias("score"))
        .filter(F.col("score") >= 0.9)
    )
    old_set = {(r["id_a"], r["id_b"], round(r["score"], 9))
               for r in old.collect()}
    new = embedding_near_dup_pairs(
        emb, "vec_id", "embedding", threshold=0.9, exact=True
    )
    new_set = {(r["id_a"], r["id_b"], round(r["score"], 9))
               for r in new.collect()}
    assert len(old_set) >= 3  # the planted dups are found at all
    assert new_set == old_set
