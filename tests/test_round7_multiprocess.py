"""Multi-writer commit safety across REAL processes (round 7): the
round-6 contention test used threads in one interpreter; the
protocol's claim is multi-writer across processes, which exercises
actual OS-level atomicity (os.link / O_EXCL), not the GIL.

No Spark needed: ``snapshot_publish_staged`` is pure driver-side code;
children stage tiny parquet files with pyarrow.
"""
from __future__ import annotations

import multiprocessing as mp
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from harmony_energy_data_pipeline_spark.sinks import snapshots as snap


def _stage(path: str, txid: str, k: int) -> None:
    d = os.path.join(path, "data", txid)
    os.makedirs(d)
    pq.write_table(pa.table({"k": [k]}), os.path.join(d, "part-0.parquet"))


def _excl_cas(tmp: str, final: str) -> bool:
    """A cross-process conditional PUT: claim the version with an
    O_CREAT|O_EXCL sidecar (atomic on POSIX across processes), then
    install — readers only ever see the complete final file."""
    try:
        fd = os.open(final + ".claim", os.O_CREAT | os.O_EXCL | os.O_WRONLY)
    except FileExistsError:
        return False
    os.close(fd)
    os.rename(tmp, final)
    return True


def _writer(args) -> list:
    """One writer PROCESS: M contended appends, each a fresh staged
    file + publish. Returns the committed (writer, seq, version)
    triples."""
    path, protocol, writer_id, n_commits = args
    if protocol == "cas":
        snap.register_cas_publish(_excl_cas)
    out = []
    for seq in range(n_commits):
        txid = f"w{writer_id}s{seq}"
        _stage(path, txid, writer_id * 1000 + seq)
        v = snap.snapshot_publish_staged(
            path, txid, mode="append", protocol=protocol,
            extra={"writer_seq": f"{writer_id}:{seq}"},
            max_retries=200,
        )
        out.append((writer_id, seq, v))
    return out


@pytest.mark.parametrize("protocol", ["link", "cas"])
def test_multiprocess_contended_appends_lose_nothing(tmp_path, protocol):
    path = str(tmp_path / "tbl")
    if protocol == "cas":
        snap.register_cas_publish(_excl_cas)
    try:
        _stage(path, "base", -1)
        snap.snapshot_publish_staged(path, "base", mode="overwrite",
                                     protocol=protocol)
    finally:
        snap.register_cas_publish(None)

    n_procs, n_commits = 6, 4
    ctx = mp.get_context("spawn")  # separate interpreters, no shared GIL
    with ctx.Pool(n_procs) as pool:
        results = pool.map(
            _writer,
            [(path, protocol, i, n_commits) for i in range(n_procs)],
        )

    total = n_procs * n_commits
    # contiguous version chain, no gaps, no double-claims
    hist = snap.snapshot_history(path)
    assert [h["version"] for h in hist] == list(range(total + 1))
    # every writer's every commit landed exactly once
    markers = snap.committed_marker_values(path, "writer_seq")
    assert markers == {
        f"{i}:{s}" for i in range(n_procs) for s in range(n_commits)
    }
    # each claimed version is unique across processes
    versions = [v for r in results for (_, _, v) in r]
    assert sorted(versions) == list(range(1, total + 1))
    # the resolved live set holds every staged file
    m = snap._read_manifest(path, total)
    assert len(m["files"]) == total + 1
    assert m["n_live_files"] == total + 1


def test_multiprocess_rename_protocol_documented_unsafe():
    """The rename protocol's docstring must keep its single-writer
    caveat — this test pins the documentation contract rather than
    racing it (the window is microseconds and machine-dependent)."""
    doc = snap._publish_manifest.__doc__
    assert "rename is NOT a true CAS" in doc
    assert "single-writer" in doc


def _rebasing_rewriter(args) -> list:
    """One rewriter PROCESS: n sequential partial rewrites, each
    staged against the latest version it could read and published via
    ``_publish_or_rebase`` — every lost race against the concurrent
    appender processes must resolve metadata-only (the appends all
    commute), never by dropping an append or double-claiming a
    version."""
    import time as _t

    path, protocol, n_rewrites = args
    if protocol == "cas":
        snap.register_cas_publish(_excl_cas)
    committed = []
    target = None
    for i in range(n_rewrites):
        for _redo in range(50):
            v = snap.latest_version(path)
            m = snap._read_manifest(path, v)
            if target is None:
                target = sorted(m["files"])[0]
            txid = f"rw{i}a{_redo}"
            _stage(path, txid, 9000 + i)
            payload = {
                "version": v + 1,
                "parent": v,
                "operation": "overwrite",
                "txid": txid,
                "committed_at_unix": int(_t.time()),
                "adds": [f"data/{txid}/part-0.parquet"],
                "removes": [target],
                "n_live_files": len(m["files"]),
                "rewrite": {"kind": "mp_rewrite"},
                "rewrite_seq": i,
            }
            try:
                nv = snap._publish_or_rebase(path, payload, protocol)
                committed.append((i, nv))
                target = f"data/{txid}/part-0.parquet"
                break
            except FileExistsError:
                continue  # non-commuting interloper: full redo
        else:
            raise AssertionError(f"rewrite {i} never committed")
    return committed


@pytest.mark.parametrize("protocol", ["link", "cas"])
def test_multiprocess_rewriter_rebases_over_appenders(tmp_path, protocol):
    """4 appender processes × 4 commits racing 1 rewriter process × 3
    sequential rewrites: the chain stays contiguous, every append
    survives every rewrite (rebase preserves them by construction),
    and each rewrite's file-swap is exactly reflected in the final
    resolved state."""
    path = str(tmp_path / "tbl")
    if protocol == "cas":
        snap.register_cas_publish(_excl_cas)
    try:
        _stage(path, "base", -1)
        snap.snapshot_publish_staged(path, "base", mode="overwrite",
                                     protocol=protocol)
    finally:
        snap.register_cas_publish(None)

    n_app, n_commits, n_rw = 4, 4, 3
    ctx = mp.get_context("spawn")
    with ctx.Pool(n_app + 1) as pool:
        rw_async = pool.map_async(
            _rebasing_rewriter, [(path, protocol, n_rw)]
        )
        app_results = pool.map(
            _writer,
            [(path, protocol, i, n_commits) for i in range(n_app)],
        )
        rw_results = rw_async.get(timeout=120)

    total = n_app * n_commits + n_rw
    hist = snap.snapshot_history(path)
    assert [h["version"] for h in hist] == list(range(total + 1))
    # every append landed exactly once despite the interleaved rewrites
    markers = snap.committed_marker_values(path, "writer_seq")
    assert markers == {
        f"{i}:{s}" for i in range(n_app) for s in range(n_commits)
    }
    # all three rewrites committed, in order
    assert [i for i, _ in rw_results[0]] == list(range(n_rw))
    # resolved state: base file replaced by the LAST rewrite's file,
    # every appended file live
    m = snap._read_manifest(path, total)
    files = set(m["files"])
    assert "data/base/part-0.parquet" not in files
    assert any(f.startswith(f"data/rw{n_rw - 1}") for f in files)
    assert sum(1 for f in files if f.startswith("data/w")) == n_app * n_commits
    assert len(files) == n_app * n_commits + 1
    assert m["n_live_files"] == len(files)
