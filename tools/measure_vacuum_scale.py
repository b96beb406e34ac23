"""Vacuum-at-metadata-scale measurement (round 9): at N live files
(plus an expired history), compare vacuum's DICT liveness walk
(per-file Python objects off the resolved state) against the ARROW
path (checkpoint-backed `is_in` probes) for wall time and Python-heap
peak. This is the round-7 verdict's last named metadata consumer
still O(table files) driver-side.

No Spark session needed (vacuum is driver-only code). The synthetic
tree puts real (empty) parquet-named files on disk so the walk and
classification are the genuine article; only file CONTENT is fake.

Usage:
    python tools/measure_vacuum_scale.py [n_files] [n_expired_refs]
"""
from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time
import tracemalloc

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from harmony_energy_data_pipeline_spark.sinks import snapshots as snap  # noqa: E402

FILES_PER_DIR = 512


GROWTH_COMMITS = 20


def build(path: str, n: int, n_expired: int) -> None:
    """A REALISTIC history shape: the table grew through
    ``GROWTH_COMMITS`` small delta appends (commits are O(delta) in
    this engine — giant single manifests only occur on legacy
    full-manifest tables), the expired generation was removed by a
    rewrite, a parquet checkpoint bounds resolution at the penultimate
    version, and one small delta sits on top. All files exist on
    disk so the walk and classification are the genuine article."""
    os.makedirs(snap._snap_dir(path), exist_ok=True)
    old = [
        f"data/old{i // FILES_PER_DIR:05d}/part-{i % FILES_PER_DIR:05d}.parquet"
        for i in range(n_expired)
    ]
    live = [
        f"data/tx{i // FILES_PER_DIR:05d}/part-{i % FILES_PER_DIR:05d}.parquet"
        for i in range(n)
    ]
    t0 = time.perf_counter()
    for rel in old + live:
        full = os.path.join(path, rel)
        os.makedirs(os.path.dirname(full), exist_ok=True)
        with open(full, "wb"):
            pass
    print(f"  disk: {n + n_expired} files in "
          f"{time.perf_counter() - t0:.1f}s", flush=True)

    def stat(i, f):
        return {"#rows": 10_000, "ts": [i * 100, i * 100 + 99]}

    snap._publish_manifest(path, 0, {
        "version": 0, "parent": None, "operation": "overwrite",
        "txid": "seed", "committed_at_unix": 0, "files": [],
    })
    snap._publish_manifest(path, 1, {
        "version": 1, "parent": 0, "operation": "append",
        "txid": "grow-old", "committed_at_unix": 1,
        "adds": old, "removes": [],
    })
    per = (n + GROWTH_COMMITS - 1) // GROWTH_COMMITS
    v, last_tx = 1, "grow-old"
    for c in range(GROWTH_COMMITS):
        chunk = live[c * per:(c + 1) * per]
        if not chunk:
            break
        v += 1
        last_tx = f"grow{c}"
        snap._publish_manifest(path, v, {
            "version": v, "parent": v - 1, "operation": "append",
            "txid": last_tx, "committed_at_unix": v,
            "adds": chunk, "removes": old if c == 0 else [],
            "stats": {f: stat(c * per + j, f)
                      for j, f in enumerate(chunk)},
        })
    state = {"files": live,
             "stats": {f: stat(i, f) for i, f in enumerate(live)},
             "members": {}, "dvs": {}}
    snap._write_checkpoint(path, v, last_tx, state)
    assert os.path.exists(snap._ckpt_path_pq(path, v))
    snap._publish_manifest(path, v + 1, {
        "version": v + 1, "parent": v, "operation": "append",
        "txid": "tip", "committed_at_unix": v + 1,
        "adds": [], "removes": [],
    })


def timed_dry_run(path: str, label: str, force_dict: bool) -> dict:
    snap._RESOLVE_CACHE.clear()
    orig = snap._live_rel_arrow
    if force_dict:
        snap._live_rel_arrow = lambda *a: None
    try:
        tracemalloc.start()
        t0 = time.perf_counter()
        would = snap.vacuum(path, keep_last=1, orphan_grace_s=0.0,
                            dry_run=True)
        dt = time.perf_counter() - t0
        _cur, peak = tracemalloc.get_traced_memory()
        tracemalloc.stop()
    finally:
        snap._live_rel_arrow = orig
    out = {"path": label, "would_delete": would,
           "wall_s": round(dt, 3), "py_heap_peak_mb": round(peak / 2**20, 1)}
    print(f"  {label}: {out}", flush=True)
    return out


def timed_inventory_dry_run(path: str, inv: list) -> dict:
    """Round 10: the INVENTORY path — zero walk/readdir syscalls and
    zero per-file getmtime (mtimes ride the inventory rows), the
    object-store shape where a recursive walk doesn't exist. The
    inventory itself arrives free from the store (S3 Inventory / GCS
    Storage Insights); its capture cost is reported separately and is
    NOT vacuum's."""
    snap._RESOLVE_CACHE.clear()
    tracemalloc.start()
    t0 = time.perf_counter()
    would = snap.vacuum(path, keep_last=1, orphan_grace_s=0.0,
                        dry_run=True, inventory=inv)
    dt = time.perf_counter() - t0
    _cur, peak = tracemalloc.get_traced_memory()
    tracemalloc.stop()
    out = {"path": "inventory", "would_delete": would,
           "wall_s": round(dt, 3),
           "py_heap_peak_mb": round(peak / 2**20, 1)}
    print(f"  inventory: {out}", flush=True)
    return out


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    n_expired = int(sys.argv[2]) if len(sys.argv) > 2 else 200_000
    tmp = tempfile.mkdtemp(prefix="vacuum_scale_")
    path = os.path.join(tmp, "t")
    try:
        print(f"building synthetic table: {n} live + {n_expired} expired",
              flush=True)
        build(path, n, n_expired)
        out = {"n_live": n, "n_expired_refs": n_expired}
        out["dict"] = timed_dry_run(path, "dict", force_dict=True)
        out["arrow"] = timed_dry_run(path, "arrow", force_dict=False)
        assert out["dict"]["would_delete"] == out["arrow"]["would_delete"], \
            "PARITY VIOLATION"
        # inventory leg: capture simulates what the store emits for
        # free; the capture wall is reported but is not vacuum cost
        t0 = time.perf_counter()
        inv = []
        for dp, _dirs, files in os.walk(os.path.join(path, "data")):
            for f in files:
                full = os.path.join(dp, f)
                inv.append((os.path.relpath(full, path), 0.0))
        out["inventory_capture_s"] = round(time.perf_counter() - t0, 3)
        out["inventory"] = timed_inventory_dry_run(path, inv)
        assert out["inventory"]["would_delete"] == \
            out["arrow"]["would_delete"], "INVENTORY PARITY VIOLATION"
        out["inventory_speedup_vs_walk"] = round(
            out["arrow"]["wall_s"]
            / max(out["inventory"]["wall_s"], 1e-9), 2)
        out["speedup"] = round(
            out["dict"]["wall_s"] / max(out["arrow"]["wall_s"], 1e-9), 2)
        out["heap_ratio"] = round(
            out["dict"]["py_heap_peak_mb"]
            / max(out["arrow"]["py_heap_peak_mb"], 1e-9), 2)
        # real vacuum on the arrow path: deletes the expired tree
        snap._RESOLVE_CACHE.clear()
        t0 = time.perf_counter()
        removed = snap.vacuum(path, keep_last=1, orphan_grace_s=0.0)
        out["real_vacuum_arrow"] = {
            "removed": removed, "wall_s": round(time.perf_counter() - t0, 3)}
        assert removed == out["arrow"]["would_delete"]
        print(json.dumps(out))
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
