"""Columnar-checkpoint scale measurement (round 8): at N committed
files, compare the LEGACY JSON checkpoint path against the parquet
checkpoint for (a) checkpoint write, (b) cold resolution, (c)
planning-time pruning, (d) manifest-only aggregates. This is the
driver-side metadata path a 1000-executor cluster's driver runs per
query — the round-7 verdict's #1 scale gap.

No Spark session needed. Usage:
    python tools/measure_ckpt_parquet.py [n_files]
"""
from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from harmony_energy_data_pipeline_spark.sinks import snapshots as snap  # noqa: E402


def synth_state(n: int) -> dict:
    files = [f"data/tx{i:08d}/part-0.parquet" for i in range(n)]
    stats = {
        f: {"#rows": 10_000, "ts": [i * 100, i * 100 + 99],
            "user_id": [i % 997, i % 997 + 50]}
        for i, f in enumerate(files)
    }
    return {"files": files, "stats": stats, "members": {}, "dvs": {}}


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    tmp = tempfile.mkdtemp(prefix="ckpt_scale_")
    path = os.path.join(tmp, "t")
    os.makedirs(snap._snap_dir(path), exist_ok=True)
    state = synth_state(n)
    # a minimal delta manifest at the measured version so resolution
    # has a txid to guard on
    snap._publish_manifest(path, 0, {
        "version": 0, "parent": None, "operation": "overwrite",
        "txid": "seed", "committed_at_unix": 0, "files": [],
    })
    snap._publish_manifest(path, 1, {
        "version": 1, "parent": 0, "operation": "append",
        "txid": "top", "committed_at_unix": 1,
        "adds": [], "removes": [],
    })

    out: dict = {"n_files": n}

    # --- legacy JSON checkpoint
    t0 = time.perf_counter()
    cpj = snap._ckpt_path(path, 1)
    with open(cpj, "w") as fh:
        json.dump({"version": 1, "txid": "top", **state}, fh)
    out["json_write_s"] = round(time.perf_counter() - t0, 3)
    out["json_bytes"] = os.path.getsize(cpj)
    snap._RESOLVE_CACHE.clear()
    t0 = time.perf_counter()
    st = snap._resolve_state(path, 1)
    out["json_resolve_s"] = round(time.perf_counter() - t0, 3)
    assert len(st["files"]) == n
    where = [("ts", n * 50, n * 50 + 100_000)]
    t0 = time.perf_counter()
    kept_dict, total = snap.prune_files(path, where, version=1)
    out["dict_prune_s"] = round(time.perf_counter() - t0, 3)
    t0 = time.perf_counter()
    agg_dict = snap.snapshot_stats_agg(path, ["ts"], version=1)
    out["dict_agg_s"] = round(time.perf_counter() - t0, 3)
    os.remove(cpj)

    # --- parquet checkpoint
    snap._RESOLVE_CACHE.clear()
    t0 = time.perf_counter()
    snap._write_checkpoint(path, 1, "top", state)
    out["pq_write_s"] = round(time.perf_counter() - t0, 3)
    cpp = snap._ckpt_path_pq(path, 1)
    assert os.path.exists(cpp), "parquet checkpoint fell back to JSON"
    out["pq_bytes"] = os.path.getsize(cpp)
    t0 = time.perf_counter()
    st2 = snap._resolve_state(path, 1)
    out["pq_resolve_dicts_s"] = round(time.perf_counter() - t0, 3)
    assert st2["files"] == st["files"] and st2["stats"] == st["stats"]
    snap._RESOLVE_CACHE.clear()
    t0 = time.perf_counter()
    kept_arrow, total2 = snap._prune_files_arrow(path, 1, where)
    out["arrow_prune_cold_s"] = round(time.perf_counter() - t0, 3)
    t0 = time.perf_counter()
    kept_arrow, total2 = snap._prune_files_arrow(path, 1, where)
    out["arrow_prune_warm_s"] = round(time.perf_counter() - t0, 4)
    assert kept_arrow == kept_dict and total2 == total
    t0 = time.perf_counter()
    agg_arrow = snap.snapshot_stats_agg(path, ["ts"], version=1)
    out["arrow_agg_s"] = round(time.perf_counter() - t0, 4)
    assert agg_arrow == agg_dict

    snap._RESOLVE_CACHE.clear()
    t0 = time.perf_counter()
    light = snap._read_manifest_light(path, 1)
    out["light_manifest_cold_s"] = round(time.perf_counter() - t0, 3)
    assert len(light["files"]) == n
    t0 = time.perf_counter()
    light = snap._read_manifest_light(path, 1)
    out["light_manifest_warm_s"] = round(time.perf_counter() - t0, 3)

    out["kept_files"] = len(kept_arrow)
    out["speedup_resolve"] = round(
        out["json_resolve_s"] / max(out["pq_resolve_dicts_s"], 1e-9), 1
    )
    out["speedup_prune_warm"] = round(
        out["dict_prune_s"] / max(out["arrow_prune_warm_s"], 1e-9), 1
    )
    out["size_ratio"] = round(out["json_bytes"] / out["pq_bytes"], 1)
    print(json.dumps(out))
    shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
