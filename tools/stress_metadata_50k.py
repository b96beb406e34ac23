"""50k-file metadata stress (round 7 'Done' gate): drive the PUBLISH
side of the snapshot log through 50,000 single-file append commits
(each staged file a hardlink of one real parquet, so per-commit footer
reads are real), then measure planning time, history, vacuum.

No Spark session needed — this exercises exactly the driver-side
metadata path a 1000-executor cluster's driver would run.

Usage: python tools/stress_metadata_50k.py [n_commits]
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


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000
    # one real parquet file to hardlink per commit (written by any
    # earlier Spark run; fall back to generating with pyarrow)
    import pyarrow as pa
    import pyarrow.parquet as pq

    tmp = tempfile.mkdtemp(prefix="meta50k_")
    path = os.path.join(tmp, "t")
    os.makedirs(os.path.join(path, "data"), exist_ok=True)
    seed = os.path.join(tmp, "seed.parquet")
    pq.write_table(
        pa.table({"k": list(range(1000)), "v": [i % 97 for i in range(1000)]}),
        seed,
    )

    commit_s = []
    bytes_last = 0
    t_all = time.perf_counter()
    for i in range(n):
        txid = f"tx{i:08d}"
        d = os.path.join(path, "data", txid)
        os.makedirs(d)
        os.link(seed, os.path.join(d, "part-0.parquet"))
        t0 = time.perf_counter()
        v = snap.snapshot_publish_staged(
            path, txid, mode="append" if i else "overwrite",
            stats_cols=["k"],
        )
        commit_s.append(time.perf_counter() - t0)
        if i == n - 1:
            bytes_last = os.path.getsize(snap._manifest_path(path, v))
        if i % 10_000 == 0 and i:
            print(
                f"@{i}: last-1k commit avg "
                f"{sum(commit_s[-1000:]):.3f}ms/commit*1000, "
                f"total {time.perf_counter()-t_all:.0f}s",
                file=sys.stderr,
            )

    latest = snap.latest_version(path)
    # cold planning: no cache, no checkpoints
    snap._RESOLVE_CACHE.clear()
    for cp in os.listdir(snap._snap_dir(path)):
        if cp.startswith("ckpt-"):
            os.remove(os.path.join(snap._snap_dir(path), cp))
    t0 = time.perf_counter()
    kept, total = snap.prune_files(path, [("k", 0, 10)])
    plan_cold = time.perf_counter() - t0
    # the cold walk persisted a checkpoint: warm replay
    snap._RESOLVE_CACHE.clear()
    t0 = time.perf_counter()
    kept, total = snap.prune_files(path, [("k", 0, 10)])
    plan_ckpt = time.perf_counter() - t0
    t0 = time.perf_counter()
    kept, total = snap.prune_files(path, [("k", 0, 10)])
    plan_warm = time.perf_counter() - t0

    t0 = time.perf_counter()
    hist = snap.snapshot_history(path)
    hist_s = time.perf_counter() - t0

    t0 = time.perf_counter()
    removed = snap.vacuum(path, keep_last=5, orphan_grace_s=0.0)
    vac_s = time.perf_counter() - t0

    out = {
        "metric": "metadata_50k_stress",
        "n_commits": n,
        "live_files": total,
        "commit_ms_first1k": round(sum(commit_s[1:1001]), 1),
        "commit_ms_mid1k": round(sum(commit_s[n // 2:n // 2 + 1000]) * 1000 / 1000, 4),
        "commit_ms_last1k": round(sum(commit_s[-1000:]), 1),
        "manifest_bytes_last": bytes_last,
        "plan_cold_s": round(plan_cold, 3),
        "plan_after_ckpt_s": round(plan_ckpt, 3),
        "plan_warm_s": round(plan_warm, 4),
        "history_s": round(hist_s, 3),
        "history_len": len(hist),
        "vacuum_s": round(vac_s, 1),
        "vacuum_removed": removed,
        "readable_after_vacuum": len(
            snap._read_manifest(path, snap.latest_version(path))["files"]
        ),
    }
    print(json.dumps(out))
    shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
