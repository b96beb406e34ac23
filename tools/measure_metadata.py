"""Measure snapshot-log metadata cost vs table file count (round 7).

Builds a table through MANY small append commits (the streaming
micro-batch shape) and records, per decade of file count:
  - per-commit manifest bytes (the O(delta) claim),
  - per-commit wall time,
  - planning time for a pruned read (read_snapshot where=...),
  - resolution time cold (no cache, no checkpoint) vs warm.

Usage: python tools/measure_metadata.py [n_commits] [--stats] [--members]
Prints one JSON line; human detail on stderr.
"""
from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("SPARK_GRAFT_CPUS", "8")

from harmony_energy_data_pipeline_spark.session import get_spark  # noqa: E402
from harmony_energy_data_pipeline_spark.sinks import snapshots as snap  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402


def main() -> None:
    n_commits = int(sys.argv[1]) if len(sys.argv) > 1 else 200
    use_members = "--members" in sys.argv
    spark = get_spark("measure-metadata")
    spark.sparkContext.setLogLevel("ERROR")
    tmp = tempfile.mkdtemp(prefix="meta_scale_")
    path = os.path.join(tmp, "t")
    rows_per = 1000
    checkpoints = sorted({n_commits // 10, n_commits // 3, n_commits - 1})

    commit_bytes: list[int] = []
    commit_s: list[float] = []
    marks: dict[str, dict] = {}
    for i in range(n_commits):
        df = spark.range(i * rows_per, (i + 1) * rows_per).select(
            F.col("id").alias("k"), (F.col("id") % 97).alias("v")
        ).coalesce(1)
        t0 = time.perf_counter()
        v = snap.snapshot_write(
            df, path, mode="append" if i else "overwrite",
            stats_cols=["k"],
            member_cols=["v"] if use_members else None,
            member_bits=1 << 14, member_hashes=3,
        )
        commit_s.append(time.perf_counter() - t0)
        commit_bytes.append(os.path.getsize(snap._manifest_path(path, v)))
        if i in checkpoints:
            nf = i + 1
            # planning: cold resolve (no cache/ckpt) then warm
            snap._RESOLVE_CACHE.clear()
            for cp in list(os.listdir(snap._snap_dir(path))):
                if cp.startswith("ckpt-"):
                    os.remove(os.path.join(snap._snap_dir(path), cp))
            t0 = time.perf_counter()
            kept, total = snap.prune_files(path, [("k", 0, rows_per - 1)])
            cold = time.perf_counter() - t0
            t0 = time.perf_counter()
            kept, total = snap.prune_files(path, [("k", 0, rows_per - 1)])
            warm = time.perf_counter() - t0
            marks[str(nf)] = {
                "files": total,
                "pruned_to": len(kept),
                "plan_cold_s": round(cold, 4),
                "plan_warm_s": round(warm, 4),
                "manifest_bytes_last": commit_bytes[-1],
                "commit_s_last10": round(sum(commit_s[-10:]) / 10, 4),
            }
            print(f"@{nf} files: {marks[str(nf)]}", file=sys.stderr)

    out = {
        "metric": "metadata_commit_cost",
        "n_commits": n_commits,
        "manifest_bytes_p10": sorted(commit_bytes)[len(commit_bytes) // 10],
        "manifest_bytes_p90": sorted(commit_bytes)[9 * len(commit_bytes) // 10],
        "manifest_bytes_first_append": commit_bytes[1],
        "manifest_bytes_last_append": commit_bytes[-1],
        "commit_s_first10": round(sum(commit_s[1:11]) / 10, 4),
        "commit_s_last10": round(sum(commit_s[-10:]) / 10, 4),
        "marks": marks,
        "members": use_members,
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
