"""Partition-pruning scale measurement (round 8): the same equality
query against (a) a hive-partitioned snapshot table (exact planning-
time pruning from path-derived values, no stats) and (b) the same
rows written unpartitioned and unclustered (zone maps recorded but
useless — every file spans all event types, nothing prunes).

Usage: python tools/measure_partition_pruning.py [replication]
(replication multiplies sf0.1 events; 10 → ~6M rows)
"""
from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from harmony_energy_data_pipeline_spark.io import load_table  # noqa: E402
from harmony_energy_data_pipeline_spark.session import get_spark  # noqa: E402
from harmony_energy_data_pipeline_spark.sinks import snapshots as snap  # noqa: E402


def main() -> None:
    rep = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    spark = get_spark("measure-partition-pruning")
    spark.sparkContext.setLogLevel("ERROR")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    ev = (
        load_table(spark, "events", sf_dir)
        .select("event_id", "event_type", "user_id", "value")
        .crossJoin(spark.range(rep).select(F.col("id").alias("__r")))
        .drop("__r")
    )
    base = tempfile.mkdtemp(prefix="part_prune_")
    part_t, plain_t = base + "/part", base + "/plain"
    t0 = time.perf_counter()
    # hash-repartition ON the partition column so each task holds one
    # partition's rows — the write pattern that keeps a partitioned
    # table's file count O(partitions × tasks-per-partition) instead
    # of O(partitions × tasks)
    snap.snapshot_write(
        ev.repartition(32, "event_type"), part_t,
        partition_by=["event_type"],
    )
    t_write_part = time.perf_counter() - t0
    t0 = time.perf_counter()
    snap.snapshot_write(
        ev.repartition(32), plain_t, stats_cols=["event_type"]
    )
    t_write_plain = time.perf_counter() - t0

    def run(path):
        t0 = time.perf_counter()
        kept, total = snap.prune_files(
            path, [("event_type", "click", "click")]
        )
        plan_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        row = snap.read_snapshot(
            spark, path, where=[("event_type", "click", "click")]
        ).agg(
            F.count("*").alias("n"),
            F.sum(F.col("value")).alias("s"),
        ).first()
        return plan_s, time.perf_counter() - t0, len(kept), total, row

    # interleave A/B twice (page cache) and keep the best of each
    results = {}
    for _ in range(2):
        for name, path in (("partitioned", part_t), ("plain", plain_t)):
            plan_s, scan_s, kept, total, row = run(path)
            cur = results.get(name)
            if cur is None or scan_s < cur["scan_s"]:
                results[name] = {
                    "plan_s": round(plan_s, 4), "scan_s": round(scan_s, 3),
                    "files_kept": kept, "files_total": total,
                    "n": row.n, "sum": float(row.s),
                }
    assert results["partitioned"]["n"] == results["plain"]["n"]
    assert abs(
        results["partitioned"]["sum"] - results["plain"]["sum"]
    ) < 1e-3
    out = {
        "replication": rep,
        "rows": ev.count(),
        "write_partitioned_s": round(t_write_part, 1),
        "write_plain_s": round(t_write_plain, 1),
        **{f"{k}_{kk}": vv for k, v in results.items()
           for kk, vv in v.items()},
        "scan_speedup": round(
            results["plain"]["scan_s"]
            / max(results["partitioned"]["scan_s"], 1e-9), 2
        ),
    }
    print(json.dumps(out))
    shutil.rmtree(base, ignore_errors=True)


if __name__ == "__main__":
    main()
