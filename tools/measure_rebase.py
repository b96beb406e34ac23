"""Measure the metadata-only commit rebase vs the full-redo path.

Scenario: a copy-on-write DELETE of a narrow key range on a multi-file
table loses the version race to a concurrent pure APPEND landing
between its staging and its publish. Before round 7's third wave the
loser redid the whole operation (re-read affected files, re-write
their bytes); with ``_publish_or_rebase`` it republishes the staged
delta against the new parent — O(one manifest) instead of O(touched
file bytes). The gap widens linearly with touched-file size; at lake
file sizes (128 MB–1 GB) the redo is seconds-to-minutes of wasted I/O
per conflict, the rebase stays milliseconds.

Usage: python tools/measure_rebase.py [sf_dir]
"""
from __future__ import annotations

import sys
import tempfile
import time

from pyspark.sql import functions as F

sys.path.insert(0, ".")

from harmony_energy_data_pipeline_spark.io import load_table  # noqa: E402
from harmony_energy_data_pipeline_spark.session import get_spark  # noqa: E402
from harmony_energy_data_pipeline_spark.sinks import snapshots as snap  # noqa: E402


def build(spark, sf_dir: str, n_files: int = 8, replicate: int = 1) -> str:
    li = load_table(spark, "lineitem", sf_dir).select(
        "l_orderkey", "l_partkey", "l_quantity", "l_extendedprice"
    )
    if replicate > 1:
        # perturb per-replica so parquet RLE can't collapse the copies
        # (keys stay unique and clusterable)
        li = li.crossJoin(spark.range(replicate).select(
            F.col("id").alias("__rep")
        )).select(
            (F.col("l_orderkey") * replicate + F.col("__rep"))
            .alias("l_orderkey"),
            "l_partkey",
            (F.col("l_quantity") + F.col("__rep") * 0.001)
            .alias("l_quantity"),
            (F.col("l_extendedprice") + F.col("__rep") * 0.01)
            .alias("l_extendedprice"),
        )
    path = tempfile.mkdtemp(prefix="rebase_bench_")
    snap.snapshot_write(
        li, path, stats_cols=["l_orderkey"], cluster_by=["l_orderkey"],
        cluster_files=n_files,
    )
    return path


def race_once(spark, path: str, lo: int, rebase: bool) -> float:
    """Time one delete_where that loses its first publish to an
    injected append. rebase=False emulates the pre-wave behavior by
    making _publish_or_rebase refuse to rebase (re-raise), forcing the
    outer full-redo loop."""
    extra = spark.range(3).select(
        (F.col("id") + 10_000_000_000).alias("l_orderkey"),
        F.lit(1).cast("long").alias("l_partkey"),
        F.lit(1.0).alias("l_quantity"),
        F.lit(1.0).alias("l_extendedprice"),
    )
    orig_pub = snap._publish_manifest
    orig_reb = snap._publish_or_rebase
    state = {"fired": False}

    def racy(p, version, payload, protocol="link"):
        if not state["fired"] and payload.get("rewrite"):
            state["fired"] = True
            snap._publish_manifest = orig_pub  # the append publishes clean
            try:
                snap.snapshot_write(extra, path, mode="append")
            finally:
                snap._publish_manifest = racy
        return orig_pub(p, version, payload, protocol=protocol)

    def no_rebase(p, payload, protocol, max_hops=10):
        orig_pub_local = snap._publish_manifest
        orig_pub_local(p, payload["version"], payload, protocol=protocol)
        return payload["version"]

    snap._publish_manifest = racy
    if not rebase:
        snap._publish_or_rebase = no_rebase
    t0 = time.time()
    try:
        snap.snapshot_delete_where(spark, path, [("l_orderkey", lo, lo + 50)])
    finally:
        snap._publish_manifest = orig_pub
        snap._publish_or_rebase = orig_reb
    assert state["fired"]
    return time.time() - t0


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    replicate = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    spark = get_spark("measure-rebase")
    spark.sparkContext.setLogLevel("ERROR")
    path = build(spark, sf_dir, replicate=replicate)
    info = snap.snapshot_table_info(path)
    print(f"table: {info['n_files']} files, {info['total_bytes']/1e6:.1f} MB")
    # interleave A/B, two rounds each, distinct key ranges so every
    # delete touches a file
    results = {"rebase": [], "redo": []}
    lo = 1000
    for _ in range(2):
        results["redo"].append(race_once(spark, path, lo, rebase=False))
        lo += 1000
        results["rebase"].append(race_once(spark, path, lo, rebase=True))
        lo += 1000
    for k, v in results.items():
        print(f"{k}: " + ", ".join(f"{x:.2f}s" for x in v)
              + f"  best={min(v):.2f}s")
    print(f"speedup (best/best): {min(results['redo'])/min(results['rebase']):.2f}x")


if __name__ == "__main__":
    main()
