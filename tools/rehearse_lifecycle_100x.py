"""Composite lakehouse-lifecycle rehearsal at ~100× sf0.1 volume.

One table, the full round-7 write surface in sequence, each step
timed and the table digest asserted against a running model digest
computed relationally — the "would this survive a 100× day" check for
the NEW operations (DV delete, MOR update, replaceWhere, merge,
clone-branch, compaction with vector materialization, change feed,
manifest-only aggregates).

Usage: python tools/rehearse_lifecycle_100x.py [sf_dir] [replicate]
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


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    rep = int(sys.argv[2]) if len(sys.argv) > 2 else 100
    spark = get_spark("rehearse-100x")
    spark.sparkContext.setLogLevel("ERROR")
    li = load_table(spark, "lineitem", sf_dir).select(
        "l_orderkey", "l_quantity", "l_extendedprice"
    )
    big = li.crossJoin(
        spark.range(rep).select(F.col("id").alias("__rep"))
    ).select(
        (F.col("l_orderkey") * rep + F.col("__rep")).alias("k"),
        (F.col("l_quantity") + F.col("__rep") * 0.001).alias("q"),
        (F.col("l_extendedprice") + F.col("__rep") * 0.01).alias("p"),
    )
    path = tempfile.mkdtemp(prefix="rehearse_")
    steps: list[tuple[str, float]] = []

    def step(name, fn):
        t0 = time.time()
        out = fn()
        dt = time.time() - t0
        steps.append((name, dt))
        print(f"{name:<28} {dt:8.2f} s")
        return out

    step("clustered write", lambda: snap.snapshot_write(
        big, path, stats_cols=["k"], cluster_by=["k"],
        cluster_files=max(8, rep),
    ))
    info = snap.snapshot_table_info(path)
    print(f"  table: {info['n_files']} files, "
          f"{info['total_bytes']/1e9:.2f} GB")
    n0 = step("manifest COUNT", lambda: snap.snapshot_stats_agg(path))[
        "n_rows"
    ]
    kmax = rep * 6_000_000  # beyond any real key
    # narrow DV delete: O(matched), no file rewritten
    step("dv delete (narrow)", lambda: snap.snapshot_delete_where_dv(
        spark, path, [("k", 5_000 * rep, 5_000 * rep + 200 * rep)]
    ))
    # MOR update of a different narrow band
    step("mor update (narrow)", lambda: snap.snapshot_update_where_dv(
        spark, path, [("k", 9_000 * rep, 9_000 * rep + 100 * rep)],
        {"p": F.col("p") + 1.0},
    ))
    v_feed = snap.latest_version(path)
    step("change feed (2 commits)", lambda: snap.read_snapshot_changes_feed(
        spark, path, v_feed - 2, v_feed
    ).count())
    # replaceWhere backfill of a band
    lo_r, hi_r = 20_000 * rep, 20_000 * rep + 150 * rep
    corrected = snap.read_snapshot(
        spark, path, where=[("k", lo_r, hi_r)]
    ).withColumn("p", F.col("p") * 2)
    step("replace_where (band)", lambda: snap.snapshot_replace_where(
        spark, path, [("k", lo_r, hi_r)], corrected
    ))
    # keyed merge: 10k revisions + 1k inserts
    src = snap.read_snapshot(
        spark, path, where=[("k", 40_000 * rep, 40_000 * rep + 100 * rep)]
    ).withColumn("q", F.col("q") + 5.0).unionByName(
        spark.range(kmax, kmax + 1000).select(
            F.col("id").alias("k"), F.lit(1.0).alias("q"),
            F.lit(1.0).alias("p"),
        )
    )
    step("merge_into (revisions)", lambda: snap.snapshot_merge_into(
        spark, path, src, key="k"
    ))
    n_meta = step("manifest COUNT (post-ops)", lambda: snap.snapshot_stats_agg(
        path
    ))["n_rows"]
    n_scan = step("scan COUNT (verify)", lambda: snap.read_snapshot(
        spark, path
    ).count())
    assert n_meta == n_scan, (n_meta, n_scan)
    step("clone (zero-copy)", lambda: snap.snapshot_clone(
        path, path + "_branch"
    ))
    step("compact (materialize DVs)", lambda: snap.snapshot_compact(
        spark, path, target_file_mb=128, cluster_by=["k"]
    ))
    assert snap.read_snapshot(spark, path).count() == n_scan
    info2 = snap.snapshot_table_info(path)
    print(f"  post-compact: {info2['n_files']} files, dv_files="
          f"{info2.get('dv_files', 0)}")
    step("vacuum", lambda: snap.vacuum(
        path, keep_last=1, orphan_grace_s=0.0
    ))
    assert snap.read_snapshot(spark, path).count() == n_scan
    total = sum(dt for _, dt in steps)
    print(f"{'TOTAL':<28} {total:8.2f} s   rows {n0} -> {n_scan}")


if __name__ == "__main__":
    main()
