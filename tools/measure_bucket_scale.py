"""Hash-bucket layout at scale: what bucketing buys MERGE and point
lookups, measured.

Three tables of the same sf0.1 orders data (150k rows, 64 files):

* ``plain``    — no layout, no sketches (the naive table)
* ``sketched`` — membership sketches on the merge key (the round-6
  surgical-merge shape; costs one column re-read per commit + bitmap
  bytes per file per column)
* ``bucketed`` — hash-bucketed on the merge key (round 9; zero
  per-file metadata, routing is path-derived)

Measured per table: a 64-key MERGE (files rewritten + wall), a point
lookup (files scanned + wall). Then planning-cost growth: bucket
pruning over the arrow checkpoint at 100k synthetic manifest entries.

Usage: python tools/measure_bucket_scale.py [sf_dir]
"""
from __future__ import annotations

import json
import sys
import tempfile
import time

from pyspark.sql import functions as F

sys.path.insert(0, ".")

from harmony_energy_data_pipeline_spark.io import load_table  # noqa: E402
from harmony_energy_data_pipeline_spark.session import get_spark  # noqa: E402
from harmony_energy_data_pipeline_spark.sinks import snapshots as snap  # noqa: E402

N_FILES = 64
N_BUCKETS = 64
MERGE_KEYS = 8


def build(spark, sf_dir, root, kind):
    path = f"{root}/{kind}"
    od = load_table(spark, "orders", sf_dir).select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    kw = {}
    if kind == "sketched":
        kw = dict(member_cols=["o_orderkey"], member_bits=1 << 16,
                  member_hashes=3)
    if kind == "bucketed":
        kw = dict(bucket_by=("o_orderkey", N_BUCKETS))
        od = od.repartition(1)  # buckets come from the hive split
    else:
        od = od.repartition(N_FILES)
    t0 = time.time()
    snap.snapshot_write(od, path, **kw)
    build_s = time.time() - t0
    m = snap._read_manifest(path, snap.latest_version(path))
    return path, len(m["files"]), build_s


def run(spark, sf_dir):
    root = tempfile.mkdtemp(prefix="bucket_scale_")
    od = load_table(spark, "orders", sf_dir).select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    keys = [r[0] for r in od.select("o_orderkey").distinct()
            .orderBy("o_orderkey").limit(MERGE_KEYS).collect()]
    src = od.filter(F.col("o_orderkey").isin(keys)).withColumn(
        "o_totalprice", F.col("o_totalprice") * 2
    )
    out = {}
    expected = None
    for kind in ("plain", "sketched", "bucketed"):
        path, n_files, build_s = build(spark, sf_dir, root, kind)
        # point lookup on the CLEAN layout
        t0 = time.time()
        kept, total = snap.prune_files(path, [("o_orderkey", keys[0],
                                               keys[0])])
        plan_s = time.time() - t0
        t0 = time.time()
        n = snap.read_snapshot(
            spark, path, where=[("o_orderkey", keys[0], keys[0])]
        ).count()
        lookup_s = time.time() - t0
        assert n == 1, n
        before = set(
            snap._read_manifest(path, snap.latest_version(path))["files"]
        )
        t0 = time.time()
        snap.snapshot_merge_into(spark, path, src, key="o_orderkey")
        merge_s = time.time() - t0
        after = set(
            snap._read_manifest(path, snap.latest_version(path))["files"]
        )
        rewritten = len(before - after)
        digest = snap.read_snapshot(spark, path).agg(
            F.count("*"), F.sum(F.round(F.col("o_totalprice") * 100))
        ).first()
        digest = (digest[0], int(digest[1]))
        if expected is None:
            expected = digest
        assert digest == expected, (kind, digest, expected)
        # the same point lookup AFTER the merge: in-layout staging
        # (round 9) keeps the bucketed table's pruning exact through
        # row-level rewrites; sketched tables keep it via the fresh
        # files' recomputed sketches
        kept2, total2 = snap.prune_files(path, [("o_orderkey", keys[0],
                                                 keys[0])])
        out[kind] = {
            "lookup_files_post_merge": f"{len(kept2)}/{total2}",
        } | {
            "files": n_files, "build_s": round(build_s, 2),
            "lookup_files": f"{len(kept)}/{total}",
            "plan_ms": round(plan_s * 1000, 1),
            "lookup_s": round(lookup_s, 2),
            "merge_s": round(merge_s, 2), "files_rewritten": rewritten,
        }
        print(kind, json.dumps(out[kind]), flush=True)
    return out


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("bucket-scale")
    spark.sparkContext.setLogLevel("ERROR")
    out = run(spark, sf_dir)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
