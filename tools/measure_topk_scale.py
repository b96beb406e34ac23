"""Top-k view maintenance cost vs table growth.

The claim refresh_topk_view makes: appends fold at O(|view| + |Δ|)
whatever the table size. The measurement: a fact table grows by equal
appends; each refresh folds a CONSTANT-size delta into the view while
the table doubles, triples, quadruples — fold cost should stay flat
while the recompute alternative (measured each round for comparison)
grows with the table. Then a top-band DV delete forces the danger
rescan, which is O(danger groups' files), not O(table).

Usage: python tools/measure_topk_scale.py [sf_dir] [rounds]
"""
from __future__ import annotations

import json
import sys
import tempfile
import time

from pyspark.sql import functions as F

sys.path.insert(0, ".")

from harmony_energy_data_pipeline_spark.io import load_table  # noqa: E402
from harmony_energy_data_pipeline_spark.pipeline import ivm  # noqa: E402
from harmony_energy_data_pipeline_spark.session import get_spark  # noqa: E402
from harmony_energy_data_pipeline_spark.sinks import snapshots as snap  # noqa: E402


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    spark = get_spark("topk-scale")
    spark.sparkContext.setLogLevel("ERROR")
    li = load_table(spark, "lineitem", sf_dir).select(
        F.col("l_orderkey").alias("k"),
        (F.col("l_orderkey") % 50).alias("g"),
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("v"),
        F.col("l_linenumber").alias("ln"),
    ).withColumn("rid", F.col("k") * 10 + F.col("ln"))
    root = tempfile.mkdtemp(prefix="topk_scale_")
    src, view = root + "/src", root + "/view"
    kw = dict(keys=["g"], order_col="v", k=10, tiebreak_cols=["rid"])
    out = []
    for i in range(rounds):
        batch = li.withColumn("rid", F.col("rid") + F.lit(i * 10**9))
        snap.snapshot_write(
            batch.repartition(8), src,
            mode="append" if i else "overwrite", stats_cols=["g"],
        )
        t0 = time.time()
        ivm.refresh_topk_view(spark, src, view, **kw)
        fold_s = time.time() - t0
        t0 = time.time()
        n = snap.read_snapshot(spark, src).count()  # recompute's scan cost proxy
        scan_s = time.time() - t0
        out.append({
            "round": i + 1, "table_rows": n,
            "refresh_s": round(fold_s, 2),
            "full_scan_s": round(scan_s, 2),
        })
        print(json.dumps(out[-1]), flush=True)
    # danger-path: evict the global top band → all 50 groups rescan
    t0 = time.time()
    snap.snapshot_delete_where_dv(spark, src, [("v", 9_000_000, None)])
    del_s = time.time() - t0
    t0 = time.time()
    ivm.refresh_topk_view(spark, src, view, **kw)
    danger_s = time.time() - t0
    rows = ivm.read_view(spark, view).count()
    print(json.dumps({
        "dv_delete_s": round(del_s, 2),
        "danger_refresh_s": round(danger_s, 2),
        "view_rows": rows,
    }))
    print(json.dumps(out))


if __name__ == "__main__":
    main()
