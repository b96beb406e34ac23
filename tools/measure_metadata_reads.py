"""Scale shape of the round-7 metadata read paths.

Two claims measured across data decades (1×/10×/30× inline
replication of sf0.1 lineitem, perturbed keys so parquet can't
RLE-collapse the copies):

* ``snapshot_stats_agg`` (manifest-only COUNT/MIN/MAX) is FLAT —
  driver-side O(manifest) however large the files grow — while the
  scan-based COUNT(*) it replaces grows with data volume;
* ``read_snapshot_changes_feed`` over a deletion-vector commit costs
  O(covered-file bytes), not O(table): with the file count scaled to
  hold per-file size constant (what compaction maintains on a real
  table), feed time over a fixed-selectivity delete stays near-flat
  while the table grows 30×.

Usage: python tools/measure_metadata_reads.py [sf_dir]
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


def build(spark, sf_dir: str, replicate: int) -> str:
    li = load_table(spark, "lineitem", sf_dir).select(
        "l_orderkey", "l_quantity", "l_extendedprice"
    )
    if replicate > 1:
        li = li.crossJoin(
            spark.range(replicate).select(F.col("id").alias("__rep"))
        ).select(
            (F.col("l_orderkey") * replicate + F.col("__rep"))
            .alias("l_orderkey"),
            (F.col("l_quantity") + F.col("__rep") * 0.001)
            .alias("l_quantity"),
            (F.col("l_extendedprice") + F.col("__rep") * 0.01)
            .alias("l_extendedprice"),
        )
    path = tempfile.mkdtemp(prefix=f"meta_scale_{replicate}x_")
    snap.snapshot_write(
        li, path, stats_cols=["l_orderkey"], cluster_by=["l_orderkey"],
        cluster_files=8 * replicate,  # hold per-file size constant
    )
    return path


def t(fn) -> tuple[float, object]:
    t0 = time.time()
    out = fn()
    return time.time() - t0, out


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("measure-metadata-reads")
    spark.sparkContext.setLogLevel("ERROR")
    for rep in (1, 10, 30):
        path = build(spark, sf_dir, rep)
        info = snap.snapshot_table_info(path)
        # fixed-selectivity delete: always ~600 rows per replica band
        lo = 1000 * rep
        v = snap.snapshot_delete_where_dv(
            spark, path, [("l_orderkey", lo, lo + 150 * rep)]
        )
        meta_s, meta = t(lambda: snap.snapshot_stats_agg(path))
        scan_s, scan_n = t(
            lambda: snap.read_snapshot(spark, path).count()
        )
        assert meta["n_rows"] == scan_n, (meta["n_rows"], scan_n)
        feed_s, feed_n = t(
            lambda: snap.read_snapshot_changes_feed(
                spark, path, v - 1, v
            ).count()
        )
        print(
            f"{rep:>3}x: {info['n_files']} files "
            f"{info['total_bytes']/1e6:8.1f} MB | metadata COUNT "
            f"{meta_s*1000:7.1f} ms | scan COUNT {scan_s:5.2f} s "
            f"(n={scan_n}) | DV feed {feed_s:5.2f} s ({feed_n} rows)"
        )


if __name__ == "__main__":
    main()
