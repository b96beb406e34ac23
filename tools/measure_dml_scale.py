"""Round 12: measure the wire-format row-level DML family across
matched-row decades.

What the r11 verdict flagged: all four DML paths collected O(matched
rows) positions to the driver — `DELETE WHERE date < X` matching
billions of rows would OOM it. Round 12 distributed the path; this
tool measures the decades so the claim is a number, not a docstring.

Protocol: tables of N rows (N = 10k / 100k / 1M), one DELETE matching
50% of rows, one UPDATE matching 25%, both formats. Wall-clock is the
whole commit (scan → stage → manifest/log write). The interesting
column is the RATIO between decades: a driver-bound path degrades
superlinearly as positions outgrow caches; a distributed path tracks
the data volume. We also record the max driver-collected batch (rows)
via a DataFrame.collect shim — the descriptor bound.

Run: python tools/measure_dml_scale.py
"""

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

os.environ.setdefault("SPARK_GRAFT_CPUS", "16")

from harmony_energy_data_pipeline_spark.session import get_spark  # noqa: E402


def main():
    spark = get_spark("dml-scale")
    spark.sparkContext.setLogLevel("ERROR")
    from pyspark.sql.classic.dataframe import DataFrame as ImplDF

    from harmony_energy_data_pipeline_spark.sources import (
        deltalake as dl,
    )
    from harmony_energy_data_pipeline_spark.sources import (
        iceberg as ice,
    )

    collected = {"max": 0}
    orig_collect = ImplDF.collect

    def shim(self, *a, **kw):
        out = orig_collect(self, *a, **kw)
        collected["max"] = max(collected["max"], len(out))
        return out

    ImplDF.collect = shim
    results = []
    for n in (10_000, 100_000, 1_000_000):
        df = spark.range(0, n).selectExpr(
            "id AS k", "CAST(id AS DOUBLE) AS v",
            "CAST(id % 8 AS STRING) AS p",
        ).repartition(8)

        # Iceberg, partitioned by identity p
        t = os.path.join(tempfile.mkdtemp(prefix="dmlsc_i_"), "t")
        ice.write_iceberg(df, t, partition_by=["p"], stats_cols=["k"])
        collected["max"] = 0
        t0 = time.time()
        _sid, nd = ice.iceberg_delete_where(spark, t, "k % 2 = 0")
        t_del = time.time() - t0
        t0 = time.time()
        _sid2, nu = ice.iceberg_update_where(
            spark, t, "k % 4 = 1", {"v": "v + 1"}
        )
        t_upd = time.time() - t0
        results.append({
            "fmt": "iceberg", "rows": n, "deleted": nd,
            "updated": nu, "t_delete_s": round(t_del, 2),
            "t_update_s": round(t_upd, 2),
            "max_driver_batch": collected["max"],
        })

        # Delta, partitioned by p
        t2 = os.path.join(tempfile.mkdtemp(prefix="dmlsc_d_"), "t")
        dl.write_delta(df, t2, partition_by=["p"], stats_cols=["k"])
        collected["max"] = 0
        t0 = time.time()
        _v, nd2 = dl.delta_delete_where(spark, t2, "k % 2 = 0")
        t_del2 = time.time() - t0
        t0 = time.time()
        _v2, nu2 = dl.delta_update_where(
            spark, t2, "k % 4 = 1", {"v": "v + 1"}
        )
        t_upd2 = time.time() - t0
        results.append({
            "fmt": "delta", "rows": n, "deleted": nd2,
            "updated": nu2, "t_delete_s": round(t_del2, 2),
            "t_update_s": round(t_upd2, 2),
            "max_driver_batch": collected["max"],
        })
        print(json.dumps(results[-2]))
        print(json.dumps(results[-1]))
    ImplDF.collect = orig_collect
    print(json.dumps({"results": results}))


if __name__ == "__main__":
    main()
