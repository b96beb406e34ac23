"""Measure eq-delete scan-arm growth vs commit count (round 11).

The r10 reader built one union arm per data-sequence group, so a
CDC-shaped table accumulated arms linearly with commits. Round 11
groups files by APPLICABLE-DELETE-SET — arms are bounded by #delete
boundaries + 1. This script builds tables with N append commits and
2 eq-delete boundaries, records the arm count (must stay 3) and the
wall time of a full read, and prints one JSON line per N.

Usage: python tools/measure_eqdelete_arms.py [N ...]
"""

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main() -> None:
    ns = [int(a) for a in sys.argv[1:]] or [8, 32, 128]
    os.environ.setdefault("SPARK_GRAFT_CPUS", "8")
    from harmony_energy_data_pipeline_spark.session import get_spark
    from harmony_energy_data_pipeline_spark.sources import iceberg as ice
    from harmony_energy_data_pipeline_spark.sources.iceberg import (
        _eq_delete_scan_groups,
    )

    spark = get_spark("eqarms")
    spark.sparkContext.setLogLevel("ERROR")
    for n in ns:
        t = os.path.join(tempfile.mkdtemp(prefix=f"eqarms{n}_"), "t")
        third = max(1, n // 3)
        for i in range(n):
            ice.write_iceberg(
                spark.range(i * 100, i * 100 + 100).selectExpr(
                    "id AS k", "CAST(id % 5 AS STRING) AS tag"
                ),
                t, mode="append" if i else "overwrite",
            )
            if i == third:
                ice.write_equality_deletes(
                    spark, t, [{"tag": "1"}], ["tag"]
                )
            if i == 2 * third:
                ice.write_equality_deletes(
                    spark, t, [{"tag": "2"}], ["tag"]
                )
        data, deletes = ice.live_files(t)
        eq = [d for d in deletes if (d.get("content") or 0) == 2]
        arms = len(_eq_delete_scan_groups(data, eq))
        t0 = time.perf_counter()
        cnt = ice.read_iceberg(spark, t).count()
        dt = time.perf_counter() - t0
        print(json.dumps({
            "commits": n, "data_files": len(data),
            "delete_boundaries": len(eq), "scan_arms": arms,
            "rows": cnt, "read_sec": round(dt, 3),
        }), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
