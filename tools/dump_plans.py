"""Dump explain("formatted") for headline queries to plans/<tag>/.

Usage: python tools/dump_plans.py <outdir> <suffix> [query ...]
  outdir  e.g. plans/r12
  suffix  e.g. before / after
  query   optional subset; default = the bench HEADLINE list

The dump runs each queries() callable (construction side effects —
snapshot commits to temp dirs, probe jobs — do run) and writes the
UNEXECUTED formatted plan, i.e. the AQE initial plan, which is what
plan-shape claims (Exchange count, join strategy, PushedFilters,
BatchEvalPython) are judged against.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
os.environ.setdefault("SPARK_GRAFT_SF_DIR", SF_DIR)


def main() -> None:
    outdir, suffix = sys.argv[1], sys.argv[2]
    only = sys.argv[3:]

    import __spark_entry__ as entry
    from bench import HEADLINE
    from harmony_energy_data_pipeline_spark.plans.inspect import physical_plan
    from harmony_energy_data_pipeline_spark.session import get_spark

    spark = get_spark("dump-plans")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry.queries()
    names = only or HEADLINE
    os.makedirs(outdir, exist_ok=True)
    for name in names:
        try:
            df = qs[name](spark, SF_DIR)
            plan = physical_plan(df)
        except Exception as exc:  # noqa: BLE001
            plan = f"ERROR: {type(exc).__name__}: {exc}"
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path} ({len(plan)} bytes)")
    spark.stop()


if __name__ == "__main__":
    main()
