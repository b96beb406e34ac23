"""DV read-path plan-budget crossover (round-7 verdict item 7).

The merge-on-read scan has two shapes for vectored files:

* PER-FILE (≤ ``_DV_PER_FILE_MAX`` vectored files): each vectored
  file anti-joins its OWN broadcast position set on ``row_index``
  alone — no per-row path strings, but the plan grows one scan+join
  per file.
* COMBINED (above the cap): one scan of all vectored files
  anti-joined on (relative path, position) — constant plan size, but
  every row pays the ``_metadata.file_path`` decode expression.

This measures both shapes across vectored-file counts to find the
crossover and validate the shipped default (16).

Usage: python tools/measure_dv_budget.py [sf_dir] [counts...]
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
from harmony_energy_data_pipeline_spark.session import get_spark  # noqa: E402
from harmony_energy_data_pipeline_spark.sinks import snapshots as snap  # noqa: E402


def build(spark, sf_dir: str, n_files: int, root: str) -> tuple[str, int]:
    """Snapshot table with ``n_files`` files, every file carrying a
    deletion vector (a narrow delete keyed to land in each file)."""
    path = f"{root}/t{n_files}"
    li = load_table(spark, "lineitem", sf_dir).select(
        "l_orderkey", "l_partkey", "l_quantity", "l_extendedprice"
    )
    snap.snapshot_write(
        li, path, mode="overwrite", stats_cols=["l_orderkey"],
        cluster_by=["l_orderkey"], cluster_files=n_files,
    )
    m = snap._read_manifest(path, snap.latest_version(path))
    assert len(m["files"]) == n_files, (len(m["files"]), n_files)
    # delete a thin slice from EVERY file: per-file key ranges from
    # the recorded zone maps
    stats = {snap._rel_file(path, f): s for f, s in m["stats"].items()}
    total_del = 0
    for f in m["files"]:
        lo, hi = stats[snap._rel_file(path, f)]["l_orderkey"]
        snap.snapshot_delete_where_dv(
            spark, path, [("l_orderkey", lo, lo + (hi - lo) // 50)]
        )
    mv = snap._read_manifest(path, snap.latest_version(path))
    vectored = sum(1 for f in mv["files"]
                   if (mv.get("dvs") or {}).get(snap._rel_file(path, f)))
    return path, vectored


def timed_read(spark, path: str, cap: int) -> dict:
    orig = snap._DV_PER_FILE_MAX
    snap._DV_PER_FILE_MAX = cap
    try:
        snap._RESOLVE_CACHE.clear()
        t0 = time.perf_counter()
        df = snap.read_snapshot(spark, path)
        t1 = time.perf_counter()
        n = df.count()
        t2 = time.perf_counter()
        agg = snap.read_snapshot(spark, path).agg(
            F.sum("l_quantity")).collect()[0][0]
        t3 = time.perf_counter()
    finally:
        snap._DV_PER_FILE_MAX = orig
    return {"rows": n, "construct_s": round(t1 - t0, 3),
            "count_s": round(t2 - t1, 3), "agg_s": round(t3 - t2, 3),
            "sum_q": float(agg)}


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    counts = [int(c) for c in sys.argv[2:]] or [8, 16, 32, 64, 128]
    spark = get_spark("measure_dv_budget")
    root = tempfile.mkdtemp(prefix="dv_budget_")
    out = []
    try:
        run(spark, sf_dir, counts, root, out)
    finally:
        shutil.rmtree(root, ignore_errors=True)


def run(spark, sf_dir, counts, root, out):
    for n_files in counts:
        path, vectored = build(spark, sf_dir, n_files, root)
        row = {"n_files": n_files, "vectored": vectored}
        per = timed_read(spark, path, cap=10 ** 9)   # force per-file
        comb = timed_read(spark, path, cap=0)        # force combined
        assert per["rows"] == comb["rows"], (per, comb)
        assert abs(per["sum_q"] - comb["sum_q"]) < 1e-6
        row["per_file"] = per
        row["combined"] = comb
        row["per_total_s"] = round(
            per["construct_s"] + per["count_s"] + per["agg_s"], 3)
        row["comb_total_s"] = round(
            comb["construct_s"] + comb["count_s"] + comb["agg_s"], 3)
        out.append(row)
        print(json.dumps(row), flush=True)
    print(json.dumps({"table": out}))


if __name__ == "__main__":
    main()
