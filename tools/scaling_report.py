"""Build the SCALING.md exponent table from bench detail JSONs.

Usage: python tools/scaling_report.py 1x.json 10x.json 30x.json [100x.json]

Each input is a bench.py BENCH_DETAIL.json (or its stdout line). The
report prints per-query wall-clock at each point and the tail
exponent between the last two points (log time-ratio / log
data-ratio, using the factor embedded in the file order 1,10,30,100),
flagging exponents > 1.0 — the superlinear candidates the curve
exists to catch.
"""

from __future__ import annotations

import json
import math
import sys

FACTORS = [1, 10, 30, 100]


def main() -> None:
    paths = sys.argv[1:]
    runs = []
    for p in paths:
        with open(p, encoding="utf-8") as fh:
            runs.append(json.load(fh))
    factors = FACTORS[: len(runs)]
    queries = [q for q in runs[0]["queries"] if all(q in r["queries"] for r in runs)]
    lo_i, hi_i = len(runs) - 2, len(runs) - 1
    ratio = factors[hi_i] / factors[lo_i]
    rows = []
    for q in queries:
        ts = [r["queries"][q] for r in runs]
        t_lo, t_hi = ts[lo_i], ts[hi_i]
        exp = (
            math.log(t_hi / t_lo) / math.log(ratio)
            if t_lo > 0 and t_hi > 0
            else float("nan")
        )
        rows.append((q, ts, exp))
    rows.sort(key=lambda r: -(r[2] if r[2] == r[2] else -99))
    header = " | ".join(f"{f}x" for f in factors)
    print(f"| query | {header} | exp({factors[lo_i]}x->{factors[hi_i]}x) |")
    print("|---" * (len(factors) + 2) + "|")
    for q, ts, exp in rows:
        flag = " ⚑" if exp == exp and exp > 1.0 else ""
        cells = " | ".join(f"{t:.2f}" for t in ts)
        print(f"| {q} | {cells} | {exp:.2f}{flag} |")
    totals = [sum(r["queries"][q] for q in queries) for r in runs]
    texp = math.log(totals[hi_i] / totals[lo_i]) / math.log(ratio)
    print(
        "| TOTAL | "
        + " | ".join(f"{t:.1f}" for t in totals)
        + f" | {texp:.2f} |"
    )
    for r, f in zip(runs, factors):
        errs = r.get("errors")
        if errs:
            print(f"# {f}x errors: {errs}")


if __name__ == "__main__":
    main()
