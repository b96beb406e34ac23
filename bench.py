"""Benchmark the headline queries at $SPARK_GRAFT_SF_DIR (default
sf0.1) on local[$SPARK_GRAFT_CPUS]. Prints ONE JSON line:
{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}

Each query is forced with a noop-format write so the full plan
materializes (a bare count() would let Catalyst prune the compute).
"""

from __future__ import annotations

import json
import os
import sys
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Headline set: reference-parity core + join/agg breadth + scale extensions.
HEADLINE = [
    "downsample_30m",
    "filter_range",
    "dedup_two_phase",
    "merge_upsert",
    "tpch_q1",
    "tpch_q3",
    "tpch_q5",
    "tpch_q6",
    "tpch_q7",
    "tpch_q9",
    "tpch_q13",
    "tpch_q18",
    "tpch_q21",
    "brand_revenue",
    "region_revenue",
    "top3_orders_per_customer",
    "asof_join_rates",
    "pivot_event_values",
    "text_stats",
    "corpus_clean",
    "vocab_topk",
    "exact_dedup_docs",
    "ngram_jaccard_pairs",
    "minhash_dedup",
    "cosine_topk",
    "semdedup_fast",
    "quality_classifier_docs",
    "wordpiece_counts",
    "pagerank_cust_supp",
    # round-3 additions (appended — the 29 queries above keep their
    # positions so rounds stay comparable line-for-line)
    "kmeans_clusters",
    "bpe_merges",
    "bigram_nll_docs",
    "quantized_topk",
    "bpe_vocab",
    "cms_heavy_users",
    "snapshot_time_travel",
    "snapshot_changes_digest",
    # round-4 additions (appended; prior positions unchanged)
    "auto_skew_join_events",
    "snapshot_compact_digest",
    # round 12 adds NO headline queries: the new wire-DML digests are
    # multi-commit write-path soaks (3-6 s of commit latency at
    # sf0.01) that would swamp the cross-round total series; they get
    # their perf history from the full-registry record
    # (BENCH_FULL_SF01.json, $SPARK_GRAFT_BENCH_FULL=1) instead.
]


def main() -> None:
    from harmony_energy_data_pipeline_spark.session import get_spark

    import __spark_entry__ as entry

    # Publish the fixture dir so the session factory can derive its
    # volume-based initialPartitionNum from the data actually benched.
    os.environ.setdefault("SPARK_GRAFT_SF_DIR", SF_DIR)
    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry.queries()

    # Optional subset (scale rehearsals at big fixtures): comma list in
    # $SPARK_GRAFT_BENCH_ONLY restricts the headline set; default runs all.
    # $SPARK_GRAFT_BENCH_FULL=1 instead benches EVERY registered query
    # (the once-per-round full-surface record, BENCH_FULL_SF01.json) —
    # same frozen methodology, so new operator families get perf history
    # the headline set does not carry.
    only = os.environ.get("SPARK_GRAFT_BENCH_ONLY")
    if os.environ.get("SPARK_GRAFT_BENCH_FULL"):
        headline = sorted(qs)
    elif only:
        # filter the FULL registry, not just HEADLINE — scale rehearsals
        # need to time non-headline queries too
        headline = [q for q in sorted(qs) if q in set(only.split(","))]
    else:
        headline = HEADLINE

    # LOAD SENTINEL (round 11): the r10 official record drifted ×1.26
    # purely because the test lane ran concurrently. Refuse to start
    # while the box is busy — wait up to 10 min for quiet; if it
    # never quiets, record the contamination IN the JSON so the
    # number is never silently trusted.
    ncpu = os.cpu_count() or 8
    load_limit = max(2.0, 0.25 * ncpu)
    waited = 0.0
    while os.getloadavg()[0] > load_limit and waited < 600.0:
        print(
            f"# load {os.getloadavg()[0]:.1f} > {load_limit:.1f}: "
            "waiting for a quiet box", file=sys.stderr,
        )
        time.sleep(30.0)
        waited += 30.0
    load_at_start = round(os.getloadavg()[0], 2)
    contaminated = load_at_start > load_limit

    # warm the JVM + parquet footers with one cheap action
    qs["bounds"](spark, SF_DIR).collect()

    # METHODOLOGY v11: per query, MEDIAN-OF-3 attempts (rounds 3-10
    # used best-of-2; median is robust to one slow outlier in either
    # direction, which best-of is not against system noise inflating
    # ALL attempts — pair it with the load sentinel above). Each
    # attempt times CONSTRUCTION (the queries() callable, which
    # materializes eager checkpoints for iterative operators) and
    # EXECUTION (noop-format write of the full plan) separately;
    # `queries` reports the per-query TOTAL of the median attempt and
    # `construction`/`execution` its split so deltas are
    # attributable. `methodology` in the JSON names the protocol so
    # cross-round deltas are read against the right baseline.
    timings: dict[str, float] = {}
    build_s: dict[str, float] = {}
    exec_s: dict[str, float] = {}
    errors: dict[str, str] = {}
    for name in headline:
        try:
            attempts = []  # (total, construction, execution)
            for _ in range(3):
                t0 = time.perf_counter()
                df = qs[name](spark, SF_DIR)
                t1 = time.perf_counter()
                df.write.format("noop").mode("overwrite").save()
                t2 = time.perf_counter()
                attempts.append((t2 - t0, t1 - t0, t2 - t1))
            best = sorted(attempts)[len(attempts) // 2]  # median total
            timings[name] = round(best[0], 3)
            build_s[name] = round(best[1], 3)
            exec_s[name] = round(best[2], 3)
            print(
                f"# {name}: {timings[name]}s"
                f" (build {build_s[name]}s + exec {exec_s[name]}s)",
                file=sys.stderr,
            )
        except Exception as exc:  # one broken query must not kill the run
            errors[name] = f"{type(exc).__name__}: {exc}"[:200]
            print(f"# {name}: ERROR {errors[name]}", file=sys.stderr)

    total = round(sum(timings.values()), 3)
    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    out = {
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "methodology": "median3-v11",
        "load_at_start": load_at_start,
    }
    if contaminated:
        out["contaminated"] = True
    if errors:
        out["errors"] = errors
    # The driver captures only the last ~2000 chars of stdout and parses the
    # final line as JSON — round 3's line overflowed that window (construction/
    # execution splits inline) and recorded "parsed": null. Keep the stdout
    # line minimal; the full split goes to stderr + BENCH_DETAIL.json.
    detail = dict(out, construction=build_s, execution=exec_s)
    if not only:  # subset runs must not clobber the full-set record
        try:
            with open(os.path.join(os.path.dirname(__file__), "BENCH_DETAIL.json"), "w") as fh:
                json.dump(detail, fh, indent=1)
        except OSError:
            pass
    print("# detail: " + json.dumps(detail), file=sys.stderr)
    line = json.dumps(out)
    if len(line) > 1800:  # stay inside the driver's tail window
        out["queries"] = {k: round(v, 2) for k, v in timings.items()}
        line = json.dumps(out)
    # stop FIRST, print LAST: the JVM shares stdout and can emit
    # unified-logging warnings under load; the JSON line must be the
    # final thing on stdout for the driver's tail parse
    spark.stop()
    print(line, flush=True)


if __name__ == "__main__":
    main()
