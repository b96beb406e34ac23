"""ANN operator contracts: exact baseline, LSH and IVF approximations.

The approximate paths have no SQL oracle (hash/cluster specific), so
their check is recall against the exact brute-force baseline — and
exact equivalence when the approximation dial is fully open
(probe-all-cells / nbits→0 recovers brute force)."""

from __future__ import annotations

from pyspark.sql import functions as F

from harmony_energy_data_pipeline_spark.io import load_table
from harmony_energy_data_pipeline_spark.operators import similarity


def _topk_sets(df):
    rows = df.collect()
    out: dict = {}
    for r in rows:
        out.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    return out


def test_ivf_probe_all_matches_exact(spark, sf_dir):
    emb = load_table(spark, "embeddings", sf_dir)
    q = emb.filter(F.col("vec_id") < 5)
    exact = _topk_sets(similarity.cosine_topk(q, emb, k=5))
    ivf = _topk_sets(
        similarity.ivf_topk(q, emb, k=5, n_centroids=8, n_probe=8)
    )
    assert ivf == exact  # probing every cell == brute force


def test_ivf_partial_probe_contract(spark, sf_dir):
    emb = load_table(spark, "embeddings", sf_dir)
    q = emb.filter(F.col("vec_id") < 5)
    out = similarity.ivf_topk(q, emb, k=5, n_centroids=8, n_probe=2)
    rows = out.collect()
    assert set(out.columns) == {"query_id", "neighbor_id", "score", "rank"}
    per_q: dict = {}
    for r in rows:
        per_q.setdefault(r["query_id"], []).append(r["rank"])
    for qid, ranks in per_q.items():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))
        assert len(ranks) <= 5


def test_lsh_recall_against_exact(spark, sf_dir):
    emb = load_table(spark, "embeddings", sf_dir)
    q = emb.filter(F.col("vec_id") < 10)
    exact = _topk_sets(similarity.cosine_topk(q, emb, k=5))
    # the synthetic embeddings are near-random (top-5 cosine ~0.3), so
    # the bucket dial must open wide: 4-bit signatures x 16 tables
    approx = _topk_sets(
        similarity.lsh_topk(q, emb, dim=64, k=5, nbits=4, tables=16)
    )
    hits = sum(len(exact[k] & approx.get(k, set())) for k in exact)
    total = sum(len(v) for v in exact.values())
    assert hits / total >= 0.7, f"LSH recall too low: {hits}/{total}"


def test_text_stats_full_matches_expression_form(spark, sf_dir):
    """Guard the two text-stats implementations against drift: the
    Arrow-batched single-pass version must be value-identical to the
    expression builders."""
    from harmony_energy_data_pipeline_spark.operators import text as t
    docs = load_table(spark, "documents", sf_dir).limit(200)
    fast = t.text_stats_full(docs, "doc_id", "text")
    slow = t.text_stats(docs, "doc_id", "text")
    cols = ["doc_id", "n_chars_raw", "n_tokens", "n_tokens_bpe",
            "mean_word_len", "punct_ratio", "lang_detected", "quality",
            "fingerprint"]
    got = sorted(tuple(r[c] for c in cols) for r in fast.select(cols).collect())
    want = sorted(tuple(r[c] for c in cols) for r in slow.select(cols).collect())
    assert got == want


def test_approx_distinct_within_error_bound(spark, sf_dir):
    ev = load_table(spark, "embeddings", sf_dir)  # any keyed table works
    from harmony_energy_data_pipeline_spark.io import load_table as lt
    events = lt(spark, "events", sf_dir)
    exact = {
        r["event_type"]: r["n"]
        for r in events.groupBy("event_type").agg(
            F.countDistinct("user_id").alias("n")).collect()
    }
    approx = {
        r["event_type"]: r["a"]
        for r in events.groupBy("event_type").agg(
            F.approx_count_distinct("user_id", rsd=0.02).alias("a")).collect()
    }
    for k, n in exact.items():
        assert abs(approx[k] - n) / n <= 0.1, (k, approx[k], n)


def test_grouped_trend_matches_numpy(spark, sf_dir):
    import numpy as np
    from harmony_energy_data_pipeline_spark.operators.analytics import grouped_trend

    ev = load_table(spark, "events", sf_dir)
    got = {
        r["user_id"]: (r["slope_per_hour"], r["n"])
        for r in grouped_trend(ev, "user_id", "ts", "value").collect()
    }
    pdf = ev.select("user_id", "ts", "value").toPandas()
    for uid, grp in pdf.groupby("user_id"):
        # same quantization as the operator (whole seconds, cents); the
        # numpy float path is an independent computation of the same fit
        x = (grp["ts"].astype("int64").to_numpy() // 10**9).astype("float64") / 3600.0
        y = np.round(grp["value"].to_numpy(dtype="float64") * 100.0) / 100.0
        x0 = x - x.mean()
        want = float((x0 @ (y - y.mean())) / (x0 @ x0))
        slope, n = got[uid]
        assert n == len(grp)
        assert abs(slope - want) < 1e-6 * max(1.0, abs(want))


def test_deterministic_split_stable_and_proportional(spark, sf_dir):
    from harmony_energy_data_pipeline_spark.operators.sampling import (
        deterministic_split,
    )
    docs = load_table(spark, "documents", sf_dir)
    s1 = {r["doc_id"]: r["split"] for r in
          deterministic_split(docs, "doc_id", 0.8).select("doc_id", "split").collect()}
    # assignment is a pure function of the key: same under repartition
    s2 = {r["doc_id"]: r["split"] for r in
          deterministic_split(docs.repartition(7), "doc_id", 0.8)
          .select("doc_id", "split").collect()}
    assert s1 == s2
    frac = sum(1 for v in s1.values() if v == "train") / len(s1)
    assert 0.75 <= frac <= 0.85  # ~0.8 within sampling noise


def test_nearest_centroid_recovers_separated_clusters(spark):
    # two well-separated clusters: every vector lands on its own label's
    # centroid, and d2 is exact integer micro-units
    rows = [
        (i, [10.0 + (i % 3) * 0.01, 0.0], "a") for i in range(6)
    ] + [
        (10 + i, [-10.0 - (i % 3) * 0.01, 0.0], "b") for i in range(6)
    ]
    df = spark.createDataFrame(rows, "id long, vec array<float>, label string")
    got = similarity.assign_nearest_centroid(
        df, id_col="id", vec_col="vec", label_col="label"
    ).collect()
    assert len(got) == 12
    for r in got:
        assert r["assigned_label"] == r["label"]
        assert isinstance(r["d2"], int)


def test_tfidf_default_log_score_matches_math(spark):
    import math

    from harmony_energy_data_pipeline_spark.operators.text import tf_idf

    docs = spark.createDataFrame(
        [(1, "apple banana apple"), (2, "banana cherry"), (3, "apple")],
        "doc_id long, text string",
    )
    got = {
        (r["doc_id"], r["token"]): r
        for r in tf_idf(docs, "doc_id", "text").collect()
    }
    n = 3
    # apple: df=2, doc 1 tf=2
    r = got[(1, "apple")]
    assert (r["tf"], r["df"]) == (2, 2)
    assert abs(r["score"] - 2 * math.log((n + 1) / (2 + 1))) < 1e-12
    # cherry: df=1, doc 2 tf=1
    r = got[(2, "cherry")]
    assert abs(r["score"] - 1 * math.log((n + 1) / (1 + 1))) < 1e-12


def test_cosine_topk_gemm_matches_expr_neighbors(spark, sf_dir):
    """Opt-in GEMM scorer: identical neighbor sets and ranks on real
    embeddings (scores agree to float tolerance; the last-ulp BLAS
    difference is why gemm is not the oracle default)."""
    from harmony_energy_data_pipeline_spark.io import load_table
    from harmony_energy_data_pipeline_spark.operators.similarity import cosine_topk

    emb = load_table(spark, "embeddings", sf_dir)
    qs = emb.limit(10)
    for include_self in (False, True):
        a = cosine_topk(qs, emb, k=6, include_self=include_self)
        b = cosine_topk(qs, emb, k=6, include_self=include_self, scorer="gemm")
        ra = sorted(
            (r["query_id"], r["rank"], r["neighbor_id"], round(r["score"], 9))
            for r in a.collect()
        )
        rb = sorted(
            (r["query_id"], r["rank"], r["neighbor_id"], round(r["score"], 9))
            for r in b.collect()
        )
        assert ra == rb, f"include_self={include_self}"
