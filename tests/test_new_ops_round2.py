"""Tests for the round-2 additions: SemDeDup, A-ES weighted sampling,
and the hashed-feature linear quality classifier."""

from __future__ import annotations

import hashlib
import math

import pytest

from pyspark.sql import functions as F

from harmony_energy_data_pipeline_spark.io import load_table
from harmony_energy_data_pipeline_spark.operators import similarity, text
from harmony_energy_data_pipeline_spark.operators.sampling import weighted_sample


# --- SemDeDup ---------------------------------------------------------------


def test_semdedup_drops_near_identical_keeps_first(spark):
    # ids 0 and 8 land in the same seed cell (id % 8); give them
    # near-identical vectors and everyone else orthogonal-ish ones
    base = [1.0, 0.0, 0.0, 0.0]
    rows = [
        (0, base),
        (8, [0.999, 0.001, 0.0, 0.0]),   # ~cos 1.0 with id 0
        (1, [0.0, 1.0, 0.0, 0.0]),
        (2, [0.0, 0.0, 1.0, 0.0]),
        (3, [0.0, 0.0, 0.0, 1.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    kept = {r["vec_id"] for r in similarity.semdedup(df, threshold=0.9, n_cells=8).collect()}
    assert 0 in kept and 8 not in kept        # keep-first: lower id wins
    assert {1, 2, 3} <= kept                  # dissimilar rows untouched


def test_semdedup_invariant_no_kept_pair_above_threshold(spark, sf_dir):
    emb = load_table(spark, "embeddings", sf_dir)
    t = 0.3
    kept = similarity.semdedup(emb, threshold=t, n_cells=8)
    a = kept.join(emb, "vec_id").select(
        F.col("vec_id").alias("id_a"), "cell", F.col("embedding").alias("__va")
    )
    b = kept.join(emb, "vec_id").select(
        F.col("vec_id").alias("id_b"), "cell", F.col("embedding").alias("__vb")
    )
    from harmony_energy_data_pipeline_spark.functions.vector import cosine_similarity

    offenders = (
        a.join(b, "cell")
        .filter(F.col("id_a") < F.col("id_b"))
        .filter(cosine_similarity("__va", "__vb") >= F.lit(t))
        .count()
    )
    assert offenders == 0


# --- A-ES weighted sampling -------------------------------------------------


def _aes_rank(key: str, weight: float, salt: str = "aes") -> float:
    h = int(hashlib.md5(f"{salt}:{key}".encode()).hexdigest()[:15], 16)
    u = (float(h) + 0.5) / float(1 << 60)
    return math.log(u) / weight


def test_weighted_sample_matches_python_model(spark):
    rows = [(i, "g", float(1 + (i * 7) % 13)) for i in range(100)]
    df = spark.createDataFrame(rows, "k long, g string, w double")
    got = {r["k"] for r in weighted_sample(df, key="k", weight_col="w", k=10, group_col="g").collect()}
    want = {
        k for k, _, _ in sorted(rows, key=lambda r: -_aes_rank(str(r[0]), r[2]))[:10]
    }
    assert got == want


def test_weighted_sample_stable_under_repartition(spark):
    rows = [(i, float(1 + i % 5)) for i in range(200)]
    df = spark.createDataFrame(rows, "k long, w double")
    s1 = {r["k"] for r in weighted_sample(df, "k", "w", k=20).collect()}
    s2 = {r["k"] for r in weighted_sample(df.repartition(13), "k", "w", k=20).collect()}
    assert s1 == s2 and len(s1) == 20


def test_weighted_sample_prefers_heavy_rows(spark):
    # one row with overwhelming weight must always be drawn
    rows = [(i, 1.0) for i in range(50)] + [(99, 1e9)]
    df = spark.createDataFrame(rows, "k long, w double")
    got = {r["k"] for r in weighted_sample(df, "k", "w", k=5).collect()}
    assert 99 in got


# --- hashed linear classifier ----------------------------------------------


def _py_score(text_str: str, salt: str = "qw", res: int = 1000) -> float:
    import re

    norm = re.sub(r"[^a-z0-9]+", " ", text_str.lower()).strip()
    toks = norm.split(" ") if norm else []
    total = 0
    for t in toks:
        h = int(hashlib.md5(f"{salt}:{t}".encode()).hexdigest()[:15], 16)
        total += h % (2 * res + 1) - res
    logit = total / (len(toks) * res) if toks else 0.0
    return 1.0 / (1.0 + math.exp(-logit))


@pytest.mark.parametrize(
    "s",
    ["the quick brown fox", "", "  ", "Hello, World! 123", "aaa aaa aaa"],
)
def test_hashed_linear_score_matches_python_model(spark, s):
    df = spark.createDataFrame([(s,)], "text string")
    got = df.select(text.hashed_linear_score("text").alias("sc")).first()["sc"]
    assert abs(got - _py_score(s)) < 1e-12


def test_hashed_linear_keep_boundary_is_integer(spark):
    df = spark.createDataFrame([("x y z",), ("",)], "text string")
    rows = df.select(
        text.hashed_linear_total("text").alias("total"),
        text.hashed_linear_score("text").alias("sc"),
    ).collect()
    for r in rows:
        assert (r["total"] >= 0) == (r["sc"] >= 0.5)


# --- blocked fuzzy matching -------------------------------------------------


def test_fuzzy_match_pairs_finds_near_misses_within_block(spark):
    from harmony_energy_data_pipeline_spark.operators.dedup import fuzzy_match_pairs

    rows = [
        (1, "golden widget"),
        (2, "golden widgets"),   # dist 1, same block
        (3, "golden wadget"),    # dist 1 to id1
        (4, "silver widget"),    # different prefix -> never a candidate
        (5, "golden bolt extra long name"),  # different length band
    ]
    df = spark.createDataFrame(rows, "id long, name string")
    got = {
        (r["id_a"], r["id_b"]): r["dist"]
        for r in fuzzy_match_pairs(df, "id", "name", max_edit=2).collect()
    }
    assert got[(1, 2)] == 1 and got[(1, 3)] == 1 and got[(2, 3)] == 2
    assert all(4 not in p and 5 not in p for p in got)


# --- unigram NLL ------------------------------------------------------------


def test_unigram_nll_matches_hand_model(spark):
    import math

    from harmony_energy_data_pipeline_spark.operators.text import unigram_nll

    docs = spark.createDataFrame(
        [(1, "a a b"), (2, "b c")], "doc_id long, text string"
    )
    # corpus: a=2, b=2, c=1, total=5
    li = {
        t: round(math.log(cf / 5.0) * 1e6)
        for t, cf in {"a": 2, "b": 2, "c": 1}.items()
    }
    want1 = -(2 * li["a"] + li["b"]) / (1e6 * 3)
    want2 = -(li["b"] + li["c"]) / (1e6 * 2)
    got = {r["doc_id"]: r for r in unigram_nll(docs, "doc_id", "text").collect()}
    assert got[1]["n_tokens"] == 3 and abs(got[1]["nll"] - want1) < 1e-12
    assert got[2]["n_tokens"] == 2 and abs(got[2]["nll"] - want2) < 1e-12
    # rarer tokens -> higher NLL
    assert got[2]["nll"] > got[1]["nll"]


# --- hash-sample quantile sketch -------------------------------------------


def test_hash_sample_quantiles_exact_when_k_covers_all(spark):
    from harmony_energy_data_pipeline_spark.operators.analytics import (
        hash_sample_quantiles,
    )

    rows = [(i, float(i)) for i in range(101)]
    df = spark.createDataFrame(rows, "k long, v double")
    got = {
        r["p"]: r["value"]
        for r in hash_sample_quantiles(df, "k", "v", [0.25, 0.5, 0.75], k=1000).collect()
    }
    # k >= n: the "sample" is the whole population -> exact quantiles
    assert got == {0.25: 25.0, 0.5: 50.0, 0.75: 75.0}


def test_hash_sample_quantiles_stable_under_repartition(spark):
    from harmony_energy_data_pipeline_spark.operators.analytics import (
        hash_sample_quantiles,
    )

    rows = [(i, float((i * 37) % 1000)) for i in range(5000)]
    df = spark.createDataFrame(rows, "k long, v double")
    a = sorted(hash_sample_quantiles(df, "k", "v", [0.5, 0.9], k=200).collect())
    b = sorted(hash_sample_quantiles(df.repartition(17), "k", "v", [0.5, 0.9], k=200).collect())
    assert a == b


def test_fuzzy_match_pairs_max_block_drops_hot_blocks(spark):
    from harmony_energy_data_pipeline_spark.operators.dedup import fuzzy_match_pairs

    # 10 identical names (one hot block) + 2 near-miss names elsewhere
    rows = [(i, "common name") for i in range(10)] + [
        (100, "rare widget"),
        (101, "rare widgets"),
    ]
    df = spark.createDataFrame(rows, "id long, name string")
    unguarded = fuzzy_match_pairs(df, "id", "name", max_edit=2)
    assert unguarded.count() == 45 + 1  # C(10,2) hot pairs + the rare pair
    guarded = fuzzy_match_pairs(df, "id", "name", max_edit=2, max_block=5)
    got = {(r["id_a"], r["id_b"]) for r in guarded.collect()}
    assert got == {(100, 101)}  # hot block dropped entirely, rare pair kept


def test_fuzzy_match_pairs_factorized_route_parity(spark):
    # factorize and direct must produce the identical pair set on a
    # mixed domain (dup groups + near-misses + a hot block), with and
    # without the max_block guard.
    from harmony_energy_data_pipeline_spark.operators.dedup import fuzzy_match_pairs

    rows = (
        [(i, "common name") for i in range(8)]
        + [(20, "rare widget"), (21, "rare widgets"), (22, "rare widget")]
        + [(30, "other thing"), (31, "other thang")]
    )
    df = spark.createDataFrame(rows, "id long, name string")
    for mb in (None, 5):
        direct = {
            (r["id_a"], r["id_b"], r["dist"])
            for r in fuzzy_match_pairs(
                df, "id", "name", max_edit=2, max_block=mb, strategy="direct"
            ).collect()
        }
        fact = {
            (r["id_a"], r["id_b"], r["dist"])
            for r in fuzzy_match_pairs(
                df, "id", "name", max_edit=2, max_block=mb, strategy="factorize"
            ).collect()
        }
        assert fact == direct, (mb, fact ^ direct)
    # sanity on the unguarded content: dup-group pairs at dist 0,
    # near-misses at their edit distance
    unguarded = {
        (r["id_a"], r["id_b"], r["dist"])
        for r in fuzzy_match_pairs(df, "id", "name", max_edit=2).collect()
    }
    assert (20, 22, 0) in unguarded and (20, 21, 1) in unguarded
    assert (30, 31, 1) in unguarded


def test_semdedup_vectorized_matches_exact(spark, sf_dir):
    from harmony_energy_data_pipeline_spark.io import load_table

    emb = load_table(spark, "embeddings", sf_dir)
    for t in (0.25, 0.3, 0.4):
        fast = {
            r["vec_id"]
            for r in similarity.semdedup(emb, threshold=t, vectorized=True).collect()
        }
        exact = {
            r["vec_id"]
            for r in similarity.semdedup(emb, threshold=t, vectorized=False).collect()
        }
        assert fast == exact


# --- fixed-point PageRank ---------------------------------------------------


def test_pagerank_fixed_point_matches_python_model(spark):
    from harmony_energy_data_pipeline_spark.operators.graph import (
        pagerank_fixed_point,
    )

    # star: 1->2, 1->3, 2->1, 3->1  (hub node 1)
    edges = [(1, 2), (1, 3), (2, 1), (3, 1)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {
        r["node"]: r["rank_micro"]
        for r in pagerank_fixed_point(df, n_iter=3).collect()
    }

    unit, d = 1_000_000, 85
    deg = {1: 2, 2: 1, 3: 1}
    r = {1: unit, 2: unit, 3: unit}
    for _ in range(3):
        contrib = {1: 0, 2: 0, 3: 0}
        for s, t in edges:
            contrib[t] += r[s] // deg[s]
        r = {v: ((100 - d) * unit + d * contrib[v]) // 100 for v in r}
    assert got == r
    assert got[1] > got[2] == got[3]  # the hub outranks the leaves


def test_pagerank_rank_join_broadcast_identical_and_no_edge_exchange(spark):
    """r13: rank_join='broadcast' — bit-identical ranks, and the
    per-round joins are BroadcastHashJoins with NO exchange anywhere
    over the edge relation (the contrib agg is the only shuffle)."""
    from harmony_energy_data_pipeline_spark.operators.graph import (
        pagerank_fixed_point,
    )

    edges = [(i % 7 + 1, (i * 3) % 7 + 1) for i in range(40) if i % 7 + 1 != (i * 3) % 7 + 1]
    df = spark.createDataFrame(sorted(set(edges)), "src long, dst long")
    part = pagerank_fixed_point(df, n_iter=3, rank_join="partitioned")
    bcast = pagerank_fixed_point(df, n_iter=3, rank_join="broadcast")
    want = {(r["node"], r["rank_micro"]) for r in part.collect()}
    got = {(r["node"], r["rank_micro"]) for r in bcast.collect()}
    assert got == want

    plan = bcast._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in plan
    # every rank/contrib attach is a broadcast build; the only
    # hash-partitioned exchanges are the contrib aggs (keyed by dst)
    import re

    for m in re.finditer(r"Exchange hashpartitioning\(([^,]+),", plan):
        # deg agg (src), node-set distinct (node), contrib aggs (dst)
        # — never a re-exchange of the cached (src, dst, __deg) edges
        assert m.group(1).split("#")[0] in ("src", "dst", "node"), plan
    spark.catalog.clearCache()


def test_pagerank_zero_rounds_returns_initial_unit_ranks(spark):
    """r13 dense-rank restructure: n_iter=0 must still return every
    node at the initial rank (the loop no longer materializes a
    node-set rank table per round)."""
    from harmony_energy_data_pipeline_spark.operators.graph import (
        pagerank_fixed_point,
    )

    df = spark.createDataFrame([(1, 2), (2, 3)], "src long, dst long")
    got = {(r["node"], r["rank_micro"])
           for r in pagerank_fixed_point(df, n_iter=0).collect()}
    assert got == {(1, 1_000_000), (2, 1_000_000), (3, 1_000_000)}
    spark.catalog.clearCache()


def test_pagerank_rank_join_rejects_unknown_mode(spark):
    from harmony_energy_data_pipeline_spark.operators.graph import (
        pagerank_fixed_point,
    )

    df = spark.createDataFrame([(1, 2)], "src long, dst long")
    import pytest

    with pytest.raises(ValueError, match="rank_join"):
        pagerank_fixed_point(df, rank_join="nope")


# --- WordPiece tokenizer ----------------------------------------------------


def test_wordpiece_greedy_longest_match(spark):
    from harmony_energy_data_pipeline_spark.operators.text import (
        wordpiece_tokenize_docs,
    )

    vocab = ["un", "break", "##able", "##break", "a", "b", "##a", "##b", "un##"]
    docs = spark.createDataFrame(
        [(1, "unbreakable abba zzz")], "doc_id long, text string"
    )
    rows = wordpiece_tokenize_docs(docs, "doc_id", "text", vocab).collect()
    by_word = {}
    for r in rows:
        by_word.setdefault(r["widx"], []).append((r["pidx"], r["piece"]))
    seq = lambda w: [p for _, p in sorted(by_word[w])]
    # greedy: 'un' + '##break' (longest continuation) + '##able'
    assert seq(0) == ["un", "##break", "##able"]
    assert seq(1) == ["a", "##b", "##b", "##a"]
    assert seq(2) == ["[UNK]"]  # no 'z' piece -> whole word UNK


def test_wordpiece_counts_match_doc_stream(spark, sf_dir):
    from harmony_energy_data_pipeline_spark.io import load_table
    from harmony_energy_data_pipeline_spark.operators.text import (
        wordpiece_token_counts,
        wordpiece_tokenize_docs,
    )
    import __spark_entry__ as entry

    docs = load_table(spark, "documents", sf_dir)
    vocab = entry._WP_VOCAB
    hist = {
        r["piece"]: r["n"]
        for r in wordpiece_token_counts(docs, "doc_id", "text", vocab).collect()
    }
    stream = (
        wordpiece_tokenize_docs(docs, "doc_id", "text", vocab)
        .groupBy("piece")
        .count()
        .collect()
    )
    assert {r["piece"]: r["count"] for r in stream} == hist


# --- table digest + expectations -------------------------------------------


def test_table_digest_detects_any_change(spark):
    from harmony_energy_data_pipeline_spark.operators.expectations import (
        table_digest,
    )

    base = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, None)], "id long, v string"
    )
    d0 = table_digest(base).first()
    # order/partitioning invariant
    d_shuf = table_digest(base.repartition(5)).first()
    assert tuple(d0) == tuple(d_shuf)
    # a changed value, a dropped row, and a duplicated row all flip it
    changed = spark.createDataFrame([(1, "a"), (2, "X"), (3, None)], "id long, v string")
    dropped = spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string")
    duped = base.union(spark.createDataFrame([(2, "b")], "id long, v string"))
    for other in (changed, dropped, duped):
        d1 = table_digest(other).first()
        assert tuple(d1) != tuple(d0)
    # null vs the string sentinel are distinct rows
    sentinel = spark.createDataFrame([(1, "a"), (2, "b"), (3, "\x00")], "id long, v string")
    assert tuple(table_digest(sentinel).first()) != tuple(d0)


def test_expectations_counts_violations(spark):
    from harmony_energy_data_pipeline_spark.operators import expectations as X

    df = spark.createDataFrame(
        [(1, 10.0, "1-HIGH"), (2, -5.0, "9-BAD"), (None, 20.0, "2-MED"), (2, 999.0, None)],
        "k long, price double, prio string",
    )
    got = {
        r["check"]: r["violations"]
        for r in X.expect(
            df,
            [
                X.not_null("k"),
                X.in_range("price", 0, 100),
                X.matches("prio", "^[1-5]-"),
                X.unique("k"),
            ],
        ).collect()
    }
    assert got == {
        "not_null:k": 1,
        "in_range:price": 2,      # -5 and 999
        "matches:prio": 2,        # 9-BAD and NULL
        "unique:k": 1,            # k=2 twice
    }


# --- event analytics: funnel / transitions / cohort ------------------------


def test_funnel_requires_strict_order(spark):
    from harmony_energy_data_pipeline_spark.operators.analytics import funnel

    rows = [
        # u1 completes a->b->c in order
        (1, 1, "a"), (1, 2, "b"), (1, 3, "c"),
        # u2 has b BEFORE a: reaches step a only
        (2, 5, "b"), (2, 6, "a"),
        # u3 reaches a,b but c precedes b
        (3, 1, "c"), (3, 2, "a"), (3, 3, "b"),
    ]
    df = spark.createDataFrame(
        [(u, float(t), s) for u, t, s in rows], "user long, t double, s string"
    ).select("user", F.col("t").cast("timestamp").alias("ts"), "s")
    got = {
        r["step"]: r["n_users"]
        for r in funnel(df, "user", "ts", "s", ["a", "b", "c"]).collect()
    }
    assert got == {"a": 3, "b": 2, "c": 1}


def test_transition_counts_with_ts_ties(spark):
    from harmony_energy_data_pipeline_spark.operators.analytics import (
        transition_counts,
    )

    rows = [(1, 1.0, 10, "a"), (1, 1.0, 11, "b"), (1, 2.0, 12, "a")]
    df = spark.createDataFrame(rows, "u long, t double, id long, s string").select(
        "u", F.col("t").cast("timestamp").alias("ts"), "id", "s"
    )
    got = {
        (r["prev_type"], r["next_type"]): r["n"]
        for r in transition_counts(df, "u", "ts", "s", "id").collect()
    }
    # tie at t=1.0 resolved by id: a(10) -> b(11) -> a(12)
    assert got == {("a", "b"): 1, ("b", "a"): 1}


def test_cohort_retention_offsets(spark):
    from harmony_energy_data_pipeline_spark.operators.analytics import (
        cohort_retention,
    )

    rows = [
        (1, "2024-01-01"), (1, "2024-01-08"), (1, "2024-01-22"),
        (2, "2024-01-08"),
    ]
    df = spark.createDataFrame(rows, "u long, d string").select(
        "u", F.col("d").cast("timestamp").alias("ts")
    )
    got = {
        (str(r["cohort_week"]), r["week_offset"]): r["n_users"]
        for r in cohort_retention(df, "u", "ts").collect()
    }
    assert got == {
        ("2024-01-01 00:00:00", 0): 1,
        ("2024-01-01 00:00:00", 1): 1,
        ("2024-01-01 00:00:00", 3): 1,
        ("2024-01-08 00:00:00", 0): 1,
    }


# --- Gram matrix / PCA ------------------------------------------------------


def test_gram_matrix_matches_numpy(spark):
    import numpy as np

    from harmony_energy_data_pipeline_spark.operators.similarity import gram_matrix

    rng = [[0.5, -0.25, 0.125], [1.0, 0.0, -1.0], [0.1, 0.2, 0.3], [0.0, 0.0, 0.0]]
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(rng)], "vec_id long, embedding array<float>"
    )
    got = {(r["i"], r["j"]): r["s"] for r in gram_matrix(df).collect()}
    m = np.rint(np.array(rng, dtype="float32").astype("float64") * 1_000_000).astype(
        "int64"
    )
    g = m.T @ m
    want = {
        (i, j): int(g[i, j]) for i in range(3) for j in range(3) if i <= j
    }
    assert got == want


def test_gram_matrix_stable_under_repartition(spark, sf_dir):
    from harmony_energy_data_pipeline_spark.io import load_table
    from harmony_energy_data_pipeline_spark.operators.similarity import gram_matrix

    emb = load_table(spark, "embeddings", sf_dir)
    a = {(r["i"], r["j"]): r["s"] for r in gram_matrix(emb).collect()}
    b = {
        (r["i"], r["j"]): r["s"]
        for r in gram_matrix(emb.repartition(13)).collect()
    }
    assert a == b  # integer partial GEMMs merge exactly, any layout


def test_pca_project_recovers_dominant_direction(spark):
    import numpy as np

    from harmony_energy_data_pipeline_spark.operators.similarity import pca_project

    # points hugging the (1,1,0)/sqrt2 axis + small noise off-axis
    rng = np.random.RandomState(7)
    t = rng.uniform(-1, 1, 200)
    pts = np.stack([t, t, 0.01 * rng.uniform(-1, 1, 200)], axis=1)
    df = spark.createDataFrame(
        [(i, [float(x) for x in row]) for i, row in enumerate(pts)],
        "vec_id long, embedding array<float>",
    )
    out = {r["vec_id"]: r["pc"] for r in pca_project(df, k=1).collect()}
    # pc1 should be ~ t*sqrt(2): correlation with t is ~1
    pc1 = np.array([out[i][0] for i in range(200)])
    corr = np.corrcoef(pc1, t)[0, 1]
    assert abs(corr) > 0.999


# --- quantile binning + repeat suppression ---------------------------------


def test_quantile_bins_exact_small(spark):
    from harmony_energy_data_pipeline_spark.operators.analytics import quantile_bins

    rows = [(i, float(i)) for i in range(101)]  # values 0..100
    df = spark.createDataFrame(rows, "k long, v double")
    got = {r["k"]: r["bin"] for r in quantile_bins(df, "k", "v", [0.25, 0.5, 0.75]).collect()}
    # k >= n: cuts are exact (25, 50, 75)
    assert got[0] == 0 and got[24] == 0
    assert got[25] == 1 and got[49] == 1
    assert got[50] == 2 and got[75] == 3 and got[100] == 3


def test_suppress_repeats_keeps_first_and_spaced(spark):
    from harmony_energy_data_pipeline_spark.operators.cleaning import (
        suppress_repeats_within,
    )

    rows = [
        (1, 1, "a", 0.0),     # kept (first)
        (2, 1, "a", 1800.0),  # suppressed: 30min after previous raw row
        (3, 1, "a", 3601.0 + 1800.0),  # kept: >1h after row 2 (lag semantics)
        (4, 1, "b", 60.0),    # kept: different key
        (5, 2, "a", 10.0),    # kept: different user
    ]
    df = spark.createDataFrame(rows, "event_id long, user_id long, t string, sec double").select(
        "event_id", "user_id", "t", F.col("sec").cast("timestamp").alias("ts")
    )
    kept = {
        r["event_id"]
        for r in suppress_repeats_within(df, ["user_id", "t"], "ts", "event_id", 3600).collect()
    }
    assert kept == {1, 3, 4, 5}


def test_fuzzy_multipass_recovers_prefix_edits(spark):
    from harmony_energy_data_pipeline_spark.operators.dedup import (
        fuzzy_match_pairs,
        fuzzy_match_pairs_multipass,
    )

    rows = [
        (1, "golden widget"),
        (2, "Golden widget"),   # same after normalize -> prefix block
        (3, "folden widget"),   # edit in char 1: escapes the prefix block
    ]
    df = spark.createDataFrame(rows, "id long, name string")
    single = {
        (r["id_a"], r["id_b"]) for r in fuzzy_match_pairs(df, "id", "name").collect()
    }
    multi = {
        (r["id_a"], r["id_b"])
        for r in fuzzy_match_pairs_multipass(df, "id", "name").collect()
    }
    assert (1, 3) not in single            # prefix block misses it
    assert (1, 3) in multi and (2, 3) in multi  # suffix block recovers it
    assert single <= multi


def test_key_skew_profile_uniform_vs_skewed(spark):
    import math

    from harmony_energy_data_pipeline_spark.operators.analytics import (
        key_skew_profile,
    )

    uniform = spark.createDataFrame([(i % 10,) for i in range(1000)], "k long")
    skewed = spark.createDataFrame(
        [(0,)] * 991 + [(i,) for i in range(1, 10)], "k long"
    )
    u = key_skew_profile(uniform, "k").first()
    s = key_skew_profile(skewed, "k").first()
    assert u["n_keys"] == 10 == s["n_keys"]
    assert u["max_share_ppm"] == 100_000          # 10% each
    assert s["max_share_ppm"] == 991_000          # one hot key
    # uniform entropy = ln(10) in micro-nats; skewed far below
    assert abs(u["entropy_micro_nats"] - round(math.log(10) * 1e6)) <= 5
    assert s["entropy_micro_nats"] < u["entropy_micro_nats"] / 10


def test_expectations_empty_table_reports_zero(spark):
    from harmony_energy_data_pipeline_spark.operators import expectations as X

    empty = spark.createDataFrame([], "k long, price double")
    got = {
        r["check"]: r["violations"]
        for r in X.expect(
            empty, [X.not_null("k"), X.in_range("price", 0, 1), X.unique("k")]
        ).collect()
    }
    assert got == {"not_null:k": 0, "in_range:price": 0, "unique:k": 0}


def test_weighted_sample_drops_nonpositive_weights(spark):
    # w == 0 -> -inf priority; w < 0 inverts the order: both must be
    # dropped, never silently ranked
    rows = [(1, 5.0), (2, 0.0), (3, -4.0), (4, 1.0), (5, None)]
    df = spark.createDataFrame(rows, "k long, w double")
    got = {r["k"] for r in weighted_sample(df, "k", "w", k=10).collect()}
    assert got == {1, 4}
    grouped = weighted_sample(
        df.withColumn("g", F.lit("x")), "k", "w", k=10, group_col="g"
    )
    assert {r["k"] for r in grouped.collect()} == {1, 4}


def test_table_digest_separator_in_value_not_ambiguous(spark):
    # without escaping, ("a\x1f\x01b", NULL) and ("a", "b\x1f\x00")
    # canonicalize to the same string and digest equal
    from harmony_energy_data_pipeline_spark.operators.expectations import (
        table_digest,
    )

    left = spark.createDataFrame([("a\x1f\x01b", None)], "x string, y string")
    right = spark.createDataFrame([("a", "b\x1f\x00")], "x string, y string")
    assert tuple(table_digest(left).first()) != tuple(table_digest(right).first())
    # escape char itself round-trips distinctly too
    esc1 = spark.createDataFrame([("a\x02", "b")], "x string, y string")
    esc2 = spark.createDataFrame([("a", "\x02b")], "x string, y string")
    assert tuple(table_digest(esc1).first()) != tuple(table_digest(esc2).first())


def test_pagerank_reliable_checkpoint_branch(spark):
    """n_iter past the checkpoint cadence exercises the reliable
    checkpoint() path (the default-length tests never reach it): the
    ranks must match the exact python model, and the checkpointed
    plan must read from an RDD scan (lineage truncated to the
    checkpoint files, not the source)."""
    from harmony_energy_data_pipeline_spark.operators.graph import (
        pagerank_fixed_point,
    )

    edges = [(1, 2), (1, 3), (2, 1), (3, 1), (2, 3)]
    df = spark.createDataFrame(edges, "src long, dst long")
    n_iter, every = 7, 3
    out = pagerank_fixed_point(df, n_iter=n_iter, checkpoint_every=every)
    got = {r["node"]: r["rank_micro"] for r in out.collect()}

    unit, d = 1_000_000, 85
    deg = {1: 2, 2: 2, 3: 1}
    r = {1: unit, 2: unit, 3: unit}
    for _ in range(n_iter):
        contrib = {1: 0, 2: 0, 3: 0}
        for s, t in edges:
            contrib[t] += r[s] // deg[s]
        r = {v: ((100 - d) * unit + d * contrib[v]) // 100 for v in r}
    assert got == r
    # rounds 3 and 6 checkpointed: the final plan's lineage starts at
    # the round-6 checkpoint RDD, not the createDataFrame source
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert "LogicalRDD" in plan or "ExistingRDD" in plan, plan[:500]


def test_truncate_every_cadence(spark):
    """Checkpoint exactly on window boundaries and never on the final
    round of a fixed-length loop."""
    from harmony_energy_data_pipeline_spark.operators.iterative import (
        ensure_checkpoint_dir,
        truncate_every,
    )

    ensure_checkpoint_dir(spark)
    df = spark.range(10)

    def is_ckpt(out):
        p = out._jdf.queryExecution().optimizedPlan().toString()
        return "LogicalRDD" in p or "ExistingRDD" in p

    # 0-based rounds, every=3, n_rounds=7: boundaries after rounds
    # 2 and 5; round 6 is last -> never checkpointed
    want = {0: False, 1: False, 2: True, 3: False, 4: False, 5: True, 6: False}
    for i, w in want.items():
        assert is_ckpt(truncate_every(df, i, n_rounds=7, every=3)) is w, i


def test_semdedup_exact_prepass_equivalence(spark):
    """Exact copies collapse to the min-id rep before the quadratic
    stage with NO result change: copies of a surviving vector keep
    only the min id; zero vectors (cosine 0 to everything, including
    their own copies) all survive in both modes."""
    base = [0.6, 0.8] + [0.0] * 6
    ortho = [1.0, 0.0] + [0.0] * 6
    rows = (
        [(1, base), (9, base), (17, base)]        # copies: keep id 1
        + [(2, ortho), (10, ortho)]               # copies: keep id 2
        + [(3, [0.0] * 8), (11, [0.0] * 8)]       # zero vectors: keep BOTH
    )
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    for vectorized in (True, False):
        kept = {
            r["vec_id"]
            for r in similarity.semdedup(
                df, threshold=0.95, n_cells=2, vectorized=vectorized
            ).collect()
        }
        assert kept == {1, 2, 3, 11}, (vectorized, kept)
