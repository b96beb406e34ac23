"""Round-3 operators: fixed-point K-means and BPE merge training.

Both operators carry exact-arithmetic determinism contracts, so the
tests check hand-computable answers bit-for-bit, plus the reliable-
checkpoint branch for the iterative loop.
"""
from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from harmony_energy_data_pipeline_spark.operators.similarity import (
    kmeans_fixed_point,
)
from harmony_energy_data_pipeline_spark.operators.text import bpe_learn


# ---------------------------------------------------------------------------
# kmeans_fixed_point
# ---------------------------------------------------------------------------

def _kmeans_rows(spark):
    # two tight 2-d blobs; ids chosen so id % 2 seeding starts MIXED
    # (each seed cell holds one point of each blob) and Lloyd must
    # actually move centroids to separate them.
    rows = [
        (0, [0.0, 0.0]),
        (1, [0.1, 0.0]),
        (2, [0.0, 0.1]),
        (3, [1.0, 1.0]),
        (4, [0.9, 1.0]),
        (5, [1.0, 0.9]),
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_kmeans_separates_blobs(spark):
    out = kmeans_fixed_point(
        _kmeans_rows(spark), id_col="vec_id", vec_col="embedding",
        k=2, n_iter=2,
    )
    rows = {(r.cell, r.pos): (r.cm, r.n_members) for r in out.collect()}
    # Every surviving cell has both dims; membership covers all 6 points.
    cells = {c for c, _ in rows}
    counts = {c: rows[(c, 0)][1] for c in cells}
    assert sum(counts.values()) == 6
    # After 2 Lloyd rounds the blobs must be separated: 3 + 3.
    assert sorted(counts.values()) == [3, 3]
    # Centroids are the exact integer means of the blobs in micro-units:
    # blob A mean = (0.033333.., 0.033333..) -> 33333; blob B -> 966667.
    cms = sorted(rows[(c, 0)][0] for c in cells)
    assert cms == [33333, 966667]


def test_kmeans_checkpoint_branch(spark, tmp_path):
    """checkpoint_every=1 forces the reliable-checkpoint branch every
    round; result must be identical to the lazy run."""
    spark.sparkContext.setCheckpointDir(str(tmp_path / "ckpt"))
    lazy = kmeans_fixed_point(
        _kmeans_rows(spark), id_col="vec_id", vec_col="embedding",
        k=2, n_iter=3,
    )
    ck = kmeans_fixed_point(
        _kmeans_rows(spark), id_col="vec_id", vec_col="embedding",
        k=2, n_iter=3, checkpoint_every=1,
    )
    assert sorted(map(tuple, lazy.collect())) == sorted(map(tuple, ck.collect()))


def test_kmeans_empty_cluster_drops(spark):
    # k=4 over 2 distinct points: at most 2 cells can keep members;
    # empty cells must vanish rather than emit null centroids.
    df = spark.createDataFrame(
        [(0, [0.0]), (1, [1.0]), (2, [0.0]), (3, [1.0])],
        "vec_id long, embedding array<double>",
    )
    out = kmeans_fixed_point(df, k=4, n_iter=2).collect()
    cells = {r.cell for r in out}
    assert len(cells) <= 2
    assert sum({r.cell: r.n_members for r in out}.values()) == 4
    assert all(r.cm is not None for r in out)


# ---------------------------------------------------------------------------
# bpe_learn
# ---------------------------------------------------------------------------

def test_bpe_learn_textbook(spark):
    """Classic BPE example: corpus where 'ab' is the most frequent
    adjacent pair, then the merged symbol pairs with its neighbor."""
    docs = spark.createDataFrame(
        [(1, "abab abc abd"), (2, "abab xy")],
        "doc_id long, text string",
    )
    out = bpe_learn(docs, "doc_id", "text", n_merges=2).orderBy("merge_round")
    rows = out.collect()
    assert [r.merge_round for r in rows] == [1, 2]
    r1 = rows[0]
    # 'a'+'b': abab contributes 2 pairs x 2 occurrences, abc 1, abd 1 -> 6
    assert (r1.left_sym, r1.right_sym, r1.merged, r1.pair_count) == (
        "<a>", "<b>", "<ab>", 6
    )
    r2 = rows[1]
    # after merge: '<ab><ab>' x2 (count 2), '<ab><c>' 1, '<ab><d>' 1
    assert (r2.left_sym, r2.right_sym, r2.merged, r2.pair_count) == (
        "<ab>", "<ab>", "<abab>", 2
    )


def test_bpe_no_cross_boundary_match(spark):
    """The wrapped representation must prevent a merge pattern from
    matching across symbol boundaries: after merging 'a'+'b', a word
    'xab' (symbols <x><ab> once <ab> exists... actually <x><a><b>)
    must not let a later 'b'+'a' rule touch the inside of <ab>."""
    docs = spark.createDataFrame(
        [(1, "ab ab ab ba ba xaby")],
        "doc_id long, text string",
    )
    rows = (
        bpe_learn(docs, "doc_id", "text", n_merges=2)
        .orderBy("merge_round").collect()
    )
    assert (rows[0].left_sym, rows[0].right_sym) == ("<a>", "<b>")
    # round 2's top pair is counted over sequences where every a+b is
    # already fused: 'ba' words are <b><a> (count 2) and that pair must
    # NOT pick up phantom matches inside '<ab>' symbols.
    assert (rows[1].left_sym, rows[1].right_sym, rows[1].pair_count) == (
        "<b>", "<a>", 2
    )


def test_bpe_single_char_words_no_pairs(spark):
    docs = spark.createDataFrame(
        [(1, "a b c a b a")], "doc_id long, text string"
    )
    # no adjacent pairs exist anywhere -> top-1 of an empty agg = no rows
    out = bpe_learn(docs, "doc_id", "text", n_merges=1)
    assert out.count() == 0


# ---------------------------------------------------------------------------
# bigram_nll
# ---------------------------------------------------------------------------

def test_bigram_nll_hand_computed(spark):
    from harmony_energy_data_pipeline_spark.operators.text import bigram_nll

    docs = spark.createDataFrame(
        [(1, "a b a c"), (2, "a b"), (3, "only")],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in bigram_nll(docs, "doc_id", "text").collect()}
    # model: cf(a,b)=2 cf(b,a)=1 cf(a,c)=1; cf(a,.)=3 cf(b,.)=1
    # doc1 = -(ln(2/3) + ln(1/1) + ln(1/3)) / 3, micro-nat quantized
    assert out[1].n_bigrams == 3
    assert abs(out[1].nll - 0.501359) < 1e-6
    assert out[2].n_bigrams == 1
    assert abs(out[2].nll - 0.405465) < 1e-6
    # a single-token document has no bigram stream -> no row
    assert 3 not in out


# ---------------------------------------------------------------------------
# quantized_dot_topk
# ---------------------------------------------------------------------------

def test_quantized_dot_exact_and_clamped(spark):
    from harmony_energy_data_pipeline_spark.operators.similarity import (
        quantized_dot_topk,
    )

    vecs = spark.createDataFrame(
        [
            (0, [1.0, 0.0]),     # query
            (1, [1.0, 0.0]),     # identical -> dot 127*127
            (2, [0.0, 1.0]),     # orthogonal -> 0
            (3, [2.0, 0.0]),     # out of range -> clamped to 127
            (4, [-1.0, 0.0]),    # opposite -> -127*127
        ],
        "vec_id long, embedding array<double>",
    )
    out = quantized_dot_topk(
        vecs.filter(F.col("vec_id") == 0), vecs, k=10
    ).orderBy("rank").collect()
    got = [(r.neighbor_id, r.dot_q) for r in out]
    # ids 1 and 3 tie at 16129 (clamp!), tie-break by neighbor id
    assert got == [(1, 16129), (3, 16129), (2, 0), (4, -16129)]
    assert [r.rank for r in out] == [1, 2, 3, 4]


def test_bpe_token_counts_applies_merges(spark):
    from harmony_energy_data_pipeline_spark.operators.text import bpe_token_counts

    docs = spark.createDataFrame(
        [(1, "abab abc abd"), (2, "abab xy")],
        "doc_id long, text string",
    )
    out = {r.token: r.token_count for r in
           bpe_token_counts(docs, "doc_id", "text", n_merges=2, top_k=None).collect()}
    # merges: a+b -> ab, ab+ab -> abab; words become
    # abab->[abab]x2, abc->[ab,c], abd->[ab,d], xy->[x,y]
    assert out == {"abab": 2, "ab": 2, "c": 1, "d": 1, "x": 1, "y": 1}


def test_bigram_nll_survives_empty_and_punct_docs(spark):
    from harmony_energy_data_pipeline_spark.operators.text import bigram_nll

    docs = spark.createDataFrame(
        [(1, "the cat sat"), (2, "!!!"), (3, ""), (4, None)],
        "doc_id long, text string",
    )
    out = {r.doc_id for r in bigram_nll(docs, "doc_id", "text").collect()}
    assert out == {1}  # degenerate docs are skipped, never crash the job


def test_bpe_pair_free_round_keeps_histogram(spark):
    from harmony_energy_data_pipeline_spark.operators.text import (
        bpe_learn, bpe_token_counts,
    )

    docs = spark.createDataFrame(
        [(1, "a b c"), (2, "a a b")], "doc_id long, text string"
    )
    # no multi-symbol words at all: zero rules, but the encode must
    # still return the per-character histogram (not an empty frame)
    assert bpe_learn(docs, "doc_id", "text", n_merges=3).count() == 0
    out = {r.token: r.token_count for r in
           bpe_token_counts(docs, "doc_id", "text", n_merges=3, top_k=None).collect()}
    assert out == {"a": 3, "b": 2, "c": 1}


def test_kmeans_n_iter_zero_returns_seed_centroids(spark):
    out = kmeans_fixed_point(_kmeans_rows(spark), k=2, n_iter=0).collect()
    # seed cells: even ids {0,2,4} and odd ids {1,3,5} -> 3 members each
    counts = {r.cell: r.n_members for r in out}
    assert counts == {0: 3, 1: 3}
    assert all(r.cm is not None for r in out)


def test_cms_never_underestimates_and_flags_superset(spark):
    from harmony_energy_data_pipeline_spark.operators.analytics import cms_estimates

    rows = [(i, f"u{i % 7}") for i in range(200)] + [(1000 + i, "hot") for i in range(50)]
    df = spark.createDataFrame(rows, "event_id long, user_id string")
    out = cms_estimates(df, "user_id", width=8, depth=2).collect()
    assert all(r.est_count >= r.exact_count for r in out)  # CMS invariant
    by_key = {r.user_id: r for r in out}
    assert by_key["hot"].exact_count == 50
    # heavy-hitter mode returns a superset of the true heavy keys
    hh = {r.user_id for r in
          cms_estimates(df, "user_id", width=8, depth=2, min_est=50).collect()}
    assert "hot" in hh


def test_downsample_weekly_is_monday_aligned(spark):
    from harmony_energy_data_pipeline_spark.operators import analytics

    df = spark.createDataFrame(
        [("2024-01-03 12:00:00", 1.0), ("2024-01-07 12:00:00", 3.0),
         ("2024-01-08 00:00:00", 10.0)],
        "DATETIME string, v double",
    ).select(F.to_timestamp("DATETIME").alias("DATETIME"), "v")
    out = {str(r.DATETIME): r.v for r in
           analytics.downsample(df, "1w", agg_cols=["v"]).collect()}
    # 2024-01-01 is a Monday: Jan 3 + Jan 7 share its week, Jan 8 starts the next
    assert out == {"2024-01-01 00:00:00": 2.0, "2024-01-08 00:00:00": 10.0}


def test_grouped_trend_ignores_null_rows(spark):
    from harmony_energy_data_pipeline_spark.operators.analytics import grouped_trend

    df = spark.createDataFrame(
        [("u1", "2024-01-01 00:00:00", 1.0),
         ("u1", "2024-01-01 01:00:00", 2.0),
         ("u1", None, 99.0),
         ("u1", "2024-01-01 02:00:00", None)],
        "k string, ts string, v double",
    ).select("k", F.to_timestamp("ts").alias("ts"), "v")
    rows = grouped_trend(df, "k", "ts", "v").collect()
    assert len(rows) == 1
    r = rows[0]
    assert r.n == 2 and abs(r.slope_per_hour - 1.0) < 1e-9


def test_grouped_trend_expr_matches_pandas_route(spark, sf_dir):
    # sufficient-statistics expression route must be BIT-identical to
    # the grouped pandas fit, including degenerate groups (n=1, and
    # den=0 from repeated timestamps)
    from harmony_energy_data_pipeline_spark.io import load_table
    from harmony_energy_data_pipeline_spark.operators.analytics import grouped_trend

    ev = load_table(spark, "events", sf_dir)
    expr_rows = {
        r["user_id"]: (r["slope_per_hour"], r["intercept"], r["n"])
        for r in grouped_trend(ev, "user_id", "ts", "value").collect()
    }
    pandas_rows = {
        r["user_id"]: (r["slope_per_hour"], r["intercept"], r["n"])
        for r in grouped_trend(ev, "user_id", "ts", "value", method="pandas").collect()
    }
    assert expr_rows == pandas_rows

    edge = spark.createDataFrame(
        [("solo", "2024-01-01 00:00:00", 5.0),
         ("flat", "2024-01-01 00:00:00", 1.0),
         ("flat", "2024-01-01 00:00:00", 3.0)],
        "k string, ts string, v double",
    ).select("k", F.to_timestamp("ts").alias("ts"), "v")
    e = {r["k"]: tuple(r)[1:] for r in grouped_trend(edge, "k", "ts", "v").collect()}
    p = {r["k"]: tuple(r)[1:] for r in grouped_trend(edge, "k", "ts", "v", method="pandas").collect()}
    assert e == p
    assert e["solo"][0] == 0.0 and e["solo"][1] == 5.0  # degenerate: ybar
    assert e["flat"][0] == 0.0 and e["flat"][1] == 2.0  # den=0: ybar


def test_bpe_round_chain_is_unpersisted(spark, sf_dir):
    """Round-4 fix: bpe_learn must not leave one cached histogram per
    merge round — at most the in-flight pair (parent+child) during a
    round, and ZERO of its own blocks after it returns (winners are
    checkpointed, histograms unpersisted)."""
    from harmony_energy_data_pipeline_spark.io import load_table
    from harmony_energy_data_pipeline_spark.operators.text import bpe_learn

    def n_persistent():
        return spark.sparkContext._jsc.getPersistentRDDs().size()

    docs = load_table(spark, "documents", sf_dir).limit(200)
    before = n_persistent()
    out = bpe_learn(docs, "doc_id", "text", n_merges=5)
    assert out.count() == 5
    assert n_persistent() - before <= 0, (
        f"bpe_learn leaked {n_persistent() - before} persisted RDDs"
    )


# ---------------------------------------------------------------------------
# round-4 hardening: semdedup cell guard, topk routing, kmeans GEMM E-step
# ---------------------------------------------------------------------------

def test_semdedup_refuses_oversized_cell(spark, sf_dir):
    """A cell whose distinct vectors exceed max_cell_rows must refuse
    loudly (the |cell|^2 similarity matrix would OOM a worker), naming
    the n_cells remedy — never silently drop the cell."""
    import pytest as _pytest

    from harmony_energy_data_pipeline_spark.io import load_table
    from harmony_energy_data_pipeline_spark.operators.similarity import semdedup

    emb = load_table(spark, "embeddings", sf_dir).limit(40)
    squeezed = semdedup(emb, n_cells=1, max_cell_rows=10)
    with _pytest.raises(Exception, match="max_cell_rows"):
        squeezed.count()
    # same data under the default cap is fine
    assert semdedup(emb, n_cells=1).count() > 0


def test_topk_route_decision():
    from harmony_energy_data_pipeline_spark.operators.similarity import topk_route

    assert topk_route(10, 100) == "broadcast"
    assert topk_route(100, 100) == "broadcast"   # inclusive bound
    assert topk_route(101, 100) == "bucketed"
    assert topk_route(10**9, None) == "broadcast"  # probe disabled


def test_quantized_topk_bucketed_full_probe_matches_broadcast(spark, sf_dir):
    """Routing sanity: with n_probe == n_centroids the bucketed path
    scores every (query, corpus) pair, so it must equal the broadcast
    plan EXACTLY (integer scores, deterministic ranks)."""
    from harmony_energy_data_pipeline_spark.io import load_table
    from harmony_energy_data_pipeline_spark.operators.similarity import (
        quantized_dot_topk,
    )

    emb = load_table(spark, "embeddings", sf_dir).limit(60)
    qs = emb.limit(12)
    exact = quantized_dot_topk(qs, emb, k=5, max_broadcast_queries=None)
    routed = quantized_dot_topk(
        qs, emb, k=5, max_broadcast_queries=1,  # force the bucketed route
        n_centroids=4, n_probe=4,
    )
    cols = ["query_id", "neighbor_id", "dot_q", "rank"]
    assert sorted(map(tuple, exact.select(cols).collect())) == sorted(
        map(tuple, routed.select(cols).collect())
    )


def test_quantized_topk_bucketed_partial_probe_is_subset(spark, sf_dir):
    """n_probe < n_centroids restricts candidates: every returned pair
    must also appear in the exact scoring (no invented scores), with
    identical dot values."""
    from harmony_energy_data_pipeline_spark.io import load_table
    from harmony_energy_data_pipeline_spark.operators.similarity import (
        quantized_dot_topk,
    )

    emb = load_table(spark, "embeddings", sf_dir).limit(60)
    qs = emb.limit(8)
    exact = {
        (r["query_id"], r["neighbor_id"]): r["dot_q"]
        for r in quantized_dot_topk(
            qs, emb, k=1000, max_broadcast_queries=None
        ).collect()
    }
    routed = quantized_dot_topk(
        qs, emb, k=5, max_broadcast_queries=1, n_centroids=4, n_probe=2
    ).collect()
    assert routed, "bucketed route returned nothing"
    for r in routed:
        assert exact[(r["query_id"], r["neighbor_id"])] == r["dot_q"]


def test_kmeans_gemm_assign_parity(spark, sf_dir):
    """The mapInPandas GEMM E-step must be bit-identical to the
    exploded exact-integer expression E-step on real embeddings."""
    from harmony_energy_data_pipeline_spark.io import load_table
    from harmony_energy_data_pipeline_spark.operators.similarity import (
        kmeans_fixed_point,
    )

    emb = load_table(spark, "embeddings", sf_dir)
    a = kmeans_fixed_point(emb, k=5, n_iter=2, assign_mode="expr")
    b = kmeans_fixed_point(emb, k=5, n_iter=2, assign_mode="gemm")
    cols = ["cell", "pos", "cm", "n_members"]
    assert sorted(map(tuple, a.select(cols).collect())) == sorted(
        map(tuple, b.select(cols).collect())
    )


def test_quantized_topk_gemm_scorer_matches_expr(spark, sf_dir):
    """The GEMM broadcast scorer must be bit-identical to the
    zip_with/aggregate expression fold — ranks, ties, and self-pair
    exclusion included."""
    from harmony_energy_data_pipeline_spark.io import load_table
    from harmony_energy_data_pipeline_spark.operators.similarity import (
        quantized_dot_topk,
    )

    emb = load_table(spark, "embeddings", sf_dir)
    qs = emb.limit(15)
    cols = ["query_id", "neighbor_id", "dot_q", "rank"]
    for include_self in (False, True):
        a = quantized_dot_topk(
            qs, emb, k=7, scorer="expr", include_self=include_self,
            max_broadcast_queries=None,
        )
        b = quantized_dot_topk(
            qs, emb, k=7, scorer="gemm", include_self=include_self,
            max_broadcast_queries=None,
        )
        assert sorted(map(tuple, a.select(cols).collect())) == sorted(
            map(tuple, b.select(cols).collect())
        ), f"include_self={include_self}"


def test_gemm_query_block_seams_are_exact(spark, sf_dir, monkeypatch):
    """The per-worker memory bound chunks the query matrix; block
    seams must not change results. Forced tiny blocks exercise many
    seams on real embeddings for both GEMM scorers."""
    from harmony_energy_data_pipeline_spark.io import load_table
    from harmony_energy_data_pipeline_spark.operators import similarity as sim

    emb = load_table(spark, "embeddings", sf_dir)
    qs = emb.limit(20)
    base_q = sim.quantized_dot_topk(qs, emb, k=5, scorer="expr",
                                    max_broadcast_queries=None)
    base_c = sim.cosine_topk(qs, emb, k=5)
    want_q = sorted(map(tuple, base_q.select("query_id", "neighbor_id", "dot_q", "rank").collect()))
    want_c = sorted(
        (r["query_id"], r["rank"], r["neighbor_id"]) for r in base_c.collect()
    )
    monkeypatch.setattr(sim, "_GEMM_QUERY_BLOCK", 7)
    got_q = sorted(map(tuple, sim.quantized_dot_topk(
        qs, emb, k=5, scorer="gemm", max_broadcast_queries=None
    ).select("query_id", "neighbor_id", "dot_q", "rank").collect()))
    got_c = sorted(
        (r["query_id"], r["rank"], r["neighbor_id"])
        for r in sim.cosine_topk(qs, emb, k=5, scorer="gemm").collect()
    )
    assert got_q == want_q
    assert got_c == want_c
