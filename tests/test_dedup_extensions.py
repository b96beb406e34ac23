"""Consistency tests for the hash-based near-dup operators (the ones
without SQL oracles): MinHash-LSH recall vs exact Jaccard, SimHash
behavior on identical/perturbed docs."""

from __future__ import annotations

from pyspark.sql import functions as F

from harmony_energy_data_pipeline_spark.io import load_table
from harmony_energy_data_pipeline_spark.operators import dedup


def test_minhash_candidates_recall_high_jaccard(spark, sf_dir):
    """Every truly-similar pair (Jaccard >= 0.7) must be an LSH
    candidate: 16 bands x 4 rows -> P(candidate | s=0.7) ~ 1-(1-0.24)^16
    ~ 0.99, and the seeded hash family makes the check deterministic."""
    docs = load_table(spark, "documents", sf_dir)
    truth = {
        (r["id_a"], r["id_b"])
        for r in dedup.ngram_jaccard_pairs(docs, "doc_id", "text", threshold=0.7).collect()
    }
    cand = {
        (r["id_a"], r["id_b"])
        for r in dedup.minhash_candidate_pairs(docs, "doc_id", "text").collect()
    }
    assert truth, "fixture should contain at least one near-dup pair"
    missed = truth - cand
    assert not missed, f"LSH missed high-similarity pairs: {missed}"


def test_minhash_dedup_removes_only_near_dups(spark, sf_dir):
    docs = load_table(spark, "documents", sf_dir)
    kept = dedup.minhash_dedup(docs, "doc_id", "text", threshold=0.5)
    n_docs, n_kept = docs.count(), kept.count()
    assert n_kept < n_docs  # fixture has near-dups
    # every removed doc really has a >=0.5 partner among the kept set
    removed = docs.join(kept.select("doc_id"), "doc_id", "left_anti")
    pairs = dedup.ngram_jaccard_pairs(docs, "doc_id", "text", threshold=0.5)
    partnered = (
        removed.select("doc_id")
        .join(
            pairs.selectExpr("id_a AS doc_id").union(pairs.selectExpr("id_b AS doc_id")).distinct(),
            "doc_id", "left_semi",
        ).count()
    )
    assert partnered == removed.count()


def test_simhash_identical_and_perturbed(spark):
    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog again and again"),
            (2, "the quick brown fox jumps over the lazy dog again and again"),
            (3, "completely different words about spark shuffles and parquet files"),
        ],
        "doc_id long, text string",
    )
    sigs = {r["doc_id"]: r["s"] for r in docs.select(
        "doc_id", dedup.simhash64("text").alias("s")).collect()}
    assert sigs[1] == sigs[2]
    assert sigs[1] != sigs[3]
    pairs = dedup.simhash_near_pairs(docs, "doc_id", "text", max_hamming=3).collect()
    assert {(r["id_a"], r["id_b"]) for r in pairs} == {(1, 2)}
    assert pairs[0]["hamming"] == 0


def test_exact_dedup_normalization(spark):
    docs = spark.createDataFrame(
        [(1, "Hello,   World!"), (2, "hello world"), (3, "other text")],
        "doc_id long, text string",
    )
    kept = dedup.exact_dedup(docs, "doc_id", "text", normalize=True)
    assert {r["doc_id"] for r in kept.collect()} == {1, 3}  # keeps min id


def test_null_text_rows_survive(spark):
    """NULL documents must not crash the near-dup jobs (they carry no
    shingles, so they never pair)."""
    docs = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog"),
         (2, None),
         (3, "the quick brown fox jumps over the lazy dog")],
        "doc_id long, text string",
    )
    pairs = dedup.minhash_candidate_pairs(docs, "doc_id", "text")
    assert {(r["id_a"], r["id_b"]) for r in pairs.collect()} == {(1, 3)}
    sims = dedup.simhash_near_pairs(docs, "doc_id", "text", max_hamming=3)
    assert {(r["id_a"], r["id_b"]) for r in sims.collect()} == {(1, 3)}
    jac = dedup.ngram_jaccard_pairs(docs, "doc_id", "text", threshold=0.5)
    assert {(r["id_a"], r["id_b"]) for r in jac.collect()} == {(1, 3)}


def test_decontaminate_flag_and_clean_modes(spark):
    from harmony_energy_data_pipeline_spark.operators.dedup import decontaminate

    bench = spark.createDataFrame(
        [(100, "the quick brown fox jumps over the lazy dog")],
        "doc_id long, text string",
    )
    corpus = spark.createDataFrame(
        [
            (1, "a quick brown fox appeared"),        # shares 'quick brown fox'
            (2, "totally unrelated words entirely here"),
            (3, "the quick brown fox jumps again"),   # shares two shingles
        ],
        "doc_id long, text string",
    )
    flagged = {
        r["doc_id"]: r["n_hit"]
        for r in decontaminate(corpus, bench, "doc_id", "text").collect()
    }
    assert set(flagged) == {1, 3}
    assert flagged[3] > flagged[1] >= 1
    clean = decontaminate(corpus, bench, "doc_id", "text", mode="clean")
    assert {r["doc_id"] for r in clean.collect()} == {2}
    # min_overlap=2 drops the single-shingle hit
    strict = decontaminate(corpus, bench, "doc_id", "text", min_overlap=2)
    assert {r["doc_id"] for r in strict.collect()} == {3}


def test_robust_outliers_median_mad(spark):
    from harmony_energy_data_pipeline_spark.operators.analytics import robust_outliers

    rows = [("a", i, 10.0) for i in range(9)] + [("a", 9, 1000.0)] + [
        ("b", 10, 5.0), ("b", 11, 6.0), ("b", 12, 7.0)
    ]
    df = spark.createDataFrame(rows, "g string, id long, value double")
    out = robust_outliers(df, "g", "value").collect()
    # group a: median=10, MAD=0 -> only the 1000.0 row exceeds 3.5*0
    # group b: median=6, MAD=1 -> no deviation exceeds 3.5
    assert [(r["g"], r["id"]) for r in out] == [("a", 9)]
    assert out[0]["med"] == 10.0 and out[0]["mad"] == 0.0


def test_incremental_dedup_batch_and_corpus_gates(spark):
    from harmony_energy_data_pipeline_spark.operators.dedup import incremental_dedup

    corpus = spark.createDataFrame(
        [(1, "Already ingested!")], "doc_id long, text string"
    )
    batch = spark.createDataFrame(
        [
            (10, "already   INGESTED"),   # normalizes to a corpus dupe
            (11, "brand new content"),
            (12, "brand-new content!"),   # internal dupe of 11 (normalized)
            (13, "another fresh one"),
        ],
        "doc_id long, text string",
    )
    kept = {r["doc_id"] for r in
            incremental_dedup(batch, corpus, "doc_id", "text").collect()}
    assert kept == {11, 13}  # 10 dropped vs corpus; 12 loses to 11 in-batch


def test_bloom_incremental_matches_plain(spark, sf_dir):
    """The Bloom stage is a pure pruning device: output must be
    row-identical to incremental_dedup on real data."""
    from harmony_energy_data_pipeline_spark.io import load_table
    from harmony_energy_data_pipeline_spark.operators.dedup import (
        incremental_dedup,
        incremental_dedup_bloom,
    )

    docs = load_table(spark, "documents", sf_dir)
    batch = docs.filter(F.col("doc_id") % 5 != 0)
    corpus = docs.filter(F.col("doc_id") % 5 == 0)
    want = {r["doc_id"] for r in incremental_dedup(batch, corpus, "doc_id", "text").collect()}
    got = {
        r["doc_id"]
        for r in incremental_dedup_bloom(
            batch, corpus, "doc_id", "text", m_bits=1 << 14
        ).collect()
    }
    assert got == want and len(got) > 0


def test_bloom_no_false_negatives_and_prunes(spark):
    """Every corpus member must test maybe=True (no false negative —
    the correctness-critical half), and with a well-sized filter most
    non-members test maybe=False (the pruning half)."""
    from harmony_energy_data_pipeline_spark.operators.dedup import (
        bloom_build,
        bloom_maybe_contains,
    )

    members = spark.range(500).select(F.md5(F.col("id").cast("string")).alias("dg"))
    others = spark.range(500, 1500).select(F.md5(F.col("id").cast("string")).alias("dg"))
    m_bits = 1 << 13  # ~16 bits/element
    words = bloom_build(members, "dg", m_bits)
    in_flags = bloom_maybe_contains(members, "dg", words, m_bits)
    assert in_flags.filter(~F.col("__maybe")).count() == 0
    fp = bloom_maybe_contains(others, "dg", words, m_bits).filter(F.col("__maybe")).count()
    assert fp < 100, fp  # <10% false positives at this sizing


def test_bloom_probe_is_broadcast_no_udf(spark, sf_dir):
    """The membership test must be broadcast-join + bitwise AND —
    no Python evaluation anywhere in the plan."""
    from harmony_energy_data_pipeline_spark.operators.dedup import (
        bloom_build,
        bloom_maybe_contains,
    )

    digests = spark.range(100).select(F.md5(F.col("id").cast("string")).alias("dg"))
    words = bloom_build(digests, "dg", 1 << 12)
    flagged = bloom_maybe_contains(digests, "dg", words, 1 << 12)
    plan = flagged._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_minhash_null_and_empty_docs_generate_no_candidates(spark):
    """Null/empty-shingle docs share the sentinel signature; they must
    be excluded from banding (not explode into a rejected clique) and
    survive dedup untouched."""
    from harmony_energy_data_pipeline_spark.operators.dedup import (
        minhash_candidate_pairs,
        minhash_dedup,
    )

    rows = [(1, "the quick brown fox jumps over the lazy dog today"),
            (2, "the quick brown fox jumps over the lazy dog today"),
            (3, None), (4, None), (5, ""), (6, "")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = minhash_candidate_pairs(df, "doc_id", "text").collect()
    ids_in_pairs = {r.id_a for r in pairs} | {r.id_b for r in pairs}
    # NULL-text docs never band; empty-STRING docs legitimately pair
    # (identical after normalization) and dedup keep-first applies
    assert ids_in_pairs <= {1, 2, 5, 6}
    assert not ids_in_pairs & {3, 4}
    kept = {r.doc_id for r in minhash_dedup(df, "doc_id", "text").collect()}
    assert {3, 4} <= kept          # null docs are never doomed
    assert kept & {1, 2} == {1}    # the true dup pair collapses
    assert kept & {5, 6} == {5}    # so does the empty-string pair


def test_bloom_incremental_keeps_null_text_rows(spark):
    """Row-for-row parity with incremental_dedup on null-text rows
    (the bloom equi-join must not silently drop NULL digests)."""
    from harmony_energy_data_pipeline_spark.operators.dedup import (
        incremental_dedup,
        incremental_dedup_bloom,
    )

    corpus = spark.createDataFrame([(1, "seen before")], "doc_id long, text string")
    batch = spark.createDataFrame(
        [(10, "seen before"), (11, "brand new"), (12, None)],
        "doc_id long, text string",
    )
    plain = {r.doc_id for r in incremental_dedup(batch, corpus, "doc_id", "text").collect()}
    bloom = {r.doc_id for r in incremental_dedup_bloom(batch, corpus, "doc_id", "text").collect()}
    assert plain == bloom == {11, 12}


def test_minhash_exact_prepass_is_result_identical(spark, sf_dir):
    """Round-4: the exact-duplicate prepass must leave the survivor
    set bit-identical to the direct LSH path — including under
    injected exact copies (higher ids, so reps keep) and NULL texts
    (never dropped)."""
    from pyspark.sql import functions as F

    from harmony_energy_data_pipeline_spark.io import load_table
    from harmony_energy_data_pipeline_spark.operators.dedup import minhash_dedup

    base = load_table(spark, "documents", sf_dir).select("doc_id", "text").limit(300)
    hi = base.agg(F.max("doc_id")).first()[0] + 1
    copies = base.limit(50).select(
        (F.col("doc_id") + hi).alias("doc_id"), "text"
    )
    nulls = spark.createDataFrame(
        [(hi * 3, None), (hi * 3 + 1, None)], "doc_id long, text string"
    )
    docs = base.unionByName(copies).unionByName(nulls)
    with_pre = minhash_dedup(docs, "doc_id", "text", threshold=0.5)
    without = minhash_dedup(
        docs, "doc_id", "text", threshold=0.5, exact_prepass=False
    )
    a = sorted(r["doc_id"] for r in with_pre.select("doc_id").collect())
    b = sorted(r["doc_id"] for r in without.select("doc_id").collect())
    assert a == b
    # NULL-text docs survive in both
    assert hi * 3 in a and hi * 3 + 1 in a
