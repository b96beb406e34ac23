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
