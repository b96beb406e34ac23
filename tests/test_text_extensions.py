"""Unit tests for the round-2 LLM-pipeline text operators: PII
redaction, repetition signal, URL stats, sequence packing."""

from __future__ import annotations

from pyspark.sql import functions as F

from harmony_energy_data_pipeline_spark.io import load_table
from harmony_energy_data_pipeline_spark.operators.sampling import pack_sequences
from harmony_energy_data_pipeline_spark.operators.text import (
    redact_pii,
    repetition_ratio,
    url_domain_stats,
)


def test_redact_pii_tags_and_counts(spark):
    df = spark.createDataFrame(
        [(1, "mail a.b@x.co or c@d.org, call +1-555-123-4567, host 10.0.0.1 end")],
        "id long, t string",
    )
    row = redact_pii(df, "id", "t").collect()[0]
    assert row["n_email"] == 2
    assert row["n_phone"] == 1
    assert row["n_ipv4"] == 1
    assert row["redacted"] == (
        "mail <EMAIL> or <EMAIL>, call <PHONE>, host <IPV4> end"
    )


def test_repetition_ratio_flags_loop_spam(spark):
    df = spark.createDataFrame(
        [(1, "spam spam spam spam spam"), (2, "all words here are unique"), (3, "x")],
        "id long, t string",
    )
    got = {r["id"]: r for r in repetition_ratio(df, "id", "t").collect()}
    assert got[1]["n_ngrams"] == 4 and got[1]["rep_ratio"] == 0.75  # one distinct bigram
    assert got[2]["rep_ratio"] == 0.0
    assert got[3]["n_ngrams"] == 0 and got[3]["rep_ratio"] == 0.0


def test_url_domain_stats_counts_docs_and_urls(spark):
    df = spark.createDataFrame(
        [
            (1, "see https://a.example.org/x and https://a.example.org/y"),
            (2, "also https://a.example.org/z plus http://b.example.io"),
        ],
        "id long, t string",
    )
    got = {r["domain"]: (r["n_docs"], r["n_urls"]) for r in
           url_domain_stats(df, "id", "t").collect()}
    assert got["a.example.org"] == (2, 3)
    assert got["b.example.io"] == (1, 1)


def test_pack_sequences_respects_budget_and_order(spark, sf_dir):
    docs = load_table(spark, "documents", sf_dir)
    sized = docs.select(
        "doc_id", F.size(F.split(F.col("text"), r"\s+")).cast("long").alias("tk")
    )
    budget = 100
    packed = pack_sequences(sized, "doc_id", "tk", budget=budget, n_shards=4).collect()
    by_seq: dict[tuple, list] = {}
    for r in packed:
        by_seq.setdefault((r["shard"], r["seq_id"]), []).append(r)
    assert sum(len(v) for v in by_seq.values()) == docs.count()
    for (_shard, _seq), rows in by_seq.items():
        rows.sort(key=lambda r: r["doc_id"])
        total = sum(r["n_tokens"] for r in rows)
        # budget respected unless a single oversized doc owns the sequence
        assert total <= budget or len(rows) == 1
        # offsets are the running token sum in doc_id order
        run = 0
        for r in rows:
            assert r["tok_offset"] == run
            run += r["n_tokens"]
        assert r["shard"] == r["doc_id"] % 4


def test_histogram_bins_and_clamping(spark):
    from harmony_energy_data_pipeline_spark.operators.analytics import histogram

    df = spark.createDataFrame(
        [("a", -5.0), ("a", 0.0), ("a", 19.9), ("a", 20.0), ("a", 999.0)],
        "g string, v double",
    )
    got = {(r["g"], r["bin"]): (r["bin_lo"], r["n"]) for r in
           histogram(df, "g", "v", bin_width=20.0, n_bins=3).collect()}
    assert got[("a", 0)] == (0.0, 3)   # -5 clamped up, 0, 19.9
    assert got[("a", 1)] == (20.0, 1)
    assert got[("a", 2)] == (40.0, 1)  # 999 clamped into the top bin


def test_chunk_documents_window_math(spark):
    from harmony_energy_data_pipeline_spark.operators.text import chunk_documents

    docs = spark.createDataFrame(
        [
            (1, " ".join(f"w{i}" for i in range(10))),   # short: one chunk
            (2, " ".join(f"w{i}" for i in range(8))),    # exactly chunk_size
            (3, " ".join(f"w{i}" for i in range(9))),    # one token over -> 2 chunks
            (4, " ".join(f"w{i}" for i in range(20))),   # several chunks + short tail
            (5, ""),                                      # empty: zero chunks
        ],
        "doc_id long, text string",
    )
    got = {
        (r["doc_id"], r["chunk_id"]): r
        for r in chunk_documents(docs, "doc_id", "text", chunk_size=8, stride=5).collect()
    }
    by_doc = {}
    for (d, c) in got:
        by_doc.setdefault(d, []).append(c)
    assert sorted(by_doc[1]) == [0, 1]          # 10 tokens: ceil((10-8)/5)+1 = 2
    assert sorted(by_doc[2]) == [0]
    assert sorted(by_doc[3]) == [0, 1]
    assert sorted(by_doc[4]) == [0, 1, 2, 3]    # 20 tokens: ceil(12/5)+1 = 4
    assert 5 not in by_doc
    # tail chunk of doc 4 starts at 3*5+1=16 -> 5 tokens left
    assert got[(4, 3)]["n_tokens"] == 5
    assert got[(4, 0)]["n_tokens"] == 8
    # every token is covered: chunk starts advance by stride <= chunk_size
    assert got[(3, 1)]["n_tokens"] == 4         # tokens 6..9


def test_chunk_hash_is_deterministic_fingerprint(spark):
    from harmony_energy_data_pipeline_spark.operators.text import chunk_documents

    docs = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "alpha beta gamma")], "doc_id long, text string"
    )
    rows = chunk_documents(docs, "doc_id", "text", chunk_size=8, stride=5).collect()
    hashes = {r["chunk_hash"] for r in rows}
    assert len(rows) == 2 and len(hashes) == 1  # same text -> same fingerprint
