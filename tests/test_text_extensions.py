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


def test_span_dedup_multiline_boilerplate(spark):
    from harmony_energy_data_pipeline_spark.operators.text import span_dedup

    banner = "accept our cookies to continue"
    docs = spark.createDataFrame(
        [
            (1, f"{banner}\nunique first article body"),
            (2, f"{banner}\nanother distinct article"),
            (3, f"ok\n{banner}"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r["text"] for r in
           span_dedup(docs, "doc_id", "text", min_len=10).collect()}
    # banner survives only at its first global occurrence (doc 1)
    assert out[1] == f"{banner}\nunique first article body"
    assert out[2] == "another distinct article"
    # short spans ("ok") always pass through
    assert out[3] == "ok"


def test_span_dedup_keeps_first_by_doc_then_pos(spark):
    from harmony_energy_data_pipeline_spark.operators.text import span_dedup

    dup = "repeated span of text"
    docs = spark.createDataFrame(
        [(5, f"{dup}\nmiddle line here\n{dup}")],
        "doc_id long, text string",
    )
    out = span_dedup(docs, "doc_id", "text", min_len=10).collect()[0]["text"]
    # intra-doc repeat: only position 0 survives
    assert out == f"{dup}\nmiddle line here"


def test_quantile_band_filter_trims_tails(spark, sf_dir):
    from harmony_energy_data_pipeline_spark.io import load_table
    from harmony_energy_data_pipeline_spark.operators.cleaning import (
        quantile_band_filter,
    )

    docs = load_table(spark, "documents", sf_dir).select("doc_id", "n_chars")
    n = docs.count()
    kept = quantile_band_filter(docs, "n_chars", 0.05, 0.95)
    k = kept.count()
    # ~90% survives; both tails trimmed
    assert 0.85 * n <= k <= 0.95 * n, (k, n)
    lo_all = docs.agg(F.min("n_chars")).first()[0]
    hi_all = docs.agg(F.max("n_chars")).first()[0]
    lo_k = kept.agg(F.min("n_chars")).first()[0]
    hi_k = kept.agg(F.max("n_chars")).first()[0]
    assert lo_k > lo_all and hi_k < hi_all
