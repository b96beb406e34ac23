"""JSONL sharded export sink tests."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from harmony_energy_data_pipeline_spark.io import load_table
from harmony_energy_data_pipeline_spark.sinks.export import (
    jsonl_manifest,
    write_jsonl_shards,
    write_manifest,
)


def _docs(spark, sf_dir):
    return load_table(spark, "documents", sf_dir).select("doc_id", "lang", "text")


def test_jsonl_roundtrip_and_max_records(spark, tmp_path, sf_dir):
    docs = _docs(spark, sf_dir)
    out = str(tmp_path / "exp")
    write_jsonl_shards(docs, out, max_records_per_file=100)
    back = spark.read.json(out)
    assert back.count() == docs.count()
    # every line is standalone JSON with the full record
    first = json.loads(
        spark.read.text(out).limit(1).collect()[0]["value"]
    )
    assert {"doc_id", "lang", "text"} <= set(first)
    # no file exceeds the cap
    manifest = jsonl_manifest(spark, out)
    assert manifest and all(e["n_records"] <= 100 for e in manifest)


def test_jsonl_fixed_shards_deterministic(spark, tmp_path, sf_dir):
    docs = _docs(spark, sf_dir)
    out1, out2 = str(tmp_path / "a"), str(tmp_path / "b")
    write_jsonl_shards(docs, out1, n_shards=4, shard_key="doc_id")
    write_jsonl_shards(docs.repartition(7), out2, n_shards=4, shard_key="doc_id")
    m1, m2 = jsonl_manifest(spark, out1), jsonl_manifest(spark, out2)
    assert len(m1) == 4 == len(m2)
    # identical shard contents regardless of input partitioning: a
    # given doc routes to the same shard index both times
    def shard_sets(out):
        df = spark.read.json(out).withColumn("f", F.input_file_name())
        return {
            frozenset(
                r["doc_id"] for r in df.filter(F.col("f") == f).collect()
            )
            for f in [x["f"] for x in df.select("f").distinct().collect()]
        }
    assert shard_sets(out1) == shard_sets(out2)


def test_manifest_written(spark, tmp_path, sf_dir):
    docs = _docs(spark, sf_dir).limit(50)
    out = str(tmp_path / "m")
    write_jsonl_shards(docs, out, n_shards=2, shard_key="doc_id")
    p = write_manifest(spark, out)
    entries = json.load(open(p))
    assert sum(e["n_records"] for e in entries) == 50
    assert all(e["bytes"] > 0 for e in entries)


def test_manifest_does_not_pollute_reads(spark, tmp_path, sf_dir):
    docs = _docs(spark, sf_dir).limit(40)
    out = str(tmp_path / "mp")
    write_jsonl_shards(docs, out, n_shards=2, shard_key="doc_id")
    write_manifest(spark, out)
    back = spark.read.json(out)
    # the underscore-prefixed manifest is invisible to the reader
    assert back.count() == 40
    assert "_corrupt_record" not in back.columns
