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
        from harmony_energy_data_pipeline_spark.sinks.snapshots import (
            read_snapshot,
        )

        df = read_snapshot(spark, out).withColumn("f", F.input_file_name())
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
    from harmony_energy_data_pipeline_spark.sinks.snapshots import read_snapshot

    docs = _docs(spark, sf_dir).limit(40)
    out = str(tmp_path / "mp")
    write_jsonl_shards(docs, out, n_shards=2, shard_key="doc_id")
    write_manifest(spark, out)
    back = read_snapshot(spark, out)
    # the snapshot metadata (and `_manifest.json`) are invisible to the
    # reader — only the manifest's frozen shard list is scanned
    assert back.count() == 40
    assert "_corrupt_record" not in back.columns


def test_reexport_never_tears_a_reader(spark, tmp_path, sf_dir):
    """Round-4 contract: a reader resolved BEFORE a concurrent
    re-export keeps its frozen shard list (old snapshot-log versions
    stay readable until vacuum); there is no mid-swap window at all."""
    from harmony_energy_data_pipeline_spark.sinks.snapshots import read_snapshot

    docs = _docs(spark, sf_dir).limit(60)
    out = str(tmp_path / "re")
    write_jsonl_shards(docs, out, n_shards=2, shard_key="doc_id")
    frozen = read_snapshot(spark, out)  # resolve version 0 now
    # the "concurrent" re-export (new version published atomically)
    write_jsonl_shards(docs.limit(10), out, n_shards=2, shard_key="doc_id")
    assert frozen.count() == 60          # reader untorn
    assert read_snapshot(spark, out).count() == 10  # new readers see v1
    m = jsonl_manifest(spark, out)
    assert sum(e["n_records"] for e in m) == 10


def test_jsonl_manifest_reads_legacy_flat_exports(spark, tmp_path, sf_dir):
    """Pre-round-4 exports are plain directories of part files; the
    manifest reader must still serve them."""
    docs = _docs(spark, sf_dir).limit(30)
    out = str(tmp_path / "legacy")
    docs.coalesce(1).write.mode("overwrite").json(out)
    m = jsonl_manifest(spark, out)
    assert sum(e["n_records"] for e in m) == 30
    assert all(e["file"].startswith("part-") for e in m)


def test_reexport_onto_legacy_flat_layout_supersedes_it(spark, tmp_path, sf_dir):
    """A snapshot-log export over a pre-round-4 flat directory must
    remove the superseded top-level part files (the old API's
    overwrite semantics) once the commit is durable."""
    import os

    from harmony_energy_data_pipeline_spark.sinks.snapshots import read_snapshot

    docs = _docs(spark, sf_dir).limit(30)
    out = str(tmp_path / "mix")
    docs.coalesce(1).write.mode("overwrite").json(out)  # legacy flat
    assert any(f.startswith("part-") for f in os.listdir(out))
    write_jsonl_shards(docs.limit(12), out, n_shards=2, shard_key="doc_id")
    assert not any(
        f.startswith("part-")
        for f in os.listdir(out)
        if os.path.isfile(os.path.join(out, f))
    )
    assert read_snapshot(spark, out).count() == 12
    assert sum(e["n_records"] for e in jsonl_manifest(spark, out)) == 12
