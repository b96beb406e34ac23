"""Training-corpus export sinks.

The delivery format for LLM training data is almost always sharded
JSONL (one document per line, N files of bounded size) with a
manifest the loader can stripe over. These writers produce that
layout with Spark-native mechanics — no driver-side iteration, no
collect; sharding is Spark's own file sizing (``maxRecordsPerFile``)
or an explicit deterministic shard key for exactly-N layouts.

Reference scope note: the reference serves charts from SQLite
(src/serve) and has no export stage; this extends the engine for
training-data workloads.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_jsonl_shards(
    df: DataFrame,
    path: str,
    max_records_per_file: int | None = None,
    n_shards: int | None = None,
    shard_key: str | None = None,
    compression: str | None = None,
) -> None:
    """Write ``df`` as sharded JSONL (Spark's json sink = one document
    per line).

    Two sharding modes:
    - ``max_records_per_file``: Spark splits output files at the cap;
      shard COUNT follows data volume (the rolling-append case).
    - ``n_shards`` (+ ``shard_key``): exactly N files, rows routed by
      the md5-bucket of the key — DETERMINISTIC placement (a row's
      shard never depends on partition layout), which training loaders
      need for resumable striping. One repartition shuffle.

    At 100 TB use the first mode for ingest-order corpora and the
    second when the loader contract fixes the shard count.
    """
    writer = df.write.mode("overwrite")
    if n_shards is not None:
        key = shard_key or df.columns[0]
        from harmony_energy_data_pipeline_spark.operators.sampling import split_bucket

        # repartitionByRange, not repartition: hash partitioning re-hashes
        # the bucket VALUE, so two of N buckets can land in one partition
        # (and leave another empty); range partitioning on the N distinct
        # bucket values puts exactly one bucket per partition
        df = (
            df.withColumn("__shard", split_bucket(key, n_shards))
            .repartitionByRange(n_shards, F.col("__shard"))
            .drop("__shard")
        )
        writer = df.write.mode("overwrite")
    if max_records_per_file is not None:
        writer = writer.option("maxRecordsPerFile", max_records_per_file)
    if compression is not None:
        writer = writer.option("compression", compression)
    writer.json(path)
    if n_shards is not None:
        # The exactly-N contract rests on RangePartitioner putting one
        # bucket value per partition — but its boundaries come from a
        # SAMPLE, so two buckets can share a partition (and an empty
        # bucket writes no file). Verify loudly instead of letting the
        # loader contract break silently.
        n_files = sum(1 for f in os.listdir(path) if f.startswith("part-"))
        if n_files != n_shards:
            raise RuntimeError(
                f"exactly-N shard contract violated: wrote {n_files} part "
                f"files, expected {n_shards} (range boundaries are sampled; "
                "two buckets shared a partition or a bucket was empty)"
            )


def jsonl_manifest(spark: SparkSession, path: str) -> list[dict]:
    """Manifest of a JSONL export: one entry per shard file with its
    size and line count — what a training loader stripes over. Counts
    are computed distributed (one text-scan with an input-file
    grouping), not by reading files on the driver."""
    from urllib.parse import unquote, urlparse

    # input_file_name() yields a percent-encoded URI; key counts by the
    # decoded basename so paths with spaces/special chars still match
    counts = {
        os.path.basename(unquote(urlparse(r["file"]).path)): r["n"]
        for r in (
            spark.read.text(os.path.join(path, "part-*"))
            .groupBy(F.input_file_name().alias("file"))
            .agg(F.count("*").alias("n"))
            .collect()
        )
    }
    entries = []
    for fname in sorted(os.listdir(path)):
        if not fname.startswith("part-"):
            continue
        full = os.path.join(path, fname)
        if fname not in counts:
            raise ValueError(f"no line count resolved for shard {fname}")
        entries.append(
            {
                "file": fname,
                "bytes": os.path.getsize(full),
                "n_records": int(counts[fname]),
            }
        )
    return entries


def write_manifest(spark: SparkSession, path: str) -> str:
    """Write ``_manifest.json`` next to the shards; returns its path.
    The underscore prefix keeps Spark (and most loaders) from listing
    the manifest as a data file on a later read of the directory."""
    manifest = jsonl_manifest(spark, path)
    out = os.path.join(path, "_manifest.json")
    with open(out, "w", encoding="utf-8") as fh:
        json.dump(manifest, fh, indent=1)
    return out
