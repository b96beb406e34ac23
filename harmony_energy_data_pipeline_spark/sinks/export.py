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
    if n_shards is not None:
        _write_exact_shards(df, path, n_shards, shard_key, compression)
        return
    writer = df.write.mode("overwrite")
    if max_records_per_file is not None:
        writer = writer.option("maxRecordsPerFile", max_records_per_file)
    if compression is not None:
        writer = writer.option("compression", compression)
    writer.json(path)


def _write_exact_shards(
    df: DataFrame,
    path: str,
    n_shards: int,
    shard_key: str | None,
    compression: str | None,
) -> None:
    """Exactly-N routing that cannot tear: ``partitionBy`` on the
    bucket value writes each bucket to its own directory as EXACTLY
    one file (a bucket's rows all hash to one task), then the files
    flatten to ``part-<shard>`` names. RangePartitioner was the
    previous mechanism and is NOT sufficient — its boundaries come
    from a sample, so two buckets could share a partition and the
    export silently lost a shard (caught at sf0.1: 7 files of 8).
    The one remaining unroutable case — a bucket with zero rows —
    still raises loudly."""
    import glob as _glob
    import shutil

    from harmony_energy_data_pipeline_spark.operators.sampling import split_bucket

    key = shard_key or df.columns[0]
    staging = path.rstrip("/") + ".__shards_tmp"
    writer = (
        df.withColumn("__shard", split_bucket(key, n_shards))
        .repartition(n_shards, "__shard")
        .write.mode("overwrite")
        .partitionBy("__shard")
    )
    if compression is not None:
        writer = writer.option("compression", compression)
    writer.json(staging)
    # flatten into a sibling, then ONE directory swap — a reader never
    # lists a half-flattened export
    final = path.rstrip("/") + ".__final_tmp"
    shutil.rmtree(final, ignore_errors=True)
    os.makedirs(final)
    try:
        # NULL shard keys hash to a NULL bucket and would land in
        # __HIVE_DEFAULT_PARTITION__ — outside every part-<k> slot, so
        # the flatten would silently drop them while the per-shard
        # count check still passes. Detect and refuse.
        if _glob.glob(os.path.join(staging, "__shard=__HIVE_DEFAULT_PARTITION__")):
            raise ValueError(
                f"shard key {key!r} contains NULLs — exactly-N routing "
                "requires a non-null key (coalesce or filter first)"
            )
        for k in range(n_shards):
            files = sorted(_glob.glob(os.path.join(staging, f"__shard={k}", "part-*")))
            if len(files) != 1:
                raise RuntimeError(
                    f"exactly-N shard contract violated: bucket {k} produced "
                    f"{len(files)} files (zero rows in the bucket, or a "
                    "partial write); refusing to emit a torn export"
                )
            ext = os.path.basename(files[0]).split(".", 1)[1]
            os.rename(files[0], os.path.join(final, f"part-{k:05d}.{ext}"))
        # marker-protected swap: a crash mid-swap rolls FORWARD on the
        # next write or manifest read instead of stranding the export
        from harmony_energy_data_pipeline_spark.sinks.dirswap import (
            swap_dir_commit,
        )

        swap_dir_commit(path, final)
    finally:
        shutil.rmtree(staging, ignore_errors=True)
        shutil.rmtree(final, ignore_errors=True)


def jsonl_manifest(spark: SparkSession, path: str) -> list[dict]:
    """Manifest of a JSONL export: one entry per shard file with its
    size and line count — what a training loader stripes over. Counts
    are computed distributed (one text-scan with an input-file
    grouping), not by reading files on the driver."""
    from urllib.parse import unquote, urlparse

    from harmony_energy_data_pipeline_spark.sinks.dirswap import recover_dir_swap

    recover_dir_swap(path)  # never list a half-swapped export

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
