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

from harmony_energy_data_pipeline_spark.sinks.pathnorm import normalizes_paths


@normalizes_paths('path')
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
    still raises loudly.

    Publication is a SNAPSHOT-LOG commit (round 4; previously a
    directory swap): the flattened shards land under
    ``<path>/data/<txid>/part-<k>.json`` and a manifest publish makes
    them live atomically — a concurrent reader resolves a manifest
    once and streams a frozen file list, so re-exports never tear or
    FileNotFound a reader mid-swap. Old flat exports (pre-snapshot)
    remain readable via the legacy path in :func:`jsonl_manifest`.
    """
    import glob as _glob
    import shutil
    import uuid as _uuid

    from harmony_energy_data_pipeline_spark.operators.sampling import split_bucket
    from harmony_energy_data_pipeline_spark.sinks.snapshots import (
        snapshot_publish_staged,
    )

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
    txid = _uuid.uuid4().hex[:12]
    final = os.path.join(path, "data", txid)
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
        snapshot_publish_staged(
            path, txid,
            extra={"format": "json", "n_shards": n_shards},
        )
    except BaseException:
        # a failed staging must not leave an orphan txid dir readers
        # could be confused by in listings (it was never published).
        # Scope: pre-publish ONLY — once snapshot_publish_staged
        # returns, the manifest references this txid dir and deleting
        # it would destroy committed data.
        shutil.rmtree(final, ignore_errors=True)
        raise
    finally:
        shutil.rmtree(staging, ignore_errors=True)
    # A re-export ONTO a legacy flat export (pre-round-4 layout)
    # leaves its superseded top-level part files behind — the old
    # API overwrote the directory wholesale, so remove them once
    # the snapshot commit is durable (manifest readers already
    # prefer the snapshot; this keeps directory listings honest).
    # Deliberately OUTSIDE the try above: the commit is published, so
    # a cleanup failure here must never delete committed data — and a
    # concurrently-removed file is simply tolerated.
    for fname in os.listdir(path):
        if fname.startswith("part-") and os.path.isfile(
            os.path.join(path, fname)
        ):
            try:
                os.remove(os.path.join(path, fname))
            except FileNotFoundError:
                pass


@normalizes_paths('path')
def jsonl_manifest(spark: SparkSession, path: str) -> list[dict]:
    """Manifest of a JSONL export: one entry per shard file with its
    size and line count — what a training loader stripes over. Counts
    are computed distributed (one text-scan with an input-file
    grouping), not by reading files on the driver.

    Snapshot-log exports (``n_shards`` mode) resolve the latest
    manifest ONCE and scan that frozen file list — a concurrent
    re-export publishes a new version and never perturbs this reader.
    Legacy flat exports (``max_records_per_file`` mode, or tables
    written before round 4) fall back to a directory listing; that
    path replays any interrupted pre-snapshot swap first, which
    mutates the directory — safe only under the documented
    reader-after-crash contract (no LIVE legacy writer concurrently
    swapping), the same contract ``read_partitioned_committed``
    states. New exports never hit it."""
    from urllib.parse import unquote, urlparse

    from harmony_energy_data_pipeline_spark.sinks import snapshots as _snap

    if os.path.isdir(os.path.join(path, "_snapshots")):
        v = _snap.latest_version(path)
        if v is None:
            raise FileNotFoundError(f"no committed export at {path}")
        files = sorted(
            _snap._abs_file(path, f)
            for f in _snap._read_manifest(path, v)["files"]
        )
    else:  # legacy flat layout
        from harmony_energy_data_pipeline_spark.sinks.dirswap import (
            recover_dir_swap,
        )

        recover_dir_swap(path)  # never list a half-swapped export
        files = sorted(
            os.path.join(path, f)
            for f in os.listdir(path)
            if f.startswith("part-")
        )
    if not files:
        return []

    # input_file_name() yields a percent-encoded URI; key counts by the
    # decoded basename so paths with spaces/special chars still match
    counts = {
        os.path.basename(unquote(urlparse(r["file"]).path)): r["n"]
        for r in (
            spark.read.text(files)
            .groupBy(F.input_file_name().alias("file"))
            .agg(F.count("*").alias("n"))
            .collect()
        )
    }
    entries = []
    for full in files:
        fname = os.path.basename(full)
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


@normalizes_paths('path')
def write_manifest(spark: SparkSession, path: str) -> str:
    """Write ``_manifest.json`` next to the shards; returns its path.
    The underscore prefix keeps Spark (and most loaders) from listing
    the manifest as a data file on a later read of the directory."""
    manifest = jsonl_manifest(spark, path)
    out = os.path.join(path, "_manifest.json")
    with open(out, "w", encoding="utf-8") as fh:
        json.dump(manifest, fh, indent=1)
    return out
