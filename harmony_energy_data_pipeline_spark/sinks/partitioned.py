"""Partition-layout writers: the physical design that makes the 100 TB
table queryable.

The reference's sink is a single SQLite table (~300k rows,
/root/reference/src/serve/load.py:14-51); at engine scale the
equivalent is a date-partitioned parquet/Delta layout so that
time-range queries (the serve path's dominant predicate,
/root/reference/src/app/utils/helpers.py:49-59) prune whole
directories before any IO happens.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def with_date_partition(df: DataFrame, ts_col: str, part_col: str = "dt") -> DataFrame:
    """Derive the partition column (calendar date of the event-time).
    Daily granularity is the default sweet spot: ~365 partitions/year,
    each 100s-of-GB at 100 TB/decade scale — big enough for efficient
    files, small enough to prune hard."""
    return df.withColumn(part_col, F.to_date(F.col(ts_col)))


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    mode: str = "append",
) -> None:
    """Write parquet partitioned by ``partition_cols`` (HIVE layout:
    ``path/dt=2024-01-01/...``). Readers get partition pruning for
    free — a filter on the partition column shows up as
    PartitionFilters in the scan, and non-matching directories are
    never listed."""
    df.write.mode(mode).partitionBy(*partition_cols).parquet(path)


def overwrite_partitions_dynamic(
    spark: SparkSession,
    df: DataFrame,
    path: str,
    partition_cols: list[str],
) -> None:
    """Idempotent partition-level re-write: only the partitions present
    in ``df`` are replaced (dynamic overwrite), everything else is
    untouched — the batch-reprocessing pattern for late/revised data
    at scale (re-run one day, not the decade)."""
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        df.write.mode("overwrite").partitionBy(*partition_cols).parquet(path)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)


def compact_partitions(
    spark: SparkSession,
    path: str,
    partition_cols: list[str],
    target_file_mb: int = 128,
) -> None:
    """Rewrite a partitioned table with right-sized files.

    Incremental merges leave many small files per partition (each
    micro-batch writes its own); small files kill scan throughput at
    scale (per-file open cost, tiny row groups, no effective column
    statistics). Repartition to ~``target_file_mb`` outputs per
    partition-value using on-disk size, then dynamically overwrite.
    The real-world cadence: compact daily partitions once the day is
    closed.
    """
    df = spark.read.parquet(path)
    total_bytes = sum(
        os.path.getsize(os.path.join(dirpath, f))
        for dirpath, _dirs, files in os.walk(path)
        for f in files if f.endswith(".parquet")
    )
    n_parts = max(1, round(total_bytes / (target_file_mb * 1024 * 1024)))
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        (
            df.repartition(n_parts, *partition_cols)
            .write.mode("overwrite").partitionBy(*partition_cols).parquet(path)
        )
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)


__all__ = [
    "with_date_partition", "write_partitioned",
    "overwrite_partitions_dynamic", "compact_partitions",
]
