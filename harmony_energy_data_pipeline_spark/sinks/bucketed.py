"""Bucketed-table layout: pre-shuffled storage for co-located joins.

At 100 TB the dominant cost of a big-big equi-join is the shuffle. If
both tables are written bucketed (and sorted) by the join key into the
same bucket count, the sort-merge join reads bucket i against bucket i
with NO exchange at query time — the shuffle was paid once at write
time and amortized over every subsequent join. This is the parquet
analogue of the co-partitioned layouts native OLAP engines use.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed_table(
    df: DataFrame,
    table_name: str,
    bucket_col: str,
    n_buckets: int,
    path: str | None = None,
    sort: bool = True,
) -> None:
    """Write ``df`` as a bucketed (and bucket-sorted) catalog table.
    ``path`` makes it external (data outside the warehouse dir).
    Joins between tables bucketed on the same key with the same
    ``n_buckets`` plan with zero Exchange operators."""
    writer = df.write.mode("overwrite").format("parquet").bucketBy(n_buckets, bucket_col)
    if sort:
        writer = writer.sortBy(bucket_col)
    if path is not None:
        writer = writer.option("path", path)
    writer.saveAsTable(table_name)


def bucketed_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on: str,
    how: str = "inner",
) -> DataFrame:
    """Join two co-bucketed catalog tables on their bucket key."""
    return spark.table(left_table).join(spark.table(right_table), on=on, how=how)


__all__ = ["write_bucketed_table", "bucketed_join"]
