"""Parquet table loaders for the driver testdata and engine tables.

Reads are plain ``spark.read.parquet`` so Catalyst gets full pushdown:
filters land in ``PushedFilters`` and projections in ``ReadSchema`` of
the parquet scan — the scan only materializes what the query needs.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from harmony_energy_data_pipeline_spark.schemas import TESTDATA_SCHEMAS

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def convert_nano_timestamps(df: DataFrame, name: str) -> DataFrame:
    """Convert LongType nano-timestamp columns (surfaced by
    ``spark.sql.legacy.parquet.nanosAsLong``) to true timestamps,
    truncated to micros — the same truncation DuckDB applies. Pure
    projection, so it works on batch and streaming DataFrames alike."""
    declared = TESTDATA_SCHEMAS.get(name)
    if declared is None:
        return df
    actual = {f.name: f.dataType for f in df.schema.fields}
    for field in declared.fields:
        if isinstance(field.dataType, T.TimestampType) and isinstance(
            actual.get(field.name), T.LongType
        ):
            # `div` = integer division: double division would lose
            # sub-microsecond precision on 60-bit nano values.
            df = df.withColumn(
                field.name,
                F.expr(f"timestamp_micros(`{field.name}` div 1000)"),
            )
    return df


def load_table(spark: SparkSession, name: str, sf_dir: str | None = None) -> DataFrame:
    """Load one testdata table (region/nation/.../embeddings) as a DataFrame.

    The testdata parquet stores TIMESTAMP(NANOS) which Spark lacks; with
    ``spark.sql.legacy.parquet.nanosAsLong`` those columns surface as
    LongType nanos and are converted here to true timestamps.
    """
    base = sf_dir or DEFAULT_SF_DIR
    df = spark.read.parquet(os.path.join(base, f"{name}.parquet"))
    return convert_nano_timestamps(df, name)


def load_tables(spark: SparkSession, names: list[str], sf_dir: str | None = None) -> dict[str, DataFrame]:
    return {n: load_table(spark, n, sf_dir) for n in names}


def register_views(spark: SparkSession, names: list[str], sf_dir: str | None = None) -> None:
    """Register testdata tables as temp views so ``spark.sql`` entry works."""
    for n in names:
        load_table(spark, n, sf_dir).createOrReplaceTempView(n)
