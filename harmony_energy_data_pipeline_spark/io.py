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

# Runtime-settable semantic knobs the engine depends on. A caller may
# hand us a session built elsewhere (the driver harness does); without
# these, TIMESTAMP(NANOS) parquet reads fail outright and timestamp
# bucketing would follow the caller's zone instead of UTC.
_REQUIRED_CONF = {
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.ansi.enabled": "false",
    # Testdata written as timestamp[us] with no zone would otherwise
    # infer TIMESTAMP_NTZ, which streaming watermarks reject
    # (EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE). With the session TZ pinned
    # to UTC above, reading it as TIMESTAMP is value-identical.
    "spark.sql.parquet.inferTimestampNTZ.enabled": "false",
}


def ensure_semantics(spark: SparkSession) -> SparkSession:
    for k, v in _REQUIRED_CONF.items():
        try:
            if spark.conf.get(k, None) != v:
                spark.conf.set(k, v)
        except Exception:
            pass  # static conf on some build: fall through, read may still work
    return spark


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


#: Per-session relation cache: ``spark.read.parquet`` pays an EAGER
#: file listing + schema-inference footer read (~150-200 ms of driver
#: time per call, measured at sf0.1) even for a table loaded moments
#: ago. A DataFrame is an immutable plan object, so re-serving it is
#: semantically identical — this is the resolved-relation cache every
#: catalog-backed engine has, scoped per live SparkSession (weak keys:
#: a stopped session's entries vanish with it). Fixture tables are
#: static by contract; pass ``cache=False`` to force re-inference.
import weakref

_TABLE_CACHE: "weakref.WeakKeyDictionary" = weakref.WeakKeyDictionary()


def local_relation(spark: SparkSession, rows, schema: str) -> DataFrame:
    """Tiny driver-local relation, built through the ARROW path.

    ``spark.createDataFrame(list_of_tuples, schema)`` routes through a
    pickled Python RDD and costs a full job (~0.3 s measured for a
    3-row relation); handing the same rows over as a pandas DataFrame
    uses the session's Arrow conversion instead (~5× faster, no RDD
    job). For FLAT ATOMIC columns only (ints/strings/floats, no nulls
    in numeric columns — pandas would widen them to NaN floats);
    empty input falls back to the classic path, which handles a 0-row
    frame without dtype guessing.
    """
    rows = list(rows)
    flat = all(
        isinstance(r, (tuple, list))
        and all(isinstance(v, (int, float, str, bool)) for v in r)
        for r in rows
    )
    if not rows or not flat:
        # empty, nested, or null-carrying rows: the classic path casts
        # through the declared schema without pandas dtype guessing
        return spark.createDataFrame(rows, schema)
    import pandas as pd

    names = [f.name for f in T.StructType.fromDDL(schema).fields]
    return spark.createDataFrame(pd.DataFrame(rows, columns=names), schema=schema)


def load_table(
    spark: SparkSession, name: str, sf_dir: str | None = None,
    cache: bool = True,
) -> DataFrame:
    """Load one testdata table (region/nation/.../embeddings) as a DataFrame.

    The testdata parquet stores TIMESTAMP(NANOS) which Spark lacks; with
    ``spark.sql.legacy.parquet.nanosAsLong`` those columns surface as
    LongType nanos and are converted here to true timestamps.
    """
    base = os.path.abspath(sf_dir or DEFAULT_SF_DIR)
    if cache:
        per_session = _TABLE_CACHE.setdefault(spark, {})
        hit = per_session.get((name, base))
        if hit is not None:
            return hit
    ensure_semantics(spark)
    df = spark.read.parquet(os.path.join(base, f"{name}.parquet"))
    df = convert_nano_timestamps(df, name)
    if cache:
        per_session[(name, base)] = df
    return df


def scan_ts_range(
    spark: SparkSession,
    name: str,
    sf_dir: str | None,
    ts_col: str,
    start: str,
    end: str,
) -> DataFrame:
    """Time-range scan with parquet predicate pushdown, inclusive both
    ends.

    A filter on the *converted* timestamp column cannot push down (the
    scan column is INT64 nanos; Catalyst won't invert
    ``timestamp_micros(x div 1000)``), so a full 100 TB table would be
    read just to drop most of it. This helper applies the equivalent
    range on the raw nano column BEFORE conversion — the predicate
    lands in PushedFilters and row groups outside the range are never
    read. ``ts >= S`` ⇔ ``nanos >= S·10⁹``;
    ``ts <= E`` (micros-truncated) ⇔ ``nanos <= E·10⁹ + 999``.

    For natively-written tables (micros timestamps) a plain
    ``between`` pushes down already and this helper degrades to it.
    """
    base = sf_dir or DEFAULT_SF_DIR
    ensure_semantics(spark)
    df = spark.read.parquet(os.path.join(base, f"{name}.parquet"))
    raw_type = {f.name: f.dataType for f in df.schema.fields}.get(ts_col)
    lo = F.lit(start).cast("timestamp")
    hi = F.lit(end).cast("timestamp")
    if isinstance(raw_type, T.LongType):
        lo_nanos = F.unix_micros(lo) * F.lit(1000)
        hi_nanos = F.unix_micros(hi) * F.lit(1000) + F.lit(999)
        df = df.filter(F.col(ts_col).between(lo_nanos, hi_nanos))
        return convert_nano_timestamps(df, name)
    return convert_nano_timestamps(df, name).filter(F.col(ts_col).between(lo, hi))


def load_tables(spark: SparkSession, names: list[str], sf_dir: str | None = None) -> dict[str, DataFrame]:
    return {n: load_table(spark, n, sf_dir) for n in names}


def register_views(spark: SparkSession, names: list[str], sf_dir: str | None = None) -> None:
    """Register testdata tables as temp views so ``spark.sql`` entry works."""
    for n in names:
        load_table(spark, n, sf_dir).createOrReplaceTempView(n)
