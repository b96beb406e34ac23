"""Declared schemas: the generation fact table, the run-history audit
table, and the driver testdata tables.

The reference declares its target schema as an ORM model
(/root/reference/src/db/models.py:6-45) and *coerces* incoming data to
it (missing columns added as nulls, extras dropped). Here the target
schema is a StructType and coercion is `operators.cleaning.align_schema`.
"""

from __future__ import annotations

from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# Generation fact table — 35 columns: int PK, event-time timestamp,
# 33 double measures (/root/reference/src/db/models.py:6-45).
# ---------------------------------------------------------------------------

FUEL_COLS: list[str] = [
    "GAS", "COAL", "NUCLEAR", "WIND", "WIND_EMB", "HYDRO", "IMPORTS",
    "BIOMASS", "OTHER", "SOLAR", "STORAGE",
]
ROLLUP_COLS: list[str] = [
    "GENERATION", "CARBON_INTENSITY", "LOW_CARBON", "ZERO_CARBON",
    "RENEWABLE", "FOSSIL",
]
# Share-of-generation columns: every measure except CARBON_INTENSITY
# has a `{name}_perc` companion (models.py:30-45).
PERC_COLS: list[str] = [
    f"{c}_perc" for c in FUEL_COLS + ["GENERATION", "LOW_CARBON",
                                      "ZERO_CARBON", "RENEWABLE", "FOSSIL"]
]
MEASURE_COLS: list[str] = FUEL_COLS + ROLLUP_COLS + PERC_COLS

GENERATION_SCHEMA = T.StructType(
    [
        T.StructField("_id", T.LongType(), nullable=False),
        T.StructField("DATETIME", T.TimestampType(), nullable=False),
    ]
    + [T.StructField(c, T.DoubleType(), nullable=True) for c in MEASURE_COLS]
)

# Raw-ingest shape: DATETIME arrives as an ISO-8601 *string*, numerics
# may arrive as strings too (transform.py:35 schema override; proven by
# tests/test_transform.py:57-82). Parsing/casting happens in the
# cleaning operators, not at read time.
GENERATION_RAW_SCHEMA = T.StructType(
    [
        T.StructField("_id", T.LongType(), nullable=True),
        T.StructField("DATETIME", T.StringType(), nullable=True),
    ]
    + [T.StructField(c, T.StringType(), nullable=True) for c in MEASURE_COLS]
)

# ---------------------------------------------------------------------------
# Pipeline run-history audit table (/root/reference/src/db/models.py:48-58).
# ---------------------------------------------------------------------------

RUN_HISTORY_SCHEMA = T.StructType([
    T.StructField("id", T.LongType(), nullable=False),
    T.StructField("run_start", T.TimestampType(), nullable=False),
    T.StructField("run_stop", T.TimestampType(), nullable=True),
    T.StructField("last_fetched_id", T.LongType(), nullable=True),
    T.StructField("total_fetched", T.LongType(), nullable=True),
    T.StructField("valid_records", T.LongType(), nullable=True),
    T.StructField("success", T.BooleanType(), nullable=True),
    T.StructField("error_message", T.StringType(), nullable=True),
])

# ---------------------------------------------------------------------------
# Driver testdata tables (TESTDATA.md) — declared so reads never infer.
# ---------------------------------------------------------------------------

TESTDATA_SCHEMAS: dict[str, T.StructType] = {
    "region": T.StructType([
        T.StructField("r_regionkey", T.IntegerType()),
        T.StructField("r_name", T.StringType()),
    ]),
    "nation": T.StructType([
        T.StructField("n_nationkey", T.IntegerType()),
        T.StructField("n_name", T.StringType()),
        T.StructField("n_regionkey", T.IntegerType()),
    ]),
    "customer": T.StructType([
        T.StructField("c_custkey", T.LongType()),
        T.StructField("c_name", T.StringType()),
        T.StructField("c_nationkey", T.IntegerType()),
        T.StructField("c_acctbal", T.DoubleType()),
        T.StructField("c_mktsegment", T.StringType()),
    ]),
    "supplier": T.StructType([
        T.StructField("s_suppkey", T.LongType()),
        T.StructField("s_name", T.StringType()),
        T.StructField("s_nationkey", T.IntegerType()),
        T.StructField("s_acctbal", T.DoubleType()),
    ]),
    "part": T.StructType([
        T.StructField("p_partkey", T.LongType()),
        T.StructField("p_name", T.StringType()),
        T.StructField("p_brand", T.StringType()),
        T.StructField("p_type", T.StringType()),
        T.StructField("p_size", T.IntegerType()),
        T.StructField("p_retailprice", T.DoubleType()),
    ]),
    "orders": T.StructType([
        T.StructField("o_orderkey", T.LongType()),
        T.StructField("o_custkey", T.LongType()),
        T.StructField("o_orderstatus", T.StringType()),
        T.StructField("o_totalprice", T.DoubleType()),
        T.StructField("o_orderdate", T.TimestampType()),
        T.StructField("o_orderpriority", T.StringType()),
    ]),
    "lineitem": T.StructType([
        T.StructField("l_orderkey", T.LongType()),
        T.StructField("l_partkey", T.LongType()),
        T.StructField("l_suppkey", T.LongType()),
        T.StructField("l_linenumber", T.IntegerType()),
        T.StructField("l_quantity", T.DoubleType()),
        T.StructField("l_extendedprice", T.DoubleType()),
        T.StructField("l_discount", T.DoubleType()),
        T.StructField("l_tax", T.DoubleType()),
        T.StructField("l_returnflag", T.StringType()),
        T.StructField("l_linestatus", T.StringType()),
        T.StructField("l_shipdate", T.TimestampType()),
    ]),
    "events": T.StructType([
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]),
    "documents": T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]),
    "embeddings": T.StructType([
        T.StructField("vec_id", T.LongType()),
        T.StructField("embedding", T.ArrayType(T.FloatType())),
        T.StructField("label", T.IntegerType()),
    ]),
}

TESTDATA_TABLES = list(TESTDATA_SCHEMAS)
