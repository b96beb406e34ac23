"""Driver contract for the PySpark engine.

``entry(spark)`` — flagship serve-path chain on sf0.001.
``queries()`` — one callable per implemented operator (SURVEY.md §2).
``oracle_sql()`` — DuckDB-equivalent ANSI SQL per query.

Cross-engine determinism: aggregate queries sum *scaled integers*
(``CAST(round(x*100) AS BIGINT)``) and divide once at the end, so the
result double is bit-identical in Spark and DuckDB regardless of
summation order — plain double sums drift in the last ulps and break
the driver's value hash. Per-row arithmetic uses identical expression
shapes on both sides (same association order ⇒ same doubles).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from harmony_energy_data_pipeline_spark.io import load_table
from harmony_energy_data_pipeline_spark.operators import (
    analytics,
    cleaning,
    dedup,
    similarity,
    text,
)
from harmony_energy_data_pipeline_spark.operators.cleaning import (
    dedup_two_phase,
    handle_missing_values,
    null_row_filter,
    repaired_perc,
)
from harmony_energy_data_pipeline_spark.sinks.upsert import merge_upsert

SF_SMOKE = "/root/testdata/sf0.001"

EVENT_COLS = ["event_id", "ts", "user_id", "event_type", "value", "props"]


def _cents(col, scale: int = 100):
    """Deterministic fixed-point: round(x*scale) as BIGINT."""
    return F.round(F.col(col) * F.lit(scale)).cast("long")


# ---------------------------------------------------------------------------
# entry — flagship query (driver smoke check)
# ---------------------------------------------------------------------------

def entry(spark: SparkSession) -> DataFrame:
    """Serve-path chain on sf0.001 events: two-phase keep-last dedup →
    daily downsample (mean value) → inclusive date-range filter →
    derived column (SURVEY.md §3.2 steps 5–6)."""
    ev = load_table(spark, "events", SF_SMOKE)
    deduped = dedup_two_phase(ev, id_col="event_id", time_col="ts")
    daily = analytics.downsample(deduped, "1d", time_col="ts", agg_cols=["value"])
    ranged = analytics.filter_range(
        daily, "ts", "2024-01-02 00:00:00", "2024-01-29 00:00:00"
    )
    return ranged.select(
        F.col("ts").alias("DATETIME"),
        F.col("value").alias("avg_value"),
        (F.col("value") * F.lit(48.0)).alias("daily_total_proxy"),
    )


# ---------------------------------------------------------------------------
# queries + oracles, defined pairwise
# ---------------------------------------------------------------------------

_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
_ORACLES: dict[str, str] = {}


def _q(name: str, oracle: str | None = None):
    def reg(fn):
        _QUERIES[name] = fn
        if oracle is not None:
            _ORACLES[name] = oracle
        return fn
    return reg


# --- A1: temporal downsample, fixed interval (30m tumbling window) ---------

@_q("downsample_30m", """
SELECT time_bucket(INTERVAL '30 minutes', ts) AS bucket,
       CAST(SUM(CAST(round(value*100) AS BIGINT)) AS DOUBLE) / (100.0 * COUNT(value)) AS avg_value,
       COUNT(*) AS n_rows
FROM events GROUP BY 1
""")
def q_downsample_30m(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir)
    return (
        ev.groupBy(F.window("ts", "30 minutes").alias("__w"))
        .agg(
            (F.sum(_cents("value")).cast("double")
             / (F.lit(100.0) * F.count("value"))).alias("avg_value"),
            F.count("*").alias("n_rows"),
        )
        .select(F.col("__w.start").alias("bucket"), "avg_value", "n_rows")
    )


# --- A1: temporal downsample, calendar interval (month via date_trunc) -----

@_q("downsample_month", """
SELECT CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS bucket,
       CAST(SUM(CAST(round(o_totalprice*100) AS BIGINT)) AS DOUBLE) / (100.0 * COUNT(o_totalprice)) AS avg_totalprice,
       COUNT(*) AS n_orders
FROM orders GROUP BY 1
""")
def q_downsample_month(spark: SparkSession, sf_dir: str) -> DataFrame:
    od = load_table(spark, "orders", sf_dir)
    return (
        od.groupBy(F.date_trunc("month", "o_orderdate").alias("bucket"))
        .agg(
            (F.sum(_cents("o_totalprice")).cast("double")
             / (F.lit(100.0) * F.count("o_totalprice"))).alias("avg_totalprice"),
            F.count("*").alias("n_orders"),
        )
    )


# --- P10: inclusive date-range filter (pushed to the scan) -----------------

@_q("filter_range", """
SELECT * FROM events
WHERE ts BETWEEN TIMESTAMP '2024-01-10 00:00:00' AND TIMESTAMP '2024-01-20 00:00:00'
""")
def q_filter_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    # pushdown-aware variant: the range predicate reaches the parquet
    # scan (on the raw nano column), so row groups outside the window
    # are never read — the semantics match analytics.filter_range
    from harmony_energy_data_pipeline_spark.io import scan_ts_range
    return scan_ts_range(
        spark, "events", sf_dir, "ts", "2024-01-10 00:00:00", "2024-01-20 00:00:00"
    )


# --- D1: two-phase keep-last dedup (constructed duplicates) -----------------

@_q("dedup_two_phase", """
WITH base AS (
  SELECT * FROM events
  UNION ALL
  SELECT event_id, ts + INTERVAL 1 HOUR AS ts, user_id, event_type, value, props
  FROM events WHERE event_id % 7 = 0
  UNION ALL
  SELECT event_id + 1000000000 AS event_id, ts, user_id, event_type, value, props
  FROM events WHERE event_id % 11 = 0
),
p1 AS (
  SELECT event_id, ts, user_id, event_type, value, props FROM (
    SELECT *, row_number() OVER (PARTITION BY event_id ORDER BY ts DESC NULLS LAST,
      user_id DESC NULLS LAST, event_type DESC NULLS LAST,
      value DESC NULLS LAST, props DESC NULLS LAST) AS rn FROM base
  ) WHERE rn = 1
)
SELECT event_id, ts, user_id, event_type, value, props FROM (
  SELECT *, row_number() OVER (PARTITION BY ts ORDER BY event_id DESC NULLS LAST,
    user_id DESC NULLS LAST, event_type DESC NULLS LAST,
    value DESC NULLS LAST, props DESC NULLS LAST) AS rn FROM p1
) WHERE rn = 1
""")
def q_dedup_two_phase(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir)
    dup_ts = (
        ev.filter(F.col("event_id") % 7 == 0)
        .withColumn("ts", F.col("ts") + F.expr("INTERVAL 1 HOUR"))
    )
    # offset must clear every fixture's REAL id range (the 100x sweep
    # caught +1e6 colliding with genuine ids at 10M events, creating
    # (event_id, ts) ties each engine tie-broke differently)
    dup_id = (
        ev.filter(F.col("event_id") % 11 == 0)
        .withColumn("event_id", F.col("event_id") + F.lit(1000000000))
    )
    base = ev.unionByName(dup_ts).unionByName(dup_id)
    return dedup_two_phase(base, id_col="event_id", time_col="ts")


# --- P8/P9/F3/F4: %-consistency repair (CASE WHEN) --------------------------

@_q("repair_percentages", """
SELECT l_orderkey, l_linenumber,
       CASE WHEN abs(l_quantity / l_extendedprice * 100 - l_tax * 1000) > 1.0
            THEN l_quantity / l_extendedprice * 100
            ELSE l_tax * 1000 END AS repaired_perc
FROM lineitem
""")
def q_repair_percentages(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, "lineitem", sf_dir)
    return li.select(
        "l_orderkey", "l_linenumber",
        repaired_perc(
            F.col("l_quantity"), F.col("l_tax") * F.lit(1000),
            F.col("l_extendedprice"), tolerance=1.0,
        ).alias("repaired_perc"),
    )


# Digest twin (round 5): per-row outputs are too big to collect at the
# larger sweep fixtures, so full-surface sweeps compare this bounded
# companion instead — count + keyspace XOR (l_linenumber < 8, so
# orderkey*8+linenumber is injective) + fixed-point value sum.
@_q("repair_percentages_digest", """
SELECT COUNT(*) AS n_rows,
       bit_xor(l_orderkey * 8 + l_linenumber) AS key_xor,
       CAST(SUM(CAST(round((CASE WHEN abs(l_quantity / l_extendedprice * 100 - l_tax * 1000) > 1.0
            THEN l_quantity / l_extendedprice * 100
            ELSE l_tax * 1000 END) * 10000) AS BIGINT)) AS BIGINT) AS sum_u
FROM lineitem
""")
def q_repair_percentages_digest(spark: SparkSession, sf_dir: str) -> DataFrame:
    base = q_repair_percentages(spark, sf_dir)
    return base.agg(
        F.count("*").alias("n_rows"),
        F.expr("bit_xor(l_orderkey * 8 + l_linenumber)").alias("key_xor"),
        F.sum(
            F.round(F.col("repaired_perc") * 10000).cast("long")
        ).cast("long").alias("sum_u"),
    )


# --- P5-P7: null handling (drop null keys, zero-fill floats) ----------------

_DIRTY_EVENTS_SQL = """
  SELECT CASE WHEN event_id % 23 = 0 THEN NULL ELSE event_id END AS event_id,
         CASE WHEN event_id % 19 = 0 THEN NULL ELSE ts END AS ts,
         user_id, event_type,
         CASE WHEN event_id % 13 = 0 THEN NULL ELSE value END AS value,
         props
  FROM events
"""


def _dirty_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir)
    return ev.select(
        F.when(F.col("event_id") % 23 == 0, None).otherwise(F.col("event_id")).alias("event_id"),
        F.when(F.col("event_id") % 19 == 0, None).otherwise(F.col("ts")).alias("ts"),
        "user_id", "event_type",
        F.when(F.col("event_id") % 13 == 0, None).otherwise(F.col("value")).alias("value"),
        "props",
    )


@_q("null_handling", f"""
WITH dirty AS ({_DIRTY_EVENTS_SQL})
SELECT event_id, ts, user_id, event_type, COALESCE(value, 0.0) AS value, props
FROM dirty WHERE event_id IS NOT NULL AND ts IS NOT NULL
""")
def q_null_handling(spark: SparkSession, sf_dir: str) -> DataFrame:
    dirty = _dirty_events(spark, sf_dir)
    return handle_missing_values(dirty, key_cols=("event_id", "ts"), fill_value=0.0)


# --- A4/A5: quality counters -------------------------------------------------

@_q("quality_counts", f"""
WITH dirty AS ({_DIRTY_EVENTS_SQL})
SELECT COUNT(*) AS n_rows,
       COUNT(*) FILTER (WHERE event_id IS NULL OR ts IS NULL OR user_id IS NULL
                        OR event_type IS NULL OR value IS NULL OR props IS NULL) AS n_null_rows
FROM dirty
""")
def q_quality_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    dirty = _dirty_events(spark, sf_dir)
    return dirty.agg(
        F.count("*").alias("n_rows"),
        F.sum(F.when(null_row_filter(dirty), 1).otherwise(0)).alias("n_null_rows"),
    )


# --- S1/T1: keyset incremental scan -----------------------------------------

@_q("incremental_scan", """
SELECT * FROM events WHERE event_id > 400 ORDER BY event_id ASC LIMIT 200
""")
def q_incremental_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    from harmony_energy_data_pipeline_spark.sources.keyset import incremental_scan
    ev = load_table(spark, "events", sf_dir)
    return incremental_scan(ev, "event_id", 400, 200)


# --- S1 via Spark 4 Python DataSource: keyset pages with cursor pushdown ------

@_q("keyset_datasource_scan", """
SELECT event_id AS _id,
       strftime(ts, '%Y-%m-%dT%H:%M:%S') AS DATETIME,
       value AS GENERATION
FROM events WHERE event_id > 400
""")
def q_keyset_datasource_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile
    from harmony_energy_data_pipeline_spark.sources.pyds import (
        KeysetPagesDataSource, write_pages_distributed,
    )
    ev = load_table(spark, "events", sf_dir)
    # fixture build is fully distributed (round 5): each executor
    # partition writes its own page files — no driver-side collect,
    # so the build scales with the table, not the driver heap
    pages_dir = tempfile.mkdtemp(prefix="keyset_pages_")
    write_pages_distributed(
        ev.select(
            F.col("event_id").alias("_id"),
            F.date_format("ts", "yyyy-MM-dd'T'HH:mm:ss").alias("DATETIME"),
            F.col("value").alias("GENERATION"),
        ),
        pages_dir,
        page_size=100,
    )
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(KeysetPagesDataSource)
    df = (
        spark.read.format("keyset_pages")
        .schema("_id BIGINT, DATETIME STRING, GENERATION DOUBLE")
        .option("path", pages_dir).load()
    )
    # the cursor predicate is absorbed by pushFilters — pages whose
    # max _id is below the cursor are never opened
    return df.filter(F.col("_id") > 400)


# --- S5/S6 via SQLite Python DataSource: the reference's actual serve store ---
# Rowid-range partitioned scan + WHERE pushdown into SQLite; the query
# materializes events into a cached .db file first (stdlib sqlite3),
# then reads it back through the Spark source.

@_q("sqlite_scan", """
SELECT event_id, user_id, event_type, value FROM events WHERE value >= 100.0
""")
def q_sqlite_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import pyarrow.parquet as pq
    from harmony_energy_data_pipeline_spark.sources.sqlitedb import (
        SqliteTableDataSource,
        write_sqlite_table,
    )

    cols = ["event_id", "user_id", "event_type", "value"]
    slug = sf_dir.strip("/").replace("/", "_")
    db = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                      ".cache_sqlite", f"{slug}_events.db")
    if not os.path.exists(db):
        t = pq.read_table(f"{sf_dir}/events.parquet", columns=cols)
        rows = list(zip(*[t.column(c).to_pylist() for c in cols]))
        write_sqlite_table(db, "events", cols, rows)
    spark.dataSource.register(SqliteTableDataSource)
    df = (
        spark.read.format("sqlite_table")
        .schema("event_id BIGINT, user_id BIGINT, event_type STRING, value DOUBLE")
        .option("path", db)
        .option("table", "events")
        .option("numPartitions", "8")
        .load()
    )
    # absorbed by pushFilters -> SQLite WHERE, not a post-scan filter
    return df.filter(F.col("value") >= 100.0)


# --- O1-O4/W2: top-k ---------------------------------------------------------

@_q("topk_value", """
SELECT event_id, value FROM events ORDER BY value DESC, event_id ASC LIMIT 10
""")
def q_topk_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir)
    return analytics.top_k(
        ev.select("event_id", "value"),
        [F.col("value").desc(), F.col("event_id").asc()],
        10,
    )


# --- A2/A3: bounds / version probe -------------------------------------------

@_q("bounds", """
SELECT min(ts) AS min_ts, max(ts) AS max_ts,
       min(event_id) AS min_event_id, max(event_id) AS max_event_id
FROM events
""")
def q_bounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir)
    return ev.agg(
        F.min("ts").alias("min_ts"), F.max("ts").alias("max_ts"),
        F.min("event_id").alias("min_event_id"), F.max("event_id").alias("max_event_id"),
    )


# --- R1: unpivot (wide→long, nulls kept) -------------------------------------

@_q("unpivot_lineitem", """
SELECT l_orderkey, l_linenumber, 'l_quantity' AS measure, l_quantity AS value FROM lineitem
UNION ALL
SELECT l_orderkey, l_linenumber, 'l_extendedprice', l_extendedprice FROM lineitem
UNION ALL
SELECT l_orderkey, l_linenumber, 'l_discount', l_discount FROM lineitem
UNION ALL
SELECT l_orderkey, l_linenumber, 'l_tax', l_tax FROM lineitem
""")
def q_unpivot_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, "lineitem", sf_dir)
    return analytics.unpivot_long(
        li,
        ids=["l_orderkey", "l_linenumber"],
        values=["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
        var_name="measure",
        value_name="value",
    )


# Digest twin (round 5): one bounded row PER MEASURE — verifies the
# wide->long routing (each measure's row count, keyspace, value sum)
# without collecting 4x|lineitem| rows at sweep fixtures.
@_q("unpivot_lineitem_digest", """
SELECT measure,
       COUNT(*) AS n_rows,
       bit_xor(l_orderkey * 8 + l_linenumber) AS key_xor,
       CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_cents
FROM (
  SELECT l_orderkey, l_linenumber, 'l_quantity' AS measure, l_quantity AS value FROM lineitem
  UNION ALL
  SELECT l_orderkey, l_linenumber, 'l_extendedprice', l_extendedprice FROM lineitem
  UNION ALL
  SELECT l_orderkey, l_linenumber, 'l_discount', l_discount FROM lineitem
  UNION ALL
  SELECT l_orderkey, l_linenumber, 'l_tax', l_tax FROM lineitem
) u
GROUP BY measure
""")
def q_unpivot_lineitem_digest(spark: SparkSession, sf_dir: str) -> DataFrame:
    base = q_unpivot_lineitem(spark, sf_dir)
    return base.groupBy("measure").agg(
        F.count("*").alias("n_rows"),
        F.expr("bit_xor(l_orderkey * 8 + l_linenumber)").alias("key_xor"),
        F.sum(_cents("value")).cast("long").alias("sum_cents"),
    )


# --- P4/F3: derived computed projection --------------------------------------

@_q("derived_charge", """
SELECT l_orderkey, l_linenumber,
       l_extendedprice * (1 - l_discount) * (1 + l_tax) AS charge
FROM lineitem
""")
def q_derived_charge(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, "lineitem", sf_dir)
    return li.select(
        "l_orderkey", "l_linenumber",
        (F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))
         * (F.lit(1) + F.col("l_tax"))).alias("charge"),
    )


# Digest twin (round 5): micro-unit (1e-6) fixed-point sum over the
# SAME per-row charge expression, so sweeps at any fixture compare one
# row instead of |lineitem| rows.
@_q("derived_charge_digest", """
SELECT COUNT(*) AS n_rows,
       bit_xor(l_orderkey * 8 + l_linenumber) AS key_xor,
       CAST(SUM(CAST(round(l_extendedprice * (1 - l_discount) * (1 + l_tax) * 1000000) AS BIGINT)) AS BIGINT) AS sum_u
FROM lineitem
""")
def q_derived_charge_digest(spark: SparkSession, sf_dir: str) -> DataFrame:
    base = q_derived_charge(spark, sf_dir)
    return base.agg(
        F.count("*").alias("n_rows"),
        F.expr("bit_xor(l_orderkey * 8 + l_linenumber)").alias("key_xor"),
        F.sum(
            F.round(F.col("charge") * 1000000).cast("long")
        ).cast("long").alias("sum_u"),
    )


# --- S4/J1: merge upsert (source wins) ----------------------------------------

@_q("merge_upsert", """
SELECT t.* FROM events t
WHERE t.event_id NOT IN (SELECT event_id FROM events WHERE event_id % 5 = 0)
UNION ALL
SELECT event_id, ts, user_id, event_type, value * 2.0 AS value, props
FROM events WHERE event_id % 5 = 0
""")
def q_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir)
    source = ev.filter(F.col("event_id") % 5 == 0).withColumn(
        "value", F.col("value") * F.lit(2.0)
    )
    return merge_upsert(ev, source, key="event_id")


# --- M4: aggregation breadth — TPC-H Q1 (fixed-point exact) -------------------

@_q("tpch_q1", """
SELECT l_returnflag, l_linestatus,
  CAST(SUM(CAST(round(l_quantity*100) AS BIGINT)) AS DOUBLE) / 100.0 AS sum_qty,
  CAST(SUM(CAST(round(l_extendedprice*100) AS BIGINT)) AS DOUBLE) / 100.0 AS sum_base_price,
  CAST(SUM(CAST(round(l_extendedprice*100) AS BIGINT) * (100 - CAST(round(l_discount*100) AS BIGINT))) AS DOUBLE) / 10000.0 AS sum_disc_price,
  CAST(SUM(CAST(round(l_extendedprice*100) AS BIGINT) * (100 - CAST(round(l_discount*100) AS BIGINT)) * (100 + CAST(round(l_tax*100) AS BIGINT))) AS DOUBLE) / 1000000.0 AS sum_charge,
  CAST(SUM(CAST(round(l_quantity*100) AS BIGINT)) AS DOUBLE) / (100.0 * COUNT(*)) AS avg_qty,
  CAST(SUM(CAST(round(l_extendedprice*100) AS BIGINT)) AS DOUBLE) / (100.0 * COUNT(*)) AS avg_price,
  CAST(SUM(CAST(round(l_discount*100) AS BIGINT)) AS DOUBLE) / (100.0 * COUNT(*)) AS avg_disc,
  COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
""")
def q_tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, "lineitem", sf_dir)
    qty, ep, disc, tax = (_cents("l_quantity"), _cents("l_extendedprice"),
                          _cents("l_discount"), _cents("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            (F.sum(qty).cast("double") / F.lit(100.0)).alias("sum_qty"),
            (F.sum(ep).cast("double") / F.lit(100.0)).alias("sum_base_price"),
            (F.sum(ep * (F.lit(100) - disc)).cast("double") / F.lit(10000.0)).alias("sum_disc_price"),
            (F.sum(ep * (F.lit(100) - disc) * (F.lit(100) + tax)).cast("double")
             / F.lit(1000000.0)).alias("sum_charge"),
            (F.sum(qty).cast("double") / (F.lit(100.0) * F.count("*"))).alias("avg_qty"),
            (F.sum(ep).cast("double") / (F.lit(100.0) * F.count("*"))).alias("avg_price"),
            (F.sum(disc).cast("double") / (F.lit(100.0) * F.count("*"))).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


# --- M4: broadcast hash join + agg --------------------------------------------

@_q("brand_revenue", """
SELECT p.p_brand,
  CAST(SUM(CAST(round(l.l_extendedprice*100) AS BIGINT) * (100 - CAST(round(l.l_discount*100) AS BIGINT))) AS DOUBLE) / 10000.0 AS revenue,
  COUNT(*) AS n_items
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
GROUP BY p.p_brand
""")
def q_brand_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, "lineitem", sf_dir)
    pt = load_table(spark, "part", sf_dir)
    ep, disc = _cents("l_extendedprice"), _cents("l_discount")
    return (
        li.join(F.broadcast(pt), li.l_partkey == pt.p_partkey)
        .groupBy("p_brand")
        .agg(
            (F.sum(ep * (F.lit(100) - disc)).cast("double") / F.lit(10000.0)).alias("revenue"),
            F.count("*").alias("n_items"),
        )
    )


# --- M4: multi-way join (TPC-H Q5 shape) ---------------------------------------

@_q("region_revenue", """
SELECT n.n_name,
  CAST(SUM(CAST(round(l.l_extendedprice*100) AS BIGINT) * (100 - CAST(round(l.l_discount*100) AS BIGINT))) AS DOUBLE) / 10000.0 AS revenue
FROM customer c
JOIN orders o ON o.o_custkey = c.c_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
WHERE r.r_name = 'EUROPE'
GROUP BY n.n_name
""")
def q_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, "customer", sf_dir)
    o = load_table(spark, "orders", sf_dir)
    li = load_table(spark, "lineitem", sf_dir)
    n = load_table(spark, "nation", sf_dir)
    r = load_table(spark, "region", sf_dir)
    ep, disc = _cents("l_extendedprice"), _cents("l_discount")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r.filter(F.col("r_name") == "EUROPE")),
              n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg((F.sum(ep * (F.lit(100) - disc)).cast("double") / F.lit(10000.0)).alias("revenue"))
    )


# --- M4: TPC-H Q10 (returned-items revenue, 4-way join + top-k) -----------------

@_q("tpch_q10", """
SELECT c.c_custkey, c.c_name,
  CAST(SUM(CAST(round(l.l_extendedprice*100) AS BIGINT) * (100 - CAST(round(l.l_discount*100) AS BIGINT))) AS DOUBLE) / 10000.0 AS revenue,
  n.n_name
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
WHERE o.o_orderdate >= TIMESTAMP '1993-10-01 00:00:00'
  AND o.o_orderdate < TIMESTAMP '1994-01-01 00:00:00'
  AND l.l_returnflag = 'R'
GROUP BY c.c_custkey, c.c_name, n.n_name
ORDER BY revenue DESC, c_custkey ASC
LIMIT 20
""")
def q_tpch_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, "customer", sf_dir)
    o = load_table(spark, "orders", sf_dir)
    li = load_table(spark, "lineitem", sf_dir)
    n = load_table(spark, "nation", sf_dir)
    ep, disc = _cents("l_extendedprice"), _cents("l_discount")
    return (
        li.filter(F.col("l_returnflag") == "R")
        .join(
            o.filter(
                (F.col("o_orderdate") >= F.lit("1993-10-01 00:00:00").cast("timestamp"))
                & (F.col("o_orderdate") < F.lit("1994-01-01 00:00:00").cast("timestamp"))
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg((F.sum(ep * (F.lit(100) - disc)).cast("double") / F.lit(10000.0)).alias("revenue"))
        .select("c_custkey", "c_name", "revenue", "n_name")
        .orderBy(F.col("revenue").desc(), F.col("c_custkey").asc())
        .limit(20)
    )


# --- M4: anti / semi joins ------------------------------------------------------

@_q("customers_without_orders", """
SELECT c_custkey, c_name FROM customer
WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
""")
def q_customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, "customer", sf_dir)
    o = load_table(spark, "orders", sf_dir)
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey", "c_name")


@_q("customers_with_open_orders", """
SELECT c_custkey, c_mktsegment FROM customer
WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_orderstatus = 'O')
""")
def q_customers_with_open_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, "customer", sf_dir)
    o = load_table(spark, "orders", sf_dir)
    return c.join(
        o.filter(F.col("o_orderstatus") == "O"), c.c_custkey == o.o_custkey, "left_semi"
    ).select("c_custkey", "c_mktsegment")


# --- M4: dim-dim join over the remaining table (supplier) -----------------------

@_q("suppliers_per_nation", """
SELECT n.n_name, COUNT(*) AS n_suppliers,
  CAST(SUM(CAST(round(s.s_acctbal*100) AS BIGINT)) AS DOUBLE) / 100.0 AS total_acctbal
FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey
GROUP BY n.n_name
""")
def q_suppliers_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = load_table(spark, "supplier", sf_dir)
    n = load_table(spark, "nation", sf_dir)
    return (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count("*").alias("n_suppliers"),
            (F.sum(_cents("s_acctbal")).cast("double") / F.lit(100.0)).alias("total_acctbal"),
        )
    )


# --- M4: rollup (grouping sets) --------------------------------------------------

@_q("rollup_orders", """
SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n_orders,
  CAST(SUM(CAST(round(o_totalprice*100) AS BIGINT)) AS DOUBLE) / 100.0 AS total
FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
""")
def q_rollup_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, "orders", sf_dir)
    return (
        o.rollup("o_orderstatus", "o_orderpriority")
        .agg(
            F.count("*").alias("n_orders"),
            (F.sum(_cents("o_totalprice")).cast("double") / F.lit(100.0)).alias("total"),
        )
    )


# --- W1/W2: ranking window -----------------------------------------------------

@_q("top3_orders_per_customer", """
SELECT o_custkey, o_orderkey, o_totalprice, rnk FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC) AS rnk
  FROM orders
) WHERE rnk <= 3
""")
def q_top3_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, "orders", sf_dir)
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return (
        o.select("o_custkey", "o_orderkey", "o_totalprice",
                 F.row_number().over(w).alias("rnk"))
        .filter(F.col("rnk") <= 3)
    )


# --- W: lag / event-time delta ---------------------------------------------------

@_q("value_delta_per_user", """
SELECT user_id, event_id, value,
       value - lag(value) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC) AS delta
FROM events
""")
def q_value_delta_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir)
    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    return ev.select(
        "user_id", "event_id", "value",
        (F.col("value") - F.lag("value").over(w)).alias("delta"),
    )


# --- W: frame-spec window (rolling mean over last 4 rows) -------------------------

@_q("moving_avg_user", """
SELECT user_id, event_id,
  CAST(SUM(CAST(round(value*100) AS BIGINT)) OVER w AS DOUBLE)
    / (100.0 * COUNT(value) OVER w) AS moving_avg
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
             ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)
""")
def q_moving_avg_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir)
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").asc(), F.col("event_id").asc())
        .rowsBetween(-3, Window.currentRow)
    )
    return ev.select(
        "user_id", "event_id",
        (F.sum(_cents("value")).over(w).cast("double")
         / (F.lit(100.0) * F.count("value").over(w))).alias("moving_avg"),
    )


# --- SQL-string entry point: GROUPING SETS via spark.sql --------------------------

@_q("grouping_sets_sql", """
SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n_orders
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
""")
def q_grouping_sets_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    # the spark.sql(...) surface (SURVEY.md §3.3): same engine, SQL text in
    from harmony_energy_data_pipeline_spark.io import register_views
    register_views(spark, ["orders"], sf_dir)
    return spark.sql("""
        SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n_orders
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    """)


# --- F: JSON extraction -----------------------------------------------------------

@_q("json_extract_props", """
SELECT event_id, CAST(json_extract_string(props, '$.k') AS INTEGER) AS k
FROM events
""")
def q_json_extract_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir)
    return ev.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("int").alias("k"),
    )


# --- M5: text analysis --------------------------------------------------------------

_NORM = "trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))"
_TOKS = f"CASE WHEN {_NORM} = '' THEN [] ELSE string_split({_NORM}, ' ') END"
_EN = "['the','a','of','and','to','in','is','it','that','for']"

@_q("text_stats", f"""
WITH t AS (
  SELECT doc_id, text, {_TOKS} AS toks FROM documents
)
SELECT doc_id,
  length(text) AS n_chars_raw,
  len(toks) AS n_tokens,
  CAST(COALESCE(list_sum(list_transform(toks, w -> CAST(ceil(length(w)/4.0) AS BIGINT))), 0) AS BIGINT) AS n_tokens_bpe,
  CASE WHEN len(toks) > 0
       THEN CAST(list_sum(list_transform(toks, w -> CAST(length(w) AS BIGINT))) AS DOUBLE) / len(toks)
       ELSE 0.0 END AS mean_word_len,
  CASE WHEN len(toks) > 0
       THEN CAST(len(list_filter(toks, w -> list_contains({_EN}, w))) AS DOUBLE) / len(toks)
       ELSE 0.0 END AS en_stopword_ratio,
  md5({_NORM}) AS fingerprint
FROM t
""")
def q_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    # single Arrow-batched pass (tokens computed once per row); values
    # are identical to the expression builders in operators.text
    return text.text_stats_full(docs, "doc_id", "text").select(
        "doc_id", "n_chars_raw", "n_tokens", "n_tokens_bpe",
        "mean_word_len", "en_stopword_ratio", "fingerprint",
    )


# --- M5: language detection (stopword-hit argmax) -------------------------------------

def _lang_oracle() -> str:
    toks = _TOKS
    ratio = {
        lang: (
            f"CASE WHEN len(toks) > 0 THEN CAST(len(list_filter(toks, w -> list_contains("
            f"[{', '.join(repr(w) for w in text.STOPWORDS[lang])}], w))) AS DOUBLE) / len(toks) ELSE 0.0 END"
        )
        for lang in text.STOPWORDS
    }
    langs = list(text.STOPWORDS)
    best = "greatest(" + ", ".join(f"r_{k}" for k in langs) + ")"
    # argmax with list-order tiebreak, built back-to-front like the engine
    expr = "'und'"
    for lang in reversed(langs):
        expr = f"CASE WHEN {best} >= 0.03 AND r_{lang} = {best} THEN '{lang}' ELSE {expr} END"
    ratios_sql = ", ".join(f"{v} AS r_{k}" for k, v in ratio.items())
    return f"""
WITH t AS (SELECT doc_id, {toks} AS toks FROM documents),
r AS (SELECT doc_id, {ratios_sql} FROM t)
SELECT doc_id, {expr} AS lang_detected FROM r
"""


@_q("lang_detect", _lang_oracle())
def q_lang_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    return text.text_stats_full(docs, "doc_id", "text").select("doc_id", "lang_detected")


# --- M5: exact dedup on content digest --------------------------------------------------

@_q("exact_dedup_docs", f"""
SELECT doc_id, text, lang, source, n_chars FROM (
  SELECT *, row_number() OVER (PARTITION BY md5({_NORM}) ORDER BY doc_id ASC) AS rn
  FROM documents
) WHERE rn = 1
""")
def q_exact_dedup_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    return dedup.exact_dedup(docs, "doc_id", "text", normalize=True)


@_q("boilerplate_strip_docs", """
WITH w AS (
  SELECT doc_id, string_split(text, ' ') AS words FROM documents
), paras AS (
  SELECT doc_id, i AS pos,
         array_to_string(words[(i*8+1):(i*8+8)], ' ') AS para
  FROM (
    SELECT doc_id, words,
           unnest(range(CAST(ceil(len(words) / 8.0) AS BIGINT))) AS i
    FROM w
  )
), ok AS (
  SELECT doc_id, pos, para FROM paras WHERE length(trim(para)) >= 1
), hot AS (
  SELECT trim(para) AS p FROM ok
  GROUP BY 1 HAVING COUNT(DISTINCT doc_id) > 1
)
SELECT doc_id,
       string_agg(para, chr(10) ORDER BY pos) AS clean_text,
       COUNT(*) AS n_paras
FROM ok WHERE trim(para) NOT IN (SELECT p FROM hot)
GROUP BY doc_id
""")
def q_boilerplate_strip_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boilerplate removal by paragraph document-frequency
    (`operators/dedup.py: boilerplate_strip` — the CCNet filter):
    a paragraph appearing in MORE THAN 1 document is stripped from
    every document, first occurrence included (unlike
    paragraph_dedup's keep-first). Same derived 8-word paragraph
    structure as `paragraph_dedup_docs`; the digest-keyed
    doc-frequency groupBy and the LEFT ANTI strip are the scale
    shape."""
    docs = load_table(spark, "documents", sf_dir)
    words = F.split(F.col("text"), " ")
    n_groups = F.ceil(F.size(words) / F.lit(8.0)).cast("int")
    paras = F.transform(
        F.sequence(F.lit(0), n_groups - 1),
        lambda i: F.array_join(F.slice(words, i * F.lit(8) + 1, 8), " "),
    )
    structured = docs.select(
        "doc_id", F.array_join(paras, "\n").alias("text")
    )
    return dedup.boilerplate_strip(structured, "doc_id", "text", max_df=1)


@_q("paragraph_dedup_docs", """
WITH w AS (
  SELECT doc_id, string_split(text, ' ') AS words FROM documents
), paras AS (
  SELECT doc_id, i AS pos,
         array_to_string(words[(i*8+1):(i*8+8)], ' ') AS para
  FROM (
    SELECT doc_id, words,
           unnest(range(CAST(ceil(len(words) / 8.0) AS BIGINT))) AS i
    FROM w
  )
), ranked AS (
  SELECT doc_id, pos, para,
         row_number() OVER (
           PARTITION BY trim(para) ORDER BY doc_id, pos
         ) AS rn
  FROM paras WHERE length(trim(para)) >= 1
)
SELECT doc_id,
       string_agg(para, chr(10) ORDER BY pos) AS clean_text,
       COUNT(*) AS n_paras
FROM ranked WHERE rn = 1
GROUP BY doc_id
""")
def q_paragraph_dedup_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Paragraph-level corpus dedup (`operators/dedup.py:
    paragraph_dedup` — the CCNet/RefinedWeb line-dedup shape): each
    distinct paragraph survives only at its first (doc_id, position)
    occurrence; documents reassemble from their surviving paragraphs.
    The fixture corpus is single-line, so the query first derives a
    paragraph structure both engines can reproduce exactly: groups of
    8 words become one paragraph (the tiny vocabulary makes repeats
    frequent across docs — the boilerplate the operator exists to
    strip). Scale shape: posexplode map-side, ONE md5-digest-keyed
    shuffle for keep-first, one groupBy(doc_id) reassembly."""
    docs = load_table(spark, "documents", sf_dir)
    words = F.split(F.col("text"), " ")
    n_groups = F.ceil(F.size(words) / F.lit(8.0)).cast("int")
    paras = F.transform(
        F.sequence(F.lit(0), n_groups - 1),
        lambda i: F.array_join(F.slice(words, i * F.lit(8) + 1, 8), " "),
    )
    structured = docs.select(
        "doc_id", F.array_join(paras, "\n").alias("text")
    )
    return dedup.paragraph_dedup(structured, "doc_id", "text")


# --- M5: n-gram Jaccard near-dup pairs (exact, inverted-index join) ----------------------

# Shared CTE block: shingle explode + hot-shingle guard (df > cap
# dropped from index AND sizes — the engine's max_doc_freq semantics).
_NGRAM_GUARDED_CTES = f"""t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
sh AS (
  SELECT doc_id,
    CASE WHEN len(toks) >= 3
         THEN list_distinct(list_transform(range(1, len(toks)-1),
              i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))
         ELSE [array_to_string(toks, ' ')] END AS s
  FROM t
),
ex0 AS (SELECT doc_id, unnest(s) AS g FROM sh),
hot AS (SELECT g FROM (SELECT g, COUNT(*) AS d FROM ex0 GROUP BY g) WHERE d > {{cap}}),
ex AS (SELECT * FROM ex0 WHERE g NOT IN (SELECT g FROM hot)),
sizes AS (SELECT doc_id, COUNT(*) AS n FROM ex GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS c
  FROM ex a JOIN ex b ON a.g = b.g AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)"""


@_q("ngram_jaccard_pairs", f"""
WITH {_NGRAM_GUARDED_CTES.format(cap=10)}
SELECT id_a, id_b,
       CAST(c AS DOUBLE) / CAST(sa.n + sb.n - c AS DOUBLE) AS jaccard
FROM inter
JOIN sizes sa ON sa.doc_id = id_a
JOIN sizes sb ON sb.doc_id = id_b
WHERE CAST(c AS DOUBLE) / CAST(sa.n + sb.n - c AS DOUBLE) >= 0.5
""")
def q_ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    return dedup.ngram_jaccard_pairs(
        docs, "doc_id", "text", shingle_size=3, threshold=0.5, max_doc_freq=10
    )


# --- M5: near-dup clusters (connected components over the pair graph) -------------
# Pairs → transitive closure: the oracle is a recursive reachability
# CTE (component = min reachable node), the engine is iterative
# min-label propagation (dedup.connected_components).

@_q("near_dup_clusters", f"""
WITH RECURSIVE {_NGRAM_GUARDED_CTES.format(cap=10)},
pairs AS (
  SELECT id_a, id_b
  FROM inter
  JOIN sizes sa ON sa.doc_id = id_a
  JOIN sizes sb ON sb.doc_id = id_b
  WHERE CAST(c AS DOUBLE) / CAST(sa.n + sb.n - c AS DOUBLE) >= 0.5
),
e AS (
  SELECT id_a AS src, id_b AS dst FROM pairs
  UNION
  SELECT id_b AS src, id_a AS dst FROM pairs
),
reach AS (
  SELECT src AS node, src AS comp FROM e
  UNION
  SELECT e.dst AS node, r.comp FROM reach r JOIN e ON e.src = r.node
)
SELECT node, MIN(comp) AS component FROM reach GROUP BY node
""")
def q_near_dup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    pairs = dedup.ngram_jaccard_pairs(
        docs, "doc_id", "text", shingle_size=3, threshold=0.5, max_doc_freq=10
    )
    return dedup.connected_components(pairs)


# Quality-aware representative selection (keep the BEST-scoring member
# of each near-dup cluster, not the smallest id — the Dolma/FineWeb
# keep-best pattern). Same recursive-CTE components as above, then a
# per-component argmax on n_chars with id tiebreak.

@_q("near_dup_keep_best", f"""
WITH RECURSIVE {_NGRAM_GUARDED_CTES.format(cap=10)},
pairs AS (
  SELECT id_a, id_b
  FROM inter
  JOIN sizes sa ON sa.doc_id = id_a
  JOIN sizes sb ON sb.doc_id = id_b
  WHERE CAST(c AS DOUBLE) / CAST(sa.n + sb.n - c AS DOUBLE) >= 0.5
),
e AS (
  SELECT id_a AS src, id_b AS dst FROM pairs
  UNION
  SELECT id_b AS src, id_a AS dst FROM pairs
),
reach AS (
  SELECT src AS node, src AS comp FROM e
  UNION
  SELECT e.dst AS node, r.comp FROM reach r JOIN e ON e.src = r.node
),
comp AS (SELECT node, MIN(comp) AS component FROM reach GROUP BY node),
ranked AS (
  SELECT c.node,
         row_number() OVER (PARTITION BY c.component
                            ORDER BY d.n_chars DESC, c.node ASC) AS rn
  FROM comp c JOIN documents d ON d.doc_id = c.node
)
SELECT doc_id, n_chars FROM documents
WHERE doc_id NOT IN (SELECT node FROM ranked WHERE rn > 1)
""")
def q_near_dup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    pairs = dedup.ngram_jaccard_pairs(
        docs, "doc_id", "text", shingle_size=3, threshold=0.5, max_doc_freq=10
    )
    kept = dedup.dedup_by_clusters_best(docs, pairs, "doc_id", "n_chars")
    return kept.select("doc_id", "n_chars")


# --- M5: char-n-gram Jaccard (the char-level near-dup variant) --------------------

@_q("char_jaccard_pairs", f"""
WITH t AS (
  SELECT doc_id, {_NORM} AS norm FROM documents WHERE doc_id < 100
),
sh AS (
  SELECT doc_id,
    CASE WHEN length(norm) >= 5
         THEN list_distinct(list_transform(range(1, length(norm)-3),
              i -> substring(norm, i, 5)))
         ELSE [norm] END AS s
  FROM t
),
ex AS (SELECT doc_id, unnest(s) AS g FROM sh),
sizes AS (SELECT doc_id, len(s) AS n FROM sh),
inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS c
  FROM ex a JOIN ex b ON a.g = b.g AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT id_a, id_b,
       round(CAST(c AS DOUBLE) / CAST(sa.n + sb.n - c AS DOUBLE), 6) AS jaccard
FROM inter
JOIN sizes sa ON sa.doc_id = id_a
JOIN sizes sb ON sb.doc_id = id_b
WHERE CAST(c AS DOUBLE) / CAST(sa.n + sb.n - c AS DOUBLE) >= 0.4
""")
def q_char_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir).filter(F.col("doc_id") < 100)
    pairs = dedup.char_jaccard_pairs(docs, "doc_id", "text", n=5, threshold=0.4)
    return pairs.select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))


# --- F: typed JSON struct parse ---------------------------------------------------

@_q("parse_props_typed", """
SELECT event_id, CAST(json_extract_string(props, '$.k') AS INTEGER) AS k,
       CAST(json_extract_string(props, '$.k') AS INTEGER) % 10 AS k_mod
FROM events
""")
def q_parse_props_typed(spark: SparkSession, sf_dir: str) -> DataFrame:
    from harmony_energy_data_pipeline_spark.functions.jsonx import parse_props
    ev = load_table(spark, "events", sf_dir)
    parsed = parse_props(ev, "props", "k INT")
    return parsed.select(
        "event_id",
        F.col("props_parsed.k").alias("k"),
        (F.col("props_parsed.k") % 10).alias("k_mod"),
    )


# --- M5: MinHash-LSH near-dedup --------------------------------------------------
# Oracle validity: the LSH band join is only a RECALL device — every
# surviving candidate is re-verified with exact Jaccard, so precision
# is exact by construction, and recall of the seeded deterministic
# LSH (64 hashes / 16 bands) is verified 1.0 against the exact pair
# set on the gate datasets (sf0.01: 25/25 pairs, sf0.1: 256/256).
# The output therefore equals exact-Jaccard keep-first dedup, which
# DuckDB computes directly from the word shingles.

@_q("minhash_dedup", f"""
WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
sh AS (
  SELECT doc_id,
    CASE WHEN len(toks) >= 3
         THEN list_distinct(list_transform(range(1, len(toks)-1),
              i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))
         ELSE [array_to_string(toks, ' ')] END AS s
  FROM t
),
ex AS (SELECT doc_id, unnest(s) AS g FROM sh),
sizes AS (SELECT doc_id, len(s) AS n FROM sh),
inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS c
  FROM ex a JOIN ex b ON a.g = b.g AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
doomed AS (
  SELECT DISTINCT id_b
  FROM inter
  JOIN sizes sa ON sa.doc_id = id_a
  JOIN sizes sb ON sb.doc_id = id_b
  WHERE CAST(c AS DOUBLE) / CAST(sa.n + sb.n - c AS DOUBLE) >= 0.5
)
SELECT doc_id, text, lang, source, n_chars FROM documents
WHERE doc_id NOT IN (SELECT id_b FROM doomed)
""")
def q_minhash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    return dedup.minhash_dedup(docs, "doc_id", "text", threshold=0.5)


# --- M5: SimHash near-dup pairs ---------------------------------------------------
# Exact oracle: the pigeonhole block join has recall 1 by construction
# (max_hamming < blocks ⇒ some block agrees) and the popcount verify
# makes precision 1, so the output equals brute-force Hamming over the
# signatures. With portable=True the signature itself is a pure
# function of DuckDB-expressible md5 token hashes, so the oracle
# recomputes it bit-for-bit in SQL (60 bit-vote expressions).

def _simhash_oracle(nbits: int = 60, max_hamming: int = 3) -> str:
    mod = 1 << 60
    vote = (
        "COALESCE(list_sum(list_transform(hs, x -> "
        "CASE WHEN (x >> {j}) & 1 = 1 THEN 1 ELSE -1 END)), -1)"
    )
    sig = " + ".join(
        f"CASE WHEN {vote.format(j=j)} >= 0 THEN {1 << j}::BIGINT ELSE 0 END"
        for j in range(nbits)
    )
    return f"""
WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
h AS (
  SELECT doc_id,
    list_transform(toks, w -> CAST(md5_number_lower(w) % {mod} AS BIGINT)) AS hs
  FROM t
),
s AS (SELECT doc_id, {sig} AS sig FROM h)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       CAST(bit_count(xor(a.sig, b.sig)) AS BIGINT) AS hamming
FROM s a JOIN s b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.sig, b.sig)) <= {max_hamming}
"""


@_q("simhash_pairs", _simhash_oracle())
def q_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    return dedup.simhash_near_pairs(
        docs, "doc_id", "text", max_hamming=3, blocks=4, nbits=60, portable=True
    )


# --- M5: brute-force cosine top-k (exact ANN baseline) --------------------------------------

@_q("cosine_topk", """
WITH q AS (SELECT vec_id AS query_id, embedding AS qe FROM embeddings WHERE vec_id < 10),
scored AS (
  SELECT q.query_id, c.vec_id AS neighbor_id,
    list_sum(list_transform(range(1, len(q.qe)+1),
             i -> CAST(q.qe[i] AS DOUBLE) * CAST(c.embedding[i] AS DOUBLE)))
    / (sqrt(list_sum(list_transform(q.qe, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
       * sqrt(list_sum(list_transform(c.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))))
    AS score
  FROM q CROSS JOIN embeddings c
  WHERE c.vec_id != q.query_id
)
SELECT query_id, neighbor_id, round(score, 6) AS score, rank FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY score DESC, neighbor_id ASC) AS rank
  FROM scored
) WHERE rank <= 10
""")
def q_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, "embeddings", sf_dir)
    out = similarity.cosine_topk(
        emb.filter(F.col("vec_id") < 10), emb, k=10,
    )
    return out.select("query_id", "neighbor_id", F.round("score", 6).alias("score"), "rank")


# --- M5: embedding near-dup pairs (exact mode) ------------------------------------------------

@_q("embedding_near_dup", """
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
  round(
    list_sum(list_transform(range(1, len(a.embedding)+1),
             i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)))
    / (sqrt(list_sum(list_transform(a.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
       * sqrt(list_sum(list_transform(b.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))))
  , 6) AS score
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
WHERE list_sum(list_transform(range(1, len(a.embedding)+1),
             i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)))
    / (sqrt(list_sum(list_transform(a.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
       * sqrt(list_sum(list_transform(b.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))) >= 0.8
""")
def q_embedding_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, "embeddings", sf_dir)
    out = similarity.embedding_near_dup_pairs(
        emb, "vec_id", "embedding", threshold=0.8, exact=True
    )
    return out.select("id_a", "id_b", F.round("score", 6).alias("score"))


# Digest twin (round 5): the brute-force oracle is O(n^2) in DuckDB and
# infeasible beyond the gate SFs, so sweeps verify the exact path on a
# DETERMINISTIC id-sampled subset (vec_id % 16 — every engine agrees on
# membership) and compare one digest row. Pair key id_a*2^20+id_b is
# injective while ids < 2^20 (true through the 300x fixture).
@_q("embedding_near_dup_digest", """
WITH sub AS (SELECT * FROM embeddings WHERE vec_id % 16 = 0),
p AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
    list_sum(list_transform(range(1, len(a.embedding)+1),
             i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)))
    / (sqrt(list_sum(list_transform(a.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
       * sqrt(list_sum(list_transform(b.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))) AS score
  FROM sub a JOIN sub b ON a.vec_id < b.vec_id
)
SELECT COUNT(*) AS n_pairs,
       COALESCE(bit_xor(id_a * 1048576 + id_b), 0) AS pair_xor,
       CAST(COALESCE(SUM(CAST(round(score * 1000000) AS BIGINT)), 0) AS BIGINT) AS sum_score_u
FROM p WHERE score >= 0.8
""")
def q_embedding_near_dup_digest(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, "embeddings", sf_dir).filter(
        F.col("vec_id") % 16 == 0
    )
    out = similarity.embedding_near_dup_pairs(
        emb, "vec_id", "embedding", threshold=0.8, exact=True
    )
    return out.agg(
        F.count("*").alias("n_pairs"),
        F.coalesce(
            F.expr("bit_xor(id_a * 1048576 + id_b)"), F.lit(0)
        ).cast("long").alias("pair_xor"),
        F.coalesce(
            F.sum(F.round(F.col("score") * 1000000).cast("long")), F.lit(0)
        ).cast("long").alias("sum_score_u"),
    )


# --- P1/F1/F2: schema align + lenient parse/cast on dirty string records ----

@_q("align_parse_cast", """
WITH raw AS (
  SELECT CAST(event_id AS VARCHAR) AS _id,
         CASE WHEN event_id % 19 = 0 THEN 'not-a-date'
              ELSE strftime(ts, '%Y-%m-%dT%H:%M:%S') END AS DATETIME,
         CASE WHEN event_id % 13 = 0 THEN 'n/a'
              ELSE CAST(CAST(round(value*100) AS BIGINT) AS VARCHAR) END AS VALUE_CENTS
  FROM events
)
SELECT _id,
       try_strptime(DATETIME, '%Y-%m-%dT%H:%M:%S') AS DATETIME,
       TRY_CAST(VALUE_CENTS AS DOUBLE) AS VALUE_CENTS,
       CAST(NULL AS DOUBLE) AS MISSING_MEASURE
FROM raw
""")
def q_align_parse_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import types as T
    ev = load_table(spark, "events", sf_dir)
    raw = ev.select(
        F.col("event_id").cast("string").alias("_id"),
        F.when(F.col("event_id") % 19 == 0, F.lit("not-a-date"))
        .otherwise(F.date_format("ts", "yyyy-MM-dd'T'HH:mm:ss")).alias("DATETIME"),
        F.when(F.col("event_id") % 13 == 0, F.lit("n/a"))
        .otherwise(F.round(F.col("value") * 100).cast("long").cast("string")).alias("VALUE_CENTS"),
        F.lit("junk").alias("EXTRA_COL"),  # align must drop this
    )
    target = T.StructType([
        T.StructField("_id", T.StringType()),
        T.StructField("DATETIME", T.StringType()),
        T.StructField("VALUE_CENTS", T.StringType()),
        T.StructField("MISSING_MEASURE", T.DoubleType()),  # align must add as null
    ])
    aligned = cleaning.align_schema(raw, target)
    return cleaning.parse_and_cast(aligned, "DATETIME", ["VALUE_CENTS", "MISSING_MEASURE"])


# --- FLAGSHIP PARITY: the full reference transform chain as one query ----------
# align → lenient parse/cast → %-repair → null handling → two-phase dedup
# (transform.py:14-233 end-to-end), DuckDB-oracled on constructed dirty input.

def _transform_chain_oracle() -> str:
    from harmony_energy_data_pipeline_spark.schemas import MEASURE_COLS
    zero_cols = ",\n       ".join(
        f"CAST(0.0 AS DOUBLE) AS {c}"
        for c in MEASURE_COLS if c not in ("GENERATION", "WIND", "WIND_perc")
    )
    return f"""
WITH raw AS (
  SELECT event_id AS _id,
         CASE WHEN event_id % 19 = 0 THEN 'garbage'
              ELSE strftime(ts, '%Y-%m-%dT%H:%M:%S') END AS DATETIME,
         CAST(CAST(round(value*100) AS BIGINT) AS VARCHAR) AS GENERATION,
         CAST(CAST(round(value*10) AS BIGINT) AS VARCHAR) AS WIND,
         '50' AS WIND_perc
  FROM events
  UNION ALL
  SELECT event_id,
         strftime(ts + INTERVAL 1 HOUR, '%Y-%m-%dT%H:%M:%S'),
         CAST(CAST(round(value*100) AS BIGINT) AS VARCHAR),
         CAST(CAST(round(value*20) AS BIGINT) AS VARCHAR), '50'
  FROM events WHERE event_id % 11 = 0
),
parsed AS (
  SELECT _id,
         try_strptime(DATETIME, '%Y-%m-%dT%H:%M:%S') AS DATETIME,
         TRY_CAST(GENERATION AS DOUBLE) AS GENERATION,
         TRY_CAST(WIND AS DOUBLE) AS WIND,
         TRY_CAST(WIND_perc AS DOUBLE) AS WIND_perc
  FROM raw
),
repaired AS (
  SELECT _id, DATETIME, GENERATION, WIND,
         CASE WHEN abs(WIND / GENERATION * 100 - WIND_perc) > 1.0
              THEN WIND / GENERATION * 100 ELSE WIND_perc END AS WIND_perc
  FROM parsed
),
filled AS (
  SELECT _id, DATETIME,
         COALESCE(GENERATION, 0.0) AS GENERATION,
         COALESCE(WIND, 0.0) AS WIND,
         COALESCE(WIND_perc, 0.0) AS WIND_perc
  FROM repaired
  WHERE _id IS NOT NULL AND DATETIME IS NOT NULL
),
p1 AS (
  SELECT _id, DATETIME, GENERATION, WIND, WIND_perc FROM (
    SELECT *, row_number() OVER (PARTITION BY _id ORDER BY DATETIME DESC) AS rn
    FROM filled
  ) WHERE rn = 1
),
p2 AS (
  SELECT _id, DATETIME, GENERATION, WIND, WIND_perc FROM (
    SELECT *, row_number() OVER (PARTITION BY DATETIME ORDER BY _id DESC) AS rn
    FROM p1
  ) WHERE rn = 1
)
SELECT _id, DATETIME, GENERATION, WIND, WIND_perc,
       {zero_cols}
FROM p2
"""


@_q("transform_chain", _transform_chain_oracle())
def q_transform_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    from harmony_energy_data_pipeline_spark.operators.cleaning import transform_generation
    ev = load_table(spark, "events", sf_dir)

    def raw_rows(df, dt_shift, wind_scale):
        dt = F.col("ts") + F.expr(f"INTERVAL {dt_shift} HOUR") if dt_shift else F.col("ts")
        return df.select(
            F.col("event_id").alias("_id"),
            F.when((F.col("event_id") % 19 == 0) & F.lit(dt_shift == 0), F.lit("garbage"))
            .otherwise(F.date_format(dt, "yyyy-MM-dd'T'HH:mm:ss")).alias("DATETIME"),
            F.round(F.col("value") * 100).cast("long").cast("string").alias("GENERATION"),
            F.round(F.col("value") * wind_scale).cast("long").cast("string").alias("WIND"),
            F.lit("50").alias("WIND_perc"),
            F.lit("dropme").alias("JUNK"),  # align_schema must drop this
        )

    raw = raw_rows(ev, 0, 10).unionByName(
        raw_rows(ev.filter(F.col("event_id") % 11 == 0), 1, 20)
    )
    return transform_generation(raw)


# --- A1: temporal downsample, calendar year -----------------------------------

@_q("downsample_year", """
SELECT CAST(date_trunc('year', o_orderdate) AS TIMESTAMP) AS bucket,
       CAST(SUM(CAST(round(o_totalprice*100) AS BIGINT)) AS DOUBLE) / (100.0 * COUNT(o_totalprice)) AS avg_totalprice,
       COUNT(*) AS n_orders
FROM orders GROUP BY 1
""")
def q_downsample_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    od = load_table(spark, "orders", sf_dir)
    return (
        od.groupBy(F.date_trunc("year", "o_orderdate").alias("bucket"))
        .agg(
            (F.sum(_cents("o_totalprice")).cast("double")
             / (F.lit(100.0) * F.count("o_totalprice"))).alias("avg_totalprice"),
            F.count("*").alias("n_orders"),
        )
    )


# --- M4: conditional aggregation (TPC-H Q12 shape) ------------------------------

@_q("conditional_agg_orders", """
SELECT o_orderstatus,
  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_priority,
  CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_priority
FROM orders GROUP BY o_orderstatus
""")
def q_conditional_agg_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, "orders", sf_dir)
    hi = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return o.groupBy("o_orderstatus").agg(
        F.sum(F.when(hi, 1).otherwise(0)).alias("high_priority"),
        F.sum(F.when(~hi, 1).otherwise(0)).alias("low_priority"),
    )


# --- M4: scalar-subquery shape (promo-revenue-% style, TPC-H Q14 flavor) --------

@_q("above_avg_customers", """
WITH stats AS (
  SELECT CAST(SUM(CAST(round(c_acctbal*100) AS BIGINT)) AS DOUBLE) / (100.0 * COUNT(*)) AS avg_bal
  FROM customer
)
SELECT c_custkey, c_acctbal FROM customer, stats WHERE c_acctbal > avg_bal
""")
def q_above_avg_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, "customer", sf_dir)
    # deterministic fixed-point mean, broadcast as a 1-row frame (the
    # scalar-subquery plan shape: aggregate once, stream the big side)
    stats = c.agg(
        (F.sum(_cents("c_acctbal")).cast("double")
         / (F.lit(100.0) * F.count("*"))).alias("avg_bal")
    )
    return (
        c.crossJoin(F.broadcast(stats))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .select("c_custkey", "c_acctbal")
    )


# --- M4: cube grouping sets ----------------------------------------------------

@_q("cube_orders", """
SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n_orders,
  CAST(SUM(CAST(round(o_totalprice*100) AS BIGINT)) AS DOUBLE) / 100.0 AS total
FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
""")
def q_cube_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, "orders", sf_dir)
    return (
        o.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.count("*").alias("n_orders"),
            (F.sum(_cents("o_totalprice")).cast("double") / F.lit(100.0)).alias("total"),
        )
    )


# --- M4: TPC-H Q6 (pushdown-friendly filter + agg) -----------------------------

@_q("tpch_q6", """
SELECT CAST(SUM(CAST(round(l_extendedprice*100) AS BIGINT) * CAST(round(l_discount*100) AS BIGINT)) AS DOUBLE) / 10000.0 AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1994-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1995-01-01 00:00:00'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
""")
def q_tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, "lineitem", sf_dir)
    ep, disc = _cents("l_extendedprice"), _cents("l_discount")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1994-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1995-01-01 00:00:00").cast("timestamp"))
            & F.col("l_discount").between(0.05, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg((F.sum(ep * disc).cast("double") / F.lit(10000.0)).alias("revenue"))
    )


# --- M4: TPC-H Q3 (join + agg + deterministic top-k) ---------------------------

@_q("tpch_q3", """
SELECT l_orderkey,
  CAST(SUM(CAST(round(l_extendedprice*100) AS BIGINT) * (100 - CAST(round(l_discount*100) AS BIGINT))) AS DOUBLE) / 10000.0 AS revenue,
  o_orderdate, o_orderpriority
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = 'BUILDING'
  AND o.o_orderdate < TIMESTAMP '1995-03-15 00:00:00'
  AND l.l_shipdate > TIMESTAMP '1995-03-15 00:00:00'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, o_orderdate ASC, l_orderkey ASC
LIMIT 10
""")
def q_tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, "customer", sf_dir)
    o = load_table(spark, "orders", sf_dir)
    li = load_table(spark, "lineitem", sf_dir)
    ep, disc = _cents("l_extendedprice"), _cents("l_discount")
    return (
        li.filter(F.col("l_shipdate") > F.lit("1995-03-15 00:00:00").cast("timestamp"))
        .join(o.filter(F.col("o_orderdate") < F.lit("1995-03-15 00:00:00").cast("timestamp")),
              F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c.filter(F.col("c_mktsegment") == "BUILDING"),
              F.col("o_custkey") == F.col("c_custkey"), "left_semi")
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg((F.sum(ep * (F.lit(100) - disc)).cast("double") / F.lit(10000.0)).alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.col("revenue").desc(), F.col("o_orderdate").asc(), F.col("l_orderkey").asc())
        .limit(10)
    )


# --- M4: skew-salted join (same result contract as the plain join) -------------

@_q("salted_brand_revenue", """
SELECT p.p_brand,
  CAST(SUM(CAST(round(l.l_extendedprice*100) AS BIGINT) * (100 - CAST(round(l.l_discount*100) AS BIGINT))) AS DOUBLE) / 10000.0 AS revenue,
  COUNT(*) AS n_items
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
GROUP BY p.p_brand
""")
def q_salted_brand_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    from harmony_energy_data_pipeline_spark.operators.joins import salted_join
    li = load_table(spark, "lineitem", sf_dir)
    pt = load_table(spark, "part", sf_dir).withColumnRenamed("p_partkey", "l_partkey")
    ep, disc = _cents("l_extendedprice"), _cents("l_discount")
    return (
        salted_join(li, pt, "l_partkey", n_salts=8)
        .groupBy("p_brand")
        .agg(
            (F.sum(ep * (F.lit(100) - disc)).cast("double") / F.lit(10000.0)).alias("revenue"),
            F.count("*").alias("n_items"),
        )
    )


# --- M4b: profile-driven auto join strategy ------------------------------------
# skew_aware_join measures the key distribution (key_skew_profile) and
# picks broadcast/salted/plain; here the fixture key concentrates ~70%
# of events on one hot key, the broadcast budget is zeroed out, so the
# planner must take the SALTED branch — the oracle is the plain join
# (all three branches share one result contract).

_SKEW_KEY = "CASE WHEN user_id % 10 < 7 THEN 0 ELSE user_id END"

@_q("auto_skew_join_events", f"""
WITH b AS (
  SELECT {_SKEW_KEY} AS skew_key,
         CAST(round(value * 100) AS BIGINT) AS vc
  FROM events
),
d AS (SELECT skew_key, COUNT(*) AS n_key FROM b GROUP BY skew_key)
SELECT b.skew_key AS skew_key, MAX(d.n_key) AS n_key,
       CAST(SUM(b.vc) AS BIGINT) AS sum_value_cents
FROM b JOIN d ON b.skew_key = d.skew_key
GROUP BY b.skew_key
""")
def q_auto_skew_join_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    from harmony_energy_data_pipeline_spark.operators.joins import skew_aware_join

    ev = load_table(spark, "events", sf_dir)
    big = ev.select(
        F.when((F.col("user_id") % 10) < 7, F.lit(0))
        .otherwise(F.col("user_id"))
        .cast("long")
        .alias("skew_key"),
        F.round(F.col("value") * 100).cast("long").alias("vc"),
    )
    dim = big.groupBy("skew_key").agg(F.count("*").alias("n_key"))
    joined = skew_aware_join(
        big, dim, "skew_key", broadcast_max_rows=0, salt_share_ppm=100_000
    )
    return joined.groupBy("skew_key").agg(
        F.max("n_key").alias("n_key"),
        F.sum("vc").cast("long").alias("sum_value_cents"),
    )


# --- temporal: backward as-of join (DuckDB native ASOF JOIN as oracle) ---------

_RATES_SQL = """
  SELECT user_id, ts, value AS rate FROM (
    SELECT user_id, ts, value,
           row_number() OVER (PARTITION BY user_id, ts ORDER BY value DESC) AS rn
    FROM events WHERE event_id % 10 = 0
  ) WHERE rn = 1
"""


@_q("asof_join_rates", f"""
WITH rates AS ({_RATES_SQL})
SELECT e.event_id, e.user_id, e.ts, r.rate
FROM events e
ASOF LEFT JOIN rates r ON e.user_id = r.user_id AND e.ts >= r.ts
""")
def q_asof_join_rates(spark: SparkSession, sf_dir: str) -> DataFrame:
    from harmony_energy_data_pipeline_spark.operators.temporal import asof_join
    ev = load_table(spark, "events", sf_dir)
    w = Window.partitionBy("user_id", "ts").orderBy(F.col("rate").desc())
    rates = (
        ev.filter(F.col("event_id") % 10 == 0)
        .select("user_id", "ts", F.col("value").alias("rate"))
        .withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1).drop("rn")
    )
    joined = asof_join(
        ev.select("event_id", "user_id", "ts"), rates, on="user_id",
        left_ts="ts", right_ts="ts", how="left",
    )
    return joined.select("event_id", "user_id", "ts", "rate")


# --- temporal: batch sessionization (gaps-and-islands) -----------------------
# The batch counterpart of streaming session_window: one shuffle + one
# sort (both window passes and the per-session agg share the key
# partitioning). Gap comparisons run on unix microseconds — exact
# integers on both engines.

@_q("sessionize_events", """
WITH flagged AS (
  SELECT user_id, ts, value, event_id,
    CASE WHEN epoch_us(ts) - lag(epoch_us(ts))
              OVER (PARTITION BY user_id ORDER BY ts, event_id) > 1800000000
         THEN 1 ELSE 0 END AS is_new
  FROM events
), sess AS (
  SELECT user_id, ts, value,
    CAST(1 + SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_seq
  FROM flagged
)
SELECT user_id, session_seq,
  min(ts) AS session_start, max(ts) AS session_end,
  COUNT(*) AS n_events,
  CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_value_cents
FROM sess GROUP BY user_id, session_seq
""")
def q_sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    from harmony_energy_data_pipeline_spark.operators.temporal import sessionize

    ev = load_table(spark, "events", sf_dir)
    return sessionize(
        ev, key="user_id", ts_col="ts", gap_seconds=1800,
        tiebreak_col="event_id", value_col="value",
    )


# --- temporal: interval (range) join -------------------------------------------

_BANDS_SQL = """
  SELECT band_id, band_id * 20.0 AS lo, (band_id + 1) * 20.0 AS hi
  FROM (SELECT unnest(range(0, 10)) AS band_id)
"""


@_q("interval_join_bands", f"""
WITH bands AS ({_BANDS_SQL})
SELECT e.event_id, b.band_id
FROM events e JOIN bands b ON e.value >= b.lo AND e.value < b.hi
""")
def q_interval_join_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    from harmony_energy_data_pipeline_spark.operators.temporal import interval_join
    ev = load_table(spark, "events", sf_dir)
    bands = spark.range(10).select(
        F.col("id").alias("band_id"),
        (F.col("id") * 20.0).alias("lo"),
        ((F.col("id") + 1) * 20.0).alias("hi"),
    )
    out = interval_join(ev.select("event_id", "value"), "value", bands, "lo", "hi")
    return out.select("event_id", "band_id")


# --- A: distinct aggregation ----------------------------------------------------

@_q("distinct_users_per_type", """
SELECT event_type, COUNT(DISTINCT user_id) AS n_users, COUNT(*) AS n_events
FROM events GROUP BY event_type
""")
def q_distinct_users_per_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir)
    return ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_users"),
        F.count("*").alias("n_events"),
    )


# --- session windows (batch): gap-based sessionization ---------------------------

@_q("session_agg", """
WITH marked AS (
  SELECT user_id, ts, event_id, value,
         CASE WHEN lag(ts) OVER w IS NULL
                OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE
              THEN 1 ELSE 0 END AS new_s
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
),
sess AS (
  SELECT *, SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
                             ROWS UNBOUNDED PRECEDING) AS sid
  FROM marked
)
SELECT user_id, min(ts) AS session_start, COUNT(*) AS n_events,
       CAST(SUM(CAST(round(value*100) AS BIGINT)) AS DOUBLE) / 100.0 AS sum_value
FROM sess GROUP BY user_id, sid
""")
def q_session_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir)
    return (
        ev.groupBy("user_id", F.session_window("ts", "30 minutes").alias("__s"))
        .agg(
            F.count("*").alias("n_events"),
            (F.sum(_cents("value")).cast("double") / F.lit(100.0)).alias("sum_value"),
        )
        .select(
            "user_id", F.col("__s.start").alias("session_start"),
            "n_events", "sum_value",
        )
    )


# --- A: exact percentiles per group ----------------------------------------------

@_q("value_percentiles", """
SELECT event_type,
       round(quantile_cont(value, 0.5), 6) AS p50,
       round(quantile_cont(value, 0.95), 6) AS p95
FROM events GROUP BY event_type
""")
def q_value_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir)
    return ev.groupBy("event_type").agg(
        F.round(F.percentile("value", F.lit(0.5)), 6).alias("p50"),
        F.round(F.percentile("value", F.lit(0.95)), 6).alias("p95"),
    )


# --- grouped model fit via applyInPandas -----------------------------------------
# Exact oracle: the per-group OLS fit runs on exact-integer sufficient
# statistics (x = min-centered epoch μs, y = cents), so the slope is a
# ratio of exact integers reduced to doubles by one division — the
# engine's Python bigints and the oracle's HUGEINT sums agree
# bit-for-bit.

@_q("grouped_trend", """
WITH c AS (
  SELECT user_id, epoch_us(ts) // 1000000 AS x, CAST(round(value*100) AS BIGINT) AS y FROM events
),
m AS (SELECT user_id, MIN(x) AS x0 FROM c GROUP BY user_id),
z AS (SELECT c.user_id, c.x - m.x0 AS x, c.y FROM c JOIN m ON c.user_id = m.user_id),
s AS (
  SELECT user_id, COUNT(*) AS n, SUM(CAST(x AS HUGEINT)) AS sx, SUM(CAST(y AS HUGEINT)) AS sy,
         SUM(CAST(x AS HUGEINT) * y) AS sxy, SUM(CAST(x AS HUGEINT) * x) AS sxx
  FROM z GROUP BY user_id
)
-- num/den are re-narrowed to BIGINT before the DOUBLE cast: DuckDB's
-- BIGINT→DOUBLE conversion is correctly rounded, HUGEINT→DOUBLE is not
SELECT user_id,
  CASE WHEN n < 2 OR n*sxx - sx*sx = 0 THEN 0.0
       ELSE CAST(CAST(n*sxy - sx*sy AS BIGINT) AS DOUBLE)
            / CAST(CAST(n*sxx - sx*sx AS BIGINT) AS DOUBLE) * 3600.0 / 100.0
  END AS slope_per_hour,
  CASE WHEN n < 2 OR n*sxx - sx*sx = 0 THEN CAST(sy AS DOUBLE) / (100.0 * CAST(n AS DOUBLE))
       ELSE CAST(sy AS DOUBLE) / (100.0 * CAST(n AS DOUBLE))
            - (CAST(CAST(n*sxy - sx*sy AS BIGINT) AS DOUBLE)
               / CAST(CAST(n*sxx - sx*sx AS BIGINT) AS DOUBLE) / 100.0)
              * (CAST(CAST(sx AS BIGINT) AS DOUBLE) / CAST(n AS DOUBLE))
  END AS intercept,
  n
FROM s
""")
def q_grouped_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    from harmony_energy_data_pipeline_spark.operators.analytics import grouped_trend
    ev = load_table(spark, "events", sf_dir)
    return grouped_trend(ev, "user_id", "ts", "value")


# --- A5: quality-summary frame ---------------------------------------------------

@_q("quality_summary", f"""
WITH dirty AS ({_DIRTY_EVENTS_SQL}),
counts AS (
  SELECT COUNT(*) AS n_raw,
         COUNT(*) FILTER (WHERE event_id IS NOT NULL AND ts IS NOT NULL) AS n_clean
  FROM dirty
)
SELECT 'Total raw records' AS "Check", n_raw AS "Count" FROM counts
UNION ALL SELECT 'Valid cleaned records', n_clean FROM counts
UNION ALL SELECT 'Dropped / invalid records', n_raw - n_clean FROM counts
""")
def q_quality_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    dirty = _dirty_events(spark, sf_dir)
    n_raw = dirty.count()
    n_clean = handle_missing_values(
        dirty, key_cols=("event_id", "ts"), fill_value=0.0
    ).count()
    return cleaning.quality_summary(spark, n_raw, n_clean)


# --- sampling: deterministic hash-keyed train/test split -------------------------

@_q("train_test_split", """
SELECT doc_id,
       CASE WHEN CAST(CONCAT('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 10000 < 8000
            THEN 'train' ELSE 'test' END AS split
FROM documents
""")
def q_train_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    from harmony_energy_data_pipeline_spark.operators.sampling import deterministic_split
    docs = load_table(spark, "documents", sf_dir)
    return deterministic_split(docs, "doc_id", train_frac=0.8).select("doc_id", "split")


@_q("stratified_cap", """
SELECT doc_id, lang FROM documents
WHERE (lang = 'en' AND CAST(CONCAT('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 10000 < 5000)
   OR (lang = 'de' AND CAST(CONCAT('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 10000 < 10000)
""")
def q_stratified_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    from harmony_energy_data_pipeline_spark.operators.sampling import (
        deterministic_stratified_cap,
    )
    docs = load_table(spark, "documents", sf_dir)
    out = deterministic_stratified_cap(
        docs, "doc_id", "lang", {"en": 0.5, "de": 1.0}
    )
    return out.select("doc_id", "lang")


# --- M5+: temperature-weighted mixture + deterministic epoch shuffle ---------
# temperature_mixture keeps each doc iff
#   bucket · S · n_d < n_buckets · target · sq_d   (all-integer, see
# operators/sampling.py) — the oracle states the identical inequality in
# HUGEINT. α = 0.5 (√n weighting) because IEEE sqrt is correctly rounded
# on every engine.

@_q("mixture_sample_langs", """
WITH c AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS n FROM documents GROUP BY lang),
sq AS (SELECT lang, n, CAST(round(sqrt(n)*1000000) AS BIGINT) AS s FROM c),
tot AS (SELECT CAST(SUM(s) AS BIGINT) AS st FROM sq)
SELECT d.doc_id, d.lang
FROM documents d
JOIN sq ON d.lang = sq.lang
CROSS JOIN tot
WHERE CAST(CAST(CONCAT('0x', substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 10000 AS HUGEINT) * st * n
    < CAST(10000 AS HUGEINT) * 250 * s
""")
def q_mixture_sample_langs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from harmony_energy_data_pipeline_spark.operators.sampling import (
        temperature_mixture,
    )

    docs = load_table(spark, "documents", sf_dir).select("doc_id", "lang")
    return temperature_mixture(docs, "doc_id", "lang", target_rows=250)


@_q("training_order_epoch1", """
SELECT doc_id, md5(CAST(doc_id AS VARCHAR) || '#e1') AS sk
FROM documents
ORDER BY sk ASC
LIMIT 100
""")
def q_training_order_epoch1(spark: SparkSession, sf_dir: str) -> DataFrame:
    from harmony_energy_data_pipeline_spark.operators.sampling import (
        epoch_shuffle_key,
    )

    docs = load_table(spark, "documents", sf_dir)
    # head of the epoch-1 training order — a top-k
    # (TakeOrderedAndProject), never a global sort
    return (
        docs.select("doc_id", epoch_shuffle_key("doc_id", 1).alias("sk"))
        .orderBy("sk")
        .limit(100)
    )


# --- M5: text quality scoring -----------------------------------------------------

@_q("text_quality", f"""
WITH t AS (SELECT doc_id, text, {_TOKS} AS toks FROM documents),
m AS (
  SELECT doc_id, text, len(toks) AS n,
    CASE WHEN len(toks) > 0
         THEN CAST(len(list_filter(toks, w -> list_contains({_EN}, w))) AS DOUBLE) / len(toks)
         ELSE 0.0 END AS sw_ratio,
    CASE WHEN length(text) > 0
         THEN CAST(length(text) - length(regexp_replace(text, '[^a-zA-Z0-9\\s]', '', 'g')) AS DOUBLE) / length(text)
         ELSE 0.0 END AS p_ratio,
    CASE WHEN len(toks) > 0
         THEN CAST(list_sum(list_transform(toks, w -> CAST(length(w) AS BIGINT))) AS DOUBLE) / len(toks)
         ELSE 0.0 END AS mwl
  FROM t
)
SELECT doc_id,
  round(p_ratio, 6) AS punct_ratio,
  round((
    least(CAST(n AS DOUBLE) / 50.0, 1.0)
    + least(sw_ratio * 10.0, 1.0)
    + (1.0 - least(p_ratio * 5.0, 1.0))
    + CASE WHEN mwl >= 2.0 AND mwl <= 12.0 THEN 1.0 ELSE 0.0 END
  ) / 4.0, 6) AS quality
FROM m
""")
def q_text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    return text.text_stats_full(docs, "doc_id", "text").select(
        "doc_id",
        F.round("punct_ratio", 6).alias("punct_ratio"),
        F.round("quality", 6).alias("quality"),
    )


# --- M5: LSH-bucketed approximate top-k ---------------------------------------------
# Exact oracle: the engine's hyperplanes are a seeded deterministic
# constant, so the oracle embeds the SAME plane vectors as SQL literals
# and recomputes signatures, candidate buckets, and cosine ranking —
# both sides are sequential double folds over identical constants
# (same recipe the green cosine_topk proves out).

def _cos_sql(qa: str, ca: str) -> str:
    return (
        f"list_sum(list_transform(range(1, len({qa}.embedding)+1), "
        f"i -> CAST({qa}.embedding[i] AS DOUBLE) * CAST({ca}.embedding[i] AS DOUBLE))) "
        f"/ (sqrt(list_sum(list_transform({qa}.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) "
        f"* sqrt(list_sum(list_transform({ca}.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))))"
    )


def _lsh_oracle(dim: int = 64, k: int = 10, nbits: int = 4, tables: int = 16, seed: int = 42) -> str:
    from harmony_energy_data_pipeline_spark.operators.similarity import _planes

    sig_exprs = []
    for t in range(tables):
        bits = []
        for j, plane in enumerate(_planes(dim, nbits, seed + t)):
            arr = "[" + ", ".join(repr(v) for v in plane) + "]"
            dotp = (
                f"list_sum(list_transform(range(1, {dim + 1}), "
                f"i -> CAST(embedding[i] AS DOUBLE) * ({arr})[i]))"
            )
            bits.append(f"CASE WHEN {dotp} >= 0 THEN {1 << j} ELSE 0 END")
        sig_exprs.append(" + ".join(bits))
    sigs = "[" + ", ".join(sig_exprs) + "]"
    return f"""
WITH s AS (SELECT vec_id, {sigs} AS sigs FROM embeddings),
b AS (
  SELECT vec_id,
         unnest(list_transform(range(1, {tables + 1}), i -> {{'t': i, 'b': sigs[i]}}),
                recursive := true)
  FROM s
),
cand AS (
  SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS neighbor_id
  FROM b q JOIN b c ON q.t = c.t AND q.b = c.b
  WHERE q.vec_id < 10 AND c.vec_id != q.vec_id
),
scored AS (
  SELECT cand.query_id, cand.neighbor_id, {_cos_sql("qa", "ca")} AS score
  FROM cand
  JOIN embeddings qa ON qa.vec_id = cand.query_id
  JOIN embeddings ca ON ca.vec_id = cand.neighbor_id
)
SELECT query_id, neighbor_id, round(score, 6) AS score, rank FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY score DESC, neighbor_id ASC) AS rank
  FROM scored
) WHERE rank <= {k}
"""


@_q("lsh_topk", _lsh_oracle())
def q_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, "embeddings", sf_dir)
    dim = emb.select(F.size("embedding")).first()[0]
    # wide-bucket dial (4 bits x 16 tables): the synthetic embeddings
    # are near-random, so narrow buckets would gut recall
    out = similarity.lsh_topk(
        emb.filter(F.col("vec_id") < 10), emb, dim=dim, k=10, nbits=4, tables=16,
    )
    return out.select("query_id", "neighbor_id", F.round("score", 6).alias("score"), "rank")


# --- M5: IVF approximate top-k -------------------------------------------------------
# The registered variant uses the deterministic portable quantizer
# (ivf_topk_portable: one Lloyd M-step over cell = vec_id % n, exact
# integer distances), so cells, probes, candidates, and ranking are
# all oracle-reproducible. The KMeans-trained ivf_topk keeps the same
# plan shape and is equivalence-tested against exact brute force in
# pytest (probe-all == cosine_topk).

def _ivf_oracle(dim: int = 64, k: int = 10, n_centroids: int = 8, n_probe: int = 4) -> str:
    return f"""
WITH pe AS (
  SELECT vec_id, pos,
         CAST(round(CAST(embedding[pos] AS DOUBLE) * 1000000.0) AS BIGINT) AS vm
  FROM embeddings, (SELECT unnest(range(1, {dim + 1})) AS pos) p
),
cent AS (
  SELECT vec_id % {n_centroids} AS cell, pos,
         CAST(round(CAST(SUM(vm) AS DOUBLE) / COUNT(*)) AS BIGINT) AS cm
  FROM pe GROUP BY 1, 2
),
dist AS (
  SELECT pe.vec_id, c.cell, SUM((pe.vm - c.cm) * (pe.vm - c.cm)) AS d2
  FROM pe JOIN cent c ON pe.pos = c.pos GROUP BY 1, 2
),
assigned AS (
  SELECT vec_id, cell FROM (
    SELECT vec_id, cell, row_number() OVER (PARTITION BY vec_id ORDER BY d2 ASC, cell ASC) AS rn
    FROM dist
  ) WHERE rn = 1
),
probes AS (
  SELECT vec_id AS query_id, cell FROM (
    SELECT vec_id, cell, row_number() OVER (PARTITION BY vec_id ORDER BY d2 ASC, cell ASC) AS rn
    FROM dist WHERE vec_id < 10
  ) WHERE rn <= {n_probe}
),
cand AS (
  SELECT p.query_id, a.vec_id AS neighbor_id
  FROM probes p JOIN assigned a USING (cell)
  WHERE a.vec_id != p.query_id
),
scored AS (
  SELECT cand.query_id, cand.neighbor_id, {_cos_sql("qa", "ca")} AS score
  FROM cand
  JOIN embeddings qa ON qa.vec_id = cand.query_id
  JOIN embeddings ca ON ca.vec_id = cand.neighbor_id
)
SELECT query_id, neighbor_id, round(score, 6) AS score, rank FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY score DESC, neighbor_id ASC) AS rank
  FROM scored
) WHERE rank <= {k}
"""


@_q("ivf_topk", _ivf_oracle())
def q_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, "embeddings", sf_dir)
    out = similarity.ivf_topk_portable(
        emb.filter(F.col("vec_id") < 10), emb, k=10, n_centroids=8, n_probe=4,
    )
    return out.select("query_id", "neighbor_id", F.round("score", 6).alias("score"), "rank")


# --- SemDeDup: cluster-sharded semantic near-duplicate pruning --------------------
# Same portable quantizer as ivf_topk (cells/centroids reproduced in
# SQL), then within-cell cosine pairs and the keep-first drop rule —
# the survivor set is fully deterministic, so the oracle is exact.

def _semdedup_oracle(dim: int = 64, n_cells: int = 8, threshold: float = 0.3) -> str:
    return f"""
WITH pe AS (
  SELECT vec_id, pos,
         CAST(round(CAST(embedding[pos] AS DOUBLE) * 1000000.0) AS BIGINT) AS vm
  FROM embeddings, (SELECT unnest(range(1, {dim + 1})) AS pos) p
),
cent AS (
  SELECT vec_id % {n_cells} AS cell, pos,
         CAST(round(CAST(SUM(vm) AS DOUBLE) / COUNT(*)) AS BIGINT) AS cm
  FROM pe GROUP BY 1, 2
),
dist AS (
  SELECT pe.vec_id, c.cell, SUM((pe.vm - c.cm) * (pe.vm - c.cm)) AS d2
  FROM pe JOIN cent c ON pe.pos = c.pos GROUP BY 1, 2
),
assigned AS (
  SELECT vec_id, cell FROM (
    SELECT vec_id, cell, row_number() OVER (PARTITION BY vec_id ORDER BY d2 ASC, cell ASC) AS rn
    FROM dist
  ) WHERE rn = 1
),
drops AS (
  SELECT DISTINCT b.vec_id
  FROM assigned a JOIN assigned b USING (cell)
  JOIN embeddings ea ON ea.vec_id = a.vec_id
  JOIN embeddings eb ON eb.vec_id = b.vec_id
  WHERE a.vec_id < b.vec_id AND {_cos_sql("ea", "eb")} >= {threshold}
)
SELECT vec_id, cell FROM assigned
WHERE vec_id NOT IN (SELECT vec_id FROM drops)
"""


@_q("semdedup_keep", _semdedup_oracle())
def q_semdedup_keep(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, "embeddings", sf_dir)
    # vectorized=False: the per-pair Catalyst path is bit-identical to
    # the SQL oracle (the BLAS kernel differs in the last ulp); the
    # two modes are equivalence-tested in tests/test_new_ops_round2.py
    return similarity.semdedup(emb, threshold=0.3, n_cells=8, vectorized=False)


@_q("semdedup_fast", _semdedup_oracle())
def q_semdedup_fast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The production (GEMM-kernel) mode against the SAME oracle: the
    survivor set is threshold-robust on this corpus (no pair sits
    within BLAS-rounding distance of 0.3), so both modes hash-match."""
    emb = load_table(spark, "embeddings", sf_dir)
    return similarity.semdedup(emb, threshold=0.3, n_cells=8, vectorized=True)


# --- A-ES deterministic weighted sampling -----------------------------------------
# Priorities come from md5(salt:key), not rand(), so the drawn sample
# is identical on every run/engine; ranking is in log-space and only
# ORDERS rows (never hashed), so libm-vs-JVM ulp differences cannot
# surface — distinct keys give well-separated priorities.

@_q("weighted_sample_docs", """
WITH pri AS (
  SELECT doc_id, lang,
         ln((CAST(CONCAT('0x', substr(md5('aes:' || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) + 0.5)
            / 1152921504606846976.0) / CAST(length(text) AS DOUBLE) AS rk
  FROM documents WHERE length(text) > 0
)
SELECT doc_id, lang FROM (
  SELECT doc_id, lang, row_number() OVER (PARTITION BY lang ORDER BY rk DESC, doc_id ASC) AS rn
  FROM pri
) WHERE rn <= 25
""")
def q_weighted_sample_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from harmony_energy_data_pipeline_spark.operators.sampling import weighted_sample

    docs = load_table(spark, "documents", sf_dir)
    out = weighted_sample(
        docs, key="doc_id", weight_col=F.length("text"), k=25, group_col="lang"
    )
    return out.select("doc_id", "lang")


# --- hashed-feature linear quality classifier -------------------------------------
# Integer token weights (md5-derived) fold exactly on both engines;
# the single final sigmoid is rounded to 6 dp, and the keep decision
# compares the INTEGER weight total so no float boundary exists.

@_q("quality_classifier_docs", f"""
WITH t AS (
  SELECT doc_id, unnest({_TOKS}) AS tok FROM documents
),
w AS (
  SELECT doc_id,
         CAST(CONCAT('0x', substr(md5('qw:' || tok), 1, 15)) AS BIGINT) % 2001 - 1000 AS wt
  FROM t WHERE tok <> ''
),
s AS (
  SELECT doc_id, CAST(SUM(wt) AS BIGINT) AS total, COUNT(*) AS n FROM w GROUP BY doc_id
)
SELECT d.doc_id,
       round(1.0 / (1.0 + exp(-(CASE WHEN s.n > 0 THEN CAST(s.total AS DOUBLE) / (s.n * 1000.0) ELSE 0.0 END))), 6) AS score,
       COALESCE(s.total, 0) >= 0 AS keep
FROM documents d LEFT JOIN s USING (doc_id)
""")
def q_quality_classifier_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    # single-evaluation form: one tokenize + one md5 fold per row
    # (the composed Column builders evaluated the fold twice and the
    # tokenizer five times — see text.hashed_linear_outputs)
    out = text.hashed_linear_outputs(docs, "doc_id", "text")
    return out.select(
        "doc_id", F.round("score", 6).alias("score"), "keep"
    )


# --- blocked fuzzy matching (record linkage) --------------------------------------
# The pair set is grouped to (dist, n_pairs, id_checksum): the checksum
# folds every pair identity into the value hash, so the oracle verifies
# the full pair computation without shipping 30k+ rows.

@_q("fuzzy_pairs_part", """
WITH n AS (
  SELECT p_partkey AS id, trim(regexp_replace(lower(p_name), '[^a-z0-9]+', ' ', 'g')) AS nm
  FROM part
),
b AS (
  SELECT id, nm, substr(nm, 1, 4) || '|' || CAST(length(nm) // 8 AS VARCHAR) AS blk FROM n
),
pairs AS (
  SELECT a.id AS id_a, b2.id AS id_b, CAST(levenshtein(a.nm, b2.nm) AS BIGINT) AS dist
  FROM b a JOIN b b2 ON a.blk = b2.blk AND a.id < b2.id
  WHERE levenshtein(a.nm, b2.nm) <= 3
)
SELECT dist, COUNT(*) AS n_pairs,
       CAST(SUM(id_a * 100000 + id_b) AS BIGINT) AS id_checksum
FROM pairs GROUP BY dist ORDER BY dist
""")
def q_fuzzy_pairs_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    parts = load_table(spark, "part", sf_dir)
    pairs = dedup.fuzzy_match_pairs(parts, "p_partkey", "p_name", max_edit=3)
    return (
        pairs.groupBy("dist")
        .agg(
            F.count("*").alias("n_pairs"),
            F.sum(F.col("id_a") * 100000 + F.col("id_b")).cast("long").alias("id_checksum"),
        )
        .orderBy("dist")
    )


# --- unigram-LM perplexity signal -------------------------------------------------
# Log-probs quantized to integer micro-nats make the per-doc sums exact
# integer arithmetic; one rounded division produces the final double.

@_q("unigram_nll_docs", f"""
WITH t AS (
  SELECT doc_id, unnest({_TOKS}) AS tok FROM documents
),
tt AS (
  SELECT doc_id, tok, COUNT(*) AS tf FROM t WHERE tok <> '' GROUP BY doc_id, tok
),
v AS (SELECT tok, CAST(SUM(tf) AS BIGINT) AS cf FROM tt GROUP BY tok),
tot AS (SELECT CAST(SUM(cf) AS BIGINT) AS total FROM v),
li AS (
  SELECT tok, CAST(round(ln(CAST(cf AS DOUBLE) / CAST(total AS DOUBLE)) * 1000000.0) AS BIGINT) AS li
  FROM v, tot
)
SELECT tt.doc_id, CAST(SUM(tt.tf) AS BIGINT) AS n_tokens,
       round(-CAST(SUM(li.li * tt.tf) AS DOUBLE) / (1000000.0 * CAST(SUM(tt.tf) AS DOUBLE)), 6) AS nll
FROM tt JOIN li USING (tok)
GROUP BY tt.doc_id
""")
def q_unigram_nll_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    out = text.unigram_nll(docs, "doc_id", "text")
    return out.select("doc_id", "n_tokens", F.round("nll", 6).alias("nll"))


# --- text breadth: bigram-LM NLL (conditional-probability quality signal) ----
# Same micro-nat integer discipline as unigram_nll_docs; the model is
# p(w2|w1) over the corpus's adjacent-token stream, so word-salad text
# (common words, improbable order) scores high where unigram can't see it.

@_q("bigram_nll_docs", f"""
WITH bg AS (
  SELECT d.doc_id, u.pr[1] AS w1, u.pr[2] AS w2
  FROM (SELECT doc_id, {_TOKS} AS t FROM documents) d,
  LATERAL (SELECT unnest(list_zip(d.t, d.t[2:])) AS pr) u
  WHERE u.pr[2] IS NOT NULL AND u.pr[1] <> '' AND u.pr[2] <> ''
),
per_doc AS (SELECT doc_id, w1, w2, COUNT(*) AS tf FROM bg GROUP BY 1, 2, 3),
cf2 AS (SELECT w1, w2, CAST(SUM(tf) AS BIGINT) AS c2 FROM per_doc GROUP BY 1, 2),
cf1 AS (SELECT w1, CAST(SUM(c2) AS BIGINT) AS c1 FROM cf2 GROUP BY 1),
sc AS (
  SELECT per_doc.doc_id, per_doc.tf,
         CAST(round(ln(CAST(c2 AS DOUBLE) / CAST(c1 AS DOUBLE)) * 1000000.0) AS BIGINT) AS li
  FROM per_doc JOIN cf2 USING (w1, w2) JOIN cf1 USING (w1)
)
SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS n_bigrams,
       round(-CAST(SUM(li * tf) AS DOUBLE) / (1000000.0 * CAST(SUM(tf) AS DOUBLE)), 6) AS nll
FROM sc GROUP BY doc_id
""")
def q_bigram_nll_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    out = text.bigram_nll(docs, "doc_id", "text")
    return out.select("doc_id", "n_bigrams", F.round("nll", 6).alias("nll"))


# --- M5: int8-quantized dot-product top-k (compressed ANN) -------------------
# Pure-integer scoring over clamp(round(x*127)) vectors: the 4x-smaller
# storage path with a bit-exact oracle (no float rounding anywhere).

@_q("quantized_topk", """
WITH q8 AS (
  SELECT vec_id, list_transform(embedding,
         x -> CAST(greatest(-127, least(127, round(CAST(x AS DOUBLE) * 127))) AS BIGINT)) AS e8
  FROM embeddings
),
q AS (SELECT vec_id AS query_id, e8 AS qe FROM q8 WHERE vec_id % 97 = 0),
scored AS (
  SELECT q.query_id, c.vec_id AS neighbor_id,
         CAST(list_sum(list_transform(range(1, len(q.qe) + 1),
                                      i -> q.qe[i] * c.e8[i])) AS BIGINT) AS dot_q
  FROM q CROSS JOIN q8 c
  WHERE c.vec_id != q.query_id
)
SELECT query_id, neighbor_id, dot_q, rank FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY dot_q DESC, neighbor_id ASC) AS rank
  FROM scored
) WHERE rank <= 10
""")
def q_quantized_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, "embeddings", sf_dir)
    return similarity.quantized_dot_topk(
        emb.filter(F.col("vec_id") % 97 == 0), emb, k=10,
    )


# --- deterministic quantile sketch ------------------------------------------------
# Bottom-k-hash sample (same portable 60-bit hash as the KMV sketch) +
# exact interpolated percentiles over the sample; identical on any
# engine/partitioning, so the approximation passes an exact oracle.

_QS_PROBS = [0.25, 0.5, 0.75, 0.9, 0.99]

@_q("value_quantile_sketch", f"""
WITH s AS (
  SELECT value FROM (
    SELECT value, event_id,
           CAST(md5_number_lower(CAST(event_id AS VARCHAR)) % {1 << 60} AS BIGINT) AS h
    FROM events
  ) ORDER BY h ASC, event_id ASC LIMIT 1000
),
q AS (SELECT quantile_cont(value, {_QS_PROBS}) AS qs FROM s)
SELECT {_QS_PROBS}[i] AS p, round(qs[i], 6) AS value
FROM q, (SELECT unnest(range(1, {len(_QS_PROBS) + 1})) AS i) idx
""")
def q_value_quantile_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    from harmony_energy_data_pipeline_spark.operators.analytics import (
        hash_sample_quantiles,
    )

    ev = load_table(spark, "events", sf_dir)
    out = hash_sample_quantiles(ev, "event_id", "value", _QS_PROBS, k=1000)
    return out.select("p", F.round("value", 6).alias("value"))


# --- fixed-point PageRank over the customer<->supplier trade graph ----------------
# Pure-integer power iteration (micro-unit ranks, integer division)
# makes 3 unrolled rounds bit-identical in SQL — an iterative operator
# with an EXACT oracle, no float convergence fuzz.

def _pagerank_round(prev: str, out: str) -> str:
    return f"""
{out} AS (
  SELECT n.node, CAST((15000000 + 85 * COALESCE(c.s, 0)) // 100 AS BIGINT) AS r
  FROM n LEFT JOIN (
    SELECT e.dst AS node, SUM({prev}.r // deg.d) AS s
    FROM e JOIN deg USING (src) JOIN {prev} ON {prev}.node = e.src
    GROUP BY e.dst
  ) c USING (node)
)"""


@_q("pagerank_cust_supp", f"""
WITH raw AS (
  SELECT DISTINCT o.o_custkey * 2 AS a, l.l_suppkey * 2 + 1 AS b
  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
),
e AS (SELECT a AS src, b AS dst FROM raw UNION SELECT b, a FROM raw),
deg AS (SELECT src, COUNT(*) AS d FROM e GROUP BY src),
n AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
r0 AS (SELECT node, CAST(1000000 AS BIGINT) AS r FROM n),
{_pagerank_round("r0", "r1")},
{_pagerank_round("r1", "r2")},
{_pagerank_round("r2", "r3")}
SELECT node, r AS rank_micro FROM r3
""")
def q_pagerank_cust_supp(spark: SparkSession, sf_dir: str) -> DataFrame:
    from harmony_energy_data_pipeline_spark.operators.graph import pagerank_fixed_point

    orders = load_table(spark, "orders", sf_dir)
    li = load_table(spark, "lineitem", sf_dir)
    pairs = (
        orders.join(li, orders["o_orderkey"] == li["l_orderkey"])
        .select(
            (F.col("o_custkey") * 2).alias("a"),
            (F.col("l_suppkey") * 2 + 1).alias("b"),
        )
        .distinct()
    )
    edges = pairs.select(F.col("a").alias("src"), F.col("b").alias("dst")).union(
        pairs.select(F.col("b").alias("src"), F.col("a").alias("dst"))
    )
    # assume_distinct: pairs is DISTINCT and the union arms are
    # disjoint by construction (src even in one arm, odd in the
    # other), so the operator's dedup shuffle would remove nothing.
    # rank_join stays "partitioned": r13 interleaved A/B ×5 measured
    # the broadcast mode 55% SLOWER here (median 3.17 vs 4.90 s — six
    # sequential per-round broadcast-build jobs dominate at this edge
    # volume); broadcast is the dial for huge-edge/dimension-node
    # graphs where re-exchanging the edge list per round is the wall.
    return pagerank_fixed_point(edges, n_iter=3, assume_distinct=True)


# --- WordPiece subword tokenization -----------------------------------------------
# Greedy longest-match is reproduced in SQL as a recursive CTE whose
# step picks the longest matching piece via a LATERAL top-1 — at any
# cursor the longest match is unique, so Spark's pandas-UDF loop and
# the CTE agree exactly. Single-char pieces guarantee termination.

_WP_VOCAB = (
    list("abcdefghijklmnopqrstuvwxyz0123456789")
    + ["##" + ch for ch in "abcdefghijklmnopqrstuvwxyz0123456789"]
    + [
        "join", "hash", "row", "batch", "scan", "small", "merge", "slow",
        "order", "line", "data", "agg", "key", "spark", "part", "big",
        "sort", "fast", "the", "dup",
        # split stems + continuations: customer/column/filter/value/
        # vector/table/stream/window/group/query
        "cust", "##omer", "col", "##umn", "fil", "##ter", "val", "##ue",
        "vec", "##tor", "tab", "##le", "str", "##eam", "win", "##dow",
        "gr", "##oup", "qu", "##ery",
    ]
)


def _wp_vocab_sql() -> str:
    return ", ".join("'" + p + "'" for p in _WP_VOCAB)


@_q("wordpiece_counts", f"""
WITH RECURSIVE vocab(piece) AS (
  SELECT unnest([{_wp_vocab_sql()}])
),
t AS (SELECT doc_id, unnest({_TOKS}) AS tok FROM documents),
w AS (SELECT tok AS word, COUNT(*) AS n FROM t WHERE tok <> '' GROUP BY tok),
step(word, off, piece) AS (
  SELECT word, 0, CAST(NULL AS VARCHAR) FROM w
  UNION ALL
  SELECT s.word, s.off + m.adv, m.out_piece
  FROM step s, LATERAL (
    SELECT v.piece AS out_piece,
           CASE WHEN v.piece LIKE '##%' THEN length(v.piece) - 2 ELSE length(v.piece) END AS adv
    FROM vocab v
    WHERE (s.off = 0 AND v.piece NOT LIKE '##%'
           AND substr(s.word, 1, length(v.piece)) = v.piece)
       OR (s.off > 0 AND v.piece LIKE '##%'
           AND substr(s.word, s.off + 1, length(v.piece) - 2) = substr(v.piece, 3))
    ORDER BY adv DESC, v.piece ASC
    LIMIT 1
  ) m
  WHERE s.off < length(s.word)
)
SELECT p.piece, CAST(SUM(w.n) AS BIGINT) AS n
FROM (SELECT word, piece FROM step WHERE piece IS NOT NULL) p
JOIN w USING (word)
GROUP BY p.piece
""")
def q_wordpiece_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    return text.wordpiece_token_counts(docs, "doc_id", "text", _WP_VOCAB)


# --- text breadth: BPE merge training ----------------------------------------
# First-3 byte-pair-encoding merge rules learned from the corpus word
# histogram. Wrapped-symbol strings make literal replace() exact (no
# cross-boundary matches) and left-to-right greedy in BOTH engines;
# the oracle unrolls the 3 rounds with list_zip adjacent pairs and
# scalar-subquery rewrites.

def _bpe_round(r: int) -> str:
    prev = f"h{r - 1}"
    return f"""
p{r} AS (
  SELECT u.pr[1] AS l, u.pr[2] AS r, CAST(SUM(h.wc) AS BIGINT) AS cnt
  FROM {prev} h, LATERAL (
    SELECT unnest(list_zip(regexp_extract_all(h.seq, '<[^<>]*>'),
                           regexp_extract_all(h.seq, '<[^<>]*>')[2:])) AS pr) u
  WHERE u.pr[2] IS NOT NULL
  GROUP BY 1, 2
),
m{r} AS (
  SELECT {r} AS merge_round, l, r,
         '<' || substring(l, 2, length(l) - 2) || substring(r, 2, length(r) - 2) || '>' AS merged,
         cnt
  FROM p{r} ORDER BY cnt DESC, l ASC, r ASC LIMIT 1
),
h{r} AS (
  -- coalesce guards the pair-free round: replacing a never-occurring
  -- sentinel char leaves the histogram unchanged (mirrors the
  -- engine's empty-safe left-join rewrite)
  SELECT replace(h.seq,
                 coalesce((SELECT l || r FROM m{r}), chr(1)),
                 coalesce((SELECT merged FROM m{r}), '')) AS seq, h.wc
  FROM {prev} h
)"""


@_q("bpe_merges", f"""
WITH h0 AS (
  SELECT list_aggregate(list_transform(regexp_extract_all(word, '.'),
                                       c -> '<' || c || '>'),
                        'string_agg', '') AS seq,
         COUNT(*) AS wc
  FROM (SELECT unnest({_TOKS}) AS word FROM documents)
  WHERE word <> ''
  GROUP BY word
),
{_bpe_round(1)},
{_bpe_round(2)},
{_bpe_round(3)}
SELECT merge_round, l AS left_sym, r AS right_sym, merged, cnt AS pair_count
FROM (SELECT * FROM m1 UNION ALL SELECT * FROM m2 UNION ALL SELECT * FROM m3)
""")
def q_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    return text.bpe_learn(docs, "doc_id", "text", n_merges=3)


# --- text breadth: BPE encode (learn + apply, subword vocabulary head) -------

@_q("bpe_vocab", f"""
WITH h0 AS (
  SELECT list_aggregate(list_transform(regexp_extract_all(word, '.'),
                                       c -> '<' || c || '>'),
                        'string_agg', '') AS seq,
         COUNT(*) AS wc
  FROM (SELECT unnest({_TOKS}) AS word FROM documents)
  WHERE word <> ''
  GROUP BY word
),
{_bpe_round(1)},
{_bpe_round(2)},
{_bpe_round(3)}
SELECT substring(sym, 2, length(sym) - 2) AS token,
       CAST(SUM(wc) AS BIGINT) AS token_count
FROM (SELECT unnest(regexp_extract_all(seq, '<[^<>]*>')) AS sym, wc FROM h3)
GROUP BY 1
ORDER BY token_count DESC, token ASC
LIMIT 50
""")
def q_bpe_vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    return text.bpe_token_counts(docs, "doc_id", "text", n_merges=3, top_k=50)


# --- table digest + expectations gate ---------------------------------------------
# Digest columns restricted to ints/strings: float->string formatting
# is not engine-portable (the operator docstring mandates fixed-point
# canonicalization first, which is the engine's cents convention).

@_q("table_digest_orders", f"""
WITH h AS (
  SELECT CAST(md5_number_lower(
           COALESCE(chr(1) || replace(replace(CAST(o_orderkey AS VARCHAR), chr(2), chr(2) || chr(2)), chr(31), chr(2) || chr(31)), chr(0)) || chr(31) ||
           COALESCE(chr(1) || replace(replace(CAST(o_custkey AS VARCHAR), chr(2), chr(2) || chr(2)), chr(31), chr(2) || chr(31)), chr(0)) || chr(31) ||
           COALESCE(chr(1) || replace(replace(o_orderstatus, chr(2), chr(2) || chr(2)), chr(31), chr(2) || chr(31)), chr(0)) || chr(31) ||
           COALESCE(chr(1) || replace(replace(o_orderpriority, chr(2), chr(2) || chr(2)), chr(31), chr(2) || chr(31)), chr(0))
         ) % {1 << 60} AS BIGINT) AS hv
  FROM orders
)
SELECT COUNT(*) AS n_rows,
       bit_xor(hv) AS digest_xor,
       CAST(SUM(hv) % {1 << 60} AS BIGINT) AS digest_sum
FROM h
""")
def q_table_digest_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    from harmony_energy_data_pipeline_spark.operators.expectations import table_digest

    orders = load_table(spark, "orders", sf_dir)
    return table_digest(
        orders, ["o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority"]
    )


@_q("expectations_orders", """
SELECT 'not_null:o_custkey' AS check, CAST(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS violations FROM orders
UNION ALL
SELECT 'in_range:o_totalprice', CAST(SUM(CASE WHEN o_totalprice IS NULL OR o_totalprice < 0 OR o_totalprice > 1000000 THEN 1 ELSE 0 END) AS BIGINT) FROM orders
UNION ALL
SELECT 'matches:o_orderpriority', CAST(SUM(CASE WHEN o_orderpriority IS NULL OR NOT regexp_matches(o_orderpriority, '^[1-5]-') THEN 1 ELSE 0 END) AS BIGINT) FROM orders
UNION ALL
SELECT 'unique:o_orderkey', CAST(COALESCE(SUM(extra), 0) AS BIGINT) FROM (
  SELECT COUNT(*) - 1 AS extra FROM orders GROUP BY o_orderkey
)
""")
def q_expectations_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    from harmony_energy_data_pipeline_spark.operators import expectations as X

    orders = load_table(spark, "orders", sf_dir)
    return X.expect(
        orders,
        [
            X.not_null("o_custkey"),
            X.in_range("o_totalprice", 0, 1_000_000),
            X.matches("o_orderpriority", "^[1-5]-"),
            X.unique("o_orderkey"),
        ],
    )


# --- event analytics: funnel / transitions / cohort retention ---------------------

@_q("funnel_view_click_purchase", """
WITH s1 AS (
  SELECT user_id, MIN(ts) AS t FROM events WHERE event_type = 'view' GROUP BY user_id
),
s2 AS (
  SELECT e.user_id, MIN(e.ts) AS t FROM events e JOIN s1 ON e.user_id = s1.user_id
  WHERE e.event_type = 'click' AND e.ts > s1.t GROUP BY e.user_id
),
s3 AS (
  SELECT e.user_id, MIN(e.ts) AS t FROM events e JOIN s2 ON e.user_id = s2.user_id
  WHERE e.event_type = 'purchase' AND e.ts > s2.t GROUP BY e.user_id
)
SELECT 1 AS step_idx, 'view' AS step, COUNT(*) AS n_users FROM s1
UNION ALL SELECT 2, 'click', COUNT(*) FROM s2
UNION ALL SELECT 3, 'purchase', COUNT(*) FROM s3
""")
def q_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir)
    return analytics.funnel(ev, "user_id", "ts", "event_type", ["view", "click", "purchase"])


@_q("event_transitions", """
SELECT prev_type, next_type, COUNT(*) AS n FROM (
  SELECT lag(event_type) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC) AS prev_type,
         event_type AS next_type
  FROM events
) WHERE prev_type IS NOT NULL
GROUP BY prev_type, next_type
""")
def q_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir)
    return analytics.transition_counts(ev, "user_id", "ts", "event_type", "event_id")


@_q("cohort_retention_weekly", """
WITH weeks AS (
  SELECT DISTINCT user_id, date_trunc('week', ts) AS w FROM events
),
first AS (SELECT user_id, MIN(w) AS cohort_week FROM weeks GROUP BY user_id)
SELECT f.cohort_week,
       CAST(date_diff('day', f.cohort_week, weeks.w) // 7 AS BIGINT) AS week_offset,
       COUNT(*) AS n_users
FROM weeks JOIN first f USING (user_id)
GROUP BY 1, 2
""")
def q_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir)
    return analytics.cohort_retention(ev, "user_id", "ts")


# --- distributed Gram matrix (the PCA reduction) ----------------------------------
# Integer-quantized partial GEMMs merge exactly; the oracle recomputes
# the same upper triangle from an unnest self-join.

@_q("embedding_gram", """
WITH pe AS (
  SELECT vec_id, pos,
         CAST(round(CAST(embedding[pos] AS DOUBLE) * 1000000.0) AS BIGINT) AS vm
  FROM embeddings, (SELECT unnest(range(1, 65)) AS pos) p
)
SELECT a.pos - 1 AS i, b.pos - 1 AS j, CAST(SUM(a.vm * b.vm) AS BIGINT) AS s
FROM pe a JOIN pe b ON a.vec_id = b.vec_id AND a.pos <= b.pos
GROUP BY 1, 2
""")
def q_embedding_gram(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, "embeddings", sf_dir)
    return similarity.gram_matrix(emb, "embedding")


# --- quantile binning + repeat suppression ----------------------------------------
# Bin edges quantize to cents on BOTH sides, so ulp-level cutpoint
# differences between engines cannot flip a bin.

_QB_PROBS = [0.25, 0.5, 0.75, 0.9]

@_q("value_quantile_bins", f"""
WITH s AS (
  SELECT value FROM (
    SELECT value, event_id,
           CAST(md5_number_lower(CAST(event_id AS VARCHAR)) % {1 << 60} AS BIGINT) AS h
    FROM events
  ) ORDER BY h ASC, event_id ASC LIMIT 1000
),
cuts AS (
  SELECT list_sort(list_transform(quantile_cont(value, {_QB_PROBS}),
                                  c -> CAST(round(c * 100) AS BIGINT))) AS cs
  FROM s
)
SELECT bin, COUNT(*) AS n FROM (
  SELECT len(list_filter(cuts.cs, c -> CAST(round(e.value * 100) AS BIGINT) >= c)) AS bin
  FROM events e, cuts
) GROUP BY bin
""")
def q_value_quantile_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir)
    binned = analytics.quantile_bins(ev, "event_id", "value", _QB_PROBS, k=1000)
    return binned.groupBy("bin").agg(F.count("*").alias("n"))


@_q("suppress_repeats_events", """
SELECT event_id, user_id, event_type FROM (
  SELECT event_id, user_id, event_type, ts,
         lag(ts) OVER (PARTITION BY user_id, event_type ORDER BY ts ASC, event_id ASC) AS prev
  FROM events
) WHERE prev IS NULL OR date_diff('second', prev, ts) > 3600
""")
def q_suppress_repeats_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    from harmony_energy_data_pipeline_spark.operators.cleaning import (
        suppress_repeats_within,
    )

    ev = load_table(spark, "events", sf_dir)
    out = suppress_repeats_within(
        ev, ["user_id", "event_type"], "ts", "event_id", horizon_seconds=3600
    )
    return out.select("event_id", "user_id", "event_type")


# --- key-skew profile (join-strategy diagnosis) -----------------------------------

@_q("skew_profile_lineitem_suppkey", """
WITH c AS (SELECT l_suppkey, COUNT(*) AS c FROM lineitem GROUP BY l_suppkey),
t AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM c),
li AS (
  SELECT c.c, t.n,
         CAST(round(ln(CAST(c.c AS DOUBLE) / CAST(t.n AS DOUBLE)) * 1000000.0) AS BIGINT) AS li
  FROM c, t
)
SELECT MAX(n) AS n_rows, COUNT(*) AS n_keys,
       CAST(round(CAST(MAX(c) AS DOUBLE) * 1000000.0 / CAST(MAX(n) AS DOUBLE)) AS BIGINT) AS max_share_ppm,
       CAST(round(-CAST(SUM(li * c) AS DOUBLE) / CAST(MAX(n) AS DOUBLE)) AS BIGINT) AS entropy_micro_nats
FROM li
""")
def q_skew_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, "lineitem", sf_dir)
    return analytics.key_skew_profile(li, "l_suppkey")


# --- multimodal: decode/feature plumbing over binary payloads ---------------------
# The payload is the UTF-8 encoding of `text`, and DuckDB hashes
# VARCHARs over their UTF-8 bytes — so the deterministic fake codec
# (sha256-derived features) is fully oracle-checkable: the binary
# mapInPandas plumbing must produce exactly what SQL computes from the
# source text. Feature array exploded to scalars (pos, val) so the
# value hash covers every element.

@_q("multimodal_features", """
SELECT doc_id AS id,
       octet_length(encode(text)) AS n_bytes,
       sha256(text) AS sha256,
       j AS pos,
       CAST(CAST(CONCAT('0x', substr(sha256(text), 2*j+1, 2)) AS INTEGER) / 255.0 AS FLOAT) AS val
FROM documents, (SELECT unnest(range(0, 16)) AS j) t
""")
def q_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    from harmony_energy_data_pipeline_spark.operators import multimodal
    docs = load_table(spark, "documents", sf_dir)
    media = docs.select("doc_id", F.encode("text", "UTF-8").alias("payload"))
    media = multimodal.attach_media_meta(media, "payload", "image", "png")
    decoded = multimodal.decode_features(media, "doc_id", "payload")
    return decoded.select(
        "id", "n_bytes", "sha256", F.posexplode("feature").alias("pos", "val")
    )


# --- A: approximate distinct (KMV sketch — deterministic + portable, so the
#     cardinality ESTIMATE itself is oracle-checked bit-for-bit; the HLL
#     variant is Spark's built-in approx_count_distinct, error-bound-tested
#     in pytest) ---------------------------------------------------------------

# --- Count-Min sketch heavy hitters -----------------------------------------
# Fixed width*depth counter grid, portable md5 hashing -> the sketch
# and every min-of-counters estimate are bit-identical in SQL; CMS
# guarantees est >= exact, so heavy-hitter mode returns a superset.

@_q("cms_heavy_users", f"""
WITH ex AS (
  SELECT user_id, j
  FROM events, (SELECT unnest([0, 1, 2]) AS j) js
),
b AS (
  SELECT j,
         CAST(md5_number_lower(CONCAT(CAST(j AS VARCHAR), ':', CAST(user_id AS VARCHAR)))
              % {1 << 60} % 256 AS BIGINT) AS bucket
  FROM ex
),
sketch AS (SELECT j, bucket, COUNT(*) AS c FROM b GROUP BY 1, 2),
keys AS (SELECT user_id, COUNT(*) AS exact_count FROM events GROUP BY 1),
est AS (
  SELECT k.user_id, k.exact_count, MIN(s.c) AS est_count
  FROM keys k, (SELECT unnest([0, 1, 2]) AS j) js
  JOIN sketch s
    ON s.j = js.j
   AND s.bucket = CAST(md5_number_lower(CONCAT(CAST(js.j AS VARCHAR), ':', CAST(k.user_id AS VARCHAR)))
                       % {1 << 60} % 256 AS BIGINT)
  GROUP BY 1, 2
)
SELECT user_id, CAST(est_count AS BIGINT) AS est_count, exact_count
FROM est WHERE est_count >= 25
""")
def q_cms_heavy_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    from harmony_energy_data_pipeline_spark.operators.analytics import cms_estimates

    ev = load_table(spark, "events", sf_dir)
    return cms_estimates(ev, "user_id", width=256, depth=3, min_est=25)


@_q("approx_distinct_users", f"""
WITH h AS (
  SELECT DISTINCT event_type,
         CAST(md5_number_lower(CAST(user_id AS VARCHAR)) % {1 << 60} AS BIGINT) AS hv
  FROM events
),
r AS (
  SELECT event_type, hv,
         row_number() OVER (PARTITION BY event_type ORDER BY hv ASC) AS rn
  FROM h
),
s AS (SELECT event_type, COUNT(*) AS cnt, MAX(hv) AS hk FROM r WHERE rn <= 64 GROUP BY event_type)
SELECT event_type,
  CASE WHEN cnt < 64 THEN cnt
       ELSE CAST(round({float(63 * (1 << 60))!r} / CAST(hk AS DOUBLE)) AS BIGINT)
  END AS approx_user_id
FROM s
""")
def q_approx_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    from harmony_energy_data_pipeline_spark.operators.analytics import kmv_distinct
    ev = load_table(spark, "events", sf_dir)
    return kmv_distinct(ev, "event_type", "user_id", k=64)


# Winnowing oracle notes: (1) the Rabin-Karp k-gram hash is the nested
# Horner form ((((c0·B+c1)·B+c2)·B+c3)·B+c4) mod M — DuckDB needs
# HUGEINT for the ~2^69 intermediates; (2) the engine's selected
# positions all carry their window's MINIMUM hash, so the distinct
# fingerprint VALUE set is exactly the distinct set of window minima —
# the rightmost-tie rule affects positions only, letting the oracle
# skip position bookkeeping entirely.

_WINNOW_M = (1 << 61) - 1
_WINNOW_KGRAM = (
    "CAST((((((((CAST(ascii(s[i]) AS HUGEINT) * 257 + ascii(s[i+1])) % {M}) * 257"
    " + ascii(s[i+2])) % {M}) * 257 + ascii(s[i+3])) % {M}) * 257"
    " + ascii(s[i+4])) % {M} AS BIGINT)"
).format(M=_WINNOW_M)


@_q("winnowing_fingerprints", f"""
WITH n AS (SELECT doc_id, {_NORM} AS s FROM documents),
g AS (SELECT doc_id, s FROM n WHERE length(s) >= 5),
h AS (
  SELECT doc_id,
    list_transform(range(1, length(s) - 3), i -> {_WINNOW_KGRAM}) AS hs
  FROM g
),
f AS (
  SELECT doc_id,
    CASE WHEN len(hs) <= 4 THEN [list_min(hs)]
         ELSE list_distinct(list_transform(range(1, len(hs) - 2),
              w0 -> list_min(hs[w0:w0+3])))
    END AS fps
  FROM h
)
SELECT doc_id, unnest(fps) AS fingerprint FROM f
""")
def q_winnowing_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    return text.winnowing_fingerprints(docs, "doc_id", "text")


@_q("multimodal_resize", """
SELECT doc_id AS id, 16 AS width, 16 AS height,
       256 AS n_bytes,
       md5(CONCAT(substr(text, 1, 256), repeat(chr(0), greatest(256 - octet_length(encode(text)), 0)))) AS checksum
FROM documents
""")
def q_multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from harmony_energy_data_pipeline_spark.operators import multimodal
    docs = load_table(spark, "documents", sf_dir)
    media = docs.select("doc_id", F.encode("text", "UTF-8").alias("payload"))
    out = multimodal.resize_images(media, "doc_id", "payload", width=16, height=16)
    return out.select(
        "id", "width", "height",
        F.length("resized").alias("n_bytes"),
        F.md5("resized").alias("checksum"),
    )


@_q("multimodal_frames", """
WITH b AS (SELECT doc_id AS id, octet_length(encode(text)) AS len FROM documents),
f AS (SELECT id, len, unnest(range(0, greatest(len // 32, 1), 5)) AS fi FROM b)
SELECT id, fi AS frame_idx, LEAST(32, len - fi * 32) AS n_bytes FROM f
""")
def q_multimodal_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    from harmony_energy_data_pipeline_spark.operators import multimodal
    docs = load_table(spark, "documents", sf_dir)
    media = docs.select("doc_id", F.encode("text", "UTF-8").alias("payload"))
    frames = multimodal.sample_frames(media, "doc_id", "payload", every_n=5, frame_size=32)
    return frames.select("id", "frame_idx", F.length("frame_bytes").alias("n_bytes"))


# --- M4 breadth: TPC-H Q5 (6-way join, regional revenue per nation) ----------
# Reference has no joins (SURVEY.md §2.3); this proves broadcast-dim join
# breadth on the driver corpus. nation/region/supplier are broadcast dims.

@_q("tpch_q5", """
SELECT n_name,
  CAST(SUM(CAST(round(l_extendedprice*100) AS BIGINT) * (100 - CAST(round(l_discount*100) AS BIGINT))) AS DOUBLE) / 10000.0 AS revenue,
  COUNT(*) AS n_items
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
WHERE r.r_name = 'ASIA'
  AND o.o_orderdate >= TIMESTAMP '1994-01-01 00:00:00'
  AND o.o_orderdate < TIMESTAMP '1996-01-01 00:00:00'
GROUP BY n_name
""")
def q_tpch_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, "lineitem", sf_dir)
    o = load_table(spark, "orders", sf_dir).filter(
        (F.col("o_orderdate") >= F.lit("1994-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-01-01 00:00:00").cast("timestamp"))
    )
    c = load_table(spark, "customer", sf_dir)
    s = load_table(spark, "supplier", sf_dir)
    n = load_table(spark, "nation", sf_dir)
    r = load_table(spark, "region", sf_dir).filter(F.col("r_name") == "ASIA")
    # dims collapse right-to-left: region filters nation, nation tags supplier
    sn = s.join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey")).join(
        F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey")
    )
    ep, disc = _cents("l_extendedprice"), _cents("l_discount")
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(
            F.broadcast(sn),
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .groupBy("n_name")
        .agg(
            (F.sum(ep * (F.lit(100) - disc)).cast("double") / F.lit(10000.0)).alias("revenue"),
            F.count("*").alias("n_items"),
        )
    )


# --- M4 breadth: TPC-H Q14 (conditional share over a join; scalar result) ----

@_q("tpch_q14", """
SELECT CAST(SUM(CASE WHEN p_type LIKE 'PROMO%'
        THEN CAST(round(l_extendedprice*100) AS BIGINT) * (100 - CAST(round(l_discount*100) AS BIGINT))
        ELSE 0 END) AS DOUBLE) * 100.0
     / CAST(SUM(CAST(round(l_extendedprice*100) AS BIGINT) * (100 - CAST(round(l_discount*100) AS BIGINT))) AS DOUBLE)
       AS promo_revenue_pct
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
WHERE l.l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
  AND l.l_shipdate < TIMESTAMP '1995-04-01 00:00:00'
""")
def q_tpch_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, "lineitem", sf_dir).filter(
        (F.col("l_shipdate") >= F.lit("1995-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1995-04-01 00:00:00").cast("timestamp"))
    )
    pt = load_table(spark, "part", sf_dir)
    ep, disc = _cents("l_extendedprice"), _cents("l_discount")
    rev = ep * (F.lit(100) - disc)
    return (
        li.join(F.broadcast(pt), F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            (
                F.sum(F.when(F.col("p_type").like("PROMO%"), rev).otherwise(F.lit(0))).cast("double")
                * F.lit(100.0)
                / F.sum(rev).cast("double")
            ).alias("promo_revenue_pct")
        )
    )


# --- M4 breadth: TPC-H Q18 (HAVING-filtered semi join, large orders top-k) ---

@_q("tpch_q18", """
SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
  CAST(SUM(CAST(round(l_quantity*100) AS BIGINT)) AS DOUBLE) / 100.0 AS total_qty
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON o.o_orderkey = l.l_orderkey
WHERE o_orderkey IN (
  SELECT l_orderkey FROM lineitem
  GROUP BY l_orderkey
  HAVING SUM(CAST(round(l_quantity*100) AS BIGINT)) > 25000
)
GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
ORDER BY o_totalprice DESC, o_orderkey ASC
LIMIT 20
""")
def q_tpch_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, "customer", sf_dir)
    o = load_table(spark, "orders", sf_dir)
    li = load_table(spark, "lineitem", sf_dir)
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(_cents("l_quantity")).alias("__q"))
        .filter(F.col("__q") > 25000)
        .select("l_orderkey")
    )
    return (
        o.join(F.broadcast(big), F.col("o_orderkey") == big["l_orderkey"], "left_semi")
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg((F.sum(_cents("l_quantity")).cast("double") / F.lit(100.0)).alias("total_qty"))
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(20)
    )


# --- M4 breadth: TPC-H Q4 shape (EXISTS semi-join + priority count) ----------
# Adapted to testdata columns: the lateness predicate is
# l_shipdate > o_orderdate + 60 days (no l_commitdate in this corpus).

@_q("tpch_q4", """
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders o
WHERE o_orderdate >= DATE '1995-01-01' AND o_orderdate < DATE '1995-10-01'
  AND EXISTS (
    SELECT 1 FROM lineitem l
    WHERE l.l_orderkey = o.o_orderkey
      AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
  )
GROUP BY o_orderpriority
""")
def q_tpch_q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, "orders", sf_dir).filter(
        (F.col("o_orderdate") >= F.lit("1995-01-01"))
        & (F.col("o_orderdate") < F.lit("1995-10-01"))
    )
    li = load_table(spark, "lineitem", sf_dir).select("l_orderkey", "l_shipdate")
    # correlated EXISTS as a left-semi join with the date predicate in
    # the join condition — one shuffle on orderkey, lineitem pruned to
    # two columns at the scan
    late = o.join(
        li,
        (F.col("o_orderkey") == F.col("l_orderkey"))
        & (F.col("l_shipdate") > F.date_add(F.col("o_orderdate"), 60)),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(F.count("*").alias("order_count"))


# --- M4 breadth: TPC-H Q22 shape (scalar subquery + anti-join + agg) ----------
# Adapted: nation key stands in for the phone country code (no c_phone
# in this corpus).

@_q("tpch_q22", """
WITH avg_bal AS (
  SELECT CAST(SUM(CAST(round(c_acctbal*100) AS BIGINT)) AS DOUBLE) / (100.0 * COUNT(*)) AS a
  FROM customer WHERE c_acctbal > 0.0 AND c_nationkey IN (1, 3, 5, 7, 9, 11, 13)
)
SELECT c_nationkey AS cntry, COUNT(*) AS numcust,
       CAST(SUM(CAST(round(c_acctbal*100) AS BIGINT)) AS DOUBLE) / 100.0 AS totacctbal
FROM customer, avg_bal
WHERE c_nationkey IN (1, 3, 5, 7, 9, 11, 13)
  AND c_acctbal > a
  AND NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = customer.c_custkey AND o.o_orderstatus = 'O')
GROUP BY c_nationkey
""")
def q_tpch_q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    nations = [1, 3, 5, 7, 9, 11, 13]
    c = load_table(spark, "customer", sf_dir).filter(F.col("c_nationkey").isin(nations))
    o = (
        load_table(spark, "orders", sf_dir)
        .filter(F.col("o_orderstatus") == "O")
        .select("o_custkey")
    )
    # scalar subquery -> tiny agg cross-joined as a broadcast; NOT
    # EXISTS -> left-anti on the order keys
    avg_bal = (
        c.filter(F.col("c_acctbal") > 0.0)
        .agg(
            (F.sum(_cents("c_acctbal")).cast("double") / (F.lit(100.0) * F.count("*"))).alias("__a")
        )
    )
    return (
        c.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("__a"))
        .join(o, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy(F.col("c_nationkey").alias("cntry"))
        .agg(
            F.count("*").alias("numcust"),
            (F.sum(_cents("c_acctbal")).cast("double") / F.lit(100.0)).alias("totacctbal"),
        )
    )


# --- M4 breadth: TPC-H Q7 (bidirectional nation-pair trade volume by year) --
# Dim stack (supplier⋈nation, customer⋈nation) broadcasts; only the
# lineitem⋈orders spine shuffles, so the plan survives a 100× scale-up.

@_q("tpch_q7", """
SELECT supp_nation, cust_nation,
  CAST(EXTRACT(year FROM l.l_shipdate) AS INTEGER) AS l_year,
  CAST(SUM(CAST(round(l_extendedprice*100) AS BIGINT) * (100 - CAST(round(l_discount*100) AS BIGINT))) AS DOUBLE) / 10000.0 AS revenue
FROM supplier s
JOIN lineitem l ON s.s_suppkey = l.l_suppkey
JOIN orders o ON o.o_orderkey = l.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN (SELECT n_nationkey, n_name AS supp_nation FROM nation) n1 ON s.s_nationkey = n1.n_nationkey
JOIN (SELECT n_nationkey, n_name AS cust_nation FROM nation) n2 ON c.c_nationkey = n2.n_nationkey
WHERE supp_nation IN ('NATION_0','NATION_1','NATION_2','NATION_3','NATION_4')
  AND cust_nation IN ('NATION_0','NATION_1','NATION_2','NATION_3','NATION_4')
  AND supp_nation <> cust_nation
  AND l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l.l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
GROUP BY supp_nation, cust_nation, l_year
""")
def q_tpch_q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    nations = ("NATION_0", "NATION_1", "NATION_2", "NATION_3", "NATION_4")
    li = load_table(spark, "lineitem", sf_dir).filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    n = load_table(spark, "nation", sf_dir).filter(F.col("n_name").isin(*nations))
    sn = (
        load_table(spark, "supplier", sf_dir)
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    cn = (
        load_table(spark, "customer", sf_dir)
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .select("c_custkey", F.col("n_name").alias("cust_nation"))
    )
    o = load_table(spark, "orders", sf_dir)
    ep, disc = _cents("l_extendedprice"), _cents("l_discount")
    # aggregate the lineitem-grain stream down to customer grain BEFORE
    # the customer join: the custkey exchange then carries one row per
    # (customer, supp_nation, year) instead of one per lineitem (~40x
    # fewer rows at TPC-H ratios), with map-side partial aggregation on
    # the exact integer cent-sums; the supp_nation != cust_nation filter
    # and the final tiny group-by commute with that pre-aggregation
    pre = (
        li.join(F.broadcast(sn), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .withColumn("l_year", F.year("l_shipdate"))
        .groupBy("o_custkey", "supp_nation", "l_year")
        .agg(F.sum(ep * (F.lit(100) - disc)).alias("rev_c"))
    )
    return (
        pre.join(cn, F.col("o_custkey") == F.col("c_custkey"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg((F.sum("rev_c").cast("double") / F.lit(10000.0)).alias("revenue"))
    )


# --- M4 breadth: TPC-H Q8 (national market share within a region) -----------
# Numerator and denominator are exact BIGINT cent-sums; the single double
# division at the end is bit-identical across engines.

@_q("tpch_q8", """
SELECT o_year,
  CAST(SUM(CASE WHEN supp_nation = 'NATION_7' THEN rev_c ELSE 0 END) AS DOUBLE)
    / CAST(SUM(rev_c) AS DOUBLE) AS mkt_share
FROM (
  SELECT CAST(EXTRACT(year FROM o.o_orderdate) AS INTEGER) AS o_year,
         CAST(round(l_extendedprice*100) AS BIGINT) * (100 - CAST(round(l_discount*100) AS BIGINT)) AS rev_c,
         n2.n_name AS supp_nation
  FROM part p
  JOIN lineitem l ON p.p_partkey = l.l_partkey
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN nation n1 ON c.c_nationkey = n1.n_nationkey
  JOIN region r ON n1.n_regionkey = r.r_regionkey
  JOIN nation n2 ON s.s_nationkey = n2.n_nationkey
  WHERE r.r_name = 'EUROPE'
    AND o.o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
    AND o.o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
    AND p.p_type = 'ECONOMY'
) GROUP BY o_year
""")
def q_tpch_q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, "part", sf_dir).filter(F.col("p_type") == "ECONOMY")
    li = load_table(spark, "lineitem", sf_dir)
    o = load_table(spark, "orders", sf_dir).filter(
        (F.col("o_orderdate") >= F.lit("1995-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    )
    n = load_table(spark, "nation", sf_dir)
    r = load_table(spark, "region", sf_dir).filter(F.col("r_name") == "EUROPE")
    # customers restricted to the region via the broadcast nation⋈region stack
    cn = (
        load_table(spark, "customer", sf_dir)
        .join(
            F.broadcast(
                n.join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
            ),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .select("c_custkey")
    )
    sn = (
        load_table(spark, "supplier", sf_dir)
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    ep, disc = _cents("l_extendedprice"), _cents("l_discount")
    rev = (ep * (F.lit(100) - disc)).alias("rev_c")
    target = F.col("supp_nation") == "NATION_7"
    return (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(sn), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cn, F.col("o_custkey") == F.col("c_custkey"))
        .select(F.year("o_orderdate").alias("o_year"), rev, "supp_nation")
        .groupBy("o_year")
        .agg(
            (
                F.sum(F.when(target, F.col("rev_c")).otherwise(F.lit(0))).cast("double")
                / F.sum("rev_c").cast("double")
            ).alias("mkt_share")
        )
    )


# --- M4 breadth: TPC-H Q13 (order-count distribution; outer join + 2 aggs) --
# The groupBy(c_custkey) after the join reuses the join's hash
# partitioning (no extra exchange); only the tiny c_count histogram
# reshuffles.

@_q("tpch_q13", """
SELECT c_count, COUNT(*) AS custdist
FROM (
  SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
  FROM customer c
  LEFT OUTER JOIN orders o
    ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '1-URGENT'
  GROUP BY c.c_custkey
) GROUP BY c_count
""")
def q_tpch_q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, "customer", sf_dir)
    o = load_table(spark, "orders", sf_dir).filter(
        F.col("o_orderpriority") != "1-URGENT"
    )
    return (
        c.join(o, F.col("c_custkey") == F.col("o_custkey"), "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
    )


# --- M4 breadth: TPC-H Q15 (top supplier by quarter revenue; agg max-join) --
# The scalar max comes back as a broadcast 1-row join, not a
# single-partition window — the revenue aggregate never leaves its
# hash-partitioned layout.

@_q("tpch_q15", """
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         SUM(CAST(round(l_extendedprice*100) AS BIGINT) * (100 - CAST(round(l_discount*100) AS BIGINT))) AS total_c
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, CAST(total_c AS DOUBLE) / 10000.0 AS total_revenue
FROM supplier JOIN revenue ON s_suppkey = supplier_no
WHERE total_c = (SELECT MAX(total_c) FROM revenue)
""")
def q_tpch_q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, "lineitem", sf_dir).filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01 00:00:00").cast("timestamp"))
    )
    ep, disc = _cents("l_extendedprice"), _cents("l_discount")
    rev = (
        li.groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(F.sum(ep * (F.lit(100) - disc)).alias("total_c"))
    )
    mx = rev.agg(F.max("total_c").alias("__mx"))
    s = load_table(spark, "supplier", sf_dir)
    top = rev.join(F.broadcast(mx), F.col("total_c") == F.col("__mx"))
    return (
        s.join(F.broadcast(top), F.col("s_suppkey") == F.col("supplier_no"))
        .select(
            "s_suppkey",
            "s_name",
            (F.col("total_c").cast("double") / F.lit(10000.0)).alias("total_revenue"),
        )
    )


# --- M4 breadth: TPC-H Q17 (small-quantity revenue; correlated per-part avg) -
# The correlated AVG becomes a per-part aggregate joined back; the
# predicate qty < 0.2*avg is rewritten integer-exact as
# qc*5*cnt < sum_qc so both engines agree at the boundary.

@_q("tpch_q17", """
WITH pb AS (SELECT p_partkey FROM part WHERE p_brand = 'Brand#7'),
lb AS (
  SELECT l_partkey,
         CAST(round(l_quantity*100) AS BIGINT) AS qc,
         CAST(round(l_extendedprice*100) AS BIGINT) AS ec
  FROM lineitem JOIN pb ON l_partkey = p_partkey
),
pa AS (SELECT l_partkey, SUM(qc) AS sq, COUNT(*) AS cnt FROM lb GROUP BY l_partkey)
SELECT CAST(SUM(ec) AS DOUBLE) / (100.0 * 7.0) AS avg_yearly
FROM lb JOIN pa USING (l_partkey)
WHERE qc * 5 * cnt < sq
""")
def q_tpch_q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    pb = (
        load_table(spark, "part", sf_dir)
        .filter(F.col("p_brand") == "Brand#7")
        .select("p_partkey")
    )
    li = load_table(spark, "lineitem", sf_dir)
    lb = (
        li.join(F.broadcast(pb), F.col("l_partkey") == F.col("p_partkey"))
        .select(
            "l_partkey",
            _cents("l_quantity").alias("qc"),
            _cents("l_extendedprice").alias("ec"),
        )
    )
    pa = lb.groupBy("l_partkey").agg(
        F.sum("qc").alias("sq"), F.count("*").alias("cnt")
    )
    return (
        lb.join(pa, "l_partkey")
        .filter(F.col("qc") * F.lit(5) * F.col("cnt") < F.col("sq"))
        .agg(
            (F.sum("ec").cast("double") / F.lit(100.0 * 7.0)).alias("avg_yearly")
        )
    )


# --- M4 breadth: TPC-H Q2 shape (correlated-min subquery over suppliers) -----
# Adapted: no partsupp table in this corpus, so the part-supplier cost
# relation is derived from lineitem (min observed price per part+supplier);
# the Q2 shape — "supplier achieving the minimum cost for each qualifying
# part" — is intact. Correlated MIN becomes a partition window over the
# aggregated (small) cost relation, and every dim join broadcasts.

@_q("tpch_q2", """
WITH pp AS (
  SELECT p_partkey, p_type FROM part WHERE p_size = 15 AND p_type = 'SMALL'
), ps AS (
  SELECT l_partkey, p_type, l_suppkey,
         MIN(CAST(round(l_extendedprice*100) AS BIGINT)) AS cost
  FROM lineitem JOIN pp ON p_partkey = l_partkey
  GROUP BY l_partkey, p_type, l_suppkey
), r AS (
  SELECT *, MIN(cost) OVER (PARTITION BY l_partkey) AS best FROM ps
)
SELECT s_acctbal, s_name, n_name, l_partkey AS p_partkey, p_type,
       CAST(cost AS DOUBLE)/100.0 AS supplycost
FROM r
JOIN supplier ON s_suppkey = l_suppkey
JOIN nation ON n_nationkey = s_nationkey
WHERE cost = best
ORDER BY s_acctbal DESC, n_name ASC, s_name ASC, p_partkey ASC
LIMIT 100
""")
def q_tpch_q2(spark: SparkSession, sf_dir: str) -> DataFrame:
    # broadcast the pruned part side BEFORE aggregating: the cost
    # relation then only holds qualifying parts, so the window input is
    # tiny. groupBy shuffles on (partkey, suppkey); the window re-keys
    # on partkey alone over the already-reduced aggregate.
    pp = (
        load_table(spark, "part", sf_dir)
        .filter((F.col("p_size") == 15) & (F.col("p_type") == "SMALL"))
        .select("p_partkey", "p_type")
    )
    li = load_table(spark, "lineitem", sf_dir).select(
        "l_partkey", "l_suppkey", _cents("l_extendedprice").alias("__pc")
    )
    ps = (
        li.join(F.broadcast(pp), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("l_partkey", "p_type", "l_suppkey")
        .agg(F.min("__pc").alias("cost"))
    )
    best = ps.withColumn(
        "best", F.min("cost").over(Window.partitionBy("l_partkey"))
    ).filter(F.col("cost") == F.col("best"))
    s = load_table(spark, "supplier", sf_dir)
    n = load_table(spark, "nation", sf_dir)
    return (
        best.join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .select(
            "s_acctbal",
            "s_name",
            "n_name",
            F.col("l_partkey").alias("p_partkey"),
            "p_type",
            (F.col("cost").cast("double") / F.lit(100.0)).alias("supplycost"),
        )
        .orderBy(
            F.col("s_acctbal").desc(),
            F.col("n_name").asc(),
            F.col("s_name").asc(),
            F.col("p_partkey").asc(),
        )
        .limit(100)
    )


# --- M4 breadth: TPC-H Q9 shape (product-type profit by nation and year) -----
# Adapted: supplycost := p_retailprice (no partsupp), so
# profit = extprice*(1-discount) - retailprice*quantity, computed in
# 1e-4-dollar integer units for a deterministic cross-engine sum.

@_q("tpch_q9", """
SELECT n_name AS nation,
       CAST(EXTRACT(year FROM l_shipdate) AS INTEGER) AS o_year,
       CAST(CAST(SUM(
         CAST(round(l_extendedprice*100) AS BIGINT) * (100 - CAST(round(l_discount*100) AS BIGINT))
         - CAST(round(p_retailprice*100) AS BIGINT) * CAST(round(l_quantity*100) AS BIGINT)
       ) AS BIGINT) AS DOUBLE) / 10000.0 AS sum_profit
FROM lineitem
JOIN part ON p_partkey = l_partkey
JOIN supplier ON s_suppkey = l_suppkey
JOIN nation ON n_nationkey = s_nationkey
WHERE p_name LIKE '%red%'
GROUP BY 1, 2
""")
def q_tpch_q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    # name-filtered part and supplier join the lineitem spine without
    # hints — at 100 TB neither is reliably broadcastable, so AQE picks
    # the strategy per stats; only the 25-row nation dim is pinned
    # broadcast. The profit expression folds to one codegen'd projection.
    p = (
        load_table(spark, "part", sf_dir)
        .filter(F.col("p_name").like("%red%"))
        .select("p_partkey", _cents("p_retailprice").alias("__rc"))
    )
    s = load_table(spark, "supplier", sf_dir).select("s_suppkey", "s_nationkey")
    n = load_table(spark, "nation", sf_dir)
    li = load_table(spark, "lineitem", sf_dir)
    profit = (
        _cents("l_extendedprice") * (F.lit(100) - _cents("l_discount"))
        - F.col("__rc") * _cents("l_quantity")
    )
    return (
        li.join(p, F.col("l_partkey") == F.col("p_partkey"))
        .join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .select(
            F.col("n_name").alias("nation"),
            F.year("l_shipdate").alias("o_year"),
            profit.alias("__pe4"),
        )
        .groupBy("nation", "o_year")
        .agg((F.sum("__pe4").cast("double") / F.lit(10000.0)).alias("sum_profit"))
    )


# --- M4 breadth: TPC-H Q11 shape (scalar-subquery share threshold) -----------
# Adapted: part value := lineitem revenue from suppliers of the chosen
# nations (no partsupp). The threshold compare stays in integer cents
# (value*1000 > total) — no float in the predicate on either engine.

@_q("tpch_q11", """
WITH val AS (
  SELECT l_partkey AS ps_partkey,
         CAST(SUM(CAST(round(l_extendedprice*100) AS BIGINT)) AS BIGINT) AS value_c
  FROM lineitem
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN nation ON n_nationkey = s_nationkey
  WHERE n_name IN ('NATION_0', 'NATION_1')
  GROUP BY l_partkey
), tot AS (
  SELECT CAST(SUM(value_c) AS BIGINT) AS t FROM val
)
SELECT ps_partkey, CAST(value_c AS DOUBLE)/100.0 AS part_value
FROM val, tot
WHERE value_c * 1000 > t
""")
def q_tpch_q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = load_table(spark, "nation", sf_dir).filter(
        F.col("n_name").isin("NATION_0", "NATION_1")
    )
    s = (
        load_table(spark, "supplier", sf_dir)
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey")
    )
    li = load_table(spark, "lineitem", sf_dir).select(
        "l_partkey", "l_suppkey", _cents("l_extendedprice").alias("__ec")
    )
    val = (
        li.join(s, F.col("l_suppkey") == F.col("s_suppkey"), "left_semi")
        .groupBy(F.col("l_partkey").alias("ps_partkey"))
        .agg(F.sum("__ec").alias("value_c"))
    )
    # the grand total is a one-row aggregate — broadcast cross join, the
    # standard Spark shape for a scalar subquery
    tot = val.agg(F.sum("value_c").alias("__t"))
    return (
        val.crossJoin(F.broadcast(tot))
        .filter(F.col("value_c") * F.lit(1000) > F.col("__t"))
        .select(
            "ps_partkey",
            (F.col("value_c").cast("double") / F.lit(100.0)).alias("part_value"),
        )
    )


# --- M4 breadth: TPC-H Q16 shape (anti-join + count-distinct suppliers) ------
# Adapted: the part-supplier relation is lineitem; "complaint" suppliers
# are those with negative account balance (no s_comment in this corpus).

@_q("tpch_q16", """
SELECT p_brand, p_type, p_size,
       CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
FROM lineitem
JOIN part ON p_partkey = l_partkey
WHERE p_brand <> 'Brand#1' AND p_type <> 'PROMO'
  AND p_size IN (1, 4, 7, 10, 13, 16, 19, 23)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0.0)
GROUP BY p_brand, p_type, p_size
""")
def q_tpch_q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = (
        load_table(spark, "part", sf_dir)
        .filter(
            (F.col("p_brand") != "Brand#1")
            & (F.col("p_type") != "PROMO")
            & F.col("p_size").isin(1, 4, 7, 10, 13, 16, 19, 23)
        )
        .select("p_partkey", "p_brand", "p_type", "p_size")
    )
    bad = (
        load_table(spark, "supplier", sf_dir)
        .filter(F.col("s_acctbal") < 0.0)
        .select("s_suppkey")
    )
    li = load_table(spark, "lineitem", sf_dir).select("l_partkey", "l_suppkey")
    return (
        li.join(F.broadcast(bad), F.col("l_suppkey") == F.col("s_suppkey"), "left_anti")
        .join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


# --- M4 breadth: TPC-H Q19 shape (disjunction of conjunctive predicates) -----
# Adapted to this corpus's brands/sizes (no p_container/l_shipmode). The
# point of the shape: Catalyst extracts the common implied bounds
# (size <= 15, quantity <= 30) from the OR and pushes them into BOTH
# parquet scans; the residual disjunction evaluates post-join in one
# codegen'd filter. The explicit per-side pre-filters below make the
# pushdown deterministic rather than optimizer-dependent.

@_q("tpch_q19", """
SELECT CAST(CAST(SUM(
  CAST(round(l_extendedprice*100) AS BIGINT) * (100 - CAST(round(l_discount*100) AS BIGINT))
) AS BIGINT) AS DOUBLE) / 10000.0 AS revenue
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5  AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10 AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#15' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 20 AND 30)
""")
def q_tpch_q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = (
        load_table(spark, "part", sf_dir)
        .filter(
            F.col("p_brand").isin("Brand#12", "Brand#23", "Brand#15")
            & F.col("p_size").between(1, 15)
        )
        .select("p_partkey", "p_brand", "p_size")
    )
    li = (
        load_table(spark, "lineitem", sf_dir)
        .filter(F.col("l_quantity").between(1, 30))
        .select("l_partkey", "l_quantity", "l_extendedprice", "l_discount")
    )
    arm = lambda brand, szhi, qlo, qhi: (  # noqa: E731
        (F.col("p_brand") == brand)
        & F.col("p_size").between(1, szhi)
        & F.col("l_quantity").between(qlo, qhi)
    )
    return (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .filter(
            arm("Brand#12", 5, 1, 11)
            | arm("Brand#23", 10, 10, 20)
            | arm("Brand#15", 15, 20, 30)
        )
        .agg(
            (
                (F.sum(_cents("l_extendedprice") * (F.lit(100) - _cents("l_discount"))))
                .cast("double")
                / F.lit(10000.0)
            ).alias("revenue")
        )
    )


# --- M4 breadth: TPC-H Q20 shape (aggregate-derived nested semi-join) --------
# Adapted: "excess availability" := supplier shipped more than half of a
# part's total 1995 volume (no partsupp.ps_availqty). The chain
# lineitem-agg → share filter → part name filter → supplier semi-join
# mirrors Q20's nested IN subqueries.

@_q("tpch_q20", """
WITH shipped AS (
  SELECT l_partkey, l_suppkey,
         CAST(SUM(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS qty
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1996-01-01 00:00:00'
  GROUP BY l_partkey, l_suppkey
), tot AS (
  SELECT l_partkey AS pk, CAST(SUM(qty) AS BIGINT) AS total
  FROM shipped GROUP BY l_partkey
)
SELECT s_name, s_acctbal
FROM supplier
WHERE s_suppkey IN (
  SELECT l_suppkey
  FROM shipped
  JOIN tot ON pk = l_partkey
  JOIN part ON p_partkey = l_partkey
  WHERE p_name LIKE 'small%' AND qty * 2 > total
)
""")
def q_tpch_q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, "lineitem", sf_dir).filter(
        (F.col("l_shipdate") >= F.lit("1995-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-01-01 00:00:00").cast("timestamp"))
    )
    shipped = li.groupBy("l_partkey", "l_suppkey").agg(
        F.sum(F.round("l_quantity").cast("long")).alias("qty")
    )
    # second-level agg and the join both key on l_partkey — the exchange
    # introduced for `shipped` is reused, no extra shuffle
    tot = shipped.groupBy("l_partkey").agg(F.sum("qty").alias("total")).withColumnRenamed("l_partkey", "pk")
    pn = (
        load_table(spark, "part", sf_dir)
        .filter(F.col("p_name").like("small%"))
        .select("p_partkey")
    )
    cand = (
        shipped.join(tot, F.col("l_partkey") == F.col("pk"))
        .join(F.broadcast(pn), F.col("l_partkey") == F.col("p_partkey"))
        .filter(F.col("qty") * F.lit(2) > F.col("total"))
        .select("l_suppkey")
    )
    s = load_table(spark, "supplier", sf_dir)
    return s.join(
        F.broadcast(cand), F.col("s_suppkey") == F.col("l_suppkey"), "left_semi"
    ).select("s_name", "s_acctbal")


# --- M4 breadth: TPC-H Q21 shape (double-correlated EXISTS / NOT EXISTS) -----
# Adapted: "late" := shipped more than 90 days after the order date (no
# l_commitdate/l_receiptdate). Q21's two correlated subqueries (another
# supplier EXISTS on the order; another LATE supplier NOT EXISTS) are
# re-expressed as one per-order aggregate — n_suppliers > 1 and
# n_late_suppliers = 1 — which is the join-free equivalent and costs a
# single extra keyed aggregation instead of two more lineitem joins.

@_q("tpch_q21", """
WITH lf AS (
  SELECT l_orderkey, l_suppkey,
         CASE WHEN l_shipdate > o_orderdate + INTERVAL 90 DAY THEN 1 ELSE 0 END AS late
  FROM lineitem JOIN orders ON o_orderkey = l_orderkey
  WHERE o_orderstatus = 'F'
), per_order AS (
  SELECT l_orderkey AS ok,
         COUNT(DISTINCT l_suppkey) AS n_supp,
         COUNT(DISTINCT CASE WHEN late = 1 THEN l_suppkey END) AS n_late
  FROM lf GROUP BY l_orderkey
)
SELECT s_name, CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS numwait
FROM lf
JOIN per_order ON ok = l_orderkey
JOIN supplier ON s_suppkey = l_suppkey
WHERE late = 1 AND n_supp > 1 AND n_late = 1
GROUP BY s_name
ORDER BY numwait DESC, s_name ASC
LIMIT 100
""")
def q_tpch_q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = (
        load_table(spark, "orders", sf_dir)
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey", "o_orderdate")
    )
    li = load_table(spark, "lineitem", sf_dir).select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    lf = li.join(o, F.col("l_orderkey") == F.col("o_orderkey")).select(
        "l_orderkey",
        "l_suppkey",
        F.when(
            F.col("l_shipdate") > F.date_add(F.col("o_orderdate"), 90), F.lit(1)
        )
        .otherwise(F.lit(0))
        .alias("late"),
    )
    # one orderkey exchange carries the whole correlated-subquery
    # stage: dedup to (order, supplier) first (avoids Spark's
    # Expand-based multi-distinct, which triples the shuffle volume);
    # with lf pre-partitioned by l_orderkey the dedup aggregation is
    # partition-local and the per-order totals come from an unordered
    # window over the SAME partitioning instead of a second
    # aggregation + self-join (3 exchanges -> 1; order groups are
    # bounded by suppliers-per-order, so the window buffers O(1) rows)
    per_supp = (
        lf.repartition("l_orderkey")
        .groupBy("l_orderkey", "l_suppkey")
        .agg(F.max("late").alias("late"))
    )
    w_ord = Window.partitionBy("l_orderkey")
    ps = per_supp.select(
        "l_orderkey",
        "l_suppkey",
        "late",
        F.count("*").over(w_ord).alias("n_supp"),
        F.sum("late").over(w_ord).alias("n_late"),
    )
    s = load_table(spark, "supplier", sf_dir).select("s_suppkey", "s_name")
    return (
        ps.filter(
            (F.col("late") == 1)
            & (F.col("n_supp") > 1)
            & (F.col("n_late") == 1)
        )
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.col("numwait").desc(), F.col("s_name").asc())
        .limit(100)
    )


# --- W breadth: ntile / rank / percent_rank / cume_dist over a total order ---

@_q("window_rank_customers", """
SELECT c_custkey, c_nationkey,
  ntile(4)       OVER (PARTITION BY c_nationkey ORDER BY c_acctbal ASC, c_custkey ASC) AS quartile,
  rank()         OVER (PARTITION BY c_nationkey ORDER BY c_acctbal ASC, c_custkey ASC) AS rnk,
  percent_rank() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal ASC, c_custkey ASC) AS pct_rank,
  cume_dist()    OVER (PARTITION BY c_nationkey ORDER BY c_acctbal ASC, c_custkey ASC) AS cdist
FROM customer
""")
def q_window_rank_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, "customer", sf_dir)
    w = Window.partitionBy("c_nationkey").orderBy(
        F.col("c_acctbal").asc(), F.col("c_custkey").asc()
    )
    return c.select(
        "c_custkey",
        "c_nationkey",
        F.ntile(4).over(w).cast("long").alias("quartile"),
        F.rank().over(w).cast("long").alias("rnk"),
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cdist"),
    )


# --- set operations: INTERSECT / EXCEPT (distinct set semantics) -------------

@_q("set_ops_customers", """
SELECT c_custkey, 'rich_with_orders' AS tag FROM (
  SELECT c_custkey FROM customer WHERE c_acctbal > 5000
  INTERSECT
  SELECT o_custkey AS c_custkey FROM orders
)
UNION ALL
SELECT c_custkey, 'rich_no_orders' AS tag FROM (
  SELECT c_custkey FROM customer WHERE c_acctbal > 5000
  EXCEPT
  SELECT o_custkey AS c_custkey FROM orders
)
""")
def q_set_ops_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    rich = (
        load_table(spark, "customer", sf_dir)
        .filter(F.col("c_acctbal") > 5000)
        .select("c_custkey")
    )
    buyers = load_table(spark, "orders", sf_dir).select(
        F.col("o_custkey").alias("c_custkey")
    )
    both = rich.intersect(buyers).withColumn("tag", F.lit("rich_with_orders"))
    only = rich.subtract(buyers).withColumn("tag", F.lit("rich_no_orders"))
    return both.unionByName(only)


# --- R: pivot (long→wide — the inverse of R1's unpivot) ----------------------

_EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]

@_q("pivot_event_values", """
SELECT user_id,
  CAST(SUM(CASE WHEN event_type = 'click'    THEN CAST(round(value*100) AS BIGINT) END) AS DOUBLE) / 100.0 AS click,
  CAST(SUM(CASE WHEN event_type = 'error'    THEN CAST(round(value*100) AS BIGINT) END) AS DOUBLE) / 100.0 AS error,
  CAST(SUM(CASE WHEN event_type = 'purchase' THEN CAST(round(value*100) AS BIGINT) END) AS DOUBLE) / 100.0 AS purchase,
  CAST(SUM(CASE WHEN event_type = 'signup'   THEN CAST(round(value*100) AS BIGINT) END) AS DOUBLE) / 100.0 AS signup,
  CAST(SUM(CASE WHEN event_type = 'view'     THEN CAST(round(value*100) AS BIGINT) END) AS DOUBLE) / 100.0 AS view
FROM events GROUP BY user_id
""")
def q_pivot_event_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir)
    # single-shuffle conditional-agg rewrite: stock groupBy().pivot()
    # would plan a second exchange for the pivotfirst collapse
    wide = analytics.pivot_wide(
        ev, "user_id", "event_type", _EVENT_TYPES, _cents("value")
    )
    return wide.select(
        "user_id",
        *[(F.col(t).cast("double") / F.lit(100.0)).alias(t) for t in _EVENT_TYPES],
    )


# --- F: calendar extraction (year/quarter/month breakdown) -------------------

@_q("revenue_by_quarter", """
SELECT EXTRACT(year FROM o_orderdate) AS yr,
       EXTRACT(quarter FROM o_orderdate) AS qtr,
       CAST(SUM(CAST(round(o_totalprice*100) AS BIGINT)) AS DOUBLE) / 100.0 AS total_revenue,
       COUNT(*) AS n_orders
FROM orders GROUP BY 1, 2
""")
def q_revenue_by_quarter(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, "orders", sf_dir)
    return (
        o.groupBy(
            F.year("o_orderdate").cast("long").alias("yr"),
            F.quarter("o_orderdate").cast("long").alias("qtr"),
        )
        .agg(
            (F.sum(_cents("o_totalprice")).cast("double") / F.lit(100.0)).alias("total_revenue"),
            F.count("*").alias("n_orders"),
        )
    )


# --- F: string split + multi-agg (first token of p_type as a class) ----------

@_q("part_class_stats", """
SELECT split_part(p_type, ' ', 1) AS class,
       COUNT(*) AS n_parts,
       CAST(SUM(CAST(round(p_retailprice*100) AS BIGINT)) AS DOUBLE) / (100.0 * COUNT(p_retailprice)) AS avg_price,
       MIN(p_size) AS min_size,
       MAX(p_size) AS max_size
FROM part GROUP BY 1
""")
def q_part_class_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    pt = load_table(spark, "part", sf_dir)
    return (
        pt.groupBy(
            F.split_part(F.col("p_type"), F.lit(" "), F.lit(1)).alias("class")
        )
        .agg(
            F.count("*").alias("n_parts"),
            (
                F.sum(_cents("p_retailprice")).cast("double")
                / (F.lit(100.0) * F.count("p_retailprice"))
            ).alias("avg_price"),
            F.min("p_size").alias("min_size"),
            F.max("p_size").alias("max_size"),
        )
    )


# --- A breadth: argmax aggregate (max_by with a unique deterministic key) ----

@_q("argmax_order_per_customer", """
SELECT o_custkey,
  arg_max(o_orderkey, CAST(round(o_totalprice*100) AS BIGINT)*100000 + o_orderkey) AS best_orderkey,
  CAST(MAX(CAST(round(o_totalprice*100) AS BIGINT)) AS DOUBLE) / 100.0 AS max_totalprice
FROM orders GROUP BY o_custkey
""")
def q_argmax_order_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, "orders", sf_dir)
    # price ties broken by orderkey: the ordering key is unique, so
    # arg_max/max_by agree across engines
    ordkey = _cents("o_totalprice") * F.lit(100000) + F.col("o_orderkey")
    return o.groupBy("o_custkey").agg(
        F.max_by("o_orderkey", ordkey).alias("best_orderkey"),
        (F.max(_cents("o_totalprice")).cast("double") / F.lit(100.0)).alias("max_totalprice"),
    )


# --- array breadth: posexplode + per-position aggregate (embedding centroid) --

@_q("embedding_centroids", """
SELECT label, pos,
  CAST(SUM(CAST(round(CAST(v AS DOUBLE)*1000000) AS BIGINT)) AS DOUBLE) / (1000000.0 * COUNT(v)) AS avg_v
FROM (
  SELECT label, unnest(embedding) AS v, generate_subscripts(embedding, 1) - 1 AS pos
  FROM embeddings
) GROUP BY label, pos
""")
def q_embedding_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, "embeddings", sf_dir)
    micros = F.round(F.col("v").cast("double") * F.lit(1000000.0)).cast("long")
    return (
        emb.select("label", F.posexplode("embedding").alias("pos", "v"))
        .groupBy("label", F.col("pos").cast("long").alias("pos"))
        .agg(
            (F.sum(micros).cast("double") / (F.lit(1000000.0) * F.count("v"))).alias("avg_v")
        )
    )


# --- text breadth: corpus vocabulary (top-k tokens by frequency) -------------

@_q("vocab_topk", f"""
WITH per_doc AS (
  SELECT doc_id, token, COUNT(*) AS tf
  FROM (SELECT doc_id, unnest({_TOKS}) AS token FROM documents)
  WHERE token <> ''
  GROUP BY doc_id, token
)
SELECT token, CAST(SUM(tf) AS BIGINT) AS term_freq, COUNT(*) AS doc_freq
FROM per_doc
GROUP BY token
ORDER BY term_freq DESC, token ASC
LIMIT 50
""")
def q_vocab_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    return (
        text.vocabulary(docs, "doc_id", "text")
        .orderBy(F.col("term_freq").desc(), F.col("token").asc())
        .limit(50)
    )


# --- text breadth: tf-idf top terms per document -----------------------------
# Rational idf ((n+1)/(df+1), no ln) so the score double is one exact-int
# multiply + one division in both engines — ln() may differ in the last
# ulp between libm implementations and break the value hash.

@_q("tfidf_top_terms", f"""
WITH tf AS (
  SELECT doc_id, token, COUNT(*) AS tf
  FROM (SELECT doc_id, unnest({_TOKS}) AS token FROM documents)
  WHERE token <> ''
  GROUP BY doc_id, token
),
dfreq AS (SELECT token, COUNT(*) AS df FROM tf GROUP BY token),
n AS (SELECT COUNT(*) AS n_docs FROM documents)
SELECT doc_id, token, tf, df, score FROM (
  SELECT tf.doc_id, tf.token, tf.tf, dfreq.df,
         CAST(tf.tf * (n.n_docs + 1) AS DOUBLE) / (dfreq.df + 1) AS score,
         row_number() OVER (
           PARTITION BY tf.doc_id
           ORDER BY CAST(tf.tf * (n.n_docs + 1) AS DOUBLE) / (dfreq.df + 1) DESC,
                    tf.token ASC
         ) AS rn
  FROM tf JOIN dfreq ON tf.token = dfreq.token CROSS JOIN n
) WHERE rn <= 3
""")
def q_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)

    def rational(tf, dfreq, n):
        return (tf * (n + F.lit(1))).cast("double") / (dfreq + F.lit(1))

    scored = text.tf_idf(docs, "doc_id", "text", score=rational)
    w = Window.partitionBy("doc_id").orderBy(
        F.col("score").desc(), F.col("token").asc()
    )
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= 3)
        .select("doc_id", "token", "tf", "df", "score")
    )


# --- text breadth: end-to-end corpus cleaning pipeline -----------------------
# Language gate → quality gate → token bounds → fingerprint dedup, the
# whole training-data cleaning chain as ONE map stage + one shuffle.

def _clean_corpus_oracle() -> str:
    ratios = {
        lang: (
            f"CASE WHEN len(toks) > 0 THEN CAST(len(list_filter(toks, w -> list_contains("
            f"[{', '.join(repr(w) for w in text.STOPWORDS[lang])}], w))) AS DOUBLE) / len(toks) ELSE 0.0 END"
        )
        for lang in text.STOPWORDS
    }
    langs = list(text.STOPWORDS)
    ratios_sql = ", ".join(f"{v} AS r_{k}" for k, v in ratios.items())
    best = "greatest(" + ", ".join(f"r_{k}" for k in langs) + ")"
    lang_case = "'und'"
    for lang in reversed(langs):
        lang_case = f"CASE WHEN {best} >= 0.03 AND r_{lang} = {best} THEN '{lang}' ELSE {lang_case} END"
    return f"""
WITH t AS (SELECT doc_id, text, {_TOKS} AS toks FROM documents),
r AS (
  SELECT doc_id, len(toks) AS n, {ratios_sql},
    CASE WHEN length(text) > 0
         THEN CAST(length(text) - length(regexp_replace(text, '[^a-zA-Z0-9\\s]', '', 'g')) AS DOUBLE) / length(text)
         ELSE 0.0 END AS p_ratio,
    CASE WHEN len(toks) > 0
         THEN CAST(list_sum(list_transform(toks, w -> CAST(length(w) AS BIGINT))) AS DOUBLE) / len(toks)
         ELSE 0.0 END AS mwl,
    md5({_NORM}) AS fp
  FROM t
),
s AS (
  SELECT doc_id, n, fp,
    round((
      least(CAST(n AS DOUBLE) / 50.0, 1.0)
      + least(r_en * 10.0, 1.0)
      + (1.0 - least(p_ratio * 5.0, 1.0))
      + CASE WHEN mwl >= 2.0 AND mwl <= 12.0 THEN 1.0 ELSE 0.0 END
    ) / 4.0, 6) AS quality,
    {lang_case} AS lang_detected
  FROM r
),
k AS (
  SELECT * FROM s
  WHERE lang_detected = 'en' AND quality >= 0.5 AND n BETWEEN 5 AND 1000
)
SELECT doc_id, n_tokens, quality FROM (
  SELECT doc_id, n AS n_tokens, quality,
         row_number() OVER (PARTITION BY fp ORDER BY doc_id ASC) AS rn
  FROM k
) WHERE rn = 1
"""


@_q("corpus_clean", _clean_corpus_oracle())
def q_corpus_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    return text.clean_corpus(
        docs, "doc_id", "text", lang="en",
        min_quality=0.5, min_tokens=5, max_tokens=1000,
    ).select(
        "doc_id", "n_tokens", F.round("quality", 6).alias("quality")
    )


# Composed flagship: the end-to-end training-corpus pipeline —
# clean (language/quality/length gates + fingerprint dedup) →
# deterministic split → per-split manifest digest. One registered
# query proves the stages COMPOSE with oracle-checked semantics, not
# just pass in isolation.

@_q("corpus_pipeline_digest", f"""
WITH kept AS ({{clean}})
SELECT CASE WHEN CAST(CONCAT('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 10000 < 8000
            THEN 'train' ELSE 'test' END AS split,
       COUNT(*) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS sum_tokens,
       bit_xor(doc_id) AS id_xor
FROM kept
GROUP BY 1
""".format(clean=_clean_corpus_oracle()))
def q_corpus_pipeline_digest(spark: SparkSession, sf_dir: str) -> DataFrame:
    from harmony_energy_data_pipeline_spark.operators.sampling import (
        deterministic_split,
    )

    docs = load_table(spark, "documents", sf_dir)
    kept = text.clean_corpus(
        docs, "doc_id", "text", lang="en",
        min_quality=0.5, min_tokens=5, max_tokens=1000,
    )
    split = deterministic_split(kept, "doc_id", train_frac=0.8)
    return split.groupBy("split").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("sum_tokens"),
        F.expr("bit_xor(doc_id)").alias("id_xor"),
    )


# --- embedding breadth: nearest-centroid assignment (Lloyd E-step) -----------
# Confusion matrix of true label × nearest per-label centroid; distances
# are exact integer sums over micro-quantized vectors (see
# similarity.assign_nearest_centroid determinism contract).

@_q("nearest_centroid_confusion", """
WITH pe AS (
  SELECT vec_id, label, generate_subscripts(embedding, 1) - 1 AS pos,
         CAST(round(CAST(unnest(embedding) AS DOUBLE) * 1000000) AS BIGINT) AS vm
  FROM embeddings
),
cent AS (
  SELECT label AS assigned_label, pos,
         CAST(round(CAST(SUM(vm) AS DOUBLE) / COUNT(*)) AS BIGINT) AS cm
  FROM pe GROUP BY label, pos
),
dist AS (
  SELECT pe.vec_id, pe.label, cent.assigned_label,
         SUM((pe.vm - cent.cm) * (pe.vm - cent.cm)) AS d2
  FROM pe JOIN cent ON pe.pos = cent.pos
  GROUP BY pe.vec_id, pe.label, cent.assigned_label
),
best AS (
  SELECT vec_id, label, assigned_label,
         row_number() OVER (PARTITION BY vec_id ORDER BY d2 ASC, assigned_label ASC) AS rn
  FROM dist
)
SELECT label, assigned_label, COUNT(*) AS n_vecs
FROM best WHERE rn = 1
GROUP BY label, assigned_label
""")
def q_nearest_centroid_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, "embeddings", sf_dir)
    assigned = similarity.assign_nearest_centroid(
        emb, id_col="vec_id", vec_col="embedding", label_col="label"
    )
    return assigned.groupBy("label", "assigned_label").agg(
        F.count("*").alias("n_vecs")
    )


# --- embedding breadth: full Lloyd K-means, fixed-point ----------------------
# Iterative clustering with an EXACTLY-unrolled oracle (the PageRank
# discipline applied to Lloyd's algorithm): integer micro-unit vectors,
# deterministic id%k seeding, exact integer E-step distances, one
# rounded division per M-step cell. 2 unrolled rounds.

def _kmeans_round(prev_cent: str, n: int) -> str:
    return f"""
d{n} AS (
  SELECT pe.id, {prev_cent}.cell,
         SUM((pe.vm - {prev_cent}.cm) * (pe.vm - {prev_cent}.cm)) AS d2
  FROM pe JOIN {prev_cent} USING (pos) GROUP BY 1, 2
),
a{n} AS (
  SELECT id, cell FROM (
    SELECT id, cell,
           row_number() OVER (PARTITION BY id ORDER BY d2 ASC, cell ASC) AS rn
    FROM d{n}
  ) WHERE rn = 1
),
c{n} AS (
  SELECT a{n}.cell, pe.pos,
         CAST(round(CAST(SUM(pe.vm) AS DOUBLE) / COUNT(*)) AS BIGINT) AS cm
  FROM pe JOIN a{n} USING (id) GROUP BY 1, 2
)"""


@_q("kmeans_clusters", f"""
WITH pe AS (
  SELECT vec_id AS id, generate_subscripts(embedding, 1) - 1 AS pos,
         CAST(round(CAST(unnest(embedding) AS DOUBLE) * 1000000) AS BIGINT) AS vm
  FROM embeddings
),
c0 AS (
  SELECT id % 8 AS cell, pos,
         CAST(round(CAST(SUM(vm) AS DOUBLE) / COUNT(*)) AS BIGINT) AS cm
  FROM pe GROUP BY 1, 2
),
{_kmeans_round("c0", 1)},
{_kmeans_round("c1", 2)}
SELECT c2.cell, c2.pos, c2.cm, cnt.n_members
FROM c2 JOIN (SELECT cell, COUNT(*) AS n_members FROM a2 GROUP BY cell) cnt
  USING (cell)
""")
def q_kmeans_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, "embeddings", sf_dir)
    # gemm E-step (r12): bit-identical to the expr oracle twin
    # (parity-tested integer arithmetic) but assigns cells in one
    # mapInPandas pass — no ×k broadcast-join fanout, no E-step
    # shuffle, no argmin sort-aggregate per round. Interleaved A/B ×6
    # at sf0.1: 1.60 → 1.24 s median; the docstring's production path
    # for the same reason at scale.
    return similarity.kmeans_fixed_point(
        emb, id_col="vec_id", vec_col="embedding", k=8, n_iter=2,
        assign_mode="gemm",
    )


# --- S4 breadth: SCD2 dimension merge (history-tracking upsert) --------------
# dim = customer snapshot; updates re-segment every 6th customer (every
# 3rd is touched, half are no-ops). Changed keys close their open row
# and append a new version; no-ops pass through.

@_q("scd2_customer_segments", """
WITH dim AS (
  SELECT c_custkey, c_mktsegment,
         TIMESTAMP '1995-01-01 00:00:00' AS valid_from,
         CAST(NULL AS TIMESTAMP) AS valid_to
  FROM customer
),
u AS (
  SELECT c_custkey,
         CASE WHEN c_custkey % 6 = 0 THEN 'MOVED' ELSE c_mktsegment END AS c_mktsegment,
         TIMESTAMP '2000-01-01 00:00:00' AS ts
  FROM customer WHERE c_custkey % 3 = 0
)
SELECT d.c_custkey, d.c_mktsegment, d.valid_from, u.ts AS valid_to
FROM dim d JOIN u ON d.c_custkey = u.c_custkey AND d.c_mktsegment <> u.c_mktsegment
UNION ALL
SELECT d.c_custkey, d.c_mktsegment, d.valid_from, d.valid_to
FROM dim d LEFT JOIN u ON d.c_custkey = u.c_custkey AND d.c_mktsegment <> u.c_mktsegment
WHERE u.c_custkey IS NULL
UNION ALL
SELECT u.c_custkey, u.c_mktsegment, u.ts AS valid_from, CAST(NULL AS TIMESTAMP) AS valid_to
FROM u JOIN dim d ON d.c_custkey = u.c_custkey AND d.c_mktsegment <> u.c_mktsegment
""")
def q_scd2_customer_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    from harmony_energy_data_pipeline_spark.sinks.upsert import scd2_merge

    c = load_table(spark, "customer", sf_dir)
    dim = c.select(
        "c_custkey",
        "c_mktsegment",
        F.lit("1995-01-01 00:00:00").cast("timestamp").alias("valid_from"),
        F.lit(None).cast("timestamp").alias("valid_to"),
    )
    updates = c.filter(F.col("c_custkey") % 3 == 0).select(
        "c_custkey",
        F.when(F.col("c_custkey") % 6 == 0, F.lit("MOVED"))
        .otherwise(F.col("c_mktsegment"))
        .alias("c_mktsegment"),
        F.lit("2000-01-01 00:00:00").cast("timestamp").alias("effective_ts"),
    )
    return scd2_merge(dim, updates, "c_custkey", ["c_mktsegment"])


# --- A breadth: numeric moments + correlation from exact integer sums --------
# variance/corr are derived from BIGINT sums (sx, sxx, sxy, ...) with an
# IDENTICAL double op-sequence in both engines; sqrt is IEEE
# correctly-rounded (unlike ln), so corr is cross-engine bit-exact.

@_q("numeric_profile_events", """
WITH s AS (
  SELECT event_type, COUNT(*) AS n,
    SUM(CAST(round(value*100) AS BIGINT)) AS sx,
    SUM(CAST(round(value*100) AS BIGINT) * CAST(round(value*100) AS BIGINT)) AS sxx,
    SUM(CAST(EXTRACT(hour FROM ts) AS BIGINT)) AS sy,
    SUM(CAST(EXTRACT(hour FROM ts) AS BIGINT) * CAST(EXTRACT(hour FROM ts) AS BIGINT)) AS syy,
    SUM(CAST(round(value*100) AS BIGINT) * CAST(EXTRACT(hour FROM ts) AS BIGINT)) AS sxy
  FROM events GROUP BY event_type
)
SELECT event_type, n,
  (CAST(sx AS DOUBLE) / n) / 100.0 AS mean_value,
  (CAST(sxx AS DOUBLE) / n - (CAST(sx AS DOUBLE) / n) * (CAST(sx AS DOUBLE) / n)) / 10000.0 AS var_pop_value,
  CAST(n * sxy - sx * sy AS DOUBLE)
    / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE)) * sqrt(CAST(n * syy - sy * sy AS DOUBLE))) AS corr_value_hour
FROM s
""")
def q_numeric_profile_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir)
    vc = _cents("value")
    hr = F.hour("ts").cast("long")
    s = ev.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum(vc).alias("sx"),
        F.sum(vc * vc).alias("sxx"),
        F.sum(hr).alias("sy"),
        F.sum(hr * hr).alias("syy"),
        F.sum(vc * hr).alias("sxy"),
    )
    n, sx, sxx = F.col("n"), F.col("sx"), F.col("sxx")
    sy, syy, sxy = F.col("sy"), F.col("syy"), F.col("sxy")
    mean_c = sx.cast("double") / n
    return s.select(
        "event_type",
        "n",
        (mean_c / F.lit(100.0)).alias("mean_value"),
        ((sxx.cast("double") / n - mean_c * mean_c) / F.lit(10000.0)).alias("var_pop_value"),
        (
            (n * sxy - sx * sy).cast("double")
            / (
                F.sqrt((n * sxx - sx * sx).cast("double"))
                * F.sqrt((n * syy - sy * sy).cast("double"))
            )
        ).alias("corr_value_hour"),
    )


# --- A breadth: generic per-column data profile ------------------------------

_PROFILE_COLS = ["o_orderkey", "o_custkey", "o_orderstatus", "o_orderdate", "o_orderpriority"]

@_q("profile_orders", "\nUNION ALL\n".join(
    f"""SELECT '{c}' AS col_name,
  COUNT(*) - COUNT({c}) AS n_nulls,
  COUNT(DISTINCT {c}) AS n_distinct,
  CAST(MIN({c}) AS VARCHAR) AS min_str,
  CAST(MAX({c}) AS VARCHAR) AS max_str
FROM orders""" for c in _PROFILE_COLS
))
def q_profile_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, "orders", sf_dir)
    return analytics.profile(o, _PROFILE_COLS)


# --- F breadth: regexp extraction + conditional count ------------------------

@_q("regexp_name_consistency", """
SELECT c_nationkey, COUNT(*) AS n,
  CAST(SUM(CASE WHEN CAST(regexp_extract(c_name, '([0-9]+)$', 1) AS BIGINT) = c_custkey
      THEN 1 ELSE 0 END) AS BIGINT) AS n_consistent
FROM customer GROUP BY c_nationkey
""")
def q_regexp_name_consistency(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, "customer", sf_dir)
    num = F.regexp_extract(F.col("c_name"), r"([0-9]+)$", 1).cast("long")
    return c.groupBy("c_nationkey").agg(
        F.count("*").alias("n"),
        F.sum(F.when(num == F.col("c_custkey"), 1).otherwise(0)).cast("long").alias("n_consistent"),
    )


# --- M5 breadth: PII redaction, repetition signal, URL stats, packing --------
# The gate corpus has no natural PII/URLs, so these queries append a
# deterministic synthetic tail (email/phone/IP/URL derived from
# doc_id/source) to every document IN BOTH ENGINES before operating —
# the redaction/extraction itself is then fully exercised and
# oracle-checked.

_PII_AUG_SQL = (
    "text || ' contact user' || CAST(doc_id AS VARCHAR)"
    " || '@example.com call +1-555-123-4567 ip 10.0.0.'"
    " || CAST(doc_id % 256 AS VARCHAR) || ' see https://'"
    " || source || '.example.org/docs'"
)


def _pii_aug_col() -> "F.Column":
    return F.concat_ws(
        "",
        F.col("text"),
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com call +1-555-123-4567 ip 10.0.0."),
        (F.col("doc_id") % 256).cast("string"),
        F.lit(" see https://"),
        F.col("source"),
        F.lit(".example.org/docs"),
    )


def _pii_oracle() -> str:
    from harmony_energy_data_pipeline_spark.operators.text import PII_PATTERNS

    em, ph, ip = PII_PATTERNS["email"], PII_PATTERNS["phone"], PII_PATTERNS["ipv4"]
    return f"""
WITH aug AS (SELECT doc_id, {_PII_AUG_SQL} AS t FROM documents),
s1 AS (
  SELECT doc_id, CAST(len(string_split_regex(t, '{em}')) - 1 AS BIGINT) AS n_email,
         regexp_replace(t, '{em}', '<EMAIL>', 'g') AS t
  FROM aug
),
s2 AS (
  SELECT doc_id, n_email, CAST(len(string_split_regex(t, '{ph}')) - 1 AS BIGINT) AS n_phone,
         regexp_replace(t, '{ph}', '<PHONE>', 'g') AS t
  FROM s1
),
s3 AS (
  SELECT doc_id, n_email, n_phone,
         CAST(len(string_split_regex(t, '{ip}')) - 1 AS BIGINT) AS n_ipv4,
         regexp_replace(t, '{ip}', '<IPV4>', 'g') AS t
  FROM s2
)
SELECT doc_id, n_email, n_phone, n_ipv4, t AS redacted FROM s3
"""


@_q("pii_redact", _pii_oracle())
def q_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    aug = docs.select("doc_id", _pii_aug_col().alias("aug"))
    return text.redact_pii(aug, "doc_id", "aug")


@_q("repetition_ratio", f"""
WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
g AS (
  SELECT doc_id,
    CASE WHEN len(toks) >= 2
         THEN list_transform(range(1, len(toks)), i -> toks[i] || ' ' || toks[i+1])
         ELSE [] END AS grams
  FROM t
)
SELECT doc_id, CAST(len(grams) AS BIGINT) AS n_ngrams,
  CASE WHEN len(grams) > 0
       THEN round(1.0 - CAST(len(list_distinct(grams)) AS DOUBLE) / len(grams), 6)
       ELSE 0.0 END AS rep_ratio
FROM g
""")
def q_repetition_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    return text.repetition_ratio(docs, "doc_id", "text", n=2)


@_q("url_domains", f"""
WITH aug AS (SELECT doc_id, {_PII_AUG_SQL} AS t FROM documents),
ex AS (
  SELECT doc_id,
         unnest(regexp_extract_all(t, 'https?://([A-Za-z0-9.-]+)', 1)) AS domain
  FROM aug
)
SELECT domain, COUNT(DISTINCT doc_id) AS n_docs, COUNT(*) AS n_urls
FROM ex GROUP BY domain
""")
def q_url_domains(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    aug = docs.select(F.col("doc_id"), _pii_aug_col().alias("aug"))
    return text.url_domain_stats(aug, "doc_id", "aug")


@_q("pack_sequences", f"""
WITH RECURSIVE d AS (
  SELECT doc_id, doc_id % 4 AS shard, CAST(len({_TOKS}) AS BIGINT) AS tk,
         row_number() OVER (PARTITION BY doc_id % 4 ORDER BY doc_id ASC) AS rn
  FROM documents
),
p AS (
  SELECT shard, rn, doc_id, tk, 0::BIGINT AS seq_id, 0::BIGINT AS tok_offset, tk AS fill
  FROM d WHERE rn = 1
  UNION ALL
  SELECT d.shard, d.rn, d.doc_id, d.tk,
         CASE WHEN p.fill + d.tk <= 256 THEN p.seq_id ELSE p.seq_id + 1 END,
         CASE WHEN p.fill + d.tk <= 256 THEN p.fill ELSE 0::BIGINT END,
         CASE WHEN p.fill + d.tk <= 256 THEN p.fill + d.tk ELSE d.tk END
  FROM p JOIN d ON d.shard = p.shard AND d.rn = p.rn + 1
)
SELECT shard, doc_id, seq_id, tok_offset, tk AS n_tokens FROM p
""")
def q_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    from harmony_energy_data_pipeline_spark.operators.sampling import pack_sequences
    docs = load_table(spark, "documents", sf_dir)
    sized = docs.select("doc_id", text.token_count("text").cast("long").alias("tk"))
    return pack_sequences(sized, "doc_id", "tk", budget=256, n_shards=4)


# --- temporal: gap-filling resample (time_bucket_gapfill + locf shape) -------

@_q("resample_fill_hourly", """
WITH obs0 AS (
  SELECT user_id AS key, (epoch_us(ts) // 1000000 // 3600) * 3600 AS b, ts, value
  FROM events
),
obs AS (
  SELECT key, b, value AS v FROM (
    SELECT key, b, value,
           row_number() OVER (PARTITION BY key, b ORDER BY ts DESC, value DESC) AS rn
    FROM obs0
  ) WHERE rn = 1
),
span AS (SELECT key, MIN(b) AS lo, MAX(b) AS hi FROM obs GROUP BY key),
grid AS (SELECT key, unnest(range(lo, hi + 3600, 3600)) AS b FROM span),
j AS (
  SELECT g.key, g.b, o.v
  FROM grid g LEFT JOIN obs o ON o.key = g.key AND o.b = g.b
)
SELECT key AS user_id, CAST(to_timestamp(b) AS TIMESTAMP) AS bucket,
       last_value(v IGNORE NULLS) OVER (
         PARTITION BY key ORDER BY b ASC ROWS UNBOUNDED PRECEDING
       ) AS value,
       v IS NULL AS is_filled
FROM j
""")
def q_resample_fill_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    from harmony_energy_data_pipeline_spark.operators.temporal import resample_with_fill
    ev = load_table(spark, "events", sf_dir)
    return resample_with_fill(ev, "user_id", "ts", "value", step_seconds=3600)


# --- temporal: exact time-weighted average -----------------------------------

@_q("time_weighted_avg", """
WITH c AS (
  SELECT user_id, event_id, epoch_us(ts) // 1000000 AS s,
         CAST(round(value*100) AS BIGINT) AS cents
  FROM events
),
l AS (
  SELECT user_id, cents,
         lead(s) OVER (PARTITION BY user_id ORDER BY s ASC, event_id ASC) - s AS dt
  FROM c
),
a AS (
  SELECT user_id, SUM(CAST(cents AS HUGEINT) * dt) AS num,
         SUM(CAST(dt AS HUGEINT)) AS den, COUNT(*) AS n_intervals
  FROM l WHERE dt IS NOT NULL GROUP BY user_id
)
SELECT user_id,
       CAST(CAST(num AS BIGINT) AS DOUBLE) / (100.0 * CAST(CAST(den AS BIGINT) AS DOUBLE)) AS twa,
       n_intervals,
       CAST(den AS BIGINT) AS span_seconds
FROM a WHERE den > 0
""")
def q_time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    from harmony_energy_data_pipeline_spark.operators.temporal import time_weighted_avg
    ev = load_table(spark, "events", sf_dir)
    return time_weighted_avg(ev, "user_id", "ts", "value", tiebreak_col="event_id")


# --- A: fixed-width histogram per group --------------------------------------

@_q("histogram_values", """
WITH b AS (
  SELECT event_type,
         CAST(LEAST(GREATEST(floor(value / 20.0), 0), 14) AS BIGINT) AS bin
  FROM events
)
SELECT event_type, bin, CAST(bin AS DOUBLE) * 20.0 AS bin_lo, COUNT(*) AS n
FROM b GROUP BY event_type, bin
""")
def q_histogram_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    from harmony_energy_data_pipeline_spark.operators.analytics import histogram
    ev = load_table(spark, "events", sf_dir)
    return histogram(ev, "event_type", "value", bin_width=20.0, n_bins=15)


# --- training-pipeline: sliding-window document chunking --------------------
# Chunk i covers tokens [i*48+1, i*48+64]; identical window formula on
# both sides, chunk text compared via md5 fingerprint.

@_q("chunk_docs", f"""
WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
d AS (SELECT doc_id, toks, len(toks) AS n FROM t WHERE len(toks) > 0),
c AS (SELECT doc_id, toks,
        unnest(range(0, CASE WHEN n <= 64 THEN 1
                             ELSE (n - 64 + 47) // 48 + 1 END)) AS chunk_id
      FROM d)
SELECT doc_id, CAST(chunk_id AS BIGINT) AS chunk_id,
       CAST(len(list_slice(toks, chunk_id*48 + 1, chunk_id*48 + 64)) AS BIGINT) AS n_tokens,
       md5(array_to_string(list_slice(toks, chunk_id*48 + 1, chunk_id*48 + 64), ' ')) AS chunk_hash
FROM c
""")
def q_chunk_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    return text.chunk_documents(docs, "doc_id", "text", chunk_size=64, stride=48)


# --- training-pipeline: benchmark decontamination ---------------------------
# Benchmark = every 20th doc_id (stands in for an eval suite); corpus =
# the rest. Engine joins hashed shingles against the broadcast
# benchmark set; oracle joins the raw shingle strings.

@_q("decontam_overlap", f"""
WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
sh AS (
  SELECT doc_id,
    CASE WHEN len(toks) >= 3
         THEN list_distinct(list_transform(range(1, len(toks)-1),
              i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))
         ELSE [array_to_string(toks, ' ')] END AS s
  FROM t
),
bex AS (SELECT DISTINCT g FROM (SELECT unnest(s) AS g FROM sh WHERE doc_id % 20 = 0)),
cex AS (SELECT doc_id, unnest(s) AS g FROM sh WHERE doc_id % 20 <> 0)
SELECT doc_id, COUNT(*) AS n_hit
FROM cex JOIN bex USING (g)
GROUP BY doc_id
""")
def q_decontam_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    bench = docs.filter(F.col("doc_id") % 20 == 0)
    corpus = docs.filter(F.col("doc_id") % 20 != 0)
    return dedup.decontaminate(corpus, bench, "doc_id", "text", shingle_size=3)


# --- training-pipeline: robust median/MAD outlier screen --------------------
# Lower-median formulation (rank (n+1)//2 of the sorted cents) — no
# interpolation, so med/MAD are exact integers in both engines; the
# k=3.5 threshold compares as 2*dev > 7*mad.

@_q("robust_outliers_events", """
WITH c AS (SELECT *, CAST(round(value*100) AS BIGINT) AS v FROM events WHERE value IS NOT NULL),
r AS (SELECT event_type, v,
             row_number() OVER (PARTITION BY event_type ORDER BY v) AS rn,
             COUNT(*) OVER (PARTITION BY event_type) AS n
      FROM c),
med AS (SELECT event_type, v AS medv FROM r WHERE rn = (n+1)//2),
d AS (SELECT c.*, abs(c.v - med.medv) AS dev, med.medv AS medv
      FROM c JOIN med USING (event_type)),
r2 AS (SELECT event_type, dev,
              row_number() OVER (PARTITION BY event_type ORDER BY dev) AS rn,
              COUNT(*) OVER (PARTITION BY event_type) AS n
       FROM d),
mad AS (SELECT event_type, dev AS madv FROM r2 WHERE rn = (n+1)//2)
SELECT event_id, ts, user_id, event_type, value, props,
       CAST(medv AS DOUBLE)/100 AS med, CAST(madv AS DOUBLE)/100 AS mad
FROM d JOIN mad USING (event_type)
WHERE 2*d.dev > 7*mad.madv
""")
def q_robust_outliers_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir)
    return analytics.robust_outliers(ev, "event_type", "value", k_num=7, k_den=2)


# --- training-pipeline: incremental batch-vs-corpus dedup -------------------
# Corpus = every 5th doc_id (the already-ingested store); batch = the
# rest. The batch drops internal digest-dupes (keep smallest id) then
# anti-joins the corpus digest set.

@_q("incremental_dedup_docs", f"""
WITH batch AS (SELECT * FROM documents WHERE doc_id % 5 <> 0),
corpus AS (SELECT * FROM documents WHERE doc_id % 5 = 0),
fresh AS (
  SELECT doc_id, text, lang, source, n_chars, dg FROM (
    SELECT *, md5({_NORM}) AS dg,
           row_number() OVER (PARTITION BY md5({_NORM}) ORDER BY doc_id ASC) AS rn
    FROM batch
  ) WHERE rn = 1
),
seen AS (SELECT DISTINCT md5({_NORM}) AS dg FROM corpus)
SELECT doc_id, text, lang, source, n_chars
FROM fresh WHERE dg NOT IN (SELECT dg FROM seen)
""")
def q_incremental_dedup_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    batch = docs.filter(F.col("doc_id") % 5 != 0)
    corpus = docs.filter(F.col("doc_id") % 5 == 0)
    return dedup.incremental_dedup(batch, corpus, "doc_id", "text", normalize=True)


# Bloom-pruned variant: the Bloom stage only prunes the anti-join's
# probe side (false positives re-checked exactly, false negatives
# impossible), so the result — and therefore the oracle — is the plain
# incremental-dedup semantics. The bloom math itself is pinned by
# tests/test_dedup_extensions.py.

@_q("bloom_incremental_dedup", f"""
WITH batch AS (SELECT * FROM documents WHERE doc_id % 5 <> 0),
corpus AS (SELECT * FROM documents WHERE doc_id % 5 = 0),
fresh AS (
  SELECT doc_id, text, lang, source, n_chars, dg FROM (
    SELECT *, md5({_NORM}) AS dg,
           row_number() OVER (PARTITION BY md5({_NORM}) ORDER BY doc_id ASC) AS rn
    FROM batch
  ) WHERE rn = 1
),
seen AS (SELECT DISTINCT md5({_NORM}) AS dg FROM corpus)
SELECT doc_id, text, lang, source, n_chars
FROM fresh WHERE dg NOT IN (SELECT dg FROM seen)
""")
def q_bloom_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    batch = docs.filter(F.col("doc_id") % 5 != 0)
    corpus = docs.filter(F.col("doc_id") % 5 == 0)
    return dedup.incremental_dedup_bloom(
        batch, corpus, "doc_id", "text", normalize=True, m_bits=1 << 16
    )


# --- corpus-global span dedup (C4/RefinedWeb line-dedup family) --------------
# The synthetic corpus is single-line, so the gate query runs the SAME
# operator at token granularity (split on ' ', min_len 4); multi-line
# semantics are pinned by tests/test_text_extensions.py.

@_q("span_dedup_docs", """
WITH parts AS (
  SELECT doc_id,
         unnest(generate_series(1, len(l))) - 1 AS pos,
         unnest(l) AS span
  FROM (SELECT doc_id, string_split(text, ' ') AS l FROM documents)
),
flagged AS (
  SELECT doc_id, pos, span,
         row_number() OVER (PARTITION BY span ORDER BY doc_id ASC, pos ASC) AS rn
  FROM parts
)
SELECT doc_id, string_agg(span, ' ' ORDER BY pos) AS text
FROM flagged
WHERE length(span) < 4 OR rn = 1
GROUP BY doc_id
""")
def q_span_dedup_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from harmony_energy_data_pipeline_spark.operators.text import span_dedup

    docs = load_table(spark, "documents", sf_dir).select("doc_id", "text")
    return span_dedup(docs, "doc_id", "text", split_re=" ", join_delim=" ", min_len=4)


# --- corpus-global quantile band filter --------------------------------------

@_q("quality_band_docs", """
WITH th AS (
  SELECT round(quantile_cont(n_chars, 0.05), 6) AS lo,
         round(quantile_cont(n_chars, 0.95), 6) AS hi
  FROM documents
)
SELECT doc_id, n_chars FROM documents, th
WHERE n_chars >= lo AND n_chars <= hi
""")
def q_quality_band_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from harmony_energy_data_pipeline_spark.operators.cleaning import (
        quantile_band_filter,
    )

    docs = load_table(spark, "documents", sf_dir).select("doc_id", "n_chars")
    return quantile_band_filter(docs, "n_chars", 0.05, 0.95)


# --- scale layout: Morton (z-order) clustering key --------------------------
# The engine key and the SQL twin are generated from the same unroll
# (sinks/layout.py), so the bit-interleave is provably identical.

from harmony_energy_data_pipeline_spark.sinks.layout import zorder_key, zorder_key_sql

@_q("zorder_events", f"""
WITH b AS (
  SELECT event_id,
         user_id & 65535 AS u,
         (CAST(round(value*100) AS BIGINT) & 65535) AS v
  FROM events
)
SELECT event_id, CAST({zorder_key_sql(['u', 'v'], 16)} AS BIGINT) AS z FROM b
""")
def q_zorder_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir)
    b = ev.select(
        "event_id",
        F.col("user_id").bitwiseAND(F.lit(65535)).alias("u"),
        _cents("value").bitwiseAND(F.lit(65535)).alias("v"),
    )
    return b.select("event_id", zorder_key(["u", "v"], 16).cast("long").alias("z"))


# ---------------------------------------------------------------------------
# Sink evidence: each query below DRIVES a sink end-to-end (write to a
# temp location, read back) and returns a digest the DuckDB oracle can
# recompute from the source tables — so the driver's correctness gate
# covers the write paths, not just the pure queries. Determinism:
# shard routing, merge keys, and layout keys are all key-hash-derived
# (no rand(), no wall clock).
# ---------------------------------------------------------------------------

@_q("jsonl_export_shard_counts", """
SELECT CAST(CONCAT('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 8
         AS shard,
       COUNT(*) AS n_records
FROM documents
GROUP BY 1
""")
def q_jsonl_export_shard_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly-N sharded JSONL export + manifest: write documents as 8
    md5-routed shards, then report each shard's manifest line count —
    the oracle recomputes the bucket histogram straight from the
    table. Shard i is file i: repartitionByRange on the bucket value
    puts one bucket per partition in ascending order (verified by the
    writer's file-count check)."""
    import tempfile

    from harmony_energy_data_pipeline_spark.sinks.export import (
        jsonl_manifest,
        write_jsonl_shards,
    )

    docs = load_table(spark, "documents", sf_dir).select("doc_id", "text")
    out = tempfile.mkdtemp(prefix="jsonl_shards_")
    write_jsonl_shards(docs, out, n_shards=8, shard_key="doc_id")
    entries = jsonl_manifest(spark, out)
    return spark.createDataFrame(
        [(i, int(e["n_records"])) for i, e in enumerate(entries)],
        "shard long, n_records long",
    )


@_q("snapshot_time_travel", """
SELECT 0 AS version, COUNT(*) AS n_rows,
       CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS sum_cents,
       bit_xor(o_orderkey) AS key_xor
FROM orders WHERE o_orderkey % 4 = 0
UNION ALL
SELECT 1, COUNT(*),
       CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT),
       bit_xor(o_orderkey)
FROM orders WHERE o_orderkey % 4 IN (0, 1)
UNION ALL
SELECT 2, COUNT(*),
       CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT),
       bit_xor(o_orderkey)
FROM orders WHERE o_orderkey % 4 = 2
""")
def q_snapshot_time_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MVCC snapshot sink end-to-end: three commits (overwrite,
    append, overwrite) against a fresh table, then TIME TRAVEL back
    through every version and digest each — the oracle recomputes all
    three version states straight from ``orders``. Exercises manifest
    CAS publish, immutable data files, and frozen-file-list reads."""
    import tempfile

    from harmony_energy_data_pipeline_spark.sinks import snapshots as snap

    od = load_table(spark, "orders", sf_dir).select("o_orderkey", "o_totalprice")
    path = tempfile.mkdtemp(prefix="snap_tbl_")
    # concurrent staging + ordered publish: same three manifests,
    # wall-clock of the slowest staging job instead of the sum
    snap.snapshot_write_many(
        [
            (od.filter(F.col("o_orderkey") % 4 == 0), "overwrite"),
            (od.filter(F.col("o_orderkey") % 4 == 1), "append"),
            (od.filter(F.col("o_orderkey") % 4 == 2), "overwrite"),
        ],
        path,
    )
    digest = None
    for v in (0, 1, 2):
        part = snap.read_snapshot(spark, path, v).agg(
            F.lit(v).cast("int").alias("version"),
            F.count("*").alias("n_rows"),
            F.sum(_cents("o_totalprice")).cast("long").alias("sum_cents"),
            F.expr("bit_xor(o_orderkey)").alias("key_xor"),
        ).select("version", "n_rows", "sum_cents", "key_xor")
        digest = part if digest is None else digest.unionByName(part)
    return digest


@_q("snapshot_changes_digest", """
SELECT COUNT(*) AS n_rows,
       CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_cents,
       bit_xor(event_id) AS key_xor
FROM events WHERE event_id % 3 IN (1, 2)
""")
def q_snapshot_changes_digest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC-style incremental read: three append commits, then consume
    exactly the rows added after v0 via the manifest file-set diff —
    the exactly-once resume primitive for downstream incremental
    consumers. Oracle recomputes the (v0, v2] delta from ``events``."""
    import tempfile

    from harmony_energy_data_pipeline_spark.sinks import snapshots as snap

    ev = load_table(spark, "events", sf_dir).select("event_id", "value")
    path = tempfile.mkdtemp(prefix="snap_cdc_")
    snap.snapshot_write_many(
        [
            (ev.filter(F.col("event_id") % 3 == 0), "overwrite"),
            (ev.filter(F.col("event_id") % 3 == 1), "append"),
            (ev.filter(F.col("event_id") % 3 == 2), "append"),
        ],
        path,
    )
    delta = snap.read_snapshot_changes(spark, path, 0, 2)
    return delta.agg(
        F.count("*").alias("n_rows"),
        F.sum(_cents("value")).cast("long").alias("sum_cents"),
        F.expr("bit_xor(event_id)").alias("key_xor"),
    )


@_q("snapshot_compact_digest", """
SELECT COUNT(*) AS n_rows,
       CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_cents,
       bit_xor(event_id) AS key_xor,
       CAST(1 AS BOOLEAN) AS fewer_files
FROM events
""")
def q_snapshot_compact_digest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-file compaction end-to-end (`sinks/snapshots.py:
    snapshot_compact` — the Iceberg rewrite_data_files maintenance
    action): three multi-file append commits, compact the live set to
    ~target-size files as a new overwrite version, digest the
    READ-BACK — proving the rewrite preserves content exactly while
    shrinking the file count (asserted in-query). Oracle recomputes
    the digest straight from ``events``."""
    import tempfile

    from harmony_energy_data_pipeline_spark.sinks import snapshots as snap

    ev = load_table(spark, "events", sf_dir).select("event_id", "value")
    path = tempfile.mkdtemp(prefix="snap_compact_")
    snap.snapshot_write_many(
        [
            (ev.filter(F.col("event_id") % 3 == 0).repartition(4), "overwrite"),
            (ev.filter(F.col("event_id") % 3 == 1).repartition(4), "append"),
            (ev.filter(F.col("event_id") % 3 == 2).repartition(4), "append"),
        ],
        path,
    )
    before = len(snap._read_manifest(path, snap.latest_version(path))["files"])
    v = snap.snapshot_compact(spark, path, target_file_mb=128)
    after = len(snap._read_manifest(path, v)["files"])
    return snap.read_snapshot(spark, path).agg(
        F.count("*").alias("n_rows"),
        F.sum(_cents("value")).cast("long").alias("sum_cents"),
        F.expr("bit_xor(event_id)").alias("key_xor"),
        F.lit(after < before).alias("fewer_files"),
    )


@_q("merge_evolve_digest", """
WITH base AS (
  SELECT event_id, value FROM events WHERE event_id % 4 <> 0
), src AS (
  SELECT event_id, value * 2 AS value, event_type AS tag
  FROM events WHERE event_id % 2 = 0
), merged AS (
  SELECT event_id, value, tag FROM src
  UNION ALL
  SELECT event_id, value, CAST(NULL AS VARCHAR) AS tag
  FROM base WHERE event_id NOT IN (SELECT event_id FROM src)
)
SELECT COUNT(*) AS n_rows,
       CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_cents,
       bit_xor(event_id) AS key_xor,
       COUNT(tag) AS n_tagged
FROM merged
""")
def q_merge_evolve_digest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE WITH SCHEMA EVOLUTION (`sinks/snapshots.py:
    snapshot_merge_into(evolve_schema=True)` — the Delta shape): the
    source grew a ``tag`` column the table lacks; the merge adds it
    metadata-only (pre-existing rows read NULL), source rows replace
    matches and insert new keys source-wins. The oracle recomputes
    the merged state relationally."""
    import tempfile

    from harmony_energy_data_pipeline_spark.sinks import snapshots as snap

    ev = load_table(spark, "events", sf_dir)
    path = tempfile.mkdtemp(prefix="snap_mevolve_")
    snap.snapshot_write(
        ev.filter(F.col("event_id") % 4 != 0).select("event_id", "value"),
        path, member_cols=["event_id"],
    )
    src = ev.filter(F.col("event_id") % 2 == 0).select(
        "event_id", (F.col("value") * 2).alias("value"),
        F.col("event_type").alias("tag"),
    )
    snap.snapshot_merge_into(spark, path, src, key="event_id",
                             evolve_schema=True)
    return snap.read_snapshot(spark, path).agg(
        F.count("*").alias("n_rows"),
        F.sum(_cents("value")).cast("long").alias("sum_cents"),
        F.expr("bit_xor(event_id)").alias("key_xor"),
        F.count("tag").alias("n_tagged"),
    )


@_q("snapshot_compact_small_digest", """
SELECT COUNT(*) AS n_rows,
       CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_cents,
       bit_xor(event_id) AS key_xor,
       CAST(1 AS BOOLEAN) AS delta_commit,
       CAST(1 AS BOOLEAN) AS big_carried
FROM events
""")
def q_snapshot_compact_small_digest(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Incremental bin-packing (`sinks/snapshots.py:
    snapshot_compact(only_smaller_than_mb=)` — the Delta OPTIMIZE
    default): one right-sized file plus six tiny streaming-ish
    appends; the maintenance pass packs ONLY the small files and
    commits a DELTA (asserted in-query: the raw manifest has
    adds/removes, and the big file's path carries untouched), so
    routine compaction costs O(small-file bytes), never O(table).
    Oracle recomputes the digest straight from ``events``."""
    import os as _os
    import tempfile

    from harmony_energy_data_pipeline_spark.sinks import snapshots as snap

    ev = load_table(spark, "events", sf_dir).select("event_id", "value")
    path = tempfile.mkdtemp(prefix="snap_packsmall_")
    snap.snapshot_write(ev.filter(F.col("event_id") % 8 > 1).coalesce(1), path)
    for i in range(6):
        snap.snapshot_write(
            ev.filter(
                (F.col("event_id") % 8 == (i % 2))
                & (F.col("event_id") % 3 == i // 2)
            ).coalesce(1),
            path, mode="append",
        )
    v0 = snap.latest_version(path)
    m0 = snap._read_manifest(path, v0)
    big = max(
        m0["files"], key=lambda f: _os.path.getsize(snap._abs_file(path, f))
    )
    thresh = _os.path.getsize(snap._abs_file(path, big)) / (1024.0 * 1024.0)
    v1 = snap.snapshot_compact(
        spark, path, target_file_mb=64, only_smaller_than_mb=thresh
    )
    raw1 = snap._read_manifest_raw(path, v1)
    m1 = snap._read_manifest(path, v1)
    delta_commit = (
        "adds" in raw1 and bool(raw1.get("removes"))
        and len(m1["files"]) < len(m0["files"])
    )
    big_carried = big in set(m1["files"]) and big not in set(
        raw1.get("removes", [])
    )
    return snap.read_snapshot(spark, path).agg(
        F.count("*").alias("n_rows"),
        F.sum(_cents("value")).cast("long").alias("sum_cents"),
        F.expr("bit_xor(event_id)").alias("key_xor"),
        F.lit(delta_commit).alias("delta_commit"),
        F.lit(big_carried).alias("big_carried"),
    )


@_q("snapshot_zorder_digest", """
SELECT COUNT(*) AS n_rows,
       CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_cents,
       bit_xor(event_id) AS key_xor,
       CAST(1 AS BOOLEAN) AS pruned_id,
       CAST(1 AS BOOLEAN) AS pruned_user
FROM events
""")
def q_snapshot_zorder_digest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-dimensional OPTIMIZE (`sinks/snapshots.py:
    snapshot_compact(zorder_by=)` — the Delta ``OPTIMIZE … ZORDER BY``
    shape over `sinks/layout.py: zorder_key`): write events multi-file,
    z-order-compact on (event_id, user_id), digest the read-back, and
    assert IN-QUERY that the rewritten zone maps prune a narrow
    predicate on EACH clustered dimension — the property a linear sort
    gives only its leading column. Oracle recomputes the digest
    straight from ``events``."""
    import tempfile

    from harmony_energy_data_pipeline_spark.sinks import snapshots as snap

    ev = load_table(spark, "events", sf_dir).select(
        "event_id", "user_id", "value"
    )
    path = tempfile.mkdtemp(prefix="snap_zorder_")
    snap.snapshot_write(
        ev.repartition(8), path, stats_cols=["event_id", "user_id"]
    )
    v = snap.snapshot_compact(
        spark, path, target_file_mb=1, zorder_by=["event_id", "user_id"]
    )
    n_files = len(snap._read_manifest(path, v)["files"])
    lo_id, hi_id, lo_u, hi_u = ev.agg(
        F.min("event_id"), F.max("event_id"),
        F.min("user_id"), F.max("user_id"),
    ).collect()[0]
    kept_id, _tot = snap.prune_files(
        path, [("event_id", lo_id, lo_id + max(1, (hi_id - lo_id) // 20))]
    )
    kept_u, _tot = snap.prune_files(
        path, [("user_id", lo_u, lo_u + max(1, (hi_u - lo_u) // 20))]
    )
    pruned_id = n_files == 1 or len(kept_id) < n_files
    pruned_user = n_files == 1 or len(kept_u) < n_files
    return snap.read_snapshot(spark, path).agg(
        F.count("*").alias("n_rows"),
        F.sum(_cents("value")).cast("long").alias("sum_cents"),
        F.expr("bit_xor(event_id)").alias("key_xor"),
        F.lit(pruned_id).alias("pruned_id"),
        F.lit(pruned_user).alias("pruned_user"),
    )


@_q("snapshot_restore_digest", """
SELECT COUNT(*) AS n_rows,
       CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_cents,
       bit_xor(event_id) AS key_xor
FROM events WHERE event_id % 2 = 0
""")
def q_snapshot_restore_digest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rollback end-to-end (`sinks/snapshots.py: snapshot_restore`):
    commit the good half of events, append a corrupting batch, roll
    back to v0 as a new metadata-only commit, digest the read-back —
    the oracle recomputes the good half straight from ``events``
    (proving the bad batch is gone from the live view while history
    stayed intact for the in-query time-travel assertion)."""
    import tempfile

    from harmony_energy_data_pipeline_spark.sinks import snapshots as snap

    ev = load_table(spark, "events", sf_dir).select("event_id", "value")
    path = tempfile.mkdtemp(prefix="snap_restore_")
    snap.snapshot_write(ev.filter(F.col("event_id") % 2 == 0), path)      # v0
    snap.snapshot_write(
        ev.filter(F.col("event_id") % 2 == 1)
        .withColumn("value", F.col("value") * 1000),                      # bad
        path, mode="append",
    )
    v = snap.snapshot_restore(path, 0)
    assert v == 2
    # history intact: the bad commit still time-travels until vacuum
    assert snap.read_snapshot(spark, path, 1).count() == ev.count()
    return snap.read_snapshot(spark, path).agg(
        F.count("*").alias("n_rows"),
        F.sum(_cents("value")).cast("long").alias("sum_cents"),
        F.expr("bit_xor(event_id)").alias("key_xor"),
    )


@_q("upsert_partitioned_digest", """
WITH d0 AS (SELECT MIN(CAST(ts AS DATE)) AS d FROM events)
SELECT CAST(CAST(ts AS DATE) AS VARCHAR) AS dt, COUNT(*) AS n,
       CAST(SUM(CASE WHEN CAST(ts AS DATE) = (SELECT d FROM d0)
                THEN CAST(round(value * 10 * 100) AS BIGINT)
                ELSE CAST(round(value * 100) AS BIGINT) END) AS BIGINT) AS sum_vc
FROM events
GROUP BY 1
""")
def q_upsert_partitioned_digest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partition-local upsert end-to-end: initial load of all events,
    then a revision batch (first day's rows, values x10) merged via
    the atomic staging+marker+swap commit; the digest is the per-day
    count and cents-sum of the FINAL table read through the
    torn-proof committed reader."""
    import tempfile

    from harmony_energy_data_pipeline_spark.sinks.partitioned import (
        read_partitioned_committed,
    )
    from harmony_energy_data_pipeline_spark.sinks.upsert import upsert_partitioned

    ev = load_table(spark, "events", sf_dir).select(
        F.col("event_id").alias("_id"), F.col("ts").alias("DATETIME"), "value"
    )
    path = tempfile.mkdtemp(prefix="upsert_part_") + "/events"
    upsert_partitioned(spark, ev, path, key="_id", ts_col="DATETIME")
    d0 = ev.agg(F.min(F.to_date("DATETIME"))).first()[0]
    batch = ev.filter(F.to_date("DATETIME") == F.lit(d0)).withColumn(
        "value", F.col("value") * 10
    )
    upsert_partitioned(spark, batch, path, key="_id", ts_col="DATETIME")
    final = read_partitioned_committed(spark, path)
    return final.groupBy(F.col("dt").cast("string").alias("dt")).agg(
        F.count("*").alias("n"),
        F.sum(_cents("value")).cast("long").alias("sum_vc"),
    )


@_q("sqlite_upsert_digest", """
SELECT COUNT(*) AS n,
       CAST(SUM(CASE WHEN event_id % 2 = 0
                THEN CAST(round(value * 10 * 100) AS BIGINT)
                ELSE CAST(round(value * 100) AS BIGINT) END) AS BIGINT) AS sum_vc,
       CAST(SUM(user_id) AS BIGINT) AS sum_user
FROM events WHERE event_id % 3 = 0 OR event_id % 2 = 0
""")
def q_sqlite_upsert_digest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SqliteUpsertWriter end-to-end: stage+commit two overlapping
    batches through the DataSource sink (second batch revises the
    even keys, INSERT OR REPLACE wins), read the final table back
    through the DataSource scan, digest it. Oracle recomputes the
    expected post-merge state from the source table."""
    import os
    import tempfile

    from harmony_energy_data_pipeline_spark.sources.sqlitedb import (
        SqliteTableDataSource,
    )

    spark.dataSource.register(SqliteTableDataSource)
    ev = load_table(spark, "events", sf_dir).select("event_id", "user_id", "value")
    db = os.path.join(tempfile.mkdtemp(prefix="sqlite_upsert_"), "ev.db")
    stage = tempfile.mkdtemp(prefix="sqlite_stage_")

    def _write(df: DataFrame) -> None:
        (
            df.write.format("sqlite_table").mode("append")
            .option("path", db).option("table", "ev")
            .option("key", "event_id").option("stagedir", stage)
            .save()
        )

    _write(ev.filter(F.col("event_id") % 3 == 0))
    _write(
        ev.filter(F.col("event_id") % 2 == 0).withColumn(
            "value", F.col("value") * 10
        )
    )
    back = (
        spark.read.format("sqlite_table")
        .schema("event_id long, user_id long, value double")
        .option("path", db).option("table", "ev")
        .load()
    )
    return back.agg(
        F.count("*").alias("n"),
        F.sum(_cents("value")).cast("long").alias("sum_vc"),
        F.sum("user_id").cast("long").alias("sum_user"),
    )


@_q("zorder_write_roundtrip", f"""
WITH b AS (
  SELECT event_id,
         user_id & 255 AS b1,
         (COALESCE(CAST(round(value * 100) AS BIGINT), 0) & 255) AS b2
  FROM events
),
z AS (SELECT event_id, CAST({zorder_key_sql(['b1', 'b2'], 8)} AS BIGINT) AS z FROM b)
SELECT COUNT(*) AS n_rows, bit_xor(z) AS z_xor,
       CAST(SUM(z) AS BIGINT) AS z_sum, bit_xor(event_id) AS id_xor
FROM z
""")
def q_zorder_write_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """zorder_write end-to-end: range-partition + sort + write the
    events table clustered on (user-bucket, value-bucket), read the
    files back, recompute the Morton key, and digest rows + keys —
    proving the layout sink preserves content exactly and the key
    matches its SQL twin after a disk roundtrip."""
    import tempfile

    from harmony_energy_data_pipeline_spark.sinks.layout import (
        read_zorder,
        zorder_key as _zk,
        zorder_write,
    )

    ev = load_table(spark, "events", sf_dir).select(
        "event_id",
        F.col("user_id").bitwiseAND(F.lit(255)).alias("b1"),
        F.coalesce(_cents("value"), F.lit(0)).bitwiseAND(F.lit(255)).alias("b2"),
    )
    out = tempfile.mkdtemp(prefix="zorder_") + "/events_z"
    zorder_write(ev, ["b1", "b2"], out, bits=8, num_partitions=8)
    back = read_zorder(spark, out).withColumn("z", _zk(["b1", "b2"], 8))
    return back.agg(
        F.count("*").alias("n_rows"),
        F.expr("bit_xor(z)").alias("z_xor"),
        F.sum("z").cast("long").alias("z_sum"),
        F.expr("bit_xor(event_id)").alias("id_xor"),
    )


# --- zone-map file pruning through the snapshot log -------------------------------

@_q("snapshot_pruned_scan", """
SELECT COUNT(*) AS n_rows,
       CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_vc,
       bit_xor(event_id) AS id_xor
FROM events
WHERE ts >= TIMESTAMP '2024-01-10 00:00:00'
  AND ts <= TIMESTAMP '2024-01-14 00:00:00'
""")
def q_snapshot_pruned_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zone-map pruning end-to-end: commit events time-clustered
    (range-partitioned on ts) with per-file min/max stats in the
    manifest, then read a 4-day window through
    ``read_snapshot(where=...)`` — planning-time file skipping plus
    the residual filter. The oracle filters the raw table directly,
    so the digest proves pruning never changes results; pytest
    (`test_snapshot_stats.py`) asserts the file-skip actually
    happens. At 100 TB this is the difference between scanning a
    day's files and scanning the table."""
    import datetime as dt
    import tempfile

    from harmony_energy_data_pipeline_spark.sinks import snapshots as snap

    ev = load_table(spark, "events", sf_dir).select(
        "event_id", "ts", "value"
    )
    path = tempfile.mkdtemp(prefix="snap_zonemap_")
    snap.snapshot_write(
        ev.repartitionByRange(8, "ts").sortWithinPartitions("ts"),
        path, stats_cols=["ts"],
    )
    lo = dt.datetime(2024, 1, 10)
    hi = dt.datetime(2024, 1, 14)
    pruned = snap.read_snapshot(spark, path, where=[("ts", lo, hi)])
    return pruned.agg(
        F.count("*").alias("n_rows"),
        F.sum(_cents("value")).cast("long").alias("sum_vc"),
        F.expr("bit_xor(event_id)").alias("id_xor"),
    )


# --- SQL facade with time travel ------------------------------------------------------

@_q("snapshot_sql_timetravel", """
SELECT o_orderpriority AS prio,
       COUNT(*) AS n_now,
       CAST(SUM(CASE WHEN o_orderkey % 2 = 1 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_new
FROM orders
GROUP BY o_orderpriority
""")
def q_snapshot_sql_timetravel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SQL surface (`sql.py: snapshot_sql`): one ANSI query joins
    a table's PRESENT against its own PAST via the Delta/Iceberg
    ``VERSION AS OF`` syntax — each occurrence resolves to a frozen
    ``read_snapshot`` at plan time. The table commits even order keys
    at v0 and appends odd at v1; the query counts, per priority, the
    current rows and how many joined nothing at v0 (= the appended
    ones). The oracle derives both from the raw table."""
    import tempfile

    from harmony_energy_data_pipeline_spark.sinks import snapshots as snap
    from harmony_energy_data_pipeline_spark.sql import snapshot_sql

    od = load_table(spark, "orders", sf_dir).select(
        "o_orderkey", "o_orderpriority"
    )
    path = tempfile.mkdtemp(prefix="snap_sql_")
    snap.snapshot_write(od.filter(F.col("o_orderkey") % 2 == 0), path)
    snap.snapshot_write(
        od.filter(F.col("o_orderkey") % 2 == 1), path, mode="append"
    )
    return snapshot_sql(spark, """
        SELECT now.o_orderpriority AS prio,
               COUNT(*) AS n_now,
               CAST(SUM(CASE WHEN old.o_orderkey IS NULL THEN 1 ELSE 0
                        END) AS BIGINT) AS n_new
        FROM t now
        LEFT JOIN (SELECT o_orderkey FROM t VERSION AS OF 0) old
          ON now.o_orderkey = old.o_orderkey
        GROUP BY now.o_orderpriority
    """, {"t": path})


# --- arbitrary-SQL row-level predicates ----------------------------------------------

@_q("snapshot_delete_expr_digest", """
SELECT COUNT(*) AS n_rows,
       CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_vc,
       bit_xor(event_id) AS id_xor
FROM events
WHERE NOT (event_id % 13 = 0)
""")
def q_snapshot_delete_expr_digest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-level ops beyond interval triples: the DV delete takes an
    ARBITRARY SQL predicate string (``event_id % 13 = 0`` — not
    expressible as a range), skips file pruning (every file is a
    candidate; the residual filter is the exact semantics), and still
    costs O(matched) to write. The oracle recomputes the complement
    from the raw table."""
    import tempfile

    from harmony_energy_data_pipeline_spark.sinks import snapshots as snap

    ev = load_table(spark, "events", sf_dir).select("event_id", "value")
    path = tempfile.mkdtemp(prefix="snap_expr_")
    snap.snapshot_write(ev.repartition(4), path)
    snap.snapshot_delete_where_dv(spark, path, "event_id % 13 = 0")
    return snap.read_snapshot(spark, path).agg(
        F.count("*").alias("n_rows"),
        F.sum(_cents("value")).cast("long").alias("sum_vc"),
        F.expr("bit_xor(event_id)").alias("id_xor"),
    )


# --- ALTER TABLE DROP COLUMN (metadata-only) -----------------------------------------

@_q("snapshot_drop_column_digest", """
SELECT COUNT(*) AS n_rows,
       bit_xor(event_id) AS id_xor,
       COUNT(DISTINCT event_type) AS n_types
FROM events
""")
def q_snapshot_drop_column_digest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DROP COLUMN without rewriting a byte (`sinks/snapshots.py:
    snapshot_drop_column`): the table commits with three columns, the
    value column drops METADATA-ONLY (same live files, schema-on-read
    projects it away), an append lands WITHOUT it, and the digest
    reads the post-drop table. The dropped name is tombstoned —
    re-adding it raises (old files' bytes would resurface) — pinned
    in pytest; the oracle recomputes the surviving columns from the
    raw table."""
    import tempfile

    from harmony_energy_data_pipeline_spark.sinks import snapshots as snap

    ev = load_table(spark, "events", sf_dir).select(
        "event_id", "event_type", "value"
    )
    path = tempfile.mkdtemp(prefix="snap_drop_")
    snap.snapshot_write(ev.filter(F.col("event_id") % 2 == 0), path)
    snap.snapshot_drop_column(path, "value")
    snap.snapshot_write(
        ev.filter(F.col("event_id") % 2 == 1).drop("value"),
        path, mode="append",
    )
    return snap.read_snapshot(spark, path).agg(
        F.count("*").alias("n_rows"),
        F.expr("bit_xor(event_id)").alias("id_xor"),
        F.countDistinct("event_type").alias("n_types"),
    )


# --- generated columns: derived partition layout ------------------------------------

@_q("snapshot_generated_partition_digest", """
SELECT COUNT(*) AS n_rows,
       CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_vc,
       bit_xor(event_id) AS id_xor
FROM events
WHERE CAST(ts AS DATE) = DATE '2024-01-10'
""")
def q_snapshot_generated_partition_digest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GENERATED COLUMNS as derived partition layout (the Delta
    generated-partition pattern, `sinks/snapshots.py:
    _apply_generated`): writers supply only ``ts``; the table computes
    ``day = CAST(ts AS DATE)`` from its table-level spec — on the
    first write AND on an append that doesn't mention it — and
    hive-partitions on it, so a calendar-day predicate prunes exactly
    at planning time. The oracle filters the raw table by the
    expression itself."""
    import datetime as dt
    import tempfile

    from harmony_energy_data_pipeline_spark.sinks import snapshots as snap

    ev = load_table(spark, "events", sf_dir).select(
        "event_id", "ts", "value"
    )
    path = tempfile.mkdtemp(prefix="snap_gen_")
    snap.snapshot_write(
        ev.filter(F.col("event_id") % 2 == 0), path,
        generated_cols={"day": "CAST(ts AS DATE)"},
        partition_by=["day"],
    )
    snap.snapshot_write(  # append inherits the spec, computes day
        ev.filter(F.col("event_id") % 2 == 1), path, mode="append",
    )
    d = dt.date(2024, 1, 10)
    return snap.read_snapshot(
        spark, path, where=[("day", d, d)]
    ).agg(
        F.count("*").alias("n_rows"),
        F.sum(_cents("value")).cast("long").alias("sum_vc"),
        F.expr("bit_xor(event_id)").alias("id_xor"),
    )


# --- ANALYZE: table-level column statistics in the snapshot log ---------------------

@_q("snapshot_analyze_digest", f"""
WITH src AS (
  SELECT 'event_id' AS col, CAST(event_id AS VARCHAR) AS val FROM events
  UNION ALL
  SELECT 'event_type', CAST(event_type AS VARCHAR) FROM events
  UNION ALL
  SELECT 'vc', CAST(CAST(round(value * 100) AS BIGINT) AS VARCHAR)
  FROM events
  UNION ALL
  SELECT 'value',
         CASE WHEN isnan(value) THEN 'nan'
              WHEN value = CAST('Infinity' AS DOUBLE) THEN 'inf'
              WHEN value = CAST('-Infinity' AS DOUBLE) THEN '-inf'
              WHEN abs(value) < 8.0e9 THEN
                CAST(CAST(round(value * 1000000) AS DECIMAL(38,0))
                     AS VARCHAR)
              ELSE concat('big',
                          CASE WHEN value < 0 THEN '-' ELSE '+' END,
                          CAST(CAST(round(log10(abs(value))) AS INT)
                               AS VARCHAR))
         END
  FROM events
),
c AS (SELECT col, COUNT(*) AS n, COUNT(val) AS nn FROM src GROUP BY col),
h AS (
  SELECT col, CAST(md5_number_lower(val) % {1 << 60} AS BIGINT) AS h
  FROM src WHERE val IS NOT NULL
),
b AS (SELECT col, h % 512 AS idx, h // 512 AS w FROM h),
reg AS (
  SELECT col, idx, MAX(CASE WHEN w = 0 THEN 52
                            ELSE 1 + bit_count((w & (-w)) - 1) END) AS r
  FROM b GROUP BY col, idx
),
agg AS (
  SELECT col, COUNT(*) AS n_registers,
         SUM((1::BIGINT) << (52 - r)) AS s
  FROM reg GROUP BY col
),
e AS (
  SELECT col, n_registers, 512 - n_registers AS v_zero,
         CAST(s + (512 - n_registers) * ((1::BIGINT) << 52) AS BIGINT)
             AS scaled_sum
  FROM agg
),
r2 AS (
  SELECT *, 0.7213 / (1.0 + 1.079 / 512.0) * 512.0 * 512.0
            * 4503599627370496.0 / CAST(scaled_sum AS DOUBLE) AS raw
  FROM e
),
est AS (
  SELECT col, round(CASE WHEN v_zero > 0 AND raw <= 2.5 * 512.0
                         THEN 512.0 * ln(512.0 / CAST(v_zero AS DOUBLE))
                         ELSE raw END, 2) AS ndv_est
  FROM r2
)
SELECT c.col AS col, CAST(c.n - c.nn AS BIGINT) AS n_nulls, est.ndv_est
FROM c JOIN est USING (col)
""")
def q_snapshot_analyze_digest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANALYZE end-to-end (`sinks/analyze.py: snapshot_analyze`): the
    table commits, ONE stacked pass sketches every column's NDV with
    the portable integer HLL plus null counts, and the statistics land
    as a metadata-only commit read back via
    ``snapshot_column_stats``. The oracle recomputes the identical
    register tables column-by-column in DuckDB — an APPROXIMATE
    statistic checked by EXACT equality, which is the point of the
    portable sketch."""
    import tempfile

    from harmony_energy_data_pipeline_spark.sinks import analyze as az
    from harmony_energy_data_pipeline_spark.sinks import snapshots as snap

    ev = load_table(spark, "events", sf_dir).select(
        "event_id", "event_type", _cents("value").alias("vc"),
        "value",
    )
    path = tempfile.mkdtemp(prefix="snap_analyze_")
    snap.snapshot_write(ev.repartition(4), path)
    az.snapshot_analyze(
        spark, path, cols=["event_id", "event_type", "vc", "value"]
    )
    cs = az.snapshot_column_stats(path)
    rows = [
        (c, st["n_nulls"], st["ndv_est"])
        for c, st in cs["columns"].items()
    ]
    return spark.createDataFrame(
        rows, "col string, n_nulls long, ndv_est double"
    )


# --- Delta Lake wire-format interop -------------------------------------------------

@_q("delta_roundtrip_digest", """
SELECT o_orderpriority,
       COUNT(*) AS n_rows,
       CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
           AS sum_tc,
       bit_xor(o_orderkey) AS key_xor
FROM orders
GROUP BY o_orderpriority
""")
def q_delta_roundtrip_digest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delta Lake TABLE-FORMAT round trip (`sources/deltalake.py`):
    orders commit to a real ``_delta_log`` (public protocol — JSON
    commits, add actions with partitionValues, O_EXCL version claim)
    partitioned by priority, in two commits (overwrite + append); the
    read path replays the log and attaches partition values as
    plan-time literals exactly as the spec requires (they are NOT in
    the data files). The oracle aggregates the raw table — the hash
    match proves the wire format round-trips losslessly, per
    partition."""
    import tempfile

    from harmony_energy_data_pipeline_spark.sources import deltalake as dl

    od = load_table(spark, "orders", sf_dir).select(
        "o_orderkey", "o_orderpriority", "o_totalprice"
    )
    path = tempfile.mkdtemp(prefix="delta_rt_") + "/t"
    dl.write_delta(
        od.filter(F.col("o_orderkey") % 2 == 0), path,
        partition_by=["o_orderpriority"],
    )
    dl.write_delta(
        od.filter(F.col("o_orderkey") % 2 == 1), path, mode="append",
        partition_by=["o_orderpriority"],
    )
    return dl.read_delta(spark, path).groupBy("o_orderpriority").agg(
        F.count("*").alias("n_rows"),
        F.sum(_cents("o_totalprice")).cast("long").alias("sum_tc"),
        F.expr("bit_xor(o_orderkey)").alias("key_xor"),
    )


@_q("delta_pruned_scan", """
SELECT COUNT(*) AS n_rows,
       CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
           AS sum_tc,
       bit_xor(o_orderkey) AS key_xor
FROM orders
WHERE o_orderkey >= 1000 AND o_orderkey <= 5000
  AND o_orderpriority = '1-URGENT'
""")
def q_delta_pruned_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File skipping THROUGH the Delta wire format: the writer records
    per-file min/max in ``add.stats`` (the spec's statistics shape)
    and hive partition values in ``add.partitionValues``;
    ``read_delta(where=…)`` prunes add actions at planning time on
    both — partition equality exactly, the key band via zone maps —
    then re-applies the predicate row-level. The oracle filters the
    raw table; the digest proves pruning never changes results."""
    import tempfile

    from harmony_energy_data_pipeline_spark.sources import deltalake as dl

    od = load_table(spark, "orders", sf_dir).select(
        "o_orderkey", "o_orderpriority", "o_totalprice"
    )
    path = tempfile.mkdtemp(prefix="delta_pr_") + "/t"
    dl.write_delta(
        od.repartitionByRange(8, "o_orderkey")
        .sortWithinPartitions("o_orderkey"),
        path, partition_by=["o_orderpriority"], stats_cols=["o_orderkey"],
    )
    return dl.read_delta(
        spark, path,
        where=[("o_orderkey", 1000, 5000),
               ("o_orderpriority", "1-URGENT", "1-URGENT")],
    ).agg(
        F.count("*").alias("n_rows"),
        F.sum(_cents("o_totalprice")).cast("long").alias("sum_tc"),
        F.expr("bit_xor(o_orderkey)").alias("key_xor"),
    )


@_q("delta_stream_digest", """
SELECT COUNT(*) AS n_rows,
       CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_vc,
       bit_xor(event_id) AS id_xor
FROM events
""")
def q_delta_stream_digest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING over a Delta-format log (`sources/deltastream.py`):
    a real Structured Streaming query tails the `_delta_log` through
    the registered Python DataSource — initial snapshot as batch
    zero, the second commit's adds as the tail batch, partition
    values attached executor-side from the add actions — into a
    memory sink. The digest of everything the stream delivered must
    hash-match the raw table: exactly-once, no loss, no duplication."""
    import tempfile
    import uuid as _uuid

    from harmony_energy_data_pipeline_spark.sources import deltalake as dl
    from harmony_energy_data_pipeline_spark.sources.deltastream import (
        DeltaTableDataSource,
    )

    spark.dataSource.register(DeltaTableDataSource)
    ev = load_table(spark, "events", sf_dir).select(
        "event_id", "event_type", "value"
    )
    path = tempfile.mkdtemp(prefix="delta_str_") + "/t"
    dl.write_delta(
        ev.filter(F.col("event_id") % 2 == 0), path,
        partition_by=["event_type"],
    )
    dl.write_delta(
        ev.filter(F.col("event_id") % 2 == 1), path, mode="append",
        partition_by=["event_type"],
    )
    name = f"delta_stream_{_uuid.uuid4().hex[:8]}"
    q = (
        spark.readStream.format("delta_table").option("path", path)
        .load().writeStream.format("memory").queryName(name)
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(300)
    return spark.table(name).agg(
        F.count("*").alias("n_rows"),
        F.sum(_cents("value")).cast("long").alias("sum_vc"),
        F.expr("bit_xor(event_id)").alias("id_xor"),
    )


@_q("delta_import_digest", """
WITH src AS (
  SELECT event_id, event_type,
         CAST(round(value * 100) AS BIGINT) AS vc
  FROM events
), all_rows AS (
  SELECT * FROM src
  UNION ALL
  SELECT event_id + 10000000, event_type, vc + 1 FROM src
     WHERE event_id % 5 = 0
)
SELECT COUNT(*) AS n_rows,
       CAST(SUM(vc) AS BIGINT) AS sum_vc,
       bit_xor(event_id) AS id_xor
FROM all_rows
WHERE NOT (event_id >= 100 AND event_id <= 999)
""")
def q_delta_import_digest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Delta→native ADOPTION bridge (`sources/deltalake.py:
    snapshot_import_delta`, the Iceberg migrate shape): a Delta table
    is adopted IN PLACE — zero bytes copied, one manifest referencing
    its live files, ``add.stats`` becoming native zone maps — then
    evolves natively: an append and a deletion-vector delete land in
    the NATIVE log on the adopted files. The oracle recomputes the
    final state (original ∪ appended, minus the deleted band) from
    the raw table."""
    import tempfile

    from harmony_energy_data_pipeline_spark.sinks import snapshots as snap
    from harmony_energy_data_pipeline_spark.sources import deltalake as dl

    ev = load_table(spark, "events", sf_dir).select(
        "event_id", "event_type", _cents("value").alias("vc")
    )
    path = tempfile.mkdtemp(prefix="delta_imp_") + "/t"
    dl.write_delta(
        ev.repartitionByRange(4, "event_id")
        .sortWithinPartitions("event_id"),
        path, stats_cols=["event_id"],
    )
    dl.snapshot_import_delta(spark, path)
    snap.snapshot_write(
        ev.filter(F.col("event_id") % 5 == 0).select(
            (F.col("event_id") + 10_000_000).alias("event_id"),
            "event_type", (F.col("vc") + 1).alias("vc"),
        ),
        path, mode="append",
    )
    snap.snapshot_delete_where_dv(spark, path, [("event_id", 100, 999)])
    return snap.read_snapshot(spark, path).agg(
        F.count("*").alias("n_rows"),
        F.sum("vc").cast("long").alias("sum_vc"),
        F.expr("bit_xor(event_id)").alias("id_xor"),
    )


@_q("delta_export_digest", """
SELECT COUNT(*) AS n_rows,
       CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_vc,
       bit_xor(event_id) AS id_xor
FROM events
WHERE NOT (event_id >= 2000 AND event_id <= 3999)
""")
def q_delta_export_digest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The native→Delta hand-off bridge: events live in the ENGINE's
    snapshot log, a deletion-vector delete lands (merge-on-read —
    something the Delta export must MATERIALIZE), then
    ``snapshot_export_delta`` republishes the live state as one Delta
    commit and the digest reads back through the wire format. The
    oracle recomputes the post-delete state from the raw table."""
    import tempfile

    from harmony_energy_data_pipeline_spark.sinks import snapshots as snap
    from harmony_energy_data_pipeline_spark.sources import deltalake as dl

    ev = load_table(spark, "events", sf_dir).select(
        "event_id", "value"
    )
    sp = tempfile.mkdtemp(prefix="delta_exp_src_")
    dp = tempfile.mkdtemp(prefix="delta_exp_dst_") + "/t"
    snap.snapshot_write(
        ev.repartitionByRange(4, "event_id"), sp, stats_cols=["event_id"]
    )
    snap.snapshot_delete_where_dv(spark, sp, [("event_id", 2000, 3999)])
    dl.snapshot_export_delta(spark, sp, dp)
    return dl.read_delta(spark, dp).agg(
        F.count("*").alias("n_rows"),
        F.sum(_cents("value")).cast("long").alias("sum_vc"),
        F.expr("bit_xor(event_id)").alias("id_xor"),
    )


# --- hash-bucket layout in the snapshot log ----------------------------------------

@_q("snapshot_bucket_counts", """
SELECT CAST((md5_number_lower(CAST(c_custkey AS VARCHAR))
             % (1::HUGEINT << 60)) % 8 AS INT) AS bucket,
       COUNT(*) AS n_rows
FROM customer GROUP BY bucket
""")
def q_snapshot_bucket_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash-bucket layout end-to-end, proven from METADATA alone:
    customers commit bucketed by ``pmod(portable_hash60(c_custkey), 8)``
    (`sinks/snapshots.py: snapshot_write(bucket_by=…)`), and the
    per-bucket row counts come off the ``snapshot_files`` metadata
    table — file paths + recorded row counts, no data file opened.
    The oracle recomputes every row's bucket with DuckDB's own
    ``md5_number_lower``: a hash match means the physical routing,
    the manifest row counts, and the engine-portable hash all agree
    row-for-row — the contract bucket PRUNING rests on."""
    import tempfile

    from harmony_energy_data_pipeline_spark.sinks import snapshots as snap

    cust = load_table(spark, "customer", sf_dir).select(
        "c_custkey", "c_name"
    )
    path = tempfile.mkdtemp(prefix="snap_bucket_")
    snap.snapshot_write(
        cust.repartition(4), path, bucket_by=("c_custkey", 8),
        stats_cols=["c_custkey"],
    )
    return (
        snap.snapshot_files(spark, path)
        .groupBy("bucket")
        .agg(F.sum("n_rows").alias("n_rows"))
        .select(F.col("bucket").cast("int").alias("bucket"), "n_rows")
    )


@_q("snapshot_bucket_point_lookup", """
SELECT c_custkey, c_name,
       CAST(round(c_acctbal * 100) AS BIGINT) AS ab
FROM customer WHERE c_custkey = 7
""")
def q_snapshot_bucket_point_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point lookup on a hash-bucketed table: the equality predicate
    routes to ONE bucket at planning time (driver-side portable-hash
    mirror — no JVM round trip, no stats, no sketches), so the scan
    touches 1/8 of the files however the data is clustered; the
    residual filter keeps the read exact. The oracle scans the raw
    table. pytest (`test_snapshot_bucketed.py`) asserts the file-skip
    itself."""
    import tempfile

    from harmony_energy_data_pipeline_spark.sinks import snapshots as snap

    cust = load_table(spark, "customer", sf_dir).select(
        "c_custkey", "c_name", _cents("c_acctbal").alias("ab")
    )
    path = tempfile.mkdtemp(prefix="snap_bucket_pt_")
    snap.snapshot_write(cust.repartition(4), path,
                        bucket_by=("c_custkey", 8))
    return snap.read_snapshot(
        spark, path, where=[("c_custkey", 7, 7)]
    ).select("c_custkey", "c_name", "ab")


@_q("snapshot_bucket_merge_digest", """
WITH base AS (
  SELECT o_orderkey,
         CAST(round(o_totalprice * 100) AS BIGINT) AS tc
  FROM orders
)
SELECT COUNT(*) AS n_rows,
       CAST(SUM(CASE WHEN o_orderkey % 10 = 3 THEN tc * 2 ELSE tc END)
            AS BIGINT) AS sum_tc,
       bit_xor(o_orderkey) AS key_xor
FROM base
""")
def q_snapshot_bucket_merge_digest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE into a hash-bucketed table: the table commits bucketed by
    the merge key with NO membership sketches — file scoping comes
    from the layout alone (source keys route to their buckets
    driver-side; files in other buckets are provably key-free and
    carried untouched). The source doubles every ``key % 10 == 3``
    order's total; the oracle recomputes the merged state from
    scratch."""
    import tempfile

    from harmony_energy_data_pipeline_spark.sinks import snapshots as snap

    od = load_table(spark, "orders", sf_dir).select(
        "o_orderkey", _cents("o_totalprice").alias("tc")
    )
    path = tempfile.mkdtemp(prefix="snap_bucket_mrg_")
    snap.snapshot_write(od.repartition(4), path,
                        bucket_by=("o_orderkey", 16))
    src = od.filter(F.col("o_orderkey") % 10 == 3).withColumn(
        "tc", F.col("tc") * 2
    )
    snap.snapshot_merge_into(spark, path, src, key="o_orderkey")
    return snap.read_snapshot(spark, path).agg(
        F.count("*").alias("n_rows"),
        F.sum("tc").cast("long").alias("sum_tc"),
        F.expr("bit_xor(o_orderkey)").alias("key_xor"),
    )


# --- schema evolution through the snapshot log ------------------------------------

@_q("snapshot_schema_evolution_digest", """
SELECT COUNT(*) AS n_rows,
       CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_vc,
       CAST(SUM(CASE WHEN event_id % 2 = 1 THEN user_id ELSE 0 END) AS BIGINT)
           AS sum_user,
       COUNT(CASE WHEN event_id % 2 = 1 THEN user_id END) AS n_user_nonnull
FROM events
""")
def q_snapshot_schema_evolution_digest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Add-column schema evolution end-to-end: commit the even events
    WITHOUT user_id, append the odd events WITH it, read the table
    under the manifest's union schema — pre-evolution files backfill
    the new column as null. The digest counts non-null user_id rows
    (exactly the odd half) and sums it, proving null backfill and that
    no pre-evolution row leaked a value."""
    import tempfile

    from harmony_energy_data_pipeline_spark.sinks import snapshots as snap

    ev = load_table(spark, "events", sf_dir)
    path = tempfile.mkdtemp(prefix="snap_schema_")
    snap.snapshot_write(
        ev.filter(F.col("event_id") % 2 == 0).select("event_id", "value"), path
    )
    snap.snapshot_write(
        ev.filter(F.col("event_id") % 2 == 1).select(
            "event_id", "value", "user_id"
        ),
        path, mode="append",
    )
    full = snap.read_snapshot(spark, path)
    return full.agg(
        F.count("*").alias("n_rows"),
        F.sum(_cents("value")).cast("long").alias("sum_vc"),
        F.sum(F.coalesce(F.col("user_id"), F.lit(0))).cast("long").alias("sum_user"),
        F.count("user_id").alias("n_user_nonnull"),
    )


# --- incremental view maintenance over the snapshot log ---------------------------

@_q("ivm_incremental_agg", """
SELECT event_type, COUNT(*) AS n,
       CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_vc
FROM events GROUP BY event_type
""")
def q_ivm_incremental_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Materialized per-type aggregate maintained INCREMENTALLY: the
    source snapshot table grows in three commits (events split by
    event_id % 3); the first refresh computes the view in full, the
    next two fold only each append's CDC delta into the stored view
    (pipeline/ivm.py). The oracle recomputes the aggregate over the
    whole table from scratch — the hash match proves
    view ⊕ delta-partials ≡ full recompute, at O(delta + view)
    refresh cost instead of a table rescan."""
    import tempfile

    from harmony_energy_data_pipeline_spark.pipeline import ivm
    from harmony_energy_data_pipeline_spark.sinks import snapshots as snap

    ev = load_table(spark, "events", sf_dir).select(
        "event_id", "event_type", _cents("value").alias("vc")
    )
    src = tempfile.mkdtemp(prefix="ivm_src_")
    view = tempfile.mkdtemp(prefix="ivm_view_") + "/v"
    snap.snapshot_write(ev.filter(F.col("event_id") % 3 == 0), src)
    ivm.refresh_agg_view(spark, src, view, ["event_type"], ["vc"])
    snap.snapshot_write(
        ev.filter(F.col("event_id") % 3 == 1), src, mode="append"
    )
    ivm.refresh_agg_view(spark, src, view, ["event_type"], ["vc"])
    snap.snapshot_write(
        ev.filter(F.col("event_id") % 3 == 2), src, mode="append"
    )
    ivm.refresh_agg_view(spark, src, view, ["event_type"], ["vc"])
    return ivm.read_view(spark, view).select(
        "event_type", "n", F.col("sum_vc").cast("long").alias("sum_vc")
    )


@_q("ivm_hll_distinct_agg", f"""
WITH h AS (
  SELECT event_type,
         CAST(md5_number_lower(CAST(user_id AS VARCHAR))
              % {1 << 60} AS BIGINT) AS h
  FROM events WHERE user_id IS NOT NULL
),
b AS (SELECT event_type, h % 512 AS idx, h // 512 AS w FROM h),
reg AS (
  SELECT event_type, idx,
         MAX(CASE WHEN w = 0 THEN 52
                  ELSE 1 + bit_count((w & (-w)) - 1) END) AS r
  FROM b GROUP BY event_type, idx
),
agg AS (
  SELECT event_type, COUNT(*) AS n_registers,
         SUM((1::BIGINT) << (52 - r)) AS s
  FROM reg GROUP BY event_type
),
e AS (
  SELECT event_type, n_registers, 512 - n_registers AS v_zero,
         CAST(s + (512 - n_registers) * ((1::BIGINT) << 52) AS BIGINT)
             AS scaled_sum
  FROM agg
),
r2 AS (
  SELECT *, 0.7213 / (1.0 + 1.079 / 512.0) * 512.0 * 512.0
            * 4503599627370496.0 / CAST(scaled_sum AS DOUBLE) AS raw
  FROM e
)
SELECT event_type, n_registers, v_zero, scaled_sum,
       round(CASE WHEN v_zero > 0 AND raw <= 2.5 * 512.0
                  THEN 512.0 * ln(512.0 / CAST(v_zero AS DOUBLE))
                  ELSE raw END, 2) AS est
FROM r2
""")
def q_ivm_hll_distinct_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incrementally-maintained APPROX COUNT DISTINCT view
    (`pipeline/ivm.py: refresh_distinct_agg_view`): the view
    materializes per-group HLL registers; appends fold by the
    register merge law, which is EXACT — so after a 3-append chain
    maintained incrementally, the per-group estimate hash-matches the
    oracle's single-pass grouped sketch over the full table. COUNT
    DISTINCT is the canonical non-self-maintainable aggregate; the
    sketch view is the O(|delta|) maintenance shape for it."""
    import tempfile

    from harmony_energy_data_pipeline_spark.pipeline import ivm
    from harmony_energy_data_pipeline_spark.sinks import snapshots as snap

    ev = load_table(spark, "events", sf_dir).select(
        "event_id", "event_type", "user_id"
    )
    src = tempfile.mkdtemp(prefix="ivm_hll_src_")
    view = tempfile.mkdtemp(prefix="ivm_hll_view_") + "/v"
    for i in range(3):
        snap.snapshot_write(
            ev.filter(F.col("event_id") % 3 == i).repartition(4),
            src, mode="append" if i else "overwrite",
        )
        ivm.refresh_distinct_agg_view(
            spark, src, view, ["event_type"], "user_id"
        )
    return ivm.read_distinct_view(spark, view, ["event_type"])


@_q("ivm_histogram_agg", """
SELECT event_type,
       CAST(LEAST(GREATEST(FLOOR(value / 5.0), 0), 19) AS BIGINT) AS bin,
       COUNT(*) AS n
FROM events
WHERE NOT (event_id BETWEEN 1000 AND 1999)
GROUP BY event_type, bin
""")
def q_ivm_histogram_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incrementally-maintained per-key HISTOGRAM view
    (`pipeline/ivm.py: refresh_histogram_view`): bin counts fold
    SIGNED through the row-level change feed — two appends fold +1,
    then a deletion-vector delete folds −1 — so unlike MIN/MAX
    (rescan) or COUNT DISTINCT (sketch), every feed-expressible
    commit is absorbed exactly with no fallback. The oracle
    recomputes the final distribution from scratch; the hash match
    proves view ⊕ signed deltas ≡ recompute across an
    insert+insert+delete chain."""
    import tempfile

    from harmony_energy_data_pipeline_spark.pipeline import ivm
    from harmony_energy_data_pipeline_spark.sinks import snapshots as snap

    ev = load_table(spark, "events", sf_dir).select(
        "event_id", "event_type", "value"
    )
    src = tempfile.mkdtemp(prefix="ivm_hist_src_")
    view = tempfile.mkdtemp(prefix="ivm_hist_view_") + "/v"
    kw = dict(value_col="value", bin_width=5.0, n_bins=20)
    for i in range(2):
        snap.snapshot_write(
            ev.filter(F.col("event_id") % 2 == i).repartition(4),
            src, mode="append" if i else "overwrite",
            stats_cols=["event_id"],
        )
        ivm.refresh_histogram_view(
            spark, src, view, ["event_type"], **kw
        )
    snap.snapshot_delete_where_dv(spark, src, [("event_id", 1000, 1999)])
    ivm.refresh_histogram_view(spark, src, view, ["event_type"], **kw)
    return ivm.read_view(spark, view).select("event_type", "bin", "n")


@_q("ivm_topk_view", """
WITH src AS (
  SELECT event_type, event_id,
         CAST(round(value * 100) AS BIGINT) AS vc
  FROM events
), live AS (
  SELECT * FROM src WHERE vc < 14000 AND vc > 500
), ranked AS (
  SELECT event_type, event_id, vc,
         row_number() OVER (
           PARTITION BY event_type ORDER BY vc DESC, event_id
         ) AS rn
  FROM live
)
SELECT event_type, event_id, vc FROM ranked WHERE rn <= 5
""")
def q_ivm_topk_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incrementally-maintained per-key TOP-K view
    (`pipeline/ivm.py: refresh_topk_view`) — the leaderboard shape.
    The chain exercises every maintenance regime: two appends fold by
    re-ranking view ∪ delta (top-k is insert-monotone — O(|view|+|Δ|),
    never O(table)); a deletion-vector delete of the HIGH value band
    evicts retained rows, so those danger groups rescan the source
    (zone-map-pruned) while others fold; a second delete of the LOW
    band sits strictly below every group's retained threshold and is
    folded as a proven no-op. The oracle re-ranks the final live rows
    from scratch: the hash match proves the maintained leaderboard ≡
    recompute across insert+insert+delete+delete."""
    import tempfile

    from harmony_energy_data_pipeline_spark.pipeline import ivm
    from harmony_energy_data_pipeline_spark.sinks import snapshots as snap

    ev = load_table(spark, "events", sf_dir).select(
        "event_id", "event_type", _cents("value").alias("vc")
    )
    src = tempfile.mkdtemp(prefix="ivm_topk_src_")
    view = tempfile.mkdtemp(prefix="ivm_topk_view_") + "/v"
    kw = dict(keys=["event_type"], order_col="vc", k=5,
              tiebreak_cols=["event_id"])
    for i in range(2):
        snap.snapshot_write(
            ev.filter(F.col("event_id") % 2 == i).repartition(4),
            src, mode="append" if i else "overwrite",
            stats_cols=["event_type", "vc"],
        )
        ivm.refresh_topk_view(spark, src, view, **kw)
    # evict the top band: every group's retained set is hit → rescan
    snap.snapshot_delete_where_dv(spark, src, [("vc", 14000, None)])
    ivm.refresh_topk_view(spark, src, view, **kw)
    # prune the bottom band: below every threshold → pure fold
    snap.snapshot_delete_where_dv(spark, src, [("vc", None, 500)])
    ivm.refresh_topk_view(spark, src, view, **kw)
    return ivm.read_view(spark, view).select(
        "event_type", "event_id", "vc"
    )


@_q("ivm_minmax_agg", """
SELECT event_type, COUNT(*) AS n,
       CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_vc,
       MIN(CAST(round(value * 100) AS BIGINT)) AS min_vc,
       MAX(CAST(round(value * 100) AS BIGINT)) AS max_vc,
       CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS DOUBLE)
           / COUNT(*) AS avg_vc
FROM events
WHERE NOT (event_id % 97 = 0)
GROUP BY event_type
""")
def q_ivm_minmax_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVM past COUNT/SUM (round 7): the view tracks MIN/MAX/AVG too.
    The chain exercises BOTH maintenance regimes: two appends fold
    incrementally (inserts only tighten extrema — least/greatest
    merge; AVG re-derived from (n, sum) exactly), then a row-level
    DELETE evicts rows including per-group extrema — a non-append
    commit the CDC read refuses, so the refresh transparently falls
    back to a per-group rescan (the standard MIN/MAX caveat, handled).
    The oracle recomputes the final aggregate from scratch: the hash
    match proves view ⊕ deltas ⊕ fallback ≡ recompute across an
    insert+insert+delete chain."""
    import tempfile

    from harmony_energy_data_pipeline_spark.pipeline import ivm
    from harmony_energy_data_pipeline_spark.sinks import snapshots as snap

    ev = load_table(spark, "events", sf_dir).select(
        "event_id", "event_type", _cents("value").alias("vc")
    )
    src = tempfile.mkdtemp(prefix="ivm_mm_src_")
    view = tempfile.mkdtemp(prefix="ivm_mm_view_") + "/v"
    kw = dict(sum_cols=["vc"], min_cols=["vc"], max_cols=["vc"],
              avg_cols=["vc"])
    snap.snapshot_write(
        ev.filter(F.col("event_id") % 2 == 0).repartition(4, "event_id"),
        src, stats_cols=["event_id"],
    )
    ivm.refresh_agg_view(spark, src, view, ["event_type"], **kw)
    snap.snapshot_write(
        ev.filter(F.col("event_id") % 2 == 1).repartition(4, "event_id"),
        src, mode="append", stats_cols=["event_id"],
    )
    ivm.refresh_agg_view(spark, src, view, ["event_type"], **kw)
    # row-level delete of every 97th id (hits per-group extrema at
    # sf0.01): CDC refuses the rewrite, refresh recomputes
    from harmony_energy_data_pipeline_spark.sinks.snapshots import (
        snapshot_rewrite_matching,
    )

    snapshot_rewrite_matching(
        spark, src, [("event_id", 0, 10**12)],
        lambda df: df.filter(~(F.col("event_id") % 97 == 0)),
        operation="delete_mod97",
    )
    ivm.refresh_agg_view(spark, src, view, ["event_type"], **kw)
    return ivm.read_view(spark, view).select(
        "event_type", "n",
        F.col("sum_vc").cast("long").alias("sum_vc"),
        F.col("min_vc").cast("long").alias("min_vc"),
        F.col("max_vc").cast("long").alias("max_vc"),
        F.col("avg_vc").cast("double").alias("avg_vc"),
    )


@_q("ivm_cdf_delete_agg", """
SELECT event_type, COUNT(*) AS n,
       CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_vc,
       CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS DOUBLE)
           / COUNT(*) AS avg_vc
FROM events
WHERE NOT (event_id >= 1000 AND event_id <= 4999)
GROUP BY event_type
""")
def q_ivm_cdf_delete_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVM through a DELETE without recomputing (round 7): the source
    chain is append ⊕ append ⊕ deletion-vector delete; the refresh
    folds the DV commit's deleted rows — recovered row-level by the
    change feed (``read_snapshot_changes_feed``) — as SIGNED
    contributions into the stored COUNT/SUM/AVG view. The oracle
    recomputes the post-delete aggregate from scratch: the hash match
    proves view ⊕ inserts ⊖ deletes ≡ recompute, at O(|changes| +
    |view|) cost while the source table only ever grows."""
    import tempfile

    from harmony_energy_data_pipeline_spark.pipeline import ivm
    from harmony_energy_data_pipeline_spark.sinks import snapshots as snap

    ev = load_table(spark, "events", sf_dir).select(
        "event_id", "event_type", _cents("value").alias("vc")
    )
    src = tempfile.mkdtemp(prefix="ivm_cdf_src_")
    view = tempfile.mkdtemp(prefix="ivm_cdf_view_") + "/v"
    kw = dict(sum_cols=["vc"], avg_cols=["vc"])
    snap.snapshot_write(
        ev.filter(F.col("event_id") % 2 == 0)
        .repartitionByRange(4, "event_id"),
        src, stats_cols=["event_id"],
    )
    ivm.refresh_agg_view(spark, src, view, ["event_type"], **kw)
    snap.snapshot_write(
        ev.filter(F.col("event_id") % 2 == 1)
        .repartitionByRange(4, "event_id"),
        src, mode="append", stats_cols=["event_id"],
    )
    ivm.refresh_agg_view(spark, src, view, ["event_type"], **kw)
    snap.snapshot_delete_where_dv(spark, src, [("event_id", 1000, 4999)])
    ivm.refresh_agg_view(spark, src, view, ["event_type"], **kw)
    return ivm.read_view(spark, view).select(
        "event_type", "n",
        F.col("sum_vc").cast("long").alias("sum_vc"),
        F.col("avg_vc").cast("double").alias("avg_vc"),
    )


# --- replaceWhere: atomic predicate-region backfill --------------------------------

@_q("snapshot_replace_backfill_digest", """
SELECT COUNT(*) AS n_rows,
       CAST(SUM(CASE WHEN ts >= TIMESTAMP '2024-01-10 00:00:00'
                      AND ts <= TIMESTAMP '2024-01-13 00:00:00'
                     THEN CAST(round(value * 2 * 100) AS BIGINT)
                     ELSE CAST(round(value * 100) AS BIGINT) END) AS BIGINT)
           AS sum_vc,
       bit_xor(event_id) AS id_xor
FROM events
""")
def q_snapshot_replace_backfill_digest(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Atomic replaceWhere backfill end-to-end: commit events
    time-clustered with zone maps, then ``snapshot_replace_where`` a
    3-day window with corrected (doubled) readings — ONE commit whose
    effect is delete-the-region ⊕ insert-the-batch (the Delta
    ``replaceWhere`` shape), scoped by pruning to the files that can
    hold the window. Rerunning the same backfill would replace, not
    duplicate. The oracle recomputes the post-backfill state from the
    raw table; the digest proves the region swap is exact and
    everything outside the window is byte-identical."""
    import datetime as dt
    import tempfile

    from harmony_energy_data_pipeline_spark.sinks import snapshots as snap

    ev = load_table(spark, "events", sf_dir).select("event_id", "ts", "value")
    path = tempfile.mkdtemp(prefix="snap_rw_")
    snap.snapshot_write(
        ev, path, stats_cols=["ts"], cluster_by=["ts"], cluster_files=8,
    )
    lo, hi = dt.datetime(2024, 1, 10), dt.datetime(2024, 1, 13)
    corrected = ev.filter(
        (F.col("ts") >= lo) & (F.col("ts") <= hi)
    ).withColumn("value", F.col("value") * 2)
    snap.snapshot_replace_where(
        spark, path, [("ts", lo, hi)], corrected, record_cdf=True,
    )
    final = snap.read_snapshot(spark, path)
    return final.agg(
        F.count("*").alias("n_rows"),
        F.sum(_cents("value")).cast("long").alias("sum_vc"),
        F.expr("bit_xor(event_id)").alias("id_xor"),
    )


@_q("ivm_replace_where_agg", """
SELECT event_type, COUNT(*) AS n,
       CAST(SUM(CASE WHEN event_id >= 1000 AND event_id <= 4999
                     THEN 3 * CAST(round(value * 100) AS BIGINT)
                     ELSE CAST(round(value * 100) AS BIGINT) END) AS BIGINT)
           AS sum_vc
FROM events
GROUP BY event_type
""")
def q_ivm_replace_where_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVM through a BACKFILL without recomputing (round 7 third
    wave): the source chain is append ⊕ append ⊕
    ``snapshot_replace_where(record_cdf=True)`` — the backfill's
    staged change files (deleted pre-images + inserted corrections)
    make the copy-on-write commit row-level expressible, so the
    refresh folds it as signed contributions instead of rescanning
    the source. The oracle recomputes the post-backfill aggregate
    from scratch: the hash match proves view ⊕ feed ≡ recompute
    across a rewrite commit, the case the plain file-set CDC refuses
    by contract."""
    import tempfile

    from harmony_energy_data_pipeline_spark.pipeline import ivm
    from harmony_energy_data_pipeline_spark.sinks import snapshots as snap

    ev = load_table(spark, "events", sf_dir).select(
        "event_id", "event_type", _cents("value").alias("vc")
    )
    src = tempfile.mkdtemp(prefix="ivm_rw_src_")
    view = tempfile.mkdtemp(prefix="ivm_rw_view_") + "/v"
    snap.snapshot_write(
        ev.filter(F.col("event_id") % 2 == 0)
        .repartitionByRange(4, "event_id"),
        src, stats_cols=["event_id"],
    )
    ivm.refresh_agg_view(spark, src, view, ["event_type"], sum_cols=["vc"])
    snap.snapshot_write(
        ev.filter(F.col("event_id") % 2 == 1)
        .repartitionByRange(4, "event_id"),
        src, mode="append", stats_cols=["event_id"],
    )
    corrected = ev.filter(
        (F.col("event_id") >= 1000) & (F.col("event_id") <= 4999)
    ).withColumn("vc", F.col("vc") * 3)
    snap.snapshot_replace_where(
        spark, src, [("event_id", 1000, 4999)], corrected, record_cdf=True,
    )
    ivm.refresh_agg_view(spark, src, view, ["event_type"], sum_cols=["vc"])
    return ivm.read_view(spark, view).select(
        "event_type", "n", F.col("sum_vc").cast("long").alias("sum_vc")
    )


@_q("ivm_minmax_mor_fold_agg", """
WITH t AS (
  SELECT event_type,
         CASE WHEN event_id >= 2000 AND event_id <= 2999
              THEN CAST(round(value * 100) AS BIGINT) + 500
              ELSE CAST(round(value * 100) AS BIGINT) END AS vc
  FROM events)
SELECT event_type, COUNT(*) AS n,
       CAST(SUM(vc) AS BIGINT) AS sum_vc,
       MIN(vc) AS min_vc, MAX(vc) AS max_vc
FROM t GROUP BY event_type
""")
def q_ivm_minmax_mor_fold_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MIN/MAX views through an UPDATE (round 7 third wave): the
    source takes a merge-on-read update (delete ⊕ insert in the
    change feed); the refresh folds it when no deleted pre-image sits
    at its group's combined extremum (checked exactly —
    ``_deletes_touch_extrema``) and recomputes only on a potential
    eviction, so MIN/MAX views ride the same O(|changes| + |view|)
    fast path as COUNT/SUM for interior changes. The oracle
    recomputes the post-update aggregate from the raw table."""
    import tempfile

    from harmony_energy_data_pipeline_spark.pipeline import ivm
    from harmony_energy_data_pipeline_spark.sinks import snapshots as snap

    ev = load_table(spark, "events", sf_dir).select(
        "event_id", "event_type", _cents("value").alias("vc")
    )
    src = tempfile.mkdtemp(prefix="ivm_mm_src_")
    view = tempfile.mkdtemp(prefix="ivm_mm_view_") + "/v"
    kw = dict(sum_cols=["vc"], min_cols=["vc"], max_cols=["vc"])
    snap.snapshot_write(
        ev.repartitionByRange(4, "event_id"), src, stats_cols=["event_id"],
    )
    ivm.refresh_agg_view(spark, src, view, ["event_type"], **kw)
    snap.snapshot_update_where_dv(
        spark, src, [("event_id", 2000, 2999)],
        {"vc": F.col("vc") + 500},
    )
    ivm.refresh_agg_view(spark, src, view, ["event_type"], **kw)
    return ivm.read_view(spark, view).select(
        "event_type", "n",
        F.col("sum_vc").cast("long").alias("sum_vc"),
        F.col("min_vc").cast("long").alias("min_vc"),
        F.col("max_vc").cast("long").alias("max_vc"),
    )


# --- manifest-only aggregates -------------------------------------------------------

@_q("snapshot_metadata_agg_digest", """
SELECT (SELECT COUNT(*) FROM events) AS n_all,
       (SELECT COUNT(*) FROM events
        WHERE NOT (event_id >= 200 AND event_id <= 299)) AS n_after,
       (SELECT MIN(event_id) FROM events) AS min_id,
       (SELECT MAX(event_id) FROM events) AS max_id
""")
def q_snapshot_metadata_agg_digest(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Manifest-only aggregates (round 7 third wave): COUNT(*) and
    MIN/MAX answered from recorded file stats with ZERO data scanned —
    the metadata-only query a 100 TB table must serve (stats_cols
    commits record per-file row counts; deletion vectors subtract
    exactly via their own footers). The Spark side queries the
    manifest at two versions — before and after a DV delete — and the
    oracle recomputes the same four numbers relationally; the match
    proves the metadata answers are exact, not estimates."""
    import tempfile

    from harmony_energy_data_pipeline_spark.sinks import snapshots as snap

    ev = load_table(spark, "events", sf_dir).select("event_id", "event_type")
    path = tempfile.mkdtemp(prefix="snap_meta_")
    snap.snapshot_write(
        ev, path, stats_cols=["event_id"], cluster_by=["event_id"],
        cluster_files=6,
    )
    snap.snapshot_delete_where_dv(
        spark, path, [("event_id", 200, 299)]
    )
    before = snap.snapshot_stats_agg(path, cols=["event_id"], version=0)
    after = snap.snapshot_stats_agg(path, version=1)
    return spark.createDataFrame(
        [(
            int(before["n_rows"]), int(after["n_rows"]),
            int(before["min"]["event_id"]), int(before["max"]["event_id"]),
        )],
        "n_all long, n_after long, min_id long, max_id long",
    )


@_q("snapshot_clone_digest", """
SELECT (SELECT COUNT(*) FROM events) AS n_src,
       (SELECT CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
        FROM events) AS sum_src,
       (SELECT COUNT(*) FROM events
        WHERE NOT (event_id >= 100 AND event_id <= 399)) AS n_clone,
       (SELECT CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
        FROM events
        WHERE NOT (event_id >= 100 AND event_id <= 399)) AS sum_clone
""")
def q_snapshot_clone_digest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ZERO-COPY shallow clone (round 7 third wave): branch an events
    table with one manifest write (no data copied), merge-on-read
    delete a key range ON THE BRANCH — the vectors cover borrowed
    foreign-root files through the canonical data/-suffix identity —
    and digest both tables: the source must be byte-identical to
    before the branch, the branch must reflect exactly its own
    delete. The dev/test branching primitive a 100 TB production
    table needs."""
    import tempfile

    from harmony_energy_data_pipeline_spark.sinks import snapshots as snap

    ev = load_table(spark, "events", sf_dir).select("event_id", "value")
    base = tempfile.mkdtemp(prefix="snap_clone_")
    src, dst = base + "/src", base + "/dst"
    snap.snapshot_write(
        ev, src, stats_cols=["event_id"], cluster_by=["event_id"],
        cluster_files=6,
    )
    snap.snapshot_clone(src, dst)
    snap.snapshot_delete_where_dv(spark, dst, [("event_id", 100, 399)])
    s = snap.read_snapshot(spark, src).agg(
        F.count("*").alias("n_src"),
        F.sum(_cents("value")).cast("long").alias("sum_src"),
    )
    c = snap.read_snapshot(spark, dst).agg(
        F.count("*").alias("n_clone"),
        F.sum(_cents("value")).cast("long").alias("sum_clone"),
    )
    return s.crossJoin(c)


# --- HyperLogLog: portable integer-exact registers + merge ------------------------

_HLL_ORACLE_BODY = """
b AS (SELECT h % 512 AS idx, h // 512 AS w FROM h),
reg AS (
  SELECT idx, MAX(CASE WHEN w = 0 THEN 52
                       ELSE 1 + bit_count((w & (-w)) - 1) END) AS r
  FROM b GROUP BY idx
),
agg AS (
  SELECT COUNT(*) AS n_registers, SUM((1::BIGINT) << (52 - r)) AS s FROM reg
),
e AS (
  SELECT n_registers, 512 - n_registers AS v_zero,
         CAST(s + (512 - n_registers) * ((1::BIGINT) << 52) AS BIGINT)
             AS scaled_sum
  FROM agg
),
r2 AS (
  SELECT *, 0.7213 / (1.0 + 1.079 / 512.0) * 512.0 * 512.0
            * 4503599627370496.0 / CAST(scaled_sum AS DOUBLE) AS raw
  FROM e
)
SELECT n_registers, v_zero, scaled_sum,
       round(CASE WHEN v_zero > 0 AND raw <= 2.5 * 512.0
                  THEN 512.0 * ln(512.0 / CAST(v_zero AS DOUBLE))
                  ELSE raw END, 2) AS est
FROM r2
"""


@_q("hll_distinct_events", f"""
WITH h AS (
  SELECT CAST(md5_number_lower(CAST(event_id AS VARCHAR))
              % {1 << 60} AS BIGINT) AS h
  FROM events
),
{_HLL_ORACLE_BODY}
""")
def q_hll_distinct_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog distinct-count sketch over event ids. Every
    register value is PURE integer arithmetic (portable 60-bit md5
    hash, trailing-zero rank via bit_count, shiftleft indicator
    sums), so the register table — and hence the estimate — is
    bit-identical on any engine: an approximate-cardinality sketch
    that passes an exact-equality oracle. One map-combined groupBy
    onto 512 rows regardless of input size."""
    from harmony_energy_data_pipeline_spark.operators.analytics import (
        hll_estimate,
        hll_registers,
    )

    ev = load_table(spark, "events", sf_dir)
    return hll_estimate(hll_registers(ev, "event_id"))


@_q("hll_merge_shards", f"""
WITH h AS (
  SELECT CAST(md5_number_lower(CAST(event_id AS VARCHAR))
              % {1 << 60} AS BIGINT) AS h
  FROM events
),
{_HLL_ORACLE_BODY}
""")
def q_hll_merge_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL mergeability, checked literally: sketch the even and odd
    event-id shards INDEPENDENTLY, merge by element-wise register
    max, and estimate. The oracle sketches the whole table in one
    pass — the hash match proves merge(shard sketches) ≡
    sketch(union) exactly, the distributive contract that lets every
    executor sketch locally and a 512-row union finish the job."""
    from harmony_energy_data_pipeline_spark.operators.analytics import (
        hll_estimate,
        hll_merge,
        hll_registers,
    )

    ev = load_table(spark, "events", sf_dir)
    evens = hll_registers(ev.filter(F.col("event_id") % 2 == 0), "event_id")
    odds = hll_registers(ev.filter(F.col("event_id") % 2 == 1), "event_id")
    return hll_estimate(hll_merge(evens, odds))


# --- membership-sketch (Bloom-style) equality pruning ------------------------------

@_q("snapshot_member_pruned_scan", """
SELECT COUNT(*) AS n_rows,
       CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_vc,
       bit_xor(event_id) AS id_xor
FROM events WHERE event_type = 'purchase'
""")
def q_snapshot_member_pruned_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equality-predicate file skipping: commit events hash-clustered
    by type with per-file membership bitmaps, then point-look-up one
    type through ``read_snapshot(where=[(col, v, v)])`` — the sketch
    skips every file whose bitmap proves the value absent, which zone
    maps cannot do for unsorted domains. Oracle filters the raw
    table; pytest (`test_member_sketch.py`) asserts the skip."""
    import tempfile

    from harmony_energy_data_pipeline_spark.sinks import snapshots as snap

    ev = load_table(spark, "events", sf_dir).select(
        "event_id", "event_type", "value"
    )
    path = tempfile.mkdtemp(prefix="snap_member_")
    snap.snapshot_write(
        ev.repartition(8, "event_type"), path, member_cols=["event_type"]
    )
    pruned = snap.read_snapshot(
        spark, path, where=[("event_type", "purchase", "purchase")]
    )
    return pruned.agg(
        F.count("*").alias("n_rows"),
        F.sum(_cents("value")).cast("long").alias("sum_vc"),
        F.expr("bit_xor(event_id)").alias("id_xor"),
    )


# --- row-level delete/update scoped to affected files ------------------------------

@_q("snapshot_delete_update_digest", """
SELECT COUNT(*) AS n_rows,
       CAST(SUM(CASE WHEN ts >= TIMESTAMP '2024-01-20 00:00:00'
                      AND ts <= TIMESTAMP '2024-01-22 00:00:00'
                     THEN CAST(round(value * 10 * 100) AS BIGINT)
                     ELSE CAST(round(value * 100) AS BIGINT) END) AS BIGINT)
           AS sum_vc,
       bit_xor(event_id) AS id_xor
FROM events
WHERE NOT (ts >= TIMESTAMP '2024-01-05 00:00:00'
           AND ts <= TIMESTAMP '2024-01-07 00:00:00')
""")
def q_snapshot_delete_update_digest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Copy-on-write row-level operations end-to-end: commit events
    time-clustered with zone maps, DELETE a 2-day window, then UPDATE
    another window (value ×10) — each rewrite touches only the files
    whose recorded stats can contain matching rows
    (``snapshot_rewrite_matching``), the 100 TB cost model where a
    targeted delete never means rewriting the lake. The oracle
    recomputes the final state from the raw table; the digest covers
    both the deletion (row set) and the update (scaled cents sum)."""
    import datetime as dt
    import tempfile

    from harmony_energy_data_pipeline_spark.sinks import snapshots as snap

    ev = load_table(spark, "events", sf_dir).select("event_id", "ts", "value")
    path = tempfile.mkdtemp(prefix="snap_rowops_")
    snap.snapshot_write(
        ev.repartitionByRange(8, "ts").sortWithinPartitions("ts"),
        path, stats_cols=["ts"],
    )
    snap.snapshot_delete_where(
        spark, path,
        [("ts", dt.datetime(2024, 1, 5), dt.datetime(2024, 1, 7))],
    )
    snap.snapshot_update_where(
        spark, path,
        [("ts", dt.datetime(2024, 1, 20), dt.datetime(2024, 1, 22))],
        {"value": F.col("value") * 10},
    )
    final = snap.read_snapshot(spark, path)
    return final.agg(
        F.count("*").alias("n_rows"),
        F.sum(_cents("value")).cast("long").alias("sum_vc"),
        F.expr("bit_xor(event_id)").alias("id_xor"),
    )


# --- streaming FROM a snapshot table (the Delta streaming-source shape) ------------

@_q("snapshot_stream_digest", """
SELECT COUNT(*) AS n_rows,
       CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_vc,
       bit_xor(event_id) AS id_xor
FROM events
""")
def q_snapshot_stream_digest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Table→table streaming: events committed to a snapshot table in
    two versions, then streamed OUT through the registered
    ``snapshot_table`` DataSource (initial snapshot + version-tail
    offsets, one distributed partition per added file) INTO a second
    snapshot table via the exactly-once append sink. The oracle
    recomputes the digest over the raw events — the hash match proves
    the stream delivered every row exactly once through the full
    source→sink handoff."""
    import tempfile

    from harmony_energy_data_pipeline_spark.sinks import snapshots as snap
    from harmony_energy_data_pipeline_spark.sources.snapstream import (
        SnapshotTableDataSource,
    )
    from harmony_energy_data_pipeline_spark.streaming.incremental import (
        start_snapshot_append_sink,
    )

    try:
        spark.dataSource.register(SnapshotTableDataSource)
    except Exception:
        pass  # already registered in this session
    ev = load_table(spark, "events", sf_dir).select(
        "event_id", _cents("value").alias("vc")
    )
    base = tempfile.mkdtemp()
    src = base + "/src"
    dst = base + "/dst"
    snap.snapshot_write(ev.filter(F.col("event_id") % 2 == 0), src)
    snap.snapshot_write(
        ev.filter(F.col("event_id") % 2 == 1), src, mode="append"
    )
    stream = (
        spark.readStream.format("snapshot_table").option("path", src).load()
    )
    q = start_snapshot_append_sink(
        stream, dst, base + "/ck", available_now=True
    )
    q.awaitTermination(180)
    return snap.read_snapshot(spark, dst).agg(
        F.count("*").alias("n_rows"),
        F.sum("vc").cast("long").alias("sum_vc"),
        F.expr("bit_xor(event_id)").alias("id_xor"),
    )


@_q("snapshot_change_stream_digest", """
WITH changes AS (
  SELECT event_id, CAST(round(value * 100) AS BIGINT) AS vc, 1 AS sign
  FROM events WHERE event_id % 2 = 1
  UNION ALL
  SELECT event_id, CAST(round(value * 100) AS BIGINT) AS vc, -1 AS sign
  FROM events
  WHERE ts >= TIMESTAMP '2024-01-05 00:00:00'
    AND ts <= TIMESTAMP '2024-01-07 00:00:00'
)
SELECT COUNT(*) AS n_changes,
       CAST(SUM(sign * vc) AS BIGINT) AS signed_vc,
       bit_xor(event_id) AS id_xor
FROM changes
""")
def q_snapshot_change_stream_digest(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """STREAMING change feed (the Delta ``readChangeFeed`` stream
    shape, round 7 third wave): a snapshot table takes an append and
    then a deletion-vector delete; the registered ``snapshot_table``
    source with ``read_changes=true`` tails both commits ROW-LEVEL —
    the append as inserts, the DV commit's deleted rows recovered
    executor-side by position-taking each covered file — and lands
    them (with ``_change_type``/``_commit_version``) in a second
    snapshot table through the exactly-once append sink. The oracle
    reconstructs the same change set relationally from the raw
    events; the signed digest proves a downstream incremental
    consumer can follow deletes without ever rescanning the source."""
    import datetime as dt
    import tempfile

    from harmony_energy_data_pipeline_spark.sinks import snapshots as snap
    from harmony_energy_data_pipeline_spark.sources.snapstream import (
        SnapshotTableDataSource,
    )
    from harmony_energy_data_pipeline_spark.streaming.incremental import (
        start_snapshot_append_sink,
    )

    try:
        spark.dataSource.register(SnapshotTableDataSource)
    except Exception:
        pass  # already registered in this session
    ev = load_table(spark, "events", sf_dir).select(
        "event_id", "ts", _cents("value").alias("vc")
    )
    base = tempfile.mkdtemp()
    src = base + "/src"
    dst = base + "/dst"
    snap.snapshot_write(
        ev.filter(F.col("event_id") % 2 == 0)
        .repartitionByRange(4, "ts").sortWithinPartitions("ts"),
        src, stats_cols=["ts"],
    )                                                     # v0 (pre-stream)
    snap.snapshot_write(
        ev.filter(F.col("event_id") % 2 == 1), src, mode="append"
    )                                                     # v1: inserts
    snap.snapshot_delete_where_dv(
        spark, src,
        [("ts", dt.datetime(2024, 1, 5), dt.datetime(2024, 1, 7))],
    )                                                     # v2: deletes
    stream = (
        spark.readStream.format("snapshot_table").option("path", src)
        .option("read_changes", "true").option("starting_version", "0")
        .load()
    )
    q = start_snapshot_append_sink(
        stream, dst, base + "/ck", available_now=True
    )
    q.awaitTermination(180)
    changes = snap.read_snapshot(spark, dst)
    sign = F.when(F.col("_change_type") == "delete", F.lit(-1)).otherwise(
        F.lit(1)
    )
    return changes.agg(
        F.count("*").alias("n_changes"),
        F.sum(sign * F.col("vc")).cast("long").alias("signed_vc"),
        F.expr("bit_xor(event_id)").alias("id_xor"),
    )


@_q("snapshot_stream_upsert_agg", """
SELECT event_type, COUNT(*) AS n,
       CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_vc
FROM events
GROUP BY event_type
""")
def q_snapshot_stream_upsert_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming UPSERT sink (the foreachBatch-MERGE pattern as a
    first-class sink, round 7 third wave): an UPDATE-mode streaming
    aggregation over the snapshot-table source lands in a second
    table via keyed merge — the table holds the CURRENT aggregate per
    key (one row per key), not accumulated intermediates. Two runs
    off one checkpoint (initial snapshot, then a tail of the appended
    half) prove the incremental path: the second run merges only the
    updated aggregates. The oracle recomputes the final aggregate
    relationally."""
    import tempfile

    from harmony_energy_data_pipeline_spark.sinks import snapshots as snap
    from harmony_energy_data_pipeline_spark.sources.snapstream import (
        SnapshotTableDataSource,
    )
    from harmony_energy_data_pipeline_spark.streaming.incremental import (
        start_snapshot_upsert_sink,
    )

    try:
        spark.dataSource.register(SnapshotTableDataSource)
    except Exception:
        pass  # already registered in this session
    ev = load_table(spark, "events", sf_dir).select(
        "event_id", "event_type", _cents("value").alias("vc")
    )
    base = tempfile.mkdtemp(prefix="snap_upsink_")
    src, dst, ck = base + "/src", base + "/dst", base + "/ck"

    def run_once():
        agg = (
            spark.readStream.format("snapshot_table").option("path", src)
            .load()
            .groupBy("event_type")
            .agg(
                F.count("*").alias("n"),
                F.sum("vc").cast("long").alias("sum_vc"),
            )
        )
        q = start_snapshot_upsert_sink(
            agg, dst, ck, key="event_type", member_cols=["event_type"],
            available_now=True,
        )
        q.awaitTermination(180)

    snap.snapshot_write(ev.filter(F.col("event_id") % 2 == 0), src)
    run_once()
    snap.snapshot_write(
        ev.filter(F.col("event_id") % 2 == 1), src, mode="append"
    )
    run_once()
    return snap.read_snapshot(spark, dst).select("event_type", "n", "sum_vc")


# --- merge-on-read deletes (deletion vectors) --------------------------------------

@_q("snapshot_delete_dv_digest", """
SELECT COUNT(*) AS n_rows,
       CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_vc,
       bit_xor(event_id) AS id_xor
FROM events
WHERE NOT (ts >= TIMESTAMP '2024-01-05 00:00:00'
           AND ts <= TIMESTAMP '2024-01-07 00:00:00')
""")
def q_snapshot_delete_dv_digest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merge-on-read DELETE end-to-end: commit events time-clustered
    with zone maps, then ``snapshot_delete_where_dv`` a 2-day window —
    no data file is rewritten; the commit records positional delete
    vectors (file, row_index) that readers subtract with an anti join
    (the Iceberg-v2/Delta-DV shape, write cost O(matched rows) instead
    of O(touched file bytes)). The oracle recomputes the post-delete
    state from the raw table, so the digest proves the DV read path
    returns exactly the copy-on-write result."""
    import datetime as dt
    import tempfile

    from harmony_energy_data_pipeline_spark.sinks import snapshots as snap

    ev = load_table(spark, "events", sf_dir).select("event_id", "ts", "value")
    path = tempfile.mkdtemp(prefix="snap_dv_")
    snap.snapshot_write(
        ev.repartitionByRange(8, "ts").sortWithinPartitions("ts"),
        path, stats_cols=["ts"],
    )
    snap.snapshot_delete_where_dv(
        spark, path,
        [("ts", dt.datetime(2024, 1, 5), dt.datetime(2024, 1, 7))],
    )
    final = snap.read_snapshot(spark, path)
    return final.agg(
        F.count("*").alias("n_rows"),
        F.sum(_cents("value")).cast("long").alias("sum_vc"),
        F.expr("bit_xor(event_id)").alias("id_xor"),
    )


@_q("snapshot_update_mor_digest", """
SELECT COUNT(*) AS n_rows,
       CAST(SUM(CASE WHEN ts >= TIMESTAMP '2024-01-20 00:00:00'
                      AND ts <= TIMESTAMP '2024-01-22 00:00:00'
                     THEN CAST(round(value * 10 * 100) AS BIGINT)
                     ELSE CAST(round(value * 100) AS BIGINT) END) AS BIGINT)
           AS sum_vc,
       bit_xor(event_id) AS id_xor
FROM events
""")
def q_snapshot_update_mor_digest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE-ON-READ UPDATE end-to-end: one commit deletion-vectors
    the matching rows and appends their transformed versions
    (``snapshot_update_where_dv``, the Iceberg-v2 MOR shape) — write
    cost O(matched rows), no touched-file rewrite. The oracle
    recomputes the post-update state from the raw table; the digest
    proves the vector-subtract ⊕ appended-rows read path equals a
    copy-on-write update exactly."""
    import datetime as dt
    import tempfile

    from harmony_energy_data_pipeline_spark.sinks import snapshots as snap

    ev = load_table(spark, "events", sf_dir).select("event_id", "ts", "value")
    path = tempfile.mkdtemp(prefix="snap_mor_")
    snap.snapshot_write(
        ev.repartitionByRange(8, "ts").sortWithinPartitions("ts"),
        path, stats_cols=["ts"],
    )
    snap.snapshot_update_where_dv(
        spark, path,
        [("ts", dt.datetime(2024, 1, 20), dt.datetime(2024, 1, 22))],
        {"value": F.col("value") * 10},
    )
    final = snap.read_snapshot(spark, path)
    return final.agg(
        F.count("*").alias("n_rows"),
        F.sum(_cents("value")).cast("long").alias("sum_vc"),
        F.expr("bit_xor(event_id)").alias("id_xor"),
    )


# --- key-scoped MERGE INTO through membership sketches -----------------------------

@_q("snapshot_merge_into_digest", """
WITH final AS (
  SELECT event_id,
         CASE WHEN event_id % 5 = 0 THEN value * 10 ELSE value END AS value
  FROM events
  UNION ALL
  SELECT event_id + 1000000, value FROM events WHERE event_id % 7 = 0
)
SELECT COUNT(*) AS n_rows,
       CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_vc,
       bit_xor(event_id) AS id_xor
FROM final
""")
def q_snapshot_merge_into_digest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE INTO end-to-end: commit events key-hashed with
    membership sketches, then merge a source of revisions (every 5th
    id, value ×10) plus inserts (every 7th id, shifted key) —
    ``snapshot_merge_into`` rewrites only the files whose sketches
    intersect the source keys' hash buckets (source-wins upsert, the
    J1 contract at lake scale). The oracle recomputes the post-merge
    state from the raw table."""
    import tempfile

    from harmony_energy_data_pipeline_spark.sinks import snapshots as snap

    ev = load_table(spark, "events", sf_dir).select("event_id", "value")
    path = tempfile.mkdtemp(prefix="snap_merge_")
    snap.snapshot_write(
        ev.repartition(8, "event_id"), path, member_cols=["event_id"]
    )
    updates = ev.filter(F.col("event_id") % 5 == 0).withColumn(
        "value", F.col("value") * 10
    )
    inserts = ev.filter(F.col("event_id") % 7 == 0).select(
        (F.col("event_id") + 1000000).alias("event_id"), "value"
    )
    snap.snapshot_merge_into(
        spark, path, updates.unionByName(inserts), key="event_id"
    )
    final = snap.read_snapshot(spark, path)
    return final.agg(
        F.count("*").alias("n_rows"),
        F.sum(_cents("value")).cast("long").alias("sum_vc"),
        F.expr("bit_xor(event_id)").alias("id_xor"),
    )


# --- metadata-only stats backfill then pruned scan ---------------------------------

@_q("snapshot_backfill_pruned_scan", """
SELECT COUNT(*) AS n_rows,
       CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_vc,
       bit_xor(event_id) AS id_xor
FROM events
WHERE ts >= TIMESTAMP '2024-01-16 00:00:00'
  AND ts <= TIMESTAMP '2024-01-19 00:00:00'
""")
def q_snapshot_backfill_pruned_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retroactive prunability: commit events time-clustered WITHOUT
    any stats tracking (a legacy table), then add zone maps via the
    metadata-only ``snapshot_backfill_stats`` commit (same files,
    empty CDC delta, no data rewrite) and read a 3-day window through
    the pruned path. The oracle filters the raw table — proving the
    backfilled maps change scan cost, never results."""
    import datetime as dt
    import tempfile

    from harmony_energy_data_pipeline_spark.sinks import snapshots as snap

    ev = load_table(spark, "events", sf_dir).select("event_id", "ts", "value")
    path = tempfile.mkdtemp(prefix="snap_backfill_")
    snap.snapshot_write(
        ev.repartitionByRange(8, "ts").sortWithinPartitions("ts"), path
    )
    snap.snapshot_backfill_stats(spark, path, stats_cols=["ts"])
    pruned = snap.read_snapshot(
        spark, path,
        where=[("ts", dt.datetime(2024, 1, 16), dt.datetime(2024, 1, 19))],
    )
    return pruned.agg(
        F.count("*").alias("n_rows"),
        F.sum(_cents("value")).cast("long").alias("sum_vc"),
        F.expr("bit_xor(event_id)").alias("id_xor"),
    )


# --- round 8: join IVM, partition pruning, schema evolution, capped stream -


@_q("ivm_join_agg", """
SELECT c_mktsegment, COUNT(*) AS n,
       CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
           AS sum_tc,
       CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS DOUBLE)
           / COUNT(*) AS avg_tc
FROM orders JOIN customer ON o_custkey = c_custkey
WHERE NOT (o_orderkey >= 1 AND o_orderkey <= 1000)
GROUP BY c_mktsegment
""")
def q_ivm_join_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVM over a JOIN (round 8): a fact ⋈ dim aggregate view
    maintained by DELTA-JOIN — the appended fact rows (only) join the
    dimension and fold into the stored view, and a deletion-vector
    fact delete folds SIGNED through the same join via the row-level
    change feed. The chain is fact-append ⊕ fact-append ⊕ DV-delete
    with the dimension static; the oracle recomputes the final join
    aggregate from scratch, so the hash match proves
    view ⊕ (ΔF ⋈ D) ⊖ (deletes ⋈ D) ≡ γ(F ⋈ D). Refresh cost is
    O(|ΔF| ⋈ D + |view|) — the fact history is never rescanned."""
    import tempfile

    from harmony_energy_data_pipeline_spark.pipeline import ivm
    from harmony_energy_data_pipeline_spark.sinks import snapshots as snap

    fact = load_table(spark, "orders", sf_dir).select(
        "o_orderkey", "o_custkey", _cents("o_totalprice").alias("tc")
    )
    dim = load_table(spark, "customer", sf_dir).select(
        "c_custkey", "c_mktsegment"
    )
    base = tempfile.mkdtemp(prefix="ivm_join_")
    fp, dp, vp = base + "/f", base + "/d", base + "/v"
    snap.snapshot_write(dim, dp)
    snap.snapshot_write(
        fact.filter(F.col("o_orderkey") % 2 == 0).coalesce(2), fp
    )
    kw = dict(on={"o_custkey": "c_custkey"}, keys=["c_mktsegment"],
              sum_cols=["tc"], avg_cols=["tc"])
    ivm.refresh_join_agg_view(spark, fp, dp, vp, **kw)
    snap.snapshot_write(
        fact.filter(F.col("o_orderkey") % 2 == 1).coalesce(2),
        fp, mode="append",
    )
    ivm.refresh_join_agg_view(spark, fp, dp, vp, **kw)  # ΔF ⋈ D fold
    snap.snapshot_delete_where_dv(spark, fp, [("o_orderkey", 1, 1000)])
    ivm.refresh_join_agg_view(spark, fp, dp, vp, **kw)  # signed fold
    return ivm.read_view(spark, vp).select(
        "c_mktsegment", "n",
        F.col("sum_tc").cast("long").alias("sum_tc"),
        F.col("avg_tc").cast("double").alias("avg_tc"),
    )


@_q("partition_pruned_scan", """
SELECT COUNT(*) AS n_rows,
       CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_vc,
       bit_xor(event_id) AS id_xor
FROM events
WHERE event_type = 'click'
""")
def q_partition_pruned_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hive partition pruning (round 8): events land partitioned by
    event_type (``partition_by=`` — values live in file PATHS, zero
    manifest bloat, no stats needed), and an equality read plans only
    that partition's files — EXACT pruning, where zone maps would
    need clustered data. An unpartitioned append is mixed in to prove
    the conservative path: its files carry the column as data, are
    always kept by the planner, and the residual filter keeps the
    result exact. The oracle recomputes over the raw events."""
    import tempfile

    from harmony_energy_data_pipeline_spark.sinks import snapshots as snap

    ev = load_table(spark, "events", sf_dir).select(
        "event_id", "event_type", "value"
    )
    path = tempfile.mkdtemp(prefix="snap_part_") + "/t"
    snap.snapshot_write(
        ev.filter(F.col("event_id") % 3 != 0), path,
        partition_by=["event_type"],
    )
    snap.snapshot_write(
        ev.filter(F.col("event_id") % 3 == 0).coalesce(1),
        path, mode="append",
    )
    kept, total = snap.prune_files(
        path, [("event_type", "click", "click")]
    )
    assert len(kept) < total, "partition pruning skipped nothing"
    pruned = snap.read_snapshot(
        spark, path, where=[("event_type", "click", "click")]
    )
    return pruned.agg(
        F.count("*").alias("n_rows"),
        F.sum(_cents("value")).cast("long").alias("sum_vc"),
        F.expr("bit_xor(event_id)").alias("id_xor"),
    )


@_q("schema_evolution_digest", """
SELECT user_id AS uid, COUNT(*) AS n,
       CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_vc
FROM events
GROUP BY user_id
""")
def q_schema_evolution_digest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rename + type widening, end to end (round 8): half the events
    commit with an INT cents column under the original column name;
    the table then RENAMES user_id→uid (metadata-only name-lineage
    mapping) and WIDENS the cents column int→long (metadata-only —
    old files read upcast); the second half appends under the NEW
    name with the WIDER type. The final read dual-looks-up both eras'
    files and the oracle recomputes the same aggregate from the raw
    events — the hash match proves both evolutions are lossless and
    zero-copy."""
    import tempfile

    from harmony_energy_data_pipeline_spark.sinks import snapshots as snap

    ev = load_table(spark, "events", sf_dir).select(
        "event_id", "user_id",
        _cents("value").cast("int").alias("vc"),
    )
    path = tempfile.mkdtemp(prefix="snap_evo_") + "/t"
    snap.snapshot_write(
        ev.filter(F.col("event_id") % 2 == 0).coalesce(2), path,
        stats_cols=["user_id"],
    )
    snap.snapshot_rename_column(path, "user_id", "uid")
    snap.snapshot_widen_column(path, "vc", "long")
    snap.snapshot_write(
        ev.filter(F.col("event_id") % 2 == 1)
        .select("event_id", F.col("user_id").alias("uid"),
                F.col("vc").cast("long")).coalesce(2),
        path, mode="append", stats_cols=["uid"],
    )
    return snap.read_snapshot(spark, path).groupBy("uid").agg(
        F.count("*").alias("n"),
        F.sum("vc").cast("long").alias("sum_vc"),
    )


@_q("snapshot_stream_capped_digest", """
SELECT COUNT(*) AS n_rows,
       CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_vc,
       bit_xor(event_id) AS id_xor
FROM events
""")
def q_snapshot_stream_capped_digest(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Admission-controlled streaming (round 8): the snapshot source
    runs with ``max_files_per_trigger=2`` over a 6-file table, so the
    initial snapshot splits into RESUMABLE chunk offsets instead of
    one unbounded batch. Each availableNow run executes exactly one
    capped batch (the Python DataSource API has no multi-batch
    drain), and every subsequent run resumes from the checkpoint
    where the last stopped — the loop below is literally the
    restart-resume path, exercised three-plus times. The oracle
    recomputes the digest over the raw events: the hash match proves
    chunked delivery is exactly-once across restarts."""
    import tempfile

    from harmony_energy_data_pipeline_spark.sinks import snapshots as snap
    from harmony_energy_data_pipeline_spark.sources.snapstream import (
        SnapshotTableDataSource,
    )
    from harmony_energy_data_pipeline_spark.streaming.incremental import (
        start_snapshot_append_sink,
    )

    try:
        spark.dataSource.register(SnapshotTableDataSource)
    except Exception:
        pass  # already registered in this session
    ev = load_table(spark, "events", sf_dir).select(
        "event_id", _cents("value").alias("vc")
    )
    base = tempfile.mkdtemp(prefix="snap_capped_")
    src, dst, ck = base + "/src", base + "/dst", base + "/ck"
    snap.snapshot_write(ev.repartition(6), src)
    n_src = ev.count()
    stream = (
        spark.readStream.format("snapshot_table").option("path", src)
        .option("max_files_per_trigger", "2").load()
    )
    for _ in range(8):  # 6 files / 2 per batch -> 3 runs expected
        q = start_snapshot_append_sink(
            stream, dst, ck, available_now=True
        )
        q.awaitTermination(180)
        done = (
            snap.latest_version(dst) is not None
            and snap.read_snapshot(spark, dst).count() >= n_src
        )
        if done:
            break
    return snap.read_snapshot(spark, dst).agg(
        F.count("*").alias("n_rows"),
        F.sum("vc").cast("long").alias("sum_vc"),
        F.expr("bit_xor(event_id)").alias("id_xor"),
    )


@_q("ivm_star_agg", """
SELECT CASE WHEN o_orderkey >= 1 AND o_orderkey <= 50
            THEN 'MOVED' ELSE o_orderpriority END AS prio,
       p_brand, COUNT(*) AS n,
       CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
           AS sum_ep
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN part ON l_partkey = p_partkey
GROUP BY 1, 2
""")
def q_ivm_star_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STAR-SCHEMA IVM (round 8): a lineitem ⋈ orders ⋈ part
    aggregate view maintained by generalized delta-join — the fact
    appends in two halves (the second folds as ΔF joined against both
    dims), then ONE dim changes row-level (an orders MOR update moves
    an orderkey band to a new priority) and folds as F_old ⋈ ΔD signed
    against the other dim at its unchanged version. The oracle
    recomputes the final star aggregate with the update expressed as
    a CASE — the hash match proves the generalized algebra
    V ⊕ γ(ΔF ⋈ D₁' ⋈ D₂') ⊕ γ(F_old ⋈ ΔD₁ ⋈ D₂') ≡ recompute."""
    import tempfile

    from harmony_energy_data_pipeline_spark.pipeline import ivm
    from harmony_energy_data_pipeline_spark.sinks import snapshots as snap

    li = load_table(spark, "lineitem", sf_dir).select(
        "l_orderkey", "l_partkey", _cents("l_extendedprice").alias("ep")
    )
    od = load_table(spark, "orders", sf_dir).select(
        "o_orderkey", F.col("o_orderpriority").alias("prio")
    )
    pt = load_table(spark, "part", sf_dir).select("p_partkey", "p_brand")
    base = tempfile.mkdtemp(prefix="ivm_star_")
    fp, d1, d2, vp = (base + s for s in ("/f", "/o", "/p", "/v"))
    snap.snapshot_write(od.coalesce(2), d1, stats_cols=["o_orderkey"])
    snap.snapshot_write(pt.coalesce(2), d2)
    snap.snapshot_write(
        li.filter(F.col("l_orderkey") % 2 == 0).coalesce(2), fp
    )
    dims = [(d1, {"l_orderkey": "o_orderkey"}),
            (d2, {"l_partkey": "p_partkey"})]
    kw = dict(keys=["prio", "p_brand"], sum_cols=["ep"])
    ivm.refresh_star_agg_view(spark, fp, dims, vp, **kw)
    snap.snapshot_write(
        li.filter(F.col("l_orderkey") % 2 == 1).coalesce(2),
        fp, mode="append",
    )
    ivm.refresh_star_agg_view(spark, fp, dims, vp, **kw)  # ΔF ⋈ dims
    snap.snapshot_update_where_dv(
        spark, d1, [("o_orderkey", 1, 50)], {"prio": F.lit("MOVED")}
    )
    ivm.refresh_star_agg_view(spark, fp, dims, vp, **kw)  # F_old ⋈ ΔD
    return ivm.read_view(spark, vp).select(
        "prio", "p_brand", "n",
        F.col("sum_ep").cast("long").alias("sum_ep"),
    )


# --- round 10: SQL DML + catalog ---------------------------------------------------

@_q("sql_dml_digest", """
WITH base AS (SELECT event_id AS k, value AS v FROM events),
ins AS (
  SELECT k + 10000000 AS k, v FROM base WHERE k % 11 = 0
  UNION ALL SELECT 99000001, 1.25 UNION ALL SELECT 99000002, 2.5
),
t1 AS (SELECT * FROM base UNION ALL SELECT * FROM ins),
t2 AS (SELECT k,
              CASE WHEN k >= 1000 AND k < 3000 THEN v * 3 ELSE v END AS v
       FROM t1),
t3 AS (SELECT * FROM t2 WHERE NOT (k % 13 = 0)),
src AS (SELECT k, v * 10 AS v FROM base WHERE k % 7 = 0),
merged AS (
  SELECT COALESCE(s.k, t.k) AS k, COALESCE(s.v, t.v) AS v
  FROM t3 t FULL OUTER JOIN src s ON t.k = s.k
)
SELECT COUNT(*) AS n_rows,
       CAST(SUM(CAST(round(v * 100) AS BIGINT)) AS BIGINT) AS sum_vc,
       bit_xor(k) AS id_xor
FROM merged
""")
def q_sql_dml_digest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SQL DML surface end-to-end (round 10): a catalog-resolved
    CREATE TABLE AS → INSERT SELECT → INSERT VALUES → UPDATE (range
    WHERE — prunes via parse_conjunctive_where) → DELETE (modulo
    WHERE — conservative scan, exact residual) → canonical MERGE
    chain, all through ``snapshot_sql_script`` with names resolved by
    a ``Catalog`` (no path appears in any statement). The oracle
    recomputes the final state as pure SELECT algebra over the raw
    table. Reference analogue: the reference authors only a SELECT
    (src/ingest/fetch_neso.py:66-71) — this is the write half a
    warehouse user expects of a SQL facade."""
    import tempfile

    from harmony_energy_data_pipeline_spark.catalog import Catalog
    from harmony_energy_data_pipeline_spark.sql import snapshot_sql_script

    cat = Catalog(tempfile.mkdtemp(prefix="sqlcat_"))
    load_table(spark, "events", sf_dir).select(
        F.col("event_id").alias("k"), F.col("value").alias("v")
    ).createOrReplaceTempView("sqldml_events")
    return snapshot_sql_script(spark, """
      CREATE TABLE dmlt AS SELECT k, v FROM sqldml_events;
      INSERT INTO dmlt
        SELECT k + 10000000 AS k, v FROM sqldml_events WHERE k % 11 = 0;
      INSERT INTO dmlt VALUES (99000001, 1.25), (99000002, 2.5);
      UPDATE dmlt SET v = v * 3 WHERE k >= 1000 AND k < 3000;
      DELETE FROM dmlt WHERE k % 13 = 0;
      MERGE INTO dmlt USING (
        SELECT k, v * 10 AS v FROM sqldml_events WHERE k % 7 = 0
      ) AS s ON dmlt.k = s.k
        WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *;
      SELECT COUNT(*) AS n_rows,
             CAST(SUM(CAST(round(v * 100) AS BIGINT)) AS BIGINT) AS sum_vc,
             bit_xor(k) AS id_xor
      FROM dmlt
    """, catalog=cat)


@_q("sql_string_pruned_scan", """
SELECT COUNT(*) AS n_rows,
       CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_vc,
       bit_xor(event_id) AS id_xor
FROM events
WHERE ts >= TIMESTAMP '2024-01-16 00:00:00'
  AND ts < TIMESTAMP '2024-01-19 00:00:00'
""")
def q_sql_string_pruned_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String-predicate pruning (round 10): the same 3-day window as
    the triple form, but passed as a SQL WHERE STRING —
    ``parse_conjunctive_where`` recovers the inclusive triples for
    planning-time file skipping (strict < maps to the conservative
    inclusive bound; the string itself stays the exact residual), so
    ``where="ts >= X AND ts < Y"`` no longer scans every file."""
    import tempfile

    from harmony_energy_data_pipeline_spark.sinks import snapshots as snap

    ev = load_table(spark, "events", sf_dir).select(
        "event_id", "ts", "value"
    )
    path = tempfile.mkdtemp(prefix="snap_strprune_")
    snap.snapshot_write(
        ev.repartitionByRange(8, "ts").sortWithinPartitions("ts"),
        path, stats_cols=["ts"],
    )
    pruned = snap.read_snapshot(
        spark, path,
        where=("ts >= TIMESTAMP '2024-01-16 00:00:00' "
               "AND ts < TIMESTAMP '2024-01-19 00:00:00'"),
    )
    return pruned.agg(
        F.count("*").alias("n_rows"),
        F.sum(_cents("value")).cast("long").alias("sum_vc"),
        F.expr("bit_xor(event_id)").alias("id_xor"),
    )


@_q("delta_dv_roundtrip_digest", """
WITH live AS (
  SELECT event_id AS k, value AS v FROM events WHERE NOT (event_id % 5 = 0)
)
SELECT COUNT(*) AS n_rows,
       CAST(SUM(CAST(round(v * 100) AS BIGINT)) AS BIGINT) AS sum_vc,
       bit_xor(k) AS id_xor
FROM live
""")
def q_delta_dv_roundtrip_digest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Foreign DELETION VECTORS end-to-end (round 10): a hand-built
    Delta log (protocol v3, readerFeatures=[deletionVectors]) whose
    files carry spec-format roaring-bitmap vectors (sources/deltadv:
    Z85 naming, length+CRC framing, portable RoaringBitmapArray) —
    the Databricks DELETE wire shape. ``read_delta`` subtracts them
    merge-on-read AND ``snapshot_import_delta`` adopts them as native
    (file, pos) vectors; the digest is computed from the ADOPTED
    table after asserting both reads agree, so one hash covers read
    + import. Oracle: the raw table minus the deleted keys."""
    import json as _json
    import os
    import tempfile
    import time as _time
    from urllib.parse import unquote, urlparse

    from harmony_energy_data_pipeline_spark.sinks import snapshots as snap
    from harmony_energy_data_pipeline_spark.sources import deltadv
    from harmony_energy_data_pipeline_spark.sources import deltalake as dl

    ev = load_table(spark, "events", sf_dir).select(
        F.col("event_id").alias("k"), F.col("value").alias("v")
    )
    t = os.path.join(tempfile.mkdtemp(prefix="delta_dv_"), "t")
    dl.write_delta(ev.coalesce(4), t, stats_cols=["k"])
    adds, _m, _p, _v = dl._replay(t, None)
    rows = (
        spark.read.parquet(*[os.path.join(t, unquote(a["path"]))
                             for a in adds])
        .selectExpr("k", "_metadata.row_index AS ridx",
                    "_metadata.file_path AS fp")
        .filter("k % 5 = 0").collect()
    )
    by_file: dict = {}
    for r in rows:
        rel = os.path.relpath(unquote(urlparse(r.fp).path), t)
        by_file.setdefault(rel, []).append(r.ridx)
    actions = [{"protocol": {
        "minReaderVersion": 3, "minWriterVersion": 7,
        "readerFeatures": ["deletionVectors"],
        "writerFeatures": ["deletionVectors"],
    }}]
    for a in adds:
        rel = unquote(a["path"])
        if rel not in by_file:
            continue
        desc = deltadv.write_dv_file(t, [sorted(by_file[rel])])[0]
        actions.append({"remove": {
            "path": a["path"],
            "deletionTimestamp": int(_time.time() * 1000),
            "dataChange": True,
        }})
        actions.append({"add": {**a, "deletionVector": desc}})
    nv = dl.delta_table_version(t) + 1
    with open(os.path.join(t, "_delta_log", f"{nv:020d}.json"), "w") as fh:
        for a in actions:
            fh.write(_json.dumps(a) + "\n")
    wire = dl.read_delta(spark, t)
    dl.snapshot_import_delta(spark, t)
    adopted = snap.read_snapshot(spark, t)
    digest = adopted.agg(
        F.count("*").alias("n_rows"),
        F.sum(_cents("v")).cast("long").alias("sum_vc"),
        F.expr("bit_xor(k)").alias("id_xor"),
    )
    # wire read and adopted read must agree before the hash stands
    if wire.count() != adopted.count():
        raise AssertionError("wire and adopted DV reads disagree")
    return digest


@_q("delta_colmap_digest", """
SELECT COUNT(*) AS n_rows,
       CAST(SUM(CAST(round(v * 100) AS BIGINT)) AS BIGINT) AS sum_vc,
       bit_xor(k) AS id_xor
FROM events t(k, ts, u, et, v, p)
WHERE k >= 100 AND k <= 800
""")
def q_delta_colmap_digest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Name-mode COLUMN MAPPING (round 10): a hand-built foreign log
    whose schemaString maps logical (k, v) onto physical
    ``col-<id>`` parquet names — the Databricks
    columnMapping.mode=name wire shape. ``read_delta`` resolves
    physical→logical, translates the predicate for physical-keyed
    stats pruning, and returns logical columns; the oracle reads the
    raw table. (The oracle's FROM-alias positional mapping picks the
    event_id/value columns.)"""
    import json as _json
    import os
    import tempfile
    import uuid as _uuid

    from harmony_energy_data_pipeline_spark.sources import deltalake as dl

    ev = load_table(spark, "events", sf_dir).select(
        F.col("event_id").alias("col-k9"), F.col("value").alias("col-v9")
    )
    t = os.path.join(tempfile.mkdtemp(prefix="delta_cm_"), "t")
    os.makedirs(os.path.join(t, "_delta_log"))
    ev.coalesce(4).write.parquet(os.path.join(t, "files"))
    schema = {"type": "struct", "fields": [
        {"name": "k", "type": "long", "nullable": True, "metadata": {
            "delta.columnMapping.id": 1,
            "delta.columnMapping.physicalName": "col-k9"}},
        {"name": "v", "type": "double", "nullable": True, "metadata": {
            "delta.columnMapping.id": 2,
            "delta.columnMapping.physicalName": "col-v9"}},
    ]}
    acts = [
        {"protocol": {"minReaderVersion": 3, "minWriterVersion": 7,
                      "readerFeatures": ["columnMapping"],
                      "writerFeatures": ["columnMapping"]}},
        {"metaData": {
            "id": str(_uuid.uuid4()),
            "format": {"provider": "parquet", "options": {}},
            "schemaString": _json.dumps(schema),
            "partitionColumns": [],
            "configuration": {"delta.columnMapping.mode": "name",
                              "delta.columnMapping.maxColumnId": "2"},
            "createdTime": 0,
        }},
    ]
    for n in os.listdir(os.path.join(t, "files")):
        if n.endswith(".parquet"):
            acts.append({"add": {
                "path": f"files/{n}", "partitionValues": {}, "size": 1,
                "modificationTime": 0, "dataChange": True,
            }})
    with open(os.path.join(t, "_delta_log", f"{0:020d}.json"), "w") as fh:
        for a in acts:
            fh.write(_json.dumps(a) + "\n")
    got = dl.read_delta(spark, t, where=[("k", 100, 800)])
    return got.agg(
        F.count("*").alias("n_rows"),
        F.sum(_cents("v")).cast("long").alias("sum_vc"),
        F.expr("bit_xor(k)").alias("id_xor"),
    )


@_q("iceberg_roundtrip_digest", """
WITH t AS (
  SELECT event_id AS k, value AS v FROM events
  UNION ALL
  SELECT event_id + 10000000, value FROM events WHERE event_id % 3 = 0
)
SELECT COUNT(*) AS n_rows,
       CAST(SUM(CAST(round(v * 100) AS BIGINT)) AS BIGINT) AS sum_vc,
       bit_xor(k) AS id_xor
FROM t
WHERE k >= 500
""")
def q_iceberg_roundtrip_digest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iceberg v2 wire-format round trip (round 10): events commit as
    an Iceberg table (pure-Python Avro manifests via ``avrolite`` —
    spec field-ids, array-of-record int-keyed maps, manifest list +
    snapshot + metadata.json, atomic link claim), a second snapshot
    fast-appends, and the read back goes through the full metadata
    tree with lower/upper-bound file skipping for the ``k >= 500``
    predicate. Oracle recomputes from the raw table. The Delta twin
    is ``delta_roundtrip_digest``."""
    import tempfile

    from harmony_energy_data_pipeline_spark.sources import iceberg as ice

    ev = load_table(spark, "events", sf_dir).select(
        F.col("event_id").alias("k"), F.col("value").alias("v")
    )
    t = tempfile.mkdtemp(prefix="ice_rt_") + "/t"
    ice.write_iceberg(
        ev.repartitionByRange(4, "k").sortWithinPartitions("k"), t,
        stats_cols=["k"],
    )
    extra = ev.filter(F.col("k") % 3 == 0).select(
        (F.col("k") + 10000000).alias("k"), "v"
    )
    ice.write_iceberg(extra, t, mode="append", stats_cols=["k"])
    got = ice.read_iceberg(spark, t, where=[("k", 500, None)])
    return got.agg(
        F.count("*").alias("n_rows"),
        F.sum(_cents("v")).cast("long").alias("sum_vc"),
        F.expr("bit_xor(k)").alias("id_xor"),
    )


@_q("iceberg_import_digest", """
SELECT COUNT(*) AS n_rows,
       CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_vc,
       bit_xor(event_id) AS id_xor
FROM events
WHERE event_id >= 100 AND event_id <= 2000
""")
def q_iceberg_import_digest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zero-copy Iceberg ADOPTION (round 10): an Iceberg table's live
    files become a native snapshot table without moving a byte —
    ``record_count`` lands as ``#rows`` (manifest-only COUNT),
    decoded Appendix-D bounds land as native zone maps, and this
    digest reads through the ADOPTED table's pruned path (the window
    predicate prunes on the carried stats). Oracle reads the raw
    table. The Delta twin is ``delta_import_digest``."""
    import tempfile

    from harmony_energy_data_pipeline_spark.sinks import snapshots as snap
    from harmony_energy_data_pipeline_spark.sources import iceberg as ice

    ev = load_table(spark, "events", sf_dir).select("event_id", "value")
    t = tempfile.mkdtemp(prefix="ice_imp_") + "/t"
    ice.write_iceberg(
        ev.repartitionByRange(4, "event_id")
        .sortWithinPartitions("event_id"),
        t, stats_cols=["event_id"],
    )
    ice.snapshot_import_iceberg(spark, t)
    got = snap.read_snapshot(spark, t, where=[("event_id", 100, 2000)])
    return got.agg(
        F.count("*").alias("n_rows"),
        F.sum(_cents("value")).cast("long").alias("sum_vc"),
        F.expr("bit_xor(event_id)").alias("id_xor"),
    )


@_q("iceberg_import_eq_digest", """
WITH gen1 AS (
  SELECT event_id AS k, event_type AS et, value AS v FROM events
),
gen2 AS (
  SELECT k + 8500000 AS k, et, v
  FROM gen1 WHERE k % 6 = 0
),
live AS (
  SELECT * FROM gen1 WHERE et <> 'purchase'  -- eq-deleted generation
  UNION ALL
  SELECT * FROM gen2                          -- sequenced after: immune
)
SELECT COUNT(*) AS n_rows,
       CAST(SUM(CAST(round(v * 100) AS BIGINT)) AS BIGINT) AS sum_vc,
       bit_xor(k) AS id_xor
FROM live
""")
def q_iceberg_import_eq_digest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EQUALITY-DELETE ADOPTION (round 11): an Iceberg table carrying
    a Flink-CDC-shaped equality delete imports IN PLACE — one
    sequence-scoped data scan materializes the value matches into
    native positional DVs (`sources/iceberg.py:
    snapshot_import_iceberg`), so the adopted table reads, COUNTs and
    evolves with zero equality machinery; the immune post-delete
    generation stays intact. Oracle recomputes both generations as
    SELECT algebra."""
    import tempfile

    from harmony_energy_data_pipeline_spark.sinks import snapshots as snap
    from harmony_energy_data_pipeline_spark.sources import iceberg as ice

    ev = load_table(spark, "events", sf_dir).select(
        F.col("event_id").alias("k"), F.col("event_type").alias("et"),
        F.col("value").alias("v"),
    )
    t = tempfile.mkdtemp(prefix="ice_impeq_") + "/t"
    ice.write_iceberg(ev, t, stats_cols=["k"])                # seq 1
    ice.write_equality_deletes(
        spark, t, [{"et": "purchase"}], ["et"]                # seq 2
    )
    ice.write_iceberg(                                        # seq 3
        ev.filter(F.col("k") % 6 == 0).select(
            (F.col("k") + 8500000).alias("k"), "et", "v"
        ),
        t, mode="append",
    )
    ice.snapshot_import_iceberg(spark, t)
    return snap.read_snapshot(spark, t).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(_cents("v")).cast("long").alias("sum_vc"),
        F.expr("bit_xor(k)").alias("id_xor"),
    )


@_q("snapshot_branch_digest", """
WITH branch_state AS (
  SELECT event_id AS k, value AS v FROM events WHERE NOT (event_id % 4 = 0)
  UNION ALL
  SELECT event_id + 5000000, value FROM events WHERE event_id % 6 = 0
)
SELECT COUNT(*) AS n_rows,
       CAST(SUM(CAST(round(v * 100) AS BIGINT)) AS BIGINT) AS sum_vc,
       bit_xor(k) AS id_xor,
       (SELECT COUNT(*) FROM events) AS tag_rows
FROM branch_state
""")
def q_snapshot_branch_digest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Branches + tags on the snapshot log (round 10, Iceberg refs
    shape): tag the initial commit, fork a zero-copy branch
    (clone+borrow — main's vacuum keeps shared files alive), mutate
    the BRANCH with full native ops (row-level delete + append) while
    main stays untouched, merge the branch back as one main commit,
    and vacuum main — the digest reads post-merge main, and
    ``tag_rows`` proves the tag still resolves the PRE-everything
    version after vacuum (ref liveness). Oracle recomputes both from
    the raw table."""
    import tempfile

    from harmony_energy_data_pipeline_spark.sinks import refs
    from harmony_energy_data_pipeline_spark.sinks import snapshots as snap

    ev = load_table(spark, "events", sf_dir).select(
        F.col("event_id").alias("k"), F.col("value").alias("v")
    )
    t = tempfile.mkdtemp(prefix="snap_refs_") + "/t"
    snap.snapshot_write(ev.coalesce(4), t, stats_cols=["k"])
    refs.create_tag(t, "baseline")
    bp = refs.create_branch(t, "exp")
    snap.snapshot_delete_where(spark, bp, "k % 4 = 0")
    snap.snapshot_write(
        ev.filter(F.col("k") % 6 == 0).select(
            (F.col("k") + 5000000).alias("k"), "v"
        ),
        bp, mode="append",
    )
    refs.merge_branch(spark, t, "exp", drop=True)
    snap.vacuum(t, keep_last=1, orphan_grace_s=0.0)
    main = snap.read_snapshot(spark, t)
    tag_n = refs.read_tag(spark, t, "baseline").count()
    return main.agg(
        F.count("*").alias("n_rows"),
        F.sum(_cents("v")).cast("long").alias("sum_vc"),
        F.expr("bit_xor(k)").alias("id_xor"),
        F.lit(tag_n).cast("long").alias("tag_rows"),
    )


@_q("partition_evolution_digest", """
WITH t AS (
  SELECT event_id AS k, event_type AS et,
         CAST(ts AS DATE) AS day, value AS v
  FROM events
  UNION ALL
  SELECT event_id + 1000000, event_type, CAST(ts AS DATE), value
  FROM events WHERE event_id % 2 = 0
)
SELECT COUNT(*) AS n_rows,
       CAST(SUM(CAST(round(v * 100) AS BIGINT)) AS BIGINT) AS sum_vc,
       bit_xor(k) AS id_xor
FROM t
WHERE et = 'click'
""")
def q_partition_evolution_digest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partition spec EVOLUTION (round 10, Iceberg shape): events
    commit partitioned by event_type, the spec changes to day in one
    METADATA-ONLY commit, the next append lands under the new layout
    automatically, and an et-equality read crosses the layout
    boundary — old files prune EXACTLY on their et= segments, new
    files keep conservatively, and the residual makes the result
    identical to the oracle's recompute. No data file moved to
    change the spec."""
    import tempfile

    from harmony_energy_data_pipeline_spark.sinks import snapshots as snap

    ev = load_table(spark, "events", sf_dir).select(
        F.col("event_id").alias("k"), F.col("event_type").alias("et"),
        F.col("ts").cast("date").alias("day"), F.col("value").alias("v"),
    )
    t = tempfile.mkdtemp(prefix="snap_pspec_") + "/t"
    snap.snapshot_write(ev, t, partition_by=["et"])
    snap.snapshot_set_partition_spec(t, ["day"])
    snap.snapshot_write(
        ev.filter(F.col("k") % 2 == 0).select(
            (F.col("k") + 1000000).alias("k"), "et", "day", "v"
        ),
        t, mode="append",
    )
    got = snap.read_snapshot(spark, t, where=[("et", "click", "click")])
    return got.agg(
        F.count("*").alias("n_rows"),
        F.sum(_cents("v")).cast("long").alias("sum_vc"),
        F.expr("bit_xor(k)").alias("id_xor"),
    )


@_q("iceberg_pos_delete_digest", """
WITH live AS (
  SELECT event_id AS k, value AS v FROM events WHERE NOT (event_id % 7 = 0)
)
SELECT COUNT(*) AS n_rows,
       CAST(SUM(CAST(round(v * 100) AS BIGINT)) AS BIGINT) AS sum_vc,
       bit_xor(k) AS id_xor
FROM live
""")
def q_iceberg_pos_delete_digest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iceberg V2 POSITION DELETES end-to-end (round 10): a delete
    snapshot's (file_path, pos) parquet + delete manifest
    (content=1) commit onto the table, ``read_iceberg`` subtracts
    them with one anti-join on the scan's hidden identity, AND
    ``snapshot_import_iceberg`` adopts them as native (file, pos)
    vectors — the digest reads the ADOPTED table after asserting the
    wire read agrees, so one hash covers both paths. Oracle: the raw
    table minus the deleted keys."""
    import tempfile
    from urllib.parse import unquote, urlparse

    from harmony_energy_data_pipeline_spark.sinks import snapshots as snap
    from harmony_energy_data_pipeline_spark.sources import iceberg as ice

    ev = load_table(spark, "events", sf_dir).select(
        F.col("event_id").alias("k"), F.col("value").alias("v")
    )
    t = tempfile.mkdtemp(prefix="ice_pd_") + "/t"
    ice.write_iceberg(ev.coalesce(4), t, stats_cols=["k"])
    data, _ = ice.live_files(t)
    by_res = {ice._resolve_file_path(t, d["file_path"]): d["file_path"]
              for d in data}
    rows = spark.read.parquet(*by_res).selectExpr(
        "k", "_metadata.file_path AS fp", "_metadata.row_index AS ri"
    ).filter("k % 7 = 0").collect()
    pairs = [
        (by_res[unquote(urlparse(r.fp).path)], r.ri) for r in rows
    ]
    ice.write_position_deletes(spark, t, pairs)
    wire_n = ice.read_iceberg(spark, t).count()
    ice.snapshot_import_iceberg(spark, t)
    adopted = snap.read_snapshot(spark, t)
    if adopted.count() != wire_n:
        raise AssertionError("wire and adopted pos-delete reads disagree")
    return adopted.agg(
        F.count("*").alias("n_rows"),
        F.sum(_cents("v")).cast("long").alias("sum_vc"),
        F.expr("bit_xor(k)").alias("id_xor"),
    )


@_q("iceberg_stream_digest", """
SELECT COUNT(*) AS n_rows,
       CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_vc,
       bit_xor(event_id) AS id_xor
FROM events
""")
def q_iceberg_stream_digest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING over an Iceberg metadata tree
    (`sources/icebergstream.py` — the Delta stream's wire-format
    twin, closing the interop symmetry: both formats now read /
    adopt / export / STREAM): a real Structured Streaming query
    tails the snapshot log through the registered Python DataSource
    — initial snapshot as batch zero, the fast-append's added files
    as the tail batch, offsets = sequence numbers — into a memory
    sink. The digest of everything delivered must hash-match the raw
    table: exactly-once, no loss, no duplication."""
    import tempfile
    import uuid as _uuid

    from harmony_energy_data_pipeline_spark.sources import iceberg as ice
    from harmony_energy_data_pipeline_spark.sources.icebergstream import (
        IcebergTableDataSource,
    )

    spark.dataSource.register(IcebergTableDataSource)
    ev = load_table(spark, "events", sf_dir).select(
        "event_id", "event_type", "value"
    )
    path = tempfile.mkdtemp(prefix="ice_str_") + "/t"
    ice.write_iceberg(ev.filter(F.col("event_id") % 2 == 0), path)
    ice.write_iceberg(
        ev.filter(F.col("event_id") % 2 == 1), path, mode="append"
    )
    name = f"ice_stream_{_uuid.uuid4().hex[:8]}"
    q = (
        spark.readStream.format("iceberg_table").option("path", path)
        .load().writeStream.format("memory").queryName(name)
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(300)
    return spark.table(name).agg(
        F.count("*").alias("n_rows"),
        F.sum(_cents("value")).cast("long").alias("sum_vc"),
        F.expr("bit_xor(event_id)").alias("id_xor"),
    )


@_q("delta_linked_export_digest", """
WITH live AS (
  SELECT event_id AS k, event_type AS et, value AS v FROM events
  WHERE NOT (event_id >= 1 AND event_id <= 400)
)
SELECT COUNT(*) AS n_rows,
       CAST(SUM(CAST(round(v * 100) AS BIGINT)) AS BIGINT) AS sum_vc,
       bit_xor(k) AS id_xor
FROM live
""")
def q_delta_linked_export_digest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ZERO-COPY Delta export (round 10): a native partitioned table
    with MERGE-ON-READ deletes hands itself to any Delta reader in
    O(metadata + hardlinks) — live parquet files LINK into the Delta
    directory (no byte rewritten) and the native (file, pos) vectors
    re-encode as REAL Delta deletion vectors (roaring wire format,
    protocol v3). The digest reads the exported log through
    ``read_delta``; the oracle recomputes from the raw table. This is
    the 100 TB hand-off shape — the materializing export twin is
    ``delta_export_digest``."""
    import tempfile

    from harmony_energy_data_pipeline_spark.sinks import snapshots as snap
    from harmony_energy_data_pipeline_spark.sources import deltalake as dl

    ev = load_table(spark, "events", sf_dir).select(
        F.col("event_id").alias("k"), F.col("event_type").alias("et"),
        F.col("value").alias("v"),
    )
    base = tempfile.mkdtemp(prefix="delta_lnk_")
    nat, d = base + "/nat", base + "/d"
    snap.snapshot_write(ev, nat, partition_by=["et"], stats_cols=["k"])
    snap.snapshot_delete_where_dv(spark, nat, [("k", 1, 400)])
    dl.snapshot_export_delta(spark, nat, d, link_files=True)
    got = dl.read_delta(spark, d)
    return got.agg(
        F.count("*").alias("n_rows"),
        F.sum(_cents("v")).cast("long").alias("sum_vc"),
        F.expr("bit_xor(k)").alias("id_xor"),
    )


@_q("iceberg_linked_export_digest", """
WITH live AS (
  SELECT event_id AS k, value AS v FROM events
  WHERE NOT (event_id >= 1 AND event_id <= 300)
)
SELECT COUNT(*) AS n_rows,
       CAST(SUM(CAST(round(v * 100) AS BIGINT)) AS BIGINT) AS sum_vc,
       bit_xor(k) AS id_xor
FROM live
""")
def q_iceberg_linked_export_digest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ZERO-COPY Iceberg export (round 10): a native table with
    merge-on-read deletes hands itself to any Iceberg reader in
    O(metadata + hardlinks) — live parquet files LINK into the
    Iceberg directory, zone maps re-encode as Appendix-D bounds, and
    the native (file, pos) vectors export as a spec POSITION-DELETE
    snapshot. The digest reads the exported tree through
    ``read_iceberg``; the oracle recomputes from the raw table. The
    Delta twin is ``delta_linked_export_digest``."""
    import tempfile

    from harmony_energy_data_pipeline_spark.sinks import snapshots as snap
    from harmony_energy_data_pipeline_spark.sources import iceberg as ice

    ev = load_table(spark, "events", sf_dir).select(
        F.col("event_id").alias("k"), F.col("value").alias("v")
    )
    base = tempfile.mkdtemp(prefix="ice_lnk_")
    nat, d = base + "/nat", base + "/d"
    snap.snapshot_write(
        ev.repartitionByRange(4, "k").sortWithinPartitions("k"),
        nat, stats_cols=["k"],
    )
    snap.snapshot_delete_where_dv(spark, nat, [("k", 1, 300)])
    ice.snapshot_export_iceberg(spark, nat, d, link_files=True)
    got = ice.read_iceberg(spark, d)
    return got.agg(
        F.count("*").alias("n_rows"),
        F.sum(_cents("v")).cast("long").alias("sum_vc"),
        F.expr("bit_xor(k)").alias("id_xor"),
    )


@_q("sql_warehouse_digest", """
WITH base AS (
  SELECT event_id AS k, value AS v, event_type AS et FROM events
),
renamed AS (SELECT k, v AS val, et, CAST(NULL AS VARCHAR) AS src
            FROM base),
ins AS (
  SELECT * FROM renamed
  UNION ALL
  SELECT k + 7000000, val, et, 'late' FROM renamed WHERE k % 9 = 0
),
upd AS (
  SELECT k,
         CASE WHEN et = 'click' AND k >= 100 AND k <= 5000
              THEN val * 2 ELSE val END AS val,
         et, src
  FROM ins
),
del AS (SELECT * FROM upd WHERE NOT (k % 17 = 0))
SELECT COUNT(*) AS n_rows,
       CAST(SUM(CAST(round(val * 100) AS BIGINT)) AS BIGINT) AS sum_vc,
       bit_xor(k) AS id_xor,
       COUNT(src) AS n_src
FROM del
""")
def q_sql_warehouse_digest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The FULL warehouse lifecycle as one SQL script (round 10):
    CREATE TABLE AS → ALTER TABLE (RENAME COLUMN + ADD COLUMN + ADD
    CONSTRAINT) → INSERT (schema-aligned, null-filling the new
    column) → UPDATE (compound WHERE: the range half prunes, the
    equality half rides the residual) → DELETE (modulo predicate) →
    OPTIMIZE (compaction: row-preserving) → VACUUM (retention: result
    unchanged) → SELECT digest — every statement through
    ``snapshot_sql_script`` with catalog-resolved names, no Python
    API call in the chain. The oracle recomputes the final state as
    pure SELECT algebra; OPTIMIZE/VACUUM being digest-invariant IS
    part of what the hash proves."""
    import tempfile

    from harmony_energy_data_pipeline_spark.catalog import Catalog
    from harmony_energy_data_pipeline_spark.sql import snapshot_sql_script

    cat = Catalog(tempfile.mkdtemp(prefix="sqlwh_"))
    load_table(spark, "events", sf_dir).select(
        F.col("event_id").alias("k"), F.col("value").alias("v"),
        F.col("event_type").alias("et"),
    ).createOrReplaceTempView("sqlwh_events")
    return snapshot_sql_script(spark, """
      CREATE TABLE wht AS SELECT k, v, et FROM sqlwh_events;
      ALTER TABLE wht RENAME COLUMN v TO val;
      ALTER TABLE wht ADD COLUMN src string;
      ALTER TABLE wht ADD CONSTRAINT CHECK (k IS NOT NULL);
      INSERT INTO wht (k, val, et, src)
        SELECT k + 7000000, v, et, 'late' FROM sqlwh_events
        WHERE k % 9 = 0;
      UPDATE wht SET val = val * 2
        WHERE et = 'click' AND k >= 100 AND k <= 5000;
      DELETE FROM wht WHERE k % 17 = 0;
      OPTIMIZE wht;
      VACUUM wht RETAIN 1 VERSIONS;
      SELECT COUNT(*) AS n_rows,
             CAST(SUM(CAST(round(val * 100) AS BIGINT)) AS BIGINT)
                 AS sum_vc,
             bit_xor(k) AS id_xor,
             COUNT(src) AS n_src
      FROM wht
    """, catalog=cat)


@_q("sql_merge_rich_digest", """
WITH tgt AS (
  SELECT event_id AS k, value AS v, event_type AS et FROM events
),
src AS (
  SELECT event_id AS k,
         value + 1000.0 AS v,
         CASE WHEN event_id % 5 = 0 THEN 'drop' ELSE 'amend' END AS op
  FROM events WHERE event_id % 3 = 0
  UNION ALL
  SELECT event_id + 7000000, value, 'fresh' FROM events
  WHERE event_id % 11 = 0
),
merged AS (
  -- WHEN MATCHED AND op='drop' THEN DELETE
  -- WHEN MATCHED THEN UPDATE SET v = src.v, et = 'amended'
  -- WHEN NOT MATCHED AND v >= 0 THEN INSERT (k, v, et) VALUES (k, v, 'new')
  -- WHEN NOT MATCHED BY SOURCE AND k % 7 = 0 THEN DELETE
  SELECT t.k,
         CASE WHEN s.k IS NOT NULL THEN s.v ELSE t.v END AS v,
         CASE WHEN s.k IS NOT NULL THEN 'amended' ELSE t.et END AS et
  FROM tgt t LEFT JOIN src s ON t.k = s.k
  WHERE NOT (s.k IS NOT NULL AND s.op = 'drop')
    AND NOT (s.k IS NULL AND t.k % 7 = 0)
  UNION ALL
  SELECT s.k, s.v, 'new'
  FROM src s LEFT JOIN tgt t ON s.k = t.k
  WHERE t.k IS NULL AND s.v >= 0
)
SELECT COUNT(*) AS n_rows,
       CAST(SUM(CAST(round(v * 100) AS BIGINT)) AS BIGINT) AS sum_vc,
       bit_xor(k) AS id_xor,
       COUNT(CASE WHEN et = 'amended' THEN 1 END) AS n_amended,
       COUNT(CASE WHEN et = 'new' THEN 1 END) AS n_new
FROM merged
""")
def q_sql_merge_rich_digest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The FULL MERGE WHEN surface through SQL (round 11): one
    statement carrying a conditioned MATCHED DELETE, an unconditional
    MATCHED UPDATE with expressions, a conditioned NOT MATCHED INSERT
    (cols) VALUES, and a conditioned NOT MATCHED BY SOURCE DELETE —
    routed to ``snapshot_merge_when`` (`sinks/snapshots.py`), clause
    order first-match-wins. The oracle recomputes the post-merge
    table as join algebra. The reference's loader
    (src/serve/load.py:43-46) is the unconditional special case of
    this surface."""
    import tempfile

    from harmony_energy_data_pipeline_spark.catalog import Catalog
    from harmony_energy_data_pipeline_spark.sql import snapshot_sql_script

    cat = Catalog(tempfile.mkdtemp(prefix="sqlmrg_"))
    ev = load_table(spark, "events", sf_dir)
    ev.select(
        F.col("event_id").alias("k"), F.col("value").alias("v"),
        F.col("event_type").alias("et"),
    ).createOrReplaceTempView("mrg_tgt_src")
    ev.filter(F.col("event_id") % 3 == 0).select(
        F.col("event_id").alias("k"),
        (F.col("value") + 1000.0).alias("v"),
        F.when(F.col("event_id") % 5 == 0, F.lit("drop"))
         .otherwise(F.lit("amend")).alias("op"),
    ).unionByName(
        ev.filter(F.col("event_id") % 11 == 0).select(
            (F.col("event_id") + 7000000).alias("k"),
            F.col("value").alias("v"),
            F.lit("fresh").alias("op"),
        )
    ).createOrReplaceTempView("mrg_chg")
    return snapshot_sql_script(spark, """
      CREATE TABLE mrt AS SELECT k, v, et FROM mrg_tgt_src;
      MERGE INTO mrt USING mrg_chg ON mrt.k = mrg_chg.k
        WHEN MATCHED AND mrg_chg.op = 'drop' THEN DELETE
        WHEN MATCHED THEN UPDATE SET v = mrg_chg.v, et = 'amended'
        WHEN NOT MATCHED AND mrg_chg.v >= 0
          THEN INSERT (k, v, et) VALUES (mrg_chg.k, mrg_chg.v, 'new')
        WHEN NOT MATCHED BY SOURCE AND mrt.k % 7 = 0 THEN DELETE;
      SELECT COUNT(*) AS n_rows,
             CAST(SUM(CAST(round(v * 100) AS BIGINT)) AS BIGINT)
                 AS sum_vc,
             bit_xor(k) AS id_xor,
             COUNT(CASE WHEN et = 'amended' THEN 1 END) AS n_amended,
             COUNT(CASE WHEN et = 'new' THEN 1 END) AS n_new
      FROM mrt
    """, catalog=cat)


@_q("variant_extract_digest", """
WITH j AS (
  SELECT concat('{"id":', event_id, ',"et":"', event_type, '","v":',
                CAST(round(value * 100) AS BIGINT), '}') AS js
  FROM events
)
SELECT json_extract_string(js, '$.et') AS et,
       COUNT(*) AS n_rows,
       CAST(SUM(CAST(json_extract(js, '$.v') AS BIGINT)) AS BIGINT)
           AS sum_vc,
       bit_xor(CAST(json_extract(js, '$.id') AS BIGINT)) AS id_xor
FROM j
GROUP BY 1
""")
def q_variant_extract_digest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SEMI-STRUCTURED columns via Spark 4's VARIANT type (round 11):
    JSON documents parse once into the binary variant encoding
    (``parse_json``) and typed paths extract JVM-side
    (``variant_get`` — no per-row Python, no schema inference pass),
    the engine-native answer to ragged metadata/JSON sidecar columns
    in a training-data lake. The same encoding now reads from foreign
    Delta tables (readerFeature ``variantType``,
    `sources/deltalake.py`). Oracle extracts the same paths with
    DuckDB's JSON functions."""
    ev = load_table(spark, "events", sf_dir)
    j = ev.select(
        F.concat(
            F.lit('{"id":'), F.col("event_id").cast("string"),
            F.lit(',"et":"'), F.col("event_type"),
            F.lit('","v":'),
            F.round(F.col("value") * 100).cast("long").cast("string"),
            F.lit("}"),
        ).alias("js")
    )
    return j.select(F.parse_json(F.col("js")).alias("x")).select(
        F.expr("variant_get(x, '$.et', 'string')").alias("et"),
        F.expr("variant_get(x, '$.id', 'long')").alias("id"),
        F.expr("variant_get(x, '$.v', 'long')").alias("vc"),
    ).groupBy("et").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("vc").cast("long").alias("sum_vc"),
        F.expr("bit_xor(id)").alias("id_xor"),
    )


@_q("sql_delta_warehouse_digest", """
WITH base AS (
  SELECT event_id AS k, value AS v, event_type AS et FROM events
),
ins AS (
  SELECT * FROM base
  UNION ALL
  SELECT k + 7500000, v, et FROM base WHERE k % 13 = 0
)
SELECT COUNT(*) AS n_rows,
       CAST(SUM(CAST(round(v * 100) AS BIGINT)) AS BIGINT) AS sum_vc,
       bit_xor(k) AS id_xor
FROM ins
""")
def q_sql_delta_warehouse_digest(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The warehouse lifecycle over a DELTA-format catalog entry
    (round 11): CREATE TABLE AS routes to ``write_delta``, INSERT
    appends through the wire writer, OPTIMIZE bin-packs in one
    dataChange=false commit (``delta_optimize``), VACUUM routes to
    ``delta_vacuum`` — every statement through ``snapshot_sql_script``
    with the name bound ``format="delta"``; OPTIMIZE/VACUUM being
    digest-invariant is part of what the hash proves. Oracle is pure
    SELECT algebra."""
    import tempfile

    from harmony_energy_data_pipeline_spark.catalog import Catalog
    from harmony_energy_data_pipeline_spark.sql import snapshot_sql_script

    cat = Catalog(tempfile.mkdtemp(prefix="sqldwh_"))
    cat.register("dwt", format="delta")
    load_table(spark, "events", sf_dir).select(
        F.col("event_id").alias("k"), F.col("value").alias("v"),
        F.col("event_type").alias("et"),
    ).createOrReplaceTempView("sqldwh_events")
    return snapshot_sql_script(spark, """
      CREATE TABLE dwt AS SELECT k, v, et FROM sqldwh_events;
      INSERT INTO dwt
        SELECT k + 7500000 AS k, v, et FROM sqldwh_events
        WHERE k % 13 = 0;
      OPTIMIZE dwt;
      VACUUM dwt;
      SELECT COUNT(*) AS n_rows,
             CAST(SUM(CAST(round(v * 100) AS BIGINT)) AS BIGINT)
                 AS sum_vc,
             bit_xor(k) AS id_xor
      FROM dwt
    """, catalog=cat)


@_q("sql_delta_dml_digest", """
WITH base AS (
  SELECT event_id AS k, value AS v, event_type AS et FROM events
),
upd AS (
  SELECT k,
         CASE WHEN et = 'view' AND k >= 200 AND k <= 4000
              THEN v * 3 ELSE v END AS v,
         et
  FROM base
),
del AS (SELECT * FROM upd WHERE NOT (k % 11 = 0))
SELECT COUNT(*) AS n_rows,
       CAST(SUM(CAST(round(v * 100) AS BIGINT)) AS BIGINT) AS sum_vc,
       bit_xor(k) AS id_xor
FROM del
""")
def q_sql_delta_dml_digest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-level DML ON the Delta wire format through SQL (round 11):
    UPDATE deletion-vectors old rows and re-appends transformed ones,
    DELETE lands spec roaring-bitmap DVs — one commit each, protocol
    upgraded to declare ``deletionVectors``, zero adoption and zero
    data-file rewrite (`sources/deltalake.py: delta_update_where /
    delta_delete_where`). The digest reads back through the DV-aware
    reader; oracle recomputes as SELECT algebra."""
    import tempfile

    from harmony_energy_data_pipeline_spark.catalog import Catalog
    from harmony_energy_data_pipeline_spark.sql import snapshot_sql_script

    cat = Catalog(tempfile.mkdtemp(prefix="sqlddml_"))
    cat.register("ddt", format="delta")
    load_table(spark, "events", sf_dir).select(
        F.col("event_id").alias("k"), F.col("value").alias("v"),
        F.col("event_type").alias("et"),
    ).createOrReplaceTempView("sqlddml_events")
    return snapshot_sql_script(spark, """
      CREATE TABLE ddt AS SELECT k, v, et FROM sqlddml_events;
      UPDATE ddt SET v = v * 3
        WHERE et = 'view' AND k >= 200 AND k <= 4000;
      DELETE FROM ddt WHERE k % 11 = 0;
      SELECT COUNT(*) AS n_rows,
             CAST(SUM(CAST(round(v * 100) AS BIGINT)) AS BIGINT)
                 AS sum_vc,
             bit_xor(k) AS id_xor
      FROM ddt
    """, catalog=cat)


@_q("sql_iceberg_dml_digest", """
WITH base AS (
  SELECT event_id AS k, value AS v, event_type AS et FROM events
),
upd AS (
  SELECT k,
         CASE WHEN et = 'click' AND k >= 500 AND k <= 3500
              THEN v + 50 ELSE v END AS v,
         et
  FROM base
),
del AS (SELECT * FROM upd WHERE NOT (k % 9 = 0))
SELECT COUNT(*) AS n_rows,
       CAST(SUM(CAST(round(v * 100) AS BIGINT)) AS BIGINT) AS sum_vc,
       bit_xor(k) AS id_xor
FROM del
""")
def q_sql_iceberg_dml_digest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-level DML ON the Iceberg wire format through SQL (round
    11): UPDATE commits ONE v2 snapshot carrying a position-delete
    manifest AND the transformed rows' data manifest (atomic MOR —
    `sources/iceberg.py: iceberg_update_where`); DELETE commits a
    position-delete snapshot (`iceberg_delete_where`) — zero
    adoption, zero data-file rewrite; reads apply the deletes
    merge-on-read. Oracle recomputes as SELECT algebra."""
    import tempfile

    from harmony_energy_data_pipeline_spark.catalog import Catalog
    from harmony_energy_data_pipeline_spark.sql import snapshot_sql_script

    cat = Catalog(tempfile.mkdtemp(prefix="sqlidml_"))
    cat.register("idt", format="iceberg")
    load_table(spark, "events", sf_dir).select(
        F.col("event_id").alias("k"), F.col("value").alias("v"),
        F.col("event_type").alias("et"),
    ).createOrReplaceTempView("sqlidml_events")
    return snapshot_sql_script(spark, """
      CREATE TABLE idt AS SELECT k, v, et FROM sqlidml_events;
      UPDATE idt SET v = v + 50
        WHERE et = 'click' AND k >= 500 AND k <= 3500;
      DELETE FROM idt WHERE k % 9 = 0;
      SELECT COUNT(*) AS n_rows,
             CAST(SUM(CAST(round(v * 100) AS BIGINT)) AS BIGINT)
                 AS sum_vc,
             bit_xor(k) AS id_xor
      FROM idt
    """, catalog=cat)


@_q("sql_rename_drop_digest", """
WITH base AS (
  SELECT event_id AS k, value AS val, event_type AS et FROM events
),
upd AS (
  SELECT k,
         CASE WHEN k % 7 = 0 THEN val + 10 ELSE val END AS val
  FROM base
),
one AS (
  SELECT COUNT(*) AS n_rows,
         CAST(SUM(CAST(round(val * 100) AS BIGINT)) AS BIGINT)
             AS sum_vc,
         bit_xor(k) AS id_xor
  FROM upd
)
SELECT d.n_rows AS d_rows, d.sum_vc AS d_sum, d.id_xor AS d_xor,
       i.n_rows AS i_rows, i.sum_vc AS i_sum, i.id_xor AS i_xor
FROM one d CROSS JOIN one i
""")
def q_sql_rename_drop_digest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RENAME / DROP COLUMN on BOTH wire formats through SQL (round
    12): Iceberg renames the field over its immutable id — pre-rename
    files resolve via historical-name coalescing in this engine and
    via the ``schema.name-mapping.default`` property for foreign
    readers (`sources/iceberg.py: iceberg_rename_column`); Delta
    relabels over a stable ``physicalName``, upgrading the table to
    name-mode column mapping in the same commit
    (`sources/deltalake.py: delta_rename_column`). Row-level DML
    then runs THROUGH the renamed predicate column, and DROP COLUMN
    removes the other field metadata-only. The schema churn of a
    long-lived serving table (reference rebuilds on any schema
    change: src/serve/load.py) as three metadata commits. Oracle
    recomputes the surviving columns as SELECT algebra."""
    import tempfile

    from harmony_energy_data_pipeline_spark.catalog import Catalog
    from harmony_energy_data_pipeline_spark.sql import (
        snapshot_sql,
        snapshot_sql_script,
    )

    cat = Catalog(tempfile.mkdtemp(prefix="sqlrnd_"))
    cat.register("rdt", format="delta")
    cat.register("rit", format="iceberg")
    load_table(spark, "events", sf_dir).select(
        F.col("event_id").alias("k"), F.col("value").alias("v"),
        F.col("event_type").alias("et"),
    ).createOrReplaceTempView("sqlrnd_events")
    for tbl in ("rdt", "rit"):
        snapshot_sql_script(spark, f"""
          CREATE TABLE {tbl} AS SELECT k, v, et FROM sqlrnd_events;
          ALTER TABLE {tbl} RENAME COLUMN v TO val;
          UPDATE {tbl} SET val = val + 10 WHERE k % 7 = 0;
          ALTER TABLE {tbl} DROP COLUMN et
        """, catalog=cat)
    return snapshot_sql(spark, """
      SELECT d.n_rows AS d_rows, d.sum_vc AS d_sum, d.id_xor AS d_xor,
             i.n_rows AS i_rows, i.sum_vc AS i_sum, i.id_xor AS i_xor
      FROM (SELECT COUNT(*) AS n_rows,
                   CAST(SUM(CAST(round(val * 100) AS BIGINT))
                       AS BIGINT) AS sum_vc,
                   bit_xor(k) AS id_xor FROM rdt) d
      CROSS JOIN (SELECT COUNT(*) AS n_rows,
                   CAST(SUM(CAST(round(val * 100) AS BIGINT))
                       AS BIGINT) AS sum_vc,
                   bit_xor(k) AS id_xor FROM rit) i
    """, catalog=cat)


@_q("iceberg_wap_digest", """
WITH base AS (
  SELECT event_id AS k, value AS v FROM events WHERE event_id < 600
),
staged AS (
  SELECT event_id AS k, value AS v FROM events WHERE event_id >= 600
),
pre AS (
  SELECT COUNT(*) AS n,
         CAST(SUM(CAST(round(v * 100) AS BIGINT)) AS BIGINT) AS s
  FROM base
),
post AS (
  SELECT COUNT(*) AS n,
         CAST(SUM(CAST(round(v * 100) AS BIGINT)) AS BIGINT) AS s
  FROM (SELECT * FROM base UNION ALL SELECT * FROM staged)
)
SELECT p.n AS main_rows_during_audit, p.s AS main_sum_during_audit,
       q.n AS main_rows_after_publish, q.s AS main_sum_after_publish
FROM pre p CROSS JOIN post q
""")
def q_iceberg_wap_digest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WRITE-AUDIT-PUBLISH on the Iceberg wire format (round 12):
    a branch write (`write_iceberg(branch=...)`) advances the
    branch head only — main readers see nothing until
    `iceberg_fast_forward` publishes by pointing main at the branch
    head, metadata-only. The digest reads main DURING the audit and
    AFTER the publish; the oracle recomputes both states as SELECT
    algebra."""
    import os
    import tempfile

    from harmony_energy_data_pipeline_spark.sources import iceberg as ice

    t = os.path.join(tempfile.mkdtemp(prefix="wapq_"), "t")
    ev = load_table(spark, "events", sf_dir).select(
        F.col("event_id").alias("k"), F.col("value").alias("v")
    )
    ice.write_iceberg(ev.filter("k < 600"), t)
    ice.write_iceberg(ev.filter("k >= 600"), t, mode="append",
                      branch="audit")
    pre = ice.read_iceberg(spark, t).agg(
        F.count("*").alias("n"),
        F.sum(F.round(F.col("v") * 100).cast("long"))
        .cast("long").alias("s"),
    ).collect()[0]
    ice.iceberg_fast_forward(t, "audit")
    return ice.read_iceberg(spark, t).agg(
        F.lit(int(pre["n"])).alias("main_rows_during_audit"),
        F.lit(int(pre["s"])).alias("main_sum_during_audit"),
        F.count("*").alias("main_rows_after_publish"),
        F.sum(F.round(F.col("v") * 100).cast("long"))
        .cast("long").alias("main_sum_after_publish"),
    )


@_q("delta_clone_digest", """
WITH src AS (
  SELECT event_id AS k, value AS v FROM events
),
cloned AS (
  SELECT k, CASE WHEN k % 5 = 0 THEN v + 7 ELSE v END AS v
  FROM src WHERE NOT (k % 13 = 0)
),
s AS (
  SELECT COUNT(*) AS n,
         CAST(SUM(CAST(round(v * 100) AS BIGINT)) AS BIGINT) AS sm
  FROM src
),
c AS (
  SELECT COUNT(*) AS n,
         CAST(SUM(CAST(round(v * 100) AS BIGINT)) AS BIGINT) AS sm
  FROM cloned
)
SELECT s.n AS src_rows, s.sm AS src_sum,
       c.n AS clone_rows, c.sm AS clone_sum
FROM s CROSS JOIN c
""")
def q_delta_clone_digest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SHALLOW CLONE on the Delta wire format (round 12): the clone
    is a zero-copy version-0 commit referencing the source's files
    by absolute path (`delta_clone`); DV DELETE and MOR UPDATE on
    the clone diverge it while the source stays byte-identical. The
    digest reads BOTH tables after the divergence; the oracle
    recomputes them as SELECT algebra."""
    import os
    import tempfile

    from harmony_energy_data_pipeline_spark.sources import deltalake as dl

    d = tempfile.mkdtemp(prefix="clnq_")
    src, dst = os.path.join(d, "s"), os.path.join(d, "c")
    ev = load_table(spark, "events", sf_dir).select(
        F.col("event_id").alias("k"), F.col("value").alias("v")
    )
    dl.write_delta(ev, src)
    dl.delta_clone(spark, src, dst)
    dl.delta_delete_where(spark, dst, "k % 13 = 0")
    dl.delta_update_where(spark, dst, "k % 5 = 0", {"v": "v + 7"})

    def _agg(df, pfx):
        return df.agg(
            F.count("*").alias(f"{pfx}_rows"),
            F.sum(F.round(F.col("v") * 100).cast("long"))
            .cast("long").alias(f"{pfx}_sum"),
        )

    return _agg(dl.read_delta(spark, src), "src").crossJoin(
        _agg(dl.read_delta(spark, dst), "clone")
    )


@_q("sql_evolution_digest", """
WITH base AS (
  SELECT CAST(event_id AS INTEGER) AS k,
         CAST(value AS REAL) AS v,
         event_type AS et
  FROM events
),
-- widen k->BIGINT, v->DOUBLE are metadata-only: values unchanged
firsthalf AS (SELECT * FROM base WHERE k < 500),
tagged AS (
  SELECT COUNT(*) AS n,
         CAST(SUM(CAST(round(CAST(v AS DOUBLE) * 100) AS BIGINT))
             AS BIGINT) AS s
  FROM firsthalf
),
appended AS (SELECT * FROM base),
upd AS (
  SELECT k, CASE WHEN k % 11 = 0 THEN CAST(v AS DOUBLE) + 1000
               ELSE CAST(v AS DOUBLE) END AS v, et
  FROM appended
),
head AS (
  SELECT COUNT(*) AS n,
         CAST(SUM(CAST(round(v * 100) AS BIGINT)) AS BIGINT) AS s,
         COUNT(DISTINCT et) AS nets
  FROM upd
)
SELECT t.n AS tag_rows, t.s AS tag_sum,
       h.n AS head_rows, h.s AS head_sum, h.nets AS head_types
FROM tagged t CROSS JOIN head h
""")
def q_sql_evolution_digest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The round-12 TABLE-EVOLUTION surface in one flow, all through
    SQL on the ICEBERG wire format: CTAS → metadata-only TYPE
    WIDENING (int→bigint, float→double; old files' narrow pages
    upcast on scan, narrow bounds keep pruning) → TAG the snapshot →
    metadata-only SET PARTITION SPEC (existing files untouched,
    appends land partitioned) → append → UPDATE through the MOR DML
    path → read BOTH the tag (time travel via the refs map) and the
    head. A CHECK-constrained Delta twin of the UPDATE cross-checks
    enforcement (`delta_add_check_constraint` — the violating branch
    is exercised in tests). Oracle recomputes both reads as SELECT
    algebra."""
    import tempfile

    from harmony_energy_data_pipeline_spark.catalog import Catalog
    from harmony_energy_data_pipeline_spark.sql import (
        snapshot_sql,
        snapshot_sql_script,
    )

    cat = Catalog(tempfile.mkdtemp(prefix="sqlevo_"))
    cat.register("evo", format="iceberg")
    load_table(spark, "events", sf_dir).select(
        F.col("event_id").cast("int").alias("k"),
        F.col("value").cast("float").alias("v"),
        F.col("event_type").alias("et"),
    ).createOrReplaceTempView("sqlevo_events")
    snapshot_sql_script(spark, """
      CREATE TABLE evo AS
        SELECT k, v, et FROM sqlevo_events WHERE k < 500;
      ALTER TABLE evo ALTER COLUMN k TYPE BIGINT;
      ALTER TABLE evo ALTER COLUMN v TYPE DOUBLE;
      ALTER TABLE evo CREATE TAG 'before_load';
      ALTER TABLE evo SET PARTITION SPEC (et);
      INSERT INTO evo SELECT CAST(k AS BIGINT),
                             CAST(v AS DOUBLE), et
        FROM sqlevo_events WHERE k >= 500;
      UPDATE evo SET v = v + 1000 WHERE k % 11 = 0
    """, catalog=cat)
    return snapshot_sql(spark, """
      SELECT t.n AS tag_rows, t.s AS tag_sum,
             h.n AS head_rows, h.s AS head_sum, h.nets AS head_types
      FROM (SELECT COUNT(*) AS n,
                   CAST(SUM(CAST(round(v * 100) AS BIGINT))
                       AS BIGINT) AS s
            FROM evo VERSION AS OF 'before_load') t
      CROSS JOIN (SELECT COUNT(*) AS n,
                   CAST(SUM(CAST(round(v * 100) AS BIGINT))
                       AS BIGINT) AS s,
                   COUNT(DISTINCT et) AS nets
            FROM evo) h
    """, catalog=cat)


@_q("sql_delta_merge_digest", """
WITH tgt AS (
  SELECT event_id AS k, value AS v, event_type AS et FROM events
),
src AS (
  SELECT event_id AS k,
         value + 500.0 AS v,
         CASE WHEN event_id % 4 = 0 THEN 'drop' ELSE 'amend' END AS op
  FROM events WHERE event_id % 3 = 0
  UNION ALL
  SELECT event_id + 9000000, value, 'fresh' FROM events
  WHERE event_id % 13 = 0
),
merged AS (
  -- WHEN MATCHED AND op='drop' THEN DELETE
  -- WHEN MATCHED THEN UPDATE SET v = src.v, et = 'amended'
  -- WHEN NOT MATCHED AND v >= 0 THEN INSERT (k, v, et) VALUES (k, v, 'new')
  SELECT t.k,
         CASE WHEN s.k IS NOT NULL THEN s.v ELSE t.v END AS v,
         CASE WHEN s.k IS NOT NULL THEN 'amended' ELSE t.et END AS et
  FROM tgt t LEFT JOIN src s ON t.k = s.k
  WHERE NOT (s.k IS NOT NULL AND s.op = 'drop')
  UNION ALL
  SELECT s.k, s.v, 'new'
  FROM src s LEFT JOIN tgt t ON s.k = t.k
  WHERE t.k IS NULL AND s.v >= 0
)
SELECT COUNT(*) AS n_rows,
       CAST(SUM(CAST(round(v * 100) AS BIGINT)) AS BIGINT) AS sum_vc,
       bit_xor(k) AS id_xor,
       COUNT(CASE WHEN et = 'amended' THEN 1 END) AS n_amended,
       COUNT(CASE WHEN et = 'new' THEN 1 END) AS n_new
FROM merged
""")
def q_sql_delta_merge_digest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE IN the Delta wire format through SQL (round 12): the
    full WHEN surface (conditioned MATCHED DELETE, MATCHED UPDATE,
    conditioned NOT MATCHED INSERT) lands as ONE MOR commit — matched
    rows deletion-vector out of their files, clause-produced rows
    append — via ``delta_merge_when`` (`sources/deltalake.py`),
    zero adoption, zero data-file rewrite. The daily keyed upsert of
    the reference's loader (src/serve/load.py:43-46) against a
    foreign Delta table. Oracle recomputes the post-merge table as
    join algebra; the digest reads back through the DV-aware
    reader."""
    import tempfile

    from harmony_energy_data_pipeline_spark.catalog import Catalog
    from harmony_energy_data_pipeline_spark.sql import snapshot_sql_script

    cat = Catalog(tempfile.mkdtemp(prefix="sqldmrg_"))
    cat.register("dmt", format="delta")
    ev = load_table(spark, "events", sf_dir)
    ev.select(
        F.col("event_id").alias("k"), F.col("value").alias("v"),
        F.col("event_type").alias("et"),
    ).createOrReplaceTempView("dmrg_tgt_src")
    ev.filter(F.col("event_id") % 3 == 0).select(
        F.col("event_id").alias("k"),
        (F.col("value") + 500.0).alias("v"),
        F.when(F.col("event_id") % 4 == 0, F.lit("drop"))
         .otherwise(F.lit("amend")).alias("op"),
    ).unionByName(
        ev.filter(F.col("event_id") % 13 == 0).select(
            (F.col("event_id") + 9000000).alias("k"),
            F.col("value").alias("v"),
            F.lit("fresh").alias("op"),
        )
    ).createOrReplaceTempView("dmrg_chg")
    return snapshot_sql_script(spark, """
      CREATE TABLE dmt AS SELECT k, v, et FROM dmrg_tgt_src;
      MERGE INTO dmt USING dmrg_chg ON dmt.k = dmrg_chg.k
        WHEN MATCHED AND dmrg_chg.op = 'drop' THEN DELETE
        WHEN MATCHED THEN UPDATE SET v = dmrg_chg.v, et = 'amended'
        WHEN NOT MATCHED AND dmrg_chg.v >= 0
          THEN INSERT (k, v, et) VALUES (dmrg_chg.k, dmrg_chg.v, 'new');
      SELECT COUNT(*) AS n_rows,
             CAST(SUM(CAST(round(v * 100) AS BIGINT)) AS BIGINT)
                 AS sum_vc,
             bit_xor(k) AS id_xor,
             COUNT(CASE WHEN et = 'amended' THEN 1 END) AS n_amended,
             COUNT(CASE WHEN et = 'new' THEN 1 END) AS n_new
      FROM dmt
    """, catalog=cat)


@_q("sql_iceberg_merge_digest", """
WITH tgt AS (
  SELECT event_id AS k, value AS v, event_type AS et FROM events
),
src AS (
  SELECT event_id AS k,
         value - 250.0 AS v,
         CASE WHEN event_id % 6 = 0 THEN 'drop' ELSE 'amend' END AS op
  FROM events WHERE event_id % 2 = 0
  UNION ALL
  SELECT event_id + 8000000, value, 'fresh' FROM events
  WHERE event_id % 17 = 0
),
merged AS (
  -- WHEN MATCHED AND op='drop' THEN DELETE
  -- WHEN MATCHED THEN UPDATE SET v = src.v, et = 'amended'
  -- WHEN NOT MATCHED THEN INSERT (k, v, et) VALUES (k, v, 'new')
  SELECT t.k,
         CASE WHEN s.k IS NOT NULL THEN s.v ELSE t.v END AS v,
         CASE WHEN s.k IS NOT NULL THEN 'amended' ELSE t.et END AS et
  FROM tgt t LEFT JOIN src s ON t.k = s.k
  WHERE NOT (s.k IS NOT NULL AND s.op = 'drop')
  UNION ALL
  SELECT s.k, s.v, 'new'
  FROM src s LEFT JOIN tgt t ON s.k = t.k
  WHERE t.k IS NULL
)
SELECT COUNT(*) AS n_rows,
       CAST(SUM(CAST(round(v * 100) AS BIGINT)) AS BIGINT) AS sum_vc,
       bit_xor(k) AS id_xor,
       COUNT(CASE WHEN et = 'amended' THEN 1 END) AS n_amended,
       COUNT(CASE WHEN et = 'new' THEN 1 END) AS n_new
FROM merged
""")
def q_sql_iceberg_merge_digest(spark: SparkSession,
                               sf_dir: str) -> DataFrame:
    """MERGE IN the Iceberg wire format through SQL (round 12): the
    WHEN surface commits ONE v2 MOR snapshot — matched rows
    position-delete under the registered unpartitioned global spec,
    clause-produced rows stage under the table's default spec — via
    ``iceberg_merge_when`` (`sources/iceberg.py`), zero adoption.
    Oracle recomputes the post-merge table as join algebra; the
    digest reads back merge-on-read."""
    import tempfile

    from harmony_energy_data_pipeline_spark.catalog import Catalog
    from harmony_energy_data_pipeline_spark.sql import snapshot_sql_script

    cat = Catalog(tempfile.mkdtemp(prefix="sqlimrg_"))
    cat.register("imt", format="iceberg")
    ev = load_table(spark, "events", sf_dir)
    ev.select(
        F.col("event_id").alias("k"), F.col("value").alias("v"),
        F.col("event_type").alias("et"),
    ).createOrReplaceTempView("imrg_tgt_src")
    ev.filter(F.col("event_id") % 2 == 0).select(
        F.col("event_id").alias("k"),
        (F.col("value") - 250.0).alias("v"),
        F.when(F.col("event_id") % 6 == 0, F.lit("drop"))
         .otherwise(F.lit("amend")).alias("op"),
    ).unionByName(
        ev.filter(F.col("event_id") % 17 == 0).select(
            (F.col("event_id") + 8000000).alias("k"),
            F.col("value").alias("v"),
            F.lit("fresh").alias("op"),
        )
    ).createOrReplaceTempView("imrg_chg")
    return snapshot_sql_script(spark, """
      CREATE TABLE imt AS SELECT k, v, et FROM imrg_tgt_src;
      MERGE INTO imt USING imrg_chg ON imt.k = imrg_chg.k
        WHEN MATCHED AND imrg_chg.op = 'drop' THEN DELETE
        WHEN MATCHED THEN UPDATE SET v = imrg_chg.v, et = 'amended'
        WHEN NOT MATCHED
          THEN INSERT (k, v, et) VALUES (imrg_chg.k, imrg_chg.v, 'new');
      SELECT COUNT(*) AS n_rows,
             CAST(SUM(CAST(round(v * 100) AS BIGINT)) AS BIGINT)
                 AS sum_vc,
             bit_xor(k) AS id_xor,
             COUNT(CASE WHEN et = 'amended' THEN 1 END) AS n_amended,
             COUNT(CASE WHEN et = 'new' THEN 1 END) AS n_new
      FROM imt
    """, catalog=cat)


@_q("sql_delta_merge_evolve_digest", """
WITH tgt AS (
  SELECT event_id AS k, value AS v FROM events WHERE event_id % 2 = 0
),
src AS (
  SELECT event_id AS k, value AS v,
         CAST(event_id % 100 AS DOUBLE) / 100.0 AS score
  FROM events WHERE event_id % 3 = 0
),
merged AS (
  SELECT t.k,
         CASE WHEN s.k IS NOT NULL THEN s.v ELSE t.v END AS v,
         CASE WHEN s.k IS NOT NULL THEN s.score
              ELSE CAST(NULL AS DOUBLE) END AS score
  FROM tgt t LEFT JOIN src s ON t.k = s.k
  UNION ALL
  SELECT s.k, s.v, s.score
  FROM src s LEFT JOIN tgt t ON s.k = t.k WHERE t.k IS NULL
)
SELECT COUNT(*) AS n_rows,
       CAST(SUM(CAST(round(v * 100) AS BIGINT)) AS BIGINT) AS sum_vc,
       CAST(SUM(CAST(round(coalesce(score, -1) * 100) AS BIGINT))
            AS BIGINT) AS sum_sc,
       bit_xor(k) AS id_xor
FROM merged
""")
def q_sql_delta_merge_evolve_digest(spark: SparkSession,
                                    sf_dir: str) -> DataFrame:
    """``MERGE WITH SCHEMA EVOLUTION`` ON the Delta wire format: the
    source carries a column the table lacks — it lands first as a
    metadata-only add-column commit (`sources/deltalake.py:
    delta_add_columns`; column-mapped tables allocate field ids per
    the spec), then the MOR merge writes it; pre-existing rows read
    NULL. The widening-CDC-source flow without adoption. Oracle:
    join algebra with the new column NULL for unmatched target
    rows."""
    import tempfile

    from harmony_energy_data_pipeline_spark.catalog import Catalog
    from harmony_energy_data_pipeline_spark.sql import snapshot_sql_script

    cat = Catalog(tempfile.mkdtemp(prefix="sqldme_"))
    cat.register("dme", format="delta")
    ev = load_table(spark, "events", sf_dir)
    ev.filter(F.col("event_id") % 2 == 0).select(
        F.col("event_id").alias("k"), F.col("value").alias("v"),
    ).createOrReplaceTempView("dme_tgt")
    ev.filter(F.col("event_id") % 3 == 0).select(
        F.col("event_id").alias("k"), F.col("value").alias("v"),
        ((F.col("event_id") % 100).cast("double") / 100.0
         ).alias("score"),
    ).createOrReplaceTempView("dme_chg")
    return snapshot_sql_script(spark, """
      CREATE TABLE dme AS SELECT k, v FROM dme_tgt;
      MERGE WITH SCHEMA EVOLUTION INTO dme USING dme_chg
        ON dme.k = dme_chg.k
        WHEN MATCHED THEN UPDATE SET *
        WHEN NOT MATCHED THEN INSERT *;
      SELECT COUNT(*) AS n_rows,
             CAST(SUM(CAST(round(v * 100) AS BIGINT)) AS BIGINT)
                 AS sum_vc,
             CAST(SUM(CAST(round(coalesce(score, -1) * 100)
                           AS BIGINT)) AS BIGINT) AS sum_sc,
             bit_xor(k) AS id_xor
      FROM dme
    """, catalog=cat)


@_q("sql_iceberg_merge_evolve_digest", """
WITH tgt AS (
  SELECT event_id AS k, value AS v FROM events WHERE event_id % 2 = 1
),
src AS (
  SELECT event_id AS k, value AS v,
         CAST(event_id % 50 AS BIGINT) AS gen
  FROM events WHERE event_id % 5 = 0
),
merged AS (
  SELECT t.k,
         CASE WHEN s.k IS NOT NULL THEN s.v ELSE t.v END AS v,
         CASE WHEN s.k IS NOT NULL THEN s.gen
              ELSE CAST(NULL AS BIGINT) END AS gen
  FROM tgt t LEFT JOIN src s ON t.k = s.k
  UNION ALL
  SELECT s.k, s.v, s.gen
  FROM src s LEFT JOIN tgt t ON s.k = t.k WHERE t.k IS NULL
)
SELECT COUNT(*) AS n_rows,
       CAST(SUM(CAST(round(v * 100) AS BIGINT)) AS BIGINT) AS sum_vc,
       CAST(SUM(coalesce(gen, -1)) AS BIGINT) AS sum_gen,
       bit_xor(k) AS id_xor
FROM merged
""")
def q_sql_iceberg_merge_evolve_digest(spark: SparkSession,
                                      sf_dir: str) -> DataFrame:
    """``MERGE WITH SCHEMA EVOLUTION`` ON the Iceberg wire format:
    the source's new column lands as a NEW schema under the next
    schema-id with its field id allocated past ``last-column-id``
    (`sources/iceberg.py: iceberg_add_columns`), then the single-
    snapshot MOR merge writes it. Oracle: join algebra with NULL for
    pre-existing rows."""
    import tempfile

    from harmony_energy_data_pipeline_spark.catalog import Catalog
    from harmony_energy_data_pipeline_spark.sql import snapshot_sql_script

    cat = Catalog(tempfile.mkdtemp(prefix="sqlime_"))
    cat.register("ime", format="iceberg")
    ev = load_table(spark, "events", sf_dir)
    ev.filter(F.col("event_id") % 2 == 1).select(
        F.col("event_id").alias("k"), F.col("value").alias("v"),
    ).createOrReplaceTempView("ime_tgt")
    ev.filter(F.col("event_id") % 5 == 0).select(
        F.col("event_id").alias("k"), F.col("value").alias("v"),
        (F.col("event_id") % 50).cast("long").alias("gen"),
    ).createOrReplaceTempView("ime_chg")
    return snapshot_sql_script(spark, """
      CREATE TABLE ime AS SELECT k, v FROM ime_tgt;
      MERGE WITH SCHEMA EVOLUTION INTO ime USING ime_chg
        ON ime.k = ime_chg.k
        WHEN MATCHED THEN UPDATE SET *
        WHEN NOT MATCHED THEN INSERT *;
      SELECT COUNT(*) AS n_rows,
             CAST(SUM(CAST(round(v * 100) AS BIGINT)) AS BIGINT)
                 AS sum_vc,
             CAST(SUM(coalesce(gen, -1)) AS BIGINT) AS sum_gen,
             bit_xor(k) AS id_xor
      FROM ime
    """, catalog=cat)


@_q("sql_delta_backfill_digest", """
WITH base AS (
  SELECT event_id AS k, event_id % 7 AS day, value AS v FROM events
),
-- DELETE k%5=0 ⊕ RESTORE to v0 (undoes it) ⊕ REPLACE WHERE day=3
after_restore AS (SELECT * FROM base),
backfill AS (
  SELECT k, day, v FROM after_restore WHERE day <> 3
  UNION ALL
  SELECT k + 5000000 AS k, day, v * 2 AS v
  FROM base WHERE day = 3
)
SELECT COUNT(*) AS n_rows,
       CAST(SUM(CAST(round(v * 100) AS BIGINT)) AS BIGINT) AS sum_vc,
       bit_xor(k) AS id_xor
FROM backfill
""")
def q_sql_delta_backfill_digest(spark: SparkSession,
                                sf_dir: str) -> DataFrame:
    """Backfill + rollback ON the Delta wire format through SQL
    (round 12): DELETE deletion-vectors rows out, ``RESTORE TABLE …
    TO VERSION AS OF 0`` rolls the live set back as a file-level
    diff commit (`sources/deltalake.py: delta_restore`), and
    ``INSERT INTO … REPLACE WHERE`` replaces a region as ONE MOR
    commit (`delta_replace_where`) — the idempotent backfill
    primitive. Oracle: the restore cancels the delete, so the final
    state is base with the day=3 region replaced."""
    import tempfile

    from harmony_energy_data_pipeline_spark.catalog import Catalog
    from harmony_energy_data_pipeline_spark.sql import snapshot_sql_script

    cat = Catalog(tempfile.mkdtemp(prefix="sqldbf_"))
    cat.register("dbt", format="delta")
    load_table(spark, "events", sf_dir).select(
        F.col("event_id").alias("k"),
        (F.col("event_id") % 7).alias("day"),
        F.col("value").alias("v"),
    ).createOrReplaceTempView("dbf_events")
    return snapshot_sql_script(spark, """
      CREATE TABLE dbt AS SELECT k, day, v FROM dbf_events;
      DELETE FROM dbt WHERE k % 5 = 0;
      RESTORE TABLE dbt TO VERSION AS OF 0;
      INSERT INTO dbt REPLACE WHERE day = 3
        SELECT k + 5000000 AS k, day, v * 2 AS v
        FROM dbf_events WHERE day = 3;
      SELECT COUNT(*) AS n_rows,
             CAST(SUM(CAST(round(v * 100) AS BIGINT)) AS BIGINT)
                 AS sum_vc,
             bit_xor(k) AS id_xor
      FROM dbt
    """, catalog=cat)


@_q("sql_iceberg_backfill_digest", """
WITH base AS (
  SELECT event_id AS k, event_id % 7 AS day, value AS v FROM events
),
backfill AS (
  SELECT k, day, v FROM base WHERE day <> 4
  UNION ALL
  SELECT k + 6000000 AS k, day, v + 10 AS v
  FROM base WHERE day = 4
)
SELECT COUNT(*) AS n_rows,
       CAST(SUM(CAST(round(v * 100) AS BIGINT)) AS BIGINT) AS sum_vc,
       bit_xor(k) AS id_xor
FROM backfill
""")
def q_sql_iceberg_backfill_digest(spark: SparkSession,
                                  sf_dir: str) -> DataFrame:
    """Backfill + rollback ON the Iceberg wire format: DELETE
    position-deletes rows, ``iceberg_restore`` rolls back with the
    spec's rollback_to_snapshot (current-snapshot-id moves, pure
    metadata), then SQL ``INSERT INTO … REPLACE WHERE`` replaces the
    day=4 region as ONE v2 MOR snapshot
    (`sources/iceberg.py: iceberg_replace_where`). Oracle: rollback
    cancels the delete; final state is base with day=4 replaced."""
    import tempfile

    from harmony_energy_data_pipeline_spark.catalog import Catalog
    from harmony_energy_data_pipeline_spark.sources import iceberg as ice
    from harmony_energy_data_pipeline_spark.sql import snapshot_sql_script

    root = tempfile.mkdtemp(prefix="sqlibf_")
    cat = Catalog(root)
    cat.register("ibt", format="iceberg")
    load_table(spark, "events", sf_dir).select(
        F.col("event_id").alias("k"),
        (F.col("event_id") % 7).alias("day"),
        F.col("value").alias("v"),
    ).createOrReplaceTempView("ibf_events")
    snapshot_sql_script(spark, """
      CREATE TABLE ibt AS SELECT k, day, v FROM ibf_events;
      DELETE FROM ibt WHERE k % 5 = 0;
    """, catalog=cat)
    sid0 = ice.iceberg_history(cat.table_path("ibt"))[0]["snapshot_id"]
    return snapshot_sql_script(spark, f"""
      RESTORE TABLE ibt TO VERSION AS OF {sid0};
      INSERT INTO ibt REPLACE WHERE day = 4
        SELECT k + 6000000 AS k, day, v + 10 AS v
        FROM ibf_events WHERE day = 4;
      SELECT COUNT(*) AS n_rows,
             CAST(SUM(CAST(round(v * 100) AS BIGINT)) AS BIGINT)
                 AS sum_vc,
             bit_xor(k) AS id_xor
      FROM ibt
    """, catalog=cat)


@_q("delta_cdf_digest", """
WITH gen1 AS (
  SELECT event_id AS k, value AS v FROM events WHERE event_id % 4 = 1
),
gen2 AS (
  SELECT event_id AS k, value AS v FROM events WHERE event_id % 4 = 2
)
SELECT COUNT(*) AS n_rows,
       CAST(SUM(CAST(round(v * 100) AS BIGINT)) AS BIGINT) AS sum_vc,
       bit_xor(k) AS id_xor,
       COUNT(DISTINCT CASE WHEN k % 4 = 1 THEN 1 ELSE 2 END)
           AS n_commits
FROM (SELECT * FROM gen1 UNION ALL SELECT * FROM gen2)
""")
def q_delta_cdf_digest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delta WIRE-FORMAT change feed (round 11): two appends after
    the base write read back through ``read_delta_changes`` as
    per-commit inserts, and an OPTIMIZE in between contributes
    NOTHING (dataChange=false — the no-op-commit rule the spec
    requires of a CDF reader). Oracle recomputes the two appended
    generations as SELECT algebra."""
    import tempfile

    from harmony_energy_data_pipeline_spark.sources import deltalake as dl

    ev = load_table(spark, "events", sf_dir).select(
        F.col("event_id").alias("k"), F.col("value").alias("v")
    )
    t = tempfile.mkdtemp(prefix="dcdf_") + "/t"
    dl.write_delta(ev.filter(F.col("k") % 4 == 0), t)          # v0
    dl.write_delta(ev.filter(F.col("k") % 4 == 1), t,
                   mode="append")                               # v1
    dl.delta_optimize(spark, t, min_files=1)                    # v2: noop
    dl.write_delta(ev.filter(F.col("k") % 4 == 2), t,
                   mode="append")                               # v3
    feed = dl.read_delta_changes(spark, t, 0)
    return feed.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(_cents("v")).cast("long").alias("sum_vc"),
        F.expr("bit_xor(k)").alias("id_xor"),
        F.countDistinct("_commit_version").alias("n_commits"),
    )


@_q("iceberg_spec_evolution_digest", """
WITH gen1 AS (
  SELECT event_id AS k, event_type AS et,
         CAST(event_id % 2 AS VARCHAR) AS shard, value AS v
  FROM events
),
gen2 AS (
  SELECT k + 9000000 AS k, et, shard, v
  FROM gen1 WHERE k % 5 = 0
),
unioned AS (SELECT * FROM gen1 UNION ALL SELECT * FROM gen2),
pruned AS (SELECT * FROM unioned WHERE et = 'click')
SELECT COUNT(*) AS n_rows,
       CAST(SUM(CAST(round(v * 100) AS BIGINT)) AS BIGINT) AS sum_vc,
       bit_xor(k) AS id_xor
FROM pruned
""")
def q_iceberg_spec_evolution_digest(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Iceberg PARTITION SPEC EVOLUTION (round 11): generation 1
    writes identity-partitioned by ``et`` (spec 0), the layout then
    evolves and generation 2 appends partitioned by ``shard``
    (spec 1, ``evolve_spec=True``) — the read prunes ``et='click'``
    ACROSS the boundary: old files prune exactly on their own spec's
    partition tuple, new files fall back to bounds/residual
    (`sources/iceberg.py: read_iceberg` resolves the spec per
    manifest via ``__spec_id``). Oracle recomputes both generations
    as SELECT algebra."""
    import tempfile

    from harmony_energy_data_pipeline_spark.sources import iceberg as ice

    ev = load_table(spark, "events", sf_dir).select(
        F.col("event_id").alias("k"), F.col("event_type").alias("et"),
        (F.col("event_id") % 2).cast("string").alias("shard"),
        F.col("value").alias("v"),
    )
    t = tempfile.mkdtemp(prefix="ice_spec_") + "/t"
    ice.write_iceberg(ev, t, partition_by=["et"], stats_cols=["k"])
    ice.write_iceberg(
        ev.filter(F.col("k") % 5 == 0).withColumn(
            "k", F.col("k") + 9000000
        ),
        t, mode="append", partition_by=["shard"], evolve_spec=True,
    )
    return ice.read_iceberg(
        spark, t, where=[("et", "click", "click")]
    ).groupBy().agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.round(F.col("v") * 100).cast("long"))
            .cast("long").alias("sum_vc"),
        F.expr("bit_xor(k)").alias("id_xor"),
    )


@_q("iceberg_transform_write_digest", """
WITH src AS (
  SELECT event_id AS k, ts, value AS v FROM events
),
pruned AS (
  SELECT * FROM src
  WHERE ts >= (SELECT min(ts) FROM src)
    AND ts <= (SELECT min(ts) + INTERVAL 2 DAY FROM src)
)
SELECT COUNT(*) AS n_rows,
       CAST(SUM(CAST(round(v * 100) AS BIGINT)) AS BIGINT) AS sum_vc,
       bit_xor(k) AS id_xor
FROM pruned
""")
def q_iceberg_transform_write_digest(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Iceberg TRANSFORM-PARTITIONED WRITES (round 11): the table
    lands with a ``day(ts) + bucket[4](k)`` spec — real Appendix-B
    murmur3 bucket tuples (vectorized Arrow batch hash; Spark's own
    ``hash()`` seeds differently) and day ordinals in the manifests —
    and the read prunes a two-day window on the day tuples before the
    residual re-applies (`sources/iceberg.py: write_iceberg /
    read_iceberg`). Oracle recomputes the window as SELECT algebra."""
    import datetime as _dt
    import tempfile

    from harmony_energy_data_pipeline_spark.sources import iceberg as ice

    ev = load_table(spark, "events", sf_dir).select(
        F.col("event_id").alias("k"), F.col("ts"),
        F.col("value").alias("v"),
    )
    t = tempfile.mkdtemp(prefix="ice_trw_") + "/t"
    ice.write_iceberg(
        ev, t, partition_by=["day(ts)", "bucket[4](k)"],
        stats_cols=["k"],
    )
    lo = ev.agg(F.min("ts")).collect()[0][0]
    hi = lo + _dt.timedelta(days=2)
    return ice.read_iceberg(
        spark, t,
        where=[("ts", lo.replace(tzinfo=_dt.timezone.utc),
                hi.replace(tzinfo=_dt.timezone.utc))],
    ).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(_cents("v")).cast("long").alias("sum_vc"),
        F.expr("bit_xor(k)").alias("id_xor"),
    )


@_q("iceberg_eq_delete_digest", """
WITH gen1 AS (
  SELECT event_id AS k, event_type AS et, value AS v FROM events
),
gen2 AS (
  SELECT event_id + 8000000 AS k, event_type AS et, value AS v
  FROM events WHERE event_id % 4 = 0
),
live AS (
  SELECT * FROM gen1 WHERE et <> 'error'   -- eq-delete hits old data
  UNION ALL
  SELECT * FROM gen2                        -- sequenced after: immune
)
SELECT COUNT(*) AS n_rows,
       CAST(SUM(CAST(round(v * 100) AS BIGINT)) AS BIGINT) AS sum_vc,
       bit_xor(k) AS id_xor
FROM live
""")
def q_iceberg_eq_delete_digest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iceberg EQUALITY DELETES (round 10, the Flink CDC-upsert wire
    shape): an equality-delete snapshot (content=2 file carrying only
    the equality column, ``equality_ids`` in the manifest) deletes
    every matching row from data SEQUENCED BEFORE it — and a later
    append re-introduces matching values untouched, which is exactly
    the sequence-scoping rule this digest pins: ``read_iceberg``
    groups data files by data sequence number and anti-joins each
    group against only the deletes sequenced after it (null-safe,
    broadcast). Oracle recomputes both generations as SELECT
    algebra."""
    import tempfile

    from harmony_energy_data_pipeline_spark.sources import iceberg as ice

    ev = load_table(spark, "events", sf_dir).select(
        F.col("event_id").alias("k"), F.col("event_type").alias("et"),
        F.col("value").alias("v"),
    )
    t = tempfile.mkdtemp(prefix="ice_eq_") + "/t"
    ice.write_iceberg(ev, t, stats_cols=["k"])              # seq 1
    ice.write_equality_deletes(spark, t, [{"et": "error"}], ["et"])
    ice.write_iceberg(                                       # seq 3
        ev.filter(F.col("k") % 4 == 0).select(
            (F.col("k") + 8000000).alias("k"), "et", "v"
        ),
        t, mode="append",
    )
    got = ice.read_iceberg(spark, t)
    return got.agg(
        F.count("*").alias("n_rows"),
        F.sum(_cents("v")).cast("long").alias("sum_vc"),
        F.expr("bit_xor(k)").alias("id_xor"),
    )


@_q("sql_iceberg_dml_part_digest", """
WITH base AS (
  SELECT event_id AS k, value AS v, event_type AS et, ts FROM events
),
upd AS (
  SELECT k,
         CASE WHEN et = 'click' AND k % 2 = 0 THEN v + 25 ELSE v END
             AS v,
         et, ts
  FROM base
),
del AS (SELECT * FROM upd WHERE NOT (k % 11 = 0))
SELECT COUNT(*) AS n_rows,
       CAST(SUM(CAST(round(v * 100) AS BIGINT)) AS BIGINT) AS sum_vc,
       bit_xor(k) AS id_xor,
       COUNT(DISTINCT et) AS n_et
FROM del
""")
def q_sql_iceberg_dml_part_digest(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Row-level DML on a PARTITIONED Iceberg table through SQL
    (round 12 — the r11 verdict's top item): the table is
    ``day(ts)``-transform-partitioned; UPDATE commits ONE snapshot
    whose position-delete manifest rides a registered UNPARTITIONED
    spec (the spec-valid global shape) while the transformed rows
    stage under the day-transform spec with real tuples; DELETE
    commits the same spec-valid position-delete shape
    (`sources/iceberg.py: iceberg_update_where / iceberg_delete_where`
    — the partitioned refusal is gone). Oracle recomputes as SELECT
    algebra."""
    import tempfile

    from harmony_energy_data_pipeline_spark.catalog import Catalog
    from harmony_energy_data_pipeline_spark.sql import snapshot_sql_script

    cat = Catalog(tempfile.mkdtemp(prefix="sqlipdml_"))
    cat.register("ipt", format="iceberg")
    load_table(spark, "events", sf_dir).select(
        F.col("event_id").alias("k"), F.col("value").alias("v"),
        F.col("event_type").alias("et"), F.col("ts"),
    ).createOrReplaceTempView("sqlipdml_events")
    return snapshot_sql_script(spark, """
      CREATE TABLE ipt PARTITIONED BY (day(ts))
        AS SELECT k, v, et, ts FROM sqlipdml_events;
      UPDATE ipt SET v = v + 25 WHERE et = 'click' AND k % 2 = 0;
      DELETE FROM ipt WHERE k % 11 = 0;
      SELECT COUNT(*) AS n_rows,
             CAST(SUM(CAST(round(v * 100) AS BIGINT)) AS BIGINT)
                 AS sum_vc,
             bit_xor(k) AS id_xor,
             COUNT(DISTINCT et) AS n_et
      FROM ipt
    """, catalog=cat)


@_q("delta_cdf_writer_digest", """
WITH base AS (
  SELECT event_id AS k, value AS v FROM events WHERE event_id % 3 = 0
),
upd_pre AS (
  SELECT k, v, 'update_preimage' AS ct FROM base WHERE k % 2 = 0
),
upd_post AS (
  SELECT k, v + 10 AS v, 'update_postimage' AS ct FROM base
  WHERE k % 2 = 0
),
live1 AS (
  SELECT k, CASE WHEN k % 2 = 0 THEN v + 10 ELSE v END AS v FROM base
),
del AS (
  SELECT k, v, 'delete' AS ct FROM live1 WHERE k % 5 = 0
),
live2 AS (SELECT * FROM live1 WHERE NOT (k % 5 = 0)),
ow_del AS (SELECT k, v, 'delete' AS ct FROM live2),
ow_ins AS (
  SELECT event_id AS k, value AS v, 'insert' AS ct FROM events
  WHERE event_id % 7 = 0
),
feed AS (
  SELECT * FROM upd_pre UNION ALL SELECT * FROM upd_post
  UNION ALL SELECT * FROM del UNION ALL SELECT * FROM ow_del
  UNION ALL SELECT * FROM ow_ins
)
SELECT COUNT(*) AS n_rows,
       CAST(SUM(CAST(round(v * 100) AS BIGINT)) AS BIGINT) AS sum_vc,
       bit_xor(k) AS id_xor,
       COUNT(DISTINCT ct) AS n_kinds
FROM feed
""")
def q_delta_cdf_writer_digest(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """OUR WRITER produces the Delta change feed (round 12 — VERDICT
    r11 #5): with ``delta.enableChangeDataFeed=true`` on the table,
    row-level DML auto-records spec ``cdc`` actions and a
    ``write_delta`` OVERWRITE emits the delete pre-images + inserts a
    foreign ``table_changes`` reader replays — a remove-carrying
    commit no longer bricks the feed. The whole range reads back
    through ``read_delta_changes`` (one scan per schema epoch, not
    per commit). Oracle recomputes every generation as SELECT
    algebra."""
    import json as _json
    import tempfile

    from harmony_energy_data_pipeline_spark.sources import deltalake as dl

    ev = load_table(spark, "events", sf_dir).select(
        F.col("event_id").alias("k"), F.col("value").alias("v")
    )
    t = tempfile.mkdtemp(prefix="dcdfw_") + "/t"
    dl.write_delta(ev.filter(F.col("k") % 3 == 0), t)          # v0
    _adds, meta, _p, v = dl._replay(t, None)
    meta = dict(meta)
    meta["configuration"] = {"delta.enableChangeDataFeed": "true"}
    with open(dl._log_path(t, v + 1), "w", encoding="utf-8") as fh:
        fh.write(_json.dumps({"metaData": meta}) + "\n")       # v1
    dl.delta_update_where(spark, t, "k % 2 = 0",
                          {"v": "v + 10"})                      # v2
    dl.delta_delete_where(spark, t, "k % 5 = 0")                # v3
    dl.write_delta(ev.filter(F.col("k") % 7 == 0), t,
                   mode="overwrite")                            # v4
    feed = dl.read_delta_changes(spark, t, v + 1)
    return feed.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(_cents("v")).cast("long").alias("sum_vc"),
        F.expr("bit_xor(k)").alias("id_xor"),
        F.countDistinct("_change_type").alias("n_kinds"),
    )


@_q("delta_cm_dml_digest", """
WITH base AS (
  SELECT event_id AS k, value AS v FROM events WHERE event_id % 2 = 0
),
live AS (
  SELECT k, CASE WHEN k % 6 = 0 THEN -1.0 ELSE v END AS v
  FROM base WHERE NOT (k % 10 = 0)
)
SELECT COUNT(*) AS n_rows,
       CAST(SUM(CAST(round(v * 100) AS BIGINT)) AS BIGINT) AS sum_vc,
       bit_xor(k) AS id_xor
FROM live
""")
def q_delta_cm_dml_digest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-level DML over a COLUMN-MAPPED (name-mode) Delta table
    (round 12 — VERDICT r11 #6): the foreign fixture stores
    physical-named parquet; the logical-name predicate drives DV
    DELETE then UPDATE (`sources/deltalake.py: _delta_mor_mutate`
    resolves physical names like read_delta; re-appended files store
    PHYSICAL names so the table keeps reading under its own mapping).
    Oracle recomputes as SELECT algebra."""
    import json as _json
    import os as _os
    import tempfile

    from harmony_energy_data_pipeline_spark.sources import deltalake as dl

    ev = load_table(spark, "events", sf_dir).select(
        F.col("event_id").alias("k"), F.col("value").alias("v")
    ).filter(F.col("k") % 2 == 0)
    t = tempfile.mkdtemp(prefix="dcm_") + "/t"
    _os.makedirs(_os.path.join(t, "_delta_log"))
    stage = _os.path.join(t, "stage0")
    ev.selectExpr("k AS `col-x`", "v AS `col-y`").coalesce(
        1
    ).write.parquet(stage)
    part = next(n for n in _os.listdir(stage)
                if n.endswith(".parquet"))
    _os.replace(_os.path.join(stage, part),
                _os.path.join(t, "part-000.parquet"))
    schema = {"type": "struct", "fields": [
        {"name": "k", "type": "long", "nullable": True, "metadata": {
            "delta.columnMapping.id": 1,
            "delta.columnMapping.physicalName": "col-x"}},
        {"name": "v", "type": "double", "nullable": True,
         "metadata": {
            "delta.columnMapping.id": 2,
            "delta.columnMapping.physicalName": "col-y"}},
    ]}
    with open(dl._log_path(t, 0), "w", encoding="utf-8") as fh:
        fh.write(_json.dumps({"protocol": {
            "minReaderVersion": 2, "minWriterVersion": 5}}) + "\n")
        fh.write(_json.dumps({"metaData": {
            "id": "cmdml", "format": {
                "provider": "parquet", "options": {}},
            "schemaString": _json.dumps(schema),
            "partitionColumns": [],
            "configuration": {"delta.columnMapping.mode": "name"},
            "createdTime": 0}}) + "\n")
        fh.write(_json.dumps({"add": {
            "path": "part-000.parquet", "partitionValues": {},
            "size": _os.path.getsize(
                _os.path.join(t, "part-000.parquet")),
            "modificationTime": 0, "dataChange": True}}) + "\n")
    dl.delta_delete_where(spark, t, "k % 10 = 0")
    dl.delta_update_where(spark, t, "k % 6 = 0", {"v": "-1.0"})
    got = dl.read_delta(spark, t)
    return got.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(_cents("v")).cast("long").alias("sum_vc"),
        F.expr("bit_xor(k)").alias("id_xor"),
    )


@_q("sql_merge_rich_evolve_digest", """
WITH base AS (
  SELECT event_id AS k, value AS v FROM events WHERE event_id % 3 = 0
),
src AS (
  SELECT event_id AS k, value + 100 AS v, event_type AS tag
  FROM events WHERE event_id % 4 = 0
),
merged AS (
  SELECT b.k,
         CASE WHEN s.k IS NOT NULL AND s.tag = 'click'
              THEN s.v ELSE b.v END AS v,
         CASE WHEN s.k IS NOT NULL AND s.tag = 'click'
              THEN s.tag ELSE NULL END AS tag
  FROM base b LEFT JOIN src s ON b.k = s.k
  UNION ALL
  SELECT s.k, s.v, s.tag
  FROM src s
  WHERE NOT EXISTS (SELECT 1 FROM base b WHERE b.k = s.k)
)
SELECT COUNT(*) AS n_rows,
       CAST(SUM(CAST(round(v * 100) AS BIGINT)) AS BIGINT) AS sum_vc,
       bit_xor(k) AS id_xor,
       COUNT(tag) AS n_tagged
FROM merged
""")
def q_sql_merge_rich_evolve_digest(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """``MERGE WITH SCHEMA EVOLUTION`` + CONDITIONED WHEN clauses
    (round 12 — VERDICT r11 #9): the source carries a NEW column and
    a condition gates the matched update — the widening-CDC-source
    shape (`sql.py` routes through ``snapshot_merge_when``'s
    ``evolve_schema``; `sinks/snapshots.py: _merge_evolve_schema`).
    Oracle recomputes the merge as join algebra."""
    import tempfile

    from harmony_energy_data_pipeline_spark.catalog import Catalog
    from harmony_energy_data_pipeline_spark.sql import snapshot_sql_script

    cat = Catalog(tempfile.mkdtemp(prefix="mrge_"))
    ev = load_table(spark, "events", sf_dir)
    ev.filter(F.col("event_id") % 3 == 0).select(
        F.col("event_id").alias("k"), F.col("value").alias("v")
    ).createOrReplaceTempView("mrge_base")
    ev.filter(F.col("event_id") % 4 == 0).select(
        F.col("event_id").alias("k"),
        (F.col("value") + 100).alias("v"),
        F.col("event_type").alias("tag"),
    ).createOrReplaceTempView("mrge_src")
    return snapshot_sql_script(spark, """
      CREATE TABLE met AS SELECT k, v FROM mrge_base;
      CREATE TABLE mes AS SELECT k, v, tag FROM mrge_src;
      MERGE WITH SCHEMA EVOLUTION INTO met USING mes
        ON met.k = mes.k
        WHEN MATCHED AND mes.tag = 'click' THEN UPDATE SET *
        WHEN NOT MATCHED THEN INSERT *;
      SELECT COUNT(*) AS n_rows,
             CAST(SUM(CAST(round(v * 100) AS BIGINT)) AS BIGINT)
                 AS sum_vc,
             bit_xor(k) AS id_xor,
             COUNT(tag) AS n_tagged
      FROM met
    """, catalog=cat)


@_q("iceberg_changes_digest", """
WITH base AS (
  SELECT event_id AS k, value AS v FROM events WHERE event_id % 3 = 0
),
gen2 AS (
  SELECT event_id AS k, value AS v FROM events WHERE event_id % 3 = 1
),
live AS (SELECT * FROM base UNION ALL SELECT * FROM gen2),
del AS (SELECT k, v, 'delete' AS ct FROM live WHERE k % 5 = 0),
upd AS (
  SELECT k, v FROM live WHERE k % 7 = 0 AND NOT (k % 5 = 0)
),
feed AS (
  SELECT k, v, 'insert' AS ct FROM gen2
  UNION ALL SELECT * FROM del
  UNION ALL SELECT k, v, 'delete' AS ct FROM upd
  UNION ALL SELECT k, v + 7, 'insert' AS ct FROM upd
)
SELECT COUNT(*) AS n_rows,
       CAST(SUM(CAST(round(v * 100) AS BIGINT)) AS BIGINT) AS sum_vc,
       bit_xor(k) AS id_xor,
       COUNT(DISTINCT ct) AS n_kinds
FROM feed
""")
def q_iceberg_changes_digest(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Iceberg wire-format CHANGELOG SCAN (round 12 — the
    ``read_delta_changes`` twin): incremental changes after a base
    snapshot read row-level — an append as inserts, a
    position-delete snapshot as materialized delete rows, the
    single-snapshot UPDATE as delete+insert
    (`sources/iceberg.py: read_iceberg_changes`; one data scan for
    the range's inserts + one for its delete-referenced files,
    snapshot ids from broadcast maps — plan arms bounded by change
    kinds, not snapshots). Oracle recomputes every generation as
    SELECT algebra."""
    import tempfile

    from harmony_energy_data_pipeline_spark.sources import iceberg as ice

    ev = load_table(spark, "events", sf_dir).select(
        F.col("event_id").alias("k"), F.col("value").alias("v")
    )
    t = tempfile.mkdtemp(prefix="ice_chg_") + "/t"
    ice.write_iceberg(ev.filter(F.col("k") % 3 == 0), t,
                      stats_cols=["k"])
    base = ice.table_metadata(t)["current-snapshot-id"]
    ice.write_iceberg(ev.filter(F.col("k") % 3 == 1), t,
                      mode="append", stats_cols=["k"])
    ice.iceberg_delete_where(spark, t, "k % 5 = 0")
    ice.iceberg_update_where(spark, t, "k % 7 = 0",
                             {"v": "v + 7"})
    feed = ice.read_iceberg_changes(spark, t, base)
    return feed.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(_cents("v")).cast("long").alias("sum_vc"),
        F.expr("bit_xor(k)").alias("id_xor"),
        F.countDistinct("_change_type").alias("n_kinds"),
    )


@_q("sql_table_changes_digest", """
WITH gen2 AS (
  SELECT event_id AS k, value AS v FROM events WHERE event_id % 4 = 1
),
gen3 AS (
  SELECT event_id AS k, value AS v FROM events WHERE event_id % 4 = 2
),
feed AS (
  SELECT k, v, 'insert' AS ct FROM gen2
  UNION ALL SELECT k, v, 'insert' AS ct FROM gen3
)
SELECT COUNT(*) AS n_rows,
       CAST(SUM(CAST(round(v * 100) AS BIGINT)) AS BIGINT) AS sum_vc,
       bit_xor(k) AS id_xor
FROM feed
""")
def q_sql_table_changes_digest(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """``TABLE_CHANGES(name, from[, to])`` in the SQL facade (round
    12): the Delta table-function shape, resolved per registered
    format to the row-level change feed (`sql.py: _rewrite_select` →
    native feed / read_delta_changes / read_iceberg_changes). Two
    INSERT commits after the base read back as inserts. Oracle
    recomputes the two generations as SELECT algebra."""
    import tempfile

    from harmony_energy_data_pipeline_spark.catalog import Catalog
    from harmony_energy_data_pipeline_spark.sql import snapshot_sql_script

    cat = Catalog(tempfile.mkdtemp(prefix="sqltc_"))
    ev = load_table(spark, "events", sf_dir)
    for m, vn in ((0, "sqltc_g1"), (1, "sqltc_g2"), (2, "sqltc_g3")):
        ev.filter(F.col("event_id") % 4 == m).select(
            F.col("event_id").alias("k"), F.col("value").alias("v")
        ).createOrReplaceTempView(vn)
    return snapshot_sql_script(spark, """
      CREATE TABLE ct AS SELECT k, v FROM sqltc_g1;
      INSERT INTO ct SELECT k, v FROM sqltc_g2;
      INSERT INTO ct SELECT k, v FROM sqltc_g3;
      SELECT COUNT(*) AS n_rows,
             CAST(SUM(CAST(round(v * 100) AS BIGINT)) AS BIGINT)
                 AS sum_vc,
             bit_xor(k) AS id_xor
      FROM TABLE_CHANGES(ct, 0)
    """, catalog=cat)


# ---------------------------------------------------------------------------
# contract surface
# ---------------------------------------------------------------------------

def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(_QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(_ORACLES)
