"""As-of and interval join semantics on hand-built frames, plus
bucketed-vs-broadcast interval join parity."""

from __future__ import annotations

from pyspark.sql import functions as F

from harmony_energy_data_pipeline_spark.operators.temporal import (
    asof_join,
    bucketed_interval_join,
    interval_join,
)


def _trades_quotes(spark):
    trades = spark.createDataFrame(
        [(1, 10, "t1"), (1, 20, "t2"), (1, 5, "t0"), (2, 15, "t3")],
        "sym long, ts long, trade string",
    )
    quotes = spark.createDataFrame(
        [(1, 8, 100.0), (1, 10, 101.0), (1, 18, 102.0), (3, 1, 999.0)],
        "sym long, ts long, px double",
    )
    return trades, quotes


def test_asof_left_semantics(spark):
    trades, quotes = _trades_quotes(spark)
    out = {
        (r["sym"], r["ts"]): r["px"]
        for r in asof_join(trades, quotes, on="sym", how="left").collect()
    }
    assert out == {
        (1, 5): None,        # no quote at or before ts=5
        (1, 10): 101.0,      # ts-equal quote matches (<=)
        (1, 20): 102.0,      # latest earlier quote
        (2, 15): None,       # key with no quotes at all
    }


def test_asof_inner_drops_unmatched(spark):
    trades, quotes = _trades_quotes(spark)
    out = asof_join(trades, quotes, on="sym", how="inner")
    assert {(r["sym"], r["ts"]) for r in out.collect()} == {(1, 10), (1, 20)}


def test_bucketed_interval_join_matches_broadcast(spark, sf_dir):
    from harmony_energy_data_pipeline_spark.io import load_table
    ev = load_table(spark, "events", sf_dir).select("event_id", "value")
    bands = spark.range(10).select(
        F.col("id").alias("band_id"),
        (F.col("id") * 20.0).alias("lo"),
        ((F.col("id") + 1) * 20.0).alias("hi"),
    )
    want = sorted(
        (r["event_id"], r["band_id"])
        for r in interval_join(ev, "value", bands, "lo", "hi").collect()
    )
    got = sorted(
        (r["event_id"], r["band_id"])
        for r in bucketed_interval_join(ev, "value", bands, "lo", "hi", 15.0).collect()
    )
    assert got == want and want
