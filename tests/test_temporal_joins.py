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


def test_resample_with_fill_gapfill_and_locf(spark):
    from harmony_energy_data_pipeline_spark.operators.temporal import resample_with_fill

    df = spark.createDataFrame(
        [
            (1, "2024-01-01 00:10:00", 5.0),
            (1, "2024-01-01 03:20:00", 9.0),   # 2 missing hours before
            (2, "2024-01-01 01:00:00", 7.0),   # single-point series
        ],
        "k long, ts string, v double",
    ).selectExpr("k", "CAST(ts AS TIMESTAMP) AS ts", "v")
    out = resample_with_fill(df, "k", "ts", "v", step_seconds=3600)
    rows = {(r["k"], str(r["bucket"])): (r["v"], r["is_filled"]) for r in out.collect()}
    assert rows[(1, "2024-01-01 00:00:00")] == (5.0, False)
    assert rows[(1, "2024-01-01 01:00:00")] == (5.0, True)   # filled forward
    assert rows[(1, "2024-01-01 02:00:00")] == (5.0, True)
    assert rows[(1, "2024-01-01 03:00:00")] == (9.0, False)
    assert rows[(2, "2024-01-01 01:00:00")] == (7.0, False)
    assert len(rows) == 5


def test_resample_keeps_last_value_per_bucket(spark):
    from harmony_energy_data_pipeline_spark.operators.temporal import resample_with_fill

    df = spark.createDataFrame(
        [(1, "2024-01-01 00:05:00", 1.0), (1, "2024-01-01 00:55:00", 2.0)],
        "k long, ts string, v double",
    ).selectExpr("k", "CAST(ts AS TIMESTAMP) AS ts", "v")
    out = resample_with_fill(df, "k", "ts", "v").collect()
    assert len(out) == 1 and out[0]["v"] == 2.0  # latest observation wins


def test_time_weighted_avg_weights_by_holding_interval(spark):
    from harmony_energy_data_pipeline_spark.operators.temporal import time_weighted_avg

    # value 10 holds for 3600s, value 20 for 1800s; plain mean = 15,
    # time-weighted = (10*3600 + 20*1800) / 5400 = 13.333...
    df = spark.createDataFrame(
        [
            (1, "2024-01-01 00:00:00", 10.0),
            (1, "2024-01-01 01:00:00", 20.0),
            (1, "2024-01-01 01:30:00", 0.0),    # terminal point, no interval
            (2, "2024-01-01 00:00:00", 42.0),   # single point -> omitted
        ],
        "k long, ts string, v double",
    ).selectExpr("k", "CAST(ts AS TIMESTAMP) AS ts", "v")
    out = {r["k"]: r for r in time_weighted_avg(df, "k", "ts", "v").collect()}
    assert set(out) == {1}
    r = out[1]
    assert abs(r["twa"] - (10 * 3600 + 20 * 1800) / 5400) < 1e-12
    assert r["n_intervals"] == 2 and r["span_seconds"] == 5400
