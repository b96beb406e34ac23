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


# ---------------------------------------------------------------------------
# batch sessionization (gaps-and-islands)
# ---------------------------------------------------------------------------

def test_sessionize_hand_computed(spark):
    from harmony_energy_data_pipeline_spark.operators.temporal import sessionize

    rows = [
        # user 1: 3 events within 30min -> one session; then a 2h gap
        (1, 1, "2024-01-01 10:00:00", 10.0),
        (2, 1, "2024-01-01 10:10:00", 20.0),
        (3, 1, "2024-01-01 10:40:00", 30.0),   # 30min gap == threshold: SAME session
        (4, 1, "2024-01-01 12:41:00", 40.0),   # > 30min: new session
        # user 2: single event
        (5, 2, "2024-01-01 00:00:00", 5.5),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, user_id long, ts_s string, value double"
    ).select("event_id", "user_id", F.col("ts_s").cast("timestamp").alias("ts"), "value")
    out = {
        (r.user_id, r.session_seq): r
        for r in sessionize(
            ev, key="user_id", ts_col="ts", gap_seconds=1800,
            tiebreak_col="event_id", value_col="value",
        ).collect()
    }
    assert len(out) == 3
    s11 = out[(1, 1)]
    assert s11.n_events == 3 and s11.sum_value_cents == 6000
    assert str(s11.session_start).startswith("2024-01-01 10:00:00")
    assert str(s11.session_end).startswith("2024-01-01 10:40:00")
    s12 = out[(1, 2)]
    assert s12.n_events == 1 and s12.sum_value_cents == 4000
    assert out[(2, 1)].n_events == 1


def test_sessionize_single_shuffle_plan(spark, sf_dir):
    """Both window passes and the per-session agg must share ONE
    key-partitioned exchange — sessionization at 100 TB is a single
    shuffle, not three."""
    from harmony_energy_data_pipeline_spark.io import load_table
    from harmony_energy_data_pipeline_spark.operators.temporal import sessionize
    from harmony_energy_data_pipeline_spark.plans.inspect import shuffle_count

    ev = load_table(spark, "events", sf_dir)
    out = sessionize(
        ev, key="user_id", ts_col="ts", gap_seconds=1800,
        tiebreak_col="event_id", value_col="value",
    )
    assert shuffle_count(out) == 1
    assert out.count() > 0
