"""Serve-layer cache invalidation, chart projections, scheduler loop,
and config defaults."""

from __future__ import annotations

import time

from pyspark.sql import functions as F

from harmony_energy_data_pipeline_spark import config, serve
from harmony_energy_data_pipeline_spark.io import load_table
from harmony_energy_data_pipeline_spark.pipeline.schedule import IntervalScheduler


def test_versioned_cache_reloads_only_on_version_change(spark, tmp_path, sf_dir):
    path = str(tmp_path / "tbl.parquet")
    load_table(spark, "events", sf_dir).limit(100).write.parquet(path)
    loads = []

    def loader():
        loads.append(1)
        return spark.read.parquet(path)

    cache = serve.VersionedCache(loader, version_col="event_id")
    df1 = cache.get()
    n1 = df1.count()
    df2 = cache.get()
    assert df2 is df1  # same cached object while version unchanged
    # append rows with a larger key -> version moves -> reload
    df1.select(
        (F.col("event_id") + 1_000_000).alias("event_id"),
        "ts", "user_id", "event_type", "value", "props",
    ).limit(10).write.mode("append").parquet(path)
    df3 = cache.get()
    assert df3 is not df1
    assert df3.count() == n1 + 10


def test_chart_projections(spark):
    df = spark.createDataFrame(
        [("2024-01-01T00:00:00", 100.0, 40.0, 60.0, 40.0, 60.0)],
        "DATETIME string, GENERATION double, WIND double, ZERO_CARBON double, "
        "WIND_perc double, SOLAR_perc double",
    )
    mix = serve.fuel_mix_long(df, "DATETIME", ["WIND", "MISSING_FUEL"])
    assert {r["Fuel"] for r in mix.collect()} == {"WIND"}
    share = serve.fuel_share_long(df, "DATETIME", ["WIND_perc", "SOLAR_perc"])
    assert {r["Fuel"] for r in share.collect()} == {"WIND", "SOLAR"}
    carbon = serve.carbon_split(df, "DATETIME").collect()[0]
    assert carbon["CARBON"] == 40.0
    dual = serve.dual_axis(df, "DATETIME", "GENERATION", "WIND")
    assert dual.columns == ["DATETIME", "GENERATION", "WIND"]


def test_interval_scheduler_fires_and_survives_errors():
    calls = []

    def job():
        calls.append(1)
        if len(calls) == 1:
            raise RuntimeError("first run fails")

    sched = IntervalScheduler(job, interval_seconds=0.05).start()
    deadline = time.time() + 5
    while sched.run_count < 3 and time.time() < deadline:
        time.sleep(0.02)
    sched.stop()
    assert sched.run_count >= 3  # immediate run + repeats, error survived


def test_config_defaults_and_override(tmp_path):
    cfg = config.load_config(None)
    assert cfg["schedule_interval"] == 60
    p = tmp_path / "conf.json"
    p.write_text('{"batch_size": 123}')
    cfg = config.load_config(p)
    assert cfg["batch_size"] == 123
    assert config.get(cfg, "nope", 7) == 7


def test_default_date_range_per_interval():
    """Reference selectors.py:39-46: per-interval default start, end
    pinned to max; starts never precede the data's min."""
    from datetime import date

    from harmony_energy_data_pipeline_spark.serve import default_date_range

    lo, hi = date(2020, 1, 1), date(2024, 3, 1)
    assert default_date_range(lo, hi, "30m") == (date(2024, 2, 23), hi)
    assert default_date_range(lo, hi, "1h") == (date(2024, 2, 16), hi)
    assert default_date_range(lo, hi, "1d") == (date(2023, 12, 1), hi)
    # 5y back from 2024-03-01 precedes the data floor -> clamped to min
    assert default_date_range(lo, hi, "1mo") == (lo, hi)
    assert default_date_range(lo, hi, "1y") == (lo, hi)
    assert default_date_range(lo, hi, "whatever") == (lo, hi)


def test_interval_scheduler_is_fixed_rate():
    """Fire times anchor to start + k*interval: a slow job must not
    push the next slot back (fixed-rate, not fixed-delay)."""
    import time

    from harmony_energy_data_pipeline_spark.pipeline.schedule import (
        IntervalScheduler,
    )

    times = []

    def slow_job():
        times.append(time.monotonic())
        time.sleep(0.25)  # job takes longer than half the interval

    s = IntervalScheduler(slow_job, interval_seconds=0.4,
                          run_immediately=True).start()
    time.sleep(1.7)
    s.stop()
    assert len(times) >= 4  # fixed-DELAY (0.65s period) would fire only ~2-3
    gaps = [b - a for a, b in zip(times, times[1:])]
    # every gap tracks the interval, not interval + job duration
    assert all(g < 0.6 for g in gaps), gaps


def test_unpivot_helpers_handle_zero_matching_columns(spark):
    from harmony_energy_data_pipeline_spark import serve

    df = spark.createDataFrame([("2024-01-01 00:00:00",)], "DATETIME string")
    out = serve.fuel_mix_long(df, "DATETIME", ["SOLAR", "GAS"])
    assert out.count() == 0 and out.columns == ["DATETIME", "Fuel", "value"]
    out2 = serve.fuel_share_long(df, "DATETIME", ["SOLAR_perc"])
    assert out2.count() == 0 and out2.columns == ["DATETIME", "Fuel", "value"]


def test_scheduler_rejects_non_positive_interval():
    import pytest as _pytest

    from harmony_energy_data_pipeline_spark.pipeline.schedule import (
        IntervalScheduler,
    )

    for bad in (0, -1, -0.5):
        with _pytest.raises(ValueError, match="interval_seconds"):
            IntervalScheduler(lambda: None, bad)


def test_pipeline_chunked_merge_single_upsert_for_small_backfill(spark, tmp_path):
    """A multi-page backfill under merge_chunk_rows must land via ONE
    merge (not one per page) and still produce exact keyed content."""
    from harmony_energy_data_pipeline_spark.pipeline.run import run_pipeline
    from harmony_energy_data_pipeline_spark.sinks import upsert as upsert_mod

    rows = [
        {"_id": i, "DATETIME": f"2024-01-{1 + i // 24:02d}T{i % 24:02d}:00:00",
         "GAS": "1.0", "COAL": "2.0", "NUCLEAR": "3.0", "WIND": "0.5",
         "HYDRO": "0.1", "IMPORTS": "0.2", "BIOMASS": "0.3",
         "OTHER": "0.4", "SOLAR": "0.6", "STORAGE": "0.0",
         "GENERATION": "8.1", "CARBON_INTENSITY": "100",
         "LOW_CARBON": "4.5", "ZERO_CARBON": "4.2", "RENEWABLE": "1.2",
         "FOSSIL": "3.0", "GAS_perc": "12.3", "COAL_perc": "24.7",
         "NUCLEAR_perc": "37.0", "WIND_perc": "6.2", "HYDRO_perc": "1.2",
         "IMPORTS_perc": "2.5", "BIOMASS_perc": "3.7", "OTHER_perc": "4.9",
         "SOLAR_perc": "7.4", "STORAGE_perc": "0.0",
         "LOW_CARBON_perc": "55.6", "ZERO_CARBON_perc": "51.9",
         "RENEWABLE_perc": "14.8", "FOSSIL_perc": "37.0"}
        for i in range(1, 91)
    ]

    def fetch(last_id, limit):
        tail = [r for r in rows if r["_id"] > last_id]
        return tail[:limit]

    calls = {"n": 0}
    real = upsert_mod.upsert_parquet

    def counting(*a, **kw):
        calls["n"] += 1
        return real(*a, **kw)

    import harmony_energy_data_pipeline_spark.pipeline.run as run_mod

    orig = run_mod.upsert_parquet
    run_mod.upsert_parquet = counting
    try:
        m = run_pipeline(
            spark, fetch, str(tmp_path / "tbl"), batch_size=30,
            merge_chunk_rows=240_000,
        )
    finally:
        run_mod.upsert_parquet = orig
    assert m["total_fetched"] == 90
    assert calls["n"] == 1, f"expected one chunked merge, got {calls['n']}"
    assert spark.read.parquet(str(tmp_path / "tbl")).count() == 90
