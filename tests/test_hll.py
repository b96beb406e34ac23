"""HyperLogLog sketch: accuracy envelope, exact mergeability, and
branch behavior (linear counting vs raw estimator)."""
from __future__ import annotations

from pyspark.sql import functions as F

from harmony_energy_data_pipeline_spark.io import load_table
from harmony_energy_data_pipeline_spark.operators.analytics import (
    hll_estimate,
    hll_merge,
    hll_registers,
)


def _reg_map(df):
    return {r.idx: r.r for r in df.collect()}


def test_estimate_within_hll_error(spark, sf_dir):
    ev = load_table(spark, "events", sf_dir)
    exact = ev.select("event_id").distinct().count()
    est = hll_estimate(hll_registers(ev, "event_id")).collect()[0].est
    # m=512 -> sigma ~ 1.04/sqrt(512) = 4.6%; allow 3 sigma
    assert abs(est - exact) / exact < 0.14


def test_merge_of_disjoint_shards_equals_full(spark, sf_dir):
    ev = load_table(spark, "events", sf_dir)
    full = _reg_map(hll_registers(ev, "event_id"))
    evens = hll_registers(ev.filter(F.col("event_id") % 2 == 0), "event_id")
    odds = hll_registers(ev.filter(F.col("event_id") % 2 == 1), "event_id")
    assert _reg_map(hll_merge(evens, odds)) == full


def test_merge_is_idempotent_under_overlap(spark, sf_dir):
    ev = load_table(spark, "events", sf_dir)
    full_reg = hll_registers(ev, "event_id")
    half = hll_registers(ev.filter(F.col("event_id") % 2 == 0), "event_id")
    # merging a subset into the full sketch changes nothing
    assert _reg_map(hll_merge(full_reg, half)) == _reg_map(full_reg)


def test_small_cardinality_uses_linear_counting(spark):
    df = spark.range(0, 30).select(F.col("id").alias("k"))
    row = hll_estimate(hll_registers(df, "k")).collect()[0]
    assert row.v_zero > 0  # sparse registers -> linear-counting branch
    assert abs(row.est - 30) / 30 < 0.2
    # duplicates don't move the sketch: distinct semantics
    dup = df.union(df).union(df)
    row2 = hll_estimate(hll_registers(dup, "k")).collect()[0]
    assert row2.est == row.est
