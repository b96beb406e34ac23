"""ANALYZE column statistics + layout advisor (sinks/analyze.py)."""

from __future__ import annotations

import tempfile

import pytest
from pyspark.sql import functions as F

from harmony_energy_data_pipeline_spark.sinks import analyze as az
from harmony_energy_data_pipeline_spark.sinks import snapshots as snap


def _tmp():
    return tempfile.mkdtemp(prefix="analyze_") + "/t"


def _df(spark, n=1000):
    return spark.range(n).select(
        F.col("id").alias("k"),                      # NDV = n (key-like)
        (F.col("id") % 5).cast("int").alias("cat"),  # NDV = 5
        F.when(F.col("id") % 10 == 0, None)
        .otherwise(F.concat(F.lit("s"), F.col("id") % 37))
        .alias("s"),                                 # NDV = 37, 10% null
    )


def test_analyze_and_read_back(spark):
    t = _tmp()
    snap.snapshot_write(_df(spark), t)
    v = az.snapshot_analyze(spark, t)
    assert v == snap.latest_version(t)
    cs = az.snapshot_column_stats(t)
    assert cs["computed_at_version"] == v - 1
    assert cs["n_rows"] == 1000
    k = cs["columns"]["k"]
    assert k["n_nulls"] == 0 and k["min"] == 0 and k["max"] == 999
    # HLL standard error at m=512 is ~4.6%; allow 3 sigma
    assert abs(k["ndv_est"] - 1000) < 0.15 * 1000
    cat = cs["columns"]["cat"]
    assert abs(cat["ndv_est"] - 5) < 2
    s = cs["columns"]["s"]
    assert s["n_nulls"] == 100
    assert abs(s["ndv_est"] - 37) < 8
    # the commit is metadata-only: same live files
    m = snap._read_manifest(t, v)
    assert m["files"] == snap._read_manifest(t, v - 1)["files"]


def test_stats_survive_later_commits(spark):
    t = _tmp()
    snap.snapshot_write(_df(spark, 100), t)
    az.snapshot_analyze(spark, t, cols=["k"])
    snap.snapshot_write(_df(spark, 10), t, mode="append")
    snap.snapshot_write(_df(spark, 10), t, mode="append")
    cs = az.snapshot_column_stats(t)
    assert cs is not None and cs["n_rows"] == 100  # stamped, stale
    assert az.snapshot_column_stats(t)["computed_at_version"] == 0


def test_never_analyzed_returns_none(spark):
    t = _tmp()
    snap.snapshot_write(_df(spark, 10), t)
    assert az.snapshot_column_stats(t) is None
    tips = az.suggest_layout(spark, t)
    assert tips[0]["suggestion"] == "analyze"


def test_bad_columns_raise(spark):
    t = _tmp()
    df = spark.range(5).select(
        F.col("id").alias("k"), F.rand(1).alias("f"),
        F.expr("timestamp'2024-01-01' + make_interval(0,0,0,0,id)")
        .alias("ts"),
    )
    snap.snapshot_write(df, t)
    with pytest.raises(ValueError, match="non-portable"):
        az.snapshot_analyze(spark, t, cols=["ts"])
    with pytest.raises(ValueError, match="not in the table"):
        az.snapshot_analyze(spark, t, cols=["zzz"])
    # floats analyze via the canonical 1e-6 encoding (round 10);
    # default col selection includes them, skips the timestamp
    az.snapshot_analyze(spark, t)
    cs = az.snapshot_column_stats(t)["columns"]
    assert list(cs) == ["k", "f"]
    assert cs["f"]["ndv_est"] > 0


def test_float_ndv_canonical_semantics(spark):
    """Float NDV is distinct-at-1e-6: values closer than 5e-7
    collapse; nan/inf/decade buckets count as distinct tokens."""
    t = _tmp()
    vals = [1.0, 1.0000001, 1.5, -2.25, 0.0, -0.0,
            float("nan"), float("inf"), 9.1e12, 9.2e12]
    df = spark.createDataFrame([(v,) for v in vals], "f double")
    snap.snapshot_write(df, t)
    az.snapshot_analyze(spark, t, cols=["f"])
    st = az.snapshot_column_stats(t)["columns"]["f"]
    # distinct canon tokens: 1.0≡1.0000001 → '1000000'; 1.5; -2.25;
    # 0.0≡-0.0 → '0'; nan; inf; 9.1e12≡9.2e12 → 'big+13' = 7 tokens
    assert 6.0 <= st["ndv_est"] <= 8.1


def test_suggest_layout_rules(spark):
    t = _tmp()
    snap.snapshot_write(_df(spark), t)
    az.snapshot_analyze(spark, t)
    tips = {
        (s["suggestion"], s.get("column")) for s in az.suggest_layout(spark, t)
    }
    assert ("bucket_by", "k") in tips          # NDV ≈ rows
    assert ("partition_by", "cat") in tips     # NDV 5
    assert ("stats_cols", None) in tips        # no zone maps recorded
    # a bucketed, analyzed table stops suggesting bucket_by
    t2 = _tmp()
    snap.snapshot_write(_df(spark), t2, bucket_by=("k", 8),
                        stats_cols=["k"])
    az.snapshot_analyze(spark, t2)
    tips2 = {s["suggestion"] for s in az.suggest_layout(spark, t2)}
    assert "bucket_by" not in tips2 and "stats_cols" not in tips2


def test_auto_maintain_keeps_stats_fresh(spark):
    from harmony_energy_data_pipeline_spark.pipeline.maintenance import (
        auto_maintain,
    )
    from pyspark.sql import functions as F2

    t = _tmp()
    snap.snapshot_write(_df(spark, 100), t)
    # never analyzed → the pass analyzes
    out = auto_maintain(spark, t, analyze_stale_after=3)
    assert out["analyzed"] is True
    v0 = az.snapshot_column_stats(t)["computed_at_version"]
    # fresh → no re-analyze
    out = auto_maintain(spark, t, analyze_stale_after=3)
    assert out["analyzed"] is False
    # 4 commits later → stale → re-analyze
    for i in range(4):
        snap.snapshot_write(
            spark.range(i, i + 1).select(
                F2.col("id").alias("k"),
                F2.lit(0).cast("int").alias("cat"),
                F2.lit("x").alias("s"),
            ),
            t, mode="append",
        )
    out = auto_maintain(spark, t, analyze_stale_after=3)
    assert out["analyzed"] is True
    assert az.snapshot_column_stats(t)["computed_at_version"] > v0


def test_clustering_advice_from_span_ratio(spark):
    from pyspark.sql import functions as F3

    t = _tmp()
    # round-robin write: every file spans the full k domain
    df = spark.range(20_000).select(
        F3.col("id").alias("k"), (F3.col("id") % 5).cast("int").alias("cat"),
        F3.lit("x").alias("s"),
    )
    snap.snapshot_write(df.repartition(8), t, stats_cols=["k"])
    az.snapshot_analyze(spark, t, cols=["k"])
    tips = {(s["suggestion"], s.get("column"))
            for s in az.suggest_layout(spark, t)}
    assert ("cluster_by", "k") in tips
    # re-cluster: the advice goes away
    snap.snapshot_compact(spark, t, target_file_mb=1, cluster_by=["k"])
    az.snapshot_analyze(spark, t, cols=["k"])
    tips2 = {(s["suggestion"], s.get("column"))
             for s in az.suggest_layout(spark, t)}
    assert ("cluster_by", "k") not in tips2
