"""Incremental view maintenance: delta-folded refresh equals full
recompute, idempotence, and the overwrite fallback."""
from __future__ import annotations

from pyspark.sql import functions as F

from harmony_energy_data_pipeline_spark.pipeline import ivm
from harmony_energy_data_pipeline_spark.sinks import snapshots as snap


def _batch(spark, lo, hi):
    return spark.range(lo, hi).select(
        (F.col("id") % 3).alias("g"),
        F.col("id").alias("v"),
    )


def _expect(spark, hi):
    return {
        r.g: (r.n, r.s)
        for r in _batch(spark, 0, hi)
        .groupBy("g")
        .agg(F.count("*").alias("n"), F.sum("v").alias("s"))
        .collect()
    }


def _got(spark, view):
    return {
        r.g: (r.n, r.sum_v) for r in ivm.read_view(spark, view).collect()
    }


def test_incremental_refresh_matches_full(spark, tmp_path):
    src, view = str(tmp_path / "src"), str(tmp_path / "view")
    snap.snapshot_write(_batch(spark, 0, 100), src)
    v = ivm.refresh_agg_view(spark, src, view, ["g"], ["v"])
    assert v == 0
    assert _got(spark, view) == _expect(spark, 100)
    # two append deltas, each folded incrementally
    snap.snapshot_write(_batch(spark, 100, 250), src, mode="append")
    snap.snapshot_write(_batch(spark, 250, 400), src, mode="append")
    v = ivm.refresh_agg_view(spark, src, view, ["g"], ["v"])
    assert v == 2
    assert _got(spark, view) == _expect(spark, 400)
    # the view manifest records the reflected source version
    m = snap._read_manifest(view, snap.latest_version(view))
    assert m[ivm.SOURCE_VERSION_KEY] == 2


def test_refresh_is_idempotent(spark, tmp_path):
    src, view = str(tmp_path / "src"), str(tmp_path / "view")
    snap.snapshot_write(_batch(spark, 0, 50), src)
    ivm.refresh_agg_view(spark, src, view, ["g"], ["v"])
    before = snap.latest_version(view)
    ivm.refresh_agg_view(spark, src, view, ["g"], ["v"])
    assert snap.latest_version(view) == before  # no-op, no new commit


def test_new_key_appears_and_old_keys_survive(spark, tmp_path):
    src, view = str(tmp_path / "src"), str(tmp_path / "view")
    base = spark.range(0, 10).select(
        F.lit(0).alias("g").cast("long"), F.col("id").alias("v")
    )
    snap.snapshot_write(base, src)
    ivm.refresh_agg_view(spark, src, view, ["g"], ["v"])
    extra = spark.range(0, 5).select(
        F.lit(7).cast("long").alias("g"), F.col("id").alias("v")
    )
    snap.snapshot_write(extra, src, mode="append")
    ivm.refresh_agg_view(spark, src, view, ["g"], ["v"])
    got = _got(spark, view)
    assert got[0] == (10, 45) and got[7] == (5, 10)


def test_overwrite_falls_back_to_full_recompute(spark, tmp_path):
    src, view = str(tmp_path / "src"), str(tmp_path / "view")
    snap.snapshot_write(_batch(spark, 0, 100), src)
    ivm.refresh_agg_view(spark, src, view, ["g"], ["v"])
    # source rewritten: the CDC fast path is undefined
    snap.snapshot_write(_batch(spark, 0, 30), src, mode="overwrite")
    v = ivm.refresh_agg_view(spark, src, view, ["g"], ["v"])
    assert v == 1
    assert _got(spark, view) == _expect(spark, 30)
