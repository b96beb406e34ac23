"""ALTER TABLE DROP COLUMN (snapshot_drop_column): metadata-only,
time-travel preserving, tombstoned against name resurrection."""

from __future__ import annotations

import tempfile

import pytest
from pyspark.sql import functions as F

from harmony_energy_data_pipeline_spark.sinks import snapshots as snap
from harmony_energy_data_pipeline_spark.sinks.snapshots import (
    SchemaEvolutionError,
)


def _tmp():
    return tempfile.mkdtemp(prefix="dropcol_") + "/t"


def _df(spark, lo=0, hi=50):
    return spark.range(lo, hi).select(
        F.col("id").alias("k"),
        (F.col("id") * 2).alias("v"),
        F.concat(F.lit("s"), F.col("id")).alias("s"),
    )


def test_drop_is_metadata_only_and_time_travels(spark):
    t = _tmp()
    snap.snapshot_write(_df(spark), t)
    v0 = snap.latest_version(t)
    v1 = snap.snapshot_drop_column(t, "v")
    m = snap._read_manifest(t, v1)
    assert m["files"] == snap._read_manifest(t, v0)["files"]  # no rewrite
    got = snap.read_snapshot(spark, t)
    assert sorted(got.columns) == ["k", "s"]
    assert got.count() == 50
    # the pre-drop version still shows the column
    old = snap.read_snapshot(spark, t, version=v0)
    assert "v" in old.columns
    assert old.select(F.sum("v")).first()[0] == sum(2 * i for i in range(50))


def test_appends_after_drop(spark):
    t = _tmp()
    snap.snapshot_write(_df(spark), t)
    snap.snapshot_drop_column(t, "v")
    # append WITHOUT the column: fine
    snap.snapshot_write(
        spark.createDataFrame([(100, "x")], "k long, s string"),
        t, mode="append",
    )
    assert snap.read_snapshot(spark, t).count() == 51
    # append WITH the dropped column: refused (resurrection)
    with pytest.raises(SchemaEvolutionError, match="dropped column"):
        snap.snapshot_write(_df(spark, 200, 210), t, mode="append")
    # DDL re-add of the same name: refused
    with pytest.raises(SchemaEvolutionError, match="DROPPED earlier"):
        snap.snapshot_add_column(t, "v", "long")
    # a different name is fine
    snap.snapshot_add_column(t, "v2", "long")
    assert "v2" in snap.read_snapshot(spark, t).columns


def test_drop_guards(spark):
    t = _tmp()
    df = _df(spark)
    snap.snapshot_write(
        df, t, bucket_by=("k", 4),
        generated_cols={"vv": "v * 2"},
        constraints=["s IS NOT NULL"],
    )
    with pytest.raises(ValueError, match="bucket column"):
        snap.snapshot_drop_column(t, "k")
    with pytest.raises(ValueError, match="referenced by generated"):
        snap.snapshot_drop_column(t, "v")
    with pytest.raises(ValueError, match="constraints"):
        snap.snapshot_drop_column(t, "s")
    # dropping the GENERATED column itself drops its spec too
    snap.snapshot_drop_column(t, "vv")
    m = snap._read_manifest(t, snap.latest_version(t))
    assert "generated_cols" not in m
    assert "vv" in m["dropped_cols"]
    with pytest.raises(ValueError, match="no column"):
        snap.snapshot_drop_column(t, "zzz")


def test_drop_partition_col_refused(spark):
    t = _tmp()
    snap.snapshot_write(_df(spark), t, partition_by=["s"])
    with pytest.raises(ValueError, match="partition column"):
        snap.snapshot_drop_column(t, "s")


def test_drop_renamed_column_tombstones_lineage(spark):
    t = _tmp()
    snap.snapshot_write(_df(spark), t)
    snap.snapshot_rename_column(t, "v", "val")
    snap.snapshot_drop_column(t, "val")
    m = snap._read_manifest(t, snap.latest_version(t))
    assert set(m["dropped_cols"]) >= {"v", "val"}
    # neither the new nor the OLD name can come back
    with pytest.raises(SchemaEvolutionError):
        snap.snapshot_add_column(t, "v", "long")
    with pytest.raises(SchemaEvolutionError):
        snap.snapshot_add_column(t, "val", "long")


def test_tombstones_survive_row_level_rewrites(spark):
    t = _tmp()
    snap.snapshot_write(_df(spark), t, stats_cols=["k"])
    snap.snapshot_drop_column(t, "v")
    snap.snapshot_delete_where(spark, t, [("k", 0, 4)])  # COW rewrite
    m = snap._read_manifest(t, snap.latest_version(t))
    assert "v" in m.get("dropped_cols", [])
    assert snap.read_snapshot(spark, t).count() == 45
    with pytest.raises(SchemaEvolutionError):
        snap.snapshot_add_column(t, "v", "long")


class TestExprPredicates:
    """Arbitrary SQL-string predicates on the row-level ops (the
    escape hatch beyond interval triples; no pruning, same exactness)."""

    def test_dv_delete_expr(self, spark):
        t = _tmp()
        snap.snapshot_write(_df(spark), t, stats_cols=["k"])
        snap.snapshot_delete_where_dv(spark, t, "k % 13 = 0")
        got = snap.read_snapshot(spark, t)
        assert got.count() == 50 - len([i for i in range(50) if i % 13 == 0])
        assert got.filter("k % 13 = 0").count() == 0

    def test_cow_update_expr(self, spark):
        t = _tmp()
        snap.snapshot_write(_df(spark), t)
        snap.snapshot_update_where(
            spark, t, "k % 10 = 3 AND v > 10", {"v": "v + 1000"}
        )
        got = snap.read_snapshot(spark, t)
        want = {
            i: (2 * i + 1000 if i % 10 == 3 and 2 * i > 10 else 2 * i)
            for i in range(50)
        }
        assert {r["k"]: r["v"] for r in got.collect()} == want

    def test_read_snapshot_expr_where(self, spark):
        t = _tmp()
        snap.snapshot_write(_df(spark), t)
        got = snap.read_snapshot(spark, t, where="k % 7 = 0 AND v < 60")
        assert sorted(r["k"] for r in got.collect()) == [0, 7, 14, 21, 28]

    def test_expr_change_feed_folds(self, spark):
        """A string-predicate DV delete still feeds IVM exactly."""
        from harmony_energy_data_pipeline_spark.pipeline import ivm

        t = _tmp()
        view = t + "_view"
        snap.snapshot_write(_df(spark), t)
        ivm.refresh_agg_view(spark, t, view, keys=["s"], sum_cols=["v"])
        snap.snapshot_delete_where_dv(spark, t, "k % 2 = 0")
        ivm.refresh_agg_view(spark, t, view, keys=["s"], sum_cols=["v"])
        got = ivm.read_view(spark, view)
        assert got.count() == 25
        assert got.agg(F.sum("n")).first()[0] == 25
