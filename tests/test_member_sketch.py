"""Membership-sketch file skipping: hash-twin agreement, equality
pruning on unclustered columns, saturation fallback, survival through
append/compact."""
from __future__ import annotations

from pyspark.sql import functions as F

from harmony_energy_data_pipeline_spark.sinks import snapshots as snap
from harmony_energy_data_pipeline_spark.sinks.filestats import (
    _MEMBER_BITS,
    portable_bucket,
)


def test_python_bucket_twin_matches_spark(spark):
    from harmony_energy_data_pipeline_spark.functions.hashx import portable_hash60

    vals = [0, 1, 42, 999983, -7, "alpha", "user_00042", ""]
    df = spark.createDataFrame([(str(v),) for v in vals], "s string")
    got = [
        r.b
        for r in df.select(
            F.pmod(portable_hash60(F.col("s")), F.lit(_MEMBER_BITS)).alias("b")
        ).collect()
    ]
    assert got == [portable_bucket(v) for v in vals]


def test_equality_pruning_on_unclustered_column(spark, tmp_path):
    path = str(tmp_path / "t")
    # 8 files, each holding a DISTINCT set of users
    df = spark.range(0, 4096).select(
        (F.col("id") % 64).alias("user"), F.col("id").alias("v")
    ).repartition(8, "user")
    snap.snapshot_write(df, path, member_cols=["user"], stats_cols=["user"])
    kept, total = snap.prune_files(path, [("user", 7, 7)])
    assert total == 8 and len(kept) < total
    got = snap.read_snapshot(spark, path, where=[("user", 7, 7)])
    want = snap.read_snapshot(spark, path).filter(F.col("user") == 7)
    assert sorted(r.v for r in got.collect()) == sorted(
        r.v for r in want.collect()
    )
    # value absent from the table: the sketch proves it for every file
    kept_absent, _ = snap.prune_files(path, [("user", 999, 999)])
    got_absent = snap.read_snapshot(spark, path, where=[("user", 999, 999)])
    assert got_absent.count() == 0
    # range predicates ignore the sketch (interval, not point)
    kept_rng, _ = snap.prune_files(path, [("user", 0, 63)])
    assert len(kept_rng) == total


def test_saturated_column_records_nothing(spark, tmp_path):
    path = str(tmp_path / "t")
    # ~4096 distinct values in one file: past the 75% bucket cap
    df = spark.range(0, 2 * _MEMBER_BITS).select(F.col("id").alias("k"))
    snap.snapshot_write(df.coalesce(1), path, member_cols=["k"])
    m = snap._read_manifest(path, 0)
    assert "members" not in m  # sketch refused: no pruning value
    kept, total = snap.prune_files(path, [("k", 5, 5)])
    assert len(kept) == total  # conservative keep


def test_members_survive_append_and_compact(spark, tmp_path):
    path = str(tmp_path / "t")
    a = spark.range(0, 100).select(F.lit("odd").alias("tag"), F.col("id").alias("v"))
    b = spark.range(100, 200).select(F.lit("even").alias("tag"), F.col("id").alias("v"))
    snap.snapshot_write(a.coalesce(1), path, member_cols=["tag"])
    snap.snapshot_write(b.coalesce(1), path, mode="append", member_cols=["tag"])
    kept, total = snap.prune_files(path, [("tag", "odd", "odd")])
    assert total == 2 and len(kept) == 1
    v = snap.snapshot_compact(spark, path, target_file_mb=1)
    m = snap._read_manifest(path, v)
    assert m.get("members")  # recomputed for the rewritten files
    got = snap.read_snapshot(spark, path, where=[("tag", "odd", "odd")])
    assert got.count() == 100
