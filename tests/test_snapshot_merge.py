"""Key-scoped MERGE INTO: source-wins upsert, sketch-scoped file
rewrites, pure inserts, conservative fallback without sketches."""
from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from harmony_energy_data_pipeline_spark.sinks import snapshots as snap


def _base(spark, path, member=True):
    df = spark.range(0, 1000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    )
    snap.snapshot_write(
        df.repartition(8, "k"), path,
        member_cols=["k"] if member else None,
    )


def test_merge_updates_and_inserts(spark, tmp_path):
    path = str(tmp_path / "t")
    _base(spark, path)
    src = spark.createDataFrame(
        [(5, -5), (6, -6), (2000, -1)], "k long, v long"
    )
    v = snap.snapshot_merge_into(spark, path, src, key="k")
    assert v == 1
    rows = {r.k: r.v for r in snap.read_snapshot(spark, path).collect()}
    assert len(rows) == 1001
    assert rows[5] == -5 and rows[6] == -6 and rows[2000] == -1
    assert rows[7] == 14  # untouched
    # the merge was surgical: most files carried
    m = snap._read_manifest(path, 1)
    assert m["rewrite"]["kind"] == "merge_into"
    assert m["rewrite"]["carried_files"] >= 1
    assert m["rewrite"]["rewritten_files"] < 8


def test_merge_pure_insert_carries_everything(spark, tmp_path):
    path = str(tmp_path / "t")
    _base(spark, path)
    m0 = snap._read_manifest(path, 0)
    # keys whose buckets may collide with existing sketches — use a
    # key far outside, but bucket collisions are possible, so assert
    # on CONTENT (exactness) and carried >= most files
    src = spark.createDataFrame([(10**9 + i, -1) for i in range(3)],
                                "k long, v long")
    snap.snapshot_merge_into(spark, path, src, key="k")
    rows = snap.read_snapshot(spark, path)
    assert rows.count() == 1003
    m1 = snap._read_manifest(path, 1)
    assert set(m0["files"]) & set(m1["files"])  # files carried


def test_merge_without_sketch_is_correct_not_surgical(spark, tmp_path):
    path = str(tmp_path / "t")
    _base(spark, path, member=False)
    src = spark.createDataFrame([(5, -5)], "k long, v long")
    snap.snapshot_merge_into(spark, path, src, key="k")
    rows = {r.k: r.v for r in snap.read_snapshot(spark, path).collect()}
    assert rows[5] == -5 and len(rows) == 1000
    m = snap._read_manifest(path, 1)
    # every file rewritten: no sketch to prove anything
    assert m["rewrite"]["carried_files"] == 0


def test_merge_column_mismatch_refused(spark, tmp_path):
    path = str(tmp_path / "t")
    _base(spark, path)
    bad = spark.createDataFrame([(1,)], "k long")
    with pytest.raises(ValueError, match="columns"):
        snap.snapshot_merge_into(spark, path, bad, key="k")


def test_merge_respects_constraints(spark, tmp_path):
    path = str(tmp_path / "t")
    df = spark.range(0, 10).select(F.col("id").alias("k"), F.lit(1.0).alias("pct"))
    snap.snapshot_write(df, path, member_cols=["k"], constraints=["pct >= 0"])
    bad = spark.createDataFrame([(1, -3.0)], "k long, pct double")
    with pytest.raises(snap.ConstraintViolationError):
        snap.snapshot_merge_into(spark, path, bad, key="k")
    ok = spark.createDataFrame([(1, 3.0)], "k long, pct double")
    snap.snapshot_merge_into(spark, path, ok, key="k")
    rows = {r.k: r.pct for r in snap.read_snapshot(spark, path).collect()}
    assert rows[1] == 3.0


def test_merge_delete_scope_mirror_sync(spark, tmp_path):
    # WHEN NOT MATCHED BY SOURCE DELETE, bounded to a scope (round 8):
    # re-sync the k<200 window from an upstream extract — keys that
    # vanished upstream vanish here; everything out of scope survives
    path = str(tmp_path / "t")
    df = spark.range(0, 1000).select(
        F.col("id").alias("k"),
        (F.col("id") * 2).alias("v"),
    )
    snap.snapshot_write(
        df.repartitionByRange(8, "k").sortWithinPartitions("k"),
        path, stats_cols=["k"], member_cols=["k"],
        member_bits=1 << 15, member_hashes=5,
    )
    # upstream window [0, 200): keys 0..99 updated, 100..199 GONE,
    # plus one brand-new key
    src = spark.range(0, 100).select(
        F.col("id").alias("k"), F.lit(-1).cast("long").alias("v")
    ).unionByName(spark.createDataFrame([(5000, -7)], "k long, v long"))
    v = snap.snapshot_merge_into(
        spark, path, src, key="k", delete_scope=[("k", 0, 199)],
    )
    rows = {r.k: r.v for r in snap.read_snapshot(spark, path).collect()}
    assert len(rows) == 1000 - 100 + 1
    assert all(rows[k] == -1 for k in range(100))
    assert all(k not in rows for k in range(100, 200))
    assert rows[200] == 400 and rows[999] == 1998 and rows[5000] == -7
    # out-of-scope files were carried, not rewritten
    m = snap._read_manifest_raw(path, v)
    assert m["rewrite"]["carried_files"] >= 1


def test_merge_delete_scope_null_predicate_rows_survive(spark, tmp_path):
    path = str(tmp_path / "t")
    base = spark.createDataFrame(
        [(1, 10, 1), (2, 20, None), (3, 30, 5)],
        "k long, v long, ts long",
    )
    snap.snapshot_write(base.coalesce(1), path)
    src = spark.createDataFrame([(1, -1, 1)], "k long, v long, ts long")
    snap.snapshot_merge_into(
        spark, path, src, key="k", delete_scope=[("ts", 0, 9)],
    )
    rows = {r.k: (r.v, r.ts) for r in snap.read_snapshot(spark, path).collect()}
    # k=1 upserted; k=3 in scope & missing from source -> deleted;
    # k=2 has NULL ts (scope predicate NULL) -> survives
    assert rows == {1: (-1, 1), 2: (20, None)}


def test_merge_delete_scope_cdf_folds_in_ivm(spark, tmp_path):
    from harmony_energy_data_pipeline_spark.pipeline import ivm

    path, vp = str(tmp_path / "t"), str(tmp_path / "v")
    df = spark.range(0, 300).select(
        F.col("id").alias("k"), (F.col("id") % 3).alias("g"),
        (F.col("id") * 2).alias("v"),
    )
    snap.snapshot_write(df.coalesce(2), path)
    ivm.refresh_agg_view(spark, path, vp, ["g"], ["v"])
    src = spark.range(0, 50).select(
        F.col("id").alias("k"), (F.col("id") % 3).alias("g"),
        F.lit(0).cast("long").alias("v"),
    )
    snap.snapshot_merge_into(
        spark, path, src, key="k", delete_scope=[("k", 0, 99)],
        record_cdf=True,
    )
    ivm.refresh_agg_view(spark, path, vp, ["g"], ["v"])
    exp = {
        r.g: (r.n, r.s)
        for r in snap.read_snapshot(spark, path).groupBy("g").agg(
            F.count("*").alias("n"), F.sum("v").alias("s")
        ).collect()
    }
    got = {
        r.g: (r.n, r.sum_v)
        for r in ivm.read_view(spark, vp).collect()
    }
    assert got == exp
