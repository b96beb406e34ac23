"""Deletion vectors (merge-on-read) — round 7: DV deletes match the
copy-on-write result exactly; rewrites/compaction materialize and
retire vectors; time travel, vacuum, CDC, and NULL semantics hold."""
from __future__ import annotations

import os

import pytest

from pyspark.sql import functions as F

from harmony_energy_data_pipeline_spark.sinks import snapshots as snap


def _table(spark, path, n=1000, parts=8):
    df = spark.range(0, n).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("v")
    )
    snap.snapshot_write(
        df.repartitionByRange(parts, "k").sortWithinPartitions("k"),
        path, stats_cols=["k"],
    )


def _rows(spark, path, version=None):
    return sorted(
        (r.k, r.v)
        for r in snap.read_snapshot(spark, path, version).collect()
    )


def test_dv_delete_matches_cow_delete(spark, tmp_path):
    cow, dv = str(tmp_path / "cow"), str(tmp_path / "dv")
    _table(spark, cow)
    _table(spark, dv)
    where = [("k", 100, 299)]
    snap.snapshot_delete_where(spark, cow, where)
    v = snap.snapshot_delete_where_dv(spark, dv, where)
    assert _rows(spark, dv) == _rows(spark, cow)
    # no data file was rewritten: the manifest only grew vectors
    raw = snap._read_manifest_raw(dv, v)
    assert raw["adds"] == [] and raw["removes"] == []
    assert raw["dv_adds"]
    m0 = snap._read_manifest(dv, 0)
    m1 = snap._read_manifest(dv, v)
    assert m1["files"] == m0["files"]


def test_dv_stacking_and_time_travel(spark, tmp_path):
    path = str(tmp_path / "t")
    _table(spark, path)
    snap.snapshot_delete_where_dv(spark, path, [("k", 0, 99)])
    snap.snapshot_delete_where_dv(spark, path, [("k", 50, 199)])  # overlap
    got = [k for k, _ in _rows(spark, path)]
    assert got == list(range(200, 1000))
    # each version sees its own vector set
    assert len(_rows(spark, path, 0)) == 1000
    assert [k for k, _ in _rows(spark, path, 1)] == list(range(100, 1000))
    # pruned read still applies vectors
    assert snap.read_snapshot(
        spark, path, where=[("k", 0, 299)]
    ).count() == 100


def test_dv_null_predicate_rows_survive(spark, tmp_path):
    path = str(tmp_path / "t")
    base = spark.range(0, 100).select(
        F.col("id").alias("k"),
        F.when(F.col("id") % 10 == 0, None).otherwise(F.col("id")).alias("v"),
    )
    snap.snapshot_write(base.repartition(4), path, stats_cols=["v"])
    snap.snapshot_delete_where_dv(spark, path, [("v", 0, 49)])
    rows = {r.k: r.v for r in snap.read_snapshot(spark, path).collect()}
    # NULL-v rows survive (predicate NULL != match), like COW/SQL
    assert all(k in rows for k in range(0, 100, 10))
    assert all(k not in rows for k in range(1, 50) if k % 10 != 0)


def test_rewrite_materializes_and_retires_vectors(spark, tmp_path):
    path = str(tmp_path / "t")
    _table(spark, path)
    # both ops inside file[0] (rows 0-124 of the 8-way range layout)
    snap.snapshot_delete_where_dv(spark, path, [("k", 100, 120)])
    # copy-on-write UPDATE over the same file: must not resurrect the
    # DV-deleted rows, and the file's vectors retire with the rewrite
    snap.snapshot_update_where(
        spark, path, [("k", 0, 99)], {"v": F.lit(-1).cast("long")}
    )
    rows = {r.k: r.v for r in snap.read_snapshot(spark, path).collect()}
    assert all(k not in rows for k in range(100, 121))
    assert all(rows[k] == -1 for k in range(0, 100))
    assert rows[121] == 363  # untouched neighbor intact
    m = snap._read_manifest(path, snap.latest_version(path))
    assert not m.get("dvs")  # the only vectored file was rewritten


def test_compaction_clears_vectors(spark, tmp_path):
    path = str(tmp_path / "t")
    _table(spark, path)
    snap.snapshot_delete_where_dv(spark, path, [("k", 0, 499)])
    v = snap.snapshot_compact(spark, path)
    m = snap._read_manifest(path, v)
    assert not m.get("dvs")
    assert snap.read_snapshot(spark, path).count() == 500
    assert _rows(spark, path) == [(k, 3 * k) for k in range(500, 1000)]


def test_dv_cdc_and_noop_and_vacuum(spark, tmp_path):
    path = str(tmp_path / "t")
    _table(spark, path)
    extra = spark.range(2000, 2100).select(
        F.col("k") if "k" in [] else F.col("id").alias("k"),
        (F.col("id") * 3).alias("v"),
    ).coalesce(1)
    snap.snapshot_write(extra, path, mode="append", stats_cols=["k"])
    dv_v = snap.snapshot_delete_where_dv(spark, path, [("k", 0, 49)])
    # CDC crossing the DV commit raises (deletes are not diffable)
    with pytest.raises(ValueError, match="not append-only"):
        snap.read_snapshot_changes(spark, path, 0, dv_v)
    # pruning-proved no-op commits nothing
    assert snap.snapshot_delete_where_dv(
        spark, path, [("k", 90_000, 99_000)]
    ) == dv_v
    # vacuum keeps the vector files of live versions
    snap.vacuum(path, keep_last=1, orphan_grace_s=0.0)
    # 1000 base + 100 appended - 50 DV-deleted
    assert snap.read_snapshot(spark, path).count() == 1050
    m = snap._read_manifest(path, snap.latest_version(path))
    for ds in m.get("dvs", {}).values():
        for d in ds:
            assert os.path.exists(snap._abs_file(path, d))


def test_dv_restore_carries_vectors(spark, tmp_path):
    path = str(tmp_path / "t")
    _table(spark, path)
    dv_v = snap.snapshot_delete_where_dv(spark, path, [("k", 0, 99)])
    snap.snapshot_write(
        spark.range(0, 10).select(
            F.col("id").alias("k"), (F.col("id") * 3).alias("v")
        ),
        path, mode="overwrite",
    )
    rv = snap.snapshot_restore(path, dv_v)
    assert snap._read_manifest(path, rv).get("dvs")
    assert [k for k, _ in _rows(spark, path)] == list(range(100, 1000))


def test_wap_audit_sees_dv_applied_candidate(spark, tmp_path):
    path = str(tmp_path / "t")
    _table(spark, path, n=100, parts=2)
    snap.snapshot_delete_where_dv(spark, path, [("k", 0, 49)])
    seen = {}

    def count_audit(df):
        seen["n"] = df.count()
        return True

    snap.snapshot_write_audited(
        spark.range(500, 510).select(
            F.col("id").alias("k"), (F.col("id") * 3).alias("v")
        ),
        path, audits={"count": count_audit}, mode="append",
    )
    assert seen["n"] == 60  # 50 live + 10 new, NOT 110
    assert snap.read_snapshot(spark, path).count() == 60
