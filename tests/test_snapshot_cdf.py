"""Row-level change feed (round 7): inserts from appends, deletes
recovered from deletion vectors, and the IVM fast path that folds
deletes without recomputing."""
from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from harmony_energy_data_pipeline_spark.pipeline import ivm
from harmony_energy_data_pipeline_spark.sinks import snapshots as snap


def _seed(spark, path):
    df = spark.range(0, 300).select(
        (F.col("id") % 3).alias("g"), F.col("id").alias("v")
    )
    snap.snapshot_write(
        df.repartitionByRange(4, "v"), path, stats_cols=["v"]
    )


def test_feed_emits_inserts_and_dv_deletes(spark, tmp_path):
    path = str(tmp_path / "t")
    _seed(spark, path)
    snap.snapshot_write(
        spark.range(1000, 1050).select(
            (F.col("id") % 3).alias("g"), F.col("id").alias("v")
        ).coalesce(1),
        path, mode="append", stats_cols=["v"],
    )
    snap.snapshot_delete_where_dv(spark, path, [("v", 0, 49)])
    feed = snap.read_snapshot_changes_feed(spark, path, 0, 2)
    rows = feed.collect()
    ins = sorted(r.v for r in rows if r._change_type == "insert")
    dels = sorted(r.v for r in rows if r._change_type == "delete")
    assert ins == list(range(1000, 1050))
    assert dels == list(range(0, 50))
    # deleted rows carry their FULL content and commit version
    d0 = next(r for r in rows if r._change_type == "delete" and r.v == 7)
    assert d0.g == 1 and d0._commit_version == 2
    assert all(
        r._commit_version == 1 for r in rows if r._change_type == "insert"
    )


def test_feed_refuses_cow_rewrites(spark, tmp_path):
    path = str(tmp_path / "t")
    _seed(spark, path)
    snap.snapshot_delete_where(spark, path, [("v", 0, 9)])  # COW
    with pytest.raises(ValueError, match="change feed cannot express"):
        snap.read_snapshot_changes_feed(spark, path, 0, 1)


def test_ivm_folds_dv_deletes_without_recompute(spark, tmp_path, monkeypatch):
    src, view = str(tmp_path / "src"), str(tmp_path / "view")
    _seed(spark, src)
    kw = dict(sum_cols=["v"], avg_cols=["v"])
    ivm.refresh_agg_view(spark, src, view, ["g"], **kw)
    snap.snapshot_delete_where_dv(spark, src, [("v", 60, 299)])

    real_read = snap.read_snapshot

    def guarded(spark_, path_, *a, **k):
        assert path_ != src, "fast path must not rescan the source"
        return real_read(spark_, path_, *a, **k)

    monkeypatch.setattr(ivm.snap, "read_snapshot", guarded)
    ivm.refresh_agg_view(spark, src, view, ["g"], **kw)
    monkeypatch.undo()
    got = {
        r.g: (r.n, r.sum_v, r.avg_v)
        for r in ivm.read_view(spark, view).collect()
    }
    exp = {
        r.g: (r.n, r.sum_v, r.avg_v)
        for r in snap.read_snapshot(spark, src).groupBy("g").agg(
            F.count("*").alias("n"), F.sum("v").alias("sum_v"),
            F.avg("v").alias("avg_v"),
        ).collect()
    }
    assert got == exp  # 0..59 survive: 20 rows per group


def test_ivm_drops_fully_deleted_groups(spark, tmp_path):
    src, view = str(tmp_path / "src"), str(tmp_path / "view")
    base = spark.range(0, 100).select(
        F.when(F.col("id") < 10, F.lit(99)).otherwise(F.col("id") % 3)
        .cast("long").alias("g"),
        F.col("id").alias("v"),
    )
    snap.snapshot_write(base.repartitionByRange(4, "v"), src,
                        stats_cols=["v"])
    ivm.refresh_agg_view(spark, src, view, ["g"], sum_cols=["v"])
    assert 99 in {r.g for r in ivm.read_view(spark, view).collect()}
    # group 99 lives entirely in v 0..9: DV-delete wipes it out
    snap.snapshot_delete_where_dv(spark, src, [("v", 0, 9)])
    ivm.refresh_agg_view(spark, src, view, ["g"], sum_cols=["v"])
    got = {r.g for r in ivm.read_view(spark, view).collect()}
    assert 99 not in got  # folded to n=0 and dropped, like a recompute
    exp = {
        r.g for r in snap.read_snapshot(spark, src).groupBy("g")
        .agg(F.count("*")).collect()
    }
    assert got == exp


def test_ivm_minmax_view_still_recomputes_on_dv(spark, tmp_path):
    src, view = str(tmp_path / "src"), str(tmp_path / "view")
    _seed(spark, src)
    kw = dict(sum_cols=["v"], max_cols=["v"])
    ivm.refresh_agg_view(spark, src, view, ["g"], **kw)
    snap.snapshot_delete_where_dv(spark, src, [("v", 250, 299)])
    ivm.refresh_agg_view(spark, src, view, ["g"], **kw)
    got = {r.g: r.max_v for r in ivm.read_view(spark, view).collect()}
    exp = {
        r.g: r.m
        for r in snap.read_snapshot(spark, src).groupBy("g")
        .agg(F.max("v").alias("m")).collect()
    }
    assert got == exp
    assert max(got.values()) == 249  # the evicted extremum moved


# --- merge-on-read UPDATE (DV + append in one commit) ------------------------------


def test_mor_update_matches_cow_update(spark, tmp_path):
    cow, mor = str(tmp_path / "cow"), str(tmp_path / "mor")
    for p in (cow, mor):
        _seed(spark, p)
    where = [("v", 50, 149)]
    upd = {"v": F.col("v") + 10_000}
    snap.snapshot_update_where(spark, cow, where, upd)
    v = snap.snapshot_update_where_dv(spark, mor, where, upd)
    got = sorted((r.g, r.v) for r in snap.read_snapshot(spark, mor).collect())
    exp = sorted((r.g, r.v) for r in snap.read_snapshot(spark, cow).collect())
    assert got == exp
    raw = snap._read_manifest_raw(mor, v)
    assert raw["dv_adds"] and raw["adds"]  # one atomic MOR commit
    assert raw["rewrite"]["kind"] == "update_where_mor"
    # original files untouched (carried), update cost was O(matched)
    assert set(snap._read_manifest(mor, 0)["files"]) <= set(
        snap._read_manifest(mor, v)["files"]
    )


def test_feed_expresses_mor_update_as_delete_insert(spark, tmp_path):
    path = str(tmp_path / "t")
    _seed(spark, path)
    snap.snapshot_update_where_dv(
        spark, path, [("v", 0, 9)], {"v": F.col("v") + 1000}
    )
    feed = snap.read_snapshot_changes_feed(spark, path, 0, 1)
    rows = feed.collect()
    dels = sorted(r.v for r in rows if r._change_type == "delete")
    ins = sorted(r.v for r in rows if r._change_type == "insert")
    assert dels == list(range(0, 10))
    assert ins == list(range(1000, 1010))


def test_ivm_folds_mor_update_without_recompute(spark, tmp_path, monkeypatch):
    src, view = str(tmp_path / "src"), str(tmp_path / "view")
    _seed(spark, src)
    ivm.refresh_agg_view(spark, src, view, ["g"], sum_cols=["v"],
                         avg_cols=["v"])
    snap.snapshot_update_where_dv(
        spark, src, [("v", 100, 199)], {"v": F.col("v") * 10}
    )
    real_read = snap.read_snapshot

    def guarded(spark_, path_, *a, **k):
        assert path_ != src, "fast path must not rescan the source"
        return real_read(spark_, path_, *a, **k)

    monkeypatch.setattr(ivm.snap, "read_snapshot", guarded)
    ivm.refresh_agg_view(spark, src, view, ["g"], sum_cols=["v"],
                         avg_cols=["v"])
    monkeypatch.undo()
    got = {
        r.g: (r.n, r.sum_v) for r in ivm.read_view(spark, view).collect()
    }
    exp = {
        r.g: (r.n, r.sum_v)
        for r in snap.read_snapshot(spark, src).groupBy("g").agg(
            F.count("*").alias("n"), F.sum("v").alias("sum_v")
        ).collect()
    }
    assert got == exp


def test_mor_update_then_compact_materializes(spark, tmp_path):
    path = str(tmp_path / "t")
    _seed(spark, path)
    snap.snapshot_update_where_dv(
        spark, path, [("v", 0, 99)], {"v": F.lit(-5).cast("long")}
    )
    v = snap.snapshot_compact(spark, path)
    m = snap._read_manifest(path, v)
    assert not m.get("dvs")
    rows = [r.v for r in snap.read_snapshot(spark, path).collect()]
    assert rows.count(-5) == 100 and len(rows) == 300


def test_timestamp_time_travel(spark, tmp_path):
    import time as _time

    path = str(tmp_path / "t")
    _seed(spark, path)
    t_after_v0 = _time.time() + 0.5
    # force distinct commit seconds without sleeping long
    m = snap._read_manifest_raw(path, 0)
    snap.snapshot_write(
        spark.range(500, 510).select(
            (F.col("id") % 3).alias("g"), F.col("id").alias("v")
        ),
        path, mode="append",
    )
    # rewrite v1's committed_at to be clearly in the future so the
    # boundary is deterministic (manifests are plain JSON)
    import json as _json

    mp = snap._manifest_path(path, 1)
    m1 = _json.load(open(mp))
    m1["committed_at_unix"] = int(_time.time()) + 3600
    _json.dump(m1, open(mp, "w"))
    assert snap.version_at_timestamp(path, t_after_v0) == 0
    assert snap.read_snapshot(spark, path, as_of_unix=t_after_v0).count() == 300
    assert snap.version_at_timestamp(path, _time.time() + 7200) == 1
    with pytest.raises(ValueError, match="no snapshot"):
        snap.version_at_timestamp(path, 1.0)
    with pytest.raises(ValueError, match="not both"):
        snap.read_snapshot(spark, path, version=0, as_of_unix=t_after_v0)


def test_table_info_reports_dv_debt(spark, tmp_path):
    path = str(tmp_path / "t")
    _seed(spark, path)
    info0 = snap.snapshot_table_info(path)
    assert info0["dv_files"] == 0
    snap.snapshot_delete_where_dv(spark, path, [("v", 0, 9)])
    info1 = snap.snapshot_table_info(path)
    assert info1["dv_files"] == 1 and info1["dv_vector_files"] >= 1
    snap.snapshot_compact(spark, path)
    assert snap.snapshot_table_info(path)["dv_files"] == 0
