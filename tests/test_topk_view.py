"""Top-k incremental view maintenance (pipeline.ivm.refresh_topk_view).

Every test compares the incrementally-maintained view against an
independent recompute over the source's live rows — the view must be
indistinguishable from `topk(read_snapshot(latest))` after any chain
of commits."""

from __future__ import annotations

import tempfile

import pytest
from pyspark.sql import functions as F

from harmony_energy_data_pipeline_spark.pipeline import ivm
from harmony_energy_data_pipeline_spark.sinks import snapshots as snap


def _mk(spark, rows):
    return spark.createDataFrame(rows, "g string, rid int, v int")


def _expected(spark, src_path, k=2, descending=True):
    df = snap.read_snapshot(spark, src_path)
    direction = F.col("v").desc_nulls_last() if descending \
        else F.col("v").asc_nulls_last()
    from pyspark.sql import Window
    w = Window.partitionBy("g").orderBy(direction, F.col("rid").asc())
    return (
        df.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k).drop("rn")
    )


def _rows(df):
    return sorted(tuple(r) for r in df.select("g", "rid", "v").collect())


def _paths():
    base = tempfile.mkdtemp(prefix="topk_")
    return base + "/src", base + "/view"


KW = dict(keys=["g"], order_col="v", k=2, tiebreak_cols=["rid"])


def test_append_fold_matches_recompute(spark):
    src, view = _paths()
    snap.snapshot_write(
        _mk(spark, [("a", 1, 10), ("a", 2, 20), ("a", 3, 30),
                    ("b", 4, 5)]),
        src, stats_cols=["g"],
    )
    ivm.refresh_topk_view(spark, src, view, **KW)
    assert _rows(ivm.read_view(spark, view)) == [
        ("a", 2, 20), ("a", 3, 30), ("b", 4, 5)]
    # append: one row enters a's top-2, one is beaten, a new group c
    snap.snapshot_write(
        _mk(spark, [("a", 5, 25), ("a", 6, 1), ("c", 7, 7)]),
        src, mode="append", stats_cols=["g"],
    )
    ivm.refresh_topk_view(spark, src, view, **KW)
    got = _rows(ivm.read_view(spark, view))
    assert got == _rows(_expected(spark, src))
    assert ("a", 5, 25) in got and ("a", 2, 20) not in got


def test_idempotent_refresh(spark):
    src, view = _paths()
    snap.snapshot_write(_mk(spark, [("a", 1, 10)]), src)
    v = ivm.refresh_topk_view(spark, src, view, **KW)
    before = snap.latest_version(view)
    assert ivm.refresh_topk_view(spark, src, view, **KW) == v
    assert snap.latest_version(view) == before  # no-op, no new commit


def test_delete_evicting_top_rescans_group(spark):
    src, view = _paths()
    snap.snapshot_write(
        _mk(spark, [("a", 1, 10), ("a", 2, 20), ("a", 3, 30),
                    ("b", 4, 5), ("b", 5, 50), ("b", 6, 40)]),
        src, stats_cols=["g", "v"],
    )
    ivm.refresh_topk_view(spark, src, view, **KW)
    # evict a's maximum: the replacement (rid 1, v 10) lives below the
    # view's horizon — only a rescan can surface it
    snap.snapshot_delete_where_dv(spark, src, [("v", 30, 30)])
    ivm.refresh_topk_view(spark, src, view, **KW)
    got = _rows(ivm.read_view(spark, view))
    assert got == _rows(_expected(spark, src))
    assert ("a", 1, 10) in got and ("a", 3, 30) not in got
    # b untouched
    assert ("b", 5, 50) in got and ("b", 6, 40) in got


def test_noop_delete_folds_without_rescan(spark, monkeypatch):
    src, view = _paths()
    snap.snapshot_write(
        _mk(spark, [("a", 1, 10), ("a", 2, 20), ("a", 3, 30)]),
        src, stats_cols=["g", "v"],
    )
    ivm.refresh_topk_view(spark, src, view, **KW)

    def boom(*a, **k):  # pragma: no cover - failure path
        raise AssertionError("rescan taken for a proven no-op delete")

    monkeypatch.setattr(ivm, "_pruned_source_for", boom)
    # v=10 is strictly below a's retained threshold (20): proven no-op
    snap.snapshot_delete_where_dv(spark, src, [("v", 10, 10)])
    ivm.refresh_topk_view(spark, src, view, **KW)
    assert _rows(ivm.read_view(spark, view)) == [
        ("a", 2, 20), ("a", 3, 30)]


def test_group_extinction(spark):
    src, view = _paths()
    snap.snapshot_write(
        _mk(spark, [("a", 1, 10), ("b", 2, 99)]), src,
        stats_cols=["g", "v"],
    )
    ivm.refresh_topk_view(spark, src, view, **KW)
    snap.snapshot_delete_where_dv(spark, src, [("v", 99, 99)])
    ivm.refresh_topk_view(spark, src, view, **KW)
    assert _rows(ivm.read_view(spark, view)) == [("a", 1, 10)]


def test_ascending_bottom_k(spark):
    src, view = _paths()
    snap.snapshot_write(
        _mk(spark, [("a", 1, 10), ("a", 2, 20), ("a", 3, 30)]),
        src, stats_cols=["g", "v"],
    )
    kw = dict(KW, descending=False)
    ivm.refresh_topk_view(spark, src, view, **kw)
    assert _rows(ivm.read_view(spark, view)) == [
        ("a", 1, 10), ("a", 2, 20)]
    # delete the minimum: eviction at the ASC threshold → rescan
    snap.snapshot_delete_where_dv(spark, src, [("v", 10, 10)])
    ivm.refresh_topk_view(spark, src, view, **kw)
    assert _rows(ivm.read_view(spark, view)) == [
        ("a", 2, 20), ("a", 3, 30)]


def test_insert_and_delete_same_window(spark):
    src, view = _paths()
    snap.snapshot_write(
        _mk(spark, [("a", 1, 10), ("a", 2, 20), ("a", 3, 30)]),
        src, stats_cols=["g", "v"],
    )
    ivm.refresh_topk_view(spark, src, view, **KW)
    # one refresh window: insert a new top row AND delete the old max
    snap.snapshot_write(
        _mk(spark, [("a", 9, 90), ("d", 10, 1)]), src, mode="append",
        stats_cols=["g", "v"],
    )
    snap.snapshot_delete_where_dv(spark, src, [("v", 30, 30)])
    ivm.refresh_topk_view(spark, src, view, **KW)
    assert _rows(ivm.read_view(spark, view)) == _rows(
        _expected(spark, src))


def test_rewrite_recomputes(spark):
    src, view = _paths()
    snap.snapshot_write(
        _mk(spark, [("a", 1, 10), ("a", 2, 20)]), src,
    )
    ivm.refresh_topk_view(spark, src, view, **KW)
    snap.snapshot_write(
        _mk(spark, [("z", 8, 80), ("z", 9, 70), ("z", 10, 60)]),
        src, mode="overwrite",
    )
    ivm.refresh_topk_view(spark, src, view, **KW)
    assert _rows(ivm.read_view(spark, view)) == [
        ("z", 8, 80), ("z", 9, 70)]


def test_null_order_values(spark):
    src, view = _paths()
    rows = [("a", 1, None), ("a", 2, 20), ("b", 3, None)]
    snap.snapshot_write(_mk(spark, rows), src, stats_cols=["g"])
    ivm.refresh_topk_view(spark, src, view, **KW)
    # NULLs rank last: kept only while the group is short of k
    assert _rows(ivm.read_view(spark, view)) == sorted(
        [("a", 1, None), ("a", 2, 20), ("b", 3, None)])
    # NULL-ordered delete rescans conservatively and stays exact
    snap.snapshot_delete_where_dv(spark, src, [("rid", 1, 1)])
    ivm.refresh_topk_view(spark, src, view, **KW)
    assert _rows(ivm.read_view(spark, view)) == sorted(
        [("a", 2, 20), ("b", 3, None)])


def test_spec_evolution_recomputes(spark):
    src, view = _paths()
    snap.snapshot_write(
        _mk(spark, [("a", 1, 10), ("a", 2, 20)]), src,
    )
    ivm.refresh_topk_view(spark, src, view, keys=["g"], order_col="v",
                          k=1)
    snap.snapshot_write(
        _mk(spark, [("a", 3, 30)]), src, mode="append",
    )
    # adding a tiebreak/payload column the stored view lacks → recompute
    ivm.refresh_topk_view(spark, src, view, **KW)
    assert _rows(ivm.read_view(spark, view)) == [
        ("a", 2, 20), ("a", 3, 30)]


def test_payload_columns_carried(spark):
    src, view = _paths()
    df = spark.createDataFrame(
        [("a", 1, 10, "x"), ("a", 2, 20, "y")],
        "g string, rid int, v int, tag string",
    )
    snap.snapshot_write(df, src)
    ivm.refresh_topk_view(
        spark, src, view, keys=["g"], order_col="v", k=1,
        tiebreak_cols=["rid"], payload_cols=["tag"],
    )
    out = ivm.read_view(spark, view).collect()
    assert len(out) == 1 and out[0]["tag"] == "y"


def test_fanout_views_share_one_change_read(spark, monkeypatch):
    """N leaderboards at the same position: the plural refresh reads
    the change range ONCE and every view folds from it."""
    src, _ = _paths()
    v1 = src + "_v1"
    v2 = src + "_v2"
    snap.snapshot_write(
        _mk(spark, [("a", 1, 10), ("a", 2, 20), ("b", 3, 30)]),
        src, stats_cols=["g"],
    )
    specs = [
        dict(view_path=v1, keys=["g"], order_col="v", k=2,
             tiebreak_cols=["rid"]),
        dict(view_path=v2, keys=["g"], order_col="v", k=1,
             tiebreak_cols=["rid"], descending=False),
    ]
    ivm.refresh_topk_views(spark, src, specs)
    snap.snapshot_write(
        _mk(spark, [("a", 4, 40), ("b", 5, 5)]), src, mode="append",
    )
    calls = {"n": 0}
    real = snap.read_snapshot_changes

    def counted(*a, **k):
        calls["n"] += 1
        return real(*a, **k)

    monkeypatch.setattr(snap, "read_snapshot_changes", counted)
    ivm.refresh_topk_views(spark, src, specs)
    assert calls["n"] == 1  # one shared read for two views
    assert _rows(ivm.read_view(spark, v1)) == [
        ("a", 2, 20), ("a", 4, 40), ("b", 3, 30), ("b", 5, 5)]
    assert _rows(ivm.read_view(spark, v2)) == [("a", 1, 10), ("b", 5, 5)]
    # idempotent: both current → no reads, no commits
    calls["n"] = 0
    ivm.refresh_topk_views(spark, src, specs)
    assert calls["n"] == 0
