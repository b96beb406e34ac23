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


# --- round 7: MIN/MAX/AVG + multi-view shared-CDC refresh --------------------------


def _truth(spark, src):
    return {
        r.g: (r.n, r.sum_v, r.min_v, r.max_v, r.avg_v)
        for r in snap.read_snapshot(spark, src)
        .groupBy("g")
        .agg(
            F.count("*").alias("n"), F.sum("v").alias("sum_v"),
            F.min("v").alias("min_v"), F.max("v").alias("max_v"),
            F.avg("v").alias("avg_v"),
        )
        .collect()
    }


def _got_full(spark, view):
    return {
        r.g: (r.n, r.sum_v, r.min_v, r.max_v, r.avg_v)
        for r in ivm.read_view(spark, view).collect()
    }


def test_minmax_avg_incremental_matches_recompute(spark, tmp_path):
    src, view = str(tmp_path / "src"), str(tmp_path / "view")
    kw = dict(sum_cols=["v"], min_cols=["v"], max_cols=["v"],
              avg_cols=["v"])
    snap.snapshot_write(_batch(spark, 50, 150), src)
    ivm.refresh_agg_view(spark, src, view, ["g"], **kw)
    # inserts that tighten the minimum AND the maximum, folded
    # incrementally across two deltas
    snap.snapshot_write(_batch(spark, 0, 50), src, mode="append")
    ivm.refresh_agg_view(spark, src, view, ["g"], **kw)
    snap.snapshot_write(_batch(spark, 150, 400), src, mode="append")
    v = ivm.refresh_agg_view(spark, src, view, ["g"], **kw)
    assert _got_full(spark, view) == _truth(spark, src)
    # idempotent
    assert ivm.refresh_agg_view(spark, src, view, ["g"], **kw) == v


def test_minmax_fallback_when_extremum_deleted(spark, tmp_path):
    src, view = str(tmp_path / "src"), str(tmp_path / "view")
    kw = dict(sum_cols=["v"], min_cols=["v"], max_cols=["v"],
              avg_cols=["v"])
    snap.snapshot_write(
        _batch(spark, 0, 300).repartitionByRange(4, "v"), src,
        stats_cols=["v"],
    )
    ivm.refresh_agg_view(spark, src, view, ["g"], **kw)
    # delete the rows holding every group's MAX (a row-level rewrite:
    # non-append commit, CDC refuses, refresh must recompute)
    snap.snapshot_delete_where(spark, src, [("v", 250, 299)])
    ivm.refresh_agg_view(spark, src, view, ["g"], **kw)
    got = _got_full(spark, view)
    assert got == _truth(spark, src)
    assert max(t[3] for t in got.values()) == 249  # extremum really moved


def test_minmax_fallback_on_dv_delete(spark, tmp_path):
    src, view = str(tmp_path / "src"), str(tmp_path / "view")
    kw = dict(sum_cols=["v"], min_cols=["v"], max_cols=["v"])
    snap.snapshot_write(
        _batch(spark, 0, 300).repartitionByRange(4, "v"), src,
        stats_cols=["v"],
    )
    ivm.refresh_agg_view(spark, src, view, ["g"], **kw)
    snap.snapshot_delete_where_dv(spark, src, [("v", 0, 29)])
    ivm.refresh_agg_view(spark, src, view, ["g"], **kw)
    got = {r.g: (r.n, r.min_v) for r in ivm.read_view(spark, view).collect()}
    exp = {
        r.g: (r.n, r.m)
        for r in snap.read_snapshot(spark, src).groupBy("g")
        .agg(F.count("*").alias("n"), F.min("v").alias("m")).collect()
    }
    assert got == exp
    assert min(t[1] for t in got.values()) == 30


def test_multi_view_refresh_shares_one_delta(spark, tmp_path):
    src = str(tmp_path / "src")
    v_byg = str(tmp_path / "by_g")
    v_bym = str(tmp_path / "by_m")
    specs = [
        {"view_path": v_byg, "keys": ["g"], "sum_cols": ["v"],
         "min_cols": ["v"], "avg_cols": ["v"]},
        {"view_path": v_bym, "keys": ["m"], "max_cols": ["v"]},
    ]
    base = _batch(spark, 0, 200).withColumn("m", F.col("v") % 7)
    snap.snapshot_write(base, src)
    ivm.refresh_agg_views(spark, src, specs)
    more = _batch(spark, 200, 500).withColumn("m", F.col("v") % 7)
    snap.snapshot_write(more, src, mode="append")
    cur = ivm.refresh_agg_views(spark, src, specs)
    assert cur == 1
    got_g = {
        r.g: (r.n, r.sum_v, r.min_v, r.avg_v)
        for r in ivm.read_view(spark, v_byg).collect()
    }
    exp_g = {
        r.g: (r.n, r.sum_v, r.min_v, r.avg_v)
        for r in snap.read_snapshot(spark, src).groupBy("g").agg(
            F.count("*").alias("n"), F.sum("v").alias("sum_v"),
            F.min("v").alias("min_v"), F.avg("v").alias("avg_v"),
        ).collect()
    }
    assert got_g == exp_g
    got_m = {r.m: r.max_v for r in ivm.read_view(spark, v_bym).collect()}
    exp_m = {
        r.m: r.max_v
        for r in snap.read_snapshot(spark, src).groupBy("m")
        .agg(F.max("v").alias("max_v")).collect()
    }
    assert got_m == exp_m
    # both views stamped to the same source version
    for vp in (v_byg, v_bym):
        m = snap._read_manifest_raw(vp, snap.latest_version(vp))
        assert m[ivm.SOURCE_VERSION_KEY] == cur


def test_spec_evolution_falls_back_to_recompute(spark, tmp_path):
    src, view = str(tmp_path / "src"), str(tmp_path / "view")
    snap.snapshot_write(_batch(spark, 0, 100), src)
    ivm.refresh_agg_view(spark, src, view, ["g"], ["v"])  # sums only
    snap.snapshot_write(_batch(spark, 100, 200), src, mode="append")
    # same view, now asking for min too: stored view lacks min_v
    ivm.refresh_agg_view(
        spark, src, view, ["g"], sum_cols=["v"], min_cols=["v"]
    )
    got = {
        r.g: (r.n, r.sum_v, r.min_v)
        for r in ivm.read_view(spark, view).collect()
    }
    exp = {
        r.g: (r.n, r.s, r.m)
        for r in _batch(spark, 0, 200).groupBy("g").agg(
            F.count("*").alias("n"), F.sum("v").alias("s"),
            F.min("v").alias("m"),
        ).collect()
    }
    assert got == exp


# --- MIN/MAX folding through interior deletes (round 7 third wave) ----------


def test_minmax_folds_interior_delete_without_rescan(
    spark, tmp_path, monkeypatch
):
    """A DV delete strictly INSIDE every group's extrema folds the
    MIN/MAX view with no source rescan — the full-recompute path is
    booby-trapped to prove it is not taken."""
    import os

    src, view = str(tmp_path / "src"), str(tmp_path / "view")
    kw = dict(sum_cols=["v"], min_cols=["v"], max_cols=["v"])
    snap.snapshot_write(
        _batch(spark, 0, 300).repartitionByRange(4, "v"), src,
        stats_cols=["v"],
    )
    ivm.refresh_agg_view(spark, src, view, ["g"], **kw)
    # v in [100, 129]: every group keeps min (0/1/2) and max (297-299)
    snap.snapshot_delete_where_dv(spark, src, [("v", 100, 129)])
    real_read = snap.read_snapshot

    def no_full_reads(spark_, path_, version=None, **kws):
        if os.path.abspath(path_) == os.path.abspath(src):
            raise AssertionError("recomputed; expected MIN/MAX fold")
        return real_read(spark_, path_, version, **kws)

    monkeypatch.setattr(ivm.snap, "read_snapshot", no_full_reads)
    ivm.refresh_agg_view(spark, src, view, ["g"], **kw)
    monkeypatch.undo()
    got = {
        r.g: (r.n, r.sum_v, r.min_v, r.max_v)
        for r in ivm.read_view(spark, view).collect()
    }
    exp = {
        r.g: (r.n, r.s, r.mn, r.mx)
        for r in snap.read_snapshot(spark, src).groupBy("g").agg(
            F.count("*").alias("n"), F.sum("v").alias("s"),
            F.min("v").alias("mn"), F.max("v").alias("mx"),
        ).collect()
    }
    assert got == exp


def test_minmax_folds_mor_update_of_interior_rows(spark, tmp_path):
    """An MOR update rewriting interior values (delete ⊕ insert in the
    feed) folds: sums adjust signed, extrema tighten from the inserted
    post-images."""
    src, view = str(tmp_path / "src"), str(tmp_path / "view")
    kw = dict(sum_cols=["v"], min_cols=["v"], max_cols=["v"])
    snap.snapshot_write(
        _batch(spark, 0, 300).repartitionByRange(4, "v"), src,
        stats_cols=["v"],
    )
    ivm.refresh_agg_view(spark, src, view, ["g"], **kw)
    snap.snapshot_update_where_dv(
        spark, src, [("v", 100, 129)], {"v": F.col("v") + 1000}
    )
    ivm.refresh_agg_view(spark, src, view, ["g"], **kw)
    got = {
        r.g: (r.n, r.sum_v, r.min_v, r.max_v)
        for r in ivm.read_view(spark, view).collect()
    }
    exp = {
        r.g: (r.n, r.s, r.mn, r.mx)
        for r in snap.read_snapshot(spark, src).groupBy("g").agg(
            F.count("*").alias("n"), F.sum("v").alias("s"),
            F.min("v").alias("mn"), F.max("v").alias("mx"),
        ).collect()
    }
    assert got == exp
    assert max(t[3] for t in got.values()) == 1129  # post-images landed


def test_minmax_recomputes_when_window_insert_extremum_deleted(
    spark, tmp_path
):
    """The subtle case: a row inserted and then deleted WITHIN one
    refresh window can be that window's extremum while absent from
    the stored view — the danger check must compare deletes against
    the combined (view ∪ window-insert) extrema, not the view alone."""
    src, view = str(tmp_path / "src"), str(tmp_path / "view")
    kw = dict(sum_cols=["v"], min_cols=["v"], max_cols=["v"])
    snap.snapshot_write(
        _batch(spark, 30, 300).repartitionByRange(4, "v"), src,
        stats_cols=["v"],
    )
    ivm.refresh_agg_view(spark, src, view, ["g"], **kw)
    # window: insert 0..29 (new global minima), then DV-delete 0..5 —
    # the deleted rows were this window's extrema
    snap.snapshot_write(
        _batch(spark, 0, 30).repartitionByRange(2, "v"), src,
        mode="append", stats_cols=["v"],
    )
    snap.snapshot_delete_where_dv(spark, src, [("v", 0, 5)])
    ivm.refresh_agg_view(spark, src, view, ["g"], **kw)
    got = {
        r.g: (r.n, r.min_v) for r in ivm.read_view(spark, view).collect()
    }
    exp = {
        r.g: (r.n, r.m)
        for r in snap.read_snapshot(spark, src).groupBy("g").agg(
            F.count("*").alias("n"), F.min("v").alias("m")
        ).collect()
    }
    assert got == exp
    assert min(t[1] for t in got.values()) == 6  # eviction repaired


def test_minmax_partial_rescan_only_endangered_groups(
    spark, tmp_path, monkeypatch
):
    """When a delete evicts ONE group's extremum, only that group
    rescans the source; every other group still folds. Pinned by
    spying on the rescan aggregate's input: it must contain exactly
    the endangered group."""
    src, view = str(tmp_path / "src"), str(tmp_path / "view")
    kw = dict(sum_cols=["v"], min_cols=["v"], max_cols=["v"])
    snap.snapshot_write(
        _batch(spark, 0, 300).repartitionByRange(4, "v"), src,
        stats_cols=["v"],
    )
    ivm.refresh_agg_view(spark, src, view, ["g"], **kw)
    # k=297 is group 0's maximum (297*... v=297): evicts g=0's max;
    # k=100 is interior to group 1 — no danger there
    snap.snapshot_delete_where_dv(spark, src, [("v", 297, 297)])
    snap.snapshot_delete_where_dv(spark, src, [("v", 100, 100)])
    seen: list = []
    real_agg = ivm._aggregate

    def spy(df, keys, sums, mins=(), maxs=()):
        seen.append(df)
        return real_agg(df, keys, sums, mins, maxs)

    monkeypatch.setattr(ivm, "_aggregate", spy)
    ivm.refresh_agg_view(spark, src, view, ["g"], **kw)
    monkeypatch.undo()
    # exactly one rescan aggregate, over exactly the endangered group
    assert len(seen) == 1
    rescanned = {r.g for r in seen[0].select("g").distinct().collect()}
    assert rescanned == {0}
    got = {
        r.g: (r.n, r.sum_v, r.min_v, r.max_v)
        for r in ivm.read_view(spark, view).collect()
    }
    exp = {
        r.g: (r.n, r.s, r.mn, r.mx)
        for r in snap.read_snapshot(spark, src).groupBy("g").agg(
            F.count("*").alias("n"), F.sum("v").alias("s"),
            F.min("v").alias("mn"), F.max("v").alias("mx"),
        ).collect()
    }
    assert got == exp
    assert got[0][3] == 294  # the eviction really moved g=0's max


def test_minmax_rescan_prunes_source_files_by_danger_interval(
    spark, tmp_path, monkeypatch
):
    """On a source clustered + stats-tracked by the GROUP key (the
    date-keyed rollup shape), the danger rescan's scan is zone-map
    pruned to the endangered keys' interval — O(danger files), not
    O(table bytes)."""
    src, view = str(tmp_path / "src"), str(tmp_path / "view")
    df = spark.range(1000).select(
        (F.col("id") / 100).cast("long").alias("g"),
        F.col("id").alias("v"),
    )
    snap.snapshot_write(df, src, stats_cols=["g", "v"],
                        cluster_by=["g"], cluster_files=10)
    kw = dict(sum_cols=["v"], min_cols=["v"], max_cols=["v"])
    ivm.refresh_agg_view(spark, src, view, ["g"], **kw)
    # delete g=3's maximum (v=399): exactly one endangered group
    snap.snapshot_delete_where_dv(spark, src, [("v", 399, 399)])
    seen: list = []
    real_agg = ivm._aggregate

    def spy(d, keys, sums, mins=(), maxs=()):
        seen.append(d)
        return real_agg(d, keys, sums, mins, maxs)

    monkeypatch.setattr(ivm, "_aggregate", spy)
    ivm.refresh_agg_view(spark, src, view, ["g"], **kw)
    monkeypatch.undo()
    assert len(seen) == 1
    import os as _os

    total = len(snap._read_manifest(src, 0)["files"])
    src_abs = _os.path.abspath(src)
    scanned = {
        f for f in seen[0].inputFiles()
        if src_abs in f and "/data/" in f
    }
    assert total >= 8
    assert len(scanned) <= max(1, total // 4)  # pruned to g=3's files
    got = {r.g: (r.n, r.max_v)
           for r in ivm.read_view(spark, view).collect()}
    exp = {
        r.g: (r.n, r.mx)
        for r in snap.read_snapshot(spark, src).groupBy("g").agg(
            F.count("*").alias("n"), F.max("v").alias("mx")
        ).collect()
    }
    assert got == exp
    assert got[3] == (99, 398)
