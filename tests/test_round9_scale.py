"""Round 9: vacuum liveness off the columnar checkpoint.

Vacuum's liveness union previously resolved the oldest kept version
through the per-file DICT walk (stats/members materialized just to
read the file list) — the last metadata consumer still O(table files)
in Python objects. It now probes walked files against the parquet
checkpoint's arrow file/dv arrays in vectorized batches
(``_live_rel_arrow`` + ``_vacuum_classify``), and the pre-expiry
checkpoint write replays on arrow (``_write_checkpoint_arrow``).
These tests pin VALUE PARITY between the arrow path and the dict
path on tables that exercise DVs, change files, and borrowed clones.
"""
from __future__ import annotations

import os

from pyspark.sql import functions as F

from harmony_energy_data_pipeline_spark.sinks import snapshots as snap


def _chain(spark, path, n, rows_per=40):
    for i in range(n):
        df = spark.range(i * rows_per, (i + 1) * rows_per).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("v"),
        ).coalesce(1)
        snap.snapshot_write(
            df, path, mode="append" if i else "overwrite",
            stats_cols=["k"],
        )


def _force_ckpt(path):
    snap._RESOLVE_CACHE.clear()
    v = snap.latest_version(path)
    snap._read_manifest(path, v)
    assert os.path.exists(snap._ckpt_path_pq(path, v))
    return v


def _mixed_table(spark, path):
    """Past-interval chain + DV delete + CDF-recorded COW delete +
    trailing append: liveness must see files, vectors, and change
    files through BOTH resolution paths."""
    _chain(spark, path, snap._CHECKPOINT_INTERVAL + 2)
    _force_ckpt(path)
    snap.snapshot_delete_where_dv(spark, path, [("k", 0, 9)])
    snap.snapshot_delete_where(
        spark, path, [("k", 45, 52)], record_cdf=True
    )
    snap.snapshot_write(
        spark.range(5000, 5040).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("v"),
        ).coalesce(1),
        path, mode="append", stats_cols=["k"],
    )


def _disk_data_files(path):
    out = set()
    for dp, _dirs, files in os.walk(os.path.join(path, "data")):
        for f in files:
            if snap._is_data_file(f):
                out.add(os.path.abspath(os.path.join(dp, f)))
    return out


def test_vacuum_arrow_liveness_is_active_and_matches_dict(
    spark, tmp_path, monkeypatch
):
    path = str(tmp_path / "t")
    _mixed_table(spark, path)
    keep0 = snap._versions(path)[-2]
    snap._RESOLVE_CACHE.clear()
    assert snap._live_rel_arrow(path, keep0) is not None  # arrow active

    arrow_would = snap.vacuum(
        path, keep_last=2, orphan_grace_s=0.0, dry_run=True
    )
    monkeypatch.setattr(snap, "_live_rel_arrow", lambda *a: None)
    snap._RESOLVE_CACHE.clear()
    dict_would = snap.vacuum(
        path, keep_last=2, orphan_grace_s=0.0, dry_run=True
    )
    assert arrow_would == dict_would > 0


def test_vacuum_arrow_path_deletes_exactly_what_dict_predicts(
    spark, tmp_path, monkeypatch
):
    path = str(tmp_path / "t")
    _mixed_table(spark, path)

    # dict-path prediction of the SURVIVOR set, computed before
    # anything mutates
    m = snap._read_manifest(path, snap._versions(path)[-1])
    expect_live = {
        os.path.abspath(snap._abs_file(path, f)) for f in m["files"]
    } | {
        os.path.abspath(snap._abs_file(path, d))
        for ds in m.get("dvs", {}).values() for d in ds
    } | {
        os.path.abspath(snap._abs_file(path, f))
        for f in m.get("cdf", [])
    }
    before = snap.read_snapshot(spark, path).orderBy("k").collect()

    snap._RESOLVE_CACHE.clear()
    removed = snap.vacuum(path, keep_last=1, orphan_grace_s=0.0)
    assert removed > 0
    assert _disk_data_files(path) == expect_live
    after = snap.read_snapshot(spark, path).orderBy("k").collect()
    assert after == before


def test_vacuum_writes_oldest_kept_checkpoint_from_arrow(
    spark, tmp_path, monkeypatch
):
    path = str(tmp_path / "t")
    _chain(spark, path, snap._CHECKPOINT_INTERVAL + 3)
    _force_ckpt(path)
    # three more deltas so keep_last=2's oldest kept is PAST the
    # persisted checkpoint and vacuum must materialize a new one
    for i in range(3):
        snap.snapshot_write(
            spark.range(9000 + i * 10, 9010 + i * 10).select(
                F.col("id").alias("k"), (F.col("id") * 2).alias("v"),
            ).coalesce(1),
            path, mode="append", stats_cols=["k"],
        )
    ov = snap._versions(path)[-2]
    assert not os.path.exists(snap._ckpt_path_pq(path, ov))
    snap._RESOLVE_CACHE.clear()
    expect_state = snap._resolve_state(path, ov)
    expect_rows = snap.read_snapshot(spark, path, version=ov).count()
    snap._RESOLVE_CACHE.clear()

    calls = {"dict_writer": 0}
    orig = snap._write_checkpoint

    def _spy(*a, **k):
        calls["dict_writer"] += 1
        return orig(*a, **k)

    monkeypatch.setattr(snap, "_write_checkpoint", _spy)
    snap.vacuum(path, keep_last=2, orphan_grace_s=0.0)
    assert calls["dict_writer"] == 0  # arrow writer took it
    tbl = snap._read_ckpt_arrow(
        path, ov, snap._read_manifest_raw(path, ov)["txid"]
    )
    assert tbl is not None
    _meta, state = snap._ckpt_from_arrow(tbl)
    assert state["files"] == expect_state["files"]
    assert state["stats"] == expect_state["stats"]
    # the table stays readable and time-travel to ov still works
    assert snap.read_snapshot(spark, path, version=ov).count() == expect_rows


def test_vacuum_arrow_path_respects_clone_borrows(spark, tmp_path):
    src = str(tmp_path / "src")
    clone = str(tmp_path / "clone")
    _chain(spark, src, snap._CHECKPOINT_INTERVAL + 2)
    _force_ckpt(src)
    snap.snapshot_clone(src, clone)
    borrowed = {
        os.path.abspath(snap._abs_file(src, f))
        for f in snap._read_manifest(src, snap.latest_version(src))["files"]
    }
    # source rewrites everything: borrowed files leave the live set
    snap.snapshot_delete_where(spark, src, [("k", 0, 10 ** 9)])
    snap._RESOLVE_CACHE.clear()
    snap.vacuum(src, keep_last=1, orphan_grace_s=0.0)
    assert borrowed <= _disk_data_files(src)  # borrow protection held
    total = snap.read_snapshot(spark, clone).count()
    assert total == 40 * (snap._CHECKPOINT_INTERVAL + 2)


def test_zorder_compaction_preserves_rows_and_prunes_both_dims(
    spark, tmp_path
):
    """snapshot_compact(zorder_by=[a, b]) is row-preserving and makes
    the rewritten zone maps prune predicates on EITHER dimension —
    the property a single-column cluster_by cannot give the trailing
    column."""
    path_lin = str(tmp_path / "lin")
    path_z = str(tmp_path / "z")
    n = 2_000_000
    df = spark.range(n).select(
        (F.col("id") % 1000).alias("a"),
        F.floor(F.col("id") / 2000).alias("b"),
        (F.col("id") * 7 % 31).alias("v"),
    )
    for p in (path_lin, path_z):
        snap.snapshot_write(
            df.repartition(16), p, stats_cols=["a", "b"],
        )
    before = snap.read_snapshot(spark, path_z).groupBy().agg(
        F.count("*").alias("n"), F.sum("v").alias("sv"),
        F.sum(F.col("a") * F.col("b")).alias("sab"),
    ).collect()[0]

    snap.snapshot_compact(
        spark, path_lin, target_file_mb=1, cluster_by=["a"]
    )
    snap.snapshot_compact(
        spark, path_z, target_file_mb=1, zorder_by=["a", "b"]
    )

    after = snap.read_snapshot(spark, path_z).groupBy().agg(
        F.count("*").alias("n"), F.sum("v").alias("sv"),
        F.sum(F.col("a") * F.col("b")).alias("sab"),
    ).collect()[0]
    assert tuple(after) == tuple(before)

    # narrow predicate on EACH dimension: the z-layout prunes both;
    # the linear layout only serves its sort column
    for col, lo, hi in (("a", 10, 19), ("b", 10, 19)):
        kept_z, total_z = snap.prune_files(path_z, [(col, lo, hi)])
        kept_l, total_l = snap.prune_files(path_lin, [(col, lo, hi)])
        assert total_z > 4 and total_l > 4, (total_z, total_l)
        assert len(kept_z) < total_z, (col, len(kept_z), total_z)
        if col == "b":
            # the trailing dim: z-order must beat the linear layout
            assert len(kept_z) / total_z < len(kept_l) / total_l, (
                col, len(kept_z), total_z, len(kept_l), total_l
            )


def test_zorder_compaction_refuses_bad_columns(spark, tmp_path):
    path = str(tmp_path / "t")
    df = spark.range(100).select(
        F.col("id").alias("k"),
        F.current_timestamp().alias("ts"),
    )
    snap.snapshot_write(df, path, stats_cols=["k"])
    import pytest as _pytest
    # strings are z-orderable since the string_rank64 dimension
    # (layout.py); temporal types still need caller-side bucketing
    with _pytest.raises(ValueError, match="numeric or string"):
        snap.snapshot_compact(spark, path, zorder_by=["ts"])
    with _pytest.raises(ValueError, match="not in table schema"):
        snap.snapshot_compact(spark, path, zorder_by=["nope"])
    with _pytest.raises(ValueError, match="mutually exclusive"):
        snap.snapshot_compact(
            spark, path, cluster_by=["k"], zorder_by=["k"]
        )


def test_paragraph_dedup_keeps_first_and_reassembles(spark):
    from harmony_energy_data_pipeline_spark.operators import dedup

    docs = spark.createDataFrame(
        [
            (1, "intro one\nSHARED FOOTER\nbody alpha"),
            (2, "intro two\nSHARED FOOTER\nbody beta"),
            (3, "SHARED FOOTER\n   \nbody gamma"),
            (4, "SHARED FOOTER"),  # pure boilerplate: vanishes
        ],
        ["doc_id", "text"],
    )
    out = {
        r["doc_id"]: (r["clean_text"], r["n_paras"])
        for r in dedup.paragraph_dedup(docs, "doc_id", "text").collect()
    }
    assert out[1] == ("intro one\nSHARED FOOTER\nbody alpha", 3)
    assert out[2] == ("intro two\nbody beta", 2)  # footer deduped
    assert out[3] == ("body gamma", 1)  # footer + blank line dropped
    assert 4 not in out  # nothing survived

    # scale shape: exactly two exchanges (digest keep-first window +
    # reassembly groupBy) — never an all-pairs join
    plan = dedup.paragraph_dedup(
        docs, "doc_id", "text"
    )._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") <= 2, plan
    assert "CartesianProduct" not in plan, plan


def test_incremental_compaction_packs_only_small_files(spark, tmp_path):
    """snapshot_compact(only_smaller_than_mb=) — the Delta OPTIMIZE
    bin-packing shape: small files rewrite into packed ones as a
    DELTA commit, big files carry untouched (same on-disk paths), the
    change feed skips the commit as row-preserving, and DVs on packed
    files materialize while carried files keep theirs."""
    path = str(tmp_path / "t")
    big = spark.range(500_000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    ).coalesce(1)
    snap.snapshot_write(big, path, stats_cols=["k"])
    for i in range(6):  # six tiny append commits (streaming-ish)
        snap.snapshot_write(
            spark.range(10 ** 6 + i * 100, 10 ** 6 + i * 100 + 100).select(
                F.col("id").alias("k"), (F.col("id") * 2).alias("v")
            ).coalesce(1),
            path, mode="append", stats_cols=["k"],
        )
    # DV-delete rows in one SMALL file and one spot in the BIG file
    snap.snapshot_delete_where_dv(spark, path, [("k", 10 ** 6, 10 ** 6 + 9)])
    snap.snapshot_delete_where_dv(spark, path, [("k", 0, 4)])
    v0 = snap.latest_version(path)
    m0 = snap._read_manifest(path, v0)
    sizes = {f: __import__("os").path.getsize(snap._abs_file(path, f))
             for f in m0["files"]}
    big_files = {f for f, s in sizes.items() if s >= 1024 * 1024}
    n_before = snap.read_snapshot(spark, path).count()
    sum_before = snap.read_snapshot(spark, path).agg(
        F.sum("v")).collect()[0][0]

    v1 = snap.snapshot_compact(spark, path, target_file_mb=64,
                               only_smaller_than_mb=1)
    m1 = snap._read_manifest(path, v1)
    raw1 = snap._read_manifest_raw(path, v1)
    # delta commit: only small files removed, big files carried
    assert "adds" in raw1 and raw1["removes"], raw1.get("operation")
    assert big_files <= set(m1["files"])
    assert not (set(raw1["removes"]) & big_files)
    assert len(m1["files"]) < len(m0["files"])
    # carried big file keeps its vector; packed files retired theirs
    assert any(f in big_files for f in m1.get("dvs", {}))
    assert all(f in big_files for f in m1.get("dvs", {}))
    # rows identical (DV-deleted rows stay deleted, none resurrect)
    assert snap.read_snapshot(spark, path).count() == n_before
    assert snap.read_snapshot(spark, path).agg(
        F.sum("v")).collect()[0][0] == sum_before
    # feed across the compaction: row-preserving, contributes nothing
    feed = snap.read_snapshot_changes_feed(spark, path, v0, v1)
    assert feed.count() == 0
    # idempotent: nothing small remains at this threshold
    assert snap.snapshot_compact(
        spark, path, target_file_mb=64, only_smaller_than_mb=1
    ) == v1


def test_distinct_view_folds_appends_and_recomputes_on_delete(
    spark, tmp_path, monkeypatch
):
    """refresh_distinct_agg_view: appends fold via the register merge
    law WITHOUT rescanning the source (pinned by a spy); a DV delete
    forces the recompute fallback; estimates always equal a fresh
    single-pass sketch of the current source."""
    from harmony_energy_data_pipeline_spark.operators.analytics import (
        hll_estimate_by,
        hll_registers_by,
    )
    from harmony_energy_data_pipeline_spark.pipeline import ivm

    src = str(tmp_path / "src")
    view = str(tmp_path / "view")

    def fresh_estimates():
        regs = hll_registers_by(
            snap.read_snapshot(spark, src), ["g"], "u"
        )
        return sorted(
            tuple(r) for r in hll_estimate_by(regs, ["g"]).collect()
        )

    def df_of(lo, hi):
        return spark.range(lo, hi).select(
            F.col("id").alias("k"), (F.col("id") % 5).alias("g"),
            (F.col("id") % 700).alias("u"),
        ).coalesce(2)

    snap.snapshot_write(df_of(0, 4000), src)
    ivm.refresh_distinct_agg_view(spark, src, view, ["g"], "u")

    reads = {"full": 0}
    orig = snap.read_snapshot

    def spy(spark_, path_, *a, **k):
        if os.path.abspath(path_) == os.path.abspath(src):
            reads["full"] += 1
        return orig(spark_, path_, *a, **k)

    monkeypatch.setattr(ivm.snap, "read_snapshot", spy)
    snap.snapshot_write(df_of(4000, 6000), src, mode="append")
    ivm.refresh_distinct_agg_view(spark, src, view, ["g"], "u"),
    assert reads["full"] == 0  # incremental: source never rescanned
    monkeypatch.setattr(ivm.snap, "read_snapshot", orig)
    got = sorted(
        tuple(r)
        for r in ivm.read_distinct_view(spark, view, ["g"]).collect()
    )
    assert got == fresh_estimates()

    # a DV delete is register-inexpressible: the refresh recomputes
    snap.snapshot_delete_where_dv(spark, src, [("k", 0, 2999)])
    ivm.refresh_distinct_agg_view(spark, src, view, ["g"], "u")
    got = sorted(
        tuple(r)
        for r in ivm.read_distinct_view(spark, view, ["g"]).collect()
    )
    assert got == fresh_estimates()

    # idempotent: refresh with no new commits is a no-op version
    v = snap.latest_version(view)
    ivm.refresh_distinct_agg_view(spark, src, view, ["g"], "u")
    assert snap.latest_version(view) == v


def test_merge_evolve_schema_adds_and_nullfills(spark, tmp_path):
    """snapshot_merge_into(evolve_schema=True): a source that grew a
    column merges without coordination — the new column is added
    metadata-only (existing rows read NULL), and a source narrower
    than the table NULL-fills the gap in its replaced/inserted rows."""
    path = str(tmp_path / "t")
    base = spark.createDataFrame(
        [(1, 10.0), (2, 20.0), (3, 30.0)], ["k", "v"]
    )
    snap.snapshot_write(base, path, member_cols=["k"])

    wide_src = spark.createDataFrame(
        [(2, 21.0, "eu"), (4, 40.0, "us")], ["k", "v", "region"]
    )
    import pytest as _pytest
    with _pytest.raises(ValueError, match="evolve_schema"):
        snap.snapshot_merge_into(spark, path, wide_src, key="k")
    snap.snapshot_merge_into(
        spark, path, wide_src, key="k", evolve_schema=True
    )
    got = {
        r["k"]: (r["v"], r["region"])
        for r in snap.read_snapshot(spark, path).collect()
    }
    assert got == {
        1: (10.0, None), 2: (21.0, "eu"), 3: (30.0, None), 4: (40.0, "us")
    }

    # a NARROW source (missing v) merges with NULL fill, source-wins
    narrow_src = spark.createDataFrame([(1, "apac")], ["k", "region"])
    snap.snapshot_merge_into(
        spark, path, narrow_src, key="k", evolve_schema=True
    )
    got = {
        r["k"]: (r["v"], r["region"])
        for r in snap.read_snapshot(spark, path).collect()
    }
    assert got[1] == (None, "apac")
    assert got[2] == (21.0, "eu")

    # type conflicts still refuse even with evolve_schema
    bad = spark.createDataFrame([("x", 1.0)], ["k", "v"])  # k: string
    with _pytest.raises(Exception):
        snap.snapshot_merge_into(
            spark, path, bad, key="k", evolve_schema=True
        )


def test_histogram_view_folds_deletes_signed_without_rescan(
    spark, tmp_path, monkeypatch
):
    """refresh_histogram_view: a DV delete folds -1 through the
    change feed — the SOURCE is never rescanned (spy-pinned), unlike
    the MIN/MAX danger path — and the view equals a recompute.
    Quantiles derive from cumulative bins."""
    from harmony_energy_data_pipeline_spark.pipeline import ivm

    src = str(tmp_path / "src")
    view = str(tmp_path / "view")
    kw = dict(value_col="x", bin_width=10.0, n_bins=10)

    def df_of(lo, hi):
        return spark.range(lo, hi).select(
            F.col("id").alias("k"), (F.col("id") % 4).alias("g"),
            (F.col("id") % 100).cast("double").alias("x"),
        ).coalesce(2)

    snap.snapshot_write(df_of(0, 4000), src, stats_cols=["k"])
    ivm.refresh_histogram_view(spark, src, view, ["g"], **kw)
    snap.snapshot_delete_where_dv(spark, src, [("k", 500, 1499)])

    orig = snap.read_snapshot
    reads = {"full": 0}

    def spy(spark_, path_, *a, **k):
        if os.path.abspath(path_) == os.path.abspath(src):
            reads["full"] += 1
        return orig(spark_, path_, *a, **k)

    monkeypatch.setattr(ivm.snap, "read_snapshot", spy)
    ivm.refresh_histogram_view(spark, src, view, ["g"], **kw)
    monkeypatch.setattr(ivm.snap, "read_snapshot", orig)
    assert reads["full"] == 0  # signed fold: no source rescan

    expect = sorted(
        tuple(r) for r in snap.read_snapshot(spark, src).select(
            "g",
            F.least(
                F.greatest(F.floor(F.col("x") / 10.0), F.lit(0)),
                F.lit(9),
            ).cast("long").alias("bin"),
        ).groupBy("g", "bin").agg(F.count("*").alias("n")).collect()
    )
    got = sorted(
        tuple(r)
        for r in ivm.read_view(spark, view).select("g", "bin", "n").collect()
    )
    assert got == expect

    qs = ivm.histogram_quantiles(
        ivm.read_view(spark, view), ["g"], [0.5, 0.9], 10.0
    ).collect()
    assert len(qs) == 8  # 4 groups x 2 quantiles
    assert all(0 < r["value"] <= 100.0 for r in qs)


def test_boilerplate_strip_removes_all_occurrences(spark):
    from harmony_energy_data_pipeline_spark.operators import dedup

    docs = spark.createDataFrame(
        [
            (1, "unique one\nCOOKIE BANNER\nbody a"),
            (2, "COOKIE BANNER\nbody b"),
            (3, "COOKIE BANNER\nbody c"),
            (4, "body a\nunique four"),  # 'body a' in 2 docs: survives
        ],
        ["doc_id", "text"],
    )
    out = {
        r["doc_id"]: r["clean_text"]
        for r in dedup.boilerplate_strip(
            docs, "doc_id", "text", max_df=2
        ).collect()
    }
    # banner (df=3) stripped EVERYWHERE incl first occurrence;
    # 'body a' (df=2) kept everywhere
    assert out[1] == "unique one\nbody a"
    assert out[2] == "body b"
    assert out[3] == "body c"
    assert out[4] == "body a\nunique four"
