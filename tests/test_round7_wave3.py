"""Round-7 third wave: replaceWhere, COW change files (CDF), and
metadata-only commit rebase over concurrent appends.

Covers the three lakehouse semantics this wave added to the snapshot
log:

* ``snapshot_replace_where`` — the Delta ``replaceWhere`` shape: one
  atomic commit whose effect is DELETE-the-region ⊕ INSERT-the-batch,
  with the batch validated against the predicate;
* ``record_cdf=True`` on copy-on-write rewrites — staged change files
  make the rewrite row-level-expressible, so
  ``read_snapshot_changes_feed`` (and therefore IVM) folds COW
  deletes/updates instead of recomputing;
* ``_publish_or_rebase`` — a rewrite/DV commit that loses the version
  race to PURE APPENDS republishes its already-staged delta against
  the new parent (Iceberg/Delta optimistic-concurrency resolution);
  any non-commuting interloper still forces the full redo.
"""
from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import functions as F

from harmony_energy_data_pipeline_spark.pipeline import ivm
from harmony_energy_data_pipeline_spark.sinks import snapshots as snap


def _tbl(spark, n=100):
    return spark.range(n).select(
        F.col("id").alias("k"),
        (F.col("id") % 10).alias("g"),
        (F.col("id") * 2).alias("v"),
    )


def _rows(spark, path, version=None):
    return sorted(
        tuple(r) for r in snap.read_snapshot(spark, path, version)
        .select("k", "g", "v").collect()
    )


def _batch(spark, lo, hi, g=99, v=-1):
    return spark.range(lo, hi).select(
        F.col("id").alias("k"),
        F.lit(g).cast("long").alias("g"),
        F.lit(v).cast("long").alias("v"),
    )


# --- replace_where ---------------------------------------------------------


def test_replace_where_replaces_region_atomically(spark, tmp_path):
    path = str(tmp_path / "tbl")
    snap.snapshot_write(_tbl(spark), path, stats_cols=["k"],
                        cluster_by=["k"])
    v = snap.snapshot_replace_where(
        spark, path, [("k", 20, 29)], _batch(spark, 20, 30)
    )
    got = _rows(spark, path)
    assert len(got) == 100
    region = [r for r in got if 20 <= r[0] <= 29]
    assert region == [(k, 99, -1) for k in range(20, 30)]
    # outside the region: untouched
    assert [r for r in got if r[0] == 5] == [(5, 5, 10)]
    # one commit, delta-manifest shaped, scoped to affected files
    m = snap._read_manifest_raw(path, v)
    assert m["rewrite"]["kind"] == "replace_where"
    assert m["removes"] and m["adds"]


def test_replace_where_is_idempotent_backfill(spark, tmp_path):
    path = str(tmp_path / "tbl")
    snap.snapshot_write(_tbl(spark), path, stats_cols=["k"],
                        cluster_by=["k"])
    for _ in range(2):  # rerunning the job replaces, never duplicates
        snap.snapshot_replace_where(
            spark, path, [("k", 40, 49)], _batch(spark, 40, 50)
        )
    got = _rows(spark, path)
    assert len(got) == 100
    assert [r for r in got if 40 <= r[0] <= 49] == [
        (k, 99, -1) for k in range(40, 50)
    ]


def test_replace_where_rejects_stray_batch_rows(spark, tmp_path):
    path = str(tmp_path / "tbl")
    snap.snapshot_write(_tbl(spark), path)
    before = snap.latest_version(path)
    with pytest.raises(ValueError, match="NOT matching the predicate"):
        snap.snapshot_replace_where(
            spark, path, [("k", 20, 29)], _batch(spark, 20, 31)
        )
    assert snap.latest_version(path) == before  # nothing committed


def test_replace_where_batch_respects_constraints(spark, tmp_path):
    path = str(tmp_path / "tbl")
    snap.snapshot_write(_tbl(spark), path, constraints=["v >= -1"])
    with pytest.raises(snap.ConstraintViolationError):
        snap.snapshot_replace_where(
            spark, path, [("k", 0, 9)], _batch(spark, 0, 10, v=-5)
        )


def test_replace_where_keeps_null_predicate_rows(spark, tmp_path):
    path = str(tmp_path / "tbl")
    with_null = _tbl(spark, 10).unionByName(
        spark.sql("SELECT CAST(NULL AS BIGINT) k, CAST(7 AS BIGINT) g, "
                  "CAST(70 AS BIGINT) v")
    )
    snap.snapshot_write(with_null, path)
    snap.snapshot_replace_where(
        spark, path, [("k", 0, 4)], _batch(spark, 0, 5)
    )
    got = snap.read_snapshot(spark, path)
    # the NULL-k row lives in an affected file but matches no region
    assert got.filter(F.col("k").isNull()).count() == 1
    assert got.count() == 11


def test_replace_where_on_unmatched_region_is_insert(spark, tmp_path):
    path = str(tmp_path / "tbl")
    snap.snapshot_write(_tbl(spark, 10), path, stats_cols=["k"])
    snap.snapshot_replace_where(
        spark, path, [("k", 1000, 1009)], _batch(spark, 1000, 1010)
    )
    assert len(_rows(spark, path)) == 20


# --- COW change files (record_cdf) ----------------------------------------


def test_cow_delete_with_cdf_feeds_row_level(spark, tmp_path):
    path = str(tmp_path / "tbl")
    snap.snapshot_write(_tbl(spark), path, stats_cols=["k"],
                        cluster_by=["k"])
    v = snap.snapshot_delete_where(
        spark, path, [("k", 10, 19)], record_cdf=True
    )
    feed = snap.read_snapshot_changes_feed(spark, path, v - 1, v)
    rows = feed.select("k", "_change_type", "_commit_version").collect()
    assert sorted(r.k for r in rows) == list(range(10, 20))
    assert {r._change_type for r in rows} == {"delete"}
    assert {r._commit_version for r in rows} == {v}


def test_cow_update_with_cdf_is_delete_plus_insert(spark, tmp_path):
    path = str(tmp_path / "tbl")
    snap.snapshot_write(_tbl(spark), path, stats_cols=["k"],
                        cluster_by=["k"])
    v = snap.snapshot_update_where(
        spark, path, [("k", 30, 34)], {"v": F.col("v") * 10},
        record_cdf=True,
    )
    feed = snap.read_snapshot_changes_feed(spark, path, v - 1, v)
    by_type = {
        (r._change_type, r.k): r.v
        for r in feed.select("k", "v", "_change_type").collect()
    }
    for k in range(30, 35):
        assert by_type[("delete", k)] == 2 * k      # pre-image
        assert by_type[("insert", k)] == 20 * k     # post-image
    assert len(by_type) == 10


def test_cow_rewrite_without_cdf_still_raises(spark, tmp_path):
    path = str(tmp_path / "tbl")
    snap.snapshot_write(_tbl(spark), path)
    v = snap.snapshot_delete_where(spark, path, [("k", 0, 4)])
    with pytest.raises(ValueError, match="change feed cannot express"):
        snap.read_snapshot_changes_feed(spark, path, v - 1, v)


def test_ivm_folds_cow_delete_through_cdf(spark, tmp_path, monkeypatch):
    src = str(tmp_path / "src")
    view = str(tmp_path / "view")
    snap.snapshot_write(_tbl(spark), src, stats_cols=["k"],
                        cluster_by=["k"])
    ivm.refresh_agg_view(spark, src, view, keys=["g"], sum_cols=["v"],
                         avg_cols=["v"])
    snap.snapshot_delete_where(spark, src, [("k", 50, 69)],
                               record_cdf=True)
    # the refresh must NOT rescan the source: fail the full-recompute
    # path loudly if it is taken
    real_read = snap.read_snapshot

    def no_full_reads(spark_, path_, version=None, **kw):
        if os.path.abspath(path_) == os.path.abspath(src):
            raise AssertionError(
                "IVM recomputed from source; expected CDF fold"
            )
        return real_read(spark_, path_, version, **kw)

    monkeypatch.setattr(ivm.snap, "read_snapshot", no_full_reads)
    ivm.refresh_agg_view(spark, src, view, keys=["g"], sum_cols=["v"],
                         avg_cols=["v"])
    monkeypatch.undo()
    got = {
        r.g: (r.n, r.sum_v, r.avg_v)
        for r in ivm.read_view(spark, view).collect()
    }
    expect = {
        r.g: (r.n, r.sum_v, r.avg_v)
        for r in snap.read_snapshot(spark, src).groupBy("g").agg(
            F.count("*").alias("n"), F.sum("v").alias("sum_v"),
            F.avg("v").alias("avg_v"),
        ).collect()
    }
    assert got == expect


def test_vacuum_cdf_liveness(spark, tmp_path):
    path = str(tmp_path / "tbl")
    snap.snapshot_write(_tbl(spark), path, stats_cols=["k"],
                        cluster_by=["k"])
    v1 = snap.snapshot_delete_where(spark, path, [("k", 0, 9)],
                                    record_cdf=True)
    v2 = snap.snapshot_delete_where(spark, path, [("k", 90, 99)],
                                    record_cdf=True)
    cdf1 = [os.path.join(path, f)
            for f in snap._read_manifest_raw(path, v1)["cdf"]]
    cdf2 = [os.path.join(path, f)
            for f in snap._read_manifest_raw(path, v2)["cdf"]]
    assert all(os.path.exists(f) for f in cdf1 + cdf2)
    # keep v1..v2: both commits retained -> both cdf sets live
    snap.vacuum(path, keep_last=2, orphan_grace_s=0.0)
    assert all(os.path.exists(f) for f in cdf1 + cdf2)
    feed = snap.read_snapshot_changes_feed(spark, path, v1, v2)
    assert feed.count() == 10
    # expire v1's commit -> its change files are swept, v2's stay
    snap.vacuum(path, keep_last=1, orphan_grace_s=0.0)
    assert not any(os.path.exists(f) for f in cdf1)
    assert all(os.path.exists(f) for f in cdf2)


# --- metadata-only rebase over concurrent appends --------------------------


def _inject_append_once(spark, path, monkeypatch, rows):
    """Arrange for a concurrent append to land between a rewrite's
    staging and its first publish attempt (the classic lost-race
    window), exactly once."""
    orig = snap._publish_manifest
    state = {"fired": False}

    def racy(p, version, payload, protocol="link"):
        if not state["fired"] and (
            payload.get("rewrite") or payload.get("dv_adds")
        ):
            state["fired"] = True
            snap.snapshot_write(rows, path, mode="append")
        return orig(p, version, payload, protocol=protocol)

    monkeypatch.setattr(snap, "_publish_manifest", racy)
    return state


def test_cow_rewrite_rebases_over_concurrent_append(
    spark, tmp_path, monkeypatch
):
    path = str(tmp_path / "tbl")
    snap.snapshot_write(_tbl(spark), path, stats_cols=["k"],
                        cluster_by=["k"])
    base = snap.latest_version(path)
    extra = _batch(spark, 1000, 1005, g=7, v=5)
    state = _inject_append_once(spark, path, monkeypatch, extra)
    v = snap.snapshot_delete_where(spark, path, [("k", 0, 4)])
    assert state["fired"]
    # append claimed base+1; the staged delete REBASED onto base+2
    # (no second data write: the rebase is metadata-only)
    assert v == base + 2
    got = _rows(spark, path)
    assert len(got) == 100 - 5 + 5
    assert [r for r in got if r[0] >= 1000] == [
        (k, 7, 5) for k in range(1000, 1005)
    ]
    assert not any(r[0] <= 4 for r in got)


def test_dv_delete_rebases_over_concurrent_append(
    spark, tmp_path, monkeypatch
):
    path = str(tmp_path / "tbl")
    snap.snapshot_write(_tbl(spark), path, stats_cols=["k"],
                        cluster_by=["k"])
    base = snap.latest_version(path)
    extra = _batch(spark, 1000, 1003, g=7, v=5)
    state = _inject_append_once(spark, path, monkeypatch, extra)
    v = snap.snapshot_delete_where_dv(spark, path, [("k", 10, 14)])
    assert state["fired"] and v == base + 2
    got = _rows(spark, path)
    assert len(got) == 100 - 5 + 3
    assert not any(10 <= r[0] <= 14 for r in got)
    # the vectors still cover their (still-live) base files
    info = snap.snapshot_table_info(path)
    assert info["dv_files"] >= 1


def test_rebase_refuses_non_commuting_interloper(
    spark, tmp_path, monkeypatch
):
    """A concurrent REWRITE (non-append) must force the full redo
    path, and the redo must produce the correct final state."""
    path = str(tmp_path / "tbl")
    snap.snapshot_write(_tbl(spark), path, stats_cols=["k"],
                        cluster_by=["k"])
    orig = snap._publish_manifest
    state = {"fired": False}

    def racy(p, version, payload, protocol="link"):
        if not state["fired"] and payload.get("rewrite", {}).get(
            "kind"
        ) == "delete_where":
            state["fired"] = True
            # interloper: a COMPACTION (overwrite) — removes files
            snap.snapshot_compact(spark, path, target_file_mb=64)
        return orig(p, version, payload, protocol=protocol)

    monkeypatch.setattr(snap, "_publish_manifest", racy)
    v = snap.snapshot_delete_where(spark, path, [("k", 0, 4)])
    monkeypatch.undo()
    assert state["fired"]
    got = _rows(spark, path)
    assert len(got) == 95 and not any(r[0] <= 4 for r in got)
    # the winning commit is the redo'd delete, committed AFTER (and on
    # top of) the interloping compaction
    assert v == snap.latest_version(path)
    kinds = [
        snap._read_manifest_raw(path, vv).get("rewrite", {}).get("kind")
        for vv in range(v + 1)
    ]
    assert kinds[v] == "delete_where"
    assert any(
        snap._read_manifest_raw(path, vv).get("compacted_from") is not None
        for vv in range(v + 1)
    )


def test_rebase_refuses_schema_evolving_append(
    spark, tmp_path, monkeypatch
):
    """An interloper append that EVOLVES the schema must not be
    rebased over (the staged manifest carries the old schema and
    would roll the evolution back for readers of the new version)."""
    path = str(tmp_path / "tbl")
    snap.snapshot_write(_tbl(spark), path, stats_cols=["k"],
                        cluster_by=["k"])
    wide = _batch(spark, 1000, 1003, g=7, v=5).withColumn(
        "extra", F.lit(1).cast("long")
    )
    state = _inject_append_once(spark, path, monkeypatch, wide)
    v = snap.snapshot_delete_where(spark, path, [("k", 0, 4)])
    monkeypatch.undo()
    assert state["fired"]
    got = snap.read_snapshot(spark, path)
    assert "extra" in got.columns  # evolution survived the redo
    assert got.count() == 98
    assert got.filter(F.col("extra").isNotNull()).count() == 3
    m = snap._read_manifest_raw(path, v)
    names = {f["name"] for f in m["schema"]["fields"]}
    assert "extra" in names


def test_replace_where_rebases_over_concurrent_append(
    spark, tmp_path, monkeypatch
):
    path = str(tmp_path / "tbl")
    snap.snapshot_write(_tbl(spark), path, stats_cols=["k"],
                        cluster_by=["k"])
    base = snap.latest_version(path)
    extra = _batch(spark, 1000, 1002, g=7, v=5)
    state = _inject_append_once(spark, path, monkeypatch, extra)
    v = snap.snapshot_replace_where(
        spark, path, [("k", 20, 29)], _batch(spark, 20, 30)
    )
    assert state["fired"] and v == base + 2
    got = _rows(spark, path)
    assert len(got) == 102
    assert [r for r in got if 20 <= r[0] <= 29] == [
        (k, 99, -1) for k in range(20, 30)
    ]


def test_merge_into_with_cdf_folds_in_ivm(spark, tmp_path, monkeypatch):
    src = str(tmp_path / "src")
    view = str(tmp_path / "view")
    snap.snapshot_write(_tbl(spark), src, member_cols=["k"])
    ivm.refresh_agg_view(spark, src, view, keys=["g"], sum_cols=["v"])
    # upsert: keys 5..9 updated (v*100), keys 200..204 inserted
    upd = spark.range(5, 10).select(
        F.col("id").alias("k"), (F.col("id") % 10).alias("g"),
        (F.col("id") * 200).alias("v"),
    )
    ins = spark.range(200, 205).select(
        F.col("id").alias("k"), (F.col("id") % 10).alias("g"),
        (F.col("id") * 2).alias("v"),
    )
    v = snap.snapshot_merge_into(
        spark, src, upd.unionByName(ins), key="k", record_cdf=True
    )
    feed = snap.read_snapshot_changes_feed(spark, src, v - 1, v)
    by_type = {
        r[0]: r[1]
        for r in feed.groupBy("_change_type").count().collect()
    }
    assert by_type == {"delete": 5, "insert": 10}
    real_read = snap.read_snapshot

    def no_full_reads(spark_, path_, version=None, **kw):
        if os.path.abspath(path_) == os.path.abspath(src):
            raise AssertionError("IVM recomputed; expected CDF fold")
        return real_read(spark_, path_, version, **kw)

    monkeypatch.setattr(ivm.snap, "read_snapshot", no_full_reads)
    ivm.refresh_agg_view(spark, src, view, keys=["g"], sum_cols=["v"])
    monkeypatch.undo()
    got = {r.g: (r.n, r.sum_v)
           for r in ivm.read_view(spark, view).collect()}
    expect = {
        r.g: (r.n, r.sum_v)
        for r in snap.read_snapshot(spark, src).groupBy("g").agg(
            F.count("*").alias("n"), F.sum("v").alias("sum_v")
        ).collect()
    }
    assert got == expect


def test_cdf_feed_scans_only_change_files(spark, tmp_path):
    """Plan-level pin: a feed over a record_cdf rewrite reads the
    staged change files and NOTHING else — not the rewrite's adds
    (which contain carried rows), not the table's data files."""
    path = str(tmp_path / "tbl")
    snap.snapshot_write(_tbl(spark), path, stats_cols=["k"],
                        cluster_by=["k"])
    v = snap.snapshot_update_where(
        spark, path, [("k", 10, 19)], {"v": F.col("v") + 1},
        record_cdf=True,
    )
    m = snap._read_manifest_raw(path, v)
    cdf_abs = {os.path.abspath(os.path.join(path, f)) for f in m["cdf"]}
    feed = snap.read_snapshot_changes_feed(spark, path, v - 1, v)
    scanned = {os.path.abspath(f.replace("file:", ""))
               for f in feed.inputFiles()}
    assert scanned == cdf_abs


# --- clustered first write -------------------------------------------------


def test_snapshot_write_cluster_by_enables_pruning(spark, tmp_path):
    path = str(tmp_path / "tbl")
    # 8 range-clustered files over k: a narrow k-interval must prune
    # most of them at planning time
    df = spark.range(10_000).select(F.col("id").alias("k"),
                                    (F.col("id") % 7).alias("v"))
    snap.snapshot_write(
        df, path, stats_cols=["k"], cluster_by=["k"], cluster_files=8,
    )
    kept, total = snap.prune_files(path, [("k", 100, 120)])
    assert total >= 4
    assert len(kept) <= max(1, total // 4)
    got = snap.read_snapshot(spark, path, where=[("k", 100, 120)])
    assert got.count() == 21


# --- manifest-only aggregates ------------------------------------------------


def test_stats_agg_counts_without_scanning(spark, tmp_path):
    path = str(tmp_path / "tbl")
    snap.snapshot_write(_tbl(spark, 500), path, stats_cols=["k"],
                        cluster_by=["k"], cluster_files=4)
    agg = snap.snapshot_stats_agg(path, cols=["k"])
    assert agg["n_rows"] == 500
    assert agg["min"]["k"] == 0 and agg["max"]["k"] == 499
    # appends keep it provable (their stats ride the delta manifest)
    snap.snapshot_write(_batch(spark, 1000, 1100), path, mode="append",
                        stats_cols=["k"])
    agg = snap.snapshot_stats_agg(path, cols=["k"])
    assert agg["n_rows"] == 600
    assert agg["max"]["k"] == 1099
    # time travel: the old version still answers from its manifest
    assert snap.snapshot_stats_agg(path, version=0)["n_rows"] == 500


def test_stats_agg_subtracts_deletion_vectors_exactly(spark, tmp_path):
    path = str(tmp_path / "tbl")
    snap.snapshot_write(_tbl(spark, 500), path, stats_cols=["k"],
                        cluster_by=["k"], cluster_files=4)
    snap.snapshot_delete_where_dv(spark, path, [("k", 100, 149)])
    snap.snapshot_delete_where_dv(spark, path, [("k", 200, 219)])
    agg = snap.snapshot_stats_agg(path, cols=["k"])
    assert agg["n_rows"] == 500 - 50 - 20
    assert agg["n_rows"] == snap.read_snapshot(spark, path).count()
    # extrema are no longer provable under deletes
    assert agg["min"]["k"] is None and agg["max"]["k"] is None
    # a COW rewrite materializes the vectors: extrema provable again
    snap.snapshot_compact(spark, path)
    agg2 = snap.snapshot_stats_agg(path, cols=["k"])
    assert agg2["n_rows"] == 430
    assert agg2["min"]["k"] == 0 and agg2["max"]["k"] == 499


def test_stats_agg_refuses_untracked_files(spark, tmp_path):
    path = str(tmp_path / "tbl")
    snap.snapshot_write(_tbl(spark, 100), path, stats_cols=["k"])
    # an append WITHOUT stats poisons provability (None, never wrong)
    snap.snapshot_write(_batch(spark, 0, 10), path, mode="append")
    agg = snap.snapshot_stats_agg(path, cols=["k"])
    assert agg["n_rows"] is None
    assert agg["min"]["k"] is None
    # backfill retrofits row counts + stats metadata-only
    snap.snapshot_backfill_stats(spark, path, stats_cols=["k"])
    agg2 = snap.snapshot_stats_agg(path, cols=["k"])
    assert agg2["n_rows"] == 110
    assert agg2["min"]["k"] == 0 and agg2["max"]["k"] == 99


# --- zero-copy shallow clone -------------------------------------------------


def test_clone_is_zero_copy_and_diverges(spark, tmp_path):
    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    snap.snapshot_write(_tbl(spark, 200), src, stats_cols=["k"],
                        cluster_by=["k"], cluster_files=4)
    snap.snapshot_clone(src, dst)
    # no data copied: the clone owns no data files yet
    assert not os.path.exists(os.path.join(dst, "data"))
    assert _rows(spark, dst) == _rows(spark, src)
    # borrowed stats keep manifest-only aggregates and pruning working
    assert snap.snapshot_stats_agg(dst, cols=["k"])["n_rows"] == 200
    kept, total = snap.prune_files(dst, [("k", 0, 40)])
    assert len(kept) < total
    # the branch mutates; the source is untouched
    snap.snapshot_delete_where(spark, dst, [("k", 0, 49)])
    snap.snapshot_write(_batch(spark, 900, 910), dst, mode="append")
    assert len(_rows(spark, dst)) == 160
    assert len(_rows(spark, src)) == 200
    # the rewrite materialized ONLY the affected borrowed files into
    # the clone's own root; untouched borrowed files stay borrowed
    m = snap._read_manifest(dst, snap.latest_version(dst))
    borrowed = [f for f in m["files"] if ".." in f or os.path.isabs(f)]
    assert borrowed and len(borrowed) < total


def test_clone_vacuum_never_sweeps_borrowed_files(spark, tmp_path):
    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    snap.snapshot_write(_tbl(spark, 100), src)
    snap.snapshot_clone(src, dst)
    snap.snapshot_write(_batch(spark, 0, 5), dst, mode="append")
    snap.snapshot_write(_batch(spark, 5, 9), dst, mode="append")
    snap.vacuum(dst, keep_last=1, orphan_grace_s=0.0)
    # source files intact, both tables readable
    assert len(_rows(spark, src)) == 100
    assert len(_rows(spark, dst)) == 109


def test_clone_of_historical_version_and_dv_state(spark, tmp_path):
    src = str(tmp_path / "src")
    snap.snapshot_write(_tbl(spark, 100), src, stats_cols=["k"],
                        cluster_by=["k"])
    snap.snapshot_delete_where_dv(spark, src, [("k", 10, 19)])  # v1
    snap.snapshot_write(_batch(spark, 500, 510), src, mode="append")  # v2
    # clone v1: borrowed deletion vectors must apply in the clone
    d1 = str(tmp_path / "d1")
    snap.snapshot_clone(src, d1, version=1)
    assert len(_rows(spark, d1)) == 90
    assert not any(10 <= r[0] <= 19 for r in _rows(spark, d1))
    # clone refuses a non-fresh destination
    with pytest.raises(FileExistsError):
        snap.snapshot_clone(src, d1)


def test_dv_delete_on_borrowed_files(spark, tmp_path):
    """Merge-on-read delete on a CLONE: the vectors cover borrowed
    (foreign-root) files — vector content uses the data/-suffix
    canonical identity, so the anti-join matches across roots."""
    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    snap.snapshot_write(_tbl(spark, 100), src, stats_cols=["k"],
                        cluster_by=["k"], cluster_files=4)
    snap.snapshot_clone(src, dst)
    snap.snapshot_delete_where_dv(spark, dst, [("k", 20, 29)])
    got = _rows(spark, dst)
    assert len(got) == 90
    assert not any(20 <= r[0] <= 29 for r in got)
    assert len(_rows(spark, src)) == 100  # source untouched
    # manifest-only count subtracts the borrowed-file vectors too
    assert snap.snapshot_stats_agg(dst)["n_rows"] == 90


# --- metadata-only DDL commits -----------------------------------------------


def test_set_constraints_validates_then_enforces(spark, tmp_path):
    path = str(tmp_path / "tbl")
    snap.snapshot_write(_tbl(spark, 50), path)
    # current data violates: nothing committed
    before = snap.latest_version(path)
    with pytest.raises(snap.ConstraintViolationError):
        snap.snapshot_set_constraints(spark, path, ["v < 50"])
    assert snap.latest_version(path) == before
    # a satisfiable constraint lands as a metadata-only commit and
    # binds every later write
    v = snap.snapshot_set_constraints(spark, path, ["v >= 0"])
    m = snap._read_manifest_raw(path, v)
    assert m["adds"] == [] and m["removes"] == []
    assert m["ddl"] == "set_constraints"
    with pytest.raises(snap.ConstraintViolationError):
        snap.snapshot_write(_batch(spark, 0, 3, v=-7), path, mode="append")
    # data unchanged through the DDL commit
    assert len(_rows(spark, path)) == 50
    # clearing re-opens the gate
    snap.snapshot_set_constraints(spark, path, [])
    snap.snapshot_write(_batch(spark, 0, 3, v=-7), path, mode="append")
    assert len(_rows(spark, path)) == 53


def test_add_column_is_metadata_only(spark, tmp_path):
    path = str(tmp_path / "tbl")
    snap.snapshot_write(_tbl(spark, 40), path)
    files_before = snap._read_manifest(path, 0)["files"]
    v = snap.snapshot_add_column(path, "tag", "string")
    got = snap.read_snapshot(spark, path)
    assert "tag" in got.columns
    assert got.filter(F.col("tag").isNull()).count() == 40
    # no data file written or touched
    assert snap._read_manifest(path, v)["files"] == files_before
    # appends populate it; old files keep reading NULL
    snap.snapshot_write(
        _batch(spark, 500, 505).withColumn("tag", F.lit("x")),
        path, mode="append",
    )
    out = snap.read_snapshot(spark, path)
    assert out.filter(F.col("tag") == "x").count() == 5
    assert out.filter(F.col("tag").isNull()).count() == 40
    with pytest.raises(snap.SchemaEvolutionError):
        snap.snapshot_add_column(path, "tag", "long")


# --- compaction is transparent to incremental consumers ----------------------


def test_cdc_skips_row_preserving_compaction(spark, tmp_path):
    path = str(tmp_path / "tbl")
    snap.snapshot_write(_tbl(spark, 50), path)                 # v0
    snap.snapshot_write(_batch(spark, 100, 120), path, "append")  # v1
    snap.snapshot_compact(spark, path)                          # v2
    snap.snapshot_write(_batch(spark, 200, 210), path, "append")  # v3
    # the (0, 3] delta is exactly the two appends' rows — the
    # compaction's rewritten files are NOT re-emitted
    delta = snap.read_snapshot_changes(spark, path, 0, 3)
    assert sorted(r.k for r in delta.collect()) == (
        list(range(100, 120)) + list(range(200, 210))
    )
    # the row-level feed agrees
    feed = snap.read_snapshot_changes_feed(spark, path, 0, 3)
    assert feed.count() == 30
    assert {r._change_type for r in feed.collect()} == {"insert"}


def test_ivm_survives_compaction_without_recompute(
    spark, tmp_path, monkeypatch
):
    """Routine maintenance no longer forces every downstream view
    into a full recompute: the refresh folds across a compaction."""
    src, view = str(tmp_path / "src"), str(tmp_path / "view")
    snap.snapshot_write(_tbl(spark), src)
    ivm.refresh_agg_view(spark, src, view, keys=["g"], sum_cols=["v"])
    snap.snapshot_compact(spark, src)
    snap.snapshot_write(_batch(spark, 500, 520), src, mode="append")
    real_read = snap.read_snapshot

    def no_full_reads(spark_, path_, version=None, **kw):
        if os.path.abspath(path_) == os.path.abspath(src):
            raise AssertionError("recomputed across a compaction")
        return real_read(spark_, path_, version, **kw)

    monkeypatch.setattr(ivm.snap, "read_snapshot", no_full_reads)
    ivm.refresh_agg_view(spark, src, view, keys=["g"], sum_cols=["v"])
    monkeypatch.undo()
    got = {r.g: (r.n, r.sum_v)
           for r in ivm.read_view(spark, view).collect()}
    exp = {
        r.g: (r.n, r.s)
        for r in snap.read_snapshot(spark, src).groupBy("g").agg(
            F.count("*").alias("n"), F.sum("v").alias("s")
        ).collect()
    }
    assert got == exp


# --- concurrent writers: invariant under real interleaving -------------------


def test_concurrent_appenders_and_deleters_converge(spark, tmp_path):
    """3 appender threads race 2 row-level deleters (one DV, one COW)
    on ONE table with disjoint key spaces: under the rebase/redo
    conflict handling, the final state must be exactly (base minus the
    two deleted bands) ∪ every appended batch — no lost appends, no
    resurrected rows, contiguous version chain."""
    import threading

    path = str(tmp_path / "tbl")
    snap.snapshot_write(_tbl(spark, 1000), path, stats_cols=["k"],
                        cluster_by=["k"], cluster_files=4)
    errs: list = []

    def appender(wid: int):
        try:
            for s in range(3):
                lo = 1_000_000 * (wid + 1) + 100 * s
                snap.snapshot_write(
                    _batch(spark, lo, lo + 50), path, mode="append",
                    stats_cols=["k"], max_retries=100,
                )
        except Exception as e:  # pragma: no cover
            errs.append(e)

    def dv_deleter():
        try:
            snap.snapshot_delete_where_dv(
                spark, path, [("k", 100, 199)], max_redo=20
            )
        except Exception as e:  # pragma: no cover
            errs.append(e)

    def cow_deleter():
        try:
            snap.snapshot_delete_where(
                spark, path, [("k", 300, 399)], max_redo=20
            )
        except Exception as e:  # pragma: no cover
            errs.append(e)

    threads = [
        threading.Thread(target=appender, args=(i,)) for i in range(3)
    ] + [
        threading.Thread(target=dv_deleter),
        threading.Thread(target=cow_deleter),
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=300)
    assert not errs, errs
    expect = {k for k in range(1000) if not (100 <= k <= 199)
              if not (300 <= k <= 399)}
    for wid in range(3):
        for s in range(3):
            lo = 1_000_000 * (wid + 1) + 100 * s
            expect |= set(range(lo, lo + 50))
    got = {r.k for r in snap.read_snapshot(spark, path).select("k").collect()}
    assert got == expect
    hist = snap.snapshot_history(path)
    assert [h["version"] for h in hist] == list(range(len(hist)))
    assert len(hist) == 1 + 9 + 2  # base + appends + two deletes
    # manifest-only count agrees wherever provable
    agg = snap.snapshot_stats_agg(path)
    if agg["n_rows"] is not None:
        assert agg["n_rows"] == len(expect)


def test_borrow_registration_protects_clone_from_source_vacuum(
    spark, tmp_path
):
    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    snap.snapshot_write(_tbl(spark, 80), src)
    snap.snapshot_clone(src, dst)
    before = _rows(spark, dst)
    # the source moves on: its only version referencing the borrowed
    # files expires — without the borrow record vacuum would reclaim
    # them and silently break the clone
    snap.snapshot_write(_batch(spark, 0, 10), src, mode="overwrite")
    snap.vacuum(src, keep_last=1, orphan_grace_s=0.0)
    assert _rows(spark, dst) == before  # clone intact
    # release is refused while the clone still borrows
    assert snap.snapshot_release_borrow(src, dst) is False
    # compacting the clone materializes every borrowed file
    snap.snapshot_compact(spark, dst)
    assert snap.snapshot_release_borrow(src, dst) is True
    removed = snap.vacuum(src, keep_last=1, orphan_grace_s=0.0)
    assert removed > 0  # the borrowed files are finally reclaimed
    assert _rows(spark, dst) == before  # materialized clone unaffected
    assert len(_rows(spark, src)) == 10
    # releasing twice is a no-op
    assert snap.snapshot_release_borrow(src, dst) is True


# --- negative paths of the new surface ---------------------------------------


def test_new_api_error_paths(spark, tmp_path):
    missing = str(tmp_path / "nope")
    with pytest.raises(FileNotFoundError):
        snap.snapshot_stats_agg(missing)
    with pytest.raises(FileNotFoundError):
        snap.snapshot_clone(missing, str(tmp_path / "c"))
    with pytest.raises(FileNotFoundError):
        snap.snapshot_replace_where(
            spark, missing, [("k", 0, 1)],
            spark.range(1).select(F.col("id").alias("k")),
        )
    with pytest.raises(FileNotFoundError):
        snap.snapshot_set_constraints(spark, missing, ["1 = 1"],
                                      validate_existing=False)
    path = str(tmp_path / "tbl")
    snap.snapshot_write(_tbl(spark, 10), path)
    # add_column to a schemaless (legacy) table refuses
    legacy = str(tmp_path / "legacy")
    _tbl(spark, 5).write.parquet(legacy + "/data/t0")
    snap.snapshot_publish_staged(legacy, "t0")
    with pytest.raises(ValueError, match="records no schema"):
        snap.snapshot_add_column(legacy, "x", "long")
    # replace batch with wrong columns refuses before any write
    with pytest.raises(ValueError, match="columns"):
        snap.snapshot_replace_where(
            spark, path, [("k", 0, 1)],
            spark.range(1).select(F.col("id").alias("k")),
        )
    # invalid DDL type string surfaces as a parse error
    with pytest.raises(Exception):
        snap.snapshot_add_column(path, "x", "not_a_type")
    # release of a never-registered borrow is a clean no-op
    assert snap.snapshot_release_borrow(path, missing) is True


def test_clone_of_clone_chains_borrows(spark, tmp_path):
    """A clone of a clone borrows across TWO roots (grandparent files
    arrive as the middle clone's '../' references); reads, rewrites,
    and manifest-only counts all resolve through the chain, and each
    table stays isolated."""
    a, b, c = (str(tmp_path / n) for n in ("a", "b", "c"))
    snap.snapshot_write(_tbl(spark, 100), a, stats_cols=["k"])
    snap.snapshot_clone(a, b)
    snap.snapshot_write(_batch(spark, 200, 210), b, mode="append",
                        stats_cols=["k"])
    snap.snapshot_clone(b, c)
    got = sorted(r[0] for r in _rows(spark, c))
    assert got == list(range(100)) + list(range(200, 210))
    snap.snapshot_delete_where(spark, c, [("k", 0, 9)])
    assert len(_rows(spark, c)) == 100
    assert len(_rows(spark, b)) == 110
    assert len(_rows(spark, a)) == 100
    assert snap.snapshot_stats_agg(c)["n_rows"] == 100


def test_vacuum_dry_run_counts_without_deleting(spark, tmp_path):
    path = str(tmp_path / "tbl")
    snap.snapshot_write(_tbl(spark, 50), path)
    files_v0 = [os.path.join(path, f)
                for f in snap._read_manifest(path, 0)["files"]]
    snap.snapshot_write(_batch(spark, 0, 10), path, mode="overwrite")
    would = snap.vacuum(path, keep_last=1, orphan_grace_s=0.0,
                        dry_run=True)
    assert would == len(files_v0)
    # NOTHING happened: old version still time-travels, files intact
    assert all(os.path.exists(f) for f in files_v0)
    assert len(_rows(spark, path, version=0)) == 50
    # the real run deletes exactly what the dry run predicted
    assert snap.vacuum(path, keep_last=1, orphan_grace_s=0.0) == would
    assert not any(os.path.exists(f) for f in files_v0)


def test_table_info_lists_borrowing_clones(spark, tmp_path):
    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    snap.snapshot_write(_tbl(spark, 20), src)
    assert snap.snapshot_table_info(src)["borrowing_clones"] == []
    snap.snapshot_clone(src, dst)
    assert snap.snapshot_table_info(src)["borrowing_clones"] == [
        os.path.abspath(dst)
    ]
    snap.snapshot_compact(spark, dst)
    snap.snapshot_release_borrow(src, dst)
    assert snap.snapshot_table_info(src)["borrowing_clones"] == []
