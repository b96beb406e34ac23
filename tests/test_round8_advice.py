"""Round-8 advisory regression tests: stats backfill must carry
deletion vectors, legacy full-manifest appends must feed their
inserts, DV commits must cover only actually-matched files,
timestamp travel under clock skew, resolve-cache thread safety."""
from __future__ import annotations

import json
import os
import threading

import pytest

from pyspark.sql import functions as F

from harmony_energy_data_pipeline_spark.sinks import snapshots as snap


def _df(spark, lo, hi, one_file=True):
    df = spark.range(lo, hi).select(
        F.col("id").alias("k"), (F.col("id") * 10).alias("v")
    )
    return df.coalesce(1) if one_file else df


# ---------------------------------------------------------------- high:
# snapshot_backfill_stats on a table with live deletion vectors must
# carry the resolved dvs through its full-manifest barrier


def test_backfill_stats_preserves_deletion_vectors(spark, tmp_path):
    path = str(tmp_path / "t")
    snap.snapshot_write(_df(spark, 0, 10), path)
    snap.snapshot_delete_where_dv(spark, path, [("k", 0, 2)])
    assert snap.read_snapshot(spark, path).count() == 7
    snap.snapshot_backfill_stats(spark, path, stats_cols=["k"])
    # the backfilled version must still subtract the vectors
    assert snap.read_snapshot(spark, path).count() == 7
    m = snap._read_manifest(path, snap.latest_version(path))
    assert m.get("dvs"), "backfill dropped the resolved dvs"
    # and the backfilled stats are actually there
    assert any("k" in s for s in m["stats"].values())


def test_backfill_stats_then_vacuum_keeps_vectors(spark, tmp_path):
    # vacuum liveness is derived from resolved states; after backfill
    # the vectors must still count as referenced
    path = str(tmp_path / "t")
    snap.snapshot_write(_df(spark, 0, 10), path)
    snap.snapshot_delete_where_dv(spark, path, [("k", 4, 6)])
    snap.snapshot_backfill_stats(spark, path, stats_cols=["v"])
    snap.vacuum(path, keep_last=1, orphan_grace_s=0.0)
    assert sorted(
        r.k for r in snap.read_snapshot(spark, path).collect()
    ) == [0, 1, 2, 3, 7, 8, 9]


# -------------------------------------------------------------- medium:
# an UNMARKED full-manifest append (legacy pre-log-structured shape)
# inserted rows; the row-level feed and the stream must emit them


def _legacy_append(spark, path, lo, hi):
    """Publish an append the way the pre-round-7 writer did: new data
    files plus a FULL manifest listing parent files + new files, with
    no adds/removes keys and no backfill/ddl marker."""
    import uuid

    v = snap.latest_version(path)
    m = snap._read_manifest(path, v)
    txid = uuid.uuid4().hex[:12]
    out_dir = os.path.join(path, "data", txid)
    _df(spark, lo, hi).write.mode("error").parquet(out_dir)
    new_rel = [snap._rel_file(path, f) for f in snap._data_files(out_dir)]
    snap._publish_manifest(path, v + 1, {
        "version": v + 1, "parent": v, "operation": "append",
        "txid": txid, "committed_at_unix": 0,
        "files": list(m["files"]) + new_rel,
        **({"schema": m["schema"]} if "schema" in m else {}),
    })
    return v + 1


def test_feed_recovers_legacy_full_manifest_append_inserts(spark, tmp_path):
    path = str(tmp_path / "t")
    snap.snapshot_write(_df(spark, 0, 10), path)          # v0
    v1 = _legacy_append(spark, path, 10, 15)              # legacy insert
    v2 = snap.snapshot_delete_where_dv(                   # DV commit
        spark, path, [("k", 0, 1)]
    )
    feed = snap.read_snapshot_changes_feed(spark, path, 0, v2)
    rows = feed.collect()
    ins = sorted(r.k for r in rows if r._change_type == "insert")
    dels = sorted(r.k for r in rows if r._change_type == "delete")
    assert ins == [10, 11, 12, 13, 14], "legacy append inserts dropped"
    assert dels == [0, 1]
    assert {r._commit_version for r in rows if r._change_type == "insert"} \
        == {v1}


def test_feed_still_zero_rows_for_backfill_and_ddl(spark, tmp_path):
    path = str(tmp_path / "t")
    snap.snapshot_write(_df(spark, 0, 10), path)
    snap.snapshot_backfill_stats(spark, path, stats_cols=["k"])
    v = snap.snapshot_set_constraints(spark, path, ["k >= 0"])
    feed = snap.read_snapshot_changes_feed(spark, path, 0, v)
    assert feed.count() == 0


def test_feed_raises_on_legacy_full_manifest_that_dropped_files(
    spark, tmp_path
):
    import uuid

    path = str(tmp_path / "t")
    snap.snapshot_write(_df(spark, 0, 5), path)
    snap.snapshot_write(_df(spark, 5, 10), path, mode="append")
    v = snap.latest_version(path)
    m = snap._read_manifest(path, v)
    # a legacy commit that silently dropped a parent file: no feed
    snap._publish_manifest(path, v + 1, {
        "version": v + 1, "parent": v, "operation": "append",
        "txid": uuid.uuid4().hex[:12], "committed_at_unix": 0,
        "files": list(m["files"])[1:],
        **({"schema": m["schema"]} if "schema" in m else {}),
    })
    with pytest.raises(ValueError, match="dropped"):
        snap.read_snapshot_changes_feed(spark, path, v, v + 1).collect()


def test_stream_emits_legacy_full_manifest_append_rows(spark, tmp_path):
    from harmony_energy_data_pipeline_spark.sources.snapstream import (
        SnapshotTableDataSource,
    )

    spark.dataSource.register(SnapshotTableDataSource)
    path = str(tmp_path / "t")
    snap.snapshot_write(_df(spark, 0, 10), path)
    v1 = _legacy_append(spark, path, 10, 15)
    q = (
        spark.readStream.format("snapshot_table").option("path", path)
        .load().writeStream.format("memory")
        .queryName("r8_legacy_stream").outputMode("append")
        .trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = sorted(r.k for r in spark.table("r8_legacy_stream").collect())
    assert got == list(range(15)), "stream dropped legacy append rows"
    assert v1 == 1


# ----------------------------------------------------------------- low:
# DV commits key vectors on only the files whose rows actually matched


def test_dv_delete_covers_only_matched_files(spark, tmp_path):
    path = str(tmp_path / "t")
    # two single-file commits, NO stats: pruning cannot discriminate,
    # so every file is "affected" — but only file A holds k<50
    snap.snapshot_write(_df(spark, 0, 100), path)
    file_a = snap._read_manifest(path, 0)["files"][0]
    snap.snapshot_write(_df(spark, 100, 200), path, mode="append")
    v = snap.snapshot_delete_where_dv(spark, path, [("k", 0, 49)])
    m = snap._read_manifest_raw(path, v)
    assert list(m["dv_adds"].keys()) == [snap._rel_file(path, file_a)]
    assert m["rewrite"]["covered_files"] == 1
    assert snap.read_snapshot(spark, path).count() == 150
    # the untouched file stays manifest-only aggregable
    info = snap.snapshot_table_info(path)
    assert info["dv_files"] == 1


def test_dv_update_covers_only_matched_files(spark, tmp_path):
    path = str(tmp_path / "t")
    snap.snapshot_write(_df(spark, 0, 100), path)
    snap.snapshot_write(_df(spark, 100, 200), path, mode="append")
    file_b = snap._read_manifest(path, 1)["files"][-1]
    v = snap.snapshot_update_where_dv(
        spark, path, [("k", 150, 159)], {"v": F.lit(-1).cast("long")}
    )
    m = snap._read_manifest_raw(path, v)
    assert list(m["dv_adds"].keys()) == [snap._rel_file(path, file_b)]
    got = {r.k: r.v for r in snap.read_snapshot(spark, path).collect()}
    assert len(got) == 200
    assert all(got[k] == -1 for k in range(150, 160))
    assert got[0] == 0 and got[199] == 1990


# ----------------------------------------------------------------- low:
# version_at_timestamp must not early-break on non-monotonic stamps


def test_version_at_timestamp_survives_clock_skew(spark, tmp_path):
    path = str(tmp_path / "t")
    snap.snapshot_write(_df(spark, 0, 5), path)
    snap.snapshot_write(_df(spark, 5, 10), path, mode="append")
    snap.snapshot_write(_df(spark, 10, 15), path, mode="append")
    # simulate independent-writer clock skew: v1 stamped AHEAD of v2
    for v, ts in ((0, 100), (1, 200), (2, 150)):
        mp = snap._manifest_path(path, v)
        with open(mp, encoding="utf-8") as fh:
            m = json.load(fh)
        m["committed_at_unix"] = ts
        with open(mp, "w", encoding="utf-8") as fh:
            json.dump(m, fh)
    # at ts=160 the latest eligible version is v2 (stamped 150); the
    # old early-break saw v1 (200) first and returned v0
    assert snap.version_at_timestamp(path, 160) == 2
    assert snap.version_at_timestamp(path, 100) == 0
    assert snap.version_at_timestamp(path, 500) == 2
    with pytest.raises(ValueError):
        snap.version_at_timestamp(path, 50)


# ----------------------------------------------------------------- low:
# resolve-cache eviction under concurrent mutation


def test_resolve_cache_eviction_is_thread_safe():
    errs: list[BaseException] = []

    def hammer(tid: int):
        try:
            for i in range(5000):
                snap._cache_put(("/r8-race", tid, str(i)), {"files": []})
                snap._RESOLVE_CACHE.get(("/r8-race", tid, str(i - 1)))
        except BaseException as e:  # noqa: BLE001
            errs.append(e)

    threads = [threading.Thread(target=hammer, args=(t,)) for t in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errs
    assert len(snap._RESOLVE_CACHE) <= snap._RESOLVE_CACHE_MAX
