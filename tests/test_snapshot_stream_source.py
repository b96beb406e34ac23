"""Streaming source over snapshot tables (round 7): versions as
offsets, distributed file reads, rewrite contract, table→table
chaining."""
from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from harmony_energy_data_pipeline_spark.sinks import snapshots as snap
from harmony_energy_data_pipeline_spark.sources.snapstream import (
    SnapshotTableDataSource,
)


@pytest.fixture(scope="module")
def registered(spark):
    spark.dataSource.register(SnapshotTableDataSource)
    return spark


def _write(spark, path, lo, hi, mode):
    df = spark.range(lo, hi).select(
        (F.col("id") % 5).alias("g"), F.col("id").alias("v")
    ).coalesce(1)
    snap.snapshot_write(df, path, mode=mode)


def _drain(spark, path, name, **opts):
    reader = spark.readStream.format("snapshot_table").option("path", path)
    for k, v in opts.items():
        reader = reader.option(k, v)
    q = (
        reader.load().writeStream.format("memory").queryName(name)
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    return spark.table(name)


def test_streams_all_versions_then_only_new_ones(registered, tmp_path):
    from harmony_energy_data_pipeline_spark.streaming.incremental import (
        start_snapshot_append_sink,
    )

    spark = registered
    src, dst = str(tmp_path / "t"), str(tmp_path / "out")
    ckpt = str(tmp_path / "ck")
    _write(spark, src, 0, 100, "overwrite")
    _write(spark, src, 100, 250, "append")
    stream = (
        spark.readStream.format("snapshot_table").option("path", src).load()
    )
    q = start_snapshot_append_sink(stream, dst, ckpt, available_now=True)
    q.awaitTermination(120)
    assert snap.read_snapshot(spark, dst).count() == 250
    # new commits become the NEXT batch off the same checkpoint
    _write(spark, src, 250, 300, "append")
    q2 = start_snapshot_append_sink(stream, dst, ckpt, available_now=True)
    q2.awaitTermination(120)
    got = sorted(r.v for r in snap.read_snapshot(spark, dst).collect())
    assert got == list(range(300))  # exactly once, no replays


def test_rewrite_fails_resumed_stream_unless_skipped(registered, tmp_path):
    spark = registered
    path = str(tmp_path / "t")
    ck_f, ck_s = str(tmp_path / "ckf"), str(tmp_path / "cks")
    _write(spark, path, 0, 100, "overwrite")

    from harmony_energy_data_pipeline_spark.streaming.incremental import (
        start_snapshot_append_sink,
    )

    def drain(dst, ck, **opts):
        reader = spark.readStream.format("snapshot_table").option(
            "path", path
        )
        for k, v in opts.items():
            reader = reader.option(k, v)
        q = start_snapshot_append_sink(
            reader.load(), str(tmp_path / dst), ck, available_now=True
        )
        q.awaitTermination(120)
        return snap.read_snapshot(spark, str(tmp_path / dst))

    # both streams consume the initial snapshot first
    assert drain("out_f", ck_f).count() == 100
    assert drain("out_s", ck_s, skip_rewrites="true").count() == 100
    # a compaction lands mid-stream, then an append: compaction is
    # provably row-preserving (compacted_from marker), so even the
    # STRICT stream survives routine maintenance — no rows re-emitted,
    # the genuine append delivered
    snap.snapshot_compact(spark, path)
    _write(spark, path, 100, 150, "append")
    got_strict = drain("out_f", ck_f)
    assert sorted(r.v for r in got_strict.collect()) == list(range(150))
    got = drain("out_s", ck_s, skip_rewrites="true")
    assert sorted(r.v for r in got.collect()) == list(range(150))
    # a genuine row-level rewrite still fails the strict resume
    snap.snapshot_delete_where(spark, path, [("v", 0, 4)])
    _write(spark, path, 150, 160, "append")
    with pytest.raises(Exception, match="cannot express|skip_rewrites"):
        drain("out_f", ck_f)
    # skip_rewrites: the delete is not propagated, the append is
    got2 = drain("out_s", ck_s, skip_rewrites="true")
    assert sorted(r.v for r in got2.collect()) == list(range(160))


def test_starting_version_and_schema_evolution(registered, tmp_path):
    spark = registered
    path = str(tmp_path / "t")
    _write(spark, path, 0, 50, "overwrite")
    _write(spark, path, 50, 80, "append")
    # start after v0: only the second commit streams
    got = _drain(spark, path, "snapstream_sv", starting_version="0")
    assert sorted(r.v for r in got.collect()) == list(range(50, 80))
    # add-column append: old files stream the new column as null
    df = spark.range(80, 90).select(
        (F.col("id") % 5).alias("g"), F.col("id").alias("v"),
        F.lit("x").alias("tag"),
    ).coalesce(1)
    snap.snapshot_write(df, path, mode="append")
    got2 = _drain(spark, path, "snapstream_ev")
    rows = got2.collect()
    assert {r.tag for r in rows if r.v >= 80} == {"x"}
    assert all(r.tag is None for r in rows if r.v < 80)


def test_table_to_table_chain(registered, tmp_path):
    """The handoff shape: stream FROM one snapshot table INTO another
    via the exactly-once append sink, then verify content parity."""
    from harmony_energy_data_pipeline_spark.streaming.incremental import (
        start_snapshot_append_sink,
    )

    spark = registered
    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    ck = str(tmp_path / "ck")
    _write(spark, src, 0, 200, "overwrite")
    _write(spark, src, 200, 350, "append")
    stream = (
        spark.readStream.format("snapshot_table").option("path", src).load()
        .withColumn("v2", F.col("v") * 2)
    )
    q = start_snapshot_append_sink(stream, dst, ck, available_now=True)
    q.awaitTermination(120)
    out = snap.read_snapshot(spark, dst)
    assert out.count() == 350
    assert out.agg(F.sum("v2")).first()[0] == 2 * sum(range(350))


# --- change-feed mode (round 7 third wave) ----------------------------------


def test_change_stream_initial_snapshot_then_appends(registered, tmp_path):
    spark = registered
    path = str(tmp_path / "t")
    _write(spark, path, 0, 50, "overwrite")
    _write(spark, path, 50, 80, "append")
    got = _drain(spark, path, "cdfstream_init", read_changes="true")
    rows = got.collect()
    assert sorted(r.v for r in rows) == list(range(80))
    assert {r._change_type for r in rows} == {"insert"}
    # initial snapshot stamps the resolved version
    assert {r._commit_version for r in rows} == {1}


def test_change_stream_expresses_dv_mor_and_cdf_commits(
    registered, tmp_path
):
    spark = registered
    path = str(tmp_path / "t")
    _write(spark, path, 0, 100, "overwrite")          # v0
    snap.snapshot_delete_where_dv(spark, path, [("v", 10, 14)])   # v1
    snap.snapshot_update_where_dv(                      # v2
        spark, path, [("v", 20, 24)], {"g": F.lit(99).cast("long")}
    )
    snap.snapshot_delete_where(                         # v3 (COW + cdf)
        spark, path, [("v", 30, 34)], record_cdf=True
    )
    got = _drain(
        spark, path, "cdfstream_ops",
        read_changes="true", starting_version="0",
    )
    rows = got.collect()
    by = {}
    for r in rows:
        by.setdefault((r._commit_version, r._change_type), []).append(r)
    assert sorted(r.v for r in by[(1, "delete")]) == list(range(10, 15))
    assert sorted(r.v for r in by[(2, "delete")]) == list(range(20, 25))
    ins2 = by[(2, "insert")]
    assert sorted(r.v for r in ins2) == list(range(20, 25))
    assert {r.g for r in ins2} == {99}                 # post-image
    assert sorted(r.v for r in by[(3, "delete")]) == list(range(30, 35))
    assert (3, "insert") not in by                     # delete-only cdf
    assert len(rows) == 5 + 10 + 5
    # a signed fold of the change stream reproduces the live state
    live = snap.read_snapshot(spark, path).count()
    signed = sum(1 if r._change_type == "insert" else -1 for r in rows)
    assert 100 + signed == live  # v2's 5+5 cancel; 10 net deletes


def test_change_stream_strict_on_cow_without_cdf(registered, tmp_path):
    spark = registered
    path = str(tmp_path / "t")
    _write(spark, path, 0, 50, "overwrite")
    snap.snapshot_delete_where(spark, path, [("v", 0, 4)])  # no cdf
    with pytest.raises(Exception, match="record_cdf|cannot express"):
        _drain(
            spark, path, "cdfstream_strict",
            read_changes="true", starting_version="0",
        )


# --- streaming upsert sink (foreachBatch MERGE) ------------------------------


def test_stream_upsert_sink_holds_current_aggregate(registered, tmp_path):
    from harmony_energy_data_pipeline_spark.streaming.incremental import (
        start_snapshot_upsert_sink,
    )

    spark = registered
    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    ck = str(tmp_path / "ck")
    _write(spark, src, 0, 100, "overwrite")

    def run_once():
        agg = (
            spark.readStream.format("snapshot_table").option("path", src)
            .load()
            .groupBy("g")
            .agg(F.count("*").alias("n"), F.sum("v").alias("s"))
        )
        q = start_snapshot_upsert_sink(
            agg, dst, ck, key="g", member_cols=["g"], available_now=True
        )
        q.awaitTermination(120)

    def truth():
        return {
            r.g: (r.n, r.s)
            for r in snap.read_snapshot(spark, src).groupBy("g").agg(
                F.count("*").alias("n"), F.sum("v").alias("s")
            ).collect()
        }

    run_once()
    got = {r.g: (r.n, r.s)
           for r in snap.read_snapshot(spark, dst).collect()}
    assert got == truth()
    # new source commits: the NEXT run off the same checkpoint merges
    # the updated aggregates — the table holds CURRENT values per key,
    # one row per key, never accumulated intermediates
    _write(spark, src, 100, 250, "append")
    run_once()
    got = {r.g: (r.n, r.s)
           for r in snap.read_snapshot(spark, dst).collect()}
    assert got == truth()
    assert snap.read_snapshot(spark, dst).count() == 5
    # the merge commits carry the query's exactly-once markers
    markers = snap.committed_marker_values(dst, "stream_commit_id")
    assert len(markers) >= 2


def test_stream_upsert_sink_is_idempotent_on_redelivery(
    registered, tmp_path
):
    from harmony_energy_data_pipeline_spark.streaming.incremental import (
        start_snapshot_upsert_sink,
    )

    spark = registered
    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    _write(spark, src, 0, 60, "overwrite")
    agg = (
        spark.readStream.format("snapshot_table").option("path", src)
        .load().groupBy("g").agg(F.sum("v").alias("s"))
    )
    # two DIFFERENT checkpoints deliver the same batch twice — the
    # keyed merge converges to the same state either way
    for ck in ("ckA", "ckB"):
        q = start_snapshot_upsert_sink(
            agg, dst, str(tmp_path / ck), key="g", available_now=True
        )
        q.awaitTermination(120)
    got = {r.g: r.s for r in snap.read_snapshot(spark, dst).collect()}
    exp = {
        r.g: r.s
        for r in snap.read_snapshot(spark, src).groupBy("g")
        .agg(F.sum("v").alias("s")).collect()
    }
    assert got == exp


def test_initial_snapshot_streams_mor_table_live_rows(registered, tmp_path):
    """A table carrying deletion vectors streams its LIVE rows in the
    initial snapshot — positions subtracted executor-side — with no
    compaction required first (previously refused)."""
    spark = registered
    path = str(tmp_path / "t")
    _write(spark, path, 0, 100, "overwrite")
    snap.snapshot_delete_where_dv(spark, path, [("v", 40, 59)])
    # plain mode
    got = _drain(spark, path, "morstream_plain")
    assert sorted(r.v for r in got.collect()) == [
        v for v in range(100) if not (40 <= v <= 59)
    ]
    # change mode: same live rows, stamped as inserts
    got2 = _drain(spark, path, "morstream_cdf", read_changes="true")
    rows = got2.collect()
    assert sorted(r.v for r in rows) == [
        v for v in range(100) if not (40 <= v <= 59)
    ]
    assert {r._change_type for r in rows} == {"insert"}


def test_starting_timestamp_tails_after_that_time(registered, tmp_path):
    import time as _t

    spark = registered
    path = str(tmp_path / "t")
    _write(spark, path, 0, 50, "overwrite")
    cut = _t.time()
    _t.sleep(1.1)  # commit stamps are whole seconds
    _write(spark, path, 50, 70, "append")
    got = _drain(
        spark, path, "snapstream_ts", starting_timestamp=str(cut)
    )
    assert sorted(r.v for r in got.collect()) == list(range(50, 70))
    with pytest.raises(Exception, match="not both"):
        _drain(spark, path, "snapstream_ts2",
               starting_timestamp=str(cut), starting_version="0")
