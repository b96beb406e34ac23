"""Zone-map file statistics: commit-time collection, planning-time
pruning, conservatism, and survival through append/restore/compact."""
from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from harmony_energy_data_pipeline_spark.sinks import snapshots as snap


def _ranged(spark, lo, hi):
    """Rows id in [lo, hi) laid out so each file holds a tight,
    disjoint id range — the layout pruning exploits."""
    df = spark.range(lo, hi).select(
        F.col("id").alias("k"),
        (F.col("id") * 2).cast("double").alias("v"),
        F.concat(F.lit("u"), F.format_string("%05d", F.col("id"))).alias("s"),
    )
    return df.repartitionByRange(4, "k").sortWithinPartitions("k")


def test_stats_recorded_and_pruned(spark, tmp_path):
    path = str(tmp_path / "t")
    snap.snapshot_write(_ranged(spark, 0, 1000), path, stats_cols=["k", "s"])
    kept, total = snap.prune_files(path, [("k", 10, 20)])
    assert total == 4 and len(kept) == 1
    # pruned read == unpruned filter, exactly
    pruned = snap.read_snapshot(spark, path, where=[("k", 10, 20)])
    full = snap.read_snapshot(spark, path).filter(
        (F.col("k") >= 10) & (F.col("k") <= 20)
    )
    assert sorted(r.k for r in pruned.collect()) == sorted(
        r.k for r in full.collect()
    )
    # string-typed predicate prunes too
    kept_s, _ = snap.prune_files(path, [("s", "u00990", None)])
    assert len(kept_s) == 1
    # disjoint predicate: zero files, empty result, schema intact
    kept0, _ = snap.prune_files(path, [("k", 5000, None)])
    assert kept0 == []
    empty = snap.read_snapshot(spark, path, where=[("k", 5000, None)])
    assert empty.count() == 0
    assert set(empty.columns) == {"k", "v", "s"}


def test_append_merges_stats_and_unstated_column_kept(spark, tmp_path):
    path = str(tmp_path / "t")
    snap.snapshot_write(_ranged(spark, 0, 400), path, stats_cols=["k"])
    snap.snapshot_write(
        _ranged(spark, 400, 800), path, mode="append", stats_cols=["k"]
    )
    kept, total = snap.prune_files(path, [("k", 600, 650)])
    assert total == 8 and len(kept) == 1
    # column never given stats: every file kept (conservative)
    kept_v, total_v = snap.prune_files(path, [("v", 0.0, 1.0)])
    assert len(kept_v) == total_v
    # append WITHOUT stats_cols: parent stats still carry forward
    snap.snapshot_write(
        _ranged(spark, 800, 900), path, mode="append"
    )
    kept2, total2 = snap.prune_files(path, [("k", 0, 50)])
    assert total2 == 12
    # the 8 old files prune to 1; the 4 stat-less new ones all stay
    assert len(kept2) == 1 + 4


def test_all_null_column_is_unprunable(spark, tmp_path):
    path = str(tmp_path / "t")
    df = spark.range(0, 10).select(
        F.col("id").alias("k"), F.lit(None).cast("long").alias("n")
    )
    snap.snapshot_write(df.coalesce(1), path, stats_cols=["k", "n"])
    kept, total = snap.prune_files(path, [("n", 100, 200)])
    assert len(kept) == total == 1  # no min/max recorded -> kept


def test_timestamp_pruning(spark, tmp_path):
    path = str(tmp_path / "t")
    df = spark.range(0, 240).select(
        F.col("id").alias("k"),
        (F.lit(dt.datetime(2024, 1, 1)) + F.make_interval(
            hours=F.col("id").cast("int"))).alias("ts"),
    )
    snap.snapshot_write(
        df.repartitionByRange(4, "ts").sortWithinPartitions("ts"),
        path, stats_cols=["ts"],
    )
    lo, hi = dt.datetime(2024, 1, 3), dt.datetime(2024, 1, 3, 12)
    kept, total = snap.prune_files(path, [("ts", lo, hi)])
    # a 12h window over a 10-day table: at most 2 of the 4 range-laid
    # files can straddle it (sampled partitioner bounds are inexact)
    assert total == 4 and 1 <= len(kept) <= 2
    got = snap.read_snapshot(spark, path, where=[("ts", lo, hi)])
    want = snap.read_snapshot(spark, path).filter(
        (F.col("ts") >= F.lit(lo)) & (F.col("ts") <= F.lit(hi))
    )
    assert sorted(r.k for r in got.collect()) == sorted(
        r.k for r in want.collect()
    )


def test_stats_survive_restore_and_compact(spark, tmp_path):
    path = str(tmp_path / "t")
    snap.snapshot_write(_ranged(spark, 0, 1000), path, stats_cols=["k"])
    snap.snapshot_write(
        _ranged(spark, 1000, 2000), path, mode="append", stats_cols=["k"]
    )
    # restore back to v0: v0's stats come along
    snap.snapshot_restore(path, 0)
    kept, total = snap.prune_files(path, [("k", 0, 10)])
    assert total == 4 and len(kept) == 1
    # compact recomputes zone maps for the rewritten files
    snap.snapshot_compact(spark, path, target_file_mb=1)
    keptc, totalc = snap.prune_files(path, [("k", 0, 10)])
    assert len(keptc) <= totalc
    got = snap.read_snapshot(spark, path, where=[("k", 0, 10)])
    assert sorted(r.k for r in got.collect()) == list(range(0, 11))


def test_zorder_write_records_prunable_stats(spark, tmp_path):
    """Layout and file skipping compose: a z-ordered table prunes on
    EITHER clustered dimension through the manifest zone maps."""
    from harmony_energy_data_pipeline_spark.sinks.layout import zorder_write

    df = spark.range(0, 4096).select(
        (F.col("id") % 64).alias("x"), (F.col("id") / 64).cast("long").alias("y")
    )
    path = str(tmp_path / "z")
    zorder_write(df, ["x", "y"], path, bits=6, num_partitions=8)
    kept_x, total = snap.prune_files(path, [("x", 0, 3)])
    kept_y, _ = snap.prune_files(path, [("y", 0, 3)])
    assert total == 8
    assert len(kept_x) < total and len(kept_y) < total
    got = snap.read_snapshot(spark, path, where=[("x", 0, 3)])
    assert got.count() == 4 * 64  # 4 x-values, 64 rows each


def test_streaming_sink_records_stats(spark, tmp_path, sf_dir):
    """A streamed event table stays prunable: each micro-batch append
    records zone maps for its own files, and a time-window read skips
    the batches whose event_id range cannot match."""
    from harmony_energy_data_pipeline_spark.io import load_table
    from harmony_energy_data_pipeline_spark.streaming.incremental import (
        file_stream,
        start_snapshot_append_sink,
    )

    ev = load_table(spark, "events", sf_dir).select("event_id", "value")
    n = ev.count()
    src = str(tmp_path / "src")
    # four id-disjoint piles -> four micro-batches with tight ranges
    for i in range(4):
        ev.filter(
            (F.col("event_id") >= i * n / 4) & (F.col("event_id") < (i + 1) * n / 4)
        ).coalesce(1).write.mode("append").parquet(src)
    schema = spark.read.parquet(src).schema
    table = str(tmp_path / "tbl")
    q = start_snapshot_append_sink(
        file_stream(spark, src, schema, max_files_per_trigger=1),
        table, str(tmp_path / "ckpt"),
        stats_cols=["event_id"],
    )
    q.awaitTermination(120)
    kept, total = snap.prune_files(table, [("event_id", 0, int(n / 4) - 1)])
    assert total >= 4 and len(kept) < total
    got = snap.read_snapshot(
        spark, table, where=[("event_id", 0, int(n / 4) - 1)]
    ).count()
    want = ev.filter(F.col("event_id") <= n / 4 - 1).count()
    assert got == want


def test_table_info_reports_prunability(spark, tmp_path):
    path = str(tmp_path / "t")
    snap.snapshot_write(
        _ranged(spark, 0, 400), path, stats_cols=["k"],
        constraints=["k >= 0"],
    )
    snap.snapshot_write(
        _ranged(spark, 400, 800), path, mode="append",
        stats_cols=["k"], member_cols=["s"],
    )
    info = snap.snapshot_table_info(path)
    assert info["version"] == 1 and info["versions"] == 2
    assert info["n_files"] == 8 and info["total_bytes"] > 0
    assert info["has_schema"] and info["constraints"] == ["k >= 0"]
    assert info["stats_coverage"]["k"] == 1.0  # every live file mapped
    assert 0 < info["member_coverage"]["s"] <= 0.5  # second commit only


def test_clustered_compaction_preserves_prunability(spark, tmp_path):
    """Default coalesce-compaction merges arbitrary files and widens
    their zone maps; cluster_by compaction keeps ranges tight."""
    path = str(tmp_path / "t")
    # 6 appends arriving unsorted in k, as a streaming sink would;
    # payload pads files past the 1 MB compaction target so the
    # rewrite produces several output files
    for i in range(6):
        batch = spark.range(i, 120_000, 6).select(
            F.col("id").alias("k"),
            F.sha2(F.col("id").cast("string"), 256).alias("pad"),
        )
        snap.snapshot_write(
            batch.coalesce(1), path,
            mode="append" if i else "overwrite", stats_cols=["k"],
        )
    kept_pre, total_pre = snap.prune_files(path, [("k", 0, 100)])
    assert len(kept_pre) == total_pre == 6  # every file spans the domain
    snap.snapshot_compact(spark, path, target_file_mb=1, cluster_by=["k"])
    kept_post, total_post = snap.prune_files(path, [("k", 0, 100)])
    assert total_post >= 2 and len(kept_post) < total_post  # tight again
    got = snap.read_snapshot(spark, path, where=[("k", 0, 100)])
    assert got.count() == 101


def test_backfill_makes_legacy_table_prunable(spark, tmp_path):
    """A table written with NO stats gains zone maps and sketches via
    a metadata-only commit: same files, empty CDC delta, pruning on."""
    path = str(tmp_path / "t")
    snap.snapshot_write(_ranged(spark, 0, 500), path)  # no tracking
    snap.snapshot_write(_ranged(spark, 500, 1000), path, mode="append")
    kept0, total0 = snap.prune_files(path, [("k", 0, 10)])
    assert len(kept0) == total0  # nothing prunable yet
    v = snap.snapshot_backfill_stats(
        spark, path, stats_cols=["k"], member_cols=["s"],
    )
    m = snap._read_manifest(path, v)
    assert m["operation"] == "append"
    assert m["files"] == snap._read_manifest(path, v - 1)["files"]
    # zone maps prune now; membership sketch answers point lookups
    kept1, total1 = snap.prune_files(path, [("k", 0, 10)])
    assert len(kept1) < total1
    keptm, _ = snap.prune_files(path, [("s", "u00007", "u00007")])
    assert len(keptm) < total1
    # CDC across the backfill: EMPTY delta, not a rewrite
    delta = snap.read_snapshot_changes(spark, path, v - 1, v)
    assert delta.count() == 0
    # content untouched, pruned read exact
    got = snap.read_snapshot(spark, path, where=[("k", 0, 10)])
    assert sorted(r.k for r in got.collect()) == list(range(0, 11))
    info = snap.snapshot_table_info(path)
    assert info["stats_coverage"]["k"] == 1.0
    assert info["member_coverage"]["s"] == 1.0


def test_pruned_read_plans_fewer_input_files(spark, tmp_path):
    """Plan-level pin: where= pruning changes the SCAN's file list
    (inputFiles), not just the result — the planning-time skip is
    real, not a post-scan filter."""
    path = str(tmp_path / "t")
    snap.snapshot_write(_ranged(spark, 0, 1000), path, stats_cols=["k"])
    full = snap.read_snapshot(spark, path)
    pruned = snap.read_snapshot(spark, path, where=[("k", 10, 20)])
    assert len(full.inputFiles()) == 4
    assert len(pruned.inputFiles()) == 1
