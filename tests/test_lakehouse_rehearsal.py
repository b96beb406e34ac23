"""Capstone rehearsal: the lakehouse features composed as one
lifecycle — constrained ingest with zone maps and sketches, audited
append, key-scoped merge, targeted delete, clustered compaction,
incremental view, retention — with the final state checked against a
from-scratch recompute at every step that changes data."""
from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from harmony_energy_data_pipeline_spark.io import load_table
from harmony_energy_data_pipeline_spark.pipeline import ivm
from harmony_energy_data_pipeline_spark.sinks import snapshots as snap


def _digest(df):
    row = df.agg(
        F.count("*").alias("n"),
        F.sum(F.round(F.col("value") * 100).cast("long")).alias("vc"),
        F.expr("bit_xor(event_id)").alias("x"),
    ).first()
    return (row.n, row.vc, row.x)


def test_lakehouse_lifecycle(spark, sf_dir, tmp_path):
    ev = load_table(spark, "events", sf_dir).select(
        "event_id", "ts", "event_type", "value"
    )
    table = str(tmp_path / "lake")
    view = str(tmp_path / "view")

    # 1. constrained, stats/sketch-tracked initial commit
    first_half = ev.filter(F.col("event_id") % 2 == 0)
    snap.snapshot_write(
        first_half.repartitionByRange(4, "ts").sortWithinPartitions("ts"),
        table, stats_cols=["ts"], member_cols=["event_type"],
        constraints=["value IS NULL OR value > -1e15", "event_id IS NOT NULL"],
    )
    mirror = first_half

    # 2. audited append of the second half (WAP)
    second_half = ev.filter(F.col("event_id") % 2 == 1)
    snap.snapshot_write_audited(
        second_half, table, mode="append",
        audits={
            "keys_unique": lambda d: d.count()
            == d.select("event_id").distinct().count(),
        },
        stats_cols=["ts"],
    )
    mirror = mirror.unionByName(second_half)
    assert _digest(snap.read_snapshot(spark, table)) == _digest(mirror)

    # 3. incremental view over the append chain
    ivm.refresh_agg_view(spark, table, view, ["event_type"], [])
    got = {r.event_type: r.n for r in ivm.read_view(spark, view).collect()}
    want = {
        r.event_type: r.n
        for r in mirror.groupBy("event_type").agg(F.count("*").alias("n")).collect()
    }
    assert got == want

    # 4. key-scoped merge: revise 20 events (value x10)
    revised = ev.filter(F.col("event_id") % 500 == 0).withColumn(
        "value", F.col("value") * 10
    )
    snap.snapshot_merge_into(spark, table, revised, key="event_id")
    mirror = (
        mirror.join(revised.select("event_id"), "event_id", "left_anti")
        .unionByName(revised)
    )
    assert _digest(snap.read_snapshot(spark, table)) == _digest(mirror)

    # 5. targeted delete of one day (the zone maps scope the rewrite)
    lo, hi = dt.datetime(2024, 1, 3), dt.datetime(2024, 1, 4)
    snap.snapshot_delete_where(spark, table, [("ts", lo, hi)])
    cond = (F.col("ts") >= F.lit(lo)) & (F.col("ts") <= F.lit(hi))
    mirror = mirror.filter(~cond)
    assert _digest(snap.read_snapshot(spark, table)) == _digest(mirror)

    # 6. clustered compaction: content identical, still prunable
    snap.snapshot_compact(spark, table, target_file_mb=1, cluster_by=["ts"])
    assert _digest(snap.read_snapshot(spark, table)) == _digest(mirror)
    info = snap.snapshot_table_info(table)
    assert info["stats_coverage"].get("ts") == 1.0
    assert info["constraints"]  # survived every rewrite

    # 7. pruned window read equals the filtered mirror
    w0, w1 = dt.datetime(2024, 1, 10), dt.datetime(2024, 1, 12)
    wcond = (F.col("ts") >= F.lit(w0)) & (F.col("ts") <= F.lit(w1))
    assert _digest(
        snap.read_snapshot(spark, table, where=[("ts", w0, w1)])
    ) == _digest(mirror.filter(wcond))

    # 8. view refresh sees the overwrites via full-recompute fallback
    ivm.refresh_agg_view(spark, table, view, ["event_type"], [])
    got = {r.event_type: r.n for r in ivm.read_view(spark, view).collect()}
    want = {
        r.event_type: r.n
        for r in mirror.groupBy("event_type")
        .agg(F.count("*").alias("n")).collect()
    }
    assert got == want

    # 9. retention: expire history, latest still exact
    snap.vacuum(table, keep_last=1, orphan_grace_s=0.0)
    assert _digest(snap.read_snapshot(spark, table)) == _digest(mirror)
