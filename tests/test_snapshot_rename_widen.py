"""Schema evolution breadth (round 8): RENAME via name-lineage column
mapping (metadata-only, dual-lookup reads) and lossless TYPE WIDENING
(metadata-only or append-time; old files read upcast)."""
from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from harmony_energy_data_pipeline_spark.sinks import snapshots as snap


def _df(spark, lo, hi, kcol="k"):
    return spark.range(lo, hi).select(
        F.col("id").alias(kcol), (F.col("id") % 5).alias("g"),
        (F.col("id") * 2).cast("int").alias("v"),
    )


def test_rename_is_metadata_only_and_reads_both_eras(spark, tmp_path):
    path = str(tmp_path / "t")
    snap.snapshot_write(_df(spark, 0, 50).coalesce(1), path,
                        stats_cols=["k"])
    v = snap.snapshot_rename_column(path, "k", "key")
    raw = snap._read_manifest_raw(path, v)
    assert raw.get("adds") == [] and raw["ddl"] == "rename_column"
    got = snap.read_snapshot(spark, path)
    assert got.columns == ["key", "g", "v"]
    assert sorted(r.key for r in got.collect()) == list(range(50))
    # an append AFTER the rename writes the NEW name; both eras read
    snap.snapshot_write(
        _df(spark, 50, 80, kcol="key").coalesce(1), path, mode="append",
        stats_cols=["key"],
    )
    got = snap.read_snapshot(spark, path)
    assert sorted(r.key for r in got.collect()) == list(range(80))
    # pruning on the renamed column maps the lineage (old files'
    # stats were recorded under 'k')
    kept, total = snap.prune_files(path, [("key", 0, 49)])
    assert total == 2 and len(kept) == 1
    assert snap.read_snapshot(
        spark, path, where=[("key", 10, 20)]
    ).count() == 11


def test_rename_collision_guards(spark, tmp_path):
    path = str(tmp_path / "t")
    snap.snapshot_write(_df(spark, 0, 10), path)
    with pytest.raises(snap.SchemaEvolutionError, match="name history"):
        snap.snapshot_rename_column(path, "k", "g")  # live name
    snap.snapshot_rename_column(path, "k", "key")
    with pytest.raises(snap.SchemaEvolutionError, match="name history"):
        snap.snapshot_rename_column(path, "g", "k")  # historical name
    with pytest.raises(snap.SchemaEvolutionError, match="former name"):
        snap.snapshot_add_column(path, "k", "long")  # add on lineage
    with pytest.raises(snap.SchemaEvolutionError, match="no column"):
        snap.snapshot_rename_column(path, "k", "k2")  # old name gone
    # chain: key -> kk keeps the full lineage readable
    snap.snapshot_rename_column(path, "key", "kk")
    got = snap.read_snapshot(spark, path)
    assert "kk" in got.columns
    assert sorted(r.kk for r in got.collect()) == list(range(10))


def test_rename_append_with_old_name_maps_to_lineage(spark, tmp_path):
    path = str(tmp_path / "t")
    snap.snapshot_write(_df(spark, 0, 20).coalesce(1), path)
    snap.snapshot_rename_column(path, "k", "key")
    # a producer still writing the OLD name appends into the lineage,
    # not a new column
    snap.snapshot_write(_df(spark, 20, 30).coalesce(1), path,
                        mode="append")
    got = snap.read_snapshot(spark, path)
    assert got.columns == ["key", "g", "v"]
    assert sorted(r.key for r in got.collect()) == list(range(30))


def test_widen_column_metadata_only(spark, tmp_path):
    path = str(tmp_path / "t")
    snap.snapshot_write(_df(spark, 0, 30).coalesce(1), path)  # v int
    snap.snapshot_widen_column(path, "v", "long")
    got = snap.read_snapshot(spark, path)
    assert dict(got.dtypes)["v"] == "bigint"
    assert sorted(r.v for r in got.collect()) == [i * 2 for i in range(30)]
    # post-widen appends carry long natively; old int files upcast
    snap.snapshot_write(
        spark.range(30, 40).select(
            F.col("id").alias("k"), (F.col("id") % 5).alias("g"),
            (F.col("id") * 2).cast("long").alias("v"),
        ).coalesce(1), path, mode="append",
    )
    assert snap.read_snapshot(spark, path).count() == 40
    with pytest.raises(snap.SchemaEvolutionError, match="lossless"):
        snap.snapshot_widen_column(path, "v", "int")  # narrowing
    with pytest.raises(snap.SchemaEvolutionError, match="lossless"):
        snap.snapshot_widen_column(path, "v", "string")


def test_append_time_widening(spark, tmp_path):
    path = str(tmp_path / "t")
    snap.snapshot_write(_df(spark, 0, 20).coalesce(1), path)  # v int
    # wider batch widens the table column
    snap.snapshot_write(
        spark.range(20, 30).select(
            F.col("id").alias("k"), (F.col("id") % 5).alias("g"),
            (F.col("id") * 2).cast("long").alias("v"),
        ).coalesce(1), path, mode="append",
    )
    got = snap.read_snapshot(spark, path)
    assert dict(got.dtypes)["v"] == "bigint" and got.count() == 30
    # narrower batch keeps the table type
    snap.snapshot_write(
        spark.range(30, 35).select(
            F.col("id").alias("k"), (F.col("id") % 5).alias("g"),
            (F.col("id") * 2).cast("int").alias("v"),
        ).coalesce(1), path, mode="append",
    )
    got = snap.read_snapshot(spark, path)
    assert dict(got.dtypes)["v"] == "bigint" and got.count() == 35
    # incompatible change still raises
    with pytest.raises(snap.SchemaEvolutionError):
        snap.snapshot_write(
            spark.range(0, 5).select(
                F.col("id").alias("k"), (F.col("id") % 5).alias("g"),
                F.lit("x").alias("v"),
            ), path, mode="append",
        )


def test_rename_partition_column(spark, tmp_path):
    path = str(tmp_path / "t")
    snap.snapshot_write(_df(spark, 0, 40), path, partition_by=["g"])
    snap.snapshot_rename_column(path, "g", "grp")
    m = snap._read_manifest(path, snap.latest_version(path))
    assert m["partition_cols"] == ["grp"]
    got = snap.read_snapshot(spark, path)
    rows = {r.k: r.grp for r in got.collect()}
    assert all(rows[k] == k % 5 for k in range(40))
    # pruning on the renamed partition col still hits old segments
    kept, total = snap.prune_files(path, [("grp", 2, 2)])
    assert kept and all("/g=2/" in f for f in kept)
    assert snap.read_snapshot(
        spark, path, where=[("grp", 2, 2)]
    ).count() == 8
    # post-rename partitioned append writes the new segment name
    snap.snapshot_write(
        spark.range(40, 50).select(
            F.col("id").alias("k"), (F.col("id") % 5).alias("grp"),
            (F.col("id") * 2).cast("int").alias("v"),
        ), path, mode="append", partition_by=["grp"],
    )
    kept2, _ = snap.prune_files(path, [("grp", 2, 2)])
    assert any("/grp=2/" in f for f in kept2)
    assert snap.read_snapshot(
        spark, path, where=[("grp", 2, 2)]
    ).count() == 10


def test_rename_then_dv_delete_and_feed(spark, tmp_path):
    path = str(tmp_path / "t")
    snap.snapshot_write(_df(spark, 0, 50).coalesce(2), path,
                        stats_cols=["k"])
    snap.snapshot_rename_column(path, "k", "key")
    v = snap.snapshot_delete_where_dv(spark, path, [("key", 0, 4)])
    assert snap.read_snapshot(spark, path).count() == 45
    feed = snap.read_snapshot_changes_feed(spark, path, 0, v)
    dels = sorted(
        r.key for r in feed.collect() if r._change_type == "delete"
    )
    assert dels == [0, 1, 2, 3, 4]


def test_rename_refused_with_constraints(spark, tmp_path):
    path = str(tmp_path / "t")
    snap.snapshot_write(_df(spark, 0, 10), path, constraints=["k >= 0"])
    with pytest.raises(snap.SchemaEvolutionError, match="constraint"):
        snap.snapshot_rename_column(path, "k", "key")


def test_rename_and_widen_through_stream(spark, tmp_path):
    from harmony_energy_data_pipeline_spark.sources.snapstream import (
        SnapshotTableDataSource,
    )

    spark.dataSource.register(SnapshotTableDataSource)
    path = str(tmp_path / "t")
    snap.snapshot_write(_df(spark, 0, 20).coalesce(1), path)
    snap.snapshot_rename_column(path, "k", "key")
    snap.snapshot_widen_column(path, "v", "long")
    q = (
        spark.readStream.format("snapshot_table").option("path", path)
        .load().writeStream.format("memory")
        .queryName("r8_rw_stream").outputMode("append")
        .trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = spark.table("r8_rw_stream")
    assert dict(got.dtypes)["v"] == "bigint"
    rows = {r.key: r.v for r in got.collect()}
    assert all(rows[k] == k * 2 for k in range(20))


def test_stats_agg_on_renamed_column(spark, tmp_path):
    path = str(tmp_path / "t")
    snap.snapshot_write(_df(spark, 0, 50).coalesce(1), path,
                        stats_cols=["k"])
    snap.snapshot_rename_column(path, "k", "key")
    agg = snap.snapshot_stats_agg(path, ["key"])
    assert agg["min"]["key"] == 0 and agg["max"]["key"] == 49
    assert agg["n_rows"] == 50


def test_append_with_both_lineage_names_raises(spark, tmp_path):
    path = str(tmp_path / "t")
    snap.snapshot_write(_df(spark, 0, 10).coalesce(1), path)
    snap.snapshot_rename_column(path, "k", "key")
    both = spark.range(10, 15).select(
        F.col("id").alias("k"), F.col("id").alias("key"),
        (F.col("id") % 5).alias("g"),
        (F.col("id") * 2).cast("int").alias("v"),
    )
    with pytest.raises(snap.SchemaEvolutionError, match="lineage"):
        snap.snapshot_write(both, path, mode="append")
    # the table is untouched by the refused commit
    assert snap.read_snapshot(spark, path).count() == 10
