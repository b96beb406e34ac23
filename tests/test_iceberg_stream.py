"""Streaming source over an Iceberg metadata tree
(sources/icebergstream.py) — the Delta stream's wire-format twin."""

from __future__ import annotations

import tempfile

import pytest
from pyspark.sql import functions as F

from harmony_energy_data_pipeline_spark.sources import iceberg as ice
from harmony_energy_data_pipeline_spark.sources.icebergstream import (
    IcebergTableDataSource,
)


def _tmp():
    return tempfile.mkdtemp(prefix="istream_") + "/t"


def _df(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id").alias("k"),
        F.concat(F.lit("v"), F.col("id")).alias("s"),
    )


@pytest.fixture(autouse=True)
def _register(spark):
    spark.dataSource.register(IcebergTableDataSource)


def _drain(spark, t, name, ckpt, **opts):
    reader = spark.readStream.format("iceberg_table").option("path", t)
    for k, v in opts.items():
        reader = reader.option(k, v)
    q = (
        reader.load().writeStream.format("memory").queryName(name)
        .option("checkpointLocation", ckpt)
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    return spark.table(name)


def _drain_file(spark, t, out_dir, ckpt, **opts):
    """Parquet-sink drain: checkpoint restarts need a fault-tolerant
    sink (the memory sink refuses recovery)."""
    reader = spark.readStream.format("iceberg_table").option("path", t)
    for k, v in opts.items():
        reader = reader.option(k, v)
    q = (
        reader.load().writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    return spark.read.parquet(out_dir)


def test_initial_snapshot_then_tail(spark, tmp_path):
    t = _tmp()
    out, ck = str(tmp_path / "out1"), str(tmp_path / "c1")
    ice.write_iceberg(_df(spark, 0, 50), t)
    got = _drain_file(spark, t, out, ck)
    assert got.count() == 50
    # two appends land while the stream is down; the next drain
    # delivers exactly the appended rows through the SAME checkpoint
    ice.write_iceberg(_df(spark, 50, 70), t, mode="append")
    ice.write_iceberg(_df(spark, 70, 80), t, mode="append")
    got = _drain_file(spark, t, out, ck)
    assert got.count() == 80
    assert {r.k for r in got.collect()} == set(range(80))


def test_starting_sequence_skips_snapshot(spark, tmp_path):
    t = _tmp()
    ice.write_iceberg(_df(spark, 0, 40), t)
    meta = ice.table_metadata(t)
    seq = meta["last-sequence-number"]
    ice.write_iceberg(_df(spark, 40, 55), t, mode="append")
    got = _drain(spark, t, "ist2", str(tmp_path / "c2"),
                 starting_sequence=str(seq))
    assert {r.k for r in got.collect()} == set(range(40, 55))


def test_overwrite_fails_unless_ignored(spark, tmp_path):
    t = _tmp()
    out, ck = str(tmp_path / "out3"), str(tmp_path / "c3")
    ice.write_iceberg(_df(spark, 0, 20), t)
    _drain_file(spark, t, out, ck)
    ice.write_iceberg(_df(spark, 100, 110), t, mode="overwrite")
    from pyspark.errors.exceptions.captured import StreamingQueryException

    with pytest.raises(StreamingQueryException, match="append stream"):
        _drain_file(spark, t, out, ck)
    # ignore_deletes: the overwrite's adds stream, the removal skips
    got = _drain(spark, t, "ist4", str(tmp_path / "c4"),
                 starting_sequence="1", ignore_deletes="true")
    assert {r.k for r in got.collect()} == set(range(100, 110))


def test_initial_snapshot_with_pos_deletes_masks(spark, tmp_path):
    """Position deletes MASK executor-side in the initial snapshot
    (round 12 — the Delta stream's DV-masked shape; previously this
    refused)."""
    t = _tmp()
    ice.write_iceberg(_df(spark, 0, 30).coalesce(1), t)
    data, _ = ice.live_files(t)
    ice.write_position_deletes(spark, t, [(data[0]["file_path"], 0)])
    got = _drain(spark, t, "ist5", str(tmp_path / "c5"))
    assert {r.k for r in got.collect()} == set(range(1, 30))
