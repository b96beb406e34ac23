"""Streaming source over a Delta-format log (sources/deltastream.py)."""

from __future__ import annotations

import tempfile

import pytest
from pyspark.sql import functions as F

from harmony_energy_data_pipeline_spark.sources import deltalake as dl
from harmony_energy_data_pipeline_spark.sources.deltastream import (
    DeltaTableDataSource,
)


def _tmp():
    return tempfile.mkdtemp(prefix="dstream_") + "/t"


def _df(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id").alias("k"),
        (F.col("id") % 3).cast("int").alias("p"),
        F.concat(F.lit("v"), F.col("id")).alias("s"),
    )


@pytest.fixture(autouse=True)
def _register(spark):
    spark.dataSource.register(DeltaTableDataSource)


def _drain(spark, t, name, ckpt, **opts):
    reader = spark.readStream.format("delta_table").option("path", t)
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
    """Parquet-sink drain: the fault-tolerant sink checkpoint restarts
    need (the memory sink refuses recovery)."""
    reader = spark.readStream.format("delta_table").option("path", t)
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
    dl.write_delta(_df(spark, 0, 40), t, partition_by=["p"])
    dl.write_delta(_df(spark, 40, 60), t, mode="append",
                   partition_by=["p"])
    ck = str(tmp_path / "ck")
    out = str(tmp_path / "out")
    got = _drain_file(spark, t, out, ck)
    assert sorted(r["k"] for r in got.collect()) == list(range(60))
    # partition column reconstructed from add.partitionValues
    assert got.filter("p = 1").count() == 20
    # a foreign-ish append lands; restart resumes from the checkpoint:
    # only the NEW commit's rows land in the sink's second batch
    dl.write_delta(_df(spark, 60, 70), t, mode="append",
                   partition_by=["p"])
    got2 = _drain_file(spark, t, out, ck)
    assert sorted(r["k"] for r in got2.collect()) == list(range(70))


def test_starting_version_skips_snapshot(spark, tmp_path):
    t = _tmp()
    dl.write_delta(_df(spark, 0, 40), t)
    dl.write_delta(_df(spark, 40, 50), t, mode="append")
    got = _drain(spark, t, "ds3", str(tmp_path / "ck"),
                 starting_version="0")
    assert sorted(r["k"] for r in got.collect()) == list(range(40, 50))


def test_remove_fails_unless_ignored(spark, tmp_path):
    t = _tmp()
    dl.write_delta(_df(spark, 0, 10), t)
    ck = str(tmp_path / "ck")
    out = str(tmp_path / "out")
    _drain_file(spark, t, out, ck)
    dl.write_delta(_df(spark, 100, 105), t)  # overwrite: removes
    with pytest.raises(Exception, match="removes files|Stream"):
        _drain_file(spark, t, out, ck)
    # ignore_deletes streams the overwrite's adds, skips its removes
    got = _drain(spark, t, "ds6", str(tmp_path / "ck2"),
                 starting_version="0", ignore_deletes="true")
    assert sorted(r["k"] for r in got.collect()) == list(range(100, 105))
