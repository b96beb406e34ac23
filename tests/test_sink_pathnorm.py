"""Relative-path contract over the sink surface (VERDICT r3 item 9).

Every public sink API must normalize a caller-supplied RELATIVE path
to absolute at entry: the swap/manifest protocols re-resolve recorded
locations later (recovery, vacuum, readers) — possibly from another
working directory — and a raw relative path would silently point each
phase somewhere different (round 3's vacuum data-loss bug was this
class). The test writes through each sink with a relative path from
cwd A, then reads/maintains from cwd B and asserts the SAME table.
"""
from __future__ import annotations

import os

import pytest

from pyspark.sql import functions as F


def _df(spark, n=20):
    return spark.range(n).select(
        F.col("id").alias("_id"),
        (F.col("id") * 2).alias("v"),
        F.to_timestamp(
            F.concat(F.lit("2024-01-0"), (F.col("id") % 5 + 1).cast("string"))
        ).alias("DATETIME"),
    )


def _write_upsert(spark, rel):
    from harmony_energy_data_pipeline_spark.sinks.upsert import upsert_parquet

    upsert_parquet(spark, _df(spark), rel, key="_id")


def _read_upsert(spark, abspath):
    return spark.read.parquet(abspath).count()


def _write_partitioned(spark, rel):
    from harmony_energy_data_pipeline_spark.sinks.upsert import upsert_partitioned

    upsert_partitioned(spark, _df(spark), rel, key="_id")


def _read_partitioned(spark, abspath):
    from harmony_energy_data_pipeline_spark.sinks.partitioned import (
        read_partitioned_committed,
    )

    return read_partitioned_committed(spark, abspath).count()


def _write_snapshot(spark, rel):
    from harmony_energy_data_pipeline_spark.sinks.snapshots import snapshot_write

    snapshot_write(_df(spark), rel)


def _read_snapshot(spark, abspath):
    from harmony_energy_data_pipeline_spark.sinks.snapshots import (
        read_snapshot,
        vacuum,
    )

    n = read_snapshot(spark, abspath).count()
    vacuum(abspath, keep_last=1)  # maintenance from the other cwd too
    return read_snapshot(spark, abspath).count() if n else n


def _write_jsonl(spark, rel):
    from harmony_energy_data_pipeline_spark.sinks.export import write_jsonl_shards

    write_jsonl_shards(_df(spark), rel, n_shards=2, shard_key="_id")


def _read_jsonl(spark, abspath):
    from harmony_energy_data_pipeline_spark.sinks.export import jsonl_manifest

    return sum(e["n_records"] for e in jsonl_manifest(spark, abspath))


def _write_zorder(spark, rel):
    from harmony_energy_data_pipeline_spark.sinks.layout import zorder_write

    zorder_write(
        _df(spark).select("_id", "v"), ["_id", "v"], rel, bits=4,
        num_partitions=2,
    )


def _read_zorder(spark, abspath):
    from harmony_energy_data_pipeline_spark.sinks.layout import read_zorder

    return read_zorder(spark, abspath).count()


SINKS = [
    ("upsert_parquet", _write_upsert, _read_upsert),
    ("upsert_partitioned", _write_partitioned, _read_partitioned),
    ("snapshot_write", _write_snapshot, _read_snapshot),
    ("write_jsonl_shards", _write_jsonl, _read_jsonl),
    ("zorder_write", _write_zorder, _read_zorder),
]


@pytest.mark.parametrize("name,write,read", SINKS, ids=[s[0] for s in SINKS])
def test_sink_normalizes_relative_paths(spark, tmp_path, monkeypatch, name, write, read):
    write_cwd = tmp_path / "writer_cwd"
    other_cwd = tmp_path / "reader_cwd"
    write_cwd.mkdir()
    other_cwd.mkdir()
    monkeypatch.chdir(write_cwd)
    write(spark, "tbl_rel")  # RELATIVE path
    abspath = str(write_cwd / "tbl_rel")
    assert os.path.exists(abspath), f"{name} did not write under the writer cwd"
    monkeypatch.chdir(other_cwd)
    assert read(spark, abspath) == 20, f"{name} lost rows across a cwd change"
    # nothing leaked into the second cwd
    assert os.listdir(other_cwd) == []
