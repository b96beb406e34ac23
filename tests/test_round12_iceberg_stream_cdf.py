"""Iceberg CHANGELOG STREAMING (round 12) — the streaming twin of
``read_iceberg_changes`` and the Delta CDF stream's wire-format
mirror: ``option("read_change_feed", "true")`` adds ``_change_type``
/ ``_snapshot_id``; appends stream as inserts, position-delete
snapshots materialize the deleted rows, the MOR UPDATE expresses as
delete+insert, a full overwrite as delete-all+insert-all, compaction
(``replace``) is silent in BOTH modes.
"""

from __future__ import annotations

import tempfile

import pytest
from pyspark.sql import functions as F

from harmony_energy_data_pipeline_spark.sources import iceberg as ice
from harmony_energy_data_pipeline_spark.sources.icebergstream import (
    IcebergTableDataSource,
)


def _tmp():
    return tempfile.mkdtemp(prefix="iscdf_") + "/t"


def _df(spark, lo, hi):
    return spark.range(lo, hi).selectExpr(
        "id AS k", "CAST(id AS DOUBLE) AS v"
    )


@pytest.fixture(autouse=True)
def _register(spark):
    spark.dataSource.register(IcebergTableDataSource)


def _drain_file(spark, t, out_dir, ckpt, **opts):
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


def test_cdf_stream_append_delete_update(spark, tmp_path):
    t = _tmp()
    ice.write_iceberg(_df(spark, 0, 10), t)
    seq0 = ice.table_metadata(t)["last-sequence-number"]
    ice.write_iceberg(_df(spark, 10, 13), t, mode="append")
    ice.iceberg_delete_where(spark, t, "k = 4")
    ice.iceberg_update_where(spark, t, "k = 11", {"v": "-1.0"})
    got = _drain(spark, t, "iscdf1", str(tmp_path / "c1"),
                 read_change_feed="true",
                 starting_sequence=str(seq0))
    rows = sorted(
        (r.k, r.v, r._change_type) for r in got.collect()
    )
    assert rows == [
        (4, 4.0, "delete"),
        (10, 10.0, "insert"),
        (11, -1.0, "insert"),
        (11, 11.0, "delete"),
        (11, 11.0, "insert"),
        (12, 12.0, "insert"),
    ]
    # snapshot attribution: three change-carrying snapshots
    assert got.select("_snapshot_id").distinct().count() == 3


def test_cdf_stream_initial_snapshot_and_overwrite(spark, tmp_path):
    t = _tmp()
    ice.write_iceberg(_df(spark, 0, 6), t)
    ice.iceberg_delete_where(spark, t, "k = 0")
    # initial snapshot: live rows as inserts, deleted row masked
    ck, out = str(tmp_path / "c2"), str(tmp_path / "o2")
    got = _drain_file(spark, t, out, ck, read_change_feed="true")
    assert sorted(r.k for r in got.collect()) == [1, 2, 3, 4, 5]
    assert {r._change_type for r in got.collect()} == {"insert"}
    # a full overwrite through the SAME checkpoint: delete-all of
    # the 5 survivors + insert of the new set
    ice.write_iceberg(_df(spark, 100, 102), t, mode="overwrite")
    got = _drain_file(spark, t, out, ck, read_change_feed="true")
    dels = sorted(r.k for r in got.collect()
                  if r._change_type == "delete")
    ins = sorted(r.k for r in got.collect()
                 if r._change_type == "insert")
    assert dels == [1, 2, 3, 4, 5]
    assert ins == [1, 2, 3, 4, 5, 100, 101]


def test_cdf_stream_compaction_silent(spark, tmp_path):
    t = _tmp()
    ice.write_iceberg(_df(spark, 0, 8), t)
    ck, out = str(tmp_path / "c3"), str(tmp_path / "o3")
    got = _drain_file(spark, t, out, ck, read_change_feed="true")
    assert got.count() == 8
    ice.iceberg_delete_where(spark, t, "k < 2")
    ice.iceberg_compact(spark, t)
    ice.write_iceberg(_df(spark, 50, 52), t, mode="append")
    got = _drain_file(spark, t, out, ck, read_change_feed="true")
    # delete of 0,1 + two appended inserts; the compaction itself
    # contributes NOTHING
    tail = sorted(
        (r.k, r._change_type) for r in got.collect()
    )[-(2 + 2 + 8):]
    assert (0, "delete") in tail and (1, "delete") in tail
    assert (50, "insert") in tail and (51, "insert") in tail
    assert got.count() == 8 + 2 + 2


def test_plain_stream_skips_compaction(spark, tmp_path):
    t = _tmp()
    ice.write_iceberg(_df(spark, 0, 9), t)
    ck, out = str(tmp_path / "c4"), str(tmp_path / "o4")
    got = _drain_file(spark, t, out, ck)
    assert got.count() == 9
    ice.iceberg_compact(spark, t)
    ice.write_iceberg(_df(spark, 9, 12), t, mode="append")
    got = _drain_file(spark, t, out, ck)
    # compaction re-streams NOTHING (pre-fix: every row duplicated
    # under ignore_deletes, or the stream died)
    assert sorted(r.k for r in got.collect()) == list(range(12))


def test_cdf_stream_equality_deletes_refuse_or_skip(spark, tmp_path):
    t = _tmp()
    ice.write_iceberg(
        spark.range(0, 5).selectExpr(
            "id AS k", "CAST(id AS STRING) AS tag"
        ),
        t,
    )
    seq0 = ice.table_metadata(t)["last-sequence-number"]
    ice.write_equality_deletes(spark, t, [{"tag": "1"}], ["tag"])
    from pyspark.errors.exceptions.captured import (
        StreamingQueryException,
    )

    with pytest.raises(StreamingQueryException, match="EQUALITY"):
        _drain(spark, t, "iscdf5", str(tmp_path / "c5"),
               read_change_feed="true", starting_sequence=str(seq0))
    got = _drain(spark, t, "iscdf6", str(tmp_path / "c6"),
                 read_change_feed="true", starting_sequence=str(seq0),
                 skip_change_commits="true")
    assert got.count() == 0


def test_cdf_stream_resolves_renamed_columns(spark, tmp_path):
    t = _tmp()
    ice.write_iceberg(_df(spark, 0, 5), t)
    ice.iceberg_rename_column(t, "v", "val")
    seq0 = 0
    ice.iceberg_delete_where(spark, t, "val = 2.0")
    got = _drain(spark, t, "iscdf7", str(tmp_path / "c7"),
                 read_change_feed="true",
                 starting_sequence=str(seq0))
    rows = sorted(
        (r.k, r.val, r._change_type) for r in got.collect()
    )
    # pre-rename files stream under the NEW name, values intact
    assert (2, 2.0, "delete") in rows
    assert (3, 3.0, "insert") in rows
    assert not any(v is None for _k, v, _c in rows)
