"""Delta Lake wire-format interop (sources/deltalake.py): round trips
through our own writer, logs written BY HAND the way a foreign engine
would (including a classic parquet checkpoint), protocol gates, and
the native-snapshot export bridge."""

from __future__ import annotations

import json
import os
import tempfile

import pytest
from pyspark.sql import functions as F

from harmony_energy_data_pipeline_spark.sources import deltalake as dl


def _tmp():
    return tempfile.mkdtemp(prefix="delta_") + "/t"


def _df(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id").alias("k"),
        (F.col("id") % 3).cast("int").alias("p"),
        F.concat(F.lit("v"), F.col("id")).alias("s"),
    )


def _rows(df):
    return sorted((r["k"], r["p"], r["s"]) for r in df.collect())


def test_roundtrip_append_overwrite_timetravel(spark):
    t = _tmp()
    assert dl.write_delta(_df(spark, 0, 50), t) == 0
    assert dl.write_delta(_df(spark, 50, 80), t, mode="append") == 1
    got = dl.read_delta(spark, t)
    assert _rows(got) == _rows(_df(spark, 0, 80))
    # overwrite removes every previously-live file in one commit
    assert dl.write_delta(_df(spark, 100, 110), t) == 2
    assert _rows(dl.read_delta(spark, t)) == _rows(_df(spark, 100, 110))
    # time travel by replay
    assert _rows(dl.read_delta(spark, t, version=1)) == _rows(
        _df(spark, 0, 80))
    assert _rows(dl.read_delta(spark, t, version=0)) == _rows(
        _df(spark, 0, 50))
    hist = dl.delta_history(t)
    assert [h["version"] for h in hist] == [0, 1, 2]
    assert hist[1]["operationParameters"]["mode"] == "APPEND"


def test_partitioned_roundtrip_with_nulls(spark):
    t = _tmp()
    df = spark.createDataFrame(
        [(1, "a x", 1.5), (2, None, 2.5), (3, "a x", 3.5), (4, "b", 4.5)],
        "k long, part string, v double",
    )
    dl.write_delta(df, t, partition_by=["part"])
    got = dl.read_delta(spark, t)
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, df.collect()))
    # partition values ride add.partitionValues, not the data files
    with open(dl._log_path(t, 0), encoding="utf-8") as fh:
        adds = [json.loads(ln)["add"] for ln in fh if '"add"' in ln]
    assert {a["partitionValues"]["part"] for a in adds} == {"a x", "b", None}
    # appends must match the partition spec
    with pytest.raises(ValueError, match="partitioned by"):
        dl.write_delta(df, t, mode="append")


def test_append_schema_gate(spark):
    t = _tmp()
    dl.write_delta(_df(spark, 0, 5), t)
    other = spark.range(3).select(F.col("id").alias("zzz"))
    with pytest.raises(ValueError, match="schema differs"):
        dl.write_delta(other, t, mode="append")


def _foreign_file(dirpath, name, ids):
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(dirpath, exist_ok=True)
    pq.write_table(
        pa.table({"k": pa.array(ids, pa.int64()),
                  "s": pa.array([f"f{v}" for v in ids])}),
        os.path.join(dirpath, name),
    )


def test_reads_foreign_log_with_remove(spark):
    """A log laid out the way another engine writes it: files at the
    table root with arbitrary names, one later removed."""
    t = _tmp()
    _foreign_file(t, "zzz-001.snappy.parquet", [1, 2, 3])
    _foreign_file(t, "zzz-002.snappy.parquet", [4, 5])
    os.makedirs(os.path.join(t, "_delta_log"))
    schema = {"type": "struct", "fields": [
        {"name": "k", "type": "long", "nullable": True, "metadata": {}},
        {"name": "s", "type": "string", "nullable": True, "metadata": {}},
    ]}
    v0 = [
        {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}},
        {"metaData": {"id": "abc", "format": {"provider": "parquet",
                                              "options": {}},
                      "schemaString": json.dumps(schema),
                      "partitionColumns": [], "configuration": {},
                      "createdTime": 0}},
        {"add": {"path": "zzz-001.snappy.parquet", "partitionValues": {},
                 "size": 1, "modificationTime": 0, "dataChange": True}},
        {"add": {"path": "zzz-002.snappy.parquet", "partitionValues": {},
                 "size": 1, "modificationTime": 0, "dataChange": True}},
    ]
    v1 = [{"remove": {"path": "zzz-002.snappy.parquet",
                      "deletionTimestamp": 1, "dataChange": True}}]
    for v, acts in ((0, v0), (1, v1)):
        with open(dl._log_path(t, v), "w", encoding="utf-8") as fh:
            fh.write("\n".join(json.dumps(a) for a in acts))
    assert sorted(r["k"] for r in dl.read_delta(spark, t).collect()) == [
        1, 2, 3]
    assert sorted(
        r["k"] for r in dl.read_delta(spark, t, version=0).collect()
    ) == [1, 2, 3, 4, 5]


def test_reads_classic_checkpoint(spark):
    import pyarrow as pa
    import pyarrow.parquet as pq

    t = _tmp()
    _foreign_file(t, "a.parquet", [1, 2])
    _foreign_file(t, "b.parquet", [3])
    os.makedirs(os.path.join(t, "_delta_log"))
    schema = {"type": "struct", "fields": [
        {"name": "k", "type": "long", "nullable": True, "metadata": {}},
        {"name": "s", "type": "string", "nullable": True, "metadata": {}},
    ]}
    rows = [
        {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2},
         "metaData": None, "add": None, "remove": None},
        {"protocol": None,
         "metaData": {"id": "x", "schemaString": json.dumps(schema),
                      "partitionColumns": [], "createdTime": 0},
         "add": None, "remove": None},
        {"protocol": None, "metaData": None,
         "add": {"path": "a.parquet", "size": 1, "modificationTime": 0,
                 "dataChange": True},
         "remove": None},
    ]
    pq.write_table(
        pa.Table.from_pylist(rows),
        os.path.join(t, "_delta_log",
                     f"{0:020d}.checkpoint.parquet"),
    )
    with open(os.path.join(t, "_delta_log", "_last_checkpoint"), "w",
              encoding="utf-8") as fh:
        json.dump({"version": 0, "size": 3}, fh)
    # v0 json was checkpoint-cleaned away; v1 adds a second file
    with open(dl._log_path(t, 1), "w", encoding="utf-8") as fh:
        fh.write(json.dumps({"add": {
            "path": "b.parquet", "partitionValues": {}, "size": 1,
            "modificationTime": 0, "dataChange": True}}))
    assert sorted(r["k"] for r in dl.read_delta(spark, t).collect()) == [
        1, 2, 3]


def test_protocol_feature_gate(spark):
    t = _tmp()
    _foreign_file(t, "a.parquet", [1])
    os.makedirs(os.path.join(t, "_delta_log"))
    acts = [
        {"protocol": {"minReaderVersion": 3, "minWriterVersion": 7,
                      "readerFeatures": ["icebergCompatV3"]}},
        {"metaData": {"id": "x", "format": {"provider": "parquet",
                                            "options": {}},
                      "schemaString": json.dumps(
                          {"type": "struct", "fields": []}),
                      "partitionColumns": [], "configuration": {},
                      "createdTime": 0}},
    ]
    with open(dl._log_path(t, 0), "w", encoding="utf-8") as fh:
        fh.write("\n".join(json.dumps(a) for a in acts))
    with pytest.raises(dl.DeltaProtocolError, match="icebergCompatV3"):
        dl.read_delta(spark, t)


def test_snapshot_export_bridge(spark):
    from harmony_energy_data_pipeline_spark.sinks import snapshots as snap

    sp = _tmp()
    dp = _tmp()
    df = _df(spark, 0, 100)
    snap.snapshot_write(df, sp, stats_cols=["k"])
    snap.snapshot_delete_where_dv(spark, sp, [("k", 10, 19)])
    dl.snapshot_export_delta(spark, sp, dp)
    got = dl.read_delta(spark, dp)
    want = snap.read_snapshot(spark, sp)
    assert _rows(got) == _rows(want)
    assert got.count() == 90  # DVs applied in the exported state
    # re-export after another native commit: overwrite removes v0 files
    snap.snapshot_write(_df(spark, 500, 505), sp, mode="append")
    dl.snapshot_export_delta(spark, sp, dp)
    assert dl.read_delta(spark, dp).count() == 95
    assert dl.read_delta(spark, dp, version=0).count() == 90


def test_where_prunes_on_stats_and_partitions(spark):
    t = _tmp()
    df = _df(spark, 0, 300).orderBy("k").coalesce(1)
    # range-partition so per-file footer min/max are tight
    dl.write_delta(
        df.repartitionByRange(6, "k"), t, stats_cols=["k"],
        partition_by=["p"],
    )
    adds, meta, _p, _v = dl._replay(t, None)
    assert all(json.loads(a["stats"]).get("minValues") for a in adds)
    # stats pruning: a narrow k band keeps a strict subset of adds
    import pyspark.sql.types as T

    schema = T.StructType.fromJson(json.loads(meta["schemaString"]))
    ptypes = {f.name: f.dataType for f in schema.fields}
    kept = [a for a in adds
            if dl._add_matches(a, [("k", 10, 20)], ["p"], ptypes)]
    assert 0 < len(kept) < len(adds)
    got = dl.read_delta(spark, t, where=[("k", 10, 20)])
    assert sorted(r["k"] for r in got.collect()) == list(range(10, 21))
    # partition pruning: equality on p keeps only that partition's adds
    kept_p = [a for a in adds
              if dl._add_matches(a, [("p", 1, 1)], ["p"], ptypes)]
    assert all(a["partitionValues"]["p"] == "1" for a in kept_p)
    got_p = dl.read_delta(spark, t, where=[("p", 1, 1)])
    assert got_p.count() == 100
    # empty prune keeps the schema
    assert dl.read_delta(spark, t, where=[("k", 10_000, 20_000)]).count() == 0


def test_foreign_stats_prune(spark):
    """Stats written by a FOREIGN writer (hand-built JSON) prune."""
    t = _tmp()
    _foreign_file(t, "a.parquet", [1, 2, 3])
    _foreign_file(t, "b.parquet", [100, 200])
    os.makedirs(os.path.join(t, "_delta_log"))
    schema = {"type": "struct", "fields": [
        {"name": "k", "type": "long", "nullable": True, "metadata": {}},
        {"name": "s", "type": "string", "nullable": True, "metadata": {}},
    ]}
    acts = [
        {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}},
        {"metaData": {"id": "x", "format": {"provider": "parquet",
                                            "options": {}},
                      "schemaString": json.dumps(schema),
                      "partitionColumns": [], "configuration": {},
                      "createdTime": 0}},
        {"add": {"path": "a.parquet", "partitionValues": {}, "size": 1,
                 "modificationTime": 0, "dataChange": True,
                 "stats": json.dumps({"numRecords": 3,
                                      "minValues": {"k": 1},
                                      "maxValues": {"k": 3}})}},
        {"add": {"path": "b.parquet", "partitionValues": {}, "size": 1,
                 "modificationTime": 0, "dataChange": True,
                 "stats": json.dumps({"numRecords": 2,
                                      "minValues": {"k": 100},
                                      "maxValues": {"k": 200}})}},
    ]
    with open(dl._log_path(t, 0), "w", encoding="utf-8") as fh:
        fh.write("\n".join(json.dumps(a) for a in acts))
    adds, meta, _p, _v = dl._replay(t, None)
    kept = [a for a in adds if dl._add_matches(a, [("k", 1, 5)], [], {})]
    assert [a["path"] for a in kept] == ["a.parquet"]
    got = dl.read_delta(spark, t, where=[("k", 1, 5)])
    assert sorted(r["k"] for r in got.collect()) == [1, 2, 3]


def test_checkpoint_roundtrip_own_writer(spark):
    """write N commits → write a classic checkpoint → delete the
    checkpointed JSONs (as log cleanup would) → replay still exact,
    including partition values through the map-typed columns."""
    t = _tmp()
    df = spark.createDataFrame(
        [(1, "a", 1.0), (2, "b", 2.0), (3, "a", 3.0)],
        "k long, part string, v double",
    )
    dl.write_delta(df, t, partition_by=["part"], stats_cols=["k"])
    dl.write_delta(
        spark.createDataFrame([(9, "c", 9.0)],
                              "k long, part string, v double"),
        t, mode="append", partition_by=["part"],
    )
    v = dl.write_delta_checkpoint(t)
    assert v == 1
    for j in (0, 1):
        os.unlink(dl._log_path(t, j))
    dl.write_delta(
        spark.createDataFrame([(10, "a", 10.0)],
                              "k long, part string, v double"),
        t, mode="append", partition_by=["part"],
    )
    got = dl.read_delta(spark, t)
    assert sorted(r["k"] for r in got.collect()) == [1, 2, 3, 9, 10]
    assert got.filter("part = 'a'").count() == 3
    # stats survive the checkpoint → pruning still works
    assert dl.read_delta(spark, t, where=[("k", 1, 2)]).count() == 2


def test_delta_vacuum(spark):
    import pathlib

    t = _tmp()
    dl.write_delta(_df(spark, 0, 20), t)
    dl.write_delta(_df(spark, 20, 25), t)  # overwrite: v0 files removed
    # a crash orphan: staged parquet never referenced by any commit
    orphan = os.path.join(t, "part-orphan.parquet")
    pathlib.Path(orphan).write_bytes(b"not really parquet")
    old = time.time() - 100_000
    # age everything not live
    live = {a["path"] for a in dl._replay(t, None)[0]}
    for root, _d, names in os.walk(t):
        for n in names:
            fp = os.path.join(root, n)
            if n.endswith(".parquet") and \
                    os.path.relpath(fp, t) not in live and \
                    "_delta_log" not in fp:
                os.utime(fp, (old, old))
    dry = dl.delta_vacuum(t, retention_s=3600, dry_run=True)
    # tombstoned files are protected by their remove action's
    # deletionTimestamp (seconds old), NOT their own mtime — only the
    # never-committed orphan (no tombstone → mtime rule) is deletable
    assert dry == ["part-orphan.parquet"]
    # age the tombstones themselves: rewrite deletionTimestamp in the
    # overwrite commit, then the removed files expire
    import json as _json
    c1 = os.path.join(t, "_delta_log", f"{1:020d}.json")
    lines = []
    with open(c1) as fh:
        for line in fh:
            act = _json.loads(line)
            if "remove" in act:
                act["remove"]["deletionTimestamp"] = int(old * 1000)
            lines.append(_json.dumps(act))
    with open(c1, "w") as fh:
        fh.write("\n".join(lines) + "\n")
    dry = dl.delta_vacuum(t, retention_s=3600, dry_run=True)
    assert "part-orphan.parquet" in dry and len(dry) >= 2
    gone = dl.delta_vacuum(t, retention_s=3600)
    assert gone == dry
    assert not os.path.exists(orphan)
    # live state unharmed; expired versions are no longer readable
    assert dl.read_delta(spark, t).count() == 5
    # a fresh (in-retention) removed file would have been kept
    kept = dl.delta_vacuum(t, retention_s=3600, dry_run=True)
    assert kept == []


import time  # noqa: E402


def test_export_carries_partition_layout(spark):
    from harmony_energy_data_pipeline_spark.sinks import snapshots as snap

    sp, dp = _tmp(), _tmp()
    snap.snapshot_write(_df(spark, 0, 60), sp, partition_by=["p"],
                        stats_cols=["k"])
    dl.snapshot_export_delta(spark, sp, dp)
    adds, meta, _p, _v = dl._replay(dp, None)
    assert meta["partitionColumns"] == ["p"]
    assert {a["partitionValues"]["p"] for a in adds} == {"0", "1", "2"}
    got = dl.read_delta(spark, dp, where=[("p", 1, 1)])
    assert got.count() == 20
    assert _rows(dl.read_delta(spark, dp)) == _rows(
        snap.read_snapshot(spark, sp))


def test_import_adopts_delta_in_place(spark):
    from harmony_energy_data_pipeline_spark.sinks import snapshots as snap

    t = _tmp()
    dl.write_delta(
        _df(spark, 0, 120), t, partition_by=["p"], stats_cols=["k"]
    )
    assert dl.snapshot_import_delta(spark, t) == 0
    # same rows through the NATIVE reader, partition columns intact
    got = snap.read_snapshot(spark, t)
    assert _rows(got) == _rows(_df(spark, 0, 120))
    # imported stats → native zone maps prune; numRecords → metadata COUNT
    kept, total = snap.prune_files(t, [("p", 1, 1)])
    assert 0 < len(kept) < total
    agg = snap.snapshot_stats_agg(t)
    assert agg["n_rows"] == 120
    # the table now evolves natively: append + DV delete + point read
    snap.snapshot_write(
        spark.createDataFrame([(999, 0, "zz")], "k long, p int, s string"),
        t, mode="append",
    )
    snap.snapshot_delete_where_dv(spark, t, [("k", 0, 9)])
    assert snap.read_snapshot(spark, t).count() == 111
    # re-export hands the evolved state back to Delta consumers
    dp = _tmp()
    dl.snapshot_export_delta(spark, t, dp)
    assert dl.read_delta(spark, dp).count() == 111
    # import refuses a second adoption
    with pytest.raises(FileExistsError, match="exactly once"):
        dl.snapshot_import_delta(spark, t)


def test_import_refuses_non_hive_partition_layout(spark):
    t = _tmp()
    _foreign_file(t, "random-name.parquet", [1, 2])
    os.makedirs(os.path.join(t, "_delta_log"))
    schema = {"type": "struct", "fields": [
        {"name": "k", "type": "long", "nullable": True, "metadata": {}},
        {"name": "s", "type": "string", "nullable": True, "metadata": {}},
        {"name": "part", "type": "string", "nullable": True,
         "metadata": {}},
    ]}
    acts = [
        {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}},
        {"metaData": {"id": "x", "format": {"provider": "parquet",
                                            "options": {}},
                      "schemaString": json.dumps(schema),
                      "partitionColumns": ["part"],
                      "configuration": {}, "createdTime": 0}},
        # partitionValues say part=a but the path encodes nothing
        {"add": {"path": "random-name.parquet",
                 "partitionValues": {"part": "a"}, "size": 1,
                 "modificationTime": 0, "dataChange": True}},
    ]
    with open(dl._log_path(t, 0), "w", encoding="utf-8") as fh:
        fh.write("\n".join(json.dumps(a) for a in acts))
    with pytest.raises(ValueError, match="hive path segments"):
        dl.snapshot_import_delta(spark, t)
