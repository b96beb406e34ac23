"""Delta typeWidening reader support (round 11, VERDICT r10 #7).

A foreign table that widened a column's type (readerFeature
``typeWidening``): old data files keep the NARROW physical type, the
metaData schema speaks the WIDE one — the Spark 4 vectorized parquet
reader upcasts on read, and the reader validates each recorded
``delta.typeChanges`` pair against the spec allowlist (an unknown
conversion refuses at protocol level, not as a deep scan error).
Variant/timestamp_ntz tables read AND write (the writer declares the
features under protocol(3,7); plain schemas keep the legacy (1,2)).
"""

import json
import os
import tempfile

import pytest
from pyspark.sql.types import LongType

from harmony_energy_data_pipeline_spark.sources import deltalake as dl
from harmony_energy_data_pipeline_spark.sources.deltalake import (
    DeltaProtocolError,
    _widening_ok,
)


def _tmp():
    return os.path.join(tempfile.mkdtemp(prefix="tw_"), "t")


def _widen_table(spark, bad_change=False):
    """v0: k INT via write_delta; v1 (hand-crafted foreign commit):
    schema widened to k LONG + typeChanges metadata + typeWidening
    protocol + one new LONG data file."""
    t = _tmp()
    dl.write_delta(
        spark.range(0, 10).selectExpr(
            "CAST(id AS INT) AS k", "CAST(id AS DOUBLE) AS v"
        ),
        t,
    )
    with open(os.path.join(t, "_delta_log",
                           f"{0:020d}.json")) as fh:
        meta = next(
            json.loads(ln)["metaData"] for ln in fh
            if "metaData" in json.loads(ln)
        )
    # stage a LONG-typed file the widened schema owns
    stage = os.path.join(tempfile.mkdtemp(), "s")
    spark.range(100, 105).selectExpr(
        "id AS k", "CAST(id AS DOUBLE) AS v"
    ).coalesce(1).write.parquet(stage)
    part = next(n for n in os.listdir(stage) if n.endswith(".parquet"))
    fname = "part-widened-0001.parquet"
    os.rename(os.path.join(stage, part), os.path.join(t, fname))
    changes = [{"fromType": "integer", "toType": "long",
                "tableVersion": 1}]
    if bad_change:
        changes.append({"fromType": "long", "toType": "integer",
                        "tableVersion": 2})
    schema = {
        "type": "struct", "fields": [
            {"name": "k", "type": "long", "nullable": True,
             "metadata": {"delta.typeChanges": changes}},
            {"name": "v", "type": "double", "nullable": True,
             "metadata": {}},
        ],
    }
    meta = dict(meta, schemaString=json.dumps(schema))
    with open(os.path.join(t, "_delta_log", f"{1:020d}.json"),
              "w") as fh:
        fh.write(json.dumps({"protocol": {
            "minReaderVersion": 3, "minWriterVersion": 7,
            "readerFeatures": ["typeWidening"],
            "writerFeatures": ["typeWidening"],
        }}) + "\n")
        fh.write(json.dumps({"metaData": meta}) + "\n")
        fh.write(json.dumps({"add": {
            "path": fname,
            "partitionValues": {},
            "size": os.path.getsize(os.path.join(t, fname)),
            "modificationTime": 0, "dataChange": True,
        }}) + "\n")
    return t


def test_widened_table_reads_old_and_new_files(spark):
    t = _widen_table(spark)
    got = dl.read_delta(spark, t)
    assert isinstance(got.schema["k"].dataType, LongType)
    ks = sorted(r.k for r in got.collect())
    assert ks == list(range(10)) + list(range(100, 105))
    # pruning over the widened column still works (stats from v0
    # files were written as ints; predicate is long)
    assert dl.read_delta(spark, t, where=[("k", 100, 200)]).count() == 5
    # time travel to v0 reads the NARROW schema
    old = dl.read_delta(spark, t, version=0)
    assert old.schema["k"].dataType.typeName() == "integer"
    assert old.count() == 10


def test_unknown_type_change_refuses(spark):
    t = _widen_table(spark, bad_change=True)
    with pytest.raises(DeltaProtocolError, match="typeWidening"):
        dl.read_delta(spark, t)


def test_unknown_feature_still_refused(spark):
    t = _widen_table(spark)
    with open(os.path.join(t, "_delta_log", f"{2:020d}.json"),
              "w") as fh:
        fh.write(json.dumps({"protocol": {
            "minReaderVersion": 3, "minWriterVersion": 7,
            "readerFeatures": ["typeWidening", "collations"],
            "writerFeatures": ["collations"],
        }}) + "\n")
    with pytest.raises(DeltaProtocolError, match="collations"):
        dl.read_delta(spark, t)


def test_variant_table_reads_and_writes(spark):
    """variantType (round 11): a foreign table with a VARIANT column
    reads through Spark 4's native VariantType parquet decode, and
    the writer round-trips variant batches by DECLARING the feature
    under protocol(3,7)."""
    t = _tmp()
    df = spark.sql("""
      SELECT id AS k,
             parse_json(concat('{"a": ', id, ', "tag": "x"}')) AS payload
      FROM range(0, 8)
    """)
    stage = os.path.join(tempfile.mkdtemp(), "s")
    df.coalesce(1).write.parquet(stage)
    part = next(n for n in os.listdir(stage) if n.endswith(".parquet"))
    os.makedirs(os.path.join(t, "_delta_log"))
    fname = "part-var-0001.parquet"
    os.rename(os.path.join(stage, part), os.path.join(t, fname))
    schema = {
        "type": "struct", "fields": [
            {"name": "k", "type": "long", "nullable": True,
             "metadata": {}},
            {"name": "payload", "type": "variant", "nullable": True,
             "metadata": {}},
        ],
    }
    with open(os.path.join(t, "_delta_log", f"{0:020d}.json"),
              "w") as fh:
        fh.write(json.dumps({"protocol": {
            "minReaderVersion": 3, "minWriterVersion": 7,
            "readerFeatures": ["variantType"],
            "writerFeatures": ["variantType"],
        }}) + "\n")
        fh.write(json.dumps({"metaData": {
            "id": "vtab", "format": {"provider": "parquet",
                                     "options": {}},
            "schemaString": json.dumps(schema),
            "partitionColumns": [], "configuration": {},
            "createdTime": 0,
        }}) + "\n")
        fh.write(json.dumps({"add": {
            "path": fname, "partitionValues": {},
            "size": os.path.getsize(os.path.join(t, fname)),
            "modificationTime": 0, "dataChange": True,
        }}) + "\n")
    got = dl.read_delta(spark, t)
    assert got.schema["payload"].dataType.typeName() == "variant"
    rows = got.selectExpr(
        "k", "variant_get(payload, '$.a', 'long') AS a"
    ).orderBy("k").collect()
    assert [(r.k, r.a) for r in rows] == [(i, i) for i in range(8)]
    # the writer DECLARES the feature and round-trips variant batches
    t2 = _tmp()
    dl.write_delta(df, t2)
    with open(os.path.join(t2, "_delta_log", f"{0:020d}.json")) as fh:
        proto = next(
            json.loads(ln)["protocol"] for ln in fh
            if "protocol" in json.loads(ln)
        )
    assert proto["minReaderVersion"] == 3
    assert "variantType" in proto["readerFeatures"]
    back = dl.read_delta(spark, t2)
    vals = {r.k: r.a for r in back.selectExpr(
        "k", "variant_get(payload, '$.a', 'long') AS a").collect()}
    assert vals == {i: i for i in range(8)}


def test_native_log_stores_variant_columns(spark):
    """The native snapshot log round-trips VARIANT columns (Spark 4
    parquet encoding); row-level ops keep them intact."""
    from harmony_energy_data_pipeline_spark.sinks import snapshots as snap

    t = _tmp()
    df = spark.sql("""
      SELECT id AS k,
             parse_json(concat('{"n": ', id * 2, '}')) AS meta
      FROM range(0, 12)
    """)
    snap.snapshot_write(df, t)
    got = snap.read_snapshot(spark, t)
    assert got.schema["meta"].dataType.typeName() == "variant"
    vals = {r.k: r.n for r in got.selectExpr(
        "k", "variant_get(meta, '$.n', 'long') AS n").collect()}
    assert vals == {i: i * 2 for i in range(12)}
    snap.snapshot_delete_where(spark, t, [("k", 0, 3)])
    assert snap.read_snapshot(spark, t).count() == 8


def test_write_delta_declares_timestamp_ntz(spark):
    t = _tmp()
    df = spark.sql("""
      SELECT id AS k, timestamp_ntz'2024-05-01 08:00:00' AS ts
      FROM range(0, 4)
    """)
    dl.write_delta(df, t)
    with open(os.path.join(t, "_delta_log", f"{0:020d}.json")) as fh:
        proto = next(
            json.loads(ln)["protocol"] for ln in fh
            if "protocol" in json.loads(ln)
        )
    assert proto == {
        "minReaderVersion": 3, "minWriterVersion": 7,
        "readerFeatures": ["timestampNtz"],
        "writerFeatures": ["timestampNtz"],
    }
    got = dl.read_delta(spark, t)
    assert got.schema["ts"].dataType.typeName() == "timestamp_ntz"
    assert got.count() == 4
    # plain schemas keep the maximally-readable legacy protocol
    t2 = _tmp()
    dl.write_delta(spark.range(0, 3).selectExpr("id AS k"), t2)
    with open(os.path.join(t2, "_delta_log", f"{0:020d}.json")) as fh:
        proto = next(
            json.loads(ln)["protocol"] for ln in fh
            if "protocol" in json.loads(ln)
        )
    assert proto == {"minReaderVersion": 1, "minWriterVersion": 2}


def test_timestamp_ntz_table_reads(spark):
    t = _tmp()
    df = spark.sql("""
      SELECT id AS k,
             timestamp_ntz'2024-03-01 12:00:00'
               + make_interval(0,0,0,0,CAST(id AS INT),0,0) AS ts
      FROM range(0, 5)
    """)
    stage = os.path.join(tempfile.mkdtemp(), "s")
    df.coalesce(1).write.parquet(stage)
    part = next(n for n in os.listdir(stage) if n.endswith(".parquet"))
    os.makedirs(os.path.join(t, "_delta_log"))
    os.rename(os.path.join(stage, part), os.path.join(t, "f.parquet"))
    schema = {"type": "struct", "fields": [
        {"name": "k", "type": "long", "nullable": True, "metadata": {}},
        {"name": "ts", "type": "timestamp_ntz", "nullable": True,
         "metadata": {}}]}
    with open(os.path.join(t, "_delta_log", f"{0:020d}.json"),
              "w") as fh:
        fh.write(json.dumps({"protocol": {
            "minReaderVersion": 3, "minWriterVersion": 7,
            "readerFeatures": ["timestampNtz"],
            "writerFeatures": ["timestampNtz"]}}) + "\n")
        fh.write(json.dumps({"metaData": {
            "id": "x", "format": {"provider": "parquet", "options": {}},
            "schemaString": json.dumps(schema),
            "partitionColumns": [], "configuration": {},
            "createdTime": 0}}) + "\n")
        fh.write(json.dumps({"add": {
            "path": "f.parquet", "partitionValues": {},
            "size": os.path.getsize(os.path.join(t, "f.parquet")),
            "modificationTime": 0, "dataChange": True}}) + "\n")
    got = dl.read_delta(spark, t)
    assert got.schema["ts"].dataType.typeName() == "timestamp_ntz"
    assert got.count() == 5


def test_widening_allowlist_pairs():
    ok = [
        ("byte", "short"), ("byte", "long"), ("short", "integer"),
        ("integer", "long"), ("integer", "double"),
        ("float", "double"), ("date", "timestampNtz"),
        ("integer", "decimal(10,0)"), ("long", "decimal(20,0)"),
        ("decimal(10,2)", "decimal(14,2)"),
        ("decimal(10,2)", "decimal(14,4)"),
    ]
    bad = [
        ("long", "integer"), ("double", "float"),
        ("string", "long"), ("long", "double"),
        ("integer", "decimal(9,0)"),
        ("decimal(10,2)", "decimal(10,1)"),
        ("decimal(10,2)", "decimal(11,4)"),  # p-s shrinks
        ("timestampNtz", "date"),
    ]
    for ft, tt in ok:
        assert _widening_ok(ft, tt), (ft, tt)
    for ft, tt in bad:
        assert not _widening_ok(ft, tt), (ft, tt)
