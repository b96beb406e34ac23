"""Delta columnMapping mode 'id' (round 11): parquet columns resolve
by FIELD ID, not by name — Spark's native fieldId reader does the
matching, so a renamed physical column or a file predating a column
addition reads exactly per the Delta semantics (missing id → NULL).
"""

import json
import os
import tempfile

import pytest
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

from harmony_energy_data_pipeline_spark.sources import deltalake as dl


def _stage_with_ids(spark, rows, fields, tdir, fname):
    """Write one parquet file whose columns carry parquet field ids
    (names deliberately unlike the table's physicalName)."""
    spark.conf.set("spark.sql.parquet.fieldId.write.enabled", "true")
    schema = StructType([
        StructField(n, t, True, {"parquet.field.id": fid})
        for n, t, fid in fields
    ])
    stage = os.path.join(tempfile.mkdtemp(), "s")
    spark.createDataFrame(rows, schema).coalesce(1).write.parquet(stage)
    part = next(n for n in os.listdir(stage) if n.endswith(".parquet"))
    os.rename(os.path.join(stage, part), os.path.join(tdir, fname))


def test_id_mode_resolves_by_field_id(spark):
    t = os.path.join(tempfile.mkdtemp(prefix="idcm_"), "t")
    os.makedirs(os.path.join(t, "_delta_log"))
    # file 1: both columns, parquet names unrelated to physicalName
    _stage_with_ids(
        spark, [(1, "a"), (2, "b")],
        [("renamed-afterwards", LongType(), 1),
         ("also-renamed", StringType(), 2)],
        t, "f1.parquet",
    )
    # file 2: written BEFORE column 2 existed — id 2 absent
    _stage_with_ids(
        spark, [(10,), (11,)],
        [("original-name", LongType(), 1)],
        t, "f2.parquet",
    )
    schema = {"type": "struct", "fields": [
        {"name": "k", "type": "long", "nullable": True, "metadata": {
            "delta.columnMapping.id": 1,
            "delta.columnMapping.physicalName": "col-aaaa"}},
        {"name": "tag", "type": "string", "nullable": True, "metadata": {
            "delta.columnMapping.id": 2,
            "delta.columnMapping.physicalName": "col-bbbb"}},
    ]}
    with open(os.path.join(t, "_delta_log", f"{0:020d}.json"),
              "w") as fh:
        fh.write(json.dumps({"protocol": {
            "minReaderVersion": 2, "minWriterVersion": 5}}) + "\n")
        fh.write(json.dumps({"metaData": {
            "id": "idt", "format": {"provider": "parquet",
                                    "options": {}},
            "schemaString": json.dumps(schema),
            "partitionColumns": [],
            "configuration": {"delta.columnMapping.mode": "id"},
            "createdTime": 0}}) + "\n")
        for fname in ("f1.parquet", "f2.parquet"):
            fh.write(json.dumps({"add": {
                "path": fname, "partitionValues": {},
                "size": os.path.getsize(os.path.join(t, fname)),
                "modificationTime": 0, "dataChange": True}}) + "\n")
    got = dl.read_delta(spark, t)
    assert got.columns == ["k", "tag"]
    rows = {r.k: r.tag for r in got.collect()}
    # ids resolved despite parquet names matching NEITHER the logical
    # nor the physical name; the pre-addition file reads tag as NULL
    assert rows == {1: "a", 2: "b", 10: None, 11: None}


def test_unknown_mapping_mode_still_refuses(spark):
    t = os.path.join(tempfile.mkdtemp(prefix="idcm2_"), "t")
    os.makedirs(os.path.join(t, "_delta_log"))
    schema = {"type": "struct", "fields": [
        {"name": "k", "type": "long", "nullable": True,
         "metadata": {}}]}
    with open(os.path.join(t, "_delta_log", f"{0:020d}.json"),
              "w") as fh:
        fh.write(json.dumps({"metaData": {
            "id": "x", "format": {"provider": "parquet", "options": {}},
            "schemaString": json.dumps(schema),
            "partitionColumns": [],
            "configuration": {"delta.columnMapping.mode": "exotic"},
            "createdTime": 0}}) + "\n")
    with pytest.raises(dl.DeltaProtocolError, match="exotic"):
        dl.read_delta(spark, t)
