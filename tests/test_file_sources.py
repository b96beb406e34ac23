"""Lenient file sources: PERMISSIVE parse with corrupt-record
quarantine (the reference's strict=False coercion contract,
generalized to file ingestion)."""

from __future__ import annotations

from pyspark.sql import types as T

from harmony_energy_data_pipeline_spark.sources.files import (
    CORRUPT_COL,
    read_csv_lenient,
    read_jsonl_lenient,
    split_corrupt,
)

SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("val", T.DoubleType()),
        T.StructField("name", T.StringType()),
    ]
)


def test_csv_bad_rows_quarantined(spark, tmp_path):
    p = tmp_path / "in.csv"
    p.write_text(
        "id,val,name\n"
        "1,1.5,alpha\n"
        "not_a_number,2.5,beta\n"   # id fails the long cast
        "3,3.5,gamma\n"
    )
    df = read_csv_lenient(spark, str(p), SCHEMA)
    clean, quarantine = split_corrupt(df)
    got = {r["id"]: r["name"] for r in clean.collect()}
    assert got == {1: "alpha", 3: "gamma"}
    bad = quarantine.collect()
    assert [r[CORRUPT_COL] for r in bad] == ["not_a_number,2.5,beta"]
    assert bad[0]["id"] is None  # failed row's data columns are null


def test_jsonl_syntax_error_vs_missing_field(spark, tmp_path):
    p = tmp_path / "in.jsonl"
    p.write_text(
        '{"id": 1, "val": 1.5, "name": "alpha"}\n'
        '{"id": 2}\n'            # missing fields -> nulls, NOT corrupt
        "this is not json\n"     # syntax error -> quarantined
    )
    df = read_jsonl_lenient(spark, str(p), SCHEMA)
    clean, quarantine = split_corrupt(df)
    rows = {r["id"]: (r["val"], r["name"]) for r in clean.collect()}
    assert rows == {1: (1.5, "alpha"), 2: (None, None)}
    assert [r[CORRUPT_COL] for r in quarantine.collect()] == ["this is not json"]


def test_schema_not_mutated_and_idempotent(spark, tmp_path):
    p = tmp_path / "a.csv"
    p.write_text("id,val,name\n1,1.0,x\n")
    df = read_csv_lenient(spark, str(p), SCHEMA)
    # caller's schema object untouched; capture column present exactly once
    assert SCHEMA.fieldNames() == ["id", "val", "name"]
    assert df.columns.count(CORRUPT_COL) == 1
