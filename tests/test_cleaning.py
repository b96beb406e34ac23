"""Reference-semantics unit tests for the cleaning core, mirroring
/root/reference/tests/test_transform.py (golden-frame style)."""

from __future__ import annotations

from pyspark.sql import types as T

from harmony_energy_data_pipeline_spark.operators import cleaning

SAMPLE_SCHEMA = T.StructType([
    T.StructField("_id", T.LongType()),
    T.StructField("DATETIME", T.StringType()),
    T.StructField("GENERATION", T.StringType()),
    T.StructField("WIND", T.StringType()),
    T.StructField("WIND_perc", T.StringType()),
    T.StructField("SOLAR", T.StringType()),
    T.StructField("SOLAR_perc", T.StringType()),
])


def _sample(spark, rows):
    return spark.createDataFrame(rows, SAMPLE_SCHEMA)


def test_align_schema_adds_missing_and_drops_extra(spark):
    df = spark.createDataFrame(
        [(1, "2023-01-01T10:00:00", "junk")],
        "_id long, DATETIME string, UNEXPECTED string",
    )
    out = cleaning.align_schema(df)
    assert "UNEXPECTED" not in out.columns
    assert out.columns == [f.name for f in out.schema.fields]
    assert "GAS" in out.columns  # missing column added
    row = out.first()
    assert row["GAS"] is None


def test_parse_and_cast_malformed_to_null(spark):
    # reference: tests/test_transform.py:74-82 — strict=False semantics
    df = _sample(spark, [
        (1, "2023-01-01T10:00:00", "100.0", "10.0", "10.0", "5.0", "5.0"),
        (2, "not-a-date", "abc", "1", "1", "1", "1"),
    ])
    out = cleaning.parse_and_cast(
        df, "DATETIME", [c for c in df.columns if c not in ("_id", "DATETIME")]
    ).collect()
    by_id = {r["_id"]: r for r in out}
    assert by_id[1]["DATETIME"] is not None
    assert by_id[1]["GENERATION"] == 100.0
    assert by_id[2]["DATETIME"] is None       # malformed ts -> null
    assert by_id[2]["GENERATION"] is None     # non-numeric -> null
    assert by_id[2]["WIND"] == 1.0            # int-ish string -> float


def test_repair_percentages_beyond_tolerance(spark):
    # reference: 50/200 should be 25%, reported 10% -> repaired
    df = spark.createDataFrame(
        [(1, 200.0, 50.0, 10.0), (2, 200.0, 50.0, 25.5)],
        "_id long, GENERATION double, WIND double, WIND_perc double",
    )
    out = {r["_id"]: r for r in cleaning.repair_percentages(df, ["WIND"]).collect()}
    assert out[1]["WIND_perc"] == 25.0   # off by 15pp -> repaired
    assert out[2]["WIND_perc"] == 25.5   # within 1pp -> kept


def test_count_inconsistent(spark):
    df = spark.createDataFrame(
        [(1, 200.0, 50.0, 10.0), (2, 200.0, 50.0, 25.5), (3, 200.0, 50.0, 99.0)],
        "_id long, GENERATION double, WIND double, WIND_perc double",
    )
    row = cleaning.count_inconsistent(df, ["WIND"]).first()
    assert row["WIND"] == 2


def test_handle_missing_values(spark):
    df = spark.createDataFrame(
        [(1, "2023-01-01T10:00:00", 1.0), (None, "2023-01-01T11:00:00", 2.0),
         (3, None, 3.0), (4, "2023-01-01T12:00:00", None)],
        "_id long, DATETIME string, WIND double",
    )
    out = cleaning.handle_missing_values(df)
    rows = {r["_id"]: r for r in out.collect()}
    assert set(rows) == {1, 4}           # null-key rows dropped
    assert rows[4]["WIND"] == 0.0        # float zero-filled


def test_dedup_two_phase_order_matters(spark):
    # reference: tests/test_transform.py:184-204 — phase 1 (per _id keep
    # latest DATETIME) runs before phase 2 (per DATETIME keep max _id).
    df = spark.createDataFrame(
        [
            (1, "2023-01-01 10:00:00"),
            (1, "2023-01-01 12:00:00"),   # phase1 keeps this for _id=1
            (2, "2023-01-01 12:00:00"),   # phase2: ts-dup with above, _id=2 wins
            (3, "2023-01-01 13:00:00"),
        ],
        "_id long, DATETIME string",
    ).selectExpr("_id", "CAST(DATETIME AS TIMESTAMP) AS DATETIME")
    out = cleaning.dedup_two_phase(df)
    got = {(r["_id"], str(r["DATETIME"])) for r in out.collect()}
    assert got == {(2, "2023-01-01 12:00:00"), (3, "2023-01-01 13:00:00")}


def test_quality_summary(spark):
    out = cleaning.quality_summary(spark, 100, 90, [("WIND", 3)]).collect()
    d = {r["Check"]: r["Count"] for r in out}
    assert d["Total raw records"] == 100
    assert d["Dropped / invalid records"] == 10
    assert d["WIND"] == 3
