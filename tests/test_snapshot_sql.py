"""SQL facade with time travel (harmony_energy_data_pipeline_spark.sql)."""

from __future__ import annotations

import tempfile
import time

import pytest
from pyspark.sql import functions as F

from harmony_energy_data_pipeline_spark.sinks import snapshots as snap
from harmony_energy_data_pipeline_spark.sql import snapshot_sql


def _tmp():
    return tempfile.mkdtemp(prefix="sql_") + "/t"


def _build(spark):
    t = _tmp()
    snap.snapshot_write(
        spark.range(10).select(F.col("id").alias("k"),
                               (F.col("id") * 2).alias("v")), t,
    )
    snap.snapshot_write(
        spark.range(10, 15).select(F.col("id").alias("k"),
                                   (F.col("id") * 2).alias("v")),
        t, mode="append",
    )
    return t


def test_plain_and_version_travel(spark):
    t = _build(spark)
    got = snapshot_sql(
        spark, "SELECT COUNT(*) AS n FROM tbl", {"tbl": t}
    ).first()
    assert got["n"] == 15
    old = snapshot_sql(
        spark, "SELECT COUNT(*) AS n FROM tbl VERSION AS OF 0",
        {"tbl": t},
    ).first()
    assert old["n"] == 10


def test_present_joins_its_own_past(spark):
    t = _build(spark)
    diff = snapshot_sql(spark, """
        SELECT now.k FROM tbl now
        LEFT ANTI JOIN (SELECT k FROM tbl VERSION AS OF 0) old
        ON now.k = old.k
        ORDER BY now.k
    """, {"tbl": t})
    assert [r["k"] for r in diff.collect()] == [10, 11, 12, 13, 14]


def test_timestamp_travel(spark):
    t = _tmp()
    snap.snapshot_write(
        spark.range(3).select(F.col("id").alias("k")), t
    )
    time.sleep(1.2)
    cut = time.strftime("%Y-%m-%d %H:%M:%S")
    time.sleep(1.2)
    snap.snapshot_write(
        spark.range(3, 8).select(F.col("id").alias("k")), t,
        mode="append",
    )
    n = snapshot_sql(
        spark,
        f"SELECT COUNT(*) AS n FROM tbl TIMESTAMP AS OF '{cut}'",
        {"tbl": t},
    ).first()["n"]
    assert n == 3


def test_two_tables_and_case_insensitive(spark):
    t1, t2 = _build(spark), _tmp()
    snap.snapshot_write(
        spark.range(5).select(F.col("id").alias("k"),
                              F.lit("x").alias("tag")), t2,
    )
    got = snapshot_sql(spark, """
        SELECT COUNT(*) AS n
        FROM tbl version as of 0 a JOIN dim b ON a.k = b.k
    """, {"tbl": t1, "dim": t2}).first()
    assert got["n"] == 5


def test_bad_timestamp_raises(spark):
    t = _build(spark)
    with pytest.raises(ValueError, match="TIMESTAMP AS OF"):
        snapshot_sql(
            spark, "SELECT * FROM tbl TIMESTAMP AS OF 'nope'",
            {"tbl": t},
        )
