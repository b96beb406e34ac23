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


def test_delta_tables_resolve_through_the_facade(spark):
    """One SQL surface over both formats: a native table joins a
    Delta-format table, version travel works on each."""
    from harmony_energy_data_pipeline_spark.sources import deltalake as dl

    nt, dt = _tmp(), _tmp()
    snap.snapshot_write(
        spark.range(10).select(F.col("id").alias("k"),
                               (F.col("id") * 2).alias("v")), nt,
    )
    dl.write_delta(
        spark.range(10).select(F.col("id").alias("k"),
                               F.concat(F.lit("d"), F.col("id"))
                               .alias("tag")), dt,
    )
    dl.write_delta(
        spark.range(10, 12).select(F.col("id").alias("k"),
                                   F.lit("late").alias("tag")),
        dt, mode="append",
    )
    got = snapshot_sql(spark, """
        SELECT n.k, n.v, d.tag
        FROM native n JOIN dtab VERSION AS OF 0 d ON n.k = d.k
        ORDER BY n.k
    """, {"native": nt, "dtab": dt})
    rows = got.collect()
    assert len(rows) == 10 and rows[3]["tag"] == "d3"
    # latest delta version through the same facade
    n = snapshot_sql(spark, "SELECT COUNT(*) AS n FROM dtab",
                     {"dtab": dt}).first()["n"]
    assert n == 12


def test_delta_timestamp_travel_through_facade(spark):
    import json
    import os

    from harmony_energy_data_pipeline_spark.sources import deltalake as dl

    dt = _tmp()
    dl.write_delta(
        spark.range(3).select(F.col("id").alias("k")), dt
    )
    dl.write_delta(
        spark.range(3, 9).select(F.col("id").alias("k")), dt,
        mode="append",
    )
    # pin commit timestamps so the cut is deterministic
    for v, ms in ((0, 1_000_000_000_000), (1, 2_000_000_000_000)):
        lp = dl._log_path(dt, v)
        acts = [json.loads(x) for x in open(lp)]
        for a in acts:
            if "commitInfo" in a:
                a["commitInfo"]["timestamp"] = ms
        with open(lp, "w") as fh:
            fh.write("\n".join(json.dumps(a) for a in acts))
    import datetime as dtm

    cut = dtm.datetime.fromtimestamp(1_500_000_000).strftime(
        "%Y-%m-%d %H:%M:%S")
    n = snapshot_sql(
        spark,
        f"SELECT COUNT(*) AS n FROM dtab TIMESTAMP AS OF '{cut}'",
        {"dtab": dt},
    ).first()["n"]
    assert n == 3
