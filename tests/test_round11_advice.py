"""Round-11 ADVICE + VERDICT quick fixes.

1. delta_vacuum on a table adopted via snapshot_import_delta must not
   delete the co-located native log's property: _snapshots/
   checkpoints, _branches/, root-level dvimport-*.parquet, or
   natively-appended data/ files (ADVICE r10 #1).
2. ANALYZE handles non-identifier column names (hyphens) — the NDV
   canon SQL backtick-quotes (ADVICE r10 #3).
3. SQL VACUUM reports the removed-file count in its own
   ``removed_files`` column, version NULL (ADVICE r10 #4).
4. ``TIMESTAMP AS OF`` literals parse as UTC whatever the host TZ —
   commit stamps are UTC epochs (VERDICT r10 #1).
5. The travel-clause rewrite and the target-travel refusal are
   literal-safe: a string literal containing ``<name> VERSION AS OF``
   passes through untouched (VERDICT r10 #8).
"""

import calendar
import os
import tempfile
import time

import pytest
from pyspark.sql import functions as F

from harmony_energy_data_pipeline_spark.catalog import Catalog
from harmony_energy_data_pipeline_spark.sinks import snapshots as snap
from harmony_energy_data_pipeline_spark.sources import deltalake as dl
from harmony_energy_data_pipeline_spark.sql import (
    _ts_to_unix,
    snapshot_sql,
)


def _tmp(prefix="r11_"):
    return os.path.join(tempfile.mkdtemp(prefix=prefix), "t")


# --- 1: delta_vacuum vs adopted-native sidecars ---------------------------------------


def test_delta_vacuum_spares_native_sidecars(spark):
    t = _tmp("dvac_")
    df = spark.range(0, 20).selectExpr("id AS k", "id * 1.5 AS v")
    dl.write_delta(df, t)
    dl.snapshot_import_delta(spark, t)
    # native evolution: an append (data/ files) + a delete (DV
    # parquet) + a checkpoint (_snapshots/ckpt-*.parquet)
    snap.snapshot_write(
        spark.range(20, 30).selectExpr("id AS k", "id * 1.5 AS v"),
        t, mode="append",
    )
    # a fake imported-DV sidecar at the root, as snapshot_import_delta
    # writes for deletion-vector tables
    dv_sidecar = os.path.join(t, "dvimport-cafebabe.parquet")
    with open(dv_sidecar, "wb") as fh:
        fh.write(b"PAR1stub")
    old = time.time() - 10 * 24 * 3600
    for root, _dirs, names in os.walk(t):
        for n in names:
            os.utime(os.path.join(root, n), (old, old))
    removed = dl.delta_vacuum(t, retention_s=3600.0)
    assert removed == [], f"delta_vacuum removed native files: {removed}"
    assert os.path.exists(dv_sidecar)
    assert snap.read_snapshot(spark, t).count() == 30


def test_delta_vacuum_still_sweeps_true_orphans(spark):
    t = _tmp("dvac2_")
    dl.write_delta(
        spark.range(0, 10).selectExpr("id AS k"), t
    )
    orphan = os.path.join(t, "orphan-stage.parquet")
    with open(orphan, "wb") as fh:
        fh.write(b"PAR1stub")
    old = time.time() - 10 * 24 * 3600
    os.utime(orphan, (old, old))
    removed = dl.delta_vacuum(t, retention_s=3600.0)
    assert removed == ["orphan-stage.parquet"]
    assert not os.path.exists(orphan)


# --- 2: ANALYZE with non-identifier column names --------------------------------------


def test_analyze_hyphenated_column_names(spark):
    from harmony_energy_data_pipeline_spark.sinks import analyze as az

    t = _tmp("ndv_")
    df = spark.range(0, 50).select(
        F.col("id").alias("col-k9"),
        (F.col("id") * 1.5).alias("val-x"),
    )
    snap.snapshot_write(df, t)
    az.snapshot_analyze(spark, t, cols=["col-k9", "val-x"])
    cs = az.snapshot_column_stats(t)["columns"]
    assert cs["col-k9"]["ndv_est"] > 40
    assert cs["val-x"]["n_nulls"] == 0


# --- 3: SQL VACUUM result contract ----------------------------------------------------


def test_sql_vacuum_result_columns(spark):
    cat = Catalog(tempfile.mkdtemp(prefix="r11cat_"))
    spark.range(0, 5).selectExpr("id AS k").createOrReplaceTempView(
        "r11_src"
    )
    snapshot_sql(
        spark, "CREATE TABLE vt AS SELECT k FROM r11_src", catalog=cat
    )
    snapshot_sql(spark, "INSERT INTO vt VALUES (99)", catalog=cat)
    r = snapshot_sql(
        spark, "VACUUM vt RETAIN 1 VERSIONS", catalog=cat
    ).collect()[0]
    assert r.operation == "vacuum" and r.table == "vt"
    assert r.version is None
    assert r.removed_files >= 0


# --- 4: TIMESTAMP AS OF parses as UTC -------------------------------------------------


def test_ts_to_unix_is_utc_under_nonutc_host_tz():
    before = os.environ.get("TZ")
    os.environ["TZ"] = "America/New_York"
    time.tzset()
    try:
        want = calendar.timegm((2026, 1, 15, 12, 30, 0, 0, 0, 0))
        assert _ts_to_unix("2026-01-15 12:30:00") == want
        assert _ts_to_unix("2026-01-15T12:30:00") == want
        assert _ts_to_unix("2026-01-15") == calendar.timegm(
            (2026, 1, 15, 0, 0, 0, 0, 0, 0)
        )
    finally:
        if before is None:
            os.environ.pop("TZ", None)
        else:
            os.environ["TZ"] = before
        time.tzset()


def test_sql_timestamp_travel_matches_native_under_nonutc_tz(spark):
    """SQL time travel picks the SAME version as version_at_timestamp
    even when the host TZ is shifted (the naive-parse bug would
    resolve 5h off under America/New_York)."""
    before = os.environ.get("TZ")
    os.environ["TZ"] = "America/New_York"
    time.tzset()
    try:
        t = _tmp("ttv_")
        snap.snapshot_write(
            spark.range(0, 3).selectExpr("id AS k"), t
        )
        mid = time.time()
        time.sleep(1.1)
        snap.snapshot_write(
            spark.range(0, 7).selectExpr("id AS k"), t, mode="overwrite"
        )
        v_native = snap.version_at_timestamp(t, mid)
        import datetime as _dt

        lit = _dt.datetime.fromtimestamp(
            mid, tz=_dt.timezone.utc
        ).strftime("%Y-%m-%d %H:%M:%S")
        got = snapshot_sql(
            spark,
            f"SELECT COUNT(*) AS n FROM tt TIMESTAMP AS OF '{lit}'",
            tables={"tt": t},
        ).collect()[0].n
        want = snap.read_snapshot(
            spark, t, version=v_native
        ).count()
        assert got == want == 3
    finally:
        if before is None:
            os.environ.pop("TZ", None)
        else:
            os.environ["TZ"] = before
        time.tzset()


# --- UPDATE typing: SET result casts to the declared column type ----------------------


def test_update_widening_arithmetic_keeps_declared_type(spark):
    """``UPDATE t SET v = v * 2`` on a decimal(23,1) column must not
    write decimal(24,1) files — the widened physical type would break
    every subsequent read of the rewritten file (found by driving the
    SQL script surface end-to-end)."""
    cat = Catalog(tempfile.mkdtemp(prefix="r11upd_"))
    spark.range(0, 40).selectExpr(
        "id AS k", "id * 1.5 AS v"  # 1.5 parses as DECIMAL in Spark 4
    ).createOrReplaceTempView("r11_dec_src")
    from harmony_energy_data_pipeline_spark.sql import (
        snapshot_sql_script,
    )

    out = snapshot_sql_script(spark, """
      CREATE TABLE dt AS SELECT k, v FROM r11_dec_src;
      UPDATE dt SET v = v * 2 WHERE k >= 10 AND k <= 20;
      SELECT COUNT(*) AS n,
             CAST(SUM(CAST(round(v * 10) AS BIGINT)) AS BIGINT) AS s
      FROM dt
    """, catalog=cat).collect()[0]
    assert out.n == 40
    want = sum(
        round(i * 15 * (2 if 10 <= i <= 20 else 1)) for i in range(40)
    )
    assert out.s == want
    # DV-path twin
    t = _tmp("updv_")
    snap.snapshot_write(
        spark.range(0, 30).selectExpr("id AS k", "id * 1.5 AS v"), t
    )
    snap.snapshot_update_where_dv(
        spark, t, [("k", 5, 9)], {"v": "v * 3"}
    )
    got = snap.read_snapshot(spark, t)
    assert [f.dataType.simpleString() for f in got.schema.fields
            if f.name == "v"] == ["decimal(23,1)"]
    assert got.count() == 30


# --- 5: literal-safe rewrite ----------------------------------------------------------


def test_select_literal_containing_travel_clause_untouched(spark):
    t = _tmp("lit_")
    snap.snapshot_write(
        spark.range(0, 4).selectExpr("id AS k"), t
    )
    snap.snapshot_write(
        spark.range(0, 9).selectExpr("id AS k"), t, mode="overwrite"
    )
    rows = snapshot_sql(
        spark,
        "SELECT k, 'tt VERSION AS OF 0' AS note FROM tt",
        tables={"tt": t},
    ).collect()
    assert len(rows) == 9  # literal did NOT time-travel the read
    assert all(r.note == "tt VERSION AS OF 0" for r in rows)


def test_dml_literal_containing_travel_clause_not_refused(spark):
    t = _tmp("lit2_")
    snap.snapshot_write(
        spark.range(0, 4).selectExpr(
            "id AS k", "CAST('x' AS STRING) AS s"
        ), t,
    )
    r = snapshot_sql(
        spark,
        "UPDATE tt SET s = 'tt VERSION AS OF 1' WHERE k = 2",
        tables={"tt": t},
    ).collect()[0]
    assert r.operation == "update"
    got = {
        (row.k, row.s)
        for row in snap.read_snapshot(spark, t).collect()
    }
    assert (2, "tt VERSION AS OF 1") in got
    # genuine target travel still refuses
    with pytest.raises(ValueError, match="time travel"):
        snapshot_sql(
            spark, "DELETE FROM tt VERSION AS OF 0 WHERE k = 1",
            tables={"tt": t},
        )
