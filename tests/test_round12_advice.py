"""Round-12 ADVICE quick fixes.

1. snapshot_merge_when: duplicate source keys in an INSERT-ONLY (or
   NMBS-only) merge must not fan a matched target row out into
   duplicates via the full-outer join — the kept target row survives
   exactly once, while duplicate NON-matching keys still legally
   insert one row each (ADVICE r11 #1, high).
2. _CREATE_RE: parameterized types — DECIMAL(10,2), VARCHAR(8) —
   parse; the inner ')' no longer ends the column list
   (ADVICE r11 #4, low).
3. write_iceberg year/month timestamp transforms emit UTC partition
   tuples whatever spark.sql.session.timeZone says
   (ADVICE r11 #5, low).
"""

import os
import tempfile

import pytest
from pyspark.sql import functions as F

from harmony_energy_data_pipeline_spark.catalog import Catalog
from harmony_energy_data_pipeline_spark.sinks import snapshots as snap
from harmony_energy_data_pipeline_spark.sinks.snapshots import (
    snapshot_merge_when,
    snapshot_write,
)
from harmony_energy_data_pipeline_spark.sources import iceberg as ice
from harmony_energy_data_pipeline_spark.sql import snapshot_sql


def _tmp(prefix="r12_"):
    return os.path.join(tempfile.mkdtemp(prefix=prefix), "t")


# --- 1: merge fanout on duplicate source keys ------------------------------------------


def test_insert_only_merge_dup_source_keys_no_target_fanout(spark):
    t = _tmp("mrg_")
    snapshot_write(
        spark.createDataFrame(
            [(1, "a"), (2, "b")], "k int, v string"
        ),
        t,
    )
    # source: key 1 duplicated (matches target), key 9 duplicated
    # (no match — both copies insert), key 2 once (matches, no-op)
    src = spark.createDataFrame(
        [(1, "x1"), (1, "x2"), (2, "y"), (9, "z1"), (9, "z2")],
        "k int, v string",
    )
    snapshot_merge_when(
        spark, t, src, key="k",
        not_matched=[{"condition": None, "values": None}],
    )
    rows = sorted(
        (r["k"], r["v"])
        for r in snap.read_snapshot(spark, t).collect()
    )
    # target rows 1,2 exactly once with ORIGINAL values; both copies
    # of the non-matching key 9 inserted
    assert rows == [(1, "a"), (2, "b"), (9, "z1"), (9, "z2")]


def test_nmbs_only_merge_dup_source_keys_no_target_fanout(spark):
    t = _tmp("mrgb_")
    snapshot_write(
        spark.createDataFrame(
            [(1, "a"), (2, "b"), (3, "c")], "k int, v string"
        ),
        t,
    )
    src = spark.createDataFrame(
        [(1, "x1"), (1, "x2")], "k int, v string"
    )
    snapshot_merge_when(
        spark, t, src, key="k",
        not_matched_by_source=[
            {"condition": None, "action": "delete"}
        ],
    )
    rows = sorted(
        (r["k"], r["v"])
        for r in snap.read_snapshot(spark, t).collect()
    )
    # rows 2,3 (not matched by source) deleted; row 1 kept ONCE
    assert rows == [(1, "a")]


def test_matched_merge_dup_keys_still_raises(spark):
    t = _tmp("mrgc_")
    snapshot_write(
        spark.createDataFrame([(1, "a")], "k int, v string"), t
    )
    src = spark.createDataFrame(
        [(1, "x1"), (1, "x2")], "k int, v string"
    )
    with pytest.raises(ValueError, match="cardinality"):
        snapshot_merge_when(
            spark, t, src, key="k",
            matched=[{"condition": None, "action": "update",
                      "set": None}],
        )


# --- 2: parameterized types in CREATE TABLE --------------------------------------------


def test_create_table_parameterized_types(spark, tmp_path):
    cat = Catalog(str(tmp_path / "cat"))
    snapshot_sql(
        spark,
        "CREATE TABLE prices (sku VARCHAR(8), amt DECIMAL(10,2), "
        "note STRING)",
        catalog=cat,
    )
    snapshot_sql(
        spark,
        "INSERT INTO prices VALUES ('A1', 12.34, 'ok')",
        catalog=cat,
    )
    out = snapshot_sql(spark, "SELECT * FROM prices", catalog=cat)
    assert out.count() == 1
    assert dict(out.dtypes)["amt"] == "decimal(10,2)"


# --- 3: TZ-independent year/month partition tuples -------------------------------------


def test_iceberg_timestamp_transforms_utc_under_shifted_session(spark):
    saved = spark.conf.get("spark.sql.session.timeZone")
    t = _tmp("tz_")
    try:
        # a zone far enough east that local new-year 2024 is still
        # UTC 2023 — F.year() in session TZ would emit year=54
        spark.conf.set("spark.sql.session.timeZone",
                       "Pacific/Kiritimati")  # UTC+14
        df = spark.sql(
            "SELECT 1 AS k, "
            "timestamp'2024-01-01 04:00:00+00:00' AS ts"
        )
        ice.write_iceberg(
            df, t, partition_by=["year(ts)", "month(ts)"]
        )
        meta = ice.table_metadata(t)
        snap_rec = meta["snapshots"][-1]
        from harmony_energy_data_pipeline_spark.sources.avrolite import (
            read_avro,
        )
        from harmony_energy_data_pipeline_spark.sources.iceberg import (
            _resolve_file_path,
        )

        mlist, _ = read_avro(
            _resolve_file_path(t, snap_rec["manifest-list"])
        )
        entries, _ = read_avro(
            _resolve_file_path(t, mlist[0]["manifest_path"])
        )
        part = entries[0]["data_file"]["partition"]
        # spec values: years/months since epoch of the UTC instant
        assert part["ts_year"] == 2024 - 1970
        assert part["ts_month"] == (2024 - 1970) * 12 + 0
        # and the scalar Appendix-B reference agrees
        import datetime as _dt

        v = _dt.datetime(2024, 1, 1, 4, 0, 0)
        assert ice.iceberg_transform_value(
            "year", v, "timestamptz"
        ) == part["ts_year"]
        assert ice.iceberg_transform_value(
            "month", v, "timestamptz"
        ) == part["ts_month"]
    finally:
        spark.conf.set("spark.sql.session.timeZone", saved)


# --- 4: MERGE WITH SCHEMA EVOLUTION + rich WHEN clauses --------------------------------


def test_merge_evolution_with_rich_when(spark, tmp_path):
    """VERDICT r11 #9: WITH SCHEMA EVOLUTION composes with
    conditioned WHEN forms — the widening-CDC-source shape."""
    cat = Catalog(str(tmp_path / "cat"))
    snapshot_sql(
        spark, "CREATE TABLE t (k INT, v DOUBLE)", catalog=cat
    )
    snapshot_sql(
        spark,
        "INSERT INTO t VALUES (1, 1.0), (2, 2.0), (3, 3.0)",
        catalog=cat,
    )
    # source carries a NEW column `tag` and a condition-gated update
    snapshot_sql(
        spark,
        "CREATE TABLE s AS SELECT * FROM VALUES "
        "(1, 10.0, 'hot'), (2, 20.0, 'cold'), (9, 90.0, 'new') "
        "AS x(k, v, tag)",
        catalog=cat,
    )
    snapshot_sql(
        spark,
        "MERGE WITH SCHEMA EVOLUTION INTO t USING s ON t.k = s.k "
        "WHEN MATCHED AND s.tag = 'hot' THEN UPDATE SET * "
        "WHEN NOT MATCHED THEN INSERT *",
        catalog=cat,
    )
    rows = sorted(
        (r.k, r.v, r.tag)
        for r in snapshot_sql(
            spark, "SELECT * FROM t", catalog=cat
        ).collect()
    )
    # k=1 updated (tag landed), k=2 kept (condition false, tag NULL
    # on the pre-existing row), k=3 untouched, k=9 inserted with tag
    assert rows == [
        (1, 10.0, "hot"), (2, 2.0, None), (3, 3.0, None),
        (9, 90.0, "new"),
    ]
