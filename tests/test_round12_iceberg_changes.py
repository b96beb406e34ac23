"""read_iceberg_changes (round 12): the Iceberg wire-format
changelog-scan twin of read_delta_changes — appends as inserts,
position-delete snapshots as materialized delete rows, the
single-snapshot UPDATE as delete+insert, compaction (operation
"replace") as silence, a full overwrite as delete-all + insert-all.
"""

import os
import tempfile

import pytest
from pyspark.sql import functions as F

from harmony_energy_data_pipeline_spark.sources import iceberg as ice


def _tmp(prefix="r12chg_"):
    return os.path.join(tempfile.mkdtemp(prefix=prefix), "t")


def _feed_rows(feed):
    return sorted(
        (r.k, float(r.v), r._change_type) for r in feed.collect()
    )


def test_changes_append_delete_update(spark):
    t = _tmp()
    df = spark.range(0, 10).selectExpr(
        "id AS k", "CAST(id AS DOUBLE) AS v"
    )
    ice.write_iceberg(df, t)                       # snap 1 (base)
    base = ice.table_metadata(t)["current-snapshot-id"]
    ice.write_iceberg(
        spark.range(10, 13).selectExpr(
            "id AS k", "CAST(id AS DOUBLE) AS v"
        ),
        t, mode="append",
    )                                              # snap 2: +3
    ice.iceberg_delete_where(spark, t, "k = 4")    # snap 3: -1
    ice.iceberg_update_where(spark, t, "k = 11",
                             {"v": "-1.0"})        # snap 4: -1 +1
    feed = ice.read_iceberg_changes(spark, t, base)
    rows = _feed_rows(feed)
    # k=11 appears three times: inserted by the append (11.0),
    # deleted and re-inserted (-1.0) by the update
    assert rows == [
        (4, 4.0, "delete"),
        (10, 10.0, "insert"),
        (11, -1.0, "insert"),
        (11, 11.0, "delete"),
        (11, 11.0, "insert"),
        (12, 12.0, "insert"),
    ]
    # per-snapshot attribution: 3 distinct change-carrying snapshots
    assert feed.select("_snapshot_id").distinct().count() == 3
    # from table creation: the base 10 inserts included
    all_rows = ice.read_iceberg_changes(spark, t, None)
    assert len(all_rows.collect()) == 10 + 6


def test_changes_skip_compaction_and_full_overwrite(spark):
    t = _tmp("ow_")
    ice.write_iceberg(
        spark.range(0, 6).selectExpr(
            "id AS k", "CAST(id AS DOUBLE) AS v"
        ),
        t,
    )
    base = ice.table_metadata(t)["current-snapshot-id"]
    ice.iceberg_delete_where(spark, t, "k = 0")
    ice.iceberg_compact(spark, t)  # operation "replace": silent
    ice.write_iceberg(
        spark.range(100, 102).selectExpr(
            "id AS k", "CAST(id AS DOUBLE) AS v"
        ),
        t, mode="overwrite",
    )
    feed = ice.read_iceberg_changes(spark, t, base)
    rows = _feed_rows(feed)
    # delete k=0; compaction contributes NOTHING; the full overwrite
    # deletes the 5 compacted survivors and inserts 100,101
    assert (0, 0.0, "delete") in rows
    dels = [r for r in rows if r[2] == "delete"]
    ins = [r for r in rows if r[2] == "insert"]
    assert sorted(r[0] for r in ins) == [100, 101]
    assert sorted(r[0] for r in dels) == [0, 1, 2, 3, 4, 5]
    # compaction snapshot carries the spec's "replace" stamp
    ops = [h["operation"] for h in ice.iceberg_history(t)]
    assert "replace" in ops


def test_changes_equality_deletes_refuse(spark):
    t = _tmp("eq_")
    ice.write_iceberg(
        spark.range(0, 5).selectExpr(
            "id AS k", "CAST(id AS STRING) AS tag"
        ),
        t,
    )
    base = ice.table_metadata(t)["current-snapshot-id"]
    ice.write_equality_deletes(spark, t, [{"tag": "1"}], ["tag"])
    with pytest.raises(ice.IcebergProtocolError, match="EQUALITY"):
        ice.read_iceberg_changes(spark, t, base).collect()
