"""Round-12 SQL surface: TABLE_CHANGES(name, from[, to]) across all
three formats, version and timestamp args."""

import os
import tempfile

import pytest

from harmony_energy_data_pipeline_spark.catalog import Catalog
from harmony_energy_data_pipeline_spark.sources import deltalake as dl
from harmony_energy_data_pipeline_spark.sources import iceberg as ice
from harmony_energy_data_pipeline_spark.sql import snapshot_sql


def test_table_changes_native(spark, tmp_path):
    cat = Catalog(str(tmp_path / "cat"))
    snapshot_sql(spark, "CREATE TABLE nt (k INT, v DOUBLE)",
                 catalog=cat)
    snapshot_sql(spark, "INSERT INTO nt VALUES (1, 1.0), (2, 2.0)",
                 catalog=cat)
    snapshot_sql(spark, "INSERT INTO nt VALUES (3, 3.0)", catalog=cat)
    out = snapshot_sql(
        spark,
        "SELECT k, _change_type FROM TABLE_CHANGES(nt, 1) ORDER BY k",
        catalog=cat,
    ).collect()
    assert [(r.k, r._change_type) for r in out] == [(3, "insert")]
    # bounded range
    out2 = snapshot_sql(
        spark, "SELECT COUNT(*) AS n FROM TABLE_CHANGES(nt, 0, 1)",
        catalog=cat,
    ).collect()[0]
    assert out2.n == 2


def test_table_changes_iceberg_delta(spark, tmp_path):
    cat = Catalog(str(tmp_path / "cat"))
    t = os.path.join(tempfile.mkdtemp(prefix="tci_"), "t")
    ice.write_iceberg(
        spark.range(0, 5).selectExpr(
            "id AS k", "CAST(id AS DOUBLE) AS v"
        ),
        t,
    )
    base = ice.table_metadata(t)["current-snapshot-id"]
    cat.register("it", path=t, format="iceberg")
    snapshot_sql(spark, "UPDATE it SET v = -1.0 WHERE k = 2",
                 catalog=cat)
    out = snapshot_sql(
        spark,
        f"SELECT _change_type AS ct, COUNT(*) AS n "
        f"FROM TABLE_CHANGES(it, {base}) GROUP BY ct ORDER BY ct",
        catalog=cat,
    ).collect()
    assert [(r.ct, r.n) for r in out] == [("delete", 1),
                                          ("insert", 1)]
    t2 = os.path.join(tempfile.mkdtemp(prefix="tcd_"), "t")
    dl.write_delta(
        spark.range(0, 4).selectExpr(
            "id AS k", "CAST(id AS DOUBLE) AS v"
        ),
        t2,
    )
    dl.write_delta(
        spark.range(10, 12).selectExpr(
            "id AS k", "CAST(id AS DOUBLE) AS v"
        ),
        t2, mode="append",
    )
    cat.register("dt", path=t2, format="delta")
    out = snapshot_sql(
        spark,
        "SELECT COUNT(*) AS n, MAX(_commit_version) AS mv "
        "FROM TABLE_CHANGES(dt, 0)",
        catalog=cat,
    ).collect()[0]
    assert (out.n, out.mv) == (2, 1)


def test_table_changes_unknown_name_raises(spark, tmp_path):
    cat = Catalog(str(tmp_path / "cat"))
    with pytest.raises(KeyError, match="TABLE_CHANGES"):
        snapshot_sql(
            spark, "SELECT * FROM TABLE_CHANGES(ghost, 0)",
            catalog=cat,
        )


def test_describe_detail_and_tblproperties(spark, tmp_path):
    """DESCRIBE DETAIL / SHOW TBLPROPERTIES answer metadata-only for
    every registered format (round 12)."""
    from harmony_energy_data_pipeline_spark.catalog import Catalog
    from harmony_energy_data_pipeline_spark.sinks.snapshots import (
        snapshot_write,
    )
    from harmony_energy_data_pipeline_spark.sources import (
        deltalake as dl,
    )
    from harmony_energy_data_pipeline_spark.sources import (
        iceberg as ice,
    )
    from harmony_energy_data_pipeline_spark.sql import snapshot_sql

    df = spark.range(0, 20).selectExpr(
        "id AS k", "CAST(id % 2 AS STRING) AS p",
        "CAST(id AS DOUBLE) AS v",
    )
    dl.write_delta(df, str(tmp_path / "d"), partition_by=["p"])
    dl.delta_add_check_constraint(
        spark, str(tmp_path / "d"), "pos", "v >= 0"
    )
    ice.write_iceberg(df, str(tmp_path / "i"), partition_by=["p"])
    snapshot_write(df, str(tmp_path / "n"))
    cat = Catalog(str(tmp_path / "cat"))
    cat.register("d", str(tmp_path / "d"), format="delta")
    cat.register("i", str(tmp_path / "i"), format="iceberg")
    cat.register("n", str(tmp_path / "n"))
    for t, fmt in (("d", "delta"), ("i", "iceberg"),
                   ("n", "snapshot")):
        row = snapshot_sql(
            spark, f"DESCRIBE DETAIL {t}", catalog=cat
        ).collect()[0]
        assert row.format == fmt
        assert row.num_files > 0 and row.size_bytes > 0
        if t != "n":
            assert row.partition_columns == "p"
    props = {r.key: r.value for r in snapshot_sql(
        spark, "SHOW TBLPROPERTIES d", catalog=cat
    ).collect()}
    assert props["delta.constraints.pos"] == "v >= 0"
