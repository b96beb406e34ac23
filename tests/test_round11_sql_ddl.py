"""Round-11 SQL DDL additions: explicit-schema CREATE TABLE (empty
table), CREATE OR REPLACE TABLE, and the Iceberg CTAS partition path
(write_iceberg grew identity specs in r10 — the facade's old refusal
is gone)."""

import tempfile

import pytest
from pyspark.sql import functions as F

from harmony_energy_data_pipeline_spark.catalog import Catalog
from harmony_energy_data_pipeline_spark.sinks import snapshots as snap
from harmony_energy_data_pipeline_spark.sql import (
    snapshot_sql,
    snapshot_sql_script,
)


@pytest.fixture()
def cat():
    return Catalog(tempfile.mkdtemp(prefix="r11ddl_"))


def test_create_table_with_column_list(spark, cat):
    out = snapshot_sql_script(spark, """
      CREATE TABLE reg (k BIGINT, name STRING, score DOUBLE);
      INSERT INTO reg VALUES (1, 'a', 0.5), (2, 'b', 0.9);
      SELECT COUNT(*) AS n, SUM(score) AS s FROM reg
    """, catalog=cat).collect()[0]
    assert (out.n, round(out.s, 2)) == (2, 1.4)
    desc = {r.col_name: r.data_type for r in snapshot_sql(
        spark, "DESCRIBE reg", catalog=cat).collect()}
    assert desc == {"k": "bigint", "name": "string", "score": "double"}


def test_create_empty_then_merge(spark, cat):
    spark.createDataFrame(
        [(1, 10.0), (2, 20.0)], "k long, v double"
    ).createOrReplaceTempView("r11ddl_src")
    out = snapshot_sql_script(spark, """
      CREATE TABLE sink (k BIGINT, v DOUBLE);
      MERGE INTO sink USING r11ddl_src ON sink.k = r11ddl_src.k
        WHEN MATCHED THEN UPDATE SET *
        WHEN NOT MATCHED THEN INSERT *;
      SELECT COUNT(*) AS n FROM sink
    """, catalog=cat).collect()[0]
    assert out.n == 2


def test_create_or_replace(spark, cat):
    spark.range(0, 6).selectExpr("id AS k").createOrReplaceTempView(
        "r11ddl_b"
    )
    r = snapshot_sql(
        spark, "CREATE OR REPLACE TABLE t AS SELECT k FROM r11ddl_b",
        catalog=cat,
    ).collect()[0]
    assert r.operation == "create"
    r = snapshot_sql(
        spark,
        "CREATE OR REPLACE TABLE t AS SELECT k FROM r11ddl_b "
        "WHERE k < 2",
        catalog=cat,
    ).collect()[0]
    assert r.operation == "replace"
    path = cat.table_path("t")
    assert snap.read_snapshot(spark, path).count() == 2
    # time travel still reaches the replaced state
    assert snap.read_snapshot(spark, path, version=0).count() == 6
    with pytest.raises(ValueError, match="mutually exclusive"):
        snapshot_sql(
            spark,
            "CREATE OR REPLACE TABLE IF NOT EXISTS t AS "
            "SELECT k FROM r11ddl_b",
            catalog=cat,
        )


def test_create_errors(spark, cat):
    with pytest.raises(ValueError, match="column list OR AS"):
        snapshot_sql(
            spark,
            "CREATE TABLE x (k BIGINT) AS SELECT 1 AS k",
            catalog=cat,
        )
    with pytest.raises(ValueError, match="needs a column list"):
        snapshot_sql(spark, "CREATE TABLE x", catalog=cat)


def test_restore_table_sql(spark, cat):
    spark.range(0, 20).selectExpr(
        "id AS k", "CAST(id AS DOUBLE) AS v"
    ).createOrReplaceTempView("r11ddl_r")
    out = snapshot_sql_script(spark, """
      CREATE TABLE rt AS SELECT k, v FROM r11ddl_r;
      DELETE FROM rt WHERE k >= 10;
      RESTORE TABLE rt TO VERSION AS OF 0;
      SELECT COUNT(*) AS n FROM rt
    """, catalog=cat).collect()[0]
    assert out.n == 20
    # history preserved: the delete's version still reads
    path = cat.table_path("rt")
    assert snap.read_snapshot(spark, path, version=1).count() == 10
    # restore refuses wire-format targets through _require_native
    # (covered by the shared guard); timestamp form resolves too
    import time

    ts = time.strftime("%Y-%m-%d %H:%M:%S", time.gmtime(
        time.time() + 5
    ))
    r = snapshot_sql(
        spark, f"RESTORE TABLE rt TO TIMESTAMP AS OF '{ts}'",
        catalog=cat,
    ).collect()[0]
    assert r.operation == "restore"


def test_insert_replace_where_sql(spark, cat):
    spark.range(0, 20).selectExpr(
        "id AS k", "CAST(id AS DOUBLE) AS v"
    ).createOrReplaceTempView("r11ddl_w")
    out = snapshot_sql_script(spark, """
      CREATE TABLE wt AS SELECT k, v FROM r11ddl_w;
      INSERT INTO wt REPLACE WHERE k >= 5 AND k <= 7
        SELECT k, v * 10 AS v FROM r11ddl_w WHERE k >= 5 AND k <= 7;
      SELECT COUNT(*) AS n,
             CAST(SUM(CAST(round(v) AS BIGINT)) AS BIGINT) AS sv
      FROM wt
    """, catalog=cat).collect()[0]
    assert out.n == 20
    assert out.sv == sum(range(20)) - 18 + 180
    # out-of-region batch rows refuse (the replace_where contract)
    with pytest.raises(Exception, match="NOT matching|escape"):
        snapshot_sql(spark, """
          INSERT INTO wt REPLACE WHERE k >= 5 AND k <= 7
            SELECT k, v FROM r11ddl_w WHERE k = 12
        """, catalog=cat)


def test_show_create_table_and_explain(spark, cat):
    spark.range(0, 30).selectExpr(
        "id AS k", "CAST(id % 3 AS STRING) AS p"
    ).createOrReplaceTempView("r11ddl_s")
    snapshot_sql(
        spark,
        "CREATE TABLE st PARTITIONED BY (p) AS SELECT k, p "
        "FROM r11ddl_s",
        catalog=cat,
    )
    ddl = snapshot_sql(
        spark, "SHOW CREATE TABLE st", catalog=cat
    ).collect()[0].createtab_stmt
    assert "CREATE TABLE st" in ddl
    assert "PARTITIONED BY (p)" in ddl
    assert "USING snapshot" in ddl
    plan = snapshot_sql(
        spark,
        "EXPLAIN SELECT COUNT(*) FROM st VERSION AS OF 0 WHERE k > 5",
        catalog=cat,
    ).collect()[0][0]
    assert "Physical Plan" in plan


def test_vacuum_routes_to_delta(spark, cat):
    import tempfile as tf

    from harmony_energy_data_pipeline_spark.sources import deltalake as dl

    dpath = tf.mkdtemp(prefix="r11dv_") + "/d"
    dl.write_delta(spark.range(0, 5).selectExpr("id AS k"), dpath)
    cat.register("dvt", path=dpath, format="delta")
    r = snapshot_sql(spark, "VACUUM dvt", catalog=cat).collect()[0]
    assert r.operation == "vacuum" and r.removed_files == 0
    with pytest.raises(ValueError, match="RETAIN n VERSIONS"):
        snapshot_sql(spark, "VACUUM dvt RETAIN 2 VERSIONS", catalog=cat)


def test_iceberg_ctas_partitioned(spark, cat):
    from harmony_energy_data_pipeline_spark.sources import iceberg as ice

    spark.range(0, 30).selectExpr(
        "id AS k", "CAST(id % 3 AS STRING) AS p"
    ).createOrReplaceTempView("r11ddl_ice")
    cat.register("icet", format="iceberg")
    snapshot_sql(
        spark,
        "CREATE TABLE icet PARTITIONED BY (p) AS "
        "SELECT k, p FROM r11ddl_ice",
        catalog=cat,
    )
    path = cat.table_path("icet")
    meta = ice.table_metadata(path)
    spec = meta["partition-specs"][meta["default-spec-id"]]
    assert [f["name"] for f in spec["fields"]] == ["p"]
    got = snapshot_sql(
        spark, "SELECT COUNT(*) AS n FROM icet", catalog=cat
    ).collect()[0]
    assert got.n == 30
