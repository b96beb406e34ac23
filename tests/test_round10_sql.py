"""Round 10: SQL DML surface + named catalog + conjunctive-range
string-predicate pruning.

The facade (sql.snapshot_sql) now routes CREATE TABLE AS / INSERT /
UPDATE / DELETE / MERGE / DROP to the native snapshot ops; names
resolve through a persistent Catalog; and string WHERE predicates
that parse as pure range conjunctions PRUNE files like their triple
twins (parse_conjunctive_where).
"""

import datetime as dt
import os
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
    return Catalog(tempfile.mkdtemp())


def _seed(spark, cat, n=100, name="seedt"):
    df = spark.range(0, n).selectExpr("id AS k", "CAST(id AS DOUBLE) AS v")
    path = cat.register(name)
    snap.snapshot_write(df, path, stats_cols=["k"])
    return name, path


# --- catalog ------------------------------------------------------------------------

def test_catalog_register_resolve_unregister(cat):
    p = cat.register("t1")
    assert p == os.path.join(cat.root, "t1")
    assert cat.resolve("t1") == {"path": p, "format": "auto"}
    assert "t1" in cat
    # same-name re-register without replace: returns existing binding
    assert cat.register("t1") == p
    with pytest.raises(ValueError, match="re-point"):
        cat.register("t1", path="/elsewhere")
    p2 = cat.register("t1", path="/elsewhere", replace=True)
    assert p2 == "/elsewhere"
    cat.unregister("t1")
    assert "t1" not in cat
    with pytest.raises(KeyError):
        cat.resolve("t1")


def test_catalog_rejects_bad_input(cat):
    with pytest.raises(ValueError, match="invalid table name"):
        cat.register("1bad")
    with pytest.raises(ValueError, match="format"):
        cat.register("ok", format="hudi")


# --- CREATE / INSERT ----------------------------------------------------------------

def test_ctas_and_if_not_exists(spark, cat):
    spark.range(0, 50).selectExpr("id AS k").createOrReplaceTempView(
        "r10_src"
    )
    r = snapshot_sql(
        spark, "CREATE TABLE ct AS SELECT k, k * 2 AS v FROM r10_src",
        catalog=cat,
    ).collect()[0]
    assert (r.operation, r.version) == ("create", 0)
    assert snapshot_sql(
        spark, "SELECT COUNT(*) AS n FROM ct", catalog=cat
    ).collect()[0].n == 50
    with pytest.raises(FileExistsError):
        snapshot_sql(
            spark, "CREATE TABLE ct AS SELECT 1 AS x", catalog=cat
        )
    r = snapshot_sql(
        spark,
        "CREATE TABLE IF NOT EXISTS ct AS SELECT 1 AS x",
        catalog=cat,
    ).collect()[0]
    assert r.operation == "create_skipped"


def test_ctas_partitioned_lands_partition_spec(spark, cat):
    spark.range(0, 60).selectExpr(
        "id AS k", "CAST(id % 3 AS STRING) AS p"
    ).createOrReplaceTempView("r10_psrc")
    snapshot_sql(
        spark,
        "CREATE TABLE cpt PARTITIONED BY (p) AS "
        "SELECT k, p FROM r10_psrc",
        catalog=cat,
    )
    m = snap._read_manifest(cat.table_path("cpt"), 0)
    assert m.get("partition_cols") == ["p"]
    # exact partition pruning works through the facade's table
    kept, total = snap.prune_files(cat.table_path("cpt"), "p = '1'")
    assert len(kept) < total


def test_ctas_without_catalog_or_binding_raises(spark):
    with pytest.raises(KeyError, match="unregistered"):
        snapshot_sql(spark, "CREATE TABLE nope AS SELECT 1 AS x")


def test_insert_values_select_and_alignment(spark, cat):
    name, path = _seed(spark, cat)
    snapshot_sql(
        spark, f"INSERT INTO {name} VALUES (1000, 5.5), (1001, 6.5)",
        catalog=cat,
    )
    # named-column subset: v absent → null-filled, k cast from int
    snapshot_sql(
        spark, f"INSERT INTO {name} (k) VALUES (2000)", catalog=cat
    )
    got = snap.read_snapshot(spark, path)
    assert got.count() == 103
    assert got.filter("k = 2000").collect()[0].v is None
    # extra column the table lacks → refuses
    with pytest.raises(Exception, match="columns .* the table lacks"):
        snapshot_sql(
            spark,
            f"INSERT INTO {name} (k, v, extra) VALUES (1, 1.0, 9)",
            catalog=cat,
        )


def test_insert_into_delta_table_appends(spark, cat):
    from harmony_energy_data_pipeline_spark.sources import deltalake as dl

    path = os.path.join(tempfile.mkdtemp(), "d")
    dl.write_delta(
        spark.range(0, 10).selectExpr("id AS k", "CAST(id AS DOUBLE) AS v"), path
    )
    cat.register("dtab", path=path, format="delta")
    snapshot_sql(
        spark, "INSERT INTO dtab VALUES (100, 1.5)", catalog=cat
    )
    assert dl.read_delta(spark, path).count() == 11
    # row-level DML now runs IN the wire format (round 11): DELETE
    # lands deletion vectors, UPDATE DVs + re-appends — no adoption
    snapshot_sql(spark, "DELETE FROM dtab WHERE k = 1", catalog=cat)
    assert dl.read_delta(spark, path).count() == 10
    snapshot_sql(
        spark, "UPDATE dtab SET v = 0 WHERE k = 2", catalog=cat
    )
    rows = {r.k: r.v for r in dl.read_delta(spark, path).collect()}
    assert 1 not in rows and rows[2] == 0.0


# --- UPDATE / DELETE / MERGE --------------------------------------------------------

def test_update_delete_merge_roundtrip(spark, cat):
    name, path = _seed(spark, cat, n=100)
    snapshot_sql(
        spark,
        f"UPDATE {name} SET v = v * 10 WHERE k >= 10 AND k < 20",
        catalog=cat,
    )
    snapshot_sql(spark, f"DELETE FROM {name} WHERE k % 7 = 0",
                 catalog=cat)
    snapshot_sql(
        spark,
        f"MERGE INTO {name} USING "
        "(SELECT 10 AS k, -1.0 AS v UNION ALL SELECT 500 AS k, 2.0 AS v)"
        f" AS s ON {name}.k = s.k "
        "WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *",
        catalog=cat,
    )
    rows = {
        r.k: r.v for r in snap.read_snapshot(spark, path).collect()
    }
    assert 0 not in rows and 7 not in rows          # deleted
    assert rows[11] == 110.0                        # updated
    assert rows[10] == -1.0                         # merge-updated
    assert rows[500] == 2.0                         # merge-inserted
    assert len(rows) == 100 - 15 + 1                # 15 multiples of 7


def test_delete_without_where_empties_table(spark, cat):
    name, path = _seed(spark, cat, n=20)
    snapshot_sql(spark, f"DELETE FROM {name}", catalog=cat)
    assert snap.read_snapshot(spark, path).count() == 0


def test_update_set_list_with_function_commas(spark, cat):
    name, path = _seed(spark, cat, n=10)
    snapshot_sql(
        spark,
        f"UPDATE {name} SET v = greatest(v, 5.0), k = k + 100 "
        "WHERE k <= 3",
        catalog=cat,
    )
    rows = {r.k: r.v for r in snap.read_snapshot(spark, path).collect()}
    assert rows[100] == 5.0 and rows[103] == 5.0 and rows[9] == 9.0


def test_merge_named_source_and_travel_refusals(spark, cat):
    name, path = _seed(spark, cat, n=10, name="tgt10")
    src_path = cat.register("src10")
    snap.snapshot_write(
        spark.range(8, 12).selectExpr("id AS k", "CAST(-id AS DOUBLE) AS v"),
        src_path,
    )
    snapshot_sql(
        spark,
        "MERGE INTO tgt10 USING src10 ON tgt10.k = src10.k "
        "WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *",
        catalog=cat,
    )
    rows = {r.k: r.v for r in snap.read_snapshot(spark, path).collect()}
    assert rows[8] == -8.0 and rows[11] == -11.0 and len(rows) == 12
    for stmt in (
        "UPDATE tgt10 VERSION AS OF 0 SET v = 0",
        "DELETE FROM tgt10 VERSION AS OF 0",
        "INSERT INTO tgt10 VERSION AS OF 0 VALUES (1, 1.0)",
        "MERGE INTO tgt10 VERSION AS OF 0 USING src10 ON tgt10.k = "
        "src10.k WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN "
        "INSERT *",
    ):
        with pytest.raises(ValueError, match="time travel"):
            snapshot_sql(spark, stmt, catalog=cat)


def test_merge_rich_forms_route_and_key_rule_stays(spark, cat):
    _seed(spark, cat, n=5, name="m10")
    cat.register("m10b", path=cat.table_path("m10"))
    # a rich WHEN form now routes to snapshot_merge_when (round 11)
    r = snapshot_sql(
        spark,
        "MERGE INTO m10 USING m10b ON m10.k = m10b.k "
        "WHEN MATCHED THEN DELETE",
        catalog=cat,
    ).collect()[0]
    assert r.operation == "merge"
    path = cat.table_path("m10")
    assert snap.read_snapshot(spark, path).count() == 0  # self-merge
    # differently-named keys are legal now (round 11) — but only
    # when the rename is unambiguous; here the source ALSO has 'k'
    with pytest.raises(ValueError, match="also has a column"):
        snapshot_sql(
            spark,
            "MERGE INTO m10 USING m10b ON m10.k = m10b.v "
            "WHEN MATCHED THEN UPDATE SET * "
            "WHEN NOT MATCHED THEN INSERT *",
            catalog=cat,
        )


def test_drop_table_is_metadata_only(spark, cat):
    name, path = _seed(spark, cat, n=5)
    snapshot_sql(spark, f"DROP TABLE {name}", catalog=cat)
    assert name not in cat
    assert snap.read_snapshot(spark, path).count() == 5  # data intact
    r = snapshot_sql(
        spark, f"DROP TABLE IF EXISTS {name}", catalog=cat
    ).collect()[0]
    assert r.operation == "drop_skipped"
    with pytest.raises(KeyError):
        snapshot_sql(spark, f"DROP TABLE {name}", catalog=cat)


def test_unsupported_statement_raises(spark, cat):
    with pytest.raises(ValueError, match="unsupported statement"):
        snapshot_sql(spark, "TRUNCATE TABLE x", catalog=cat)


def test_explicit_tables_dict_wins_over_catalog(spark, cat):
    _seed(spark, cat, n=5, name="dup10")
    other = os.path.join(tempfile.mkdtemp(), "o")
    snap.snapshot_write(
        spark.range(0, 3).selectExpr("id AS k", "CAST(id AS DOUBLE) AS v"), other
    )
    n = snapshot_sql(
        spark, "SELECT COUNT(*) AS n FROM dup10",
        tables={"dup10": other}, catalog=cat,
    ).collect()[0].n
    assert n == 3


# --- conjunctive-range string pruning -----------------------------------------------

def test_string_where_prunes_like_triples(spark):
    path = os.path.join(tempfile.mkdtemp(), "t")
    df = spark.range(0, 1000).selectExpr("id AS k", "id * 2 AS v")
    snap.snapshot_write(
        df.repartitionByRange(10, "k").sortWithinPartitions("k"),
        path, stats_cols=["k"],
    )
    kept_s, total = snap.prune_files(path, "k >= 100 AND k < 200")
    kept_t, _ = snap.prune_files(path, [("k", 100, 200)])
    assert sorted(kept_s) == sorted(kept_t) and len(kept_s) < total
    # literal-first form flips correctly
    kept_f, _ = snap.prune_files(path, "100 <= k AND 200 > k")
    assert sorted(kept_f) == sorted(kept_s)
    # anything richer: conservative keep-all (correctness via residual)
    kept_r, _ = snap.prune_files(path, "k % 2 = 0 OR k = 5")
    assert len(kept_r) == total
    # results identical either way
    a = snap.read_snapshot(spark, path, where="k >= 100 AND k < 200")
    assert a.count() == 100


def test_parse_conjunctive_where_units():
    p = snap.parse_conjunctive_where
    assert p("k = 5") == [("k", 5, 5)]
    assert p("k >= 1.5 AND k <= 2.5") == [("k", 1.5, None),
                                          ("k", None, 2.5)]
    assert p("name = 'x y'") == [("name", "x y", "x y")]
    assert p("ts >= TIMESTAMP '2024-01-16 00:00:00'") == [
        ("ts", dt.datetime(2024, 1, 16), None)
    ]
    assert p("d < DATE '2024-02-01'") == [("d", None, dt.date(2024, 2, 1))]
    for bad in ("k = 5 OR j = 2", "k IN (1,2)", "NOT k = 1",
                "upper(n) = 'A'", "k != 3", "k IS NULL",
                "k BETWEEN 1 AND 2", "k <> 3"):
        assert p(bad) is None, bad


def test_string_where_timestamp_prunes(spark):
    path = os.path.join(tempfile.mkdtemp(), "t")
    df = spark.range(0, 240).selectExpr(
        "id AS k",
        "timestamp'2024-01-01 00:00:00' + make_interval(0,0,0,0,id) AS ts",
    )
    snap.snapshot_write(
        df.repartitionByRange(6, "ts").sortWithinPartitions("ts"),
        path, stats_cols=["ts"],
    )
    w = ("ts >= TIMESTAMP '2024-01-03 00:00:00' "
         "AND ts < TIMESTAMP '2024-01-05 00:00:00'")
    kept, total = snap.prune_files(path, w)
    assert len(kept) < total
    assert snap.read_snapshot(spark, path, where=w).count() == 48


def test_script_returns_last_statement(spark, cat):
    out = snapshot_sql_script(
        spark,
        """
        CREATE TABLE sc10 AS SELECT 1 AS k, 1.0 AS v;
        INSERT INTO sc10 VALUES (2, 2.0);
        SELECT COUNT(*) AS n FROM sc10
        """,
        catalog=cat,
    )
    assert out.collect()[0].n == 2


# --- round 10, second wave: Iceberg in SQL + named-ref travel ------------------------

def test_sql_over_iceberg_catalog_table(spark, cat):
    from harmony_energy_data_pipeline_spark.sources import iceberg as ice

    path = os.path.join(tempfile.mkdtemp(), "ice")
    s1 = ice.write_iceberg(
        spark.range(0, 30).selectExpr("id AS k", "CAST(id AS DOUBLE) AS v"),
        path,
    )
    cat.register("icet", path=path, format="iceberg")
    assert snapshot_sql(
        spark, "SELECT COUNT(*) AS n FROM icet", catalog=cat
    ).collect()[0].n == 30
    # INSERT appends through the Iceberg writer
    snapshot_sql(spark, "INSERT INTO icet VALUES (100, 1.5)", catalog=cat)
    assert ice.read_iceberg(spark, path).count() == 31
    # travel by snapshot id
    n = snapshot_sql(
        spark, f"SELECT COUNT(*) AS n FROM icet VERSION AS OF {s1}",
        catalog=cat,
    ).collect()[0].n
    assert n == 30
    # row-level DML now runs IN the wire format (round 11): DELETE
    # lands a position-delete snapshot
    snapshot_sql(spark, "DELETE FROM icet WHERE k = 1", catalog=cat)
    assert ice.read_iceberg(spark, path).count() == 30
    assert 1 not in {
        r.k for r in ice.read_iceberg(spark, path).collect()
    }


def test_sql_named_ref_travel(spark, cat):
    from harmony_energy_data_pipeline_spark.sinks import refs

    name, path = _seed(spark, cat, n=40, name="reft")
    refs.create_tag(path, "gold")
    snapshot_sql(spark, f"DELETE FROM {name} WHERE k >= 20", catalog=cat)
    bp = refs.create_branch(path, "exp-1")
    snap.snapshot_write(
        spark.range(500, 510).selectExpr("id AS k",
                                         "CAST(id AS DOUBLE) AS v"),
        bp, mode="append",
    )
    # tag reads the pinned version, branch reads the branch table,
    # bare name reads the live table — all in one statement
    row = snapshot_sql(
        spark,
        f"SELECT (SELECT COUNT(*) FROM {name} VERSION AS OF 'gold') "
        "AS tag_n, "
        f"(SELECT COUNT(*) FROM {name} VERSION AS OF 'exp-1') AS br_n, "
        f"(SELECT COUNT(*) FROM {name}) AS live_n",
        catalog=cat,
    ).collect()[0]
    assert (row.tag_n, row.br_n, row.live_n) == (40, 30, 20)
    with pytest.raises(KeyError, match="no tag or branch"):
        snapshot_sql(
            spark, f"SELECT * FROM {name} VERSION AS OF 'nope'",
            catalog=cat,
        )


def test_sql_ctas_into_registered_iceberg_format(spark, cat):
    from harmony_energy_data_pipeline_spark.sources import iceberg as ice

    path = os.path.join(tempfile.mkdtemp(), "newice")
    cat.register("nice", path=path, format="iceberg")
    spark.range(0, 12).selectExpr("id AS k").createOrReplaceTempView(
        "r10_ice_src"
    )
    snapshot_sql(
        spark, "CREATE TABLE nice AS SELECT k FROM r10_ice_src",
        catalog=cat,
    )
    assert ice.read_iceberg(spark, path).count() == 12
    assert snapshot_sql(
        spark, "SELECT COUNT(*) AS n FROM nice", catalog=cat
    ).collect()[0].n == 12


def test_sql_maintenance_statements(spark, cat):
    name, path = _seed(spark, cat, n=60, name="maint10")
    # fragment the table, then OPTIMIZE compacts it
    for i in range(3):
        snapshot_sql(
            spark, f"INSERT INTO {name} VALUES ({900 + i}, 1.0)",
            catalog=cat,
        )
    files_before = len(snap._read_manifest(
        path, snap.latest_version(path))["files"])
    r = snapshot_sql(spark, f"OPTIMIZE {name}", catalog=cat).collect()[0]
    assert r.operation == "optimize"
    files_after = len(snap._read_manifest(
        path, snap.latest_version(path))["files"])
    assert files_after < files_before
    # VACUUM reclaims expired versions' files
    r = snapshot_sql(
        spark, f"VACUUM {name} RETAIN 1 VERSIONS", catalog=cat
    ).collect()[0]
    assert r.operation == "vacuum" and r.version is None
    assert r.removed_files >= 0
    assert snap.read_snapshot(spark, path).count() == 63
    # ANALYZE commits column stats readable via the analyze module
    from harmony_energy_data_pipeline_spark.sinks import analyze as az

    snapshot_sql(spark, f"ANALYZE {name}", catalog=cat)
    assert az.snapshot_column_stats(path)["columns"]["k"]["ndv_est"] > 0
    # SHOW TABLES / DESCRIBE
    shows = {r.table: r.format for r in snapshot_sql(
        spark, "SHOW TABLES", catalog=cat).collect()}
    assert shows.get(name) == "snapshot"
    desc = {r.col_name: r.data_type for r in snapshot_sql(
        spark, f"DESCRIBE {name}", catalog=cat).collect()}
    assert desc == {"k": "bigint", "v": "double"}


def test_sql_alter_table_surface(spark, cat):
    from harmony_energy_data_pipeline_spark.sinks import refs

    name, path = _seed(spark, cat, n=30, name="alter10")
    snapshot_sql(spark, f"ALTER TABLE {name} ADD COLUMN note string",
                 catalog=cat)
    snapshot_sql(spark, f"ALTER TABLE {name} RENAME COLUMN v TO val",
                 catalog=cat)
    snapshot_sql(
        spark, f"ALTER TABLE {name} ADD CONSTRAINT CHECK (k >= 0)",
        catalog=cat,
    )
    desc = {r.col_name for r in snapshot_sql(
        spark, f"DESCRIBE {name}", catalog=cat).collect()}
    assert desc == {"k", "val", "note"}
    got = snapshot_sql(
        spark, f"SELECT k, val, note FROM {name} WHERE k = 3",
        catalog=cat,
    ).collect()[0]
    assert got.val == 3.0 and got.note is None
    # constraint enforces on the next write
    with pytest.raises(Exception, match="constraint|Constraint"):
        snapshot_sql(
            spark, f"INSERT INTO {name} VALUES (-5, 1.0, 'x')",
            catalog=cat,
        )
    # widen (lossless only: long->double correctly refuses), drop column
    with pytest.raises(Exception, match="lossless"):
        snapshot_sql(
            spark, f"ALTER TABLE {name} ALTER COLUMN k TYPE double",
            catalog=cat,
        )
    snapshot_sql(spark, f"ALTER TABLE {name} ADD COLUMN cnt int",
                 catalog=cat)
    snapshot_sql(
        spark, f"ALTER TABLE {name} ALTER COLUMN cnt TYPE long",
        catalog=cat,
    )
    snapshot_sql(spark, f"ALTER TABLE {name} DROP COLUMN note",
                 catalog=cat)
    desc = {r.col_name: r.data_type for r in snapshot_sql(
        spark, f"DESCRIBE {name}", catalog=cat).collect()}
    assert desc == {"k": "bigint", "val": "double", "cnt": "bigint"}
    # refs via SQL
    snapshot_sql(spark, f"ALTER TABLE {name} CREATE TAG 'rel-1'",
                 catalog=cat)
    snapshot_sql(spark, f"ALTER TABLE {name} CREATE BRANCH 'exp'",
                 catalog=cat)
    snapshot_sql(spark, f"DELETE FROM {name} WHERE k >= 10", catalog=cat)
    row = snapshot_sql(
        spark,
        f"SELECT (SELECT COUNT(*) FROM {name} VERSION AS OF 'rel-1') "
        f"AS t, (SELECT COUNT(*) FROM {name} VERSION AS OF 'exp') AS b, "
        f"(SELECT COUNT(*) FROM {name}) AS l",
        catalog=cat,
    ).collect()[0]
    assert (row.t, row.b, row.l) == (30, 30, 10)
    snapshot_sql(spark, f"ALTER TABLE {name} DROP BRANCH 'exp'",
                 catalog=cat)
    snapshot_sql(spark, f"ALTER TABLE {name} DROP TAG 'rel-1'",
                 catalog=cat)
    assert refs.list_tags(path) == {} and refs.list_branches(path) == {}
    # partition spec evolution via SQL
    snapshot_sql(
        spark, f"ALTER TABLE {name} SET PARTITION SPEC (val)",
        catalog=cat,
    )
    m = snap._read_manifest(path, snap.latest_version(path))
    assert m["partition_cols"] == ["val"]
    with pytest.raises(ValueError, match="unsupported ALTER"):
        snapshot_sql(spark, f"ALTER TABLE {name} FROB", catalog=cat)


def test_insert_overwrite_and_describe_history(spark, cat):
    name, path = _seed(spark, cat, n=40, name="iow10")
    snapshot_sql(
        spark,
        f"INSERT OVERWRITE {name} SELECT 1 AS k, CAST(9 AS DOUBLE) AS v",
        catalog=cat,
    )
    assert snap.read_snapshot(spark, path).count() == 1
    # history shows both commits; time travel still reaches the past
    hist = snapshot_sql(
        spark, f"DESCRIBE HISTORY {name}", catalog=cat
    ).collect()
    assert [h.version for h in hist] == [0, 1]
    assert hist[1].operation == "overwrite"
    assert snapshot_sql(
        spark, f"SELECT COUNT(*) AS n FROM {name} VERSION AS OF 0",
        catalog=cat,
    ).collect()[0].n == 40
    with pytest.raises(ValueError, match="time travel"):
        snapshot_sql(
            spark,
            f"INSERT OVERWRITE {name} VERSION AS OF 0 SELECT 1 AS k",
            catalog=cat,
        )
