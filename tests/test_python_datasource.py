"""Spark 4 Python DataSource: keyset pages with cursor pushdown
(batch) and incremental file-index offsets (streaming)."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.datasource import GreaterThan
from pyspark.sql.types import StructType

from harmony_energy_data_pipeline_spark.sources.pyds import (
    KeysetPagesDataSource,
    KeysetPagesReader,
    write_pages,
)

DDL = "_id BIGINT, DATETIME STRING, GENERATION DOUBLE"


def _records(n=500):
    return [
        {"_id": i, "DATETIME": f"2024-01-01T{i % 24:02d}:00:00", "GENERATION": float(i)}
        for i in range(1, n + 1)
    ]


def test_batch_read_and_cursor_pushdown(spark, tmp_path):
    d = str(tmp_path / "pages")
    write_pages(_records(500), d, page_size=100)  # 5 pages
    spark.dataSource.register(KeysetPagesDataSource)
    df = (
        spark.read.format("keyset_pages").schema(DDL).option("path", d).load()
    )
    assert df.count() == 500
    after = df.filter(F.col("_id") > 250)
    assert after.count() == 250
    assert after.agg(F.min("_id")).first()[0] == 251


def test_pushdown_skips_whole_pages(spark, tmp_path):
    d = str(tmp_path / "pages")
    write_pages(_records(500), d, page_size=100)
    schema = spark.createDataFrame([], DDL).schema
    rdr = KeysetPagesReader(d, schema)
    remaining = list(rdr.pushFilters([GreaterThan(("_id",), 250)]))
    assert remaining == []          # the cursor filter is fully absorbed
    parts = rdr.partitions()
    assert len(parts) == 3          # pages 1-100 and 101-200 never opened


def test_stream_read_incremental(spark, tmp_path):
    d = str(tmp_path / "pages")
    write_pages(_records(300), d, page_size=100)
    spark.dataSource.register(KeysetPagesDataSource)
    stream = (
        spark.readStream.format("keyset_pages").schema(DDL).option("path", d).load()
    )
    q = (
        stream.writeStream.format("memory").queryName("keyset_stream")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    assert spark.table("keyset_stream").count() == 300
    # late-arriving page becomes the next micro-batch on restart
    write_pages([{"_id": i, "DATETIME": "2024-01-02T00:00:00", "GENERATION": 1.0}
                 for i in range(301, 401)], d, page_size=100)
    q2 = (
        stream.writeStream.format("memory").queryName("keyset_stream2")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q2.awaitTermination(120)
    assert spark.table("keyset_stream2").count() == 400


def test_page_order_numeric_across_digit_boundary(tmp_path):
    """Lexicographic file order would put page_1001_1100 before
    page_101_200 and corrupt positional stream offsets."""
    from harmony_energy_data_pipeline_spark.sources.pyds import _page_files
    d = str(tmp_path / "pages")
    write_pages(_records(1100), d, page_size=100)  # ids 1..1100 -> 11 pages
    files = _page_files(d)
    los = [lo for _f, lo, _hi in files]
    assert los == sorted(los)
    assert los[-1] == 1001  # the 4-digit page really is last


def test_pushdown_cursor_zero_not_regressed(spark, tmp_path):
    from pyspark.sql.datasource import GreaterThanOrEqual
    schema = spark.createDataFrame([], DDL).schema
    d = str(tmp_path / "pages")
    write_pages(_records(10), d, page_size=5)
    rdr = KeysetPagesReader(d, schema)
    list(rdr.pushFilters([GreaterThan(("_id",), 0)]))
    list(rdr.pushFilters([GreaterThanOrEqual(("_id",), -4)]))
    assert rdr.cursor == 0  # the weaker filter must not regress the bound


# ---------------------------------------------------------------------------
# SQLite table source (reference's serve store, S5/S6)
# ---------------------------------------------------------------------------

def _mk_db(tmp_path):
    from harmony_energy_data_pipeline_spark.sources.sqlitedb import write_sqlite_table

    db = str(tmp_path / "app.db")
    rows = [(i, f"u{i % 3}", float(i) if i % 7 else None) for i in range(1, 101)]
    write_sqlite_table(db, "events", ["event_id", "name", "value"], rows)
    return db, rows


def _read(spark, db, parts=4):
    from harmony_energy_data_pipeline_spark.sources.sqlitedb import SqliteTableDataSource

    spark.dataSource.register(SqliteTableDataSource)
    return (
        spark.read.format("sqlite_table")
        .schema("event_id BIGINT, name STRING, value DOUBLE")
        .option("path", db).option("table", "events")
        .option("numPartitions", str(parts))
        .load()
    )


def test_sqlite_source_full_scan_partitioned(spark, tmp_path):
    db, rows = _mk_db(tmp_path)
    got = sorted(tuple(r) for r in _read(spark, db, parts=7).collect())
    assert got == sorted(rows)
    assert _read(spark, db).rdd.getNumPartitions() == 4


def test_sqlite_source_pushes_comparison_and_null_filters(spark, tmp_path):
    from pyspark.sql import functions as F

    db, rows = _mk_db(tmp_path)
    df = _read(spark, db).filter((F.col("event_id") > 50) & F.col("value").isNotNull())
    want = [r for r in rows if r[0] > 50 and r[2] is not None]
    assert sorted(tuple(r) for r in df.collect()) == sorted(want)
    # equality pushdown on a string column
    df2 = _read(spark, db).filter(F.col("name") == "u1")
    assert df2.count() == sum(1 for r in rows if r[1] == "u1")


def test_sqlite_source_empty_table(spark, tmp_path):
    from harmony_energy_data_pipeline_spark.sources.sqlitedb import write_sqlite_table

    db = str(tmp_path / "empty.db")
    write_sqlite_table(db, "events", ["event_id", "name", "value"], [])
    assert _read(spark, db).count() == 0


def test_sqlite_sink_upsert_atomic_and_idempotent(spark, tmp_path):
    """The write sink: executor tasks stage JSONL, the driver commit
    applies everything in one INSERT OR REPLACE transaction — rerun
    replaces the same keys (S4 idempotency against the real store)."""
    from harmony_energy_data_pipeline_spark.sources.sqlitedb import SqliteTableDataSource

    spark.dataSource.register(SqliteTableDataSource)
    db = str(tmp_path / "sink.db")
    stage = str(tmp_path / "stage")

    def write(df):
        (df.write.format("sqlite_table")
         .option("path", db).option("table", "gen").option("key", "_id")
         .option("stageDir", stage)
         .mode("append").save())

    df1 = spark.createDataFrame(
        [(1, 10.0), (2, 20.0), (3, 30.0)], "_id long, v double"
    ).repartition(3)
    write(df1)
    # upsert batch: update key 2, add key 4
    write(spark.createDataFrame([(2, 99.0), (4, 40.0)], "_id long, v double"))
    # idempotent rerun of the same batch
    write(spark.createDataFrame([(2, 99.0), (4, 40.0)], "_id long, v double"))

    back = (
        spark.read.format("sqlite_table")
        .schema("_id BIGINT, v DOUBLE")
        .option("path", db).option("table", "gen")
        .load()
    )
    got = {r["_id"]: r["v"] for r in back.collect()}
    assert got == {1: 10.0, 2: 99.0, 3: 30.0, 4: 40.0}
    import os
    assert not os.listdir(stage)  # staged files cleaned up on commit


def test_sqlite_upsert_writes_timestamps_and_decimals(spark, tmp_path):
    """The GENERATION table's DATETIME column is TimestampType: the
    writer must stage datetime (and other non-JSON types) as SQLite-
    compatible text instead of crashing in json.dumps."""
    import sqlite3

    from harmony_energy_data_pipeline_spark.sources.sqlitedb import (
        SqliteTableDataSource,
    )

    spark.dataSource.register(SqliteTableDataSource)
    db = str(tmp_path / "ts.db")
    df = spark.createDataFrame(
        [(1, "2024-03-01 12:30:00", 2.5), (2, "2024-03-01 13:00:00", 3.5)],
        "_id long, DATETIME string, v double",
    ).select("_id", F.to_timestamp("DATETIME").alias("DATETIME"), "v")
    (df.write.format("sqlite_table")
       .option("path", db).option("table", "generation").option("key", "_id")
       .mode("append").save())
    con = sqlite3.connect(db)
    rows = con.execute("SELECT _id, DATETIME, v FROM generation ORDER BY _id").fetchall()
    con.close()
    assert rows == [(1, "2024-03-01 12:30:00", 2.5), (2, "2024-03-01 13:00:00", 3.5)]


def test_records_to_df_stringifies_numbers_for_string_fields(spark):
    """A CKAN page can deliver JSON numbers where the raw schema says
    string — lenient ingest stringifies instead of raising."""
    from pyspark.sql import types as T

    from harmony_energy_data_pipeline_spark.sources.keyset import records_to_df

    schema = T.StructType([
        T.StructField("_id", T.LongType()),
        T.StructField("GENERATION", T.StringType()),
    ])
    out = records_to_df(spark, [{"_id": 7, "GENERATION": 25000.5},
                                {"_id": 8, "GENERATION": "123"},
                                {"_id": 9}], schema).collect()
    got = {r._id: r.GENERATION for r in out}
    assert got == {7: "25000.5", 8: "123", 9: None}


def test_write_pages_distributed_matches_driver_writer(spark, tmp_path):
    """Round-5: the executor-side page writer (no driver collect) must
    produce a directory the reader sees identically to write_pages —
    same rows, valid min/max page names, pushdown still skips files."""
    from pyspark.sql.datasource import GreaterThan as GT

    from harmony_energy_data_pipeline_spark.sources.pyds import (
        KeysetPagesReader,
        write_pages_distributed,
    )

    recs = _records(500)
    df = spark.createDataFrame(recs, DDL)
    d = str(tmp_path / "pages_dist")
    write_pages_distributed(df, d, page_size=50)
    spark.dataSource.register(KeysetPagesDataSource)
    back = (
        spark.read.format("keyset_pages").schema(DDL).option("path", d).load()
    )
    got = sorted(
        (r["_id"], r["DATETIME"], r["GENERATION"]) for r in back.collect()
    )
    want = sorted((r["_id"], r["DATETIME"], r["GENERATION"]) for r in recs)
    assert got == want
    # every page name's min/max brackets its contents (keyset invariant)
    import json as _json
    import os as _os

    for name in _os.listdir(d):
        assert name.startswith("page_") and name.endswith(".jsonl"), name
        _, lo, hi = name[:-6].split("_")
        ids = [
            _json.loads(line)["_id"]
            for line in open(_os.path.join(d, name), encoding="utf-8")
        ]
        assert ids == sorted(ids)
        assert ids[0] == int(lo) and ids[-1] == int(hi)
    # cursor pushdown still skips whole files (count FILES across the
    # bundles, not partitions — r13's slot-derived bundling keeps the
    # partition count at the scheduler width while pruning shrinks
    # each bundle)
    schema = spark.createDataFrame([], DDL).schema
    rdr = KeysetPagesReader(d, schema)
    assert list(rdr.pushFilters([GT(("_id",), 250)])) == []
    n_files_all = sum(
        len(p.files) for p in KeysetPagesReader(d, schema).partitions()
    )
    n_files_pruned = sum(len(p.files) for p in rdr.partitions())
    assert n_files_pruned < n_files_all


def test_keyset_reader_bundles_pages_to_scheduler_width(spark, tmp_path):
    """r13: scan width derives from the scheduler's slot count, not a
    hard 128-partition cap — many small pages bundle into ~slots tasks
    (each a multi-file bundle), and the bundles partition the live
    file set exactly (no file lost or duplicated)."""
    from harmony_energy_data_pipeline_spark.sources.pyds import (
        KeysetPagesReader,
        write_pages_distributed,
    )

    recs = _records(960)
    df = spark.createDataFrame(recs, DDL)
    d = str(tmp_path / "pages_width")
    write_pages_distributed(df, d, page_size=10)  # 96 small pages
    schema = spark.createDataFrame([], DDL).schema
    rdr = KeysetPagesReader(d, schema)
    parts = rdr.partitions()
    slots = spark.sparkContext.defaultParallelism
    n_live = sum(len(p.files) for p in parts)
    assert n_live == 96
    # bounded by the slot count (plus the ceil remainder bundle), far
    # below one-task-per-page; never below the 50-files/task cap width
    import math

    target = min(96, max(slots, math.ceil(96 / rdr.TARGET_FILES_PER_TASK)))
    assert len(parts) <= target
    assert len(parts) < 96 or slots >= 96
    # every file appears exactly once across bundles
    seen = [f for p in parts for f in p.files]
    assert len(seen) == len(set(seen)) == 96
