"""Sink idempotency (mirrors /root/reference/tests/test_db_load.py:85-105)
and the end-to-end incremental pipeline."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from harmony_energy_data_pipeline_spark.pipeline.run import run_pipeline
from harmony_energy_data_pipeline_spark.schemas import MEASURE_COLS
from harmony_energy_data_pipeline_spark.sinks.upsert import RunHistory, merge_upsert, upsert_parquet
from harmony_energy_data_pipeline_spark.sources.keyset import paginate


def test_merge_upsert_source_wins(spark):
    target = spark.createDataFrame(
        [(1, 10.0), (2, 20.0)], "_id long, GAS double")
    source = spark.createDataFrame(
        [(2, 99.0), (3, 30.0)], "_id long, GAS double")
    out = {r["_id"]: r["GAS"] for r in merge_upsert(target, source).collect()}
    assert out == {1: 10.0, 2: 99.0, 3: 30.0}


def test_upsert_parquet_idempotent(spark, tmp_path):
    path = str(tmp_path / "gen.parquet")
    batch = spark.createDataFrame(
        [(1, 1000.0), (2, 2000.0)], "_id long, GAS double")
    upsert_parquet(spark, batch, path)
    upsert_parquet(spark, batch, path)  # same rows again
    df = spark.read.parquet(path)
    assert df.count() == 2              # no dupes
    assert df.filter("_id = 1").first()["GAS"] == 1000.0


def _rec(i, dt=None, **over):
    r = {"_id": i, "DATETIME": dt or f"2024-01-{(i % 27) + 1:02d}T{i % 24:02d}:00:00"}
    for c in MEASURE_COLS:
        r[c] = float(i % 50)
    r["GENERATION"] = 100.0
    r.update(over)
    return r


def test_run_pipeline_end_to_end(spark, tmp_path):
    table = str(tmp_path / "generation.parquet")
    hist = str(tmp_path / "history.parquet")
    records = [_rec(i) for i in range(1, 51)]
    records[4]["DATETIME"] = "not-a-date"  # dropped by cleaning

    def fetch(last_id, limit):
        return sorted(
            (r for r in records if r["_id"] > last_id), key=lambda r: r["_id"]
        )[:limit]

    m1 = run_pipeline(spark, fetch, table, hist, batch_size=20)
    assert m1["total_fetched"] == 50
    assert m1["valid_records"] == 49
    assert m1["last_fetched_id"] == 50
    assert spark.read.parquet(table).count() == 49

    # second run: nothing new, idempotent
    m2 = run_pipeline(spark, fetch, table, hist, batch_size=20)
    assert m2["total_fetched"] == 0
    assert spark.read.parquet(table).count() == 49

    history = RunHistory(spark, hist)
    last = history.last_successful().first()
    assert last["success"] is True
    assert spark.read.parquet(hist).count() == 2


def test_run_pipeline_records_failure(spark, tmp_path):
    table = str(tmp_path / "generation.parquet")
    hist = str(tmp_path / "history.parquet")

    def broken(last_id, limit):
        raise RuntimeError("boom")

    with pytest.raises(RuntimeError):
        run_pipeline(spark, broken, table, hist)
    row = spark.read.parquet(hist).first()
    assert row["success"] is False
    assert "boom" in row["error_message"]


def test_paginate_cursor_and_short_page():
    data = [{"_id": i} for i in range(1, 26)]

    calls = []

    def fetch(last_id, limit):
        calls.append((last_id, limit))
        return [r for r in data if r["_id"] > last_id][:limit]

    out = paginate(fetch, last_id=0, batch_size=10)
    assert [r["_id"] for r in out] == list(range(1, 26))
    assert calls == [(0, 10), (10, 10), (20, 10)]  # short page stops loop

    capped = paginate(fetch, last_id=0, batch_size=10, max_records=15)
    assert len(capped) == 15


def test_scd2_merge_change_noop_and_new_key(spark):
    from harmony_energy_data_pipeline_spark.sinks.upsert import scd2_merge

    dim = spark.createDataFrame(
        [
            (1, "BUILDING", "1995-01-01 00:00:00", None),
            (2, "MACHINERY", "1995-01-01 00:00:00", None),
            # key 2 also has an already-closed historical row
            (2, "AUTOMOBILE", "1990-01-01 00:00:00", "1995-01-01 00:00:00"),
        ],
        "k long, seg string, valid_from string, valid_to string",
    ).selectExpr(
        "k", "seg",
        "CAST(valid_from AS TIMESTAMP) AS valid_from",
        "CAST(valid_to AS TIMESTAMP) AS valid_to",
    )
    updates = spark.createDataFrame(
        [
            (1, "BUILDING", "2000-06-01 00:00:00"),   # no-op
            (2, "FURNITURE", "2000-06-01 00:00:00"),  # change
            (3, "HOUSEHOLD", "2000-06-01 00:00:00"),  # new key
        ],
        "k long, seg string, effective_ts string",
    ).selectExpr("k", "seg", "CAST(effective_ts AS TIMESTAMP) AS effective_ts")

    out = scd2_merge(dim, updates, "k", ["seg"]).collect()
    rows = {(r["k"], r["seg"], str(r["valid_from"]), str(r["valid_to"])) for r in out}
    assert rows == {
        # untouched history + no-op open row
        (2, "AUTOMOBILE", "1990-01-01 00:00:00", "1995-01-01 00:00:00"),
        (1, "BUILDING", "1995-01-01 00:00:00", "None"),
        # closed old version and its replacement
        (2, "MACHINERY", "1995-01-01 00:00:00", "2000-06-01 00:00:00"),
        (2, "FURNITURE", "2000-06-01 00:00:00", "None"),
        # brand-new key opens
        (3, "HOUSEHOLD", "2000-06-01 00:00:00", "None"),
    }


def test_scd2_merge_idempotent_on_reapply(spark):
    """Re-applying the same update batch must be a no-op: every update
    key's open row already carries the new attrs, so the second merge
    changes nothing (the S4 idempotency contract, extended to SCD2)."""
    from harmony_energy_data_pipeline_spark.sinks.upsert import scd2_merge

    dim = spark.createDataFrame(
        [
            (1, "BUILDING", "1995-01-01 00:00:00", None),
            (2, "MACHINERY", "1995-01-01 00:00:00", None),
        ],
        "k long, seg string, valid_from string, valid_to string",
    ).selectExpr(
        "k", "seg",
        "CAST(valid_from AS TIMESTAMP) AS valid_from",
        "CAST(valid_to AS TIMESTAMP) AS valid_to",
    )
    updates = spark.createDataFrame(
        [
            (2, "FURNITURE", "2000-06-01 00:00:00"),
            (3, "HOUSEHOLD", "2000-06-01 00:00:00"),
        ],
        "k long, seg string, effective_ts string",
    ).selectExpr("k", "seg", "CAST(effective_ts AS TIMESTAMP) AS effective_ts")

    def snapshot(df):
        return {
            (r["k"], r["seg"], str(r["valid_from"]), str(r["valid_to"]))
            for r in df.collect()
        }

    once = scd2_merge(dim, updates, "k", ["seg"])
    twice = scd2_merge(once, updates, "k", ["seg"])
    assert snapshot(once) == snapshot(twice)
    # and a third application with a LATER timestamp is also a no-op
    later = updates.selectExpr(
        "k", "seg", "CAST('2001-01-01 00:00:00' AS TIMESTAMP) AS effective_ts"
    )
    assert snapshot(scd2_merge(once, later, "k", ["seg"])) == snapshot(once)


def test_upsert_parquet_swap_crash_recovers_history(spark, tmp_path):
    """A crash between the swap renames must not let the next upsert
    recreate the table from only the incoming batch: the marker rolls
    the swap forward and history survives."""
    import os

    from harmony_energy_data_pipeline_spark.sinks.upsert import upsert_parquet

    path = str(tmp_path / "tbl.parquet")
    df1 = spark.createDataFrame([(1, "a"), (2, "b")], "_id long, v string")
    upsert_parquet(spark, df1, path)
    # simulate the torn window: live moved to backup, staged published
    # as marker+dir but the final rename 'crashed' before happening
    staged = str(tmp_path / "staged_new")
    spark.createDataFrame([(1, "a"), (2, "b"), (3, "c")],
                          "_id long, v string").write.parquet(staged)
    from harmony_energy_data_pipeline_spark.sinks import dirswap

    os.rename(path, path + ".__old_tmp")
    with open(path + ".__swap.json", "w") as fh:
        import json
        json.dump({"staged": staged}, fh)
    # next upsert first recovers (roll forward to staged), then merges
    upsert_parquet(spark, spark.createDataFrame([(4, "d")], "_id long, v string"), path)
    got = {r._id for r in spark.read.parquet(path).collect()}
    assert got == {1, 2, 3, 4}  # history + staged + new batch all present


def test_exact_shards_refuse_null_shard_key(spark, tmp_path):
    import pytest as _pytest

    from harmony_energy_data_pipeline_spark.sinks.export import write_jsonl_shards

    df = spark.createDataFrame(
        [(1, "x"), (None, "y"), (3, "z")], "k long, text string"
    )
    with _pytest.raises(ValueError, match="NULL"):
        write_jsonl_shards(df, str(tmp_path / "out"), n_shards=2, shard_key="k")
