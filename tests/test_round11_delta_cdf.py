"""Delta wire-format CHANGE DATA FEED reads (round 11):
``read_delta_changes`` replays ``cdc`` actions (authoritative when
present), synthesizes inserts from blind appends, skips
dataChange=false commits, and refuses unrecoverable rewrites —
the ``table_changes`` surface over a foreign CDF table."""

import json
import os
import tempfile

import pytest
from pyspark.sql import functions as F

from harmony_energy_data_pipeline_spark.sources import deltalake as dl


def _tmp():
    return os.path.join(tempfile.mkdtemp(prefix="dcdf_"), "t")


def _write_cdc_commit(spark, t, version, cdc_rows, adds=None,
                      removes=None):
    """Hand-craft a foreign CDF commit: _change_data parquet + cdc
    action (+ optional add/remove actions the feed must IGNORE when
    cdc is present)."""
    os.makedirs(os.path.join(t, "_change_data"), exist_ok=True)
    fname = f"_change_data/cdc-{version}.parquet"
    spark.createDataFrame(
        cdc_rows, "k long, v double, _change_type string"
    ).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(t, "_cdcstage")
    )
    part = next(
        n for n in os.listdir(os.path.join(t, "_cdcstage"))
        if n.endswith(".parquet")
    )
    os.replace(os.path.join(t, "_cdcstage", part),
               os.path.join(t, fname))
    acts = [{"cdc": {
        "path": fname, "partitionValues": {},
        "size": os.path.getsize(os.path.join(t, fname)),
        "dataChange": False,
    }}]
    for a in (adds or []):
        acts.append({"add": a})
    for r in (removes or []):
        acts.append({"remove": r})
    with open(dl._log_path(t, version), "w") as fh:
        for a in acts:
            fh.write(json.dumps(a) + "\n")


def test_cdf_replay_cdc_appends_and_noop(spark):
    t = _tmp()
    dl.write_delta(
        spark.range(0, 10).selectExpr(
            "id AS k", "CAST(id AS DOUBLE) AS v"
        ),
        t,
    )
    # v1: blind append → synthesized inserts
    dl.write_delta(
        spark.range(100, 103).selectExpr(
            "id AS k", "CAST(id AS DOUBLE) AS v"
        ),
        t, mode="append",
    )
    # v2: a foreign UPDATE expressed via cdc (pre/post images); the
    # accompanying add/remove actions must NOT double-count
    adds, _m, _p, _v = dl._replay(t, None)
    _write_cdc_commit(
        spark, t, 2,
        [(5, 5.0, "update_preimage"), (5, 555.0, "update_postimage")],
        removes=[{"path": adds[0]["path"],
                  "deletionTimestamp": 0, "dataChange": True}],
        adds=[dict(adds[0], dataChange=True)],
    )
    # v3: OPTIMIZE-shaped no-op commit → skipped
    dl.delta_optimize(spark, t, min_files=1)
    feed = dl.read_delta_changes(spark, t, 0)
    rows = sorted(
        (r._commit_version, r._change_type, r.k, r.v)
        for r in feed.collect()
    )
    assert rows == [
        (1, "insert", 100, 100.0),
        (1, "insert", 101, 101.0),
        (1, "insert", 102, 102.0),
        (2, "update_postimage", 5, 555.0),
        (2, "update_preimage", 5, 5.0),
    ]
    # a sub-range selects only its commits
    sub = dl.read_delta_changes(spark, t, 1, 2)
    assert {r._commit_version for r in sub.collect()} == {2}


def test_cdf_partitioned_cdc_attaches_partition_values(spark):
    t = _tmp()
    dl.write_delta(
        spark.range(0, 12).selectExpr(
            "id AS k", "CAST(id % 2 AS STRING) AS p",
            "CAST(id AS DOUBLE) AS v",
        ),
        t, partition_by=["p"],
    )
    os.makedirs(os.path.join(t, "_change_data"), exist_ok=True)
    spark.createDataFrame(
        [(99, 1.0, "insert")], "k long, v double, _change_type string"
    ).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(t, "_cdcstage")
    )
    part = next(n for n in os.listdir(os.path.join(t, "_cdcstage"))
                if n.endswith(".parquet"))
    fname = "_change_data/p=1/cdc-1.parquet"
    os.makedirs(os.path.join(t, "_change_data", "p=1"), exist_ok=True)
    os.replace(os.path.join(t, "_cdcstage", part),
               os.path.join(t, fname))
    with open(dl._log_path(t, 1), "w") as fh:
        fh.write(json.dumps({"cdc": {
            "path": fname, "partitionValues": {"p": "1"},
            "size": 1, "dataChange": False,
        }}) + "\n")
    feed = dl.read_delta_changes(spark, t, 0)
    r = feed.collect()[0]
    assert (r.k, r.p, r._change_type, r._commit_version) == (
        99, "1", "insert", 1,
    )


def test_cdf_unrecoverable_rewrite_refuses(spark):
    t = _tmp()
    dl.write_delta(
        spark.range(0, 10).selectExpr(
            "id AS k", "CAST(id AS DOUBLE) AS v"
        ).coalesce(1),
        t,
    )
    # a DELETE without cdc actions: remove + add, rows unrecoverable
    adds, _m, _p, _v = dl._replay(t, None)
    with open(dl._log_path(t, 1), "w") as fh:
        fh.write(json.dumps({"remove": {
            "path": adds[0]["path"], "deletionTimestamp": 0,
            "dataChange": True,
        }}) + "\n")
    with pytest.raises(ValueError, match="without cdc"):
        dl.read_delta_changes(spark, t, 0).collect()
    # empty range → empty typed frame
    feed = dl.read_delta_changes(spark, t, 0, 0)
    assert feed.count() == 0
    assert "_change_type" in feed.columns
