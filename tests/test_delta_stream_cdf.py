"""Delta streaming source over DML-carrying logs (round 12):

* ``read_change_feed`` — the ``readChangeFeed`` streaming shape:
  cdc files authoritative, blind appends as inserts,
  ``_change_type``/``_commit_version`` columns, initial snapshot as
  inserts;
* ``skip_change_commits`` — remove-carrying commits skipped entirely
  (the modern Delta option);
* deletion vectors mask deleted rows in every mode (an initial
  snapshot over a DV'd table must not stream dead rows).
"""

from __future__ import annotations

import json
import os
import tempfile

import pytest
from pyspark.sql import Row

from harmony_energy_data_pipeline_spark.sources import deltalake as dl
from harmony_energy_data_pipeline_spark.sources.deltastream import (
    DeltaTableDataSource,
)


@pytest.fixture(autouse=True)
def _register(spark):
    spark.dataSource.register(DeltaTableDataSource)


def _drain(spark, t, name, **opts):
    ck = tempfile.mkdtemp(prefix="dscdf_ck_")
    r = spark.readStream.format("delta_table").option("path", t)
    for k, v in opts.items():
        r = r.option(k, v)
    q = (
        r.load().writeStream.format("memory").queryName(name)
        .option("checkpointLocation", ck)
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    return spark.table(name)


@pytest.fixture()
def dml_table(spark):
    """A CDF-enabled table that took a DV DELETE and a wire MERGE."""
    t = os.path.join(tempfile.mkdtemp(prefix="dscdf_"), "t")
    dl.write_delta(
        spark.createDataFrame(
            [Row(k=i, val=float(i)) for i in range(10)]
        ),
        t,
    )
    _a, meta, _p, v0 = dl._replay(t, None)
    meta = dict(meta)
    conf = dict(meta.get("configuration") or {})
    conf["delta.enableChangeDataFeed"] = "true"
    meta["configuration"] = conf
    with open(dl._log_path(t, v0 + 1), "w") as fh:
        fh.write(json.dumps({"metaData": meta}) + "\n")
    dl.delta_delete_where(spark, t, "k < 3")
    src = spark.createDataFrame(
        [Row(k=5, val=500.0), Row(k=20, val=20.0)]
    )
    dl.delta_merge_when(
        spark, t, src, key="k",
        matched=[{"condition": None, "action": "update", "set": None}],
        not_matched=[{"condition": None, "values": None}],
    )
    return t, v0


def test_stream_read_change_feed(spark, dml_table):
    t, v0 = dml_table
    out = _drain(spark, t, "cdf_rng", read_change_feed="true",
                 starting_version=str(v0 + 1))
    rows = sorted(
        (r.k, r._change_type, r._commit_version) for r in out.collect()
    )
    assert rows == [
        (0, "delete", v0 + 2), (1, "delete", v0 + 2),
        (2, "delete", v0 + 2),
        (5, "update_postimage", v0 + 3),
        (5, "update_preimage", v0 + 3),
        (20, "insert", v0 + 3),
    ]


def test_stream_cdf_initial_snapshot_dv_masked(spark, dml_table):
    t, _v0 = dml_table
    out = _drain(spark, t, "cdf_snap", read_change_feed="true")
    ks = sorted(r.k for r in out.collect())
    assert ks == [3, 4, 5, 6, 7, 8, 9, 20]  # deleted rows invisible
    assert {r._change_type for r in out.collect()} == {"insert"}


def test_stream_skip_change_commits(spark, dml_table):
    t, v0 = dml_table
    dl.write_delta(
        spark.createDataFrame([Row(k=100, val=1.0)]), t, mode="append"
    )
    out = _drain(spark, t, "cdf_scc", skip_change_commits="true",
                 starting_version=str(v0 + 1))
    assert sorted(r.k for r in out.collect()) == [100]


def test_stream_plain_snapshot_dv_masked(spark, dml_table):
    t, _v0 = dml_table
    out = _drain(spark, t, "cdf_plain")
    assert sorted(r.k for r in out.collect()) == [
        3, 4, 5, 6, 7, 8, 9, 20,
    ]


def test_stream_cdf_refuses_unrecoverable_commit(spark):
    """A remove-carrying commit WITHOUT cdc (CDF off) in range must
    raise, matching read_delta_changes' contract."""
    t = os.path.join(tempfile.mkdtemp(prefix="dscdf_"), "t")
    dl.write_delta(
        spark.createDataFrame([Row(k=i, val=0.0) for i in range(5)]), t
    )
    dl.delta_delete_where(spark, t, "k = 1")  # no CDF property: no cdc
    try:
        _drain(spark, t, "cdf_bad", read_change_feed="true",
               starting_version="0")
        raise AssertionError("expected unrecoverable-commit failure")
    except Exception as e:  # StreamingQueryException wraps the error
        assert "not" in str(e) and "recoverable" in str(e)
