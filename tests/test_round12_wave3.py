"""Round-12 third-wave hardening.

1. ``strip_target_alias`` — merge-condition pruning strips ``t.``
   qualifiers OUTSIDE string literals only: ``t.name = 't.x'`` must
   not corrupt the quoted value (pruning is no-false-negative, so a
   rewritten literal could silently skip files that match).
2. ``_merge_cardinality_check`` — duplicate NULL source keys are not
   a cardinality violation (NULL never equality-matches a target
   row), while duplicate NON-NULL keys still raise.
3. ``delta_restore`` with CDF refuses a restore across a
   PARTITION-LAYOUT change (re-added files key their partitionValues
   by the old layout; staging them through the current-layout ctx
   would NULL-fill those columns in the feed).
4. Delta streaming skips dataChange=false commits (OPTIMIZE
   compaction): their adds re-stream no rows and their removes don't
   kill the stream.
5. CDF-mode streaming with ``skipChangeCommits`` survives a
   remove-carrying commit on a NON-CDF table (no cdc actions to
   replay — the whole commit is invisible) instead of raising.
6. ``read_iceberg_changes`` refuses when the OLDEST retained
   snapshot is a COW rewrite whose prior state was expired —
   ``ids[i-1]`` would wrap to the newest snapshot.
"""

import json
import os
import tempfile

import pytest
from pyspark.sql import Row

from harmony_energy_data_pipeline_spark.sinks import snapshots as snap
from harmony_energy_data_pipeline_spark.sinks.snapshots import (
    snapshot_merge_when,
    snapshot_write,
    strip_target_alias,
)
from harmony_energy_data_pipeline_spark.sources import deltalake as dl
from harmony_energy_data_pipeline_spark.sources import iceberg as ice
from harmony_energy_data_pipeline_spark.sources.deltastream import (
    DeltaTableDataSource,
)


def _tmp(prefix="r12w3_"):
    return os.path.join(tempfile.mkdtemp(prefix=prefix), "t")


# --- 1: literal-safe alias stripping ----------------------------------------


def test_strip_alias_outside_literals():
    assert strip_target_alias("t.a > 5 AND t.b = 'x'") == \
        "a > 5 AND b = 'x'"


def test_strip_alias_preserves_literal_spans():
    # the value 't.x' must survive verbatim
    assert strip_target_alias("t.name = 't.x'") == "name = 't.x'"
    # doubled-quote escape keeps the literal span open
    assert strip_target_alias("t.a = 'it''s t.b' AND t.c = 1") == \
        "a = 'it''s t.b' AND c = 1"
    assert strip_target_alias('t.a = "t.b" AND t.d = 2') == \
        'a = "t.b" AND d = 2'


def test_strip_alias_word_boundary():
    # 'not.a' / 'tt.a' are not the alias
    assert strip_target_alias("not.a = 1 AND tt.b = 2") == \
        "not.a = 1 AND tt.b = 2"


# --- 2: NULL source keys in merge cardinality -------------------------------


def test_merge_null_source_keys_not_cardinality_violation(spark):
    t = _tmp("mrgnull_")
    snapshot_write(
        spark.createDataFrame(
            [(1, "a"), (2, "b")], "k int, v string"
        ),
        t,
    )
    # two NULL-key rows: neither matches any target row; both insert
    src = spark.createDataFrame(
        [Row(k=None, v="n1"), Row(k=None, v="n2"), Row(k=1, v="u")],
        "k int, v string",
    )
    snapshot_merge_when(
        spark, t, src, key="k",
        matched=[{"condition": None, "action": "update", "set": None}],
        not_matched=[{"condition": None, "values": None}],
    )
    rows = sorted(
        (r["k"] if r["k"] is not None else -1, r["v"])
        for r in snap.read_snapshot(spark, t).collect()
    )
    assert rows == [(-1, "n1"), (-1, "n2"), (1, "u"), (2, "b")]


def test_merge_dup_nonnull_keys_still_raise(spark):
    t = _tmp("mrgdup_")
    snapshot_write(
        spark.createDataFrame([(1, "a")], "k int, v string"), t
    )
    src = spark.createDataFrame(
        [Row(k=1, v="x"), Row(k=1, v="y"), Row(k=None, v="n")],
        "k int, v string",
    )
    with pytest.raises(ValueError, match="cardinality"):
        snapshot_merge_when(
            spark, t, src, key="k",
            matched=[{"condition": None, "action": "update",
                      "set": None}],
        )


# --- 3: CDF RESTORE across a partition-layout change ------------------------


def test_restore_cdf_refuses_partition_layout_change(spark):
    t = _tmp("rst_")
    df = spark.createDataFrame(
        [(1, "a", 1.0), (2, "b", 2.0)], "k int, p string, v double"
    )
    dl.write_delta(df, t, partition_by=["p"])
    v0 = dl.delta_table_version(t)
    # enable CDF, then overwrite with a DIFFERENT layout (same schema)
    _a, meta, _p, v = dl._replay(t, None)
    meta = dict(meta)
    conf = dict(meta.get("configuration") or {})
    conf["delta.enableChangeDataFeed"] = "true"
    meta["configuration"] = conf
    with open(dl._log_path(t, v + 1), "w") as fh:
        fh.write(json.dumps({"metaData": meta}) + "\n")
    dl.write_delta(df, t, partition_by=[])
    with pytest.raises(ValueError, match="partition"):
        dl.delta_restore(spark, t, v0)
    # without CDF the same restore is a pure metadata rollback
    _a2, meta2, _p2, v2 = dl._replay(t, None)
    meta2 = dict(meta2)
    conf2 = dict(meta2.get("configuration") or {})
    conf2.pop("delta.enableChangeDataFeed", None)
    meta2["configuration"] = conf2
    with open(dl._log_path(t, v2 + 1), "w") as fh:
        fh.write(json.dumps({"metaData": meta2}) + "\n")
    nv, changed = dl.delta_restore(spark, t, v0)
    assert changed > 0
    got = sorted(
        (r.k, r.p, r.v) for r in dl.read_delta(spark, t).collect()
    )
    assert got == [(1, "a", 1.0), (2, "b", 2.0)]


# --- 4/5: streaming over compaction / uncdc'd removes ------------------------


def _drain(spark, t, name, **opts):
    ck = tempfile.mkdtemp(prefix="r12w3_ck_")
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


def test_stream_skips_optimize_commit(spark):
    spark.dataSource.register(DeltaTableDataSource)
    t = _tmp("sopt_")
    for i in range(3):
        dl.write_delta(
            spark.range(i * 10, i * 10 + 10).selectExpr(
                "id AS k", "CAST(id AS DOUBLE) AS v"
            ),
            t, mode="append" if i else "overwrite",
        )
    assert dl.delta_optimize(spark, t) is not None
    # one more real append AFTER the compaction
    dl.write_delta(
        spark.range(100, 103).selectExpr(
            "id AS k", "CAST(id AS DOUBLE) AS v"
        ),
        t, mode="append",
    )
    out = _drain(spark, t, "r12w3_opt")
    ks = sorted(r.k for r in out.collect())
    # 30 original rows + 3 appended — the compaction commit
    # re-streams NOTHING and its removes don't kill the stream
    assert ks == list(range(30)) + [100, 101, 102]


def test_stream_cdf_skip_change_commits_uncdcd_remove(spark):
    spark.dataSource.register(DeltaTableDataSource)
    t = _tmp("sscc_")
    dl.write_delta(
        spark.range(0, 10).selectExpr(
            "id AS k", "CAST(id AS DOUBLE) AS v"
        ),
        t,
    )
    # NON-CDF table: DV delete emits no cdc actions
    dl.delta_delete_where(spark, t, "k < 3")
    dl.write_delta(
        spark.range(50, 52).selectExpr(
            "id AS k", "CAST(id AS DOUBLE) AS v"
        ),
        t, mode="append",
    )
    out = _drain(spark, t, "r12w3_scc", read_change_feed="true",
                 skip_change_commits="true", starting_version="1")
    ks = sorted(r.k for r in out.collect())
    # the delete commit is invisible; the append streams as inserts
    assert ks == [50, 51]
    cts = {r._change_type for r in out.collect()}
    assert cts == {"insert"}


# --- 6: changelog boundary past expired history ------------------------------


def test_iceberg_changes_expired_prior_state_refuses(spark):
    import time
    import uuid as _uuid

    import pyarrow as pa
    import pyarrow.parquet as pq

    from harmony_energy_data_pipeline_spark.sources.avrolite import (
        write_avro,
    )

    t = _tmp("chgexp_")
    ice.write_iceberg(
        spark.range(0, 5).selectExpr(
            "id AS k", "CAST(id AS DOUBLE) AS v"
        ).coalesce(1),
        t,
    )
    meta = ice.table_metadata(t)
    data, _dels = ice.live_files(t, meta)
    rec = {k: v for k, v in data[0].items() if not k.startswith("__")}
    seq0 = data[0]["__seq"]
    # fabricate a foreign COW rewrite: the only data file tombstoned
    # (status=2), survivors re-added
    surv = f"data/{_uuid.uuid4().hex}.parquet"
    pq.write_table(pa.table({
        "k": pa.array([3, 4], pa.int64()),
        "v": pa.array([3.0, 4.0], pa.float64()),
    }), os.path.join(t, surv))
    new_sid = int.from_bytes(os.urandom(7), "big")
    seq = meta.get("last-sequence-number", 0) + 1
    schema = ice._current_schema(meta)
    entries = [
        {"status": 2, "snapshot_id": new_sid,
         "sequence_number": seq0,
         "file_sequence_number": None, "data_file": rec},
        {"status": 1, "snapshot_id": new_sid,
         "sequence_number": None, "file_sequence_number": None,
         "data_file": {
             "content": 0, "file_path": surv,
             "file_format": "PARQUET", "partition": {},
             "record_count": 2,
             "file_size_in_bytes": os.path.getsize(
                 os.path.join(t, surv)),
             "lower_bounds": None, "upper_bounds": None,
         }},
    ]
    man_rel = f"metadata/manifest-{_uuid.uuid4().hex}.avro"
    man_len = write_avro(
        os.path.join(t, man_rel),
        ice._manifest_entry_schema(), entries,
        metadata={"schema": json.dumps(schema),
                  "partition-spec": "[]", "partition-spec-id": "0",
                  "format-version": "2", "content": "data"},
    )
    manifests = [{
        "manifest_path": man_rel, "manifest_length": man_len,
        "partition_spec_id": 0, "content": 0,
        "sequence_number": seq, "min_sequence_number": 1,
        "added_snapshot_id": new_sid, "added_files_count": 1,
        "existing_files_count": 0, "deleted_files_count": 1,
        "added_rows_count": 2, "existing_rows_count": 0,
        "deleted_rows_count": 5,
    }]
    ml_rel = f"metadata/snap-{new_sid}-{_uuid.uuid4().hex[:8]}.avro"
    write_avro(os.path.join(t, ml_rel), ice._manifest_file_schema(),
               manifests, metadata={"format-version": "2"})
    now_ms = int(time.time() * 1000)
    new_meta = dict(meta)
    new_meta["last-sequence-number"] = seq
    new_meta["last-updated-ms"] = now_ms
    new_meta["current-snapshot-id"] = new_sid
    new_meta["snapshots"] = list(meta["snapshots"]) + [{
        "snapshot-id": new_sid, "timestamp-ms": now_ms,
        "sequence-number": seq,
        "summary": {"operation": "overwrite"},
        "manifest-list": ml_rel,
        "schema-id": meta.get("current-schema-id", 0),
    }]
    new_meta["snapshot-log"] = (
        list(meta.get("snapshot-log") or [])
        + [{"snapshot-id": new_sid, "timestamp-ms": now_ms}]
    )
    ice._commit_metadata(t, new_meta, meta)
    # in-range prior state: the rewrite expresses fine
    base = meta["current-snapshot-id"]
    feed = ice.read_iceberg_changes(spark, t, base)
    assert feed.count() == 5 + 2  # 5 deletes + 2 survivor inserts
    # expire the base snapshot: the COW rewrite becomes the OLDEST
    # retained snapshot and its prior state is gone
    ice.iceberg_expire_snapshots(t, keep_last=1)
    with pytest.raises(ice.IcebergProtocolError, match="expired"):
        ice.read_iceberg_changes(spark, t, None).collect()
