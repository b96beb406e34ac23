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


def test_changes_foreign_cow_rewrite(spark):
    """A FOREIGN engine's copy-on-write delete: one 'overwrite'
    snapshot whose rewritten manifest carries the untouched file as
    status=0 EXISTING, the affected file as status=2 DELETED, and the
    survivors as a status=1 ADDED file. The changelog emits the
    removed file's rows as deletes + the survivors as inserts, and
    does NOT misread the rewrite as a full overwrite."""
    import json
    import time
    import uuid as _uuid

    import pyarrow as pa
    import pyarrow.parquet as pq

    from harmony_energy_data_pipeline_spark.sources.avrolite import (
        write_avro,
    )

    t = _tmp("cow_")
    ice.write_iceberg(
        spark.range(0, 5).selectExpr(
            "id AS k", "CAST(id AS DOUBLE) AS v"
        ).coalesce(1),
        t,
    )
    base = ice.table_metadata(t)["current-snapshot-id"]
    ice.write_iceberg(
        spark.range(10, 15).selectExpr(
            "id AS k", "CAST(id AS DOUBLE) AS v"
        ).coalesce(1),
        t, mode="append",
    )
    meta = ice.table_metadata(t)
    data, _dels = ice.live_files(t, meta)
    assert len(data) == 2

    def _max_k(rec):
        fp = ice._resolve_file_path(t, rec["file_path"])
        return max(
            r.k for r in spark.read.parquet(fp).collect()
        )

    rec_a, rec_b = sorted(data, key=_max_k)  # A: 0-4, B: 10-14

    def _clean(rec):
        return {k2: v2 for k2, v2 in rec.items()
                if not k2.startswith("__")}

    # survivors of B: k in (10, 11) — the COW rewrite keeps 2 of 5
    surv = f"data/{_uuid.uuid4().hex}.parquet"
    pq.write_table(pa.table({
        "k": pa.array([10, 11], pa.int64()),
        "v": pa.array([10.0, 11.0], pa.float64()),
    }), os.path.join(t, surv))
    new_sid = int.from_bytes(os.urandom(7), "big")
    import os as _os

    seq = meta.get("last-sequence-number", 0) + 1
    schema = ice._current_schema(meta)
    entries = [
        {"status": 0, "snapshot_id": base,
         "sequence_number": rec_a["__seq"],
         "file_sequence_number": None, "data_file": _clean(rec_a)},
        {"status": 2, "snapshot_id": new_sid,
         "sequence_number": rec_b["__seq"],
         "file_sequence_number": None, "data_file": _clean(rec_b)},
        {"status": 1, "snapshot_id": new_sid,
         "sequence_number": None, "file_sequence_number": None,
         "data_file": {
             "content": 0, "file_path": surv,
             "file_format": "PARQUET", "partition": {},
             "record_count": 2,
             "file_size_in_bytes": _os.path.getsize(
                 _os.path.join(t, surv)),
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
        "existing_files_count": 1, "deleted_files_count": 1,
        "added_rows_count": 2, "existing_rows_count": 5,
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
    new_meta["snapshot-log"] = list(meta.get("snapshot-log") or []) + [
        {"snapshot-id": new_sid, "timestamp-ms": now_ms}
    ]
    ice._commit_metadata(t, new_meta, meta)
    # the live read sees A + survivors
    assert sorted(
        r.k for r in ice.read_iceberg(spark, t).collect()
    ) == [0, 1, 2, 3, 4, 10, 11]
    # the changelog: append of B (snap2), then B's rows deleted +
    # survivors re-inserted (snap3) — NOT a delete of file A's rows
    feed = ice.read_iceberg_changes(spark, t, base)
    rows = sorted(
        (r.k, r._change_type) for r in feed.collect()
    )
    dels = [k for k, ct in rows if ct == "delete"]
    ins = [k for k, ct in rows if ct == "insert"]
    assert dels == [10, 11, 12, 13, 14]
    assert ins == [10, 10, 11, 11, 12, 13, 14]
    assert not any(k < 5 for k, _ct in rows)
