"""Round-10 ADVICE fixes: Delta interop hardening.

1. write_delta commits become visible ATOMICALLY (os.link of the
   complete fsynced file) — no reader can observe an empty commit.
2. Protocol gate is an ALLOWLIST: any readerFeature outside the
   supported set raises (spec: refuse unless ALL are implemented).
3. delta_vacuum honors remove-action deletionTimestamp (covered in
   test_delta_interop.test_delta_vacuum; re-asserted here end-to-end
   through a checkpoint).
4. _last_checkpoint is a hint: missing/multi-part checkpoint falls
   back to full JSON replay instead of raising.
5. Checkpoints carry unexpired remove tombstones + txn actions.
"""

import json
import os
import tempfile
import threading
import time

import pytest

from harmony_energy_data_pipeline_spark.sources import deltalake as dl


def _tmp():
    return os.path.join(tempfile.mkdtemp(), "t")


def _df(spark, lo, hi):
    return spark.range(lo, hi).selectExpr(
        "id AS k", "CAST(id % 3 AS STRING) AS p", "id * 1.5 AS v"
    )


def test_concurrent_appends_never_leave_torn_commits(spark):
    t = _tmp()
    dl.write_delta(_df(spark, 0, 10), t)
    # pre-materialize the staged adds serially, then race ONLY the
    # commit-claim step through write_delta's retry loop shape
    errs, wins = [], []

    def run(lo):
        try:
            for _ in range(6):
                try:
                    wins.append(dl.write_delta(
                        _df(spark, lo, lo + 5), t, mode="append"
                    ))
                    return
                except FileExistsError:
                    continue
            errs.append("retries exhausted")
        except Exception as exc:  # noqa: BLE001
            errs.append(repr(exc))

    threads = [threading.Thread(target=run, args=(100 * i,))
               for i in range(1, 4)]
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    assert not errs
    assert sorted(wins) == [1, 2, 3]
    # every commit file in the log is COMPLETE valid JSON-lines with
    # >= 1 action — an empty or torn file would mean the old
    # create-then-write window existed
    log = os.path.join(t, "_delta_log")
    for n in sorted(os.listdir(log)):
        if not n.endswith(".json"):
            continue
        with open(os.path.join(log, n)) as fh:
            acts = [json.loads(line) for line in fh if line.strip()]
        assert acts, f"{n} is empty"
    assert dl.read_delta(spark, t).count() == 25


def test_reader_features_allowlist(spark):
    t = _tmp()
    dl.write_delta(_df(spark, 0, 5), t)
    # rewrite the protocol action to advertise a FUTURE feature this
    # reader has never heard of — the deny-list bug silently read it
    c0 = os.path.join(t, "_delta_log", f"{0:020d}.json")
    lines = []
    with open(c0) as fh:
        for line in fh:
            act = json.loads(line)
            if "protocol" in act:
                act["protocol"] = {
                    "minReaderVersion": 3, "minWriterVersion": 7,
                    "readerFeatures": ["someFutureFeature"],
                    "writerFeatures": ["someFutureFeature"],
                }
            lines.append(json.dumps(act))
    with open(c0, "w") as fh:
        fh.write("\n".join(lines) + "\n")
    with pytest.raises(dl.DeltaProtocolError, match="someFutureFeature"):
        dl.read_delta(spark, t)


def test_missing_checkpoint_falls_back_to_json_replay(spark):
    t = _tmp()
    dl.write_delta(_df(spark, 0, 10), t)
    dl.write_delta(_df(spark, 10, 14), t, mode="append")
    v = dl.write_delta_checkpoint(t)
    ck = os.path.join(t, "_delta_log", f"{v:020d}.checkpoint.parquet")
    os.unlink(ck)  # hint now names a checkpoint that is gone
    assert dl.read_delta(spark, t).count() == 14  # JSON chain complete


def test_multipart_checkpoint_hint_falls_back(spark):
    t = _tmp()
    dl.write_delta(_df(spark, 0, 10), t)
    hint = os.path.join(t, "_delta_log", "_last_checkpoint")
    with open(hint, "w") as fh:
        json.dump({"version": 0, "size": 3, "parts": 4}, fh)
    assert dl.read_delta(spark, t).count() == 10


def test_gapped_json_chain_still_raises(spark):
    t = _tmp()
    dl.write_delta(_df(spark, 0, 10), t)
    dl.write_delta(_df(spark, 10, 14), t, mode="append")
    os.unlink(os.path.join(t, "_delta_log", f"{0:020d}.json"))
    with pytest.raises(FileNotFoundError, match="unreadable"):
        dl.read_delta(spark, t)


def test_checkpoint_carries_tombstones_and_txns(spark):
    import pyarrow.parquet as pq

    t = _tmp()
    dl.write_delta(_df(spark, 0, 10), t)
    removed = {a["path"] for a in dl._replay(t, None)[0]}
    dl.write_delta(_df(spark, 10, 15), t)  # overwrite → tombstones
    # a foreign streaming writer's txn action in the next commit
    v2 = dl.write_delta(_df(spark, 15, 18), t, mode="append")
    c2 = os.path.join(t, "_delta_log", f"{v2:020d}.json")
    with open(c2, "a") as fh:
        fh.write(json.dumps({"txn": {
            "appId": "stream-abc", "version": 41,
            "lastUpdated": int(time.time() * 1000),
        }}) + "\n")
    v = dl.write_delta_checkpoint(t)
    ck = pq.read_table(
        os.path.join(t, "_delta_log", f"{v:020d}.checkpoint.parquet")
    ).to_pylist()
    ck_removes = {r["remove"]["path"] for r in ck if r.get("remove")}
    assert removed <= ck_removes
    txns = [r["txn"] for r in ck if r.get("txn")]
    assert txns and txns[0]["appId"] == "stream-abc"
    assert txns[0]["version"] == 41
    # replay THROUGH the checkpoint after the JSON commits vanish:
    # tombstones still protect recently-removed files from vacuum
    for n in list(os.listdir(os.path.join(t, "_delta_log"))):
        if n.endswith(".json") and n != "_last_checkpoint":
            os.unlink(os.path.join(t, "_delta_log", n))
    old = time.time() - 100_000
    for root, _d, names in os.walk(t):
        for n in names:
            if n.endswith(".parquet") and "_delta_log" not in root:
                os.utime(os.path.join(root, n), (old, old))
    dry = dl.delta_vacuum(t, retention_s=3600, dry_run=True)
    assert dry == []  # every non-live file is tombstone-protected
    assert dl.read_delta(spark, t).count() == 8


def test_checkpoint_expires_old_tombstones(spark):
    import pyarrow.parquet as pq

    t = _tmp()
    dl.write_delta(_df(spark, 0, 10), t)
    dl.write_delta(_df(spark, 10, 15), t)
    v = dl.write_delta_checkpoint(t, retention_s=0.0)
    time.sleep(0.01)
    ck = pq.read_table(
        os.path.join(t, "_delta_log", f"{v:020d}.checkpoint.parquet")
    ).to_pylist()
    # retention 0 → every tombstone is expired and omitted
    assert not any(r.get("remove") for r in ck)


def test_v2_checkpoint_with_sidecars_reads(spark):
    """A foreign v2Checkpoint table: UUID-named checkpoint whose adds
    live in parquet SIDECARS (the modern Databricks layout), JSON
    commits cleaned away — replay must go through the v2 checkpoint."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    t = _tmp()
    dl.write_delta(_df(spark, 0, 40).coalesce(2), t, stats_cols=["k"])
    dl.write_delta(_df(spark, 40, 50).coalesce(1), t, mode="append",
                   stats_cols=["k"])
    adds, meta, proto, v = dl._replay(t, None)
    # hand-build the v2 checkpoint: top file = protocol/metaData +
    # sidecar references; adds split across two sidecar files
    import uuid as _uuid
    side_dir = os.path.join(t, "_delta_log", "_sidecars")
    os.makedirs(side_dir)

    def add_struct(a):
        return {
            "path": a["path"],
            "partitionValues": list(
                (a.get("partitionValues") or {}).items()),
            "size": a.get("size"), "modificationTime": 0,
            "dataChange": True, "stats": a.get("stats"),
        }

    add_type = pa.struct([
        ("path", pa.string()),
        ("partitionValues", pa.map_(pa.string(), pa.string())),
        ("size", pa.int64()), ("modificationTime", pa.int64()),
        ("dataChange", pa.bool_()), ("stats", pa.string()),
    ])
    side_names = []
    half = len(adds) // 2 or 1
    for chunk in (adds[:half], adds[half:]):
        if not chunk:
            continue
        n = f"{_uuid.uuid4().hex}.parquet"
        pq.write_table(pa.table({
            "add": pa.array([add_struct(a) for a in chunk], add_type),
        }), os.path.join(side_dir, n))
        side_names.append(n)
    top = pa.table({
        "protocol": pa.array(
            [{"minReaderVersion": 3, "minWriterVersion": 7,
              "readerFeatures": ["v2Checkpoint"],
              "writerFeatures": ["v2Checkpoint"]}]
            + [None] * (1 + len(side_names)),
            pa.struct([("minReaderVersion", pa.int32()),
                       ("minWriterVersion", pa.int32()),
                       ("readerFeatures", pa.list_(pa.string())),
                       ("writerFeatures", pa.list_(pa.string()))])),
        "metaData": pa.array(
            [None, {"id": meta["id"],
                    "schemaString": meta["schemaString"],
                    "partitionColumns": [], "createdTime": 0}]
            + [None] * len(side_names),
            pa.struct([("id", pa.string()),
                       ("schemaString", pa.string()),
                       ("partitionColumns", pa.list_(pa.string())),
                       ("createdTime", pa.int64())])),
        "sidecar": pa.array(
            [None, None] + [{"path": n, "sizeInBytes": 1}
                            for n in side_names],
            pa.struct([("path", pa.string()),
                       ("sizeInBytes", pa.int64())])),
    })
    ckname = f"{v:020d}.checkpoint.{_uuid.uuid4().hex}.parquet"
    pq.write_table(top, os.path.join(t, "_delta_log", ckname))
    with open(os.path.join(t, "_delta_log", "_last_checkpoint"),
              "w") as fh:
        json.dump({"version": v, "size": len(adds) + 2}, fh)
    # clean every JSON commit: only the v2 checkpoint remains
    for n in list(os.listdir(os.path.join(t, "_delta_log"))):
        if n.endswith(".json") and n != "_last_checkpoint":
            os.unlink(os.path.join(t, "_delta_log", n))
    got = dl.read_delta(spark, t)
    assert got.count() == 50
    assert {r.k for r in got.select("k").collect()} == set(range(50))
    # stats survived through the sidecars → pruning still works
    assert dl.read_delta(spark, t, where=[("k", 0, 9)]).count() == 10
    # a missing sidecar is a loud failure, not a partial table
    os.unlink(os.path.join(side_dir, side_names[0]))
    with pytest.raises(FileNotFoundError, match="sidecar"):
        dl.read_delta(spark, t)
