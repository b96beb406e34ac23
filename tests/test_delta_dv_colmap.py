"""Round 10: Delta reader speaks deletionVectors + name-mode
columnMapping — the two reader features Databricks-written tables
most commonly enable (VERDICT r9 gap #3). Fixtures are HAND-BUILT
foreign logs (protocol v3 with readerFeatures, physical-name schema
metadata, spec-format roaring-bitmap DV files via sources/deltadv),
not our writer's output — exercising the wire format, not a private
dialect.
"""

import json
import os
import tempfile
import time
import uuid

import pytest

from harmony_energy_data_pipeline_spark.sources import deltadv
from harmony_energy_data_pipeline_spark.sources import deltalake as dl


def _tmp():
    return os.path.join(tempfile.mkdtemp(), "t")


def _df(spark, lo, hi):
    return spark.range(lo, hi).selectExpr(
        "id AS k", "CAST(id % 3 AS STRING) AS p", "CAST(id AS DOUBLE) AS v"
    )


def _append_commit(path: str, actions: list[dict]) -> int:
    v = dl.delta_table_version(path) + 1
    with open(
        os.path.join(path, "_delta_log", f"{v:020d}.json"), "w"
    ) as fh:
        for a in actions:
            fh.write(json.dumps(a) + "\n")
    return v


def _attach_dv(spark, path: str, delete_pred: str,
               inline: bool = False) -> set:
    """Hand-commit a DV onto every live file covering ``delete_pred``
    rows (the Databricks DELETE shape: remove + re-add with
    deletionVector under protocol v3). Returns the deleted k set."""
    from urllib.parse import unquote

    adds, _m, _p, _v = dl._replay(path, None)
    disk_of = {unquote(a["path"]): a["path"] for a in adds}
    rows = (
        spark.read.parquet(*[os.path.join(path, unquote(a["path"]))
                             for a in adds])
        .selectExpr("k", "_metadata.row_index AS ridx",
                    "_metadata.file_path AS fp")
        .filter(delete_pred).collect()
    )
    by_file: dict[str, list[int]] = {}
    deleted = set()
    from urllib.parse import urlparse

    for r in rows:
        disk = unquote(urlparse(r.fp).path)
        rel = os.path.relpath(disk, path)
        by_file.setdefault(disk_of.get(rel, rel), []).append(r.ridx)
        deleted.add(r.k)
    actions = [{"protocol": {
        "minReaderVersion": 3, "minWriterVersion": 7,
        "readerFeatures": ["deletionVectors"],
        "writerFeatures": ["deletionVectors"],
    }}]
    for a in adds:
        if a["path"] not in by_file:
            continue
        pos = sorted(by_file[a["path"]])
        if inline:
            data = deltadv.serialize_dv(pos)
            pad = (-len(data)) % 4
            desc = {
                "storageType": "i",
                "pathOrInlineDv": deltadv.z85_encode(data + b"\0" * pad),
                "offset": None,
                "sizeInBytes": len(data),
                "cardinality": len(pos),
            }
        else:
            desc = deltadv.write_dv_file(path, [pos])[0]
        actions.append({"remove": {
            "path": a["path"],
            "deletionTimestamp": int(time.time() * 1000),
            "dataChange": True,
        }})
        actions.append({"add": {**a, "deletionVector": desc}})
    _append_commit(path, actions)
    return deleted


def test_dv_file_read(spark):
    t = _tmp()
    dl.write_delta(_df(spark, 0, 100).coalesce(2), t,
                   partition_by=["p"], stats_cols=["k"])
    deleted = _attach_dv(spark, t, "k % 5 = 0")
    got = dl.read_delta(spark, t)
    ks = {r.k for r in got.collect()}
    assert ks == set(range(100)) - deleted and len(deleted) == 20
    # pruning still composes with DVs
    assert dl.read_delta(spark, t, where=[("k", 10, 30)]).count() == (
        21 - len([k for k in deleted if 10 <= k <= 30])
    )
    # time travel to the pre-DV version still sees every row
    assert dl.read_delta(spark, t, version=0).count() == 100


def test_dv_inline_read(spark):
    t = _tmp()
    dl.write_delta(_df(spark, 0, 60).coalesce(1), t)
    deleted = _attach_dv(spark, t, "k < 7", inline=True)
    assert deleted == set(range(7))
    assert dl.read_delta(spark, t).count() == 53


def test_dv_survives_checkpoint(spark):
    t = _tmp()
    dl.write_delta(_df(spark, 0, 50).coalesce(1), t)
    _attach_dv(spark, t, "k % 2 = 0")
    v = dl.write_delta_checkpoint(t)
    for n in os.listdir(os.path.join(t, "_delta_log")):
        if n.endswith(".json"):
            os.unlink(os.path.join(t, "_delta_log", n))
    assert dl.read_delta(spark, t, version=v).count() == 25


def test_dv_import_carries_native_vectors(spark):
    from harmony_energy_data_pipeline_spark.sinks import snapshots as snap

    t = _tmp()
    dl.write_delta(_df(spark, 0, 90).coalesce(3), t, stats_cols=["k"])
    deleted = _attach_dv(spark, t, "k % 9 = 0")
    assert dl.snapshot_import_delta(spark, t) == 0
    got = snap.read_snapshot(spark, t)
    assert {r.k for r in got.collect()} == set(range(90)) - deleted
    # manifest-only COUNT subtracts the imported vectors exactly
    agg = snap.snapshot_stats_agg(t, cols=[])
    assert agg["n_rows"] == 80
    # the next copy-on-write materializes them (no resurrection)
    snap.snapshot_delete_where(spark, t, [("k", 1, 1)])
    assert snap.read_snapshot(spark, t).count() == 79


def test_colmap_name_mode_reads_logical(spark):
    t = _tmp()
    os.makedirs(os.path.join(t, "_delta_log"))
    # physical-named parquet the foreign writer laid down
    phys = {"k": "col-aaa111", "v": "col-bbb222"}
    spark.range(0, 40).selectExpr(
        f"id AS `{phys['k']}`", f"CAST(id AS DOUBLE) AS `{phys['v']}`"
    ).coalesce(1).write.parquet(os.path.join(t, "files"))
    data_files = [
        f"files/{n}" for n in os.listdir(os.path.join(t, "files"))
        if n.endswith(".parquet")
    ]
    schema = {"type": "struct", "fields": [
        {"name": "k", "type": "long", "nullable": True, "metadata": {
            "delta.columnMapping.id": 1,
            "delta.columnMapping.physicalName": phys["k"]}},
        {"name": "v", "type": "double", "nullable": True, "metadata": {
            "delta.columnMapping.id": 2,
            "delta.columnMapping.physicalName": phys["v"]}},
    ]}
    acts = [
        {"protocol": {"minReaderVersion": 3, "minWriterVersion": 7,
                      "readerFeatures": ["columnMapping"],
                      "writerFeatures": ["columnMapping"]}},
        {"metaData": {
            "id": str(uuid.uuid4()),
            "format": {"provider": "parquet", "options": {}},
            "schemaString": json.dumps(schema),
            "partitionColumns": [],
            "configuration": {"delta.columnMapping.mode": "name",
                              "delta.columnMapping.maxColumnId": "2"},
            "createdTime": int(time.time() * 1000),
        }},
    ]
    for fp in data_files:
        # stats keyed by PHYSICAL name, like real writers emit
        acts.append({"add": {
            "path": fp, "partitionValues": {}, "size": 1,
            "modificationTime": 0, "dataChange": True,
            "stats": json.dumps({
                "numRecords": 40,
                "minValues": {phys["k"]: 0},
                "maxValues": {phys["k"]: 39},
            }),
        }})
    with open(os.path.join(t, "_delta_log", f"{0:020d}.json"), "w") as fh:
        for a in acts:
            fh.write(json.dumps(a) + "\n")
    got = dl.read_delta(spark, t)
    assert got.columns == ["k", "v"]
    assert got.count() == 40
    assert got.filter("k = 7").collect()[0].v == 7.0
    # logical predicate translates to physical stats → prunes to empty
    assert dl.read_delta(spark, t, where=[("k", 100, 200)]).count() == 0
    # id-mode now reads too (round 11) — but THESE files carry no
    # parquet field ids at all (out-of-spec for an id-mode table),
    # and that fails LOUDLY at scan rather than reading silent NULLs
    # (see test_round11_idmapping for the resolving path)
    acts[1]["metaData"]["configuration"]["delta.columnMapping.mode"] = "id"
    _append_commit(t, [acts[1]])
    got = dl.read_delta(spark, t)
    assert got.columns == ["k", "v"]  # plan-time schema still fine
    # (count() would pass vacuously — a zero-column scan never
    # touches the ids; collect() must hit the loud error)
    with pytest.raises(Exception, match="FAILED_READ_FILE|field"):
        got.collect()


def test_colmap_partitioned_physical_partition_values(spark):
    t = _tmp()
    os.makedirs(os.path.join(t, "_delta_log"))
    phys = {"k": "col-k1", "p": "col-p1"}
    for pval in ("a", "b"):
        d = os.path.join(t, f"{phys['p']}={pval}")
        spark.range(0, 10).selectExpr(f"id AS `{phys['k']}`") \
            .coalesce(1).write.parquet(d, mode="overwrite")
    schema = {"type": "struct", "fields": [
        {"name": "k", "type": "long", "nullable": True, "metadata": {
            "delta.columnMapping.physicalName": phys["k"]}},
        {"name": "p", "type": "string", "nullable": True, "metadata": {
            "delta.columnMapping.physicalName": phys["p"]}},
    ]}
    acts = [
        {"protocol": {"minReaderVersion": 3, "minWriterVersion": 7,
                      "readerFeatures": ["columnMapping"],
                      "writerFeatures": ["columnMapping"]}},
        {"metaData": {
            "id": str(uuid.uuid4()),
            "format": {"provider": "parquet", "options": {}},
            "schemaString": json.dumps(schema),
            "partitionColumns": ["p"],
            "configuration": {"delta.columnMapping.mode": "name"},
            "createdTime": 0,
        }},
    ]
    for pval in ("a", "b"):
        d = f"{phys['p']}={pval}"
        for n in os.listdir(os.path.join(t, d)):
            if n.endswith(".parquet"):
                acts.append({"add": {
                    "path": f"{d}/{n}",
                    "partitionValues": {phys["p"]: pval},  # physical key
                    "size": 1, "modificationTime": 0, "dataChange": True,
                }})
    with open(os.path.join(t, "_delta_log", f"{0:020d}.json"), "w") as fh:
        for a in acts:
            fh.write(json.dumps(a) + "\n")
    got = dl.read_delta(spark, t)
    assert got.count() == 20
    assert got.filter("p = 'a'").count() == 10
    # exact partition pruning through the logical name
    assert dl.read_delta(
        spark, t, where=[("p", "b", "b")]
    ).count() == 10
    # in-place adoption refuses a column-mapped layout, with guidance
    with pytest.raises(ValueError, match="column mapping"):
        dl.snapshot_import_delta(spark, t)


def test_dv_budget_gate(spark):
    t = _tmp()
    dl.write_delta(_df(spark, 0, 10).coalesce(1), t)
    adds, *_ = dl._replay(t, None)
    desc = deltadv.write_dv_file(t, [[0]])[0]
    desc["cardinality"] = dl._MAX_DV_POSITIONS + 1
    _append_commit(t, [
        {"protocol": {"minReaderVersion": 3, "minWriterVersion": 7,
                      "readerFeatures": ["deletionVectors"],
                      "writerFeatures": ["deletionVectors"]}},
        {"add": {**adds[0], "deletionVector": desc}},
    ])
    with pytest.raises(ValueError, match="deletion-vector positions"):
        dl.read_delta(spark, t).count()


# --- zero-copy (linked) export with DVs --------------------------------------------

def test_linked_export_hardlinks_and_dvs(spark):
    from urllib.parse import unquote

    from harmony_energy_data_pipeline_spark.sinks import snapshots as snap

    nat, d = _tmp(), _tmp()
    df = spark.range(0, 120).selectExpr(
        "id AS k", "CAST(id % 3 AS STRING) AS p", "CAST(id AS DOUBLE) AS v"
    )
    snap.snapshot_write(df, nat, partition_by=["p"], stats_cols=["k"])
    snap.snapshot_delete_where_dv(spark, nat, [("k", 0, 11)])
    dl.snapshot_export_delta(spark, nat, d, link_files=True)
    got = dl.read_delta(spark, d)
    assert got.count() == 108
    assert got.agg({"k": "min"}).collect()[0][0] == 12
    assert got.filter("p = '1'").count() == 36
    # stats survive → pruning works on the exported log
    assert dl.read_delta(spark, d, where=[("k", 30, 59)]).count() == 30
    # files are LINKS, not copies
    adds, _m, proto, _v = dl._replay(d, None)
    rel = unquote(adds[0]["path"])
    assert os.stat(os.path.join(d, rel)).st_ino == os.stat(
        snap._abs_file(nat, rel)
    ).st_ino
    # native DVs exported as REAL Delta DVs under protocol v3
    assert "deletionVectors" in (proto.get("readerFeatures") or [])
    assert any(a.get("deletionVector") for a in adds)
    # time-travel version export + existing-log refusal
    with pytest.raises(FileExistsError, match="fresh directory"):
        dl.snapshot_export_delta(spark, nat, d, link_files=True)


def test_linked_export_guards(spark):
    from harmony_energy_data_pipeline_spark.sinks import snapshots as snap

    nat = _tmp()
    df = spark.range(0, 30).selectExpr("id AS k", "CAST(id AS DOUBLE) AS v")
    snap.snapshot_write(df, nat, stats_cols=["k"])
    snap.snapshot_rename_column(nat, "v", "val")
    with pytest.raises(ValueError, match="rename lineage"):
        dl.snapshot_export_delta(spark, nat, _tmp(), link_files=True)
    # mixed partition layout refuses too
    nat2 = _tmp()
    df2 = spark.range(0, 30).selectExpr(
        "id AS k", "CAST(id % 2 AS STRING) AS p"
    )
    snap.snapshot_write(df2, nat2, partition_by=["p"])
    snap.snapshot_write(
        spark.range(30, 40).selectExpr("id AS k").coalesce(1),
        nat2, mode="append",
    )  # batch missing p: stages layout-less
    with pytest.raises(ValueError, match="hive segments"):
        dl.snapshot_export_delta(spark, nat2, _tmp(), link_files=True)
    # materializing export still handles both
    out = _tmp()
    dl.snapshot_export_delta(spark, nat2, out, link_files=False)
    assert dl.read_delta(spark, out).count() == 40
