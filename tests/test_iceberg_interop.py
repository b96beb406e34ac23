"""Round 10: Apache Iceberg v2 wire-format interop (VERDICT r9 gap
#4) — pure-Python Avro container codec (avrolite) + metadata-tree
reader/writer (sources/iceberg), zero-copy adopt into the native log
and export back out. Mirrors the Delta bridge's test discipline:
foreign-shaped fixtures, honest feature gates, time travel."""

import json
import os
import tempfile
import time

import pytest

from harmony_energy_data_pipeline_spark.sources import iceberg as ice
from harmony_energy_data_pipeline_spark.sources.avrolite import (
    read_avro,
    write_avro,
)


def _tmp():
    return os.path.join(tempfile.mkdtemp(), "t")


def _df(spark, lo, hi):
    return spark.range(lo, hi).selectExpr(
        "id AS k", "CAST(id AS DOUBLE) AS v", "CAST(id % 3 AS STRING) AS tag"
    )


# --- avrolite ------------------------------------------------------------------------

def test_avro_container_roundtrip_codecs():
    schema = {"type": "record", "name": "r", "fields": [
        {"name": "a", "type": "long"},
        {"name": "b", "type": ["null", "string"], "default": None},
        {"name": "m", "type": ["null", {"type": "map", "values": "long"}],
         "default": None},
        {"name": "arr", "type": {"type": "array", "items": {
            "type": "record", "name": "kv", "fields": [
                {"name": "key", "type": "int"},
                {"name": "value", "type": "bytes"}]}}},
    ]}
    recs = [
        {"a": -(1 << 40), "b": "héllo", "m": {"x": 1, "y": -2},
         "arr": [{"key": 7, "value": b"\x00\xff"}]},
        {"a": 0, "b": None, "m": None, "arr": []},
    ]
    for codec in ("null", "deflate"):
        p = os.path.join(tempfile.mkdtemp(), "t.avro")
        write_avro(p, schema, recs, codec=codec)
        back, meta = read_avro(p)
        assert back == recs and meta["codec"] == codec


def test_avro_negative_count_blocks_decode():
    # foreign writers may emit size-prefixed (negative count) blocks
    from harmony_energy_data_pipeline_spark.sources import avrolite as al

    schema = {"type": "array", "items": "long"}
    enc = al._Encoder(schema)
    body = bytearray()
    body += al._zz_encode(-2)       # 2 items, size-prefixed block
    inner = bytearray()
    enc.encode(5, "long", inner)
    enc.encode(9, "long", inner)
    body += al._zz_encode(len(inner))
    body += inner
    body += al._zz_encode(0)
    dec = al._Decoder(schema)
    vals, _ = dec.decode(bytes(body), 0, schema)
    assert vals == [5, 9]


# --- write / read / travel ------------------------------------------------------------

def test_write_read_append_overwrite_travel(spark):
    t = _tmp()
    s1 = ice.write_iceberg(_df(spark, 0, 50), t, stats_cols=["k"])
    time.sleep(0.02)
    s2 = ice.write_iceberg(_df(spark, 50, 80), t, mode="append",
                           stats_cols=["k"])
    assert ice.read_iceberg(spark, t).count() == 80
    assert ice.read_iceberg(spark, t, snapshot_id=s1).count() == 50
    hist = ice.iceberg_history(t)
    assert [h["operation"] for h in hist] == ["overwrite", "append"]
    at = ice.iceberg_snapshot_at_timestamp(
        t, hist[0]["timestamp_ms"] / 1000.0
    )
    assert at == s1
    got = ice.read_iceberg(spark, t, where=[("k", 10, 60)])
    assert got.count() == 51
    ice.write_iceberg(_df(spark, 0, 7), t, mode="overwrite")
    assert ice.read_iceberg(spark, t).count() == 7
    assert ice.read_iceberg(spark, t, snapshot_id=s2).count() == 80


def test_append_schema_gate(spark):
    t = _tmp()
    ice.write_iceberg(_df(spark, 0, 5), t)
    with pytest.raises(ValueError, match="append schema differs"):
        ice.write_iceberg(
            spark.range(0, 3).selectExpr("id AS other"), t, mode="append"
        )


def test_version_hint_is_not_load_bearing(spark):
    t = _tmp()
    ice.write_iceberg(_df(spark, 0, 9), t)
    os.unlink(os.path.join(t, "metadata", "version-hint.text"))
    assert ice.read_iceberg(spark, t).count() == 9


def test_bounds_prune_to_schema_only_scan(spark):
    t = _tmp()
    ice.write_iceberg(
        _df(spark, 0, 100).repartitionByRange(5, "k"), t,
        stats_cols=["k"],
    )
    files = ice.live_data_files(t)
    assert len(files) == 5
    # an impossible range resolves without scanning wrong rows
    assert ice.read_iceberg(
        spark, t, where=[("k", 1000, 2000)]
    ).count() == 0
    # bounds decode correctly: the kept set for a narrow range is
    # smaller than the full file list
    meta = ice.table_metadata(t)
    schema = ice._current_schema(meta)
    ftypes = {f["id"]: (f["name"], f["type"]) for f in schema["fields"]}
    in_range = [
        f for f in files
        if ice._bounds_of(f, ftypes).get("k", [0, 99])[0] <= 25
        and ice._bounds_of(f, ftypes).get("k", [0, 99])[1] >= 20
    ]
    assert 1 <= len(in_range) < 5


def test_concurrent_metadata_claim_conflicts(spark, monkeypatch):
    t = _tmp()
    ice.write_iceberg(_df(spark, 0, 5), t)
    # freeze the directory listing at v1, then let an interloper claim
    # v2 inside our read→link window: the atomic link must conflict
    stale = ice._metadata_files(t)
    monkeypatch.setattr(ice, "_metadata_files", lambda p: list(stale))
    with open(os.path.join(t, "metadata", "v2.metadata.json"), "w") as fh:
        json.dump(ice.table_metadata(t), fh)
    with pytest.raises(FileExistsError, match="claimed"):
        ice.write_iceberg(_df(spark, 5, 9), t, mode="append")


def test_equality_delete_without_ids_refuses(spark):
    t = _tmp()
    ice.write_iceberg(_df(spark, 0, 5), t)
    meta = ice.table_metadata(t)
    snap = meta["snapshots"][-1]
    ml = os.path.join(t, snap["manifest-list"])
    manifests, _ = read_avro(ml)
    mp = os.path.join(t, manifests[0]["manifest_path"])
    entries, info = read_avro(mp)
    # a content=2 file WITHOUT equality_ids has no sound
    # interpretation: refuse, never resurrect or over-delete rows
    entries[0]["data_file"]["content"] = 2
    write_avro(mp, info["schema"], entries)
    with pytest.raises(ice.IcebergProtocolError,
                       match="equality_ids"):
        ice.read_iceberg(spark, t)


def test_foreign_manifest_with_extra_fields_reads(spark):
    """A conforming foreign writer may serialize MORE optional fields
    (column_sizes, value_counts, deflate codec) — generic
    embedded-schema decoding must not care."""
    t = _tmp()
    ice.write_iceberg(_df(spark, 0, 20).coalesce(1), t, stats_cols=["k"])
    meta = ice.table_metadata(t)
    snap = meta["snapshots"][-1]
    ml = os.path.join(t, snap["manifest-list"])
    manifests, _ = read_avro(ml)
    man_path = os.path.join(t, manifests[0]["manifest_path"])
    entries, info = read_avro(man_path)
    # extend the schema with an extra optional int-keyed map, rewrite
    # with deflate like Java writers do
    df_schema = next(
        f["type"] for f in info["schema"]["fields"]
        if f["name"] == "data_file"
    )
    df_schema["fields"].append({
        "name": "value_counts", "default": None,
        "type": ["null", {"type": "array", "logicalType": "map",
                          "items": {"type": "record", "name": "kv109",
                                    "fields": [
                                        {"name": "key", "type": "int"},
                                        {"name": "value",
                                         "type": "long"}]}}],
    })
    for e in entries:
        e["data_file"]["value_counts"] = [{"key": 1, "value": 20}]
    write_avro(man_path, info["schema"], entries, codec="deflate")
    got = ice.read_iceberg(spark, t)
    assert got.count() == 20


# --- bridges -------------------------------------------------------------------------

def test_import_zero_copy_adopt(spark):
    from harmony_energy_data_pipeline_spark.sinks import snapshots as snap

    t = _tmp()
    ice.write_iceberg(
        _df(spark, 0, 200).repartitionByRange(4, "k"), t,
        stats_cols=["k"],
    )
    assert ice.snapshot_import_iceberg(spark, t) == 0
    assert snap.read_snapshot(spark, t).count() == 200
    agg = snap.snapshot_stats_agg(t, cols=["k"])
    assert agg["n_rows"] == 200
    assert agg["min"]["k"] == 0 and agg["max"]["k"] == 199
    kept, total = snap.prune_files(t, [("k", 0, 10)])
    assert len(kept) < total == 4
    with pytest.raises(FileExistsError, match="exactly once"):
        ice.snapshot_import_iceberg(spark, t)


def test_export_applies_dvs_and_carries_bounds(spark):
    from harmony_energy_data_pipeline_spark.sinks import snapshots as snap

    nat, t = _tmp(), _tmp()
    snap.snapshot_write(
        _df(spark, 0, 100).repartitionByRange(4, "k")
        .sortWithinPartitions("k"),
        nat, stats_cols=["k"],
    )
    snap.snapshot_delete_where_dv(spark, nat, [("k", 0, 9)])
    ice.snapshot_export_iceberg(spark, nat, t)
    got = ice.read_iceberg(spark, t)
    assert got.count() == 90
    assert got.agg({"k": "min"}).collect()[0][0] == 10
    # exported bounds exist → a foreign-style bounds check prunes
    meta = ice.table_metadata(t)
    schema = ice._current_schema(meta)
    ftypes = {f["id"]: (f["name"], f["type"]) for f in schema["fields"]}
    bounds = [ice._bounds_of(f, ftypes) for f in ice.live_data_files(t)]
    assert any("k" in b for b in bounds)


# --- v2 position deletes (round 10, second wave) ---------------------------------------

def _attach_pos_deletes(spark, t, pred):
    from urllib.parse import unquote, urlparse

    data, _ = ice.live_files(t)
    paths = [ice._resolve_file_path(t, d["file_path"]) for d in data]
    by_res = {ice._resolve_file_path(t, d["file_path"]): d["file_path"]
              for d in data}
    rows = spark.read.parquet(*paths).selectExpr(
        "k", "_metadata.file_path AS fp", "_metadata.row_index AS ri"
    ).filter(pred).collect()
    pairs, deleted = [], set()
    for r in rows:
        res = unquote(urlparse(r.fp).path)
        pairs.append((by_res[res], r.ri))
        deleted.add(r.k)
    ice.write_position_deletes(spark, t, pairs)
    return deleted


def test_position_deletes_read_travel_import(spark):
    from harmony_energy_data_pipeline_spark.sinks import snapshots as snap

    t = _tmp()
    ice.write_iceberg(_df(spark, 0, 100).coalesce(3), t, stats_cols=["k"])
    pre = ice.table_metadata(t)["current-snapshot-id"]
    deleted = _attach_pos_deletes(spark, t, "k % 10 = 0")
    assert len(deleted) == 10
    got = ice.read_iceberg(spark, t)
    assert {r.k for r in got.collect()} == set(range(100)) - deleted
    # pruning composes with the delete subtraction
    assert ice.read_iceberg(spark, t, where=[("k", 0, 30)]).count() == 27
    # time travel to the pre-delete snapshot sees every row
    assert ice.read_iceberg(spark, t, snapshot_id=pre).count() == 100
    # a content=2 file with no equality_ids still refuses
    meta = ice.table_metadata(t)
    snap_cur = ice._snapshot(meta, None)
    ml = os.path.join(t, snap_cur["manifest-list"])
    manifests2, _i2 = read_avro(ml)
    dmans = [m2 for m2 in manifests2 if m2["content"] == 1]
    mp2 = os.path.join(t, dmans[0]["manifest_path"])
    entries2, einfo = read_avro(mp2)
    entries2[0]["data_file"]["content"] = 2
    write_avro(mp2, einfo["schema"], entries2)
    with pytest.raises(ice.IcebergProtocolError, match="equality_ids"):
        ice.read_iceberg(spark, t)


def test_position_deletes_carry_through_import(spark):
    from harmony_energy_data_pipeline_spark.sinks import snapshots as snap

    t = _tmp()
    ice.write_iceberg(_df(spark, 0, 80).coalesce(2), t, stats_cols=["k"])
    deleted = _attach_pos_deletes(spark, t, "k < 8")
    ice.snapshot_import_iceberg(spark, t)
    got = snap.read_snapshot(spark, t)
    assert {r.k for r in got.collect()} == set(range(8, 80))
    assert snap.snapshot_stats_agg(t, cols=[])["n_rows"] == 72
    # next copy-on-write materializes; nothing resurrects
    snap.snapshot_delete_where(spark, t, [("k", 10, 10)])
    assert snap.read_snapshot(spark, t).count() == 71


def test_linked_export_hardlinks_and_pos_deletes(spark):
    from harmony_energy_data_pipeline_spark.sinks import snapshots as snap

    nat, d = _tmp(), _tmp()
    df = spark.range(0, 100).selectExpr("id AS k", "CAST(id AS DOUBLE) AS v")
    snap.snapshot_write(
        df.repartitionByRange(4, "k").sortWithinPartitions("k"),
        nat, stats_cols=["k"],
    )
    snap.snapshot_delete_where_dv(spark, nat, [("k", 0, 9)])
    ice.snapshot_export_iceberg(spark, nat, d, link_files=True)
    got = ice.read_iceberg(spark, d)
    assert got.count() == 90
    assert got.agg({"k": "min"}).collect()[0][0] == 10
    # bounds survive: a band read prunes + matches
    assert ice.read_iceberg(spark, d, where=[("k", 25, 49)]).count() == 25
    # files are links; DVs arrived as one position-delete snapshot
    data, dels = ice.live_files(d)
    m = snap._read_manifest(nat, snap.latest_version(nat))
    inodes = {os.stat(snap._abs_file(nat, r)).st_ino for r in m["files"]}
    fp = ice._resolve_file_path(d, data[0]["file_path"])
    assert os.stat(fp).st_ino in inodes
    assert len(dels) == 1
    assert [h["operation"] for h in ice.iceberg_history(d)] == [
        "overwrite", "delete"
    ]
    with pytest.raises(FileExistsError, match="fresh directory"):
        ice.snapshot_export_iceberg(spark, nat, d, link_files=True)


def test_linked_export_guards_iceberg(spark):
    from harmony_energy_data_pipeline_spark.sinks import snapshots as snap

    nat = _tmp()
    snap.snapshot_write(
        spark.range(0, 20).selectExpr("id AS k",
                                      "CAST(id % 2 AS STRING) AS p"),
        nat, partition_by=["p"],
    )
    with pytest.raises(ValueError, match="partition columns"):
        ice.snapshot_export_iceberg(spark, nat, _tmp(), link_files=True)
    nat2 = _tmp()
    snap.snapshot_write(
        spark.range(0, 20).selectExpr("id AS k", "CAST(id AS DOUBLE) AS v"),
        nat2,
    )
    snap.snapshot_rename_column(nat2, "v", "val")
    with pytest.raises(ValueError, match="rename lineage"):
        ice.snapshot_export_iceberg(spark, nat2, _tmp(), link_files=True)


def test_identity_partitioned_write_and_prune(spark):
    t = _tmp()
    df = spark.range(0, 90).selectExpr(
        "id AS k", "CAST(id % 3 AS STRING) AS tag",
        "CAST(id AS DOUBLE) AS v",
    )
    ice.write_iceberg(df, t, partition_by=["tag"], stats_cols=["k"])
    got = ice.read_iceberg(spark, t)
    # data files STORE the partition column (spec requirement)
    assert got.filter("tag = '1'").count() == 30
    data, _ = ice.live_files(t)
    assert all(d["partition"].get("tag") in ("0", "1", "2")
               for d in data)
    # identity partition pruning keeps only the value's files
    meta = ice.table_metadata(t)
    spec = meta["partition-specs"][0]["fields"]
    assert spec and spec[0]["transform"] == "identity"
    assert ice.read_iceberg(
        spark, t, where=[("tag", "1", "1")]
    ).count() == 30
    # appends inherit-and-check the spec
    ice.write_iceberg(
        df.selectExpr("k + 100 AS k", "tag", "v"), t,
        mode="append", partition_by=["tag"],
    )
    assert ice.read_iceberg(spark, t).count() == 180
    # a BARE append derives the table's default spec (round 12 —
    # previously it raised): the new files land partitioned
    ice.write_iceberg(
        df.selectExpr("k + 1000 AS k", "tag", "v"), t, mode="append"
    )
    data2, _ = ice.live_files(t)
    assert all(d["partition"].get("tag") in ("0", "1", "2")
               for d in data2)
    # an append EXPLICITLY partitioned differently still refuses
    with pytest.raises(ValueError, match="partitioned by"):
        ice.write_iceberg(df, t, mode="append", partition_by=["v"])


def test_partitioned_native_export_materializes_with_spec(spark):
    from harmony_energy_data_pipeline_spark.sinks import snapshots as snap

    nat, d = _tmp(), _tmp()
    snap.snapshot_write(
        spark.range(0, 60).selectExpr(
            "id AS k", "CAST(id % 2 AS STRING) AS p"
        ),
        nat, partition_by=["p"],
    )
    ice.snapshot_export_iceberg(spark, nat, d)  # materializing
    got = ice.read_iceberg(spark, d)
    assert got.count() == 60
    assert got.filter("p = '1'").count() == 30
    meta = ice.table_metadata(d)
    assert [f["name"] for f in meta["partition-specs"][0]["fields"]] \
        == ["p"]
    assert ice.read_iceberg(spark, d, where=[("p", "1", "1")]).count() \
        == 30


def test_equality_deletes_sequence_scoped(spark):
    t = _tmp()
    ice.write_iceberg(_df(spark, 0, 60), t, stats_cols=["k"])  # seq 1
    ice.write_equality_deletes(spark, t, [{"tag": "1"}], ["tag"])
    got = ice.read_iceberg(spark, t)
    assert got.count() == 40 and got.filter("tag = '1'").count() == 0
    # rows appended AFTER the delete keep their matching values: the
    # delete applies only to data sequenced before it
    ice.write_iceberg(
        spark.range(100, 104).selectExpr(
            "id AS k", "CAST(id AS DOUBLE) AS v", "'1' AS tag"
        ),
        t, mode="append",
    )
    got = ice.read_iceberg(spark, t)
    assert got.count() == 44
    assert got.filter("tag = '1'").count() == 4
    # multi-column equality deletes compose, and time travel still
    # reaches the pre-delete snapshot
    ice.write_equality_deletes(spark, t, [{"k": 100, "tag": "1"}],
                               ["k", "tag"])
    assert ice.read_iceberg(spark, t).count() == 43
    first = ice.iceberg_history(t)[0]["snapshot_id"]
    assert ice.read_iceberg(spark, t, snapshot_id=first).count() == 60
    # equality + position deletes compose
    data, _ = ice.live_files(t)
    oldest = min(data, key=lambda d: d["__seq"])
    ice.write_position_deletes(spark, t, [(oldest["file_path"], 0)])
    assert ice.read_iceberg(spark, t).count() == 42
    # adoption MATERIALIZES equality deletes into native positional
    # DVs (round 11) — the imported table matches the Iceberg read
    from harmony_energy_data_pipeline_spark.sinks import snapshots as snap

    before = {(r.k, r.tag)
              for r in ice.read_iceberg(spark, t).collect()}
    ice.snapshot_import_iceberg(spark, t)
    after = {(r.k, r.tag)
             for r in snap.read_snapshot(spark, t).collect()}
    assert after == before and len(after) == 42
