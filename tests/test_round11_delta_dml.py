"""Row-level DML ON the Delta wire format (round 11):
``delta_delete_where`` (merge-on-read deletion vectors) and
``delta_update_where`` (DV + re-append, one commit) — no adoption,
no data rewrite; protocol upgrades to declare ``deletionVectors``;
existing vectors union; OPTIMIZE materializes them away; the change
feed expresses both when ``record_cdf=True``."""

import json
import os
import tempfile

import pytest

from harmony_energy_data_pipeline_spark.catalog import Catalog
from harmony_energy_data_pipeline_spark.sources import deltalake as dl
from harmony_energy_data_pipeline_spark.sql import snapshot_sql


def _tmp():
    return os.path.join(tempfile.mkdtemp(prefix="ddml_"), "t")


def _seed(spark, n=50, pcols=None):
    t = _tmp()
    dl.write_delta(
        spark.range(0, n).selectExpr(
            "id AS k", "CAST(id % 2 AS STRING) AS p",
            "CAST(id AS DOUBLE) AS v",
        ),
        t, partition_by=pcols, stats_cols=["k"],
    )
    return t


def test_delete_lands_dvs_and_upgrades_protocol(spark):
    t = _seed(spark, pcols=["p"])
    v, n = dl.delta_delete_where(spark, t, "k % 5 = 0")
    assert (v, n) == (1, 10)
    assert dl.read_delta(spark, t).count() == 40
    # protocol declared the feature
    _adds, _m, proto, _v = dl._replay(t, None)
    assert "deletionVectors" in (proto.get("readerFeatures") or [])
    # time travel pre-delete intact
    assert dl.read_delta(spark, t, version=0).count() == 50
    # second delete UNIONS into existing vectors (no double count)
    v2, n2 = dl.delta_delete_where(spark, t, "k % 5 = 0 OR k = 1")
    assert (v2, n2) == (2, 1)
    assert dl.read_delta(spark, t).count() == 39
    # no-match delete commits nothing
    v3, n3 = dl.delta_delete_where(spark, t, "k = 99999")
    assert (v3, n3) == (2, 0)
    # optimize materializes the vectors away, content unchanged
    dl.delta_optimize(spark, t, min_files=1)
    adds, _m, _p, _ = dl._replay(t, None)
    assert all(not a.get("deletionVector") for a in adds)
    assert dl.read_delta(spark, t).count() == 39


def test_update_rewrites_rows_and_skips_deleted(spark):
    t = _seed(spark, n=30)
    v, n = dl.delta_update_where(
        spark, t, "k < 5", {"v": "v * 100"}, record_cdf=True
    )
    assert n == 5
    rows = {r.k: r.v for r in dl.read_delta(spark, t).collect()}
    assert rows[3] == 300.0 and rows[10] == 10.0 and len(rows) == 30
    # deleted rows never resurrect as post-images
    dl.delta_delete_where(spark, t, "k >= 10 AND k < 15")
    _v, n2 = dl.delta_update_where(
        spark, t, "k >= 8 AND k < 20", {"v": "0.0"}
    )
    assert n2 == 7  # 8,9,15..19 — the five deleted keys excluded
    rows = {r.k: r.v for r in dl.read_delta(spark, t).collect()}
    assert 12 not in rows and rows[9] == 0.0 and len(rows) == 25
    # SET casts back to the declared type (decimal-literal gotcha)
    dl.delta_update_where(spark, t, "k = 0", {"v": "1.5"})
    got = dl.read_delta(spark, t)
    assert got.schema["v"].dataType.typeName() == "double"
    assert got.filter("k = 0").collect()[0].v == 1.5


def test_dml_cdf_roundtrip(spark):
    t = _seed(spark, n=20)
    dl.delta_delete_where(spark, t, "k < 3", record_cdf=True)
    dl.delta_update_where(
        spark, t, "k = 10", {"v": "-1.0"}, record_cdf=True
    )
    feed = dl.read_delta_changes(spark, t, 0)
    kinds = sorted(
        (r._commit_version, r._change_type, r.k)
        for r in feed.collect()
    )
    assert kinds == [
        (1, "delete", 0), (1, "delete", 1), (1, "delete", 2),
        (2, "update_postimage", 10), (2, "update_preimage", 10),
    ]


def test_sql_dml_routes_to_delta(spark):
    t = _seed(spark, n=20)
    cat = Catalog(tempfile.mkdtemp(prefix="ddmlc_"))
    cat.register("wt", path=t, format="delta")
    r = snapshot_sql(
        spark, "DELETE FROM wt WHERE k >= 15", catalog=cat
    ).collect()[0]
    assert r.operation == "delete"
    r = snapshot_sql(
        spark, "UPDATE wt SET v = v + 1000 WHERE k = 0", catalog=cat
    ).collect()[0]
    assert r.operation == "update"
    rows = {r2.k: r2.v for r2 in dl.read_delta(spark, t).collect()}
    assert len(rows) == 15 and rows[0] == 1000.0


def test_iceberg_delete_where_mor(spark):
    """The Iceberg twin: DELETE WHERE lands one spec position-delete
    snapshot; existing positions subtract; eq-delete tables refuse
    with compact guidance; SQL routes."""
    from harmony_energy_data_pipeline_spark.sources import iceberg as ice

    t = os.path.join(tempfile.mkdtemp(prefix="idel_"), "t")
    ice.write_iceberg(
        spark.range(0, 50).selectExpr(
            "id AS k", "CAST(id % 3 AS STRING) AS tag"
        ),
        t, partition_by=["bucket[4](k)"], stats_cols=["k"],
    )
    sid, n = ice.iceberg_delete_where(spark, t, "k % 5 = 0")
    assert n == 10
    assert ice.read_iceberg(spark, t).count() == 40
    _sid2, n2 = ice.iceberg_delete_where(spark, t, "k % 5 = 0 OR k = 1")
    assert n2 == 1
    # no-match: no commit
    before = ice.table_metadata(t)["current-snapshot-id"]
    _sid3, n3 = ice.iceberg_delete_where(spark, t, "k = 9999")
    assert n3 == 0
    assert ice.table_metadata(t)["current-snapshot-id"] == before
    cat = Catalog(tempfile.mkdtemp(prefix="idelc_"))
    cat.register("it", path=t, format="iceberg")
    r = snapshot_sql(
        spark, "DELETE FROM it WHERE k >= 40", catalog=cat
    ).collect()[0]
    assert r.operation == "delete"
    assert ice.read_iceberg(spark, t).count() == 31
    ice.iceberg_compact(spark, t)
    ice.write_equality_deletes(spark, t, [{"tag": "2"}], ["tag"])
    with pytest.raises(Exception, match="compact"):
        ice.iceberg_delete_where(spark, t, "k = 3")


def test_iceberg_update_where_single_snapshot(spark):
    """UPDATE WHERE on an Iceberg table: ONE v2 snapshot carrying
    both the position-delete and data manifests — a reader never
    sees the deleted-but-not-reinserted middle; composable with
    later deletes; partitioned tables stage transformed rows under
    the current spec (round 12 — refusal removed)."""
    from harmony_energy_data_pipeline_spark.sources import iceberg as ice

    t = os.path.join(tempfile.mkdtemp(prefix="iupd_"), "t")
    ice.write_iceberg(
        spark.range(0, 40).selectExpr(
            "id AS k", "CAST(id AS DOUBLE) AS v"
        ),
        t, stats_cols=["k"],
    )
    sid, n = ice.iceberg_update_where(spark, t, "k < 5",
                                      {"v": "v * 100"})
    assert n == 5
    rows = {r.k: r.v for r in ice.read_iceberg(spark, t).collect()}
    assert rows[3] == 300.0 and rows[10] == 10.0 and len(rows) == 40
    assert len(ice.iceberg_history(t)) == 2  # ONE update snapshot
    # the update snapshot time-travels atomically
    first = ice.iceberg_history(t)[0]["snapshot_id"]
    assert ice.read_iceberg(spark, t, snapshot_id=first).count() == 40
    # second update targets rows now living in the NEW files
    _s2, n2 = ice.iceberg_update_where(
        spark, t, "v >= 300 AND v <= 400", {"v": "-1.0"}
    )
    assert n2 == 2
    rows = {r.k: r.v for r in ice.read_iceberg(spark, t).collect()}
    assert rows[3] == -1.0 and rows[4] == -1.0 and len(rows) == 40
    ice.iceberg_delete_where(spark, t, "k = 10")
    assert ice.read_iceberg(spark, t).count() == 39
    # partitioned tables update in place — transformed rows land
    # under the current spec with real partition tuples
    t2 = os.path.join(tempfile.mkdtemp(prefix="iupd2_"), "t")
    ice.write_iceberg(
        spark.range(0, 10).selectExpr(
            "id AS k", "CAST(id % 2 AS STRING) AS p"
        ),
        t2, partition_by=["p"],
    )
    _sp, np_ = ice.iceberg_update_where(spark, t2, "k = 1", {"k": "100"})
    assert np_ == 1
    got = {r.k for r in ice.read_iceberg(spark, t2).collect()}
    assert got == {0, 2, 3, 4, 5, 6, 7, 8, 9, 100}
    # partition pruning still works on the updated table
    assert ice.read_iceberg(
        spark, t2, where=[("p", "1", "1")]
    ).count() == 5
    # SQL routes
    cat = Catalog(tempfile.mkdtemp(prefix="iupdc_"))
    cat.register("ut", path=t, format="iceberg")
    r = snapshot_sql(
        spark, "UPDATE ut SET v = 7.0 WHERE k = 20", catalog=cat
    ).collect()[0]
    assert r.operation == "update"
    rows = {r2.k: r2.v for r2 in ice.read_iceberg(spark, t).collect()}
    assert rows[20] == 7.0


def test_column_mapped_dml_round_trip(spark):
    """Round 12: name-mode column-mapped tables take DV DELETE and
    UPDATE — the scan resolves physical names, re-appended files
    store physical names, and read_delta sees logical ones."""
    t = _tmp()
    os.makedirs(os.path.join(t, "_delta_log"))
    # physical-named data file
    spark.range(0, 20).selectExpr(
        "id AS `col-x`", "CAST(id AS DOUBLE) AS `col-y`"
    ).coalesce(1).write.parquet(os.path.join(t, "stage0"))
    import glob
    import shutil

    f0 = glob.glob(os.path.join(t, "stage0", "*.parquet"))[0]
    shutil.move(f0, os.path.join(t, "part-000.parquet"))
    shutil.rmtree(os.path.join(t, "stage0"))
    schema = {"type": "struct", "fields": [
        {"name": "k", "type": "long", "nullable": True, "metadata": {
            "delta.columnMapping.id": 1,
            "delta.columnMapping.physicalName": "col-x"}},
        {"name": "v", "type": "double", "nullable": True, "metadata": {
            "delta.columnMapping.id": 2,
            "delta.columnMapping.physicalName": "col-y"}},
    ]}
    with open(dl._log_path(t, 0), "w") as fh:
        fh.write(json.dumps({"protocol": {
            "minReaderVersion": 2, "minWriterVersion": 5}}) + "\n")
        fh.write(json.dumps({"metaData": {
            "id": "x", "format": {"provider": "parquet", "options": {}},
            "schemaString": json.dumps(schema),
            "partitionColumns": [],
            "configuration": {"delta.columnMapping.mode": "name"},
            "createdTime": 0}}) + "\n")
        fh.write(json.dumps({"add": {
            "path": "part-000.parquet",
            "partitionValues": {},
            "size": os.path.getsize(
                os.path.join(t, "part-000.parquet")),
            "modificationTime": 0, "dataChange": True}}) + "\n")
    # logical-name predicate drives a DV delete on physical files
    v1, n1 = dl.delta_delete_where(spark, t, "k >= 15")
    assert n1 == 5
    rows = {r.k: r.v for r in dl.read_delta(spark, t).collect()}
    assert len(rows) == 15 and 15 not in rows
    # UPDATE re-appends transformed rows physical-named
    v2, n2 = dl.delta_update_where(spark, t, "k < 3", {"v": "v + 0.5"})
    assert n2 == 3
    rows = {r.k: r.v for r in dl.read_delta(spark, t).collect()}
    assert rows[0] == 0.5 and rows[2] == 2.5 and rows[5] == 5.0
    assert len(rows) == 15
    # the re-appended file stores PHYSICAL column names
    adds, _m, _p, _v = dl._replay(t, None)
    import pyarrow.parquet as pq
    from urllib.parse import unquote as _unq

    new_files = [a for a in adds if not a.get("deletionVector")]
    assert new_files
    names = set()
    for a in new_files:
        names |= set(pq.read_schema(
            os.path.join(t, _unq(a["path"]))
        ).names)
    assert names == {"col-x", "col-y"}
