"""Round-12 Delta wire-format DML rework (VERDICT r11 items 2, 4-7;
ADVICE r11 medium).

1. cdc files on PARTITIONED tables record their REAL partitionValues
   and exclude partition columns from the staged parquet — the feed
   returns the real partition column values, not NULL.
2. ``write_delta`` honors ``delta.enableChangeDataFeed``: an
   overwrite of a CDF-enabled table emits cdc actions a
   ``table_changes`` reader replays (delete pre-images + inserts) —
   and preserves the table configuration instead of dropping it.
3. The DML position path collects only O(#touched files) descriptors
   to the driver — never O(matched rows).
4. ``read_delta_changes`` builds ONE scan per schema-epoch × kind,
   not one plan arm per commit.
5. CDF works over column-mapped tables (physical-named cdc files,
   logical output).
"""

import json
import os
import tempfile

import pytest
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from harmony_energy_data_pipeline_spark.sources import deltalake as dl


def _tmp(prefix="r12dl_"):
    return os.path.join(tempfile.mkdtemp(prefix=prefix), "t")


def _enable_cdf(t):
    """Append a commit that flips delta.enableChangeDataFeed on (the
    foreign-table shape: property in the latest metaData)."""
    _adds, meta, _p, v = dl._replay(t, None)
    meta = dict(meta)
    conf = dict(meta.get("configuration") or {})
    conf["delta.enableChangeDataFeed"] = "true"
    meta["configuration"] = conf
    with open(dl._log_path(t, v + 1), "w") as fh:
        fh.write(json.dumps({"metaData": meta}) + "\n")
    return v + 1


def test_cdc_real_partition_values(spark):
    t = _tmp("cdcpv_")
    dl.write_delta(
        spark.range(0, 30).selectExpr(
            "id AS k", "CAST(id % 3 AS STRING) AS p",
            "CAST(id AS DOUBLE) AS v",
        ),
        t, partition_by=["p"],
    )
    v0 = dl.delta_table_version(t)
    v1, n = dl.delta_delete_where(spark, t, "k < 6", record_cdf=True)
    assert n == 6
    # the cdc actions carry REAL partitionValues, and the staged cdc
    # parquet does NOT store the partition column
    import pyarrow.parquet as pq

    cdc = []
    with open(dl._log_path(t, v1), encoding="utf-8") as fh:
        for line in fh:
            act = json.loads(line)
            if "cdc" in act:
                cdc.append(act["cdc"])
    assert cdc
    pvs = {c["partitionValues"].get("p") for c in cdc}
    assert pvs <= {"0", "1", "2"} and None not in pvs
    for c in cdc:
        names = pq.read_schema(os.path.join(t, c["path"])).names
        assert "p" not in names and "_change_type" in names
    # and the feed returns the real partition values
    feed = dl.read_delta_changes(spark, t, v0, v1)
    got = {(r.k, r.p) for r in feed.collect()}
    assert got == {(i, str(i % 3)) for i in range(6)}
    assert {r._change_type for r in feed.collect()} == {"delete"}


def test_write_delta_overwrite_emits_cdf(spark):
    t = _tmp("wcdf_")
    df0 = spark.range(0, 5).selectExpr(
        "id AS k", "CAST(id AS DOUBLE) AS v"
    )
    dl.write_delta(df0, t)
    v_en = _enable_cdf(t)
    df1 = spark.range(10, 13).selectExpr(
        "id AS k", "CAST(id AS DOUBLE) AS v"
    )
    v1 = dl.write_delta(df1, t, mode="overwrite")
    # configuration preserved across the overwrite
    _a, meta, _p, _v = dl._replay(t, None)
    assert (meta["configuration"].get("delta.enableChangeDataFeed")
            == "true")
    # the overwrite is replayable row-level: 5 deletes + 3 inserts
    feed = dl.read_delta_changes(spark, t, v_en, v1)
    rows = [(r.k, r._change_type) for r in feed.collect()]
    assert sorted(r for r in rows if r[1] == "delete") == [
        (i, "delete") for i in range(5)
    ]
    assert sorted(r for r in rows if r[1] == "insert") == [
        (i, "insert") for i in (10, 11, 12)
    ]
    # appends stay blind (no cdc needed): feed synthesizes inserts
    v2 = dl.write_delta(
        spark.range(20, 22).selectExpr(
            "id AS k", "CAST(id AS DOUBLE) AS v"
        ),
        t, mode="append",
    )
    feed2 = dl.read_delta_changes(spark, t, v1, v2)
    assert sorted((r.k, r._change_type) for r in feed2.collect()) == [
        (20, "insert"), (21, "insert")
    ]


def test_dml_driver_sees_descriptors_not_rows(spark, monkeypatch):
    """The only driver materialization inside Delta DML is the
    per-touched-file DV descriptor list — bounded by #files, never
    O(matched rows)."""
    t = _tmp("desc_")
    dl.write_delta(
        spark.range(0, 4000).repartition(4).selectExpr(
            "id AS k", "CAST(id AS DOUBLE) AS v"
        ),
        t,
    )
    try:  # Spark 4: the classic impl overrides the facade's methods
        from pyspark.sql.classic.dataframe import (
            DataFrame as _ImplDF,
        )
    except ImportError:
        _ImplDF = DataFrame
    orig = _ImplDF.collect
    sizes = []

    def _counting(self, *a, **kw):
        out = orig(self, *a, **kw)
        sizes.append(len(out))
        return out

    monkeypatch.setattr(_ImplDF, "collect", _counting)
    monkeypatch.setattr(
        _ImplDF, "toPandas",
        lambda self, *a, **kw: (_ for _ in ()).throw(
            AssertionError("toPandas inside wire DML")
        ),
    )
    v1, n = dl.delta_delete_where(spark, t, "k % 2 = 0")
    monkeypatch.undo()
    assert n == 2000
    # every driver collect was descriptor-sized (≤ #files), not rows
    assert sizes and max(sizes) <= 8
    assert dl.read_delta(spark, t).count() == 2000


def test_read_delta_changes_bounded_plan_arms(spark):
    t = _tmp("arms_")
    dl.write_delta(
        spark.range(0, 2).selectExpr(
            "id AS k", "CAST(id AS DOUBLE) AS v"
        ),
        t,
    )
    for i in range(1, 25):
        dl.write_delta(
            spark.range(10 * i, 10 * i + 2).selectExpr(
                "id AS k", "CAST(id AS DOUBLE) AS v"
            ),
            t, mode="append",
        )
    feed = dl.read_delta_changes(spark, t, 0, 24)
    assert feed.count() == 48
    # 24 commits, ONE schema epoch, one kind → ONE parquet scan arm
    plan = feed._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan parquet") <= 2
    # versions attach correctly from the map
    per_v = {r["_commit_version"]: r["cnt"] for r in feed.groupBy(
        "_commit_version"
    ).agg(F.count("*").alias("cnt")).collect()}
    assert len(per_v) == 24 and set(per_v.values()) == {2}


def test_cdf_over_column_mapped_table(spark):
    """Name-mode mapped table: DML with record_cdf stages
    physical-named cdc files; the feed returns LOGICAL columns."""
    t = _tmp("cmcdf_")
    os.makedirs(os.path.join(t, "_delta_log"))
    spark.range(0, 10).selectExpr(
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
            "configuration": {
                "delta.columnMapping.mode": "name",
                "delta.enableChangeDataFeed": "true",
            },
            "createdTime": 0}}) + "\n")
        fh.write(json.dumps({"add": {
            "path": "part-000.parquet",
            "partitionValues": {},
            "size": os.path.getsize(
                os.path.join(t, "part-000.parquet")),
            "modificationTime": 0, "dataChange": True}}) + "\n")
    # the table property alone turns the feed on (no record_cdf flag)
    v1, n = dl.delta_update_where(spark, t, "k >= 8", {"v": "-1.0"})
    assert n == 2
    feed = dl.read_delta_changes(spark, t, 0, v1)
    rows = sorted((r.k, r.v, r._change_type) for r in feed.collect())
    assert rows == [
        (8, -1.0, "update_postimage"), (8, 8.0, "update_preimage"),
        (9, -1.0, "update_postimage"), (9, 9.0, "update_preimage"),
    ]
    # the cdc parquet is PHYSICAL-named on disk
    import pyarrow.parquet as pq

    cdc_files = [
        n_ for n_ in os.listdir(os.path.join(t, "_change_data"))
        if n_.endswith(".parquet")
    ]
    assert cdc_files
    names = set(pq.read_schema(
        os.path.join(t, "_change_data", cdc_files[0])
    ).names)
    assert {"col-x", "col-y", "_change_type"} <= names


def test_mapped_partitioned_dml_cdf(spark):
    """The hardest combination: name-mode column mapping AND a
    partitioned layout AND the CDF property — logical predicates
    drive DV DELETE / UPDATE over physical-named files, partition
    values stay physical-keyed on the wire, and the auto-recorded
    feed replays with real logical partition columns."""
    import glob
    import shutil

    t = _tmp("cmpart_")
    os.makedirs(os.path.join(t, "_delta_log"))
    for pval, lo, hi in (("a", 0, 10), ("b", 10, 20)):
        stage = os.path.join(t, f"st_{pval}")
        spark.range(lo, hi).selectExpr(
            "id AS `col-x`", "CAST(id AS DOUBLE) AS `col-y`"
        ).coalesce(1).write.parquet(stage)
        f0 = glob.glob(os.path.join(stage, "*.parquet"))[0]
        shutil.move(f0, os.path.join(t, f"part-{pval}.parquet"))
        shutil.rmtree(stage)
    schema = {"type": "struct", "fields": [
        {"name": "k", "type": "long", "nullable": True, "metadata": {
            "delta.columnMapping.id": 1,
            "delta.columnMapping.physicalName": "col-x"}},
        {"name": "v", "type": "double", "nullable": True,
         "metadata": {
            "delta.columnMapping.id": 2,
            "delta.columnMapping.physicalName": "col-y"}},
        {"name": "p", "type": "string", "nullable": True,
         "metadata": {
            "delta.columnMapping.id": 3,
            "delta.columnMapping.physicalName": "col-p"}},
    ]}
    with open(dl._log_path(t, 0), "w") as fh:
        fh.write(json.dumps({"protocol": {
            "minReaderVersion": 2, "minWriterVersion": 5}}) + "\n")
        fh.write(json.dumps({"metaData": {
            "id": "x", "format": {
                "provider": "parquet", "options": {}},
            "schemaString": json.dumps(schema),
            "partitionColumns": ["p"],
            "configuration": {
                "delta.columnMapping.mode": "name",
                "delta.enableChangeDataFeed": "true",
            },
            "createdTime": 0}}) + "\n")
        for pval in ("a", "b"):
            fh.write(json.dumps({"add": {
                "path": f"part-{pval}.parquet",
                "partitionValues": {"col-p": pval},
                "size": os.path.getsize(
                    os.path.join(t, f"part-{pval}.parquet")),
                "modificationTime": 0, "dataChange": True}}) + "\n")
    v1, n1 = dl.delta_delete_where(spark, t, "p = 'a' AND k < 3")
    assert n1 == 3
    v2, n2 = dl.delta_update_where(spark, t, "k >= 18", {"v": "-1.0"})
    assert n2 == 2
    out = {r.k: (r.v, r.p) for r in dl.read_delta(spark, t).collect()}
    assert len(out) == 17 and out[18] == (-1.0, "b") and 2 not in out
    feed = dl.read_delta_changes(spark, t, 0)
    fr = {(r.k, r.p, r._change_type) for r in feed.collect()}
    assert (0, "a", "delete") in fr
    assert (18, "b", "update_postimage") in fr
    # cdc actions carry PHYSICAL-keyed real partitionValues
    cdc_pv = set()
    for v in (v1, v2):
        with open(dl._log_path(t, v), encoding="utf-8") as fh:
            for line in fh:
                a = json.loads(line)
                if "cdc" in a:
                    cdc_pv.add(
                        a["cdc"]["partitionValues"].get("col-p")
                    )
    assert cdc_pv <= {"a", "b"} and None not in cdc_pv


def test_overwrite_preserves_foreign_protocol(spark):
    """An overwrite must never DOWNGRADE a foreign table's protocol:
    feature declarations (deletionVectors, changeDataFeed) survive,
    merged with whatever the new schema needs."""
    t = _tmp("proto_")
    dl.write_delta(
        spark.range(0, 5).selectExpr(
            "id AS k", "CAST(id AS DOUBLE) AS v"
        ),
        t,
    )
    _enable_cdf(t)
    # a DML commit upgrades the protocol (DV + CDF writer features)
    dl.delta_delete_where(spark, t, "k = 0")
    _a, _m, proto, _v = dl._replay(t, None)
    assert "deletionVectors" in (proto.get("readerFeatures") or [])
    assert "changeDataFeed" in (proto.get("writerFeatures") or [])
    # overwrite keeps the declarations (merged, not reset to (1,2))
    dl.write_delta(
        spark.range(10, 12).selectExpr(
            "id AS k", "CAST(id AS DOUBLE) AS v"
        ),
        t, mode="overwrite",
    )
    _a, _m, proto2, _v = dl._replay(t, None)
    assert proto2.get("minReaderVersion") == 3
    assert "deletionVectors" in (proto2.get("readerFeatures") or [])
    assert "changeDataFeed" in (proto2.get("writerFeatures") or [])


def test_id_mode_cdf_round_trip(spark):
    """id-mode mapped table + CDF: cdc files carry parquet FIELD IDS
    (the mode's resolution currency) so the module's own
    field-id-strict reader replays the feed it just wrote."""
    t = _tmp("idcdf_")
    os.makedirs(os.path.join(t, "_delta_log"))
    # parquet names deliberately unlike physicalName: only ids match
    import pyarrow as pa
    import pyarrow.parquet as pq

    tbl = pa.table({
        "whatever_a": pa.array(range(10), pa.int64()),
        "whatever_b": pa.array(
            [float(i) for i in range(10)], pa.float64()),
    })
    tbl = tbl.replace_schema_metadata(None)
    sch = pa.schema([
        pa.field("whatever_a", pa.int64(),
                 metadata={b"PARQUET:field_id": b"1"}),
        pa.field("whatever_b", pa.float64(),
                 metadata={b"PARQUET:field_id": b"2"}),
    ])
    pq.write_table(tbl.cast(sch), os.path.join(t, "part-000.parquet"))
    schema = {"type": "struct", "fields": [
        {"name": "k", "type": "long", "nullable": True, "metadata": {
            "delta.columnMapping.id": 1,
            "delta.columnMapping.physicalName": "col-x"}},
        {"name": "v", "type": "double", "nullable": True,
         "metadata": {
            "delta.columnMapping.id": 2,
            "delta.columnMapping.physicalName": "col-y"}},
    ]}
    with open(dl._log_path(t, 0), "w") as fh:
        fh.write(json.dumps({"protocol": {
            "minReaderVersion": 3, "minWriterVersion": 7,
            "readerFeatures": ["columnMapping"],
            "writerFeatures": ["columnMapping"]}}) + "\n")
        fh.write(json.dumps({"metaData": {
            "id": "x", "format": {
                "provider": "parquet", "options": {}},
            "schemaString": json.dumps(schema),
            "partitionColumns": [],
            "configuration": {
                "delta.columnMapping.mode": "id",
                "delta.enableChangeDataFeed": "true",
            },
            "createdTime": 0}}) + "\n")
        fh.write(json.dumps({"add": {
            "path": "part-000.parquet", "partitionValues": {},
            "size": os.path.getsize(
                os.path.join(t, "part-000.parquet")),
            "modificationTime": 0, "dataChange": True}}) + "\n")
    fw_before = spark.conf.get(
        "spark.sql.parquet.fieldId.write.enabled"
    )
    v1, n = dl.delta_update_where(spark, t, "k >= 8", {"v": "-1.0"})
    assert n == 2
    # the cdc parquet carries field ids
    cdc_files = [
        n_ for n_ in os.listdir(os.path.join(t, "_change_data"))
        if n_.endswith(".parquet")
    ]
    assert cdc_files
    sch2 = pq.read_schema(
        os.path.join(t, "_change_data", cdc_files[0])
    )
    ids = {
        f.name: (f.metadata or {}).get(b"PARQUET:field_id")
        for f in sch2
    }
    assert ids.get("col-x") == b"1" and ids.get("col-y") == b"2"
    # and the strict id-mode feed reader replays it
    feed = dl.read_delta_changes(spark, t, 0, v1)
    rows = sorted((r.k, r.v, r._change_type) for r in feed.collect())
    assert rows == [
        (8, -1.0, "update_postimage"), (8, 8.0, "update_preimage"),
        (9, -1.0, "update_postimage"), (9, 9.0, "update_preimage"),
    ]
    # the fieldId write conf was RESTORED to its pre-call value
    assert spark.conf.get(
        "spark.sql.parquet.fieldId.write.enabled"
    ) == fw_before


def test_legacy_protocol_upgrade_enumerates_implied_features(spark):
    """Upgrading a legacy (2,5) protocol to table features must
    ENUMERATE what the versions implied (columnMapping from reader
    v2; appendOnly/invariants/checkConstraints/generatedColumns/
    changeDataFeed/columnMapping from writer v5) — never strip."""
    t = _tmp("lgcy_")
    os.makedirs(os.path.join(t, "_delta_log"))
    spark.range(0, 6).selectExpr(
        "id AS `col-x`"
    ).coalesce(1).write.parquet(os.path.join(t, "st"))
    import glob
    import shutil

    f0 = glob.glob(os.path.join(t, "st", "*.parquet"))[0]
    shutil.move(f0, os.path.join(t, "part-000.parquet"))
    shutil.rmtree(os.path.join(t, "st"))
    schema = {"type": "struct", "fields": [
        {"name": "k", "type": "long", "nullable": True, "metadata": {
            "delta.columnMapping.id": 1,
            "delta.columnMapping.physicalName": "col-x"}},
    ]}
    with open(dl._log_path(t, 0), "w") as fh:
        fh.write(json.dumps({"protocol": {
            "minReaderVersion": 2, "minWriterVersion": 5}}) + "\n")
        fh.write(json.dumps({"metaData": {
            "id": "x", "format": {
                "provider": "parquet", "options": {}},
            "schemaString": json.dumps(schema),
            "partitionColumns": [],
            "configuration": {"delta.columnMapping.mode": "name"},
            "createdTime": 0}}) + "\n")
        fh.write(json.dumps({"add": {
            "path": "part-000.parquet", "partitionValues": {},
            "size": os.path.getsize(
                os.path.join(t, "part-000.parquet")),
            "modificationTime": 0, "dataChange": True}}) + "\n")
    dl.delta_delete_where(spark, t, "k = 0")
    _a, _m, proto, _v = dl._replay(t, None)
    assert "columnMapping" in proto["readerFeatures"]
    assert "deletionVectors" in proto["readerFeatures"]
    for wf in ("appendOnly", "invariants", "checkConstraints",
               "generatedColumns", "changeDataFeed",
               "columnMapping", "deletionVectors"):
        assert wf in proto["writerFeatures"], wf
    assert dl.read_delta(spark, t).count() == 5
