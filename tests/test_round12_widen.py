"""Wire-format ALTER COLUMN TYPE widening + OPTIMIZE on mapped
tables (round 12).

Delta widening rides the ``typeWidening`` table feature this engine
already reads: the schemaString field type changes, the change is
recorded in ``delta.typeChanges``, the protocol gains the feature.
Iceberg uses the spec's allowed promotions over the immutable field
id; old manifests' narrow (4-byte) bounds keep pruning via the
width-aware decode. OPTIMIZE now packs column-mapped tables by
staging under physical names.
"""

import json
import os
import tempfile

import pytest

from harmony_energy_data_pipeline_spark.catalog import Catalog
from harmony_energy_data_pipeline_spark.sources import deltalake as dl
from harmony_energy_data_pipeline_spark.sources import iceberg as ice
from harmony_energy_data_pipeline_spark.sql import snapshot_sql


def _tmp(prefix="wdn_"):
    return os.path.join(tempfile.mkdtemp(prefix=prefix), "t")


def test_delta_widen_records_and_reads(spark):
    t = _tmp("dw_")
    dl.write_delta(
        spark.range(0, 5).selectExpr(
            "CAST(id AS INT) AS k", "CAST(id AS FLOAT) AS v"
        ),
        t,
    )
    dl.delta_widen_column(t, "k", "BIGINT")
    dl.delta_widen_column(t, "v", "DOUBLE")
    df = dl.read_delta(spark, t)
    assert [f.dataType.simpleString() for f in df.schema.fields] == \
        ["bigint", "double"]
    assert sorted((r.k, r.v) for r in df.collect()) == \
        [(i, float(i)) for i in range(5)]
    # the audit trail + protocol feature land
    _a, meta, proto, _v = dl._replay(t, None)
    f = json.loads(meta["schemaString"])["fields"][0]
    ch = f["metadata"]["delta.typeChanges"][0]
    assert (ch["fromType"], ch["toType"]) == ("integer", "long")
    assert "typeWidening" in proto["readerFeatures"]
    # wide appends now conform
    dl.write_delta(
        spark.range(5, 7).selectExpr(
            "id AS k", "CAST(id AS DOUBLE) AS v"
        ),
        t, mode="append",
    )
    assert dl.read_delta(spark, t).count() == 7
    with pytest.raises(ValueError, match="typeWidening"):
        dl.delta_widen_column(t, "v", "STRING")


def test_delta_widen_partition_column_refuses(spark):
    t = _tmp("dwp_")
    dl.write_delta(
        spark.range(0, 4).selectExpr(
            "CAST(id AS INT) AS k", "CAST(id % 2 AS INT) AS p"
        ),
        t, partition_by=["p"],
    )
    with pytest.raises(ValueError, match="partition"):
        dl.delta_widen_column(t, "p", "BIGINT")


def test_iceberg_widen_prunes_narrow_bounds(spark):
    t = _tmp("iw_")
    ice.write_iceberg(
        spark.range(0, 50).selectExpr(
            "CAST(id AS INT) AS k", "CAST(id AS FLOAT) AS v"
        ),
        t, stats_cols=["k"],
    )
    ice.iceberg_widen_column(t, "k", "BIGINT")
    ice.iceberg_widen_column(t, "v", "DOUBLE")
    df = ice.read_iceberg(spark, t)
    assert [f.dataType.simpleString() for f in df.schema.fields] == \
        ["bigint", "double"]
    assert df.count() == 50
    # mixed narrow + wide files; pruning uses 4-byte bounds from
    # pre-widen manifests and 8-byte from post-widen ones
    ice.write_iceberg(
        spark.range(100, 150).selectExpr(
            "id AS k", "CAST(id AS DOUBLE) AS v"
        ),
        t, mode="append", stats_cols=["k"],
    )
    meta = ice.table_metadata(t)
    sch = ice._current_schema(meta)
    files, _d = ice.live_files(t, meta)
    kept = ice._prune_data_files(meta, sch, files, [("k", 120, 130)])
    assert 0 < len(kept) < len(files)
    assert ice.read_iceberg(
        spark, t, where=[("k", 120, 122)]
    ).count() == 3
    with pytest.raises(ValueError, match="promotion"):
        ice.iceberg_widen_column(t, "v", "STRING")


def test_iceberg_widen_decimal_precision(spark):
    t = _tmp("iwd_")
    ice.write_iceberg(
        spark.range(0, 4).selectExpr(
            "id AS k", "CAST(id AS DECIMAL(8,2)) AS d"
        ),
        t,
    )
    ice.iceberg_widen_column(t, "d", "DECIMAL(12,2)")
    df = ice.read_iceberg(spark, t)
    assert df.schema["d"].dataType.simpleString() == "decimal(12,2)"
    assert df.count() == 4
    with pytest.raises(ValueError, match="promotion"):
        ice.iceberg_widen_column(t, "d", "DECIMAL(12,4)")  # scale


def test_optimize_packs_mapped_table(spark):
    t = _tmp("om_")
    dl.write_delta(
        spark.range(0, 10).selectExpr(
            "id AS k", "CAST(id AS DOUBLE) AS v"
        ),
        t,
    )
    for i in range(3):
        dl.write_delta(
            spark.range(10 + i * 5, 15 + i * 5).selectExpr(
                "id AS k", "CAST(id AS DOUBLE) AS v"
            ),
            t, mode="append",
        )
    dl.delta_rename_column(t, "v", "val")
    dl.delta_delete_where(spark, t, "val < 3.0")
    n0 = len(dl._replay(t, None)[0])
    assert dl.delta_optimize(spark, t) is not None
    adds, _m, _p, _v = dl._replay(t, None)
    assert len(adds) < n0
    # rewritten files store the PHYSICAL name; the logical read maps
    import pyarrow.parquet as pq

    names = pq.read_schema(os.path.join(t, adds[0]["path"])).names
    assert "v" in names and "val" not in names
    rows = sorted(
        (r.k, r.val) for r in dl.read_delta(spark, t).collect()
    )
    assert len(rows) == 22 and rows[0] == (3, 3.0)
    # DVs materialized away
    assert not any(a.get("deletionVector") for a in adds)


def test_sql_widen_wire_formats(spark, tmp_path):
    dt = str(tmp_path / "d")
    it = str(tmp_path / "i")
    df = spark.range(0, 5).selectExpr(
        "CAST(id AS INT) AS k", "CAST(id AS FLOAT) AS v"
    )
    dl.write_delta(df, dt)
    ice.write_iceberg(df, it)
    cat = Catalog(str(tmp_path / "cat.json"))
    cat.register("d", dt, format="delta")
    cat.register("i", it, format="iceberg")
    snapshot_sql(spark, "ALTER TABLE d ALTER COLUMN k TYPE BIGINT",
                 catalog=cat)
    snapshot_sql(spark, "ALTER TABLE i ALTER COLUMN k TYPE BIGINT",
                 catalog=cat)
    got_d = snapshot_sql(spark, "SELECT k FROM d ORDER BY k",
                         catalog=cat)
    got_i = snapshot_sql(spark, "SELECT k FROM i ORDER BY k",
                         catalog=cat)
    assert got_d.schema["k"].dataType.simpleString() == "bigint"
    assert got_i.schema["k"].dataType.simpleString() == "bigint"
    assert [r.k for r in got_d.collect()] == \
        [r.k for r in got_i.collect()] == list(range(5))
