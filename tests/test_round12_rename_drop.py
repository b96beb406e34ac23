"""Wire-format RENAME / DROP COLUMN (round 12).

Iceberg: metadata-only — the field keeps its immutable id; this
engine's scans coalesce across historical names
(``_rename_alternates`` / ``_data_scan``), foreign readers resolve
pre-rename files through the ``schema.name-mapping.default``
property written on every rename. Reference analogue: the schema
churn a long-lived serving table takes
(`/root/reference/src/serve/load.py` rebuilds the table on schema
change; here it is one metadata commit).

Delta: column mapping makes the logical name a label over a stable
``physicalName``; unmapped tables upgrade in the same commit
(physical = current names, so every existing file still resolves).

Both route through SQL ``ALTER TABLE … RENAME COLUMN / DROP
COLUMN``.
"""

import json
import os
import tempfile

import pytest
from pyspark.sql import functions as F

from harmony_energy_data_pipeline_spark.catalog import Catalog
from harmony_energy_data_pipeline_spark.sources import deltalake as dl
from harmony_energy_data_pipeline_spark.sources import iceberg as ice
from harmony_energy_data_pipeline_spark.sql import snapshot_sql


def _tmp(prefix="rn_"):
    return os.path.join(tempfile.mkdtemp(prefix=prefix), "t")


# --- Iceberg ----------------------------------------------------------------


def test_iceberg_rename_mixed_files_and_dml(spark):
    t = _tmp("irn_")
    ice.write_iceberg(
        spark.range(0, 10).selectExpr(
            "id AS k", "CAST(id AS DOUBLE) AS v"
        ),
        t,
    )
    ice.iceberg_rename_column(t, "v", "val")
    # pre-rename files resolve under the new name
    assert sorted(
        (r.k, r.val) for r in ice.read_iceberg(spark, t).collect()
    )[:2] == [(0, 0.0), (1, 1.0)]
    # mixed old-name + new-name files in one scan
    ice.write_iceberg(
        spark.range(10, 13).selectExpr(
            "id AS k", "CAST(id AS DOUBLE) AS val"
        ),
        t, mode="append",
    )
    rows = {r.k: r.val for r in ice.read_iceberg(spark, t).collect()}
    assert len(rows) == 13 and rows[3] == 3.0 and rows[12] == 12.0
    # zone-map pruning still works (bounds are field-id keyed)
    assert sorted(
        r.k for r in ice.read_iceberg(
            spark, t, where=[("val", 11.0, 12.0)]
        ).collect()
    ) == [11, 12]
    # row-level DML through the renamed predicate column
    ice.iceberg_delete_where(spark, t, "val = 2.0")
    ice.iceberg_update_where(spark, t, "val = 5.0", {"val": "-5.0"})
    rows = {r.k: r.val for r in ice.read_iceberg(spark, t).collect()}
    assert 2 not in rows and rows[5] == -5.0
    # name-mapping property advertises both names for foreign readers
    nm = json.loads(
        ice.table_metadata(t)["properties"]
        ["schema.name-mapping.default"]
    )
    ent = next(e for e in nm if "val" in e["names"])
    assert "v" in ent["names"]
    # ... and data commits carry the property forward
    ice.write_iceberg(
        spark.range(13, 14).selectExpr(
            "id AS k", "CAST(id AS DOUBLE) AS val"
        ),
        t, mode="append",
    )
    assert "schema.name-mapping.default" in ice.table_metadata(t)[
        "properties"
    ]


def test_iceberg_rename_eq_deletes_resolve_old_names(spark):
    t = _tmp("ieq_")
    ice.write_iceberg(
        spark.range(0, 6).selectExpr(
            "id AS k", "CAST(id AS STRING) AS tag"
        ),
        t,
    )
    ice.write_equality_deletes(spark, t, [{"tag": "1"}], ["tag"])
    ice.iceberg_rename_column(t, "tag", "label")
    assert sorted(
        r.k for r in ice.read_iceberg(spark, t).collect()
    ) == [0, 2, 3, 4, 5]


def test_iceberg_rename_guards(spark):
    t = _tmp("ig_")
    ice.write_iceberg(
        spark.range(0, 3).selectExpr(
            "id AS k", "CAST(id AS DOUBLE) AS v"
        ),
        t,
    )
    ice.iceberg_rename_column(t, "v", "val")
    # renaming ANOTHER field onto a historical name is ambiguous
    with pytest.raises(ValueError, match="previously used"):
        ice.iceberg_rename_column(t, "k", "v")
    with pytest.raises(ValueError, match="already exists"):
        ice.iceberg_rename_column(t, "k", "val")
    with pytest.raises(ValueError, match="does not exist"):
        ice.iceberg_rename_column(t, "nope", "x")


def test_iceberg_drop_and_resurrection_guard(spark):
    t = _tmp("idr_")
    ice.write_iceberg(
        spark.range(0, 5).selectExpr(
            "id AS k", "CAST(id AS DOUBLE) AS v",
            "CAST(id AS STRING) AS s",
        ),
        t,
    )
    ice.iceberg_drop_column(t, "v")
    assert ice.read_iceberg(spark, t).columns == ["k", "s"]
    # time travel still shows the dropped column
    first = ice.table_metadata(t)["snapshots"][0]["snapshot-id"]
    assert "v" in ice.read_iceberg(spark, t, snapshot_id=first).columns
    # re-adding the name would resurrect old files' values: refuse
    with pytest.raises(ValueError, match="resurrect"):
        ice.iceberg_add_columns(t, {"v": "double"})
    # fresh names still add fine
    ice.iceberg_add_columns(t, {"v2": "double"})
    assert ice.read_iceberg(spark, t).columns == ["k", "s", "v2"]


def test_iceberg_drop_partition_source_refuses(spark):
    t = _tmp("idp_")
    ice.write_iceberg(
        spark.range(0, 6).selectExpr(
            "id AS k", "CAST(id % 2 AS STRING) AS p"
        ),
        t, partition_by=["p"],
    )
    with pytest.raises(ValueError, match="partition"):
        ice.iceberg_drop_column(t, "p")


def test_iceberg_rename_partition_source_still_prunes(spark):
    t = _tmp("ipp_")
    ice.write_iceberg(
        spark.range(0, 90).selectExpr(
            "id AS k", "CAST(id % 3 AS STRING) AS p",
            "CAST(id AS DOUBLE) AS v",
        ),
        t, partition_by=["p"],
    )
    ice.iceberg_rename_column(t, "p", "bucket")
    meta = ice.table_metadata(t)
    schema = ice._current_schema(meta)
    files, _d = ice.live_files(t, meta)
    kept = ice._prune_data_files(
        meta, schema, files, [("bucket", "1", "1")]
    )
    assert 0 < len(kept) < len(files)
    rows = sorted(
        r.k for r in ice.read_iceberg(
            spark, t, where=[("bucket", "1", "1")]
        ).collect()
    )
    assert rows == [k for k in range(90) if k % 3 == 1]


def test_iceberg_compact_materializes_new_names(spark):
    t = _tmp("icm_")
    ice.write_iceberg(
        spark.range(0, 5).selectExpr(
            "id AS k", "CAST(id AS DOUBLE) AS v"
        ),
        t,
    )
    ice.iceberg_rename_column(t, "v", "w")
    ice.iceberg_compact(spark, t)
    # the rewritten parquet physically stores the new name
    data, _d = ice.live_files(t)
    import pyarrow.parquet as pq

    names = pq.read_schema(
        ice._resolve_file_path(t, data[0]["file_path"])
    ).names
    assert "w" in names and "v" not in names


def test_iceberg_changes_across_rename(spark):
    t = _tmp("ich_")
    ice.write_iceberg(
        spark.range(0, 4).selectExpr(
            "id AS k", "CAST(id AS DOUBLE) AS v"
        ),
        t,
    )
    ice.iceberg_rename_column(t, "v", "val")
    ice.iceberg_delete_where(spark, t, "val = 1.0")
    feed = ice.read_iceberg_changes(spark, t, None)
    rows = sorted(
        (r.k, r.val, r._change_type) for r in feed.collect()
    )
    assert (1, 1.0, "delete") in rows and (3, 3.0, "insert") in rows


# --- Delta ------------------------------------------------------------------


def test_delta_rename_upgrades_mapping_and_appends(spark):
    t = _tmp("drn_")
    dl.write_delta(
        spark.range(0, 5).selectExpr(
            "id AS k", "CAST(id AS DOUBLE) AS v"
        ),
        t,
    )
    dl.delta_rename_column(t, "v", "val")
    _a, meta, proto, _v = dl._replay(t, None)
    assert meta["configuration"]["delta.columnMapping.mode"] == "name"
    assert proto == {"minReaderVersion": 2, "minWriterVersion": 5}
    f = next(f_ for f_ in json.loads(meta["schemaString"])["fields"]
             if f_["name"] == "val")
    # physical name stays the OLD name: existing parquet resolves
    assert f["metadata"]["delta.columnMapping.physicalName"] == "v"
    assert sorted(
        (r.k, r.val) for r in dl.read_delta(spark, t).collect()
    )[:2] == [(0, 0.0), (1, 1.0)]
    # append stages under the physical name
    dl.write_delta(
        spark.range(5, 8).selectExpr(
            "id AS k", "CAST(id AS DOUBLE) AS val"
        ),
        t, mode="append",
    )
    assert sorted(
        r.k for r in dl.read_delta(spark, t).collect()
    ) == list(range(8))
    # DV DML through the renamed column
    dl.delta_delete_where(spark, t, "val < 2.0")
    assert sorted(
        r.k for r in dl.read_delta(spark, t).collect()
    ) == list(range(2, 8))


def test_delta_drop_then_readd_never_resurrects(spark):
    t = _tmp("ddr_")
    dl.write_delta(
        spark.range(0, 4).selectExpr(
            "id AS k", "CAST(id AS DOUBLE) AS v"
        ),
        t,
    )
    dl.delta_drop_column(t, "v")
    assert dl.read_delta(spark, t).columns == ["k"]
    dl.delta_add_columns(t, {"v": "double"})
    # fresh physicalName: old files' physical 'v' never resolves
    rows = [r.v for r in dl.read_delta(spark, t).collect()]
    assert rows and all(x is None for x in rows)


def test_delta_drop_partition_column_refuses(spark):
    t = _tmp("ddp_")
    dl.write_delta(
        spark.range(0, 6).selectExpr(
            "id AS k", "CAST(id % 2 AS STRING) AS p"
        ),
        t, partition_by=["p"],
    )
    with pytest.raises(ValueError, match="partition"):
        dl.delta_drop_column(t, "p")


def test_delta_rename_partitioned_follows(spark):
    t = _tmp("drp_")
    dl.write_delta(
        spark.range(0, 6).selectExpr(
            "id AS k", "CAST(id % 2 AS STRING) AS p"
        ),
        t, partition_by=["p"],
    )
    dl.delta_rename_column(t, "p", "bucket")
    _a, meta, _p, _v = dl._replay(t, None)
    assert meta["partitionColumns"] == ["bucket"]
    assert sorted(
        (r.k, r.bucket) for r in dl.read_delta(spark, t).collect()
    )[0] == (0, "0")
    dl.write_delta(
        spark.range(6, 8).selectExpr(
            "id AS k", "CAST(id % 2 AS STRING) AS bucket"
        ),
        t, mode="append", partition_by=["bucket"],
    )
    assert dl.read_delta(spark, t).count() == 8


def test_delta_overwrite_regenerates_mapping(spark):
    t = _tmp("dow_")
    dl.write_delta(
        spark.range(0, 4).selectExpr(
            "id AS k", "CAST(id AS DOUBLE) AS v"
        ),
        t,
    )
    dl.delta_rename_column(t, "v", "val")
    dl.write_delta(
        spark.range(0, 3).selectExpr(
            "id AS k", "CAST(id AS STRING) AS s"
        ),
        t, mode="overwrite",
    )
    _a, meta, _p, _v = dl._replay(t, None)
    fields = json.loads(meta["schemaString"])["fields"]
    # every field of the NEW schema carries a valid mapping, ids
    # continue past the prior maxColumnId (never reused)
    ids = [f["metadata"]["delta.columnMapping.id"] for f in fields]
    assert all(i > 2 for i in ids)
    assert int(
        meta["configuration"]["delta.columnMapping.maxColumnId"]
    ) == max(ids)
    assert sorted(
        (r.k, r.s) for r in dl.read_delta(spark, t).collect()
    ) == [(0, "0"), (1, "1"), (2, "2")]


def test_delta_rename_refuses_dependent_constraint(spark):
    t = _tmp("dcx_")
    dl.write_delta(
        spark.range(0, 3).selectExpr(
            "id AS k", "CAST(id AS DOUBLE) AS v"
        ),
        t,
    )
    _a, meta, _p, v = dl._replay(t, None)
    meta = dict(meta)
    conf = dict(meta.get("configuration") or {})
    conf["delta.constraints.positive"] = "v >= 0"
    meta["configuration"] = conf
    with open(dl._log_path(t, v + 1), "w") as fh:
        fh.write(json.dumps({"metaData": meta}) + "\n")
    with pytest.raises(dl.DeltaProtocolError, match="constraint"):
        dl.delta_rename_column(t, "v", "val")
    with pytest.raises(dl.DeltaProtocolError, match="constraint"):
        dl.delta_drop_column(t, "v")


# --- SQL routing ------------------------------------------------------------


def test_sql_rename_drop_wire_formats(spark, tmp_path):
    dt = str(tmp_path / "d")
    it = str(tmp_path / "i")
    df = spark.range(0, 5).selectExpr(
        "id AS k", "CAST(id AS DOUBLE) AS v"
    )
    dl.write_delta(df, dt)
    ice.write_iceberg(df, it)
    cat = Catalog(str(tmp_path / "cat.json"))
    cat.register("d", dt, format="delta")
    cat.register("i", it, format="iceberg")
    snapshot_sql(spark, "ALTER TABLE d RENAME COLUMN v TO val",
                 catalog=cat)
    snapshot_sql(spark, "ALTER TABLE i RENAME COLUMN v TO val",
                 catalog=cat)
    got_d = snapshot_sql(
        spark, "SELECT k, val FROM d ORDER BY k", catalog=cat
    ).collect()
    got_i = snapshot_sql(
        spark, "SELECT k, val FROM i ORDER BY k", catalog=cat
    ).collect()
    assert [(r.k, r.val) for r in got_d] == \
        [(r.k, r.val) for r in got_i] == \
        [(i, float(i)) for i in range(5)]
    snapshot_sql(spark, "ALTER TABLE d DROP COLUMN val", catalog=cat)
    snapshot_sql(spark, "ALTER TABLE i DROP COLUMN val", catalog=cat)
    assert snapshot_sql(
        spark, "SELECT * FROM d", catalog=cat
    ).columns == ["k"]
    assert snapshot_sql(
        spark, "SELECT * FROM i", catalog=cat
    ).columns == ["k"]
