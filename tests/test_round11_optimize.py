"""Wire-format OPTIMIZE (round 11): ``delta_optimize`` bin-packs a
Delta table in one dataChange=false commit (DVs materialized away);
``iceberg_compact`` rewrites live rows under the current spec
(deletes applied, older snapshots intact); SQL ``OPTIMIZE`` routes
per table format."""

import json
import os
import tempfile

import pytest

from harmony_energy_data_pipeline_spark.catalog import Catalog
from harmony_energy_data_pipeline_spark.sources import deltalake as dl
from harmony_energy_data_pipeline_spark.sources import iceberg as ice
from harmony_energy_data_pipeline_spark.sql import snapshot_sql


def _tmp(prefix):
    return os.path.join(tempfile.mkdtemp(prefix=prefix), "t")


def test_delta_optimize_packs_and_preserves_content(spark):
    t = _tmp("dopt_")
    dl.write_delta(
        spark.range(0, 40).selectExpr(
            "id AS k", "CAST(id AS DOUBLE) AS v"
        ).repartition(6),
        t, stats_cols=["k"],
    )
    for i in range(3):
        dl.write_delta(
            spark.range(100 + i * 10, 110 + i * 10).selectExpr(
                "id AS k", "CAST(id AS DOUBLE) AS v"
            ),
            t, mode="append",
        )
    adds0, _m, _p, v0 = dl._replay(t, None)
    ver = dl.delta_optimize(spark, t)
    adds1, _m, _p, _v = dl._replay(t, None)
    assert len(adds1) < len(adds0)
    assert dl.read_delta(spark, t).count() == 70
    # time travel to the pre-pack version unaffected
    assert dl.read_delta(spark, t, version=v0).count() == 70
    # the commit is dataChange=false throughout (streaming skips it)
    with open(os.path.join(t, "_delta_log",
                           f"{ver:020d}.json")) as fh:
        acts = [json.loads(ln) for ln in fh if ln.strip()]
    for a in acts:
        for kind in ("add", "remove"):
            if kind in a:
                assert a[kind]["dataChange"] is False
    # idempotence guard: nothing to pack → None
    assert dl.delta_optimize(spark, t, min_files=99) is None


def test_delta_optimize_materializes_dvs(spark):
    t = _tmp("doptdv_")
    dl.write_delta(
        spark.range(0, 30).selectExpr(
            "id AS k", "CAST(id % 3 AS STRING) AS p",
            "CAST(id AS DOUBLE) AS v",
        ).coalesce(1),
        t,
    )
    # hand-attach a DV via the shared fixture helper
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "colmap", os.path.join(os.path.dirname(__file__),
                               "test_delta_dv_colmap.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    deleted = mod._attach_dv(spark, t, "k % 5 = 0")
    assert dl.read_delta(spark, t).count() == 30 - len(deleted)
    dl.delta_optimize(spark, t, min_files=1)
    adds, _m, _p, _v = dl._replay(t, None)
    assert all(not a.get("deletionVector") for a in adds)
    assert dl.read_delta(spark, t).count() == 30 - len(deleted)


def test_delta_optimize_of_fully_deleted_table(spark):
    """A table whose every row is DV-deleted packs to ZERO live
    files (valid Delta state), not an empty-batch error."""
    t = _tmp("doptz_")
    dl.write_delta(
        spark.range(0, 10).selectExpr("id AS k").coalesce(1), t
    )
    dl.delta_delete_where(spark, t, "true")
    assert dl.read_delta(spark, t).count() == 0
    v = dl.delta_optimize(spark, t, min_files=1)
    assert v is not None
    adds, _m, _p, _v = dl._replay(t, None)
    assert adds == []
    assert dl.read_delta(spark, t).count() == 0


def test_iceberg_compact_applies_deletes_keeps_spec(spark):
    t = _tmp("iopt_")
    df = spark.range(0, 60).selectExpr(
        "id AS k", "CAST(id % 3 AS STRING) AS tag"
    )
    ice.write_iceberg(
        df, t, partition_by=["bucket[4](k)"], stats_cols=["k"]
    )
    first = ice.table_metadata(t)["current-snapshot-id"]
    ice.write_equality_deletes(spark, t, [{"tag": "1"}], ["tag"])
    before = ice.read_iceberg(spark, t).count()
    ice.iceberg_compact(spark, t)
    _data, dels = ice.live_files(t)
    assert dels == []
    assert ice.read_iceberg(spark, t).count() == before == 40
    meta = ice.table_metadata(t)
    spec = meta["partition-specs"][meta["default-spec-id"]]["fields"]
    assert [(f["name"], f["transform"]) for f in spec] == [
        ("k_bucket", "bucket[4]"),
    ]
    # the pre-delete snapshot still time-travels
    assert ice.read_iceberg(spark, t, snapshot_id=first).count() == 60


def test_iceberg_expire_snapshots(spark):
    t = _tmp("iexp_")
    for i in range(4):
        ice.write_iceberg(
            spark.range(i * 10, i * 10 + 10).selectExpr("id AS k"),
            t, mode="append" if i else "overwrite",
        )
    hist0 = ice.iceberg_history(t)
    assert len(hist0) == 4
    # dry run names only files EXCLUSIVELY referenced by expired
    # snapshots (append chains share data files with kept ones)
    dry = ice.iceberg_expire_snapshots(t, keep_last=1, dry_run=True)
    removed = ice.iceberg_expire_snapshots(t, keep_last=1)
    assert removed == dry
    assert len(ice.iceberg_history(t)) == 1
    # the table still reads in full (append lineage: data shared)
    assert ice.read_iceberg(spark, t).count() == 40
    # expired manifest lists are gone from disk
    for rel in removed:
        assert not os.path.exists(os.path.join(t, rel))
    with pytest.raises(ValueError, match="keep_last"):
        ice.iceberg_expire_snapshots(t, keep_last=0)


def test_iceberg_expire_after_compact_drops_old_files(spark):
    t = _tmp("iexp2_")
    ice.write_iceberg(
        spark.range(0, 30).selectExpr(
            "id AS k", "CAST(id % 3 AS STRING) AS tag"
        ),
        t,
    )
    ice.write_equality_deletes(spark, t, [{"tag": "0"}], ["tag"])
    ice.iceberg_compact(spark, t)
    n = ice.read_iceberg(spark, t).count()
    removed = ice.iceberg_expire_snapshots(t, keep_last=1)
    # pre-compact data files AND the delete file are reclaimed
    assert any("delete-" in r for r in removed)
    assert ice.read_iceberg(spark, t).count() == n == 20


def test_sql_vacuum_and_history_route_iceberg(spark):
    cat = Catalog(tempfile.mkdtemp(prefix="r11iv_"))
    ipath = _tmp("sqlv_i")
    for i in range(3):
        ice.write_iceberg(
            spark.range(i * 5, i * 5 + 5).selectExpr("id AS k"),
            ipath, mode="append" if i else "overwrite",
        )
    cat.register("ivt", path=ipath, format="iceberg")
    hist = snapshot_sql(
        spark, "DESCRIBE HISTORY ivt", catalog=cat
    ).collect()
    assert len(hist) == 3
    r = snapshot_sql(
        spark, "VACUUM ivt RETAIN 1 VERSIONS", catalog=cat
    ).collect()[0]
    assert r.operation == "vacuum" and r.removed_files >= 0
    assert len(ice.iceberg_history(ipath)) == 1
    # delta history routes too
    dpath = _tmp("sqlv_d")
    dl.write_delta(spark.range(0, 5).selectExpr("id AS k"), dpath)
    dl.write_delta(spark.range(5, 9).selectExpr("id AS k"), dpath,
                   mode="append")
    cat.register("dht", path=dpath, format="delta")
    hist = snapshot_sql(
        spark, "DESCRIBE HISTORY dht", catalog=cat
    ).collect()
    assert len(hist) == 2


def test_sql_optimize_routes_per_format(spark):
    cat = Catalog(tempfile.mkdtemp(prefix="r11opt_"))
    dpath = _tmp("sqlo_d")
    dl.write_delta(
        spark.range(0, 20).selectExpr("id AS k").repartition(4), dpath
    )
    cat.register("dt", path=dpath, format="delta")
    r = snapshot_sql(spark, "OPTIMIZE dt", catalog=cat).collect()[0]
    assert r.operation == "optimize" and r.version is not None
    assert dl.read_delta(spark, dpath).count() == 20
    ipath = _tmp("sqlo_i")
    ice.write_iceberg(
        spark.range(0, 20).selectExpr("id AS k"), ipath
    )
    cat.register("it", path=ipath, format="iceberg")
    r = snapshot_sql(spark, "OPTIMIZE it", catalog=cat).collect()[0]
    assert r.operation == "optimize"
    assert ice.read_iceberg(spark, ipath).count() == 20
