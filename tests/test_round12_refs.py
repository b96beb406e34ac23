"""Iceberg wire-format named REFS (round 12): the spec's ``refs``
map — tags pin snapshots, branches are mutable heads, data commits
advance ``main`` and carry the rest, expiration respects ref pins,
and SQL resolves ``VERSION AS OF '<name>'`` / ``ALTER TABLE …
CREATE/DROP TAG/BRANCH`` per format.
"""

import os
import tempfile

import pytest

from harmony_energy_data_pipeline_spark.catalog import Catalog
from harmony_energy_data_pipeline_spark.sources import iceberg as ice
from harmony_energy_data_pipeline_spark.sql import snapshot_sql


def _tmp(prefix="iref_"):
    return os.path.join(tempfile.mkdtemp(prefix=prefix), "t")


def _df(spark, lo, hi):
    return spark.range(lo, hi).selectExpr(
        "id AS k", "CAST(id AS DOUBLE) AS v"
    )


def test_tag_pins_branch_advances(spark):
    t = _tmp()
    ice.write_iceberg(_df(spark, 0, 5), t)
    sid = ice.iceberg_create_ref(t, "v1", kind="tag")
    ice.iceberg_create_ref(t, "audit", kind="branch")
    ice.write_iceberg(_df(spark, 5, 9), t, mode="append")
    meta = ice.table_metadata(t)
    # tag + side branch pinned; main advanced with the commit
    assert ice.iceberg_resolve_ref(t, "v1") == sid
    assert ice.iceberg_resolve_ref(t, "audit") == sid
    assert ice.iceberg_resolve_ref(t, "main") == \
        meta["current-snapshot-id"]
    assert ice.read_iceberg(spark, t, snapshot_id=sid).count() == 5
    with pytest.raises(ValueError, match="already exists"):
        ice.iceberg_create_ref(t, "v1")
    with pytest.raises(ValueError, match="main"):
        ice.iceberg_drop_ref(t, "main")


def test_expire_respects_ref_pins(spark):
    t = _tmp("iexp_")
    ice.write_iceberg(_df(spark, 0, 4), t)
    ice.iceberg_create_ref(t, "keepme", kind="tag")
    ice.write_iceberg(_df(spark, 4, 8), t, mode="append")
    ice.write_iceberg(_df(spark, 8, 12), t, mode="append")
    removed = ice.iceberg_expire_snapshots(t, keep_last=1)
    meta = ice.table_metadata(t)
    ids = {s["snapshot-id"] for s in meta["snapshots"]}
    # the tagged snapshot survives keep_last=1
    assert ice.iceberg_resolve_ref(t, "keepme") in ids
    # ... and still reads (its files were not reclaimed)
    assert ice.read_iceberg(
        spark, t, snapshot_id=ice.iceberg_resolve_ref(t, "keepme")
    ).count() == 4
    assert ice.read_iceberg(spark, t).count() == 12


def test_sql_refs_roundtrip(spark, tmp_path):
    t = str(tmp_path / "i")
    ice.write_iceberg(_df(spark, 0, 6), t)
    cat = Catalog(str(tmp_path / "cat.json"))
    cat.register("i", t, format="iceberg")
    snapshot_sql(spark, "ALTER TABLE i CREATE TAG 'rel1'",
                 catalog=cat)
    ice.write_iceberg(_df(spark, 6, 10), t, mode="append")
    assert snapshot_sql(
        spark, "SELECT COUNT(*) AS n FROM i", catalog=cat
    ).collect()[0].n == 10
    assert snapshot_sql(
        spark, "SELECT COUNT(*) AS n FROM i VERSION AS OF 'rel1'",
        catalog=cat,
    ).collect()[0].n == 6
    snapshot_sql(spark, "ALTER TABLE i DROP TAG 'rel1'", catalog=cat)
    with pytest.raises(KeyError, match="rel1"):
        snapshot_sql(
            spark,
            "SELECT COUNT(*) AS n FROM i VERSION AS OF 'rel1'",
            catalog=cat,
        )
