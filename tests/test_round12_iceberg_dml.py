"""Round-12 Iceberg wire-format DML rework (VERDICT r11 items 1-4, 8).

1. DELETE FROM a PARTITIONED table commits a SPEC-VALID delete
   manifest: the delete manifest's spec-id resolves to a REGISTERED
   unpartitioned spec (the global position-delete shape), never a
   partitioned spec-id claiming an empty tuple.
2. The DML position path is DISTRIBUTED: no DataFrame.collect /
   toPandas / toLocalIterator anywhere in delete/update (pinned by
   monkeypatching them to raise).
3. The matched set is evaluated ONCE: a non-deterministic predicate
   (rand()) cannot desynchronize the deleted positions from the
   re-inserted rows.
4. Partitioned UPDATE stages transformed rows under the current spec
   with real partition tuples (foreign-readable pruning).
5. ``metadata-log`` is populated on every commit (the spec chain
   foreign metadata time travel inspects).
"""

import json
import os
import tempfile

import pytest
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from harmony_energy_data_pipeline_spark.catalog import Catalog
from harmony_energy_data_pipeline_spark.sources import iceberg as ice
from harmony_energy_data_pipeline_spark.sources.avrolite import read_avro
from harmony_energy_data_pipeline_spark.sql import snapshot_sql


def _tmp(prefix="r12ice_"):
    return os.path.join(tempfile.mkdtemp(prefix=prefix), "t")


def _manifest_list(path):
    meta = ice.table_metadata(path)
    snap = next(
        s for s in meta["snapshots"]
        if s["snapshot-id"] == meta["current-snapshot-id"]
    )
    mlist, _ = read_avro(
        ice._resolve_file_path(path, snap["manifest-list"])
    )
    return meta, mlist


def test_partitioned_delete_spec_valid_manifest(spark):
    t = _tmp("pdel_")
    ice.write_iceberg(
        spark.range(0, 40).selectExpr(
            "id AS k", "CAST(id % 4 AS STRING) AS p"
        ),
        t, partition_by=["p"],
    )
    sid, n = ice.iceberg_delete_where(spark, t, "k >= 30")
    assert n == 10
    meta, mlist = _manifest_list(t)
    specs = {sp["spec-id"]: sp for sp in meta["partition-specs"]}
    del_mans = [m for m in mlist if m["content"] == 1]
    assert del_mans, "delete manifest missing"
    for m in del_mans:
        sp = specs[m["partition_spec_id"]]
        # the delete manifest's spec must be the UNPARTITIONED one —
        # a strict foreign reader resolves applicability through it
        assert sp["fields"] == []
    # data manifests keep the table's partitioned spec
    data_mans = [m for m in mlist if m["content"] == 0]
    assert all(
        specs[m["partition_spec_id"]]["fields"] for m in data_mans
    )
    # and the rows read correctly
    assert ice.read_iceberg(spark, t).count() == 30
    # SQL routes the same way
    cat = Catalog(tempfile.mkdtemp(prefix="pdelc_"))
    cat.register("pt", path=t, format="iceberg")
    snapshot_sql(spark, "DELETE FROM pt WHERE k < 5", catalog=cat)
    assert ice.read_iceberg(spark, t).count() == 25


def test_dml_position_path_never_collects(spark, monkeypatch):
    """The positions of matched rows must NEVER be collected to the
    driver (O(matched rows) memory at 100 TB) — executor-side delete
    parquet, driver descriptors only."""
    t = _tmp("nocol_")
    ice.write_iceberg(
        spark.range(0, 1000).selectExpr(
            "id AS k", "CAST(id AS DOUBLE) AS v"
        ),
        t,
    )

    def _boom(self, *a, **kw):
        raise AssertionError(
            "driver-side row materialization inside wire DML"
        )

    try:  # Spark 4: the classic impl overrides the facade's methods
        from pyspark.sql.classic.dataframe import (
            DataFrame as _ImplDF,
        )
    except ImportError:
        _ImplDF = DataFrame
    monkeypatch.setattr(_ImplDF, "collect", _boom)
    monkeypatch.setattr(_ImplDF, "toPandas", _boom)
    monkeypatch.setattr(_ImplDF, "toLocalIterator", _boom)
    sid, n = ice.iceberg_delete_where(spark, t, "k % 10 = 3")
    assert n == 100
    _sid2, n2 = ice.iceberg_update_where(
        spark, t, "k % 10 = 4", {"v": "v + 0.5"}
    )
    assert n2 == 100
    monkeypatch.undo()
    rows = {r.k: r.v for r in ice.read_iceberg(spark, t).collect()}
    assert len(rows) == 900
    assert rows[4] == 4.5 and rows[14] == 14.5
    assert 3 not in rows and 13 not in rows


def test_update_nondeterministic_predicate_consistent(spark):
    """rand()-gated UPDATE: with single evaluation, every deleted
    position has exactly one re-inserted row — total count invariant
    and the updated rows carry the transform."""
    t = _tmp("ndet_")
    ice.write_iceberg(
        spark.range(0, 2000).selectExpr(
            "id AS k", "CAST(0 AS DOUBLE) AS v"
        ),
        t,
    )
    _sid, n = ice.iceberg_update_where(
        spark, t, "rand() < 0.5", {"v": "1.0"}
    )
    df = ice.read_iceberg(spark, t)
    assert df.count() == 2000  # no duplicated or lost rows
    marked = df.filter("v = 1.0").count()
    assert marked == n  # the transform landed on exactly the matched set
    # keys still unique
    assert df.select("k").distinct().count() == 2000


def test_partitioned_update_real_tuples(spark):
    t = _tmp("pupd_")
    ice.write_iceberg(
        spark.range(0, 30).selectExpr(
            "id AS k", "CAST(id % 3 AS STRING) AS p",
            "CAST(id AS DOUBLE) AS v",
        ),
        t, partition_by=["p"],
    )
    _sid, n = ice.iceberg_update_where(
        spark, t, "k < 6", {"v": "v * -1"}
    )
    assert n == 6
    meta, mlist = _manifest_list(t)
    # the update's data manifest carries REAL partition tuples
    upd_mans = [
        m for m in mlist
        if m["content"] == 0
        and m["added_snapshot_id"] == meta["current-snapshot-id"]
    ]
    assert upd_mans
    tuples = set()
    for m in upd_mans:
        entries, _ = read_avro(
            ice._resolve_file_path(t, m["manifest_path"])
        )
        for e in entries:
            tuples.add(e["data_file"]["partition"]["p"])
    assert tuples == {"0", "1", "2"}
    rows = {r.k: r.v for r in ice.read_iceberg(spark, t).collect()}
    assert rows[5] == -5.0 and rows[10] == 10.0 and len(rows) == 30
    # ONE snapshot for the update
    assert len(ice.iceberg_history(t)) == 2


def test_metadata_log_chain(spark):
    t = _tmp("mlog_")
    df = spark.range(0, 10).selectExpr("id AS k")
    ice.write_iceberg(df, t)
    ice.write_iceberg(df.selectExpr("k + 10 AS k"), t, mode="append")
    ice.write_iceberg(df.selectExpr("k + 20 AS k"), t, mode="append")
    ice.iceberg_delete_where(spark, t, "k = 0")
    meta = ice.table_metadata(t)
    mlog = meta.get("metadata-log") or []
    # v1..v3 are all listed, in commit order, and resolvable
    assert [e["metadata-file"] for e in mlog] == [
        f"metadata/v{i}.metadata.json" for i in (1, 2, 3)
    ]
    for e in mlog:
        fp = ice._resolve_file_path(t, e["metadata-file"])
        assert os.path.exists(fp)
        with open(fp, encoding="utf-8") as fh:
            old = json.load(fh)
        assert old["last-updated-ms"] == e["timestamp-ms"]


def test_dml_scan_prunes_files(spark, monkeypatch):
    """Conjunctive DML predicates skip non-matching files at PLANNING
    time (partition tuples + bounds) — `DELETE WHERE p = x` on a
    partitioned table scans one partition's files, not the table."""
    t = _tmp("prune_")
    ice.write_iceberg(
        spark.range(0, 90).selectExpr(
            "id AS k", "CAST(id % 3 AS STRING) AS p",
            "CAST(id AS DOUBLE) AS v",
        ),
        t, partition_by=["p"], stats_cols=["k"],
    )
    total = len(ice.live_files(t)[0])
    assert total >= 3
    seen = {}
    orig = ice._provenance_scan

    def _spy(spark_, path_, data_, schema_, deletes_, *a):
        seen["n"] = len(data_)
        return orig(spark_, path_, data_, schema_, deletes_, *a)

    monkeypatch.setattr(ice, "_provenance_scan", _spy)
    _sid, n = ice.iceberg_delete_where(spark, t, "p = '1'")
    assert n == 30
    assert seen["n"] < total  # only partition p=1's files scanned
    # update prunes on bounds too (k stats)
    # 80..89 minus the 3 already-deleted p='1' rows (82, 85, 88)
    _sid2, n2 = ice.iceberg_update_where(
        spark, t, "k >= 80", {"v": "0.0"}
    )
    assert n2 == 7
    rows = {r.k: r.v for r in ice.read_iceberg(spark, t).collect()}
    assert len(rows) == 60 and rows[84] == 0.0 and 85 not in rows
    # UPDATE prunes on zone-map BOUNDS too: two appends with
    # disjoint k ranges → the k >= 60 update scans one file
    t2 = _tmp("pruneb_")
    mk = lambda lo, hi: spark.range(lo, hi).selectExpr(
        "id AS k", "CAST(id AS DOUBLE) AS v"
    ).coalesce(1)
    ice.write_iceberg(mk(0, 45), t2, stats_cols=["k"])
    ice.write_iceberg(mk(45, 90), t2, mode="append",
                      stats_cols=["k"])
    assert len(ice.live_files(t2)[0]) == 2
    seen.clear()
    _sid3, n3 = ice.iceberg_update_where(
        spark, t2, "k >= 60", {"v": "-1.0"}
    )
    assert n3 == 30 and seen["n"] == 1
