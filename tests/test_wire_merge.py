"""Wire-format MERGE — the full WHEN-clause surface committed IN the
Delta / Iceberg formats (single MOR commit, no adoption):

1. rich clause semantics (conditioned DELETE/UPDATE, INSERT, NMBS)
   match the native engine's on both formats;
2. Delta CDF records the MERGE kinds (update_preimage/postimage,
   delete, insert) with real partition values;
3. insert-only merges don't force the deletionVectors protocol
   upgrade onto foreign readers;
4. the SQL facade routes MERGE to the wire formats;
5. driver materialization stays descriptor-sized (O(#files), never
   O(matched rows)) and the target scan is zone-map scoped by the
   source keys;
6. a non-deterministic clause condition cannot desynchronize the
   delete and insert halves (single evaluation).

Reference parity: the keyed upsert in src/serve/load.py:43-46 is the
unconditional special case — these run it (and the conditioned CDC
forms) against foreign-format tables directly.
"""

from __future__ import annotations

import json
import os
import tempfile

from pyspark.sql import DataFrame, Row
from pyspark.sql import functions as F

from harmony_energy_data_pipeline_spark.sources import deltalake as dl
from harmony_energy_data_pipeline_spark.sources import iceberg as ice
from harmony_energy_data_pipeline_spark.sql import snapshot_sql


def _tmp(prefix="wm_"):
    return os.path.join(tempfile.mkdtemp(prefix=prefix), "t")


def _base_df(spark):
    return spark.createDataFrame([
        Row(k=i, grp="a" if i % 2 else "b", val=float(i))
        for i in range(1, 11)
    ])


def _src_df(spark):
    return spark.createDataFrame([
        Row(k=2, val=200.0),   # matched -> update
        Row(k=3, val=-3.0),    # matched -> conditioned delete
        Row(k=99, val=99.0),   # not matched -> insert
    ])


_RICH = dict(
    matched=[
        {"condition": "s.val < 0", "action": "delete"},
        {"condition": None, "action": "update", "set": {"val": "s.val"}},
    ],
    not_matched=[{
        "condition": None,
        "values": {"k": "s.k", "grp": "'new'", "val": "s.val"},
    }],
)


def _check_rich(reader, spark, t):
    rows = {r.k: (r.grp, r.val) for r in reader(spark, t).collect()}
    assert 3 not in rows            # conditioned DELETE fired first
    assert rows[2] == ("b", 200.0)  # conditioned UPDATE
    assert rows[99] == ("new", 99.0)  # INSERT with explicit VALUES
    assert len(rows) == 10          # 10 - 1 deleted + 1 inserted


def test_delta_merge_rich_semantics(spark):
    t = _tmp("dmr_")
    dl.write_delta(_base_df(spark), t, partition_by=["grp"])
    v, n = dl.delta_merge_when(spark, t, _src_df(spark), key="k",
                               **_RICH)
    assert n == 3
    _check_rich(dl.read_delta, spark, t)
    # idempotent shape: a second identical merge updates k=2 again
    # (no-op value), re-inserts nothing new, still no k=3
    v2, n2 = dl.delta_merge_when(spark, t, _src_df(spark), key="k",
                                 **_RICH)
    assert n2 == 3  # k=2 update, k=3 insert?? no: k=3 was deleted ->
    # now NOT MATCHED -> inserts; k=99 now matched -> update
    rows = {r.k: r.val for r in dl.read_delta(spark, t).collect()}
    assert rows[3] == -3.0 and len(rows) == 11


def test_iceberg_merge_rich_semantics_partitioned(spark):
    t = _tmp("imr_")
    ice.write_iceberg(_base_df(spark), t, mode="overwrite",
                      partition_by=["grp"])
    sid, n = ice.iceberg_merge_when(spark, t, _src_df(spark), key="k",
                                    **_RICH)
    assert n == 3
    _check_rich(ice.read_iceberg, spark, t)
    # the snapshot is wire-valid: changes replay as delete+insert
    ch = ice.read_iceberg_changes(spark, t)
    last = [(r.k, r._change_type) for r in ch.collect()
            if r._snapshot_id == sid]
    assert sorted(last) == [
        (2, "delete"), (2, "insert"), (3, "delete"), (99, "insert"),
    ]


def test_delta_merge_cdf_kinds(spark):
    t = _tmp("dmc_")
    dl.write_delta(_base_df(spark), t, partition_by=["grp"])
    v, n = dl.delta_merge_when(spark, t, _src_df(spark), key="k",
                               record_cdf=True, **_RICH)
    ch = dl.read_delta_changes(spark, t, v - 1, v)
    kinds = sorted((r.k, r.grp, r._change_type) for r in ch.collect())
    assert kinds == [
        (2, "b", "update_postimage"), (2, "b", "update_preimage"),
        (3, "a", "delete"), (99, "new", "insert"),
    ]


def test_delta_merge_nmbs_bounded_delete(spark):
    t = _tmp("dmn_")
    dl.write_delta(_base_df(spark), t, partition_by=["grp"])
    src = spark.createDataFrame([Row(k=4, val=0.0)])
    v, n = dl.delta_merge_when(
        spark, t, src, key="k",
        matched=[{"condition": None, "action": "update", "set": None}],
        not_matched_by_source=[
            {"condition": "t.grp = 'b'", "action": "delete"}
        ],
    )
    out = dl.read_delta(spark, t)
    assert sorted(r.k for r in out.filter("grp='b'").collect()) == [4]
    assert out.filter("grp='a'").count() == 5  # outside scope: kept


def test_delta_merge_insert_only_no_dv_protocol(spark):
    t = _tmp("dmi_")
    dl.write_delta(_base_df(spark), t)
    v, n = dl.delta_merge_when(
        spark, t, _src_df(spark), key="k",
        not_matched=[{"condition": None, "values": None}],
    )
    assert n == 1  # only k=99 inserts; matched rows keep
    assert dl.read_delta(spark, t).count() == 11
    _a, _m, proto, _v = dl._replay(t, None)
    # no DV was written: the commit must not force reader v3 /
    # deletionVectors onto foreign readers
    assert (proto or {}).get("minReaderVersion", 1) == 1
    assert not (proto or {}).get("readerFeatures")


def test_delta_merge_duplicate_source_keys(spark):
    t = _tmp("dmd_")
    dl.write_delta(_base_df(spark), t)
    dup = spark.createDataFrame([
        Row(k=2, grp="x", val=1.0), Row(k=2, grp="x", val=2.0),
    ])
    # no matched clause: legal — the matched target row is kept once,
    # neither copy inserts (both match), nothing changes
    v, n = dl.delta_merge_when(
        spark, t, dup, key="k",
        not_matched=[{"condition": None, "values": None}],
    )
    assert n == 0 and dl.read_delta(spark, t).count() == 10
    # with a matched clause: the SQL cardinality rule raises
    try:
        dl.delta_merge_when(
            spark, t, dup, key="k",
            matched=[{"condition": None, "action": "update",
                      "set": None}],
        )
        raise AssertionError("expected cardinality violation")
    except ValueError as e:
        assert "cardinality" in str(e)


def test_sql_merge_routes_to_wire_formats(spark):
    for fmt, writer, reader in (
        ("delta", dl.write_delta, dl.read_delta),
        ("iceberg",
         lambda df, p: ice.write_iceberg(df, p, mode="overwrite"),
         ice.read_iceberg),
    ):
        t = _tmp(f"sqlm_{fmt}_")
        writer(_base_df(spark), t)
        _src_df(spark).createOrReplaceTempView(f"u_{fmt}")
        snapshot_sql(spark, f"""
            MERGE INTO hot USING u_{fmt} AS s ON hot.k = s.k
            WHEN MATCHED AND s.val < 0 THEN DELETE
            WHEN MATCHED THEN UPDATE SET val = s.val
            WHEN NOT MATCHED THEN
              INSERT (k, grp, val) VALUES (s.k, 'new', s.val)
        """, tables={"hot": t})
        _check_rich(reader, spark, t)
        # WITH SCHEMA EVOLUTION routes to the wire formats too
        # (round 12): a source column the target lacks lands as a
        # metadata-only ADD COLUMN in the same flow
        spark.createDataFrame(
            [Row(k=99, val=99.5, tag="x")]
        ).createOrReplaceTempView(f"ue_{fmt}")
        snapshot_sql(
            spark,
            f"MERGE WITH SCHEMA EVOLUTION INTO hot USING ue_{fmt} "
            "AS s ON hot.k = s.k "
            "WHEN MATCHED THEN UPDATE SET val = s.val, tag = s.tag",
            tables={"hot": t},
        )
        out = reader(spark, t)
        assert "tag" in out.columns, fmt
        got = {(r.k, r.val, r.tag) for r in out.collect()}
        assert (99, 99.5, "x") in got, fmt
        assert all(r.tag is None for r in out.collect()
                   if r.k != 99), fmt


def test_merge_driver_bounded_collects(spark, monkeypatch):
    """Inside a wire merge the driver materializes only bounded
    frames: the source-key min/max (1 row), the cardinality probe
    (≤1 row), and the per-touched-file DV descriptors (≤ #files) —
    never O(matched rows)."""
    t = _tmp("dmb_")
    dl.write_delta(
        spark.range(0, 4000).repartition(4).selectExpr(
            "id AS k", "CAST(id AS DOUBLE) AS v"
        ),
        t,
    )
    src = spark.range(0, 4000, 2).selectExpr(
        "id AS k", "CAST(-(id + 1) AS DOUBLE) AS v"
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
            AssertionError("toPandas inside wire MERGE")
        ),
    )
    v, n = dl.delta_merge_when(
        spark, t, src, key="k",
        matched=[{"condition": None, "action": "update",
                  "set": {"v": "s.v"}}],
        not_matched=[{"condition": None, "values": None}],
    )
    monkeypatch.undo()
    assert n == 2000
    assert sizes and max(sizes) <= 8
    rows = dl.read_delta(spark, t)
    assert rows.count() == 4000
    assert rows.filter("v < 0").count() == 2000


def test_merge_scope_prunes_unmatched_files(spark):
    """A data file whose stats range provably excludes every source
    key is not even DV-touched: the commit carries remove/re-add pairs
    only for files the keys can live in."""
    t = _tmp("dms_")
    lo = spark.range(0, 1000).selectExpr(
        "id AS k", "CAST(id AS DOUBLE) AS v")
    hi = spark.range(100000, 101000).selectExpr(
        "id AS k", "CAST(id AS DOUBLE) AS v")
    dl.write_delta(lo.coalesce(1), t, mode="overwrite")
    dl.write_delta(hi.coalesce(1), t, mode="append")
    adds, _m, _p, v0 = dl._replay(t, None)
    assert len(adds) == 2
    src = spark.createDataFrame([Row(k=5, v=-5.0)])
    v, n = dl.delta_merge_when(
        spark, t, src, key="k",
        matched=[{"condition": None, "action": "update", "set": None}],
    )
    assert n == 1
    removes = [json.loads(line)["remove"]["path"]
               for line in open(dl._log_path(t, v))
               if '"remove"' in line]
    assert len(removes) == 1  # the hi-range file was never touched
    rows = {r.k: r.v for r in dl.read_delta(spark, t).collect()}
    assert rows[5] == -5.0 and rows[100000] == 100000.0
    assert len(rows) == 2000


def test_iceberg_merge_scope_prunes_unmatched_files(spark):
    t = _tmp("ims_")
    lo = spark.range(0, 1000).selectExpr(
        "id AS k", "CAST(id AS DOUBLE) AS v")
    hi = spark.range(100000, 101000).selectExpr(
        "id AS k", "CAST(id AS DOUBLE) AS v")
    ice.write_iceberg(lo.coalesce(1), t, mode="overwrite")
    ice.write_iceberg(hi.coalesce(1), t, mode="append")
    src = spark.createDataFrame([Row(k=5, v=-5.0)])
    sid, n = ice.iceberg_merge_when(
        spark, t, src, key="k",
        matched=[{"condition": None, "action": "update", "set": None}],
    )
    assert n == 1
    # the delete parquet references exactly one data file
    meta = ice.table_metadata(t)
    data, deletes = ice.live_files(t, meta)
    del_paths = {d["file_path"] for d in deletes}
    assert len(del_paths) == 1
    import pyarrow.parquet as pq
    refs = set()
    for rel in del_paths:
        tbl = pq.read_table(os.path.join(t, rel),
                            columns=["file_path"])
        refs |= set(tbl.column("file_path").to_pylist())
    assert len(refs) == 1
    rows = {r.k: r.v for r in ice.read_iceberg(spark, t).collect()}
    assert rows[5] == -5.0 and len(rows) == 2000


def test_merge_nondeterministic_condition_consistent(spark):
    """A rand()-gated matched UPDATE must not desynchronize the
    delete and re-insert halves: single evaluation keeps the row
    count and key uniqueness intact on both formats."""
    for fmt, writer, reader, merge in (
        ("delta", dl.write_delta, dl.read_delta, dl.delta_merge_when),
        ("iceberg",
         lambda df, p: ice.write_iceberg(df, p, mode="overwrite"),
         ice.read_iceberg, ice.iceberg_merge_when),
    ):
        t = _tmp(f"nd_{fmt}_")
        writer(spark.range(0, 500).selectExpr(
            "id AS k", "CAST(0 AS DOUBLE) AS v"), t)
        src = spark.range(0, 500).selectExpr(
            "id AS k", "CAST(1 AS DOUBLE) AS v")
        _v, _n = merge(
            spark, t, src, key="k",
            matched=[{"condition": "rand() < 0.5",
                      "action": "update", "set": {"v": "s.v"}}],
        )
        out = reader(spark, t)
        assert out.count() == 500, fmt
        assert out.select("k").distinct().count() == 500, fmt
        # every row is exactly pre- or post-image, never both/neither
        assert out.filter("v NOT IN (0.0, 1.0)").count() == 0, fmt
