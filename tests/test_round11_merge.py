"""Rich MERGE WHEN clauses (round 11, VERDICT r10 #2).

``snapshot_merge_when`` (native) + the SQL facade's full WHEN
surface: conditioned MATCHED UPDATE/DELETE, conditioned NOT MATCHED
INSERT (cols) VALUES, NOT MATCHED BY SOURCE DELETE/UPDATE —
first-match-wins in clause order, SQL cardinality rule enforced.
"""

import os
import tempfile

import pytest
from pyspark.sql import functions as F

from harmony_energy_data_pipeline_spark.catalog import Catalog
from harmony_energy_data_pipeline_spark.sinks import snapshots as snap
from harmony_energy_data_pipeline_spark.sql import (
    snapshot_sql,
    snapshot_sql_script,
)


def _tmp(prefix="mw_"):
    return os.path.join(tempfile.mkdtemp(prefix=prefix), "t")


def _base(spark, n=20):
    return spark.range(0, n).selectExpr(
        "id AS k", "CAST(id * 10 AS DOUBLE) AS v",
        "CAST('old' AS STRING) AS tag",
    )


def _chg(spark):
    return spark.createDataFrame(
        [(5, 555.0, "upd"), (7, -1.0, "del"),
         (100, 1000.0, "new"), (101, -1.0, "skip")],
        "k long, v double, tag string",
    )


def test_merge_when_native_all_clause_kinds(spark):
    t = _tmp()
    snap.snapshot_write(_base(spark), t, member_cols=["k"])
    snap.snapshot_merge_when(
        spark, t, _chg(spark), key="k",
        matched=[
            {"condition": "s.tag = 'del'", "action": "delete"},
            {"condition": None, "action": "update",
             "set": {"v": "s.v", "tag": "concat('u:', s.tag)"}},
        ],
        not_matched=[{"condition": "s.v > 0", "values": None}],
        not_matched_by_source=[
            {"condition": "t.k >= 18", "action": "delete"},
        ],
    )
    rows = {r.k: (r.v, r.tag)
            for r in snap.read_snapshot(spark, t).collect()}
    assert 7 not in rows and 18 not in rows and 19 not in rows
    assert rows[5] == (555.0, "u:upd")
    assert rows[100] == (1000.0, "new")
    assert 101 not in rows  # insert condition filtered it
    assert rows[3] == (30.0, "old")  # untouched
    assert len(rows) == 18


def test_merge_when_first_clause_wins(spark):
    t = _tmp()
    snap.snapshot_write(_base(spark, 5), t)
    src = spark.createDataFrame([(2, 1.0, "x")],
                                "k long, v double, tag string")
    snap.snapshot_merge_when(
        spark, t, src, key="k",
        matched=[
            {"condition": "s.k = 2", "action": "update",
             "set": {"tag": "'first'"}},
            {"condition": None, "action": "update",
             "set": {"tag": "'second'"}},
        ],
    )
    rows = {r.k: r.tag for r in snap.read_snapshot(spark, t).collect()}
    assert rows[2] == "first"
    assert rows[1] == "old"  # matched-by-no-source-row rows keep


def test_merge_when_cardinality_violation_raises(spark):
    t = _tmp()
    snap.snapshot_write(_base(spark, 5), t)
    dup = spark.createDataFrame(
        [(2, 1.0, "a"), (2, 2.0, "b")], "k long, v double, tag string"
    )
    with pytest.raises(ValueError, match="cardinality"):
        snap.snapshot_merge_when(
            spark, t, dup, key="k",
            matched=[{"condition": None, "action": "update",
                      "set": None}],
        )
    # insert-only merges tolerate duplicate source keys (no target
    # row is touched twice)
    v = snap.snapshot_merge_when(
        spark, t, dup.filter(F.lit(True)), key="k",
        not_matched=[{"condition": None, "values": None}],
    )
    assert v >= 1


def test_merge_when_set_star_and_missing_source_cols(spark):
    t = _tmp()
    snap.snapshot_write(_base(spark, 6), t)
    # source lacks `tag`: SET * updates only source-carried columns,
    # INSERT * null-fills the rest
    src = spark.createDataFrame([(3, 99.0), (50, 1.0)],
                                "k long, v double")
    snap.snapshot_merge_when(
        spark, t, src, key="k",
        matched=[{"condition": None, "action": "update", "set": None}],
        not_matched=[{"condition": None, "values": None}],
    )
    rows = {r.k: (r.v, r.tag)
            for r in snap.read_snapshot(spark, t).collect()}
    assert rows[3] == (99.0, "old")   # tag kept on SET *
    assert rows[50] == (1.0, None)    # tag null-filled on INSERT *


def test_merge_when_nmbs_conditional_prunes_unconditional_rewrites(spark):
    """A range-parseable NMBS condition rewrites only in-scope files;
    an unconditional NMBS delete must rewrite the whole table."""
    t = _tmp()
    snap.snapshot_write(
        _base(spark, 100).repartition(4), t, stats_cols=["k"],
    )
    v0 = snap.latest_version(t)
    m0 = snap._read_manifest(t, v0)
    src = spark.createDataFrame([(1, 1.0, "z")],
                                "k long, v double, tag string")
    snap.snapshot_merge_when(
        spark, t, src, key="k",
        not_matched_by_source=[
            {"condition": "t.k >= 98", "action": "delete"},
        ],
    )
    assert snap.read_snapshot(spark, t).count() == 98
    m1 = snap._read_manifest(t, snap.latest_version(t))
    # delta manifest: only range-matching parents removed
    assert len(m1.get("removes", m1["files"])) < len(m0["files"])


def test_sql_merge_rich_clauses_and_aliases(spark):
    cat = Catalog(tempfile.mkdtemp(prefix="mwsql_"))
    _base(spark).createOrReplaceTempView("mw_base")
    _chg(spark).createOrReplaceTempView("mw_chg")
    out = snapshot_sql_script(spark, """
      CREATE TABLE mt AS SELECT k, v, tag FROM mw_base;
      MERGE INTO mt AS t USING (SELECT * FROM mw_chg) AS c
        ON t.k = c.k
        WHEN MATCHED AND c.tag = 'del' THEN DELETE
        WHEN MATCHED THEN UPDATE SET v = c.v, tag = concat('u:', c.tag)
        WHEN NOT MATCHED AND c.v > 0 THEN INSERT *
        WHEN NOT MATCHED BY SOURCE AND t.k >= 18 THEN DELETE;
      SELECT COUNT(*) AS n,
             CAST(SUM(CAST(round(v) AS BIGINT)) AS BIGINT) AS sv
      FROM mt
    """, catalog=cat).collect()[0]
    assert out.n == 18
    want = {k: k * 10.0 for k in range(20)}
    want[5] = 555.0
    for k in (7, 18, 19):
        del want[k]
    want[100] = 1000.0
    assert out.sv == sum(round(v) for v in want.values())


def test_sql_merge_unqualified_and_values_form(spark):
    cat = Catalog(tempfile.mkdtemp(prefix="mwsql2_"))
    _base(spark).createOrReplaceTempView("mw_base2")
    _chg(spark).createOrReplaceTempView("mw_chg2")
    out = snapshot_sql_script(spark, """
      CREATE TABLE mt2 AS SELECT k, v, tag FROM mw_base2;
      MERGE INTO mt2 USING mw_chg2 ON mt2.k = mw_chg2.k
        WHEN MATCHED AND mw_chg2.v < 0 THEN UPDATE SET tag = 'neg'
        WHEN NOT MATCHED THEN
          INSERT (k, tag) VALUES (k, concat('i:', tag))
        WHEN NOT MATCHED BY SOURCE THEN UPDATE SET tag = 'stale';
      SELECT tag, COUNT(*) AS n FROM mt2 GROUP BY tag ORDER BY tag
    """, catalog=cat)
    got = {r.tag: r.n for r in out.collect()}
    # k7 matched v<0 -> neg; k5 matched but no clause -> keeps 'old';
    # k100/k101 insert with source-resolved unqualified cols;
    # 18 remaining target rows -> 'stale'
    assert got == {"neg": 1, "old": 1, "i:new": 1, "i:skip": 1,
                   "stale": 18}


def test_merge_differently_named_keys(spark):
    """``ON t.k = s.src_id`` (round 11): the source key column is
    named differently — native ``source_key`` joins on it, star forms
    map the target key onto it, rich clauses reference it by name."""
    t = _tmp()
    snap.snapshot_write(_base(spark, 10), t, member_cols=["k"])
    src = spark.createDataFrame(
        [(3, 333.0, "u"), (77, 770.0, "n")],
        "src_id long, v double, tag string",
    )
    snap.snapshot_merge_when(
        spark, t, src, key="k", source_key="src_id",
        matched=[{"condition": None, "action": "update", "set": None}],
        not_matched=[{"condition": None, "values": None}],
    )
    rows = {r.k: (r.v, r.tag)
            for r in snap.read_snapshot(spark, t).collect()}
    assert rows[3] == (333.0, "u")     # SET * (key untouched)
    assert rows[77] == (770.0, "n")    # INSERT *: k <- s.src_id
    assert len(rows) == 11


def test_sql_merge_differently_named_keys(spark):
    cat = Catalog(tempfile.mkdtemp(prefix="mwkey_"))
    _base(spark, 10).createOrReplaceTempView("mwk_base")
    spark.createDataFrame(
        [(3, 333.0, "u"), (77, 770.0, "n")],
        "src_id long, v double, tag string",
    ).createOrReplaceTempView("mwk_chg")
    # canonical pair: renamed source key rides the fast path
    out = snapshot_sql_script(spark, """
      CREATE TABLE kt AS SELECT k, v, tag FROM mwk_base;
      MERGE INTO kt USING mwk_chg ON kt.k = mwk_chg.src_id
        WHEN MATCHED THEN UPDATE SET *
        WHEN NOT MATCHED THEN INSERT *;
      SELECT COUNT(*) AS n,
             CAST(SUM(CAST(round(v) AS BIGINT)) AS BIGINT) AS sv
      FROM kt
    """, catalog=cat).collect()[0]
    want = {i: i * 10.0 for i in range(10)}
    want[3] = 333.0
    want[77] = 770.0
    assert (out.n, out.sv) == (11, sum(round(v) for v in want.values()))
    # rich clauses route through source_key
    out2 = snapshot_sql_script(spark, """
      CREATE TABLE kt2 AS SELECT k, v, tag FROM mwk_base;
      MERGE INTO kt2 USING mwk_chg ON kt2.k = mwk_chg.src_id
        WHEN MATCHED AND mwk_chg.v > 400 THEN DELETE
        WHEN MATCHED THEN UPDATE SET tag = mwk_chg.tag
        WHEN NOT MATCHED THEN INSERT (k, v) VALUES (src_id, v);
      SELECT COUNT(*) AS n, COUNT(tag) AS n_tag FROM kt2
    """, catalog=cat).collect()[0]
    # k3 updated (tag 'u'), src 77 inserted with NULL tag
    assert (out2.n, out2.n_tag) == (11, 10)
    # unqualified differently-named keys refuse with guidance
    with pytest.raises(NotImplementedError, match="qualified"):
        snapshot_sql(spark, """
          MERGE INTO kt USING mwk_chg ON k = src_id
            WHEN MATCHED THEN UPDATE SET *
            WHEN NOT MATCHED THEN INSERT *
        """, catalog=cat)


def test_sql_merge_canonical_still_fast_path(spark):
    cat = Catalog(tempfile.mkdtemp(prefix="mwsql3_"))
    _base(spark, 10).createOrReplaceTempView("mw_base3")
    spark.createDataFrame(
        [(3, 33.0, "n3"), (42, 420.0, "n42")],
        "k long, v double, tag string",
    ).createOrReplaceTempView("mw_chg3")
    out = snapshot_sql_script(spark, """
      CREATE TABLE mt3 AS SELECT k, v, tag FROM mw_base3;
      MERGE INTO mt3 USING mw_chg3 ON mt3.k = mw_chg3.k
        WHEN MATCHED THEN UPDATE SET *
        WHEN NOT MATCHED THEN INSERT *;
      SELECT COUNT(*) AS n FROM mt3
    """, catalog=cat).collect()[0]
    assert out.n == 11
    # the rewrite kind recorded is merge_into's, not merge_when's
    path = dict(cat.tables())["mt3"]["path"]
    m = snap._read_manifest(path, snap.latest_version(path))
    assert m.get("rewrite", {}).get("kind") == "merge_into"


def test_merge_when_record_cdf_folds_to_final_state(spark):
    """The rich merge's change feed is FOLDABLE: applying the
    delete/insert records of the merge commit to the pre-merge state
    reproduces the post-merge table exactly."""
    t = _tmp()
    snap.snapshot_write(_base(spark), t, member_cols=["k"])
    v0 = snap.latest_version(t)
    v1 = snap.snapshot_merge_when(
        spark, t, _chg(spark), key="k",
        matched=[
            {"condition": "s.tag = 'del'", "action": "delete"},
            {"condition": None, "action": "update", "set": None},
        ],
        not_matched=[{"condition": "s.v > 0", "values": None}],
        not_matched_by_source=[
            {"condition": "t.k >= 18", "action": "delete"},
        ],
        record_cdf=True,
    )
    feed = snap.read_snapshot_changes_feed(spark, t, v0, v1)
    pre = {(r.k, r.v, r.tag)
           for r in snap.read_snapshot(spark, t, version=v0).collect()}
    for r in feed.filter("_change_type = 'delete'").collect():
        pre.discard((r.k, r.v, r.tag))
    for r in feed.filter("_change_type = 'insert'").collect():
        pre.add((r.k, r.v, r.tag))
    post = {(r.k, r.v, r.tag)
            for r in snap.read_snapshot(spark, t).collect()}
    assert pre == post
    # the feed is row-minimal: k7 delete, k5 update (del+ins), k100
    # insert, k18/k19 nmbs deletes = 4 deletes + 2 inserts
    kinds = [(r.k, r._change_type) for r in feed.collect()]
    assert sorted(kinds) == [
        (5, "delete"), (5, "insert"), (7, "delete"), (18, "delete"),
        (19, "delete"), (100, "insert"),
    ]


def test_sql_merge_with_schema_evolution(spark):
    cat = Catalog(tempfile.mkdtemp(prefix="mwse_"))
    _base(spark, 10).createOrReplaceTempView("mw_base5")
    spark.createDataFrame(
        [(3, 33.0, "x", "n1"), (50, 1.0, "y", "n2")],
        "k long, v double, tag string, extra string",
    ).createOrReplaceTempView("mw_chg5")
    out = snapshot_sql_script(spark, """
      CREATE TABLE mt5 AS SELECT k, v, tag FROM mw_base5;
      MERGE WITH SCHEMA EVOLUTION INTO mt5 USING mw_chg5
        ON mt5.k = mw_chg5.k
        WHEN MATCHED THEN UPDATE SET *
        WHEN NOT MATCHED THEN INSERT *;
      SELECT COUNT(*) AS n, COUNT(extra) AS n_extra FROM mt5
    """, catalog=cat).collect()[0]
    assert (out.n, out.n_extra) == (11, 2)
    # round 12: conditioned WHEN forms COMPOSE with evolution
    snapshot_sql(spark, """
      MERGE WITH SCHEMA EVOLUTION INTO mt5 USING mw_chg5
        ON mt5.k = mw_chg5.k
        WHEN MATCHED AND mw_chg5.extra = 'n1' THEN DELETE
    """, catalog=cat)
    out2 = snapshot_sql(
        spark, "SELECT COUNT(*) AS n, COUNT(extra) AS n_extra "
        "FROM mt5", catalog=cat,
    ).collect()[0]
    assert (out2.n, out2.n_extra) == (10, 1)  # k=3 deleted


def test_sql_merge_errors(spark):
    cat = Catalog(tempfile.mkdtemp(prefix="mwsql4_"))
    _base(spark, 5).createOrReplaceTempView("mw_base4")
    snapshot_sql(
        spark, "CREATE TABLE mt4 AS SELECT k, v, tag FROM mw_base4",
        catalog=cat,
    )
    with pytest.raises(ValueError, match="cannot DELETE"):
        snapshot_sql(spark, """
          MERGE INTO mt4 USING mw_base4 ON mt4.k = mw_base4.k
          WHEN NOT MATCHED THEN DELETE
        """, catalog=cat)
    with pytest.raises(ValueError, match="cannot INSERT"):
        snapshot_sql(spark, """
          MERGE INTO mt4 USING mw_base4 ON mt4.k = mw_base4.k
          WHEN MATCHED THEN INSERT *
        """, catalog=cat)
