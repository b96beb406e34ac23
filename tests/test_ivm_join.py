"""IVM over joins (round 8): a fact ⋈ dim aggregate view maintained
by delta-join — appended fact rows join the dim and fold; row-level
fact changes fold signed; dim changes recompute."""
from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from harmony_energy_data_pipeline_spark.pipeline import ivm
from harmony_energy_data_pipeline_spark.sinks import snapshots as snap


def _fact(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id").alias("fk"),
        (F.col("id") % 7).alias("dim_id"),
        (F.col("id") * 3).alias("amount"),
    )


def _dim(spark, n=7, tag="r"):
    return spark.range(0, n).select(
        F.col("id").alias("dim_id"),
        F.concat(F.lit(tag), (F.col("id") % 3)).alias("region"),
    )


def _expected(spark, fact_path, dim_path):
    f = snap.read_snapshot(spark, fact_path)
    d = snap.read_snapshot(spark, dim_path)
    return {
        (r.region,): (r.n, r.sum_amount)
        for r in f.join(d, "dim_id").groupBy("region").agg(
            F.count("*").alias("n"),
            F.sum("amount").alias("sum_amount"),
        ).collect()
    }


def _got(spark, view_path):
    return {
        (r.region,): (r.n, r.sum_amount)
        for r in ivm.read_view(spark, view_path).collect()
    }


def test_join_view_folds_fact_appends_without_rescanning(spark, tmp_path):
    fp, dp, vp = (str(tmp_path / x) for x in ("f", "d", "v"))
    snap.snapshot_write(_fact(spark, 0, 100), fp)
    snap.snapshot_write(_dim(spark), dp)
    v1 = ivm.refresh_join_agg_view(
        spark, fp, dp, vp, on=["dim_id"], keys=["region"],
        sum_cols=["amount"],
    )
    assert _got(spark, vp) == _expected(spark, fp, dp)
    # append folds incrementally (versions recorded advance)
    snap.snapshot_write(_fact(spark, 100, 160), fp, mode="append")
    v2 = ivm.refresh_join_agg_view(
        spark, fp, dp, vp, on=["dim_id"], keys=["region"],
        sum_cols=["amount"],
    )
    assert v2[0] == v1[0] + 1 and v2[1] == v1[1]
    assert _got(spark, vp) == _expected(spark, fp, dp)
    # idempotent: nothing new -> same versions, view untouched
    vv = snap.latest_version(vp)
    assert ivm.refresh_join_agg_view(
        spark, fp, dp, vp, on=["dim_id"], keys=["region"],
        sum_cols=["amount"],
    ) == v2
    assert snap.latest_version(vp) == vv


def test_join_view_signed_fold_through_dv_delete(spark, tmp_path):
    fp, dp, vp = (str(tmp_path / x) for x in ("f", "d", "v"))
    snap.snapshot_write(_fact(spark, 0, 100).coalesce(2), fp)
    snap.snapshot_write(_dim(spark), dp)
    ivm.refresh_join_agg_view(
        spark, fp, dp, vp, on=["dim_id"], keys=["region"],
        sum_cols=["amount"], avg_cols=["amount"],
    )
    snap.snapshot_delete_where_dv(spark, fp, [("fk", 0, 20)])
    ivm.refresh_join_agg_view(
        spark, fp, dp, vp, on=["dim_id"], keys=["region"],
        sum_cols=["amount"], avg_cols=["amount"],
    )
    assert _got(spark, vp) == _expected(spark, fp, dp)
    got = ivm.read_view(spark, vp).collect()
    assert all(abs(r.avg_amount - r.sum_amount / r.n) < 1e-9 for r in got)


def test_join_view_minmax_appends_fold_deletes_recompute(spark, tmp_path):
    fp, dp, vp = (str(tmp_path / x) for x in ("f", "d", "v"))
    snap.snapshot_write(_fact(spark, 0, 60).coalesce(1), fp)
    snap.snapshot_write(_dim(spark), dp)
    ivm.refresh_join_agg_view(
        spark, fp, dp, vp, on=["dim_id"], keys=["region"],
        sum_cols=["amount"], max_cols=["amount"],
    )
    snap.snapshot_write(_fact(spark, 60, 90).coalesce(1), fp,
                        mode="append")
    ivm.refresh_join_agg_view(
        spark, fp, dp, vp, on=["dim_id"], keys=["region"],
        sum_cols=["amount"], max_cols=["amount"],
    )
    exp = {
        (r.region,): (r.n, r.mx)
        for r in snap.read_snapshot(spark, fp)
        .join(snap.read_snapshot(spark, dp), "dim_id")
        .groupBy("region")
        .agg(F.count("*").alias("n"), F.max("amount").alias("mx"))
        .collect()
    }
    got = {
        (r.region,): (r.n, r.max_amount)
        for r in ivm.read_view(spark, vp).collect()
    }
    assert got == exp
    # a DV delete evicting the max forces the recompute path — and
    # the result is still exact
    snap.snapshot_delete_where_dv(spark, fp, [("amount", 260, 270)])
    ivm.refresh_join_agg_view(
        spark, fp, dp, vp, on=["dim_id"], keys=["region"],
        sum_cols=["amount"], max_cols=["amount"],
    )
    exp2 = {
        (r.region,): (r.n, r.mx)
        for r in snap.read_snapshot(spark, fp)
        .join(snap.read_snapshot(spark, dp), "dim_id")
        .groupBy("region")
        .agg(F.count("*").alias("n"), F.max("amount").alias("mx"))
        .collect()
    }
    got2 = {
        (r.region,): (r.n, r.max_amount)
        for r in ivm.read_view(spark, vp).collect()
    }
    assert got2 == exp2


def test_join_view_dim_change_recomputes(spark, tmp_path):
    fp, dp, vp = (str(tmp_path / x) for x in ("f", "d", "v"))
    snap.snapshot_write(_fact(spark, 0, 100), fp)
    snap.snapshot_write(_dim(spark, tag="r"), dp)
    ivm.refresh_join_agg_view(
        spark, fp, dp, vp, on=["dim_id"], keys=["region"],
        sum_cols=["amount"],
    )
    # dim overwrite remaps every region label
    snap.snapshot_write(_dim(spark, tag="z"), dp, mode="overwrite")
    snap.snapshot_write(_fact(spark, 100, 120), fp, mode="append")
    ivm.refresh_join_agg_view(
        spark, fp, dp, vp, on=["dim_id"], keys=["region"],
        sum_cols=["amount"],
    )
    got = _got(spark, vp)
    assert got == _expected(spark, fp, dp)
    assert all(k[0].startswith("z") for k in got)


def test_join_view_folds_rowlevel_dim_update(spark, tmp_path):
    # a dim MOR update (delete ⊕ insert in the feed) regroups every
    # matching fact row: the F_old ⋈ ΔD signed fold moves the mass
    # without recomputing the whole view
    fp, dp, vp = (str(tmp_path / x) for x in ("f", "d", "v"))
    snap.snapshot_write(_fact(spark, 0, 100), fp)
    snap.snapshot_write(_dim(spark).coalesce(1), dp, stats_cols=["dim_id"])
    ivm.refresh_join_agg_view(
        spark, fp, dp, vp, on=["dim_id"], keys=["region"],
        sum_cols=["amount"],
    )
    snap.snapshot_update_where_dv(
        spark, dp, [("dim_id", 2, 2)], {"region": F.lit("moved")}
    )
    ivm.refresh_join_agg_view(
        spark, fp, dp, vp, on=["dim_id"], keys=["region"],
        sum_cols=["amount"],
    )
    got = _got(spark, vp)
    assert got == _expected(spark, fp, dp)
    assert ("moved",) in got


def test_join_view_folds_fact_and_dim_changes_together(spark, tmp_path):
    fp, dp, vp = (str(tmp_path / x) for x in ("f", "d", "v"))
    snap.snapshot_write(_fact(spark, 0, 80).coalesce(2), fp)
    snap.snapshot_write(_dim(spark).coalesce(1), dp, stats_cols=["dim_id"])
    ivm.refresh_join_agg_view(
        spark, fp, dp, vp, on=["dim_id"], keys=["region"],
        sum_cols=["amount"], avg_cols=["amount"],
    )
    # one refresh over: fact append + fact DV delete + dim MOR update
    snap.snapshot_write(_fact(spark, 80, 120).coalesce(1), fp,
                        mode="append")
    snap.snapshot_delete_where_dv(spark, fp, [("fk", 10, 25)])
    snap.snapshot_update_where_dv(
        spark, dp, [("dim_id", 5, 6)], {"region": F.lit("west")}
    )
    ivm.refresh_join_agg_view(
        spark, fp, dp, vp, on=["dim_id"], keys=["region"],
        sum_cols=["amount"], avg_cols=["amount"],
    )
    assert _got(spark, vp) == _expected(spark, fp, dp)


def test_join_view_dim_delete_drops_groups(spark, tmp_path):
    fp, dp, vp = (str(tmp_path / x) for x in ("f", "d", "v"))
    snap.snapshot_write(_fact(spark, 0, 70), fp)
    # one dim row per region so a dim delete can empty a group
    dim = spark.range(0, 7).select(
        F.col("id").alias("dim_id"),
        F.concat(F.lit("r"), F.col("id")).alias("region"),
    )
    snap.snapshot_write(dim.coalesce(1), dp, stats_cols=["dim_id"])
    ivm.refresh_join_agg_view(
        spark, fp, dp, vp, on=["dim_id"], keys=["region"],
        sum_cols=["amount"],
    )
    snap.snapshot_delete_where_dv(spark, dp, [("dim_id", 3, 3)])
    ivm.refresh_join_agg_view(
        spark, fp, dp, vp, on=["dim_id"], keys=["region"],
        sum_cols=["amount"],
    )
    got = _got(spark, vp)
    assert got == _expected(spark, fp, dp)
    assert ("r3",) not in got  # cancelled group not emitted at n=0


def test_join_view_dict_on_maps_fk_to_pk(spark, tmp_path):
    fp, dp, vp = (str(tmp_path / x) for x in ("f", "d", "v"))
    snap.snapshot_write(_fact(spark, 0, 50), fp)
    dim = spark.range(0, 7).select(
        F.col("id").alias("pk"),
        F.concat(F.lit("d"), F.col("id")).alias("label"),
    )
    snap.snapshot_write(dim, dp)
    ivm.refresh_join_agg_view(
        spark, fp, dp, vp, on={"dim_id": "pk"}, keys=["label"],
        sum_cols=["amount"],
    )
    exp = {
        (r.label,): (r.n, r.sum_amount)
        for r in snap.read_snapshot(spark, fp)
        .join(dim.withColumnRenamed("pk", "dim_id"), "dim_id")
        .groupBy("label").agg(
            F.count("*").alias("n"), F.sum("amount").alias("sum_amount")
        ).collect()
    }
    got = {
        (r.label,): (r.n, r.sum_amount)
        for r in ivm.read_view(spark, vp).collect()
    }
    assert got == exp


# ---------------------------------------------------------------- star views


def _dim2(spark, tag="s"):
    return spark.range(0, 3).select(
        F.col("id").alias("chan_id"),
        F.concat(F.lit(tag), F.col("id")).alias("channel"),
    )


def _fact2(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id").alias("fk"),
        (F.col("id") % 7).alias("dim_id"),
        (F.col("id") % 3).alias("chan_id"),
        (F.col("id") * 3).alias("amount"),
    )


def _star_expected(spark, fp, d1, d2):
    f = snap.read_snapshot(spark, fp)
    a = snap.read_snapshot(spark, d1)
    b = snap.read_snapshot(spark, d2)
    return {
        (r.region, r.channel): (r.n, r.sum_amount)
        for r in f.join(a, "dim_id").join(b, "chan_id")
        .groupBy("region", "channel").agg(
            F.count("*").alias("n"), F.sum("amount").alias("sum_amount")
        ).collect()
    }


def _star_got(spark, vp):
    return {
        (r.region, r.channel): (r.n, r.sum_amount)
        for r in ivm.read_view(spark, vp).collect()
    }


def test_star_view_folds_fact_and_single_dim_changes(spark, tmp_path):
    fp, d1, d2, vp = (str(tmp_path / x) for x in ("f", "d1", "d2", "v"))
    snap.snapshot_write(_fact2(spark, 0, 90).coalesce(2), fp)
    snap.snapshot_write(_dim(spark).coalesce(1), d1)
    snap.snapshot_write(_dim2(spark).coalesce(1), d2)
    dims = [(d1, ["dim_id"]), (d2, ["chan_id"])]
    kw = dict(keys=["region", "channel"], sum_cols=["amount"],
              avg_cols=["amount"])
    pos = ivm.refresh_star_agg_view(spark, fp, dims, vp, **kw)
    assert _star_got(spark, vp) == _star_expected(spark, fp, d1, d2)
    # fact append + ONE dim row-level change fold in one refresh
    snap.snapshot_write(_fact2(spark, 90, 130).coalesce(1), fp,
                        mode="append")
    snap.snapshot_update_where_dv(
        spark, d2, [("chan_id", 1, 1)], {"channel": F.lit("webcast")}
    )
    pos2 = ivm.refresh_star_agg_view(spark, fp, dims, vp, **kw)
    assert pos2[fp] == pos[fp] + 1 and pos2[d2] == pos[d2] + 1
    got = _star_got(spark, vp)
    assert got == _star_expected(spark, fp, d1, d2)
    assert any(k[1] == "webcast" for k in got)
    # idempotent no-op
    vv = snap.latest_version(vp)
    assert ivm.refresh_star_agg_view(spark, fp, dims, vp, **kw) == pos2
    assert snap.latest_version(vp) == vv


def test_star_view_two_dim_changes_recompute(spark, tmp_path):
    fp, d1, d2, vp = (str(tmp_path / x) for x in ("f", "d1", "d2", "v"))
    snap.snapshot_write(_fact2(spark, 0, 60), fp)
    snap.snapshot_write(_dim(spark).coalesce(1), d1)
    snap.snapshot_write(_dim2(spark).coalesce(1), d2)
    dims = [(d1, ["dim_id"]), (d2, ["chan_id"])]
    kw = dict(keys=["region", "channel"], sum_cols=["amount"])
    ivm.refresh_star_agg_view(spark, fp, dims, vp, **kw)
    snap.snapshot_update_where_dv(
        spark, d1, [("dim_id", 0, 1)], {"region": F.lit("x")}
    )
    snap.snapshot_update_where_dv(
        spark, d2, [("chan_id", 0, 0)], {"channel": F.lit("y")}
    )
    ivm.refresh_star_agg_view(spark, fp, dims, vp, **kw)
    assert _star_got(spark, vp) == _star_expected(spark, fp, d1, d2)


def test_star_view_dim_list_change_recomputes(spark, tmp_path):
    fp, d1, d2, vp = (str(tmp_path / x) for x in ("f", "d1", "d2", "v"))
    snap.snapshot_write(_fact2(spark, 0, 50), fp)
    snap.snapshot_write(_dim(spark).coalesce(1), d1)
    snap.snapshot_write(_dim2(spark).coalesce(1), d2)
    ivm.refresh_star_agg_view(
        spark, fp, [(d1, ["dim_id"])], vp,
        keys=["region"], sum_cols=["amount"],
    )
    # widen the join: the stored view covered a different star
    snap.snapshot_write(_dim2(spark, tag="t").coalesce(1), d2,
                        mode="append")
    ivm.refresh_star_agg_view(
        spark, fp, [(d1, ["dim_id"]), (d2, ["chan_id"])], vp,
        keys=["region", "channel"], sum_cols=["amount"],
    )
    assert _star_got(spark, vp) == _star_expected(spark, fp, d1, d2)
