"""Z-ORDER on wire-format maintenance (round 12): OPTIMIZE ZORDER
BY reuses the native Morton-interleave layout engine for Delta and
Iceberg rewrites — multi-dimensional zone-map pruning where a plain
sort only helps one dimension.
"""

import json
import os
import tempfile

import pytest

from harmony_energy_data_pipeline_spark.catalog import Catalog
from harmony_energy_data_pipeline_spark.sources import deltalake as dl
from harmony_energy_data_pipeline_spark.sources import iceberg as ice
from harmony_energy_data_pipeline_spark.sql import snapshot_sql


def _tmp(prefix="zo_"):
    return os.path.join(tempfile.mkdtemp(prefix=prefix), "t")


def _df(spark):
    # two decorrelated uniform dims: a plain sort on x leaves y
    # unclustered, the interleave clusters both
    return spark.range(0, 40000).selectExpr(
        "id AS k",
        "CAST(pmod(id * 7919, 1000) AS BIGINT) AS x",
        "CAST(pmod(id * 104729, 1000) AS BIGINT) AS y",
    ).repartition(8)


def test_delta_zorder_prunes_both_dims(spark):
    t = _tmp("zd_")
    dl.write_delta(_df(spark), t)
    v = dl.delta_optimize(spark, t, zorder_by=["x", "y"],
                          target_file_mb=0.05)
    assert v is not None
    adds, _m, _p, _v = dl._replay(t, None)
    assert len(adds) >= 4
    stats = [json.loads(a["stats"]) for a in adds if a.get("stats")]
    hx = sum(1 for s in stats
             if s["minValues"]["x"] <= 99 <= 10 ** 9
             and s["maxValues"]["x"] >= 0
             and s["minValues"]["x"] <= 99)
    hy = sum(1 for s in stats
             if s["minValues"]["y"] <= 99 and s["maxValues"]["y"] >= 0)
    # a 10% range on EITHER dim touches a strict subset of files
    assert hx < len(stats) and hy < len(stats)
    assert dl.read_delta(spark, t).count() == 40000
    # the commit is still dataChange=false maintenance
    with open(os.path.join(t, "_delta_log",
                           f"{v:020d}.json")) as fh:
        acts = [json.loads(ln) for ln in fh if ln.strip()]
    for a in acts:
        for kind in ("add", "remove"):
            if kind in a:
                assert a[kind]["dataChange"] is False


def test_iceberg_zorder_prunes_both_dims(spark):
    t = _tmp("zi_")
    ice.write_iceberg(_df(spark), t)
    ice.iceberg_compact(spark, t, zorder_by=["x", "y"],
                        target_file_mb=0.05)
    meta = ice.table_metadata(t)
    sch = ice._current_schema(meta)
    data, _d = ice.live_files(t, meta)
    assert len(data) >= 4
    kx = ice._prune_data_files(meta, sch, data, [("x", 0, 99)])
    ky = ice._prune_data_files(meta, sch, data, [("y", 0, 99)])
    assert len(kx) < len(data) and len(ky) < len(data)
    assert ice.read_iceberg(spark, t).count() == 40000
    # stamped as a replace: the changelog skips it
    assert ice.iceberg_history(t)[-1]["operation"] == "replace"


def test_sql_zorder_and_partitioned_refusal(spark, tmp_path):
    dt = str(tmp_path / "d")
    dl.write_delta(_df(spark), dt)
    cat = Catalog(str(tmp_path / "cat"))
    cat.register("d", dt, format="delta")
    snapshot_sql(spark, "OPTIMIZE d ZORDER BY (x, y)", catalog=cat)
    assert snapshot_sql(
        spark, "SELECT COUNT(*) AS n FROM d", catalog=cat
    ).collect()[0].n == 40000
    # partitioned tables refuse honestly
    pt = str(tmp_path / "p")
    dl.write_delta(
        spark.range(0, 100).selectExpr(
            "id AS k", "CAST(id % 2 AS STRING) AS p",
            "CAST(id AS BIGINT) AS x"
        ),
        pt, partition_by=["p"],
    )
    with pytest.raises(dl.DeltaProtocolError, match="partitioned"):
        dl.delta_optimize(spark, pt, zorder_by=["x"])
