"""Delta SHALLOW CLONE (round 12): a zero-copy version-0 commit
referencing the source's live files by absolute path (spec-legal),
DV descriptors re-addressed ``u`` → ``p``; the clone then diverges
independently and neither side's VACUUM touches the other.
"""

import os
import tempfile

import pytest

from harmony_energy_data_pipeline_spark.catalog import Catalog
from harmony_energy_data_pipeline_spark.sources import deltalake as dl
from harmony_energy_data_pipeline_spark.sql import snapshot_sql


def _tmp(prefix="cln_"):
    return os.path.join(tempfile.mkdtemp(prefix=prefix), "t")


def test_clone_zero_copy_and_divergence(spark):
    src = _tmp("src_")
    dl.write_delta(
        spark.range(0, 10).selectExpr(
            "id AS k", "CAST(id AS DOUBLE) AS v"
        ),
        src,
    )
    dl.delta_delete_where(spark, src, "k < 2")  # DV on the source
    dst = _tmp("dst_")
    v = dl.delta_clone(spark, src, dst)
    assert v == 0
    # zero data files under the clone
    datafiles = [
        n for _r, _d, ns in os.walk(dst) for n in ns
        if n.endswith(".parquet")
    ]
    assert datafiles == []
    # reads apply the source's DV through the p-descriptor
    assert sorted(r.k for r in dl.read_delta(spark, dst).collect()) \
        == list(range(2, 10))
    # divergence: append + DML on the clone never touch the source
    dl.write_delta(
        spark.range(100, 103).selectExpr(
            "id AS k", "CAST(id AS DOUBLE) AS v"
        ),
        dst, mode="append",
    )
    dl.delta_delete_where(spark, dst, "k = 5")
    assert sorted(r.k for r in dl.read_delta(spark, dst).collect()) \
        == [2, 3, 4, 6, 7, 8, 9, 100, 101, 102]
    assert sorted(r.k for r in dl.read_delta(spark, src).collect()) \
        == list(range(2, 10))
    # source-side writes don't affect the clone either
    dl.write_delta(
        spark.range(500, 505).selectExpr(
            "id AS k", "CAST(id AS DOUBLE) AS v"
        ),
        src, mode="append",
    )
    assert 500 not in {r.k for r in dl.read_delta(spark, dst).collect()}
    # cloning onto an existing table refuses
    with pytest.raises(FileExistsError):
        dl.delta_clone(spark, src, dst)


def test_clone_vacuum_isolation(spark):
    src = _tmp("vsrc_")
    dl.write_delta(
        spark.range(0, 6).selectExpr(
            "id AS k", "CAST(id AS DOUBLE) AS v"
        ),
        src,
    )
    dst = _tmp("vdst_")
    dl.delta_clone(spark, src, dst)
    # vacuum the CLONE: its referenced files live under the source
    # dir, so nothing is reclaimable
    removed = dl.delta_vacuum(dst, retention_s=0)
    assert not removed
    assert dl.read_delta(spark, dst).count() == 6


def test_sql_shallow_clone(spark, tmp_path):
    src = str(tmp_path / "s")
    dl.write_delta(
        spark.range(0, 7).selectExpr(
            "id AS k", "CAST(id AS DOUBLE) AS v"
        ),
        src,
    )
    cat = Catalog(str(tmp_path / "cat"))
    cat.register("s", src, format="delta")
    snapshot_sql(spark, "CREATE TABLE c SHALLOW CLONE s",
                 catalog=cat)
    assert snapshot_sql(
        spark, "SELECT COUNT(*) AS n FROM c", catalog=cat
    ).collect()[0].n == 7
    snapshot_sql(spark, "UPDATE c SET v = -1.0 WHERE k = 0",
                 catalog=cat)
    assert snapshot_sql(
        spark, "SELECT v FROM s WHERE k = 0", catalog=cat
    ).collect()[0].v == 0.0
