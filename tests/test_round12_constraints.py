"""Delta wire-format CHECK constraints (round 12): declared in
``delta.constraints.*`` (the spec's property — foreign writers see
the declaration), verified against existing rows on ADD, enforced
by every write path of this engine (append, overwrite, UPDATE/MERGE
produced rows). NULL satisfies, FALSE violates — Delta semantics.
"""

import os
import tempfile

import pytest
from pyspark.sql import Row

from harmony_energy_data_pipeline_spark.catalog import Catalog
from harmony_energy_data_pipeline_spark.sources import deltalake as dl
from harmony_energy_data_pipeline_spark.sql import snapshot_sql


def _tmp(prefix="chk_"):
    return os.path.join(tempfile.mkdtemp(prefix=prefix), "t")


def test_add_verifies_existing_and_enforces_writes(spark):
    t = _tmp()
    dl.write_delta(
        spark.range(0, 5).selectExpr(
            "id AS k", "CAST(id AS DOUBLE) AS v"
        ),
        t,
    )
    # a constraint current data violates must not land
    with pytest.raises(dl.DeltaProtocolError, match="existing rows"):
        dl.delta_add_check_constraint(spark, t, "pos", "v > 2")
    dl.delta_add_check_constraint(spark, t, "pos", "v >= 0")
    _a, meta, proto, _v = dl._replay(t, None)
    assert meta["configuration"]["delta.constraints.pos"] == "v >= 0"
    assert proto["minWriterVersion"] >= 3
    # conforming append passes, violating append refuses
    dl.write_delta(
        spark.range(5, 7).selectExpr(
            "id AS k", "CAST(id AS DOUBLE) AS v"
        ),
        t, mode="append",
    )
    with pytest.raises(dl.DeltaProtocolError, match="pos"):
        dl.write_delta(
            spark.createDataFrame([Row(k=99, v=-1.0)]),
            t, mode="append",
        )
    assert dl.read_delta(spark, t).count() == 7
    # NULL satisfies (Delta semantics)
    dl.write_delta(
        spark.createDataFrame([Row(k=100, v=None)],
                              "k long, v double"),
        t, mode="append",
    )
    assert dl.read_delta(spark, t).count() == 8


def test_dml_produced_rows_enforced(spark):
    t = _tmp("chkd_")
    dl.write_delta(
        spark.range(0, 6).selectExpr(
            "id AS k", "CAST(id AS DOUBLE) AS v"
        ),
        t,
    )
    dl.delta_add_check_constraint(spark, t, "pos", "v >= 0")
    # an UPDATE whose post-images violate refuses
    with pytest.raises(dl.DeltaProtocolError, match="pos"):
        dl.delta_update_where(spark, t, "k = 2", {"v": "-5.0"})
    # nothing committed: the table is unchanged
    rows = {r.k: r.v for r in dl.read_delta(spark, t).collect()}
    assert rows[2] == 2.0
    # a conforming update commits
    dl.delta_update_where(spark, t, "k = 2", {"v": "22.0"})
    assert {r.v for r in dl.read_delta(spark, t).collect()
            if r.k == 2} == {22.0}


def test_drop_constraint_and_rename_guard(spark):
    t = _tmp("chkg_")
    dl.write_delta(
        spark.range(0, 3).selectExpr(
            "id AS k", "CAST(id AS DOUBLE) AS v"
        ),
        t,
    )
    dl.delta_add_check_constraint(spark, t, "pos", "v >= 0")
    # renaming the referenced column refuses while the constraint
    # stands (the stored expression would dangle)
    with pytest.raises(dl.DeltaProtocolError, match="constraint"):
        dl.delta_rename_column(t, "v", "val")
    dl.delta_drop_constraint(t, "pos")
    dl.delta_rename_column(t, "v", "val")
    assert dl.read_delta(spark, t).columns == ["k", "val"]
    with pytest.raises(ValueError, match="does not exist"):
        dl.delta_drop_constraint(t, "pos")


def test_sql_constraint_roundtrip(spark, tmp_path):
    t = str(tmp_path / "d")
    dl.write_delta(
        spark.range(0, 4).selectExpr(
            "id AS k", "CAST(id AS DOUBLE) AS v"
        ),
        t,
    )
    cat = Catalog(str(tmp_path / "cat.json"))
    cat.register("d", t, format="delta")
    snapshot_sql(
        spark, "ALTER TABLE d ADD CONSTRAINT pos CHECK (v >= 0)",
        catalog=cat,
    )
    with pytest.raises(dl.DeltaProtocolError, match="pos"):
        snapshot_sql(spark, "UPDATE d SET v = -1.0 WHERE k = 1",
                     catalog=cat)
    snapshot_sql(spark, "ALTER TABLE d DROP CONSTRAINT pos",
                 catalog=cat)
    snapshot_sql(spark, "UPDATE d SET v = -1.0 WHERE k = 1",
                 catalog=cat)
    assert {r.v for r in snapshot_sql(
        spark, "SELECT v FROM d WHERE k = 1", catalog=cat
    ).collect()} == {-1.0}
