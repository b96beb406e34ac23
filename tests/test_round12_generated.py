"""Delta wire-format GENERATED columns (round 12): an existing
column declared GENERATED ALWAYS AS (expr) via
``delta.generationExpression`` — existing rows verified on declare,
subsequent appends COMPUTE the column when the batch omits it and
VALIDATE it row-for-row when present; DML post-images validate too.
"""

import json
import os
import tempfile

import pytest
from pyspark.sql import Row

from harmony_energy_data_pipeline_spark.catalog import Catalog
from harmony_energy_data_pipeline_spark.sources import deltalake as dl
from harmony_energy_data_pipeline_spark.sql import snapshot_sql


def _tmp(prefix="gen_"):
    return os.path.join(tempfile.mkdtemp(prefix=prefix), "t")


def _base(spark):
    return spark.range(0, 6).selectExpr(
        "id AS k", "CAST(id AS DOUBLE) AS v",
        "CAST(id * 2 AS DOUBLE) AS dbl"
    )


def test_declare_verifies_then_computes_and_validates(spark):
    t = _tmp()
    dl.write_delta(_base(spark), t)
    # a declaration current data violates refuses
    with pytest.raises(dl.DeltaProtocolError, match="violate"):
        dl.delta_set_generated_column(spark, t, "dbl", "v * 3")
    dl.delta_set_generated_column(spark, t, "dbl", "v * 2")
    _a, meta, proto, _v = dl._replay(t, None)
    f = next(f_ for f_ in json.loads(meta["schemaString"])["fields"]
             if f_["name"] == "dbl")
    assert f["metadata"]["delta.generationExpression"] == "v * 2"
    assert proto["minWriterVersion"] >= 4
    # a batch OMITTING the column computes it
    dl.write_delta(
        spark.createDataFrame([Row(k=10, v=5.0)]), t, mode="append"
    )
    rows = {r.k: r.dbl for r in dl.read_delta(spark, t).collect()}
    assert rows[10] == 10.0
    # a batch CARRYING a wrong value refuses
    with pytest.raises(dl.DeltaProtocolError, match="generated"):
        dl.write_delta(
            spark.createDataFrame([Row(k=11, v=1.0, dbl=99.0)]),
            t, mode="append",
        )
    # a correct explicit value passes
    dl.write_delta(
        spark.createDataFrame([Row(k=11, v=1.0, dbl=2.0)]),
        t, mode="append",
    )
    assert dl.read_delta(spark, t).count() == 8


def test_dml_post_images_validate(spark):
    t = _tmp("gend_")
    dl.write_delta(_base(spark), t)
    dl.delta_set_generated_column(spark, t, "dbl", "v * 2")
    # updating the SOURCE without the generated column breaks the
    # invariant in the post-image: refused, nothing committed
    with pytest.raises(dl.DeltaProtocolError, match="generated"):
        dl.delta_update_where(spark, t, "k = 2", {"v": "100.0"})
    assert {r.v for r in dl.read_delta(spark, t).collect()
            if r.k == 2} == {2.0}
    # updating both consistently commits
    dl.delta_update_where(spark, t, "k = 2",
                          {"v": "100.0", "dbl": "200.0"})
    rows = {r.k: (r.v, r.dbl)
            for r in dl.read_delta(spark, t).collect()}
    assert rows[2] == (100.0, 200.0)


def test_sql_set_generated(spark, tmp_path):
    t = str(tmp_path / "d")
    dl.write_delta(_base(spark), t)
    cat = Catalog(str(tmp_path / "cat.json"))
    cat.register("d", t, format="delta")
    snapshot_sql(
        spark,
        "ALTER TABLE d ALTER COLUMN dbl SET GENERATED ALWAYS AS "
        "(v * 2)",
        catalog=cat,
    )
    with pytest.raises(dl.DeltaProtocolError, match="generated"):
        snapshot_sql(spark, "UPDATE d SET v = -1.0 WHERE k = 0",
                     catalog=cat)
    # rename of the SOURCE column refuses while generation stands
    with pytest.raises(dl.DeltaProtocolError, match="generated"):
        dl.delta_rename_column(t, "v", "val")
