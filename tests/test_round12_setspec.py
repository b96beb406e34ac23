"""Metadata-only SET PARTITION SPEC on the Iceberg wire format
(round 12): the default spec evolves without touching one data file;
existing files keep pruning under the spec they were written with;
bare appends honor the new default.
"""

import os
import tempfile

import pytest

from harmony_energy_data_pipeline_spark.catalog import Catalog
from harmony_energy_data_pipeline_spark.sources import iceberg as ice
from harmony_energy_data_pipeline_spark.sql import snapshot_sql


def _tmp(prefix="ssp_"):
    return os.path.join(tempfile.mkdtemp(prefix=prefix), "t")


def test_set_spec_metadata_only_then_append_honors(spark):
    t = _tmp()
    ice.write_iceberg(
        spark.range(0, 30).selectExpr(
            "id AS k", "CAST(id % 3 AS STRING) AS p",
            "CAST(id AS DOUBLE) AS v",
        ),
        t,
    )
    files0 = {d["file_path"] for d in ice.live_files(t)[0]}
    sid = ice.iceberg_set_partition_spec(t, ["p"])
    meta = ice.table_metadata(t)
    assert meta["default-spec-id"] == sid
    # not one data file touched
    assert {d["file_path"] for d in ice.live_files(t)[0]} == files0
    # a bare append (no partition_by) lands under the new layout
    ice.write_iceberg(
        spark.range(30, 60).selectExpr(
            "id AS k", "CAST(id % 3 AS STRING) AS p",
            "CAST(id AS DOUBLE) AS v",
        ),
        t, mode="append",
    )
    meta = ice.table_metadata(t)
    schema = ice._current_schema(meta)
    files, _d = ice.live_files(t, meta)
    new_files = [f for f in files if f["file_path"] not in files0]
    assert all(
        (f.get("partition") or {}).get("p") is not None
        for f in new_files
    )
    # pruning: old files (spec 0, no tuple) stay conservative, new
    # ones prune by tuple
    kept = ice._prune_data_files(meta, schema, files, [("p", "1", "1")])
    assert len(files0) <= len(kept) < len(files)
    rows = sorted(
        r.k for r in ice.read_iceberg(
            spark, t, where=[("p", "1", "1")]
        ).collect()
    )
    assert rows == [k for k in range(60) if k % 3 == 1]


def test_set_spec_transform_and_unpartition(spark):
    t = _tmp("sst_")
    ice.write_iceberg(
        spark.range(0, 20).selectExpr(
            "id AS k", "CAST(id AS DOUBLE) AS v"
        ),
        t,
    )
    sid = ice.iceberg_set_partition_spec(t, ["bucket[4](k)"])
    meta = ice.table_metadata(t)
    sp = next(s for s in meta["partition-specs"]
              if s["spec-id"] == sid)
    assert sp["fields"][0]["transform"] == "bucket[4]"
    ice.write_iceberg(
        spark.range(20, 30).selectExpr(
            "id AS k", "CAST(id AS DOUBLE) AS v"
        ),
        t, mode="append",
    )
    assert ice.read_iceberg(spark, t).count() == 30
    # back to unpartitioned reuses spec 0, never reallocates
    sid2 = ice.iceberg_set_partition_spec(t, [])
    assert sid2 == 0
    with pytest.raises(ValueError, match="not in the schema"):
        ice.iceberg_set_partition_spec(t, ["nope"])


def test_sql_set_spec_iceberg(spark, tmp_path):
    it = str(tmp_path / "i")
    ice.write_iceberg(
        spark.range(0, 12).selectExpr(
            "id AS k", "CAST(id % 2 AS STRING) AS p"
        ),
        it,
    )
    cat = Catalog(str(tmp_path / "cat.json"))
    cat.register("i", it, format="iceberg")
    snapshot_sql(
        spark, "ALTER TABLE i SET PARTITION SPEC (p, bucket[4](k))",
        catalog=cat,
    )
    meta = ice.table_metadata(it)
    sp = next(s for s in meta["partition-specs"]
              if s["spec-id"] == meta["default-spec-id"])
    assert [(f["name"], f["transform"]) for f in sp["fields"]] == \
        [("p", "identity"), ("k_bucket", "bucket[4]")]
    assert snapshot_sql(
        spark, "SELECT COUNT(*) AS n FROM i", catalog=cat
    ).collect()[0].n == 12
