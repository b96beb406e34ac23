"""Round-11 Iceberg metadata continuity + spec-evolution reads.

ADVICE r10 #2: ``write_iceberg`` must not renumber field ids or drop
schema/spec history on overwrite — same-named columns keep their ids,
new columns allocate past last-column-id, prior schemas stay listed
(old snapshots resolve THEIR schema), prior partition-specs carry
forward.

VERDICT r10 #3: a table whose partition spec EVOLVED reads and prunes
correctly — each manifest's spec-id resolves its files' partition
tuples against the right spec.
"""

import os
import tempfile

import pytest
from pyspark.sql import functions as F

from harmony_energy_data_pipeline_spark.sources import iceberg as ice


def _tmp():
    return os.path.join(tempfile.mkdtemp(prefix="r11ice_"), "t")


def test_overwrite_keeps_field_ids_and_schema_history(spark):
    t = _tmp()
    ice.write_iceberg(
        spark.range(0, 30).selectExpr("id AS k", "id * 1.0 AS v"),
        t, stats_cols=["k"],
    )
    m1 = ice.table_metadata(t)
    ids1 = {f["name"]: f["id"]
            for f in m1["schemas"][0]["fields"]}
    snap1 = m1["current-snapshot-id"]
    # overwrite EVOLVES the schema: new column w, k/v keep their ids
    ice.write_iceberg(
        spark.range(0, 10).selectExpr(
            "id + 100 AS k", "id * 2.0 AS v",
            "CAST('x' AS STRING) AS w",
        ),
        t, mode="overwrite", stats_cols=["k"],
    )
    m2 = ice.table_metadata(t)
    assert len(m2["schemas"]) == 2
    cur = next(s for s in m2["schemas"]
               if s["schema-id"] == m2["current-schema-id"])
    ids2 = {f["name"]: f["id"] for f in cur["fields"]}
    assert ids2["k"] == ids1["k"] and ids2["v"] == ids1["v"]
    assert ids2["w"] == m2["last-column-id"] == max(ids1.values()) + 1
    # old snapshot still listed, still readable THROUGH ITS schema,
    # and its manifests' bounds still prune with the original ids
    assert any(s["snapshot-id"] == snap1 for s in m2["snapshots"])
    old = ice.read_iceberg(spark, t, snapshot_id=snap1)
    assert old.columns == ["k", "v"]
    assert old.count() == 30
    assert ice.read_iceberg(
        spark, t, snapshot_id=snap1, where=[("k", 5, 9)]
    ).count() == 5
    assert ice.read_iceberg(spark, t).count() == 10


def test_append_after_evolution_and_delete_snapshot_schema_id(spark):
    t = _tmp()
    ice.write_iceberg(
        spark.range(0, 20).selectExpr("id AS k", "id * 1.0 AS v"), t
    )
    ice.write_iceberg(
        spark.range(0, 5).selectExpr(
            "id + 50 AS k", "id * 1.0 AS v", "CAST('n' AS STRING) AS w"
        ),
        t, mode="overwrite",
    )
    # append onto the evolved schema keeps history + ids
    ice.write_iceberg(
        spark.range(0, 3).selectExpr(
            "id + 90 AS k", "id * 1.0 AS v", "CAST('a' AS STRING) AS w"
        ),
        t, mode="append",
    )
    m = ice.table_metadata(t)
    assert len(m["schemas"]) == 2
    assert m["current-schema-id"] == 1
    assert ice.read_iceberg(spark, t).count() == 8
    # a delete snapshot records the CURRENT schema id, not 0
    data, _ = ice.live_files(t)
    fp = data[0]["file_path"]
    ice.write_position_deletes(spark, t, [(fp, 0)])
    m = ice.table_metadata(t)
    cur_snap = next(s for s in m["snapshots"]
                    if s["snapshot-id"] == m["current-snapshot-id"])
    assert cur_snap["schema-id"] == m["current-schema-id"]
    assert ice.read_iceberg(spark, t).count() == 7


def test_spec_evolution_append_reads_and_prunes_per_file(spark):
    t = _tmp()
    df = spark.range(0, 60).selectExpr(
        "id AS k", "CAST(id % 3 AS STRING) AS p",
        "CAST(id % 2 AS STRING) AS q",
    )
    ice.write_iceberg(df, t, partition_by=["p"], stats_cols=["k"])
    # refuse by default, evolve on request
    with pytest.raises(ValueError, match="evolve_spec"):
        ice.write_iceberg(
            df.selectExpr("k + 100 AS k", "p", "q"), t,
            mode="append", partition_by=["q"],
        )
    ice.write_iceberg(
        df.selectExpr("k + 100 AS k", "p", "q"), t,
        mode="append", partition_by=["q"], evolve_spec=True,
    )
    m = ice.table_metadata(t)
    assert len(m["partition-specs"]) == 2
    assert m["default-spec-id"] == 1
    specs = {sp["spec-id"]: [f["name"] for f in sp["fields"]]
             for sp in m["partition-specs"]}
    assert specs == {0: ["p"], 1: ["q"]}
    # partition field ids never reused across specs
    fids = [f["field-id"] for sp in m["partition-specs"]
            for f in sp["fields"]]
    assert len(fids) == len(set(fids))
    # every row reads back; pruning works on BOTH generations
    got = ice.read_iceberg(spark, t)
    assert got.count() == 120
    assert got.filter("p = '1'").count() == 40
    assert ice.read_iceberg(
        spark, t, where=[("p", "1", "1")]
    ).count() == 40
    assert ice.read_iceberg(
        spark, t, where=[("q", "0", "0")]
    ).count() == 60
    # per-file spec resolution: old files carry p-tuples, new q-tuples
    data, _ = ice.live_files(t)
    by_spec = {}
    for d in data:
        by_spec.setdefault(d["__spec_id"], set()).update(
            (d.get("partition") or {}).keys()
        )
    assert by_spec[0] == {"p"} and by_spec[1] == {"q"}


def test_metadata_versions_past_nine_commits(spark):
    """v10.metadata.json must sort AFTER v9 — lexicographic ordering
    broke version discovery (and the next version number) on every
    table past its 9th commit (found by the eq-delete arms
    measurement tool driving 32 serial commits)."""
    t = _tmp()
    for i in range(12):
        ice.write_iceberg(
            spark.range(i * 5, i * 5 + 5).selectExpr("id AS k"),
            t, mode="append" if i else "overwrite",
        )
    assert ice.read_iceberg(spark, t).count() == 60
    names = ice._metadata_files(t)
    assert names[-1] == "v12.metadata.json"
    assert len(ice.iceberg_history(t)) == 12


def test_spec_evolution_prune_skips_files(spark):
    """Pruning on the OLD spec column must skip new-spec files only
    via bounds (conservative) while old-spec files prune exactly —
    row results identical to a full-scan filter."""
    t = _tmp()
    a = spark.range(0, 40).selectExpr(
        "id AS k", "CAST(id % 4 AS STRING) AS p"
    )
    ice.write_iceberg(a, t, partition_by=["p"])
    ice.write_iceberg(
        a.selectExpr("k + 1000 AS k", "p"), t, mode="append",
        partition_by=[], evolve_spec=True,
    )
    want = 10  # old generation p='2'
    got = ice.read_iceberg(spark, t, where=[("p", "2", "2")])
    full = ice.read_iceberg(spark, t).filter("p = '2'")
    assert got.count() == full.count() == want + 10
