"""Round-11 equality-delete scale + adoption.

VERDICT r10 #5: eq-delete read arms scale with #DELETE BOUNDARIES,
not #commits (`_eq_delete_scan_groups`).
VERDICT r10 #4: `snapshot_import_iceberg` ADOPTS equality-delete
tables — one sequence-scoped scan materializes positions into native
positional DVs; reads, COUNT and later evolution need no equality
machinery.
"""

import os
import tempfile

import pytest
from pyspark.sql import functions as F

from harmony_energy_data_pipeline_spark.sinks import snapshots as snap
from harmony_energy_data_pipeline_spark.sources import iceberg as ice
from harmony_energy_data_pipeline_spark.sources.iceberg import (
    _eq_delete_scan_groups,
)


def _tmp():
    return os.path.join(tempfile.mkdtemp(prefix="r11eq_"), "t")


def test_scan_groups_bounded_by_delete_boundaries():
    # 40 data commits (seqs 1..40), deletes at seq 10 and 30
    files = [{"file_path": f"f{i}", "__seq": i} for i in range(1, 41)]
    dels = [{"__seq": 10}, {"__seq": 30}]
    groups = _eq_delete_scan_groups(files, dels)
    assert len(groups) == 3  # <=10 / 11..30 / >30 — NOT 40
    # strictly-lower scoping: seq 10 is immune to the delete AT 10
    sizes = sorted(len(g) for _seq, g in groups)
    assert sizes == [9, 11, 20]
    # representative seq sees the same delete set as every member
    for rep, grp in groups:
        for f in grp:
            assert ({d["__seq"] for d in dels if d["__seq"] > rep}
                    == {d["__seq"] for d in dels
                        if d["__seq"] > f["__seq"]})


def test_scan_groups_no_deletes_single_arm():
    files = [{"file_path": f"f{i}", "__seq": i} for i in range(50)]
    assert len(_eq_delete_scan_groups(files, [])) == 1


def test_many_commit_eq_table_reads_with_bounded_arms(spark):
    t = _tmp()
    # 6 append commits, one eq-delete between commit 3 and 4
    for i in range(3):
        ice.write_iceberg(
            spark.range(i * 10, i * 10 + 10).selectExpr(
                "id AS k", "CAST(id % 3 AS STRING) AS tag"
            ),
            t, mode="append" if i else "overwrite",
        )
    ice.write_equality_deletes(spark, t, [{"tag": "1"}], ["tag"])
    for i in range(3, 6):
        ice.write_iceberg(
            spark.range(i * 10, i * 10 + 10).selectExpr(
                "id AS k", "CAST(id % 3 AS STRING) AS tag"
            ),
            t, mode="append",
        )
    data, deletes = ice.live_files(t)
    eq = [d for d in deletes if (d.get("content") or 0) == 2]
    groups = _eq_delete_scan_groups(data, eq)
    assert len(groups) == 2  # pre-delete arm + post-delete arm
    got = ice.read_iceberg(spark, t)
    # old rows with tag=1 deleted, post-delete commits immune
    want = sum(1 for k in range(60) if not (k < 30 and k % 3 == 1))
    assert got.count() == want
    assert got.filter("tag = '1' AND k < 30").count() == 0
    assert got.filter("tag = '1' AND k >= 30").count() == 10


def test_import_adopts_equality_deletes_as_native_dvs(spark):
    t = _tmp()
    df = spark.range(0, 40).selectExpr(
        "id AS k", "CAST(id % 4 AS STRING) AS tag",
        "CAST(id AS DOUBLE) AS v",
    )
    ice.write_iceberg(df, t, stats_cols=["k"])
    ice.write_equality_deletes(spark, t, [{"tag": "2"}], ["tag"])
    ice.write_iceberg(  # sequenced after the delete: immune
        df.filter("k % 4 = 2").selectExpr("k + 100 AS k", "tag", "v"),
        t, mode="append",
    )
    before = {(r.k, r.tag) for r in ice.read_iceberg(spark, t).collect()}
    ice.snapshot_import_iceberg(spark, t)
    after = {(r.k, r.tag)
             for r in snap.read_snapshot(spark, t).collect()}
    assert after == before
    assert len(after) == 40  # 30 survivors + 10 immune appends
    # manifest-only COUNT stays exact (DV-aware)
    m = snap._read_manifest(t, 0)
    assert m.get("dvs"), "eq deletes must land as native DVs"
    total = snap.read_snapshot(spark, t).count()
    assert total == 40
    # native evolution proceeds without equality machinery
    snap.snapshot_delete_where(spark, t, [("k", 0, 0)])
    assert snap.read_snapshot(spark, t).count() == 39


def test_import_mixed_position_and_equality_deletes(spark):
    t = _tmp()
    df = spark.range(0, 20).selectExpr(
        "id AS k", "CAST(id % 2 AS STRING) AS tag"
    )
    ice.write_iceberg(df, t)
    data, _ = ice.live_files(t)
    with_rows = next(d for d in data if d["record_count"] > 0)
    ice.write_position_deletes(spark, t, [(with_rows["file_path"], 0)])
    ice.write_equality_deletes(spark, t, [{"tag": "1"}], ["tag"])
    before = {r.k for r in ice.read_iceberg(spark, t).collect()}
    ice.snapshot_import_iceberg(spark, t)
    after = {r.k for r in snap.read_snapshot(spark, t).collect()}
    assert after == before
