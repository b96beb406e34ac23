"""Iceberg WRITE-AUDIT-PUBLISH (round 12): ``write_iceberg(...,
branch=...)`` commits snapshots that advance a BRANCH head while
``main`` (and the snapshot-log, which tracks the current pointer)
stay put; ``iceberg_fast_forward`` publishes. Readers at the branch
ref see staged data, main readers never do until publish.
"""

import os
import tempfile

import pytest

from harmony_energy_data_pipeline_spark.sources import iceberg as ice


def _tmp(prefix="wap_"):
    return os.path.join(tempfile.mkdtemp(prefix=prefix), "t")


def _df(spark, lo, hi):
    return spark.range(lo, hi).selectExpr(
        "id AS k", "CAST(id AS DOUBLE) AS v"
    )


def test_branch_write_isolated_until_publish(spark):
    t = _tmp()
    ice.write_iceberg(_df(spark, 0, 5), t)
    ice.write_iceberg(_df(spark, 5, 9), t, mode="append",
                      branch="audit")
    ice.write_iceberg(_df(spark, 9, 11), t, mode="append",
                      branch="audit")
    # main untouched; the branch stacks its own commits
    assert ice.read_iceberg(spark, t).count() == 5
    head = ice.iceberg_resolve_ref(t, "audit")
    assert ice.read_iceberg(spark, t, snapshot_id=head).count() == 11
    # concurrent MAIN write does not disturb the branch
    ice.write_iceberg(_df(spark, 100, 102), t, mode="append")
    assert ice.read_iceberg(spark, t).count() == 7
    assert ice.read_iceberg(
        spark, t, snapshot_id=ice.iceberg_resolve_ref(t, "audit")
    ).count() == 11
    # publish: main fast-forwards to the branch head (the main-only
    # rows written after the fork are not on the branch lineage)
    sid = ice.iceberg_fast_forward(t, "audit")
    assert ice.table_metadata(t)["current-snapshot-id"] == sid
    assert ice.read_iceberg(spark, t).count() == 11
    # idempotent publish
    assert ice.iceberg_fast_forward(t, "audit") == sid
    with pytest.raises(KeyError):
        ice.iceberg_fast_forward(t, "nope")


def test_branch_parent_chain_and_expire(spark):
    t = _tmp("wapp_")
    ice.write_iceberg(_df(spark, 0, 4), t)
    ice.write_iceberg(_df(spark, 4, 6), t, mode="append",
                      branch="stage")
    meta = ice.table_metadata(t)
    bs = next(s for s in meta["snapshots"]
              if s["snapshot-id"] ==
              ice.iceberg_resolve_ref(t, "stage"))
    assert bs.get("parent-snapshot-id") == \
        meta["current-snapshot-id"]
    # expire keeps the branch-pinned snapshot
    ice.write_iceberg(_df(spark, 100, 104), t, mode="append")
    ice.iceberg_expire_snapshots(t, keep_last=1)
    assert ice.read_iceberg(
        spark, t, snapshot_id=ice.iceberg_resolve_ref(t, "stage")
    ).count() == 6


def test_branch_write_requires_table(spark):
    t = _tmp("wapn_")
    with pytest.raises(ValueError, match="branch"):
        ice.write_iceberg(_df(spark, 0, 3), t, branch="audit")
