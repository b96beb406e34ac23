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


def test_branch_commits_invisible_to_main_changelog_and_stream(
    spark, tmp_path
):
    """An unpublished branch commit is NOT a change of main's
    lineage: the batch changelog and the streaming source both skip
    it; after iceberg_fast_forward the published rows arrive exactly
    once (the stream's offset is the MAIN HEAD's sequence, so the
    pointer-move publish still delivers)."""
    from harmony_energy_data_pipeline_spark.sources.icebergstream import (
        IcebergTableDataSource,
    )

    spark.dataSource.register(IcebergTableDataSource)
    t = _tmp("lin_")
    ice.write_iceberg(_df(spark, 0, 5), t)
    base = ice.table_metadata(t)["current-snapshot-id"]
    ck, out = str(tmp_path / "ck"), str(tmp_path / "out")

    def drain():
        q = (
            spark.readStream.format("iceberg_table")
            .option("path", t).load()
            .writeStream.format("parquet").option("path", out)
            .option("checkpointLocation", ck)
            .outputMode("append").trigger(availableNow=True).start()
        )
        q.awaitTermination(120)
        return sorted(r.k for r in spark.read.parquet(out).collect())

    assert drain() == [0, 1, 2, 3, 4]
    ice.write_iceberg(_df(spark, 50, 53), t, mode="append",
                      branch="audit")
    assert drain() == [0, 1, 2, 3, 4]
    assert ice.read_iceberg_changes(spark, t, base).count() == 0
    ice.iceberg_fast_forward(t, "audit")
    assert drain() == [0, 1, 2, 3, 4, 50, 51, 52]
    assert sorted(
        r.k for r in ice.read_iceberg_changes(spark, t, base).collect()
    ) == [50, 51, 52]
