"""Write-audit-publish: failing audits never publish, passing audits
commit, append audits see the whole candidate table, orphans sweep."""
from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from harmony_energy_data_pipeline_spark.sinks import snapshots as snap


def _df(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    )


def test_failing_audit_never_publishes(spark, tmp_path):
    path = str(tmp_path / "t")
    snap.snapshot_write(_df(spark, 0, 100), path)
    with pytest.raises(snap.AuditFailedError) as ei:
        snap.snapshot_write_audited(
            _df(spark, 100, 110), path, mode="append",
            audits={
                "rowcount_grows": lambda d: d.count() >= 100,
                "too_strict": lambda d: d.count() >= 10_000,
            },
        )
    assert ei.value.failed == ["too_strict"]
    # readers never saw the staged batch
    assert snap.latest_version(path) == 0
    assert snap.read_snapshot(spark, path).count() == 100
    # the orphaned stage is vacuum-able
    removed = snap.vacuum(path, keep_last=1, orphan_grace_s=0.0)
    assert removed >= 1
    assert snap.read_snapshot(spark, path).count() == 100


def test_passing_audits_publish_with_metadata(spark, tmp_path):
    path = str(tmp_path / "t")
    snap.snapshot_write(_df(spark, 0, 100), path)
    v = snap.snapshot_write_audited(
        _df(spark, 100, 200), path, mode="append",
        audits={
            "keys_unique": lambda d: (
                d.count() == d.select("k").distinct().count()
            ),
            "candidate_is_union": lambda d: d.count() == 200,
        },
        stats_cols=["k"],
    )
    assert v == 1
    assert snap.read_snapshot(spark, path).count() == 200
    kept, total = snap.prune_files(path, [("k", 150, 160)])
    assert len(kept) < total  # stats recorded on the published commit


def test_audited_overwrite_candidate_is_batch_only(spark, tmp_path):
    path = str(tmp_path / "t")
    snap.snapshot_write(_df(spark, 0, 100), path)
    seen = {}
    snap.snapshot_write_audited(
        _df(spark, 0, 30), path, mode="overwrite",
        audits={"record": lambda d: seen.setdefault("n", d.count()) or True},
    )
    assert seen["n"] == 30  # overwrite candidate excludes the parent
    assert snap.read_snapshot(spark, path).count() == 30
