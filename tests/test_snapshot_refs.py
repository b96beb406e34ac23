"""Round 10: named refs on the snapshot log — tags (vacuum-immortal
version pins), branches (zero-copy forks via clone+borrow), merge
back, and WAP audit parking."""

import os
import tempfile

import pytest

from harmony_energy_data_pipeline_spark.sinks import refs
from harmony_energy_data_pipeline_spark.sinks import snapshots as snap


def _tmp():
    return os.path.join(tempfile.mkdtemp(), "t")


def _df(spark, lo, hi):
    return spark.range(lo, hi).selectExpr(
        "id AS k", "CAST(id AS DOUBLE) AS v"
    )


def test_tag_pin_read_and_lifecycle(spark):
    t = _tmp()
    snap.snapshot_write(_df(spark, 0, 50), t)
    refs.create_tag(t, "run-2026-08")
    snap.snapshot_write(_df(spark, 0, 9), t)  # overwrite moves latest
    assert refs.resolve_tag(t, "run-2026-08") == 0
    assert refs.read_tag(spark, t, "run-2026-08").count() == 50
    assert snap.read_snapshot(spark, t).count() == 9
    with pytest.raises(FileExistsError):
        refs.create_tag(t, "run-2026-08")
    refs.create_tag(t, "run-2026-08", replace=True)  # re-pin at latest
    assert refs.resolve_tag(t, "run-2026-08") == 1
    refs.delete_tag(t, "run-2026-08")
    with pytest.raises(KeyError):
        refs.resolve_tag(t, "run-2026-08")
    with pytest.raises(ValueError, match="invalid ref name"):
        refs.create_tag(t, "bad/name")


def test_tagged_version_survives_vacuum(spark):
    t = _tmp()
    snap.snapshot_write(_df(spark, 0, 40), t)       # v0
    refs.create_tag(t, "pinned")
    for i in range(1, 5):
        snap.snapshot_write(_df(spark, 0, 40 + i), t)  # v1..v4 overwrite
    snap.vacuum(t, keep_last=1, orphan_grace_s=0.0)
    # v0 survives through its tag; intermediates are gone
    assert refs.read_tag(spark, t, "pinned").count() == 40
    assert snap.read_snapshot(spark, t).count() == 44
    with pytest.raises(FileNotFoundError):
        snap.read_snapshot(spark, t, version=2)
    # untag → next vacuum reclaims it
    refs.delete_tag(t, "pinned")
    snap.vacuum(t, keep_last=1, orphan_grace_s=0.0)
    with pytest.raises(FileNotFoundError):
        snap.read_snapshot(spark, t, version=0)
    assert snap.read_snapshot(spark, t).count() == 44


def test_tag_gap_liveness_keeps_gap_born_files(spark):
    """A file born INSIDE the expired gap but still live at the head
    must survive: the run-head full resolution covers it."""
    t = _tmp()
    snap.snapshot_write(_df(spark, 0, 10), t)               # v0
    refs.create_tag(t, "old")
    snap.snapshot_write(_df(spark, 100, 110), t, mode="append")  # v1 (gap)
    snap.snapshot_write(_df(spark, 200, 210), t, mode="append")  # v2
    snap.snapshot_write(_df(spark, 300, 310), t, mode="append")  # v3
    # keep_last=2 keeps v2,v3; tag keeps v0; v1 expires — but the
    # files v1 added are live at v2/v3
    snap.vacuum(t, keep_last=2, orphan_grace_s=0.0)
    got = snap.read_snapshot(spark, t)
    assert got.count() == 40
    assert got.filter("k >= 100 AND k < 110").count() == 10
    assert refs.read_tag(spark, t, "old").count() == 10


def test_branch_fork_mutate_merge_drop(spark):
    t = _tmp()
    snap.snapshot_write(_df(spark, 0, 100), t, stats_cols=["k"])
    bp = refs.create_branch(t, "exp")
    assert refs.list_branches(t)["exp"]["path"] == bp
    # the branch takes full native ops without touching main
    snap.snapshot_delete_where(spark, bp, [("k", 0, 49)])
    snap.snapshot_write(_df(spark, 1000, 1010), bp, mode="append")
    assert refs.read_branch(spark, t, "exp").count() == 60
    assert snap.read_snapshot(spark, t).count() == 100
    # merge back: one main commit, branch state wins
    v = refs.merge_branch(spark, t, "exp", drop=True)
    assert snap.read_snapshot(spark, t, version=v).count() == 60
    assert snap.read_snapshot(spark, t, version=v - 1).count() == 100
    assert "exp" not in refs.list_branches(t)
    with pytest.raises(KeyError):
        refs.read_branch(spark, t, "exp")


def test_branch_borrow_protects_against_main_vacuum(spark):
    t = _tmp()
    snap.snapshot_write(_df(spark, 0, 30), t)
    refs.create_branch(t, "keepalive")
    # main moves on; old files are only referenced by the branch
    for i in range(3):
        snap.snapshot_write(_df(spark, 0, 5 + i), t)
    snap.vacuum(t, keep_last=1, orphan_grace_s=0.0)
    assert refs.read_branch(spark, t, "keepalive").count() == 30
    # dropping the branch releases the borrow; files then reclaim
    refs.drop_branch(t, "keepalive")
    snap.vacuum(t, keep_last=1, orphan_grace_s=0.0)
    assert snap.read_snapshot(spark, t).count() == 7


def test_duplicate_branch_refuses(spark):
    t = _tmp()
    snap.snapshot_write(_df(spark, 0, 5), t)
    refs.create_branch(t, "b1")
    with pytest.raises(FileExistsError):
        refs.create_branch(t, "b1")


def test_wap_park_branch(spark):
    t = _tmp()
    snap.snapshot_write(_df(spark, 0, 50), t)
    bad = spark.range(50, 55).selectExpr(
        "id AS k", "CAST(-1.0 AS DOUBLE) AS v"
    )
    with pytest.raises(snap.AuditFailedError) as ei:
        snap.snapshot_write_audited(
            bad, t, mode="append",
            audits={"no_negatives": lambda c: c.filter("v < 0")
                    .limit(1).count() == 0},
            park_branch="quarantine",
        )
    assert ei.value.parked_branch == refs.branch_path(t, "quarantine")
    # main never saw the batch; the branch carries main + batch
    assert snap.read_snapshot(spark, t).count() == 50
    parked = refs.read_branch(spark, t, "quarantine")
    assert parked.count() == 55
    assert parked.filter("v < 0").count() == 5
