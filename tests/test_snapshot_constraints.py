"""Commit-time CHECK constraints: batch validation, inheritance
through the append chain, null fail-closed semantics, and upkeep
through maintenance and row rewrites."""
from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from harmony_energy_data_pipeline_spark.sinks import snapshots as snap


def _df(spark, rows):
    return spark.createDataFrame(rows, "k long, pct double")


def test_violating_commit_refused_with_counts(spark, tmp_path):
    path = str(tmp_path / "t")
    bad = _df(spark, [(1, 50.0), (2, 130.0), (3, -1.0)])
    with pytest.raises(snap.ConstraintViolationError) as ei:
        snap.snapshot_write(
            bad, path, constraints=["pct >= 0 AND pct <= 100", "k IS NOT NULL"]
        )
    assert ei.value.violations == {"pct >= 0 AND pct <= 100": 2}
    assert snap.latest_version(path) is None  # nothing committed


def test_append_inherits_and_validates_only_its_batch(spark, tmp_path):
    path = str(tmp_path / "t")
    snap.snapshot_write(
        _df(spark, [(1, 10.0)]), path, constraints=["pct <= 100"]
    )
    # inherited: no constraints argument, still enforced
    with pytest.raises(snap.ConstraintViolationError):
        snap.snapshot_write(_df(spark, [(2, 200.0)]), path, mode="append")
    snap.snapshot_write(_df(spark, [(2, 99.0)]), path, mode="append")
    assert snap.read_snapshot(spark, path).count() == 2
    m = snap._read_manifest(path, snap.latest_version(path))
    assert m["constraints"] == ["pct <= 100"]


def test_null_fails_closed(spark, tmp_path):
    path = str(tmp_path / "t")
    with pytest.raises(snap.ConstraintViolationError) as ei:
        snap.snapshot_write(
            _df(spark, [(1, None)]), path, constraints=["pct <= 100"]
        )
    assert ei.value.violations == {"pct <= 100": 1}


def test_constraints_survive_compact_restore_and_rewrite(spark, tmp_path):
    path = str(tmp_path / "t")
    snap.snapshot_write(
        _df(spark, [(i, float(i)) for i in range(50)]),
        path, constraints=["pct >= 0"],
    )
    snap.snapshot_compact(spark, path, target_file_mb=1)
    m = snap._read_manifest(path, snap.latest_version(path))
    assert m["constraints"] == ["pct >= 0"]
    snap.snapshot_restore(path, 0)
    m = snap._read_manifest(path, snap.latest_version(path))
    assert m["constraints"] == ["pct >= 0"]
    # an UPDATE whose transform violates the table constraint refuses
    with pytest.raises(snap.ConstraintViolationError):
        snap.snapshot_update_where(
            spark, path, [("k", 0, 10)], {"pct": F.lit(-5.0)}
        )
    # and a clean one passes, constraints carried
    snap.snapshot_update_where(
        spark, path, [("k", 0, 10)], {"pct": F.lit(1.0)}
    )
    m = snap._read_manifest(path, snap.latest_version(path))
    assert m["constraints"] == ["pct >= 0"]


def test_replacing_constraints_on_overwrite(spark, tmp_path):
    path = str(tmp_path / "t")
    snap.snapshot_write(
        _df(spark, [(1, 10.0)]), path, constraints=["pct <= 100"]
    )
    # an overwrite can SET a new constraint list (validated)
    snap.snapshot_write(
        _df(spark, [(2, 500.0)]), path, mode="overwrite",
        constraints=["pct <= 1000"],
    )
    m = snap._read_manifest(path, snap.latest_version(path))
    assert m["constraints"] == ["pct <= 1000"]
