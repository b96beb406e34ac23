"""Scheduled snapshot-table maintenance: compact + vacuum as one
locked background job — the Iceberg ``rewrite_data_files`` /
``expire_snapshots`` maintenance-job shape for this engine's snapshot
log, composed from :func:`sinks.snapshots.snapshot_compact`,
:func:`sinks.snapshots.vacuum` and :class:`pipeline.schedule.
IntervalScheduler`.

Why it exists: a streaming append sink accrues one small file set per
micro-batch commit; without maintenance, scan cost grows with FILE
COUNT, not data volume. ``start_snapshot_append_sink`` offers inline
compaction on the writer thread; this module is the alternative for
deployments that keep the ingest path latency-critical and move
maintenance to its own cadence.

The maintenance surface is SINGLE-WRITER by contract (vacuum deletes
files; two concurrent compactors would rewrite the same live set).
Round 5 makes the contract ENFORCED rather than documented: every
maintenance run takes an exclusive lockfile under the table's
``_snapshots`` dir and refuses loudly (:class:`MaintenanceLockHeld`)
when another maintainer holds it. Concurrent DATA writers are fine —
``snapshot_compact`` validates its expected parent and redoes the
rewrite when an append lands mid-compaction (never dropping it), and
``vacuum`` only expires manifests strictly older than the keep set.

Reference scope note: the reference's only background job is the
hourly ingest (src/scheduler/job.py:10-34); table maintenance has no
reference counterpart because SQLite auto-vacuums a single file — at
parquet-lake scale the equivalent hygiene must be explicit.
"""

from __future__ import annotations

import json
import logging
import os
import time

from pyspark.sql import SparkSession

from harmony_energy_data_pipeline_spark.pipeline.schedule import IntervalScheduler
from harmony_energy_data_pipeline_spark.sinks import snapshots as snap
from harmony_energy_data_pipeline_spark.sinks.pathnorm import normalizes_paths

logger = logging.getLogger(__name__)


class MaintenanceLockHeld(RuntimeError):
    """Another maintenance process holds the table's maintenance lock.
    Two concurrent maintainers could double-rewrite the live set and
    vacuum each other's in-flight txids — refuse instead."""


def _lock_path(table_path: str) -> str:
    return os.path.join(table_path, "_snapshots", "maintenance.lock")


@normalizes_paths("table_path")
def acquire_maintenance_lock(table_path: str, stale_after_s: float = 3600.0) -> str:
    """Take the table's exclusive maintenance lock (``O_CREAT|O_EXCL``
    — atomic on POSIX and the same primitive the manifest "link"
    protocol relies on). The lock records pid + timestamp; a lock
    whose owner pid is dead, or older than ``stale_after_s``, is
    broken and re-taken (crash recovery — a maintainer that died
    mid-run must not wedge the table forever). Returns the lock path;
    release with :func:`release_maintenance_lock`."""
    lp = _lock_path(table_path)
    os.makedirs(os.path.dirname(lp), exist_ok=True)
    payload = json.dumps({"pid": os.getpid(), "at_unix": time.time()})
    for _attempt in range(2):
        try:
            fd = os.open(lp, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
            try:
                os.write(fd, payload.encode())
            finally:
                os.close(fd)
            return lp
        except FileExistsError:
            try:
                with open(lp, encoding="utf-8") as fh:
                    holder = json.load(fh)
                pid, at = int(holder["pid"]), float(holder["at_unix"])
            except (OSError, ValueError, KeyError):
                pid, at = None, 0.0  # torn/corrupt lock: treat as stale
            alive = False
            if pid is not None:
                try:
                    os.kill(pid, 0)
                    alive = True
                except ProcessLookupError:
                    alive = False
                except PermissionError:
                    alive = True  # exists but owned elsewhere
            if alive and (time.time() - at) < stale_after_s:
                raise MaintenanceLockHeld(
                    f"maintenance lock on {table_path} held by pid {pid} "
                    f"since {time.time() - at:.0f}s ago ({lp}); a second "
                    "maintainer would race compaction/vacuum — run one"
                ) from None
            # stale: owner dead or expired — break and retry the O_EXCL
            try:
                os.unlink(lp)
            except FileNotFoundError:
                pass
    raise MaintenanceLockHeld(
        f"could not acquire maintenance lock {lp} after breaking a stale "
        "holder (another maintainer re-took it first)"
    )


def release_maintenance_lock(table_path: str) -> None:
    try:
        os.unlink(_lock_path(table_path))
    except FileNotFoundError:
        pass


@normalizes_paths("table_path")
def run_maintenance(
    spark: SparkSession,
    table_path: str,
    target_file_mb: int = 128,
    vacuum_keep: int | None = None,
    min_files: int = 2,
    stale_after_s: float = 3600.0,
) -> dict:
    """One locked maintenance pass: compact the latest snapshot when
    it holds ≥ ``min_files`` data files (skip when already compact —
    maintenance must be cheap to schedule aggressively), then vacuum
    to the last ``vacuum_keep`` versions (None = keep history).
    Returns a summary dict (the audit-record shape ``pipeline.run``
    uses): ``{compacted, version, files_before, files_after,
    vacuum_removed, skipped_reason}``."""
    acquire_maintenance_lock(table_path, stale_after_s=stale_after_s)
    try:
        out: dict = {
            "compacted": False,
            "version": None,
            "files_before": None,
            "files_after": None,
            "vacuum_removed": 0,
            "skipped_reason": None,
        }
        v = snap.latest_version(table_path)
        if v is None:
            out["skipped_reason"] = "no snapshots"
            return out
        files_before = len(snap._read_manifest(table_path, v)["files"])
        out["files_before"] = files_before
        if files_before >= min_files:
            new_v = snap.snapshot_compact(
                spark, table_path, target_file_mb=target_file_mb
            )
            out["compacted"] = True
            out["version"] = new_v
            out["files_after"] = len(
                snap._read_manifest(table_path, new_v)["files"]
            )
        else:
            out["skipped_reason"] = f"already compact ({files_before} files)"
            out["version"] = v
            out["files_after"] = files_before
        if vacuum_keep is not None:
            out["vacuum_removed"] = snap.vacuum(
                table_path, keep_last=vacuum_keep
            )
        return out
    finally:
        release_maintenance_lock(table_path)


def schedule_maintenance(
    spark: SparkSession,
    table_path: str,
    interval_seconds: float,
    target_file_mb: int = 128,
    vacuum_keep: int | None = None,
    min_files: int = 2,
    run_immediately: bool = True,
) -> IntervalScheduler:
    """Start a background :class:`IntervalScheduler` running
    :func:`run_maintenance` on a fixed-rate cadence (returned STARTED;
    ``.stop()`` it to shut down). A pass that finds the lock held
    (another maintainer, or the previous pass overrunning into this
    slot via an external runner) logs and yields the slot — the
    scheduler itself never overlaps its own runs, since a run that
    overshoots skips to the next future slot."""

    def job() -> None:
        try:
            summary = run_maintenance(
                spark, table_path,
                target_file_mb=target_file_mb,
                vacuum_keep=vacuum_keep,
                min_files=min_files,
            )
            logger.info("maintenance pass on %s: %s", table_path, summary)
        except MaintenanceLockHeld as e:
            logger.warning("maintenance pass skipped: %s", e)

    return IntervalScheduler(
        job, interval_seconds, run_immediately=run_immediately
    ).start()


__all__ = [
    "MaintenanceLockHeld",
    "acquire_maintenance_lock",
    "release_maintenance_lock",
    "run_maintenance",
    "schedule_maintenance",
]
