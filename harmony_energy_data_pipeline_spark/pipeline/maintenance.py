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
import uuid

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
    protocol relies on). The lock records pid + timestamp + a random
    token; a lock whose owner pid is dead, or older than
    ``stale_after_s``, is broken and re-taken (crash recovery — a
    maintainer that died mid-run must not wedge the table forever).

    Stale-lock breaking is GUARDED, not a bare unlink (which is a
    TOCTOU: two contenders observing the same stale lock could each
    unlink-then-create, with B's unlink deleting A's freshly created
    lock — the double-maintainer condition this class exists to
    prevent). A contender that judges the lock stale must first win a
    short-lived BREAKER sub-lock (``<lock>.breaker``, O_EXCL — at most
    one breaker), then re-read the lock and verify it is still
    byte-identical to the stale content it judged (a successor's fresh
    lock never matches), and only then rename it to a unique tombstone
    and delete that. Losers of the breaker race refuse
    (:class:`MaintenanceLockHeld`). The one residual window — the
    judged-stale owner racing its own release against the verified
    rename — requires a dead-or-expired holder to act at that instant,
    a contradiction of the staleness judgment.

    Returns an ownership token; pass it to
    :func:`release_maintenance_lock` so release can verify it still
    owns the lock (an overrunning maintainer whose lock was broken
    must not delete its successor's)."""
    lp = _lock_path(table_path)
    os.makedirs(os.path.dirname(lp), exist_ok=True)
    token = uuid.uuid4().hex
    payload = json.dumps(
        {"pid": os.getpid(), "at_unix": time.time(), "token": token}
    )
    for _attempt in range(3):
        try:
            fd = os.open(lp, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
            try:
                os.write(fd, payload.encode())
            finally:
                os.close(fd)
            return token
        except FileExistsError:
            try:
                with open(lp, "rb") as fh:
                    raw = fh.read()
                holder = json.loads(raw.decode("utf-8"))
                pid, at = int(holder["pid"]), float(holder["at_unix"])
            except FileNotFoundError:
                continue  # released/broken between create and read
            except (OSError, ValueError, KeyError):
                pid, at, raw = None, 0.0, raw  # torn/corrupt: stale
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
            if not _break_stale_lock(lp, raw):
                raise MaintenanceLockHeld(
                    f"maintenance lock on {table_path} is stale but another "
                    "contender is breaking it — yield this slot"
                ) from None
            # broken by us: loop back and retry the O_EXCL create
    raise MaintenanceLockHeld(
        f"could not acquire maintenance lock {lp} after breaking a stale "
        "holder (another maintainer re-took it first)"
    )


def _break_stale_lock(lp: str, observed: bytes) -> bool:
    """Remove a judged-stale lockfile safely: win the breaker sub-lock,
    re-verify the lock's bytes still equal ``observed`` (so a
    successor's FRESH lock is never stolen), then rename-to-tombstone
    and delete. Returns True when the stale lock is gone (by us or
    already), False when the caller must back off (breaker contended,
    or the lock's content changed under us)."""
    breaker = lp + ".breaker"
    try:
        fd = os.open(breaker, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        os.close(fd)
    except FileExistsError:
        # another contender is mid-break; clear an ancient breaker left
        # by a crash (next caller then gets through)
        try:
            if time.time() - os.path.getmtime(breaker) > 60.0:
                os.unlink(breaker)
        except OSError:
            pass
        return False
    try:
        try:
            with open(lp, "rb") as fh:
                if fh.read() != observed:
                    return False  # replaced by a fresh lock: not ours to break
        except FileNotFoundError:
            return True  # already gone
        tomb = f"{lp}.stale-{uuid.uuid4().hex}"
        try:
            os.rename(lp, tomb)
        except FileNotFoundError:
            return True
        try:
            os.unlink(tomb)
        except FileNotFoundError:
            pass
        return True
    finally:
        try:
            os.unlink(breaker)
        except FileNotFoundError:
            pass


def release_maintenance_lock(table_path: str, token: str | None = None) -> None:
    """Release the maintenance lock — but only if we still own it.
    ``token`` (from :func:`acquire_maintenance_lock`) is compared to
    the lockfile's recorded token; without a token, ownership falls
    back to a pid match. A maintainer that overran ``stale_after_s``
    and had its lock broken finds someone else's lock here and leaves
    it alone (logging instead of unlinking the successor's lock)."""
    lp = _lock_path(table_path)
    try:
        with open(lp, encoding="utf-8") as fh:
            holder = json.load(fh)
    except FileNotFoundError:
        return
    except (OSError, ValueError):
        holder = {}
    owns = (
        holder.get("token") == token
        if token is not None
        else holder.get("pid") == os.getpid()
    )
    if not owns:
        logger.warning(
            "not releasing %s: lock owned by pid %s token %s (ours was "
            "broken as stale — the successor owns the table now)",
            lp, holder.get("pid"), holder.get("token"),
        )
        return
    try:
        os.unlink(lp)
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
    orphan_grace_s: float | None = None,
) -> dict:
    """One locked maintenance pass: compact the latest snapshot when
    it holds ≥ ``min_files`` data files (skip when already compact —
    maintenance must be cheap to schedule aggressively), then vacuum
    to the last ``vacuum_keep`` versions (None = keep history).
    Returns a summary dict (the audit-record shape ``pipeline.run``
    uses): ``{compacted, version, files_before, files_after,
    vacuum_removed, skipped_reason}``.

    ``orphan_grace_s`` (default: ``stale_after_s``) gates vacuum's
    sweep of never-referenced data files — a LIVE writer between its
    parquet stage and manifest publish must not have its stage deleted
    out from under it (concurrent DATA writers are part of this
    module's contract). See :func:`sinks.snapshots.vacuum`."""
    token = acquire_maintenance_lock(table_path, stale_after_s=stale_after_s)
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
                table_path, keep_last=vacuum_keep,
                orphan_grace_s=(
                    stale_after_s if orphan_grace_s is None else orphan_grace_s
                ),
            )
        return out
    finally:
        release_maintenance_lock(table_path, token=token)


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
    "auto_maintain",
]


def auto_maintain(
    spark: SparkSession,
    table_path: str,
    target_file_mb: int = 128,
    small_file_ratio: float = 0.5,
    max_dv_files: int = 0,
    vacuum_keep: int | None = None,
    keep_newer_than_s: float | None = None,
    cluster_by: "list[str] | None" = None,
    stale_after_s: float = 3600.0,
    orphan_grace_s: float | None = None,
    bin_pack: bool = True,
    analyze_stale_after: int | None = None,
) -> dict:
    """POLICY-driven locked maintenance: act only when the table's
    own metrics say it needs it, so the pass is cheap to schedule
    aggressively on thousands of tables.

    Compaction triggers (either):

    * **fragmentation** — average live file size below
      ``small_file_ratio × target_file_mb`` with more than one file
      (the streaming micro-batch accretion pattern). With
      ``bin_pack=True`` (default) the response is INCREMENTAL:
      ``snapshot_compact(only_smaller_than_mb=threshold)`` rewrites
      only the undersized files — O(small-file bytes) per pass, so
      the aggressive schedule this function exists for stays cheap
      even on tables whose bulk is already right-sized. Pass
      ``bin_pack=False`` to force the full rewrite (e.g. to restore
      a clustering).
    * **merge-on-read debt** — more than ``max_dv_files`` live files
      carry deletion vectors (their scans pay the anti join). Always
      a FULL compaction: the vectors may sit on right-sized files a
      bin-pack would carry untouched.

    ``analyze_stale_after=N``: keep table-level COLUMN STATISTICS
    fresh on the same schedule — re-run ``snapshot_analyze`` when the
    last ANALYZE is more than N commits behind (or absent). The
    optimizer-facing stats (NDV, nulls, bounds) then track the table
    without anyone remembering to refresh them; cost is one stacked
    pass only when actually stale.

    Then retention: ``vacuum_keep``/``keep_newer_than_s`` map to
    ``vacuum(keep_last=, keep_newer_than_s=)``. All under the
    breaker-guarded maintenance lock. Returns a decision record:
    ``{compacted, reason, version, files_before, files_after,
    dv_files_before, vacuum_removed, analyzed}`` — the auditable
    shape an ops loop logs."""
    token = acquire_maintenance_lock(table_path, stale_after_s=stale_after_s)
    try:
        out: dict = {
            "compacted": False, "reason": None, "version": None,
            "files_before": None, "files_after": None,
            "dv_files_before": None, "vacuum_removed": 0,
        }
        v = snap.latest_version(table_path)
        if v is None:
            out["reason"] = "no snapshots"
            return out
        info = snap.snapshot_table_info(table_path, version=v)
        out["files_before"] = info["n_files"]
        out["dv_files_before"] = info["dv_files"]
        out["version"] = v
        reason = None
        threshold = small_file_ratio * target_file_mb * 1024 * 1024
        incremental = False
        if info["dv_files"] > max_dv_files:
            reason = f"dv_debt ({info['dv_files']} vectored files)"
        elif info["n_files"] > 1 and info["avg_file_bytes"] < threshold:
            incremental = bin_pack
            reason = (
                f"fragmentation (avg {info['avg_file_bytes']} B "
                f"< {int(threshold)} B over {info['n_files']} files)"
            )
        if reason is not None:
            new_v = snap.snapshot_compact(
                spark, table_path, target_file_mb=target_file_mb,
                cluster_by=cluster_by,
                only_smaller_than_mb=(
                    small_file_ratio * target_file_mb if incremental
                    else None
                ),
            )
            out.update(
                compacted=new_v != v, reason=reason, version=new_v,
                files_after=len(
                    snap._read_manifest(table_path, new_v)["files"]
                ),
            )
        else:
            out["reason"] = "healthy"
            out["files_after"] = info["n_files"]
        out["analyzed"] = False
        if analyze_stale_after is not None:
            from harmony_energy_data_pipeline_spark.sinks.analyze import (
                snapshot_analyze,
                snapshot_column_stats,
            )

            cs = snapshot_column_stats(table_path)
            cur = snap.latest_version(table_path)
            stale = (
                cs is None
                or cur - cs["computed_at_version"] > analyze_stale_after
            )
            if stale:
                snapshot_analyze(spark, table_path)
                out["analyzed"] = True
        if vacuum_keep is not None or keep_newer_than_s is not None:
            out["vacuum_removed"] = snap.vacuum(
                table_path,
                keep_last=vacuum_keep if vacuum_keep is not None else 1,
                keep_newer_than_s=keep_newer_than_s,
                orphan_grace_s=(
                    stale_after_s if orphan_grace_s is None
                    else orphan_grace_s
                ),
            )
        return out
    finally:
        release_maintenance_lock(table_path, token=token)
