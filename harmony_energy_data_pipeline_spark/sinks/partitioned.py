"""Partition-layout writers: the physical design that makes the 100 TB
table queryable.

The reference's sink is a single SQLite table (~300k rows,
/root/reference/src/serve/load.py:14-51); at engine scale the
equivalent is a date-partitioned parquet/Delta layout so that
time-range queries (the serve path's dominant predicate,
/root/reference/src/app/utils/helpers.py:49-59) prune whole
directories before any IO happens.
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from harmony_energy_data_pipeline_spark.sinks.pathnorm import normalizes_paths


def with_date_partition(df: DataFrame, ts_col: str, part_col: str = "dt") -> DataFrame:
    """Derive the partition column (calendar date of the event-time).
    Daily granularity is the default sweet spot: ~365 partitions/year,
    each 100s-of-GB at 100 TB/decade scale — big enough for efficient
    files, small enough to prune hard."""
    return df.withColumn(part_col, F.to_date(F.col(ts_col)))


@normalizes_paths('path')
def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    mode: str = "append",
) -> None:
    """Write parquet partitioned by ``partition_cols`` (HIVE layout:
    ``path/dt=2024-01-01/...``). Readers get partition pruning for
    free — a filter on the partition column shows up as
    PartitionFilters in the scan, and non-matching directories are
    never listed."""
    df.write.mode(mode).partitionBy(*partition_cols).parquet(path)


@normalizes_paths('path')
def overwrite_partitions_dynamic(
    spark: SparkSession,
    df: DataFrame,
    path: str,
    partition_cols: list[str],
) -> None:
    """Idempotent partition-level re-write: only the partitions present
    in ``df`` are replaced (dynamic overwrite), everything else is
    untouched — the batch-reprocessing pattern for late/revised data
    at scale (re-run one day, not the decade)."""
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        df.write.mode("overwrite").partitionBy(*partition_cols).parquet(path)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)


# ---------------------------------------------------------------------------
# Atomic multi-partition commit (staging + marker + swap + recovery)
# ---------------------------------------------------------------------------
# Dynamic partition overwrite commits partition directories one at a
# time, so a crash mid-commit leaves a TORN table (day 1 new, day 2
# old) with nothing recording the fact. The reference gets per-batch
# atomicity from SQLite transactions (/root/reference/src/serve/
# load.py:38-49); plain parquet needs an explicit protocol:
#
#   1. write ALL partitions of the batch to `<path>/.staging-<txid>/`
#      (one Spark job; invisible to readers — dot-prefixed dirs are
#      skipped by Spark's file listing);
#   2. durably write the intent marker `_commit-<txid>.json` (tmp +
#      fsync + rename + dir fsync) naming every affected partition;
#   3. swap each partition (old -> .backup-<txid>/, staged -> live);
#   4. remove the marker, then the backup/staging dirs.
#
# A crash anywhere leaves either (no marker) => the staged data is
# garbage-collected and the table is untouched, or (marker present)
# => `recover_partitions` rolls the swap FORWARD deterministically
# (staging is always complete once the marker exists). Readers that
# must never observe a torn table call `read_partitioned_committed`,
# which runs recovery first — the moral equivalent of SQLite's
# journal replay on open. Single-writer assumption, same as the
# reference's SQLite file.

#: Test hook: raise after this many partition swaps (simulates a kill
#: in the torn window). None = disabled.
_CRASH_AFTER_SWAPS: int | None = None


def _write_marker_durable(marker_path: str, payload: dict) -> None:
    tmp = marker_path + ".tmp"
    with open(tmp, "w", encoding="utf-8") as fh:
        json.dump(payload, fh)
        fh.flush()
        os.fsync(fh.fileno())
    os.rename(tmp, marker_path)
    dfd = os.open(os.path.dirname(marker_path), os.O_RDONLY)
    try:
        os.fsync(dfd)
    finally:
        os.close(dfd)


def _swap_one(path: str, staging: str, backup: str, part_dir: str) -> None:
    """Idempotent per-partition swap: safe to re-run from any crash
    point (each state the two renames can crash in is recognized).
    ``part_dir`` may be a nested relative path (multi-level
    partitioning, e.g. ``dt=2024-01-01/hour=3``)."""
    staged = os.path.join(staging, part_dir)
    live = os.path.join(path, part_dir)
    saved = os.path.join(backup, part_dir)
    if not os.path.exists(staged):
        return  # this partition's swap already completed
    if os.path.exists(live):
        os.makedirs(os.path.dirname(saved), exist_ok=True)
        os.rename(live, saved)
    os.makedirs(os.path.dirname(live), exist_ok=True)
    os.rename(staged, live)


def _leaf_partition_dirs(root: str, first_col: str) -> list[str]:
    """Relative paths of the deepest ``col=value`` directories under
    ``root`` (the unit the swap protocol moves)."""
    leaves: list[str] = []
    for dirpath, dirnames, _files in os.walk(root):
        # only descend the partition hierarchy (col=value dirs)
        dirnames[:] = [d for d in dirnames if "=" in d]
        rel = os.path.relpath(dirpath, root)
        if rel != "." and "=" in os.path.basename(dirpath) and not dirnames:
            leaves.append(rel)
    return sorted(p for p in leaves if p.startswith(f"{first_col}="))


@normalizes_paths('path')
def commit_partition_swap(
    path: str, txid: str, partitions: list[str]
) -> None:
    """Steps 2-4 of the protocol: durable marker, per-partition swap
    (honoring the crash-injection hook), marker removal, cleanup."""
    staging = os.path.join(path, f".staging-{txid}")
    backup = os.path.join(path, f".backup-{txid}")
    marker = os.path.join(path, f"_commit-{txid}.json")
    _write_marker_durable(marker, {"txid": txid, "partitions": partitions})
    for n, part_dir in enumerate(partitions):
        if _CRASH_AFTER_SWAPS is not None and n >= _CRASH_AFTER_SWAPS:
            raise RuntimeError("simulated crash between partition swaps")
        _swap_one(path, staging, backup, part_dir)
    os.remove(marker)
    shutil.rmtree(staging, ignore_errors=True)
    shutil.rmtree(backup, ignore_errors=True)


@normalizes_paths('path')
def recover_partitions(path: str, gc_unmarked: bool = False) -> bool:
    """Replay any interrupted commit at ``path``: roll marked swaps
    FORWARD (the staged batch is complete by the time its marker
    exists). With ``gc_unmarked=True`` — WRITER paths only — also
    garbage-collect staging/backup dirs that have no marker.

    Readers must keep the default ``gc_unmarked=False``: an unmarked
    ``.staging-<txid>`` may be a CONCURRENT writer's in-flight Spark
    job (minutes long at scale), not a crash leftover — deleting it
    from a read path would destroy that commit. A pre-marker crash's
    orphan is invisible to readers anyway (dot-prefixed dirs are
    skipped by file listing) and is swept by the next writer.
    Idempotent — a crash during recovery just re-runs it. Returns
    True if anything was repaired."""
    acted = False
    for marker in sorted(glob.glob(os.path.join(path, "_commit-*.json"))):
        with open(marker, encoding="utf-8") as fh:
            info = json.load(fh)
        txid = info["txid"]
        staging = os.path.join(path, f".staging-{txid}")
        backup = os.path.join(path, f".backup-{txid}")
        for part_dir in info["partitions"]:
            _swap_one(path, staging, backup, part_dir)
        os.remove(marker)
        shutil.rmtree(staging, ignore_errors=True)
        shutil.rmtree(backup, ignore_errors=True)
        acted = True
    if gc_unmarked:
        for d in glob.glob(os.path.join(path, ".staging-*")) + glob.glob(
            os.path.join(path, ".backup-*")
        ):
            txid = d.rsplit("-", 1)[-1]
            if not os.path.exists(os.path.join(path, f"_commit-{txid}.json")):
                shutil.rmtree(d, ignore_errors=True)
                acted = True
    return acted


@normalizes_paths('path')
def overwrite_partitions_atomic(
    df: DataFrame,
    path: str,
    part_cols: str | list[str],
) -> None:
    """Replace exactly the partitions present in ``df`` via the
    staging + marker + swap protocol — the atomic counterpart of
    ``overwrite_partitions_dynamic``. Any interrupted earlier commit
    is recovered first (single-writer assumption). Multi-level
    partitioning swaps at the LEAF directory level."""
    cols = [part_cols] if isinstance(part_cols, str) else list(part_cols)
    recover_partitions(path, gc_unmarked=True)  # writer path: GC crash leftovers
    txid = uuid.uuid4().hex[:12]
    staging = os.path.join(path, f".staging-{txid}")
    df.write.mode("overwrite").partitionBy(*cols).parquet(staging)
    partitions = _leaf_partition_dirs(staging, cols[0])
    commit_partition_swap(path, txid, partitions)


@normalizes_paths('path')
def read_partitioned_committed(spark: SparkSession, path: str) -> DataFrame:
    """Read ``path`` with torn-commit protection: replay any
    interrupted swap (roll forward) before listing files — a reader
    can then never observe a half-applied batch.

    Concurrency contract: recovery assumes the marker belongs to a
    CRASHED writer — a reader racing a LIVE writer mid-commit would
    replay the same renames (single-writer, reader-after-crash model;
    the same contract as SQLite journal replay on open). Deployments
    needing readers concurrent with active commits should read
    through ``sinks.snapshots`` instead, whose manifest CAS isolates
    readers from in-flight writers by construction."""
    recover_partitions(path)
    return spark.read.parquet(path)


@normalizes_paths('path')
def compact_partitions(
    spark: SparkSession,
    path: str,
    partition_cols: list[str],
    target_file_mb: int = 128,
) -> None:
    """Rewrite a partitioned table with right-sized files.

    Incremental merges leave many small files per partition (each
    micro-batch writes its own); small files kill scan throughput at
    scale (per-file open cost, tiny row groups, no effective column
    statistics). Repartition to ~``target_file_mb`` outputs per
    partition-value using on-disk size, then dynamically overwrite.
    The real-world cadence: compact daily partitions once the day is
    closed.
    """
    recover_partitions(path, gc_unmarked=True)  # compaction is a writer
    df = spark.read.parquet(path)
    total_bytes = sum(
        os.path.getsize(os.path.join(dirpath, f))
        for dirpath, _dirs, files in os.walk(path)
        for f in files if f.endswith(".parquet")
    )
    n_files = max(1, round(total_bytes / (target_file_mb * 1024 * 1024)))
    n_values = max(1, df.select(*partition_cols).distinct().count())
    # Repartitioning by the partition columns ALONE would hash each
    # partition value into ONE task → one (possibly enormous) file per
    # value, ignoring target_file_mb entirely. A per-row salt bounded
    # by files-per-value spreads each value over ~that many tasks, so
    # partitionBy emits ~right-sized files within every partition dir.
    per_value = max(1, round(n_files / n_values))
    salted = df.withColumn(
        "__salt", F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(per_value))
    )
    compacted = salted.repartition(
        max(n_files, n_values), *partition_cols, "__salt"
    ).drop("__salt")
    # route through the atomic commit: a compaction that dies mid-way
    # must never leave some partitions compacted and others torn
    overwrite_partitions_atomic(compacted, path, partition_cols)


__all__ = [
    "with_date_partition", "write_partitioned",
    "overwrite_partitions_dynamic", "overwrite_partitions_atomic",
    "commit_partition_swap", "recover_partitions",
    "read_partitioned_committed", "compact_partitions",
]
