"""Idempotent key-merge sink and the run-history audit sink.

The reference load stage is a batched SQLite
``INSERT … ON CONFLICT(_id) DO UPDATE SET <all non-PK> = excluded.<col>``
(/root/reference/src/serve/load.py:14-51). The Spark-native semantics
are a MERGE: source wins on key match, full-row overwrite, new keys
inserted. Delta Lake's ``MERGE INTO`` is the first-choice physical
form; this environment is plain parquet, so ``merge_upsert``
implements the same logical merge as

    target ANTI-JOIN source ON key   (surviving old rows)
    UNION ALL source                 (all new/updated rows)

and ``upsert_parquet`` persists it atomically (write temp, swap).
The SQLite 999-bind-variable batching is an artifact of the reference
sink and is intentionally dropped — Spark writes partition-parallel.

Scale notes: the anti-join shuffles both sides by the key unless the
incoming batch is small — which is the common case for incremental
loads — so we broadcast the source side under a size hint. At real
scale this becomes Delta MERGE with file-level pruning on the key
range; the logical plan here is identical.
"""

from __future__ import annotations

import os
import shutil
import uuid
from datetime import datetime, timezone

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from harmony_energy_data_pipeline_spark.schemas import RUN_HISTORY_SCHEMA
from harmony_energy_data_pipeline_spark.sinks.pathnorm import normalizes_paths

# Below this many incoming rows, broadcast the source side of the
# anti-join so the target never shuffles (incremental pages are ≤30k
# rows in the reference; a full target shuffle for that would be the
# classic big-table-small-update mistake at scale).
BROADCAST_SOURCE_MAX_ROWS = 1_000_000


def merge_upsert(
    target: DataFrame,
    source: DataFrame,
    key: str = "_id",
    broadcast_source: bool | None = None,
) -> DataFrame:
    """Logical MERGE, source-wins (load.py:43-46 semantics):
    rows of ``target`` whose key is absent from ``source``, plus all
    of ``source``. Column-complete overwrite — every non-key column of
    a matched row comes from the source (the reference's
    ``excluded.<col>`` map, load.py:30-35).

    Contract: ``source`` must be unique per ``key`` — both source rows
    would survive otherwise. Callers that cannot guarantee it dedup
    first (the pipeline runs two-phase dedup; the streaming sink drops
    in-batch duplicates).
    """
    src = source
    if broadcast_source is None:
        # Auto mode: probe the source size with a bounded count (the
        # limit caps the probe's work) instead of force-broadcasting a
        # possibly huge backfill batch.
        probe = source.select(key).limit(BROADCAST_SOURCE_MAX_ROWS + 1).count()
        broadcast_source = probe <= BROADCAST_SOURCE_MAX_ROWS
    if broadcast_source:
        # Anti-join keys only need the key column; broadcast a pruned
        # single-column frame, not the whole source.
        keys = F.broadcast(source.select(key).distinct())
    else:
        keys = source.select(key).distinct()
    survivors = target.join(keys, on=key, how="left_anti")
    return survivors.unionByName(src)


def apply_changes(
    target: DataFrame,
    changes: DataFrame,
    key: str = "_id",
    op_col: str = "op",
    seq_col: str | None = None,
    delete_op: str = "D",
    broadcast_changes: bool | None = None,
) -> DataFrame:
    """CDC apply — the Delta ``MERGE WHEN MATCHED DELETE`` /
    Debezium-consumer shape ``merge_upsert`` cannot express: a change
    feed carrying inserts/updates AND deletes folds into the target.

    ``changes`` rows with ``op_col == delete_op`` remove the key;
    anything else upserts the row (column-complete, source-wins).
    ``seq_col`` orders multiple changes for the same key (highest
    wins, ties broken by preferring the delete — the deterministic
    choice when a feed replays); without it, changes must be
    key-unique, like ``merge_upsert``'s contract.

    Scale shape: same as ``merge_upsert`` — one anti-join on the key
    set (broadcast when the feed is small, probed the same way) plus a
    union; the per-key latest-change fold is one window over the
    CHANGE FEED only (feeds are deltas — orders of magnitude smaller
    than the table they fold into).
    """
    ch = changes
    if seq_col is not None:
        # Final tiebreak: two NON-delete changes for the same key with
        # equal seq would otherwise tie and row_number would pick one
        # nondeterministically (run-to-run divergence on the same
        # feed). A content hash over every column makes the fold a
        # pure function of the feed's row SET; rows that still tie are
        # byte-identical, so the pick is immaterial.
        w = Window.partitionBy(key).orderBy(
            F.col(seq_col).desc(),
            (F.col(op_col) == delete_op).desc(),
            F.xxhash64(*[F.col(c) for c in changes.columns]).desc(),
        )
        ch = (
            ch.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
        )
    if broadcast_changes is None:
        probe = changes.select(key).limit(BROADCAST_SOURCE_MAX_ROWS + 1).count()
        broadcast_changes = probe <= BROADCAST_SOURCE_MAX_ROWS
    keys = ch.select(key).distinct()
    if broadcast_changes:
        keys = F.broadcast(keys)
    survivors = target.join(keys, on=key, how="left_anti")
    drop_cols = [op_col] + ([seq_col] if seq_col is not None else [])
    upserts = ch.filter(F.col(op_col) != delete_op).drop(*drop_cols)
    return survivors.unionByName(upserts)


@normalizes_paths('path')
def upsert_parquet(
    spark: SparkSession,
    source: DataFrame,
    path: str,
    key: str = "_id",
) -> None:
    """Materialized idempotent upsert into a parquet table at ``path``
    (create-if-absent). Writes to a temp sibling then swaps through
    the marker-protected protocol (``sinks.dirswap``): a crash in the
    swap window rolls FORWARD on the next call instead of leaving the
    table under an unrecorded temp name — a bare two-rename swap
    would make the next upsert recreate the table from only the
    incoming batch (silent total history loss). The moral equivalent
    of the reference's per-batch transaction commit (load.py:47-49).
    """
    from harmony_energy_data_pipeline_spark.sinks.dirswap import (
        recover_dir_swap,
        swap_dir_commit,
    )

    recover_dir_swap(path)
    if not os.path.exists(path):
        source.write.mode("overwrite").parquet(path)
        return
    target = spark.read.parquet(path)
    merged = merge_upsert(target, source, key=key)
    tmp = f"{path}.__tmp_{uuid.uuid4().hex[:8]}"
    merged.write.mode("overwrite").parquet(tmp)
    try:
        swap_dir_commit(path, tmp)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


@normalizes_paths('path')
def upsert_partitioned(
    spark: SparkSession,
    source: DataFrame,
    path: str,
    key: str = "_id",
    ts_col: str = "DATETIME",
    part_col: str = "dt",
) -> None:
    """Partition-local idempotent upsert into a date-partitioned
    parquet table: only the partitions PRESENT IN THE BATCH are read,
    merged, and dynamically overwritten — everything else is untouched.

    This is the 100 TB incremental-load shape: a 30k-row page touching
    two days rewrites two directories, not the decade.
    ``upsert_parquet`` (whole-table swap) remains correct but rewrites
    O(|table|) per merge; this rewrites O(|affected partitions|).
    The same logical plan is what Delta MERGE does with file-level
    pruning.

    Commit is ATOMIC at batch granularity via the staging + marker +
    swap protocol of ``sinks.partitioned`` (the parquet equivalent of
    the reference's per-batch SQLite transaction, load.py:38-49): a
    crash between partition swaps leaves a durable intent marker that
    ``recover_partitions`` / ``read_partitioned_committed`` roll
    forward, so committed readers never observe a half-applied batch.
    """
    from harmony_energy_data_pipeline_spark.sinks.partitioned import (
        overwrite_partitions_atomic,
        recover_partitions,
        with_date_partition,
    )

    src = with_date_partition(source, ts_col, part_col)
    if not os.path.exists(path):
        src.write.mode("overwrite").partitionBy(part_col).parquet(path)
        return
    # writer path: replay any interrupted commit AND sweep crash leftovers
    recover_partitions(path, gc_unmarked=True)
    days = [r[part_col] for r in src.select(part_col).distinct().collect()]
    target = spark.read.parquet(path)
    # partition-pruned read: only the affected days leave disk
    affected = target.filter(F.col(part_col).isin(days))
    merged = merge_upsert(
        affected, src.select(*affected.columns), key=key
    )
    overwrite_partitions_atomic(merged, path, part_col)


# Caveat: partition-local merge assumes a key's partition value is
# stable across revisions (an _id whose DATETIME moves to another day
# would leave its old row behind). Key-moves need the whole-table
# upsert_parquet — or a tombstone pass — exactly as with Delta MERGE
# on a partition-pruned condition.


# ---------------------------------------------------------------------------
# Run-history audit sink (/root/reference/src/serve/run_history.py:11-60)
# ---------------------------------------------------------------------------

def scd2_merge(
    dim: DataFrame,
    updates: DataFrame,
    key_col: str,
    attr_cols: list[str],
    from_col: str = "valid_from",
    to_col: str = "valid_to",
    ts_col: str = "effective_ts",
) -> DataFrame:
    """Type-2 slowly-changing-dimension merge: apply ``updates`` (one
    row per key, attribute values + ``ts_col`` effective time) to a
    versioned ``dim`` (open rows have ``to_col`` IS NULL).

    Per update key:
    - attrs equal the current open row (null-safe) → no-op;
    - attrs differ → close the open row (``to_col`` = effective time)
      and append a new open version (``from_col`` = effective time);
    - key unseen → append a new open version.
    Closed history rows pass through untouched.

    Generalizes the reference's overwrite-upsert (S4,
    `/root/reference/src/serve/load.py:14-51`) to full history
    tracking. One key-shuffle join, reused by every output branch; at
    scale pair it with `upsert_partitioned`'s partition-local rewrite
    (only partitions holding touched keys change).
    """
    closed = dim.filter(F.col(to_col).isNotNull())
    open_rows = dim.filter(F.col(to_col).isNull())
    j = open_rows.alias("o").join(
        updates.alias("u"), F.col(f"o.{key_col}") == F.col(f"u.{key_col}"), "full_outer"
    )
    changed = j.filter(
        F.col(f"o.{key_col}").isNotNull()
        & F.col(f"u.{key_col}").isNotNull()
        & ~_all_equal(attr_cols)
    )
    unchanged_open = j.filter(
        F.col(f"u.{key_col}").isNull() | (
            F.col(f"o.{key_col}").isNotNull() & _all_equal(attr_cols)
        )
    ).select([F.col(f"o.{c}") for c in dim.columns])
    closed_now = changed.select(
        *[F.col(f"o.{c}") for c in [key_col, *attr_cols, from_col]],
        F.col(f"u.{ts_col}").alias(to_col),
    ).select(dim.columns)
    new_versions = (
        j.filter(
            F.col(f"u.{key_col}").isNotNull()
            & (F.col(f"o.{key_col}").isNull() | ~_all_equal(attr_cols))
        )
        .select(
            *[F.col(f"u.{c}") for c in [key_col, *attr_cols]],
            F.col(f"u.{ts_col}").alias(from_col),
            F.lit(None).cast(dim.schema[to_col].dataType).alias(to_col),
        )
        .select(dim.columns)
    )
    return closed.unionByName(unchanged_open).unionByName(closed_now).unionByName(new_versions)


def _all_equal(attr_cols: list[str]):
    """Null-safe conjunction: every tracked attribute matches between
    the open row (``o``) and the update (``u``)."""
    cond = F.lit(True)
    for c in attr_cols:
        cond = cond & F.col(f"o.{c}").eqNullSafe(F.col(f"u.{c}"))
    return cond


def _utcnow() -> datetime:
    return datetime.now(timezone.utc).replace(tzinfo=None)


class RunHistory:
    """Append-only audit table: one row per pipeline run with start /
    stop timestamps, counters, success flag, error message
    (run_history.py:11-60, models.py:48-58).

    ``start()`` appends the open row; ``finish()`` upserts it with the
    final counters (same id — merge_upsert gives the UPDATE half).
    """

    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = os.path.abspath(path)  # cwd-independent audit sink

    def _read(self) -> DataFrame:
        if os.path.exists(self.path):
            return self.spark.read.parquet(self.path)
        return self.spark.createDataFrame([], RUN_HISTORY_SCHEMA)

    def start(self) -> int:
        prev = self._read()
        row = prev.agg(F.max("id").alias("m")).first()
        run_id = int(row["m"] or 0) + 1
        open_row = self.spark.createDataFrame(
            [(run_id, _utcnow(), None, None, 0, 0, False, None)],
            RUN_HISTORY_SCHEMA,
        )
        upsert_parquet(self.spark, open_row, self.path, key="id")
        return run_id

    def finish(
        self,
        run_id: int,
        *,
        last_fetched_id: int | None,
        total_fetched: int,
        valid_records: int,
        success: bool,
        error_message: str | None = None,
    ) -> None:
        start_row = (
            self._read().filter(F.col("id") == run_id).select("run_start").first()
        )
        run_start = start_row["run_start"] if start_row else _utcnow()
        closed = self.spark.createDataFrame(
            [(
                run_id, run_start, _utcnow(), last_fetched_id,
                total_fetched, valid_records, success, error_message,
            )],
            RUN_HISTORY_SCHEMA,
        )
        upsert_parquet(self.spark, closed, self.path, key="id")

    def last_successful(self) -> DataFrame:
        """WHERE success ORDER BY run_stop DESC LIMIT 1
        (/root/reference/src/app/utils/data_loader.py:62-67)."""
        return (
            self._read().filter(F.col("success"))
            .orderBy(F.col("run_stop").desc()).limit(1)
        )
