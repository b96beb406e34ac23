"""Shared machinery for iterative (Pregel-shaped) operators.

PageRank (``operators.graph``) and min-label propagation
(``operators.dedup.connected_components``) both loop over a
join+aggregate round. Two failure modes matter at cluster scale:

* **Lineage growth** — after N rounds the logical plan nests N
  joins; optimizer time grows with it and AQE re-plans the whole
  history each round. Fix: truncate lineage every ``k`` rounds.
* **Fault tolerance** — ``localCheckpoint`` stores blocks only on
  executors and DROPS lineage, so losing one executor after round k
  kills the job (the truncated lineage cannot recompute). Fix:
  *reliable* ``checkpoint()`` to the checkpoint directory (HDFS/S3
  on a cluster, a temp dir on local mode) — executor loss then
  recovers by re-reading the checkpoint files.

Between reliable checkpoints, rounds either stay lazy (fixed
iteration counts: the whole window compiles into one job) or are
``persist()``-ed (convergence-probed loops that must materialize
each round anyway); ``persist`` keeps lineage, so it is
executor-loss-safe — blocks are recomputed from the last reliable
checkpoint or the source scan.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession

#: Reliable-checkpoint cadence for iterative operators: high enough
#: that short loops (PageRank n_iter=3, near-dup CC which converges
#: in 2-4 rounds) never pay a checkpoint write, low enough that long
#: loops keep plans shallow and recovery windows bounded.
DEFAULT_CHECKPOINT_EVERY = 5


def ensure_checkpoint_dir(spark: SparkSession) -> str:
    """Make sure ``sc.checkpointDir`` is set, defaulting to a fresh
    temp directory (local mode). On a real cluster the deployment
    should call ``sc.setCheckpointDir`` with an HDFS/S3 path before
    any iterative operator runs; this fallback keeps local runs and
    tests zero-config."""
    sc = spark.sparkContext
    current = sc.getCheckpointDir()
    if current is None:
        current = tempfile.mkdtemp(prefix="spark_graft_ckpt_")
        sc.setCheckpointDir(current)
    return current


def truncate_every(
    df: DataFrame,
    round_index: int,
    n_rounds: int | None = None,
    every: int = DEFAULT_CHECKPOINT_EVERY,
) -> DataFrame:
    """Reliably checkpoint ``df`` when round ``round_index`` (0-based)
    closes a ``every``-round window — and never on the final round of
    a fixed-length loop (the caller's terminal action materializes it
    anyway, so a checkpoint write there is pure overhead)."""
    is_boundary = (round_index + 1) % every == 0
    is_last = n_rounds is not None and round_index + 1 >= n_rounds
    if is_boundary and not is_last:
        return df.checkpoint(eager=True)
    return df
