"""Sampling operators for training-data pipelines: deterministic
hash-based splits and stratified samples.

A train/test split at 100 TB must be (a) reproducible across runs and
engines, (b) stable under re-partitioning and incremental appends —
``rand()``-based splits are neither. The split here hashes the row KEY
(md5 prefix vs a threshold), so a document keeps its assignment
forever, new data distributes proportionally, and the exact same rule
is expressible in any engine (it is this repo's DuckDB oracle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def split_bucket(key_col: str | F.Column, n_buckets: int = 10_000) -> F.Column:
    """Deterministic bucket in [0, n_buckets) from the md5 of the key.

    Uses the first 8 hex chars (32 bits) — uniform, engine-portable
    (``conv(substr(md5(x),1,8),16,10) % n``)."""
    c = F.col(key_col) if isinstance(key_col, str) else key_col
    return (
        F.conv(F.substring(F.md5(c.cast("string")), 1, 8), 16, 10)
        .cast("long") % F.lit(n_buckets)
    )


def deterministic_split(
    df: DataFrame,
    key: str,
    train_frac: float = 0.8,
    n_buckets: int = 10_000,
) -> DataFrame:
    """Adds a ``split`` column ('train' | 'test') keyed on the row id.
    Same key ⇒ same split in every run, engine, and data epoch."""
    threshold = int(train_frac * n_buckets)
    return df.withColumn(
        "split",
        F.when(split_bucket(key, n_buckets) < threshold, F.lit("train"))
        .otherwise(F.lit("test")),
    )


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    fractions: dict,
    seed: int = 42,
) -> DataFrame:
    """Per-stratum Bernoulli sample (``sampleBy``): cap over-represented
    strata (the classic language/source rebalance before training).
    Seeded, but partition-order dependent — for run-stable sampling use
    ``deterministic_split``-style bucket predicates per stratum."""
    return df.sampleBy(strata_col, fractions, seed)


def deterministic_stratified_cap(
    df: DataFrame,
    key: str,
    strata_col: str,
    fractions: dict,
    n_buckets: int = 10_000,
) -> DataFrame:
    """Run-stable stratified downsample: keep a row iff its key bucket
    falls under its stratum's fraction. Same guarantees as
    ``deterministic_split`` — reproducible, append-stable, oracle-able."""
    bucket = split_bucket(key, n_buckets)
    keep = F.lit(False)
    for stratum, frac in fractions.items():
        keep = keep | (
            (F.col(strata_col) == F.lit(stratum)) & (bucket < int(frac * n_buckets))
        )
    return df.filter(keep)


def weighted_sample(
    df: DataFrame,
    key: str,
    weight_col: str | F.Column,
    k: int,
    group_col: str | None = None,
    salt: str = "aes",
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement (Efraimidis–
    Spirakis A-ES, Inf. Process. Lett. 97(5), 2006): each row gets
    priority ``u^(1/w)`` with ``u`` a deterministic uniform derived
    from ``md5(salt:key)``; the top-k priorities per group are the
    sample. P(row in sample) rises with weight, the draw is exact
    A-ES, and — because ``u`` comes from the key, not ``rand()`` — the
    same rows are chosen on every run, partition layout, and engine.

    Ranking happens in log-space (``ln(u)/w``, monotone in the
    priority) to avoid underflow for large weights. Ties (impossible
    for distinct keys) break by key.

    Scale shape: one window top-k per group — a single shuffle on the
    group key; no collect, no iteration. With no group, a global
    top-k plans as TakeOrderedAndProject (no full sort).

    Precondition: weights must be > 0 (A-ES is undefined otherwise).
    Rows with NULL or non-positive weight are DROPPED before ranking —
    silently keeping them would be worse: w == 0 makes the priority
    -Infinity (never sampled but still ranked) and w < 0 INVERTS the
    order so the least-weighted rows win.
    """
    wcol = F.col(weight_col) if isinstance(weight_col, str) else weight_col
    df = df.filter(wcol > 0)
    # 60-bit md5 prefix -> uniform in (0,1); +0.5 keeps u strictly >0
    hex60 = F.conv(
        F.substring(F.md5(F.concat_ws(":", F.lit(salt), F.col(key).cast("string"))), 1, 15),
        16, 10,
    ).cast("double")
    u = (hex60 + F.lit(0.5)) / F.lit(float(1 << 60))
    rank_key = F.log(u) / wcol.cast("double")
    if group_col is None:
        # global top-k as sort+limit: plans TakeOrderedAndProject
        # (per-partition heaps, no single-partition window funnel)
        return (
            df.withColumn("__rk", rank_key)
            .orderBy(F.col("__rk").desc(), F.col(key).asc())
            .limit(k)
            .drop("__rk")
        )
    w = Window.partitionBy(group_col).orderBy(
        F.col("__rk").desc(), F.col(key).asc()
    )
    return (
        df.withColumn("__rk", rank_key)
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rk", "__rn")
    )


def pack_sequences(
    df: DataFrame,
    id_col: str,
    count_col: str,
    budget: int,
    n_shards: int = 4,
) -> DataFrame:
    """Greedy token-budget sequence packing — the training-batch prep
    step: within each shard (``id % n_shards``), walk documents in id
    order and append each to the current sequence unless it would
    exceed ``budget`` tokens, in which case a new sequence starts
    (oversized documents get a sequence of their own).

    Output: ``(shard, id, seq_id, tok_offset, n_tokens)`` —
    ``tok_offset`` is the document's token start inside its sequence.

    Scale shape: greedy packing is a sequential recurrence, so it
    cannot be a window expression; it IS embarrassingly parallel
    across shards, which is exactly ``applyInPandas`` over the shard
    key — one shuffle, then a linear pass per shard. Shard count is
    the parallelism dial (a real corpus uses thousands).
    """
    import pandas as pd

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(id_col, kind="mergesort").reset_index(drop=True)
        seqs, offs = [], []
        seq, fill = 0, 0
        first = True
        for tk in pdf[count_col].astype("int64"):
            tk = int(tk)
            if not first and fill + tk > budget:
                seq, fill = seq + 1, 0
            seqs.append(seq)
            offs.append(fill)
            fill += tk
            first = False
        out = pd.DataFrame({
            "shard": pdf["shard"],
            id_col: pdf[id_col],
            "seq_id": pd.array(seqs, dtype="int64"),
            "tok_offset": pd.array(offs, dtype="int64"),
            "n_tokens": pdf[count_col].astype("int64"),
        })
        return out

    schema = f"shard long, {id_col} long, seq_id long, tok_offset long, n_tokens long"
    with_shard = df.select(
        (F.col(id_col) % n_shards).alias("shard"), F.col(id_col), F.col(count_col)
    )
    return with_shard.groupBy("shard").applyInPandas(pack, schema)


def temperature_mixture(
    df: DataFrame,
    key: str,
    domain_col: str,
    target_rows: int,
    n_buckets: int = 10_000,
) -> DataFrame:
    """Temperature-weighted domain mixture (the multilingual-corpus
    rebalance: sampling weight ∝ n_d^α with α = 0.5, the T5/mT5
    temperature): downsample each domain so the expected output is
    ``target_rows`` rows distributed ∝ √n_d, which up-weights small
    domains relative to their natural share.

    Exactness: the keep predicate is pure integer arithmetic on both
    engines — √n_d is quantized to ``round(√n_d · 10⁶)`` (IEEE sqrt is
    correctly rounded, so Spark and any SQL engine agree bit-for-bit),
    and the per-row test is the cross-multiplied form

        bucket(key) · S · n_d  <  n_buckets · target · sq_d,

    (S = Σ sq_d) evaluated in DECIMAL(38,0) — no float, no division,
    so the same row is kept everywhere, forever. Domains whose target
    exceeds their size keep every row (the inequality saturates).

    Scale shape: one tiny domain-count aggregate, a one-row grand
    total, and a broadcast join back onto the corpus — the corpus
    itself is never shuffled.
    """
    d38 = "decimal(38,0)"
    counts = df.groupBy(domain_col).agg(F.count("*").alias("__n"))
    sq = counts.withColumn(
        "__sq", F.round(F.sqrt(F.col("__n")) * F.lit(1_000_000.0)).cast("long")
    )
    # grand total as an unpartitioned window over the (tiny) domain
    # table — NOT a separate aggregate, which would re-scan the corpus
    # for a second count; the single-partition exchange moves only
    # #domains rows
    from pyspark.sql import Window

    dims = sq.withColumn("__S", F.sum("__sq").over(Window.partitionBy()))
    lhs = (
        split_bucket(key, n_buckets).cast(d38)
        * F.col("__S").cast(d38)
        * F.col("__n").cast(d38)
    )
    rhs = (
        F.lit(n_buckets).cast(d38)
        * F.lit(target_rows).cast(d38)
        * F.col("__sq").cast(d38)
    )
    return (
        df.join(F.broadcast(dims), domain_col)
        .filter(lhs < rhs)
        .drop("__n", "__sq", "__S")
    )


def epoch_shuffle_key(key_col: str | F.Column, epoch: int) -> F.Column:
    """Deterministic per-epoch training order: the md5 of
    ``key || '#e' || epoch``. Hex strings sort like the underlying
    128-bit value, the order is uniform-random in aggregate yet fully
    reproducible, and every engine computes the identical key — the
    standard trick for a reshuffled-every-epoch corpus without any
    stored permutation."""
    c = F.col(key_col) if isinstance(key_col, str) else key_col
    return F.md5(F.concat(c.cast("string"), F.lit(f"#e{epoch}")))


def shuffled_write(
    df: DataFrame,
    key: str,
    epoch: int,
    path: str,
    num_files: int | None = None,
) -> None:
    """Write the corpus in epoch-``epoch`` training order: rows are
    range-partitioned on the epoch shuffle key (sampled boundaries →
    balanced files) and sorted within each file, so reading files in
    name order replays one global deterministic shuffle — no global
    sort, no driver-side permutation, one range exchange total."""
    keyed = df.withColumn("__sk", epoch_shuffle_key(key, epoch))
    parted = (
        keyed.repartitionByRange(num_files, "__sk")
        if num_files
        else keyed.repartitionByRange("__sk")
    )
    parted.sortWithinPartitions("__sk").drop("__sk").write.mode(
        "overwrite"
    ).parquet(path)


__all__ = [
    "split_bucket", "deterministic_split", "stratified_sample",
    "deterministic_stratified_cap", "pack_sequences",
    "temperature_mixture", "epoch_shuffle_key", "shuffled_write",
]
