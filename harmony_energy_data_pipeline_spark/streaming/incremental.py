"""Structured Streaming variant of the incremental pipeline
(SURVEY.md §2.10 T1–T6): the reference's hand-rolled loop — offset
cursor, micro-batches, keep-last dedup, idempotent upsert — expressed
with readStream / foreachBatch.

- Offset tracking (T1): the streaming checkpoint replaces the
  read-max-from-sink cursor.
- Micro-batching (T2): file-source micro-batches replace 30k-row HTTP
  pages.
- Late/duplicate data (T4): watermark + dropDuplicates inside the
  batch, then MERGE semantics into the sink via foreachBatch, which
  also dedups ACROSS batches (the upsert is keyed).
- Idempotency (T5): foreachBatch re-delivery is safe because the sink
  write is a keyed merge, not an append.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from harmony_energy_data_pipeline_spark.sinks.upsert import upsert_parquet


def file_stream(
    spark: SparkSession,
    src_dir: str,
    schema: T.StructType,
    max_files_per_trigger: int = 10,
) -> DataFrame:
    """Incremental file source: new parquet files in ``src_dir`` become
    micro-batches (the streaming analogue of the keyset fetch loop)."""
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(src_dir)
    )


def dedup_with_watermark(
    stream: DataFrame,
    key: str,
    time_col: str,
    watermark: str = "1 hour",
) -> DataFrame:
    """In-stream exact dedup on the key — keep-FIRST re-delivery
    suppression with genuinely bounded state:
    ``dropDuplicatesWithinWatermark`` evicts a key's state once the
    watermark passes it. (Plain ``dropDuplicates([key])`` would track
    every key ever seen FOREVER — the event-time watermark only evicts
    dedup state when the time column is part of the dedup subset.)

    Semantics note: this is re-delivery suppression, not revision
    resolution — the first arrival of a key wins within the watermark
    horizon. For sources that send REVISED rows under the same key,
    feed the merge sink directly (its keyed merge is last-writer-wins
    per batch) instead of deduping upstream.
    """
    return stream.withWatermark(time_col, watermark).dropDuplicatesWithinWatermark(
        [key]
    )


def windowed_mean(
    stream: DataFrame,
    time_col: str,
    value_col: str,
    window: str = "30 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming tumbling-window mean — the downsample operator (A1)
    under event-time semantics with late-data tolerance."""
    return (
        stream.withWatermark(time_col, watermark)
        .groupBy(F.window(F.col(time_col), window).alias("__w"))
        .agg(F.avg(value_col).alias(f"avg_{value_col}"))
        .select(F.col("__w.start").alias(time_col), F.col(f"avg_{value_col}"))
    )


def enrich_with_static(
    stream: DataFrame,
    dim: DataFrame,
    on: str,
    how: str = "left",
) -> DataFrame:
    """Stream-static join: enrich each micro-batch with a dimension
    table; the small side arrives as a broadcast and no streaming
    state is kept for this join.

    Refresh caveat: for PLAIN-PARQUET static sides the file listing is
    resolved once at DataFrame construction, so an in-place refresh of
    the dim directory is NOT picked up (and a swap that deletes the
    old files fails the next micro-batch). Table formats with
    per-batch snapshot resolution (Delta) refresh transparently; for
    parquet, rebuild the dim DataFrame inside a ``foreachBatch``
    callback when live refresh is required."""
    return stream.join(F.broadcast(dim), on, how)


def interval_join_streams(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_time: str,
    right_time: str,
    lower: str = "interval 0 seconds",
    upper: str = "interval 10 minutes",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Watermarked stream-stream inner join: match right-side events
    that occur within [lower, upper] AFTER the left event on the same
    key. Both sides carry watermarks, and the time-bound predicate is
    what lets Spark expire join state — without it state grows
    forever. (Stream-stream joins need `right_time` and `left_time`
    as distinct column names.)"""
    lw = left.withWatermark(left_time, watermark)
    rw = right.withWatermark(right_time, watermark)
    cond = (
        (lw[key] == rw[key])
        & (F.col(right_time) >= F.col(left_time) + F.expr(lower))
        & (F.col(right_time) <= F.col(left_time) + F.expr(upper))
    )
    return lw.join(rw, cond, "inner").drop(rw[key])


def sessionized_agg(
    stream: DataFrame,
    key: str,
    time_col: str,
    value_col: str,
    gap: str = "30 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """Session-window aggregation: events for a key within ``gap`` of
    each other merge into one session. Native ``session_window`` —
    Spark manages the merging state; the watermark bounds it."""
    return (
        stream.withWatermark(time_col, watermark)
        .groupBy(F.col(key), F.session_window(F.col(time_col), gap).alias("__s"))
        .agg(
            F.count("*").alias("n_events"),
            F.sum(value_col).alias(f"sum_{value_col}"),
        )
        .select(
            key,
            F.col("__s.start").alias("session_start"),
            F.col("__s.end").alias("session_end"),
            "n_events",
            f"sum_{value_col}",
        )
    )


def stateful_running_total(
    stream: DataFrame,
    key: str,
    value_col: str,
) -> DataFrame:
    """Custom stateful operator via ``applyInPandasWithState``: a
    per-key running (count, sum) that survives across micro-batches —
    the pattern for stateful logic Spark's built-in aggregations can't
    express (the built-ins COULD do this particular fold; it's the
    canonical demo of the arbitrary-state API).

    State is one (count, sum) pair per key — O(|keys|) store, each
    micro-batch touches only the keys it contains.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = T.StructType([
        T.StructField(key, stream.schema[key].dataType),  # match the input key type
        T.StructField("n_events", T.LongType()),
        T.StructField("total", T.DoubleType()),
    ])
    state_schema = T.StructType([
        T.StructField("n", T.LongType()),
        T.StructField("s", T.DoubleType()),
    ])

    def update(key_tuple, pdfs, state: GroupState):
        n, s = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            s += float(pdf[value_col].sum())
        state.update((n, s))
        yield pd.DataFrame({key: [key_tuple[0]], "n_events": [n], "total": [s]})

    return (
        stream.groupBy(key)
        .applyInPandasWithState(
            update, out_schema, state_schema, "update", GroupStateTimeout.NoTimeout
        )
    )


def streaming_first_seen(
    stream: DataFrame,
    key: str,
    ts_col: str = "ts",
    ttl_ms: int | None = None,
) -> DataFrame:
    """Streaming FIRST-OCCURRENCE filter: emit one row per key the
    first micro-batch that key appears in — ``(key, first_ts,
    n_in_batch)`` with ``first_ts`` the min event time among that
    batch's rows — and drop every later occurrence. This is exact
    streaming dedup with an explicit state-retention dial: ``ttl_ms``
    evicts a key's seen-marker after that much processing-time
    silence, bounding the state (the watermark-free alternative to
    ``dropDuplicates``, whose state either grows forever or needs an
    event-time watermark).

    Implementation: ``applyInPandasWithState`` with a one-boolean
    state per key and a processing-time timeout as the TTL. (Spark
    4's ``transformWithStateInPandas`` expresses the same operator
    with native per-state TTL, but its state-server protocol needs
    ``protobuf``, which this environment cannot assume; the GroupState
    API is dependency-free.) At 100 TB the seen-set lives in the
    state store, partitioned by the grouping key like any keyed
    state.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    key_dt = stream.schema[key].dataType
    ts_dt = stream.schema[ts_col].dataType
    out_schema = T.StructType([
        T.StructField(key, key_dt),
        T.StructField("first_ts", ts_dt),
        T.StructField("n_in_batch", T.LongType()),
    ])
    state_schema = T.StructType([T.StructField("seen", T.BooleanType())])
    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if ttl_ms is not None
        else GroupStateTimeout.NoTimeout
    )

    def first_seen(key_tuple, pdfs, state: GroupState):
        if state.hasTimedOut:
            state.remove()  # TTL eviction: the key may re-emit later
            return
        already = state.exists
        if not already:
            first_ts, n = None, 0
            for pdf in pdfs:
                n += len(pdf)
                if len(pdf):
                    batch_min = pdf[ts_col].min()
                    first_ts = (
                        batch_min if first_ts is None else min(first_ts, batch_min)
                    )
            yield pd.DataFrame(
                {key: [key_tuple[0]], "first_ts": [first_ts], "n_in_batch": [n]}
            )
        state.update((True,))
        if ttl_ms is not None:
            state.setTimeoutDuration(ttl_ms)

    return stream.groupBy(key).applyInPandasWithState(
        first_seen, out_schema, state_schema, "update", timeout
    )


def start_merge_sink(
    stream: DataFrame,
    spark: SparkSession,
    table_path: str,
    checkpoint_dir: str,
    key: str = "_id",
    available_now: bool = True,
):
    """writeStream → foreachBatch keyed merge into the parquet table:
    exactly-once-ish upsert semantics (re-delivered batches are
    idempotent because the merge is keyed)."""

    def merge_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        # merge_upsert requires key-unique sources; a micro-batch can
        # legitimately carry the same key twice (e.g. rapid revisions),
        # and batches are unordered, so any-row-wins is the honest
        # Spark semantic for the in-batch collision
        upsert_parquet(spark, batch_df.dropDuplicates([key]), table_path, key=key)

    writer = (
        stream.writeStream.foreachBatch(merge_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def start_snapshot_append_sink(
    stream: DataFrame,
    table_path: str,
    checkpoint_dir: str,
    available_now: bool = True,
    compact_every: int | None = None,
    vacuum_keep: int | None = None,
    stats_cols: list[str] | None = None,
):
    """writeStream → foreachBatch APPEND commits into an MVCC snapshot
    table (``sinks.snapshots``): every micro-batch becomes one
    versioned append whose manifest records the stream batch id, so

    - **exactly-once across restarts**: Structured Streaming replays
      the last in-flight batch after a crash; the sink consults the
      already-committed commit ids and skips re-delivered batches —
      the replayed data never lands twice (same T5 contract as the
      keyed merge sink, achieved by commit-log dedup instead of key
      dedup, so it also covers APPEND-ONLY streams with no natural
      key);
    - **query-scoped commit ids**: the marker is
      ``<md5(checkpoint_dir)>:<batch_id>`` — stable across restarts of
      the SAME query (same checkpoint), distinct for a different query
      writing the same table (whose batch ids also start at 0) and for
      a deliberate fresh-checkpoint reprocess, so neither silently
      loses batches to another query's markers;
    - **downstream incremental consumers** read each commit exactly
      once via ``read_snapshot_changes`` — streaming ingest and CDC
      hand-off through one table;
    - readers stay snapshot-isolated while the stream commits.

    The committed-id set is loaded from the manifests ONCE at sink
    start and maintained in memory after (this sink is the only writer
    for its query id), so the per-batch check is O(1), not a
    re-parse of every manifest per micro-batch.

    INLINE MAINTENANCE (round 4, opt-in): a long-running append
    stream accrues one small file set per micro-batch — unbounded
    file-count growth is the classic streaming-lake failure mode.
    ``compact_every=N`` runs ``snapshot_compact`` after every N of
    this sink's commits and ``vacuum_keep=K`` expires all but the
    last K versions after each maintenance pass, both inline on the
    single writer thread (no second writer racing the log; commit
    markers survive vacuum via the compacted commit log). Round 7:
    compaction commits carry the ``compacted_from`` marker, which
    ``read_snapshot_changes``, the change feed, IVM, and the
    snapshot-table streaming source all recognize as row-preserving —
    incremental consumers fold straight across inline maintenance
    instead of falling back to a full re-read.
    """
    import hashlib as _hashlib

    from harmony_energy_data_pipeline_spark.sinks import snapshots as snap

    query_tag = _hashlib.md5(checkpoint_dir.encode()).hexdigest()[:12]
    committed = snap.committed_marker_values(table_path, "stream_commit_id")
    n_committed = 0

    def commit_batch(batch_df: DataFrame, batch_id: int) -> None:
        nonlocal n_committed
        if batch_df.isEmpty():
            return
        commit_id = f"{query_tag}:{batch_id}"
        if commit_id in committed:
            return  # re-delivered after restart: already durably committed
        # stats_cols: zone maps per micro-batch file (footer read over
        # this batch's files only) — a streamed event table stays
        # time-prunable for read_snapshot(where=...) consumers, and
        # compaction recomputes the maps for the rewritten files.
        snap.snapshot_write(
            batch_df, table_path, mode="append",
            extra={"stream_commit_id": commit_id, "stream_batch_id": batch_id},
            stats_cols=stats_cols,
        )
        committed.add(commit_id)
        n_committed += 1
        if compact_every and n_committed % compact_every == 0:
            snap.snapshot_compact(batch_df.sparkSession, table_path)
            if vacuum_keep:
                snap.vacuum(table_path, keep_last=vacuum_keep)

    writer = (
        stream.writeStream.foreachBatch(commit_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def start_snapshot_upsert_sink(
    stream: DataFrame,
    table_path: str,
    checkpoint_dir: str,
    key: str,
    available_now: bool = True,
    member_cols: list[str] | None = None,
    member_bits: int = 1 << 19,
    member_hashes: int = 5,
    record_cdf: bool = False,
):
    """writeStream → foreachBatch KEYED MERGE into an MVCC snapshot
    table — the Delta "foreachBatch MERGE" pattern as a first-class
    sink, for UPDATE-mode streaming aggregations (windowed rollups,
    sessionization, running state) whose micro-batches re-emit
    changed keys: each batch upserts via :func:`snapshot_merge_into`,
    replacing the table's rows for the batch's keys and inserting new
    ones, so the table always holds the CURRENT aggregate per key —
    where the append sink would accumulate every intermediate value.

    Exactly-once across restarts comes from two layers: the
    query-scoped commit-id marker skips batches already durably
    committed (same contract as the append sink), and a keyed merge
    is naturally idempotent anyway — re-merging the same batch
    rewrites the same keys to the same rows, so even a marker loss
    degrades to a harmless no-op rewrite, never duplication.

    ``member_cols=[key]`` (pass explicitly) keeps the merge SURGICAL:
    each commit records key-membership sketches for its files, so the
    next batch's merge rewrites only the files its keys hash into —
    the property that keeps per-micro-batch merges viable on a
    100k-file table. The first batch creates the table (overwrite).
    ``record_cdf=True`` makes every merge commit row-level
    expressible, so downstream IVM / change-feed streams follow the
    upserts incrementally."""
    import hashlib as _hashlib

    from harmony_energy_data_pipeline_spark.sinks import snapshots as snap

    query_tag = _hashlib.md5(checkpoint_dir.encode()).hexdigest()[:12]
    committed = snap.committed_marker_values(table_path, "stream_commit_id")

    def merge_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        commit_id = f"{query_tag}:{batch_id}"
        if commit_id in committed:
            return  # re-delivered after restart: already committed
        # a micro-batch can carry a key twice (unordered revisions);
        # merge requires key-unique sources — any-row-wins in-batch
        batch = batch_df.dropDuplicates([key])
        if snap.latest_version(table_path) is None:
            snap.snapshot_write(
                batch, table_path, mode="overwrite",
                extra={"stream_commit_id": commit_id,
                       "stream_batch_id": batch_id},
                member_cols=member_cols, member_bits=member_bits,
                member_hashes=member_hashes,
            )
        else:
            snap.snapshot_merge_into(
                batch.sparkSession, table_path, batch, key=key,
                record_cdf=record_cdf,
                extra={"stream_commit_id": commit_id,
                       "stream_batch_id": batch_id},
            )
        committed.add(commit_id)

    writer = (
        stream.writeStream.foreachBatch(merge_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
