"""Temporal join operators Spark lacks natively: as-of join and
interval (range) join.

As-of join — for each left row, the latest right row with
``right.ts <= left.ts`` per key — is THE time-series join (price
as-of trade, rate as-of reading). Spark has no ASOF JOIN; the naive
rewrite (inequality join + row_number) shuffles |L|·|R| candidate
pairs. This implementation uses the union-window trick instead:

    union(L tagged, R tagged) → one window pass per key ordered by
    (ts, tag) carrying last non-null right payload → filter L rows.

One shuffle, state bounded by one right payload per partition-order
position — the same shape a dedicated ASOF physical operator would
have. DuckDB's native ASOF JOIN is the oracle.

Interval join — left rows matched to right [lo, hi) intervals — comes
in two shapes: broadcast nested-loop for a small interval table (the
common dimension case), and a bucket-decomposed equi-join when both
sides are large (intervals exploded to covering buckets, join on
bucket id, exact refine — turns O(|L|·|R|) into O(|L| + Σ interval
spans) shuffle keys).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    how: str = "left",
) -> DataFrame:
    """Backward as-of join: for every left row, attach the right row
    with the greatest ``right_ts <= left_ts`` within the same ``on``
    key (null-extended when no such row and ``how='left'``;
    ``how='inner'`` drops unmatched left rows).

    Right rows should be unique per (key, ts) — pre-dedup otherwise
    (ties would resolve by partition order, not deterministically).
    """
    if how not in ("left", "inner"):
        raise ValueError("asof_join supports left/inner")
    rcols = [c for c in right.columns if c not in (on, right_ts)]
    r_tagged = right.select(
        F.col(on).alias("__k"),
        F.col(right_ts).alias("__t"),
        F.struct(*[F.col(c) for c in rcols]).alias("__r"),
        F.lit(0).alias("__side"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(f"__l_{c}") for c in left.columns],
    )
    l_tagged = left.select(
        F.col(on).alias("__k"),
        F.col(left_ts).alias("__t"),
        F.lit(None).cast(r_tagged.schema["__r"].dataType).alias("__r"),
        F.lit(1).alias("__side"),
        *[F.col(c).alias(f"__l_{c}") for c in left.columns],
    )
    # right rows sort before left rows at equal ts, so ts-equal matches count
    w = (
        Window.partitionBy("__k")
        .orderBy(F.col("__t").asc(), F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    merged = (
        r_tagged.unionByName(l_tagged)
        .withColumn("__match", F.last("__r", ignorenulls=True).over(w))
        .filter(F.col("__side") == 1)
    )
    out = merged.select(
        *[F.col(f"__l_{c}").alias(c) for c in left.columns],
        *[F.col("__match").getField(c).alias(c) for c in rcols],
    )
    if how == "inner":
        out = out.filter(F.col("__match").isNotNull())
    return out


def interval_join(
    left: DataFrame,
    left_col: str,
    intervals: DataFrame,
    lo_col: str,
    hi_col: str,
) -> DataFrame:
    """Join left rows to intervals with ``lo <= left_col < hi``.

    Small interval table ⇒ broadcast nested loop (each executor scans
    its left partition against the in-memory interval list — no
    shuffle of the left side at all).
    """
    cond = (F.col(left_col) >= F.col(lo_col)) & (F.col(left_col) < F.col(hi_col))
    return left.join(F.broadcast(intervals), on=cond, how="inner")


def bucketed_interval_join(
    left: DataFrame,
    left_col: str,
    intervals: DataFrame,
    lo_col: str,
    hi_col: str,
    bucket_width: float,
) -> DataFrame:
    """Large-large interval join: decompose into an equi-join on a
    coarse bucket grid, then refine exactly.

    Left rows map to one bucket (``floor(x / w)``); each interval
    explodes to every bucket it covers. Shuffle keys are bucket ids —
    pick ``bucket_width`` near the typical interval span so intervals
    explode to O(1) buckets each.
    """
    lb = left.withColumn("__b", F.floor(F.col(left_col) / F.lit(bucket_width)))
    ib = intervals.withColumn(
        "__b",
        F.explode(
            F.sequence(
                F.floor(F.col(lo_col) / F.lit(bucket_width)),
                F.floor((F.col(hi_col) - F.lit(1e-9)) / F.lit(bucket_width)),
            )
        ),
    )
    return (
        lb.join(ib, on="__b")
        .filter((F.col(left_col) >= F.col(lo_col)) & (F.col(left_col) < F.col(hi_col)))
        .drop("__b")
    )


def resample_with_fill(
    df: DataFrame,
    key_col: str,
    time_col: str,
    value_col: str,
    step_seconds: int = 3600,
) -> DataFrame:
    """Gap-filling resample: snap each series to a regular
    ``step_seconds`` grid from its first to its last observation,
    then forward-fill missing buckets with the last seen value — the
    hypertable `time_bucket_gapfill + locf` shape, composed from
    stock operators.

    Per key: aggregate observed buckets (last value per bucket, ties
    by latest ts), build the dense grid with ``sequence`` + explode
    (map-side — the grid never shuffles), left-join observations, and
    ``last(value, ignorenulls)`` over the bucket window for the fill.

    Output: ``(key, bucket, value, is_filled)``.

    Scale shape: two shuffles on the key ((key,bucket) agg, then the
    fill window); the grid explode is generated from the per-key
    min/max — dense in time but proportional to the series' real
    span, never a global calendar cross-join.
    """
    step = F.lit(step_seconds)
    bucket = (F.unix_timestamp(F.col(time_col)) / step).cast("long") * step
    obs = (
        df.select(
            F.col(key_col).alias("key"),
            bucket.alias("__b"),
            F.col(time_col).alias("__ts"),
            F.col(value_col).alias("__v"),
        )
        .withColumn(
            "__rn",
            F.row_number().over(
                Window.partitionBy("key", "__b").orderBy(
                    F.col("__ts").desc(), F.col("__v").desc()
                )
            ),
        )
        .filter(F.col("__rn") == 1)
        .select("key", "__b", "__v")
    )
    span = obs.groupBy("key").agg(
        F.min("__b").alias("__lo"), F.max("__b").alias("__hi")
    )
    grid = span.select(
        "key",
        F.explode(
            F.sequence(F.col("__lo"), F.col("__hi"), F.lit(step_seconds))
        ).alias("__b"),
    )
    fill_w = (
        Window.partitionBy("key")
        .orderBy("__b")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        grid.join(obs, ["key", "__b"], "left")
        .select(
            F.col("key").alias(key_col),
            F.timestamp_seconds("__b").alias("bucket"),
            F.last("__v", ignorenulls=True).over(fill_w).alias(value_col),
            F.col("__v").isNull().alias("is_filled"),
        )
    )


def time_weighted_avg(
    df: DataFrame,
    key_col: str,
    time_col: str,
    value_col: str,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Time-weighted average per key: each observation holds until the
    next one, so the mean weights ``value_i`` by its holding interval —
    the correct average for irregularly-sampled series (plain AVG
    over-weights densely-sampled periods). Keys with a single
    observation have no interval and are omitted.

    Determinism contract: seconds × cents are exact integers; one
    double division at the end (cross-engine bit-exact). Rows sharing
    a timestamp need ``tiebreak_col`` for a defined successor order
    (zero-length intervals contribute nothing, but WHICH value spans
    the following gap depends on the order of ties).

    Output: ``(key, twa, n_intervals, span_seconds)``. One window
    shuffle on the key + the final agg (AQE-coalesced map-side
    partials).
    """
    order = [F.col(time_col).asc()]
    if tiebreak_col is not None:
        order.append(F.col(tiebreak_col).asc())
    w = Window.partitionBy(key_col).orderBy(*order)
    sec = F.unix_timestamp(F.col(time_col))
    cents = F.round(F.col(value_col) * F.lit(100.0)).cast("long")
    stepped = df.select(
        F.col(key_col).alias("key"),
        cents.alias("__c"),
        (F.lead(sec).over(w) - sec).alias("__dt"),
    ).filter(F.col("__dt").isNotNull())
    return (
        stepped.groupBy("key")
        .agg(
            F.sum(F.col("__c") * F.col("__dt")).alias("__num"),
            F.sum("__dt").alias("__den"),
            F.count("*").alias("n_intervals"),
        )
        .filter(F.col("__den") > 0)
        .select(
            F.col("key").alias(key_col),
            (F.col("__num").cast("double") / (F.lit(100.0) * F.col("__den").cast("double"))).alias("twa"),
            "n_intervals",
            F.col("__den").alias("span_seconds"),
        )
    )


def sessionize(
    df: DataFrame,
    key: str = "user_id",
    ts_col: str = "ts",
    gap_seconds: int = 1800,
    tiebreak_col: str | None = None,
    value_col: str | None = None,
) -> DataFrame:
    """Batch sessionization (gaps-and-islands): a key's events whose
    consecutive gaps are ≤ ``gap_seconds`` merge into one session —
    the BATCH counterpart of ``streaming.sessionized_agg``'s
    ``session_window`` (backfills and reprocessing run over the lake
    table, not the stream). Output: one row per session —
    ``(key, session_seq, session_start, session_end, n_events[,
    sum_<value>_cents])`` with ``session_seq`` numbering a key's
    sessions 1.. in time order.

    Scale shape: ONE shuffle + one sort. Both window passes (the
    lag-gap flag and the running session counter) share the same
    ``(partitionBy key, orderBy ts, tiebreak)`` spec, and the final
    per-session groupBy keys on a superset of the window partition
    key, so Catalyst plans a single Exchange (plan-asserted in
    tests). Gaps compare ``unix_micros`` — exact integers, so the
    DuckDB oracle (``epoch_us``) agrees bit-for-bit with no
    float/truncation ambiguity. ``tiebreak_col`` makes simultaneous
    events a total order (required for a deterministic running sum).
    """
    order = [F.col(ts_col).asc()]
    if tiebreak_col is not None:
        order.append(F.col(tiebreak_col).asc())
    w = Window.partitionBy(key).orderBy(*order)
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    gap_us = int(gap_seconds) * 1_000_000
    is_new = (
        F.when(
            F.unix_micros(F.col(ts_col))
            - F.lag(F.unix_micros(F.col(ts_col))).over(w)
            > F.lit(gap_us),
            F.lit(1),
        )
        .otherwise(F.lit(0))  # first event: NULL lag -> 0 (session 1)
        .alias("__new")
    )
    extra = [value_col] if value_col else []
    tb = (
        [tiebreak_col]
        if tiebreak_col is not None and tiebreak_col not in (key, ts_col, value_col)
        else []
    )
    flagged = df.select(key, ts_col, *extra, *tb, is_new)
    sess = flagged.select(
        key, ts_col, *extra,
        (F.sum("__new").over(run) + F.lit(1)).cast("long").alias("session_seq"),
    )
    aggs = [
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
        F.count("*").alias("n_events"),
    ]
    if value_col is not None:
        aggs.append(
            F.sum(F.round(F.col(value_col) * 100).cast("long"))
            .cast("long")
            .alias(f"sum_{value_col}_cents")
        )
    return sess.groupBy(key, "session_seq").agg(*aggs)


__all__ = [
    "asof_join", "interval_join", "bucketed_interval_join", "resample_with_fill",
    "time_weighted_avg", "sessionize",
]
