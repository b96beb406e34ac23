"""Serve-path analytics: temporal downsampling, date-range filter,
wide→long unpivot, derived columns, top-k / bounds probes.

Mirrors /root/reference/src/app/utils/helpers.py and
src/app/components/charts.py, re-expressed as Catalyst plans.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Reference interval grid (conf/config.json:11). Fixed-length intervals
# go through F.window (tumbling); calendar intervals (month/year) have
# no fixed length so they go through date_trunc — two code paths, both
# oracle-checked (SURVEY.md §7.3 #2).
FIXED_INTERVALS: dict[str, str] = {
    "30m": "30 minutes",
    "1h": "1 hour",
    "1d": "1 day",
}
# "1w" is CALENDAR, not fixed: F.window's tumbling origin is the epoch
# (1970-01-01, a THURSDAY), so a 1-week tumbling window would bucket
# Thu->Thu — Polars group_by_dynamic and date_trunc('week') both use
# Monday-started calendar weeks, so weekly goes through date_trunc.
CALENDAR_INTERVALS: dict[str, str] = {
    "1w": "week",
    "1mo": "month",
    "1y": "year",
}


def downsample(
    df: DataFrame,
    interval: str,
    time_col: str = "DATETIME",
    agg_cols: list[str] | None = None,
) -> DataFrame:
    """Temporal downsample: bin rows into ``interval`` buckets keyed by
    bucket start, averaging every numeric column
    (/root/reference/src/app/utils/helpers.py:31-46,
    group_by_dynamic + mean + sort).

    One hash-shuffle on the bucket key with map-side partial
    aggregation — the canonical Spark agg shape; at 100 TB a
    date-partitioned table makes this near-partition-local.
    """
    if agg_cols is None:
        agg_cols = [
            f.name for f in df.schema.fields
            if f.name != time_col and isinstance(
                f.dataType, (T.DoubleType, T.FloatType, T.LongType, T.IntegerType))
        ]
    aggs = [F.avg(c).alias(c) for c in agg_cols]
    if interval in FIXED_INTERVALS:
        bucketed = df.groupBy(
            F.window(F.col(time_col), FIXED_INTERVALS[interval]).alias("__w")
        ).agg(*aggs)
        out = bucketed.select(
            F.col("__w.start").alias(time_col), *[F.col(c) for c in agg_cols]
        )
    elif interval in CALENDAR_INTERVALS:
        unit = CALENDAR_INTERVALS[interval]
        out = (
            df.groupBy(F.date_trunc(unit, F.col(time_col)).alias(time_col))
            .agg(*aggs)
        )
    else:
        raise ValueError(
            f"unsupported interval {interval!r}; "
            f"known: {sorted(FIXED_INTERVALS) + sorted(CALENDAR_INTERVALS)}"
        )
    return out.orderBy(time_col)


def filter_range(
    df: DataFrame,
    time_col: str,
    start,
    end,
) -> DataFrame:
    """Inclusive-both-ends date-range filter
    (/root/reference/src/app/utils/helpers.py:49-59). Pushed down to
    the parquet scan by Catalyst (shows in PushedFilters)."""
    return df.filter(F.col(time_col).between(F.lit(start), F.lit(end)))


def unpivot_long(
    df: DataFrame,
    ids: list[str],
    values: list[str],
    var_name: str = "Fuel",
    value_name: str = "value",
) -> DataFrame:
    """Wide→long melt (/root/reference/src/app/components/charts.py:23,56-58).

    Spark's native ``unpivot`` keeps null values only with
    ``df.unpivot``'s default when values list is explicit — reference
    (Polars unpivot) KEEPS nulls, so null rows must survive; verified
    in tests against INCLUDE NULLS oracle semantics.
    """
    return df.unpivot(
        ids=[F.col(c) for c in ids],
        values=[F.col(c) for c in values],
        variableColumnName=var_name,
        valueColumnName=value_name,
    )


def pivot_wide(
    df: DataFrame,
    group_col: str,
    pivot_col: str,
    values: list[str],
    measure: Column,
    agg=F.sum,
) -> DataFrame:
    """Long→wide pivot (inverse of :func:`unpivot_long`) as a single-shuffle
    conditional aggregation.

    Stock ``groupBy().pivot()`` plans TWO exchanges — one on
    ``(group, pivot)`` for the inner aggregate and one on ``group`` for
    the ``pivotfirst`` collapse. With an explicit ``values`` list the
    equivalent ``agg(CASE WHEN pivot = v THEN measure END)`` form needs
    only the ``group`` shuffle, with map-side partial aggregation — half
    the shuffle volume at scale. Rows whose ``pivot_col`` is outside
    ``values`` are ignored, matching explicit-values ``pivot()``.
    """
    return df.groupBy(group_col).agg(
        *[
            agg(F.when(F.col(pivot_col) == v, measure)).alias(v)
            for v in values
        ]
    )


def derived_carbon(
    df: DataFrame,
    time_col: str = "DATETIME",
    generation_col: str = "GENERATION",
    zero_carbon_col: str = "ZERO_CARBON",
) -> DataFrame:
    """CARBON = GENERATION − ZERO_CARBON projection
    (/root/reference/src/app/components/charts.py:91)."""
    return df.select(
        F.col(time_col),
        F.col(zero_carbon_col),
        (F.col(generation_col) - F.col(zero_carbon_col)).alias("CARBON"),
    )


def top_k(df: DataFrame, order_cols: list[Column], k: int) -> DataFrame:
    """ORDER BY … LIMIT k (/root/reference/src/app/utils/data_loader.py:62-67,
    src/pipeline/run.py:20). Spark plans TakeOrderedAndProject — a
    distributed top-k (per-partition heap + driver merge), never a
    global sort."""
    return df.orderBy(*order_cols).limit(k)


def bounds(df: DataFrame, col: str) -> DataFrame:
    """min/max probe (/root/reference/src/app/components/selectors.py:13-14).
    Partial-aggregated: one scalar per partition to the driver."""
    return df.agg(F.min(col).alias(f"min_{col}"), F.max(col).alias(f"max_{col}"))


def max_version(df: DataFrame, col: str = "_id"):
    """Scalar max — the resume-cursor / cache-version probe
    (/root/reference/src/pipeline/run.py:19-21,
    src/app/utils/data_loader.py:33). Returns a Python scalar."""
    row = df.agg(F.max(col).alias("v")).first()
    return row["v"] if row else None


__all__ = [
    "FIXED_INTERVALS", "CALENDAR_INTERVALS", "downsample", "filter_range",
    "unpivot_long", "derived_carbon", "top_k", "bounds", "max_version",
    "grouped_trend", "kmv_distinct", "histogram", "cms_estimates",
]


def grouped_trend(
    df: DataFrame,
    key: str,
    time_col: str,
    value_col: str,
    method: str = "expr",
) -> DataFrame:
    """Per-key OLS trend fit (slope per hour, intercept, n).

    ``method="expr"`` (default; round 6): OLS is fully expressible
    over SUFFICIENT STATISTICS — one groupBy computing exact-integer
    (n, min x, Σx, Σy, Σxy, Σx²) in DECIMAL(38,0), then the closed
    form on min-centered stats derived algebraically
    (Σ(x−x₀)y = Σxy − x₀Σy, etc. — exact integer identities). ONE
    shuffle with map-side partial aggregation, no Python workers, and
    no per-key cardinality limit. num/den are re-narrowed
    decimal→BIGINT→DOUBLE in the same order as the DuckDB oracle
    (both casts correctly rounded), so results stay bit-identical to
    the oracle and to the pandas route.

    PRECISION CONTRACT (BOTH routes): y is quantized to 2 decimal
    places (cents — ``round(value*100)``, half-away-from-zero), the
    exact-integer convention this engine uses for monetary/percentage
    columns. On data with more than 2 meaningful decimals both routes
    therefore fit the line through the QUANTIZED values — a (slightly)
    different slope/intercept than an unquantized float OLS would
    give. Pre-scale such a column (e.g. ``value * 10**(d-2)``) to keep
    d decimals of signal; the routes and the oracle stay bit-identical
    to each other either way because they share the quantization.

    ``method="pandas"``: the original ``applyInPandas`` grouped-batch
    form — kept as the template for per-entity fits that genuinely
    are NOT sufficient-statistics-expressible (regularized/iterative
    models). Each group must fit one executor.
    """
    if method == "expr":
        dec = "decimal(38,0)"
        x = F.col(time_col).cast("long").cast(dec)   # epoch seconds (floor)
        y = F.round(F.col(value_col) * 100).cast("long").cast(dec)  # cents
        # null ts/value rows carry no signal: dropped entirely (same
        # contract as the pandas route's dropna — n counts kept rows)
        base = df.filter(
            F.col(time_col).isNotNull() & F.col(value_col).isNotNull()
        ).select(F.col(key), x.alias("__x"), y.alias("__y"))
        g = base.groupBy(key).agg(
            F.count(F.lit(1)).alias("n"),
            F.min("__x").alias("__x0"),
            F.sum("__x").alias("__sxr"),
            F.sum("__y").alias("__sy"),
            F.sum(F.col("__x") * F.col("__y")).alias("__sxyr"),
            F.sum(F.col("__x") * F.col("__x")).alias("__sxxr"),
        )
        n_d = F.col("n").cast(dec)
        x0, sxr, sy = F.col("__x0"), F.col("__sxr"), F.col("__sy")
        sx = sxr - n_d * x0                      # Σ(x−x₀)
        sxy = F.col("__sxyr") - x0 * sy          # Σ(x−x₀)y
        sxx = F.col("__sxxr") - F.lit(2).cast(dec) * x0 * sxr + n_d * x0 * x0
        num = n_d * sxy - sx * sy
        den = n_d * sxx - sx * sx
        # decimal→long→double narrows exactly like the oracle's
        # HUGEINT→BIGINT→DOUBLE (min-centering keeps num/den < 2⁶³)
        num_f = num.cast("long").cast("double")
        den_f = den.cast("long").cast("double")
        degenerate = (F.col("n") < 2) | (den == F.lit(0).cast(dec))
        ybar = sy.cast("double") / (F.lit(100.0) * F.col("n").cast("double"))
        slope = F.when(degenerate, F.lit(0.0)).otherwise(
            num_f / den_f * F.lit(3600.0) / F.lit(100.0)
        )
        intercept = F.when(degenerate, ybar).otherwise(
            ybar
            - (num_f / den_f / F.lit(100.0))
            * (sx.cast("long").cast("double") / F.col("n").cast("double"))
        )
        return g.select(
            key,
            slope.alias("slope_per_hour"),
            intercept.alias("intercept"),
            F.col("n"),
        )
    if method != "pandas":
        raise ValueError(f"unknown grouped_trend method: {method!r}")
    import numpy as np
    import pandas as pd

    key_type = df.schema[key].dataType.simpleString()  # not hardcoded: any key type
    out_schema = (
        f"{key} {key_type}, slope_per_hour double, intercept double, n long"
    )

    def fit(pdf: pd.DataFrame) -> pd.DataFrame:
        # Exact-integer sufficient statistics: x in whole epoch seconds
        # (min-centered per group), y in cents. The OLS closed form
        # num/den = (nΣxy − ΣxΣy)/(nΣx² − (Σx)²) is then a ratio of
        # exact integers (Python bigints — no overflow, no summation-
        # order drift), reduced to doubles by ONE division — the same
        # convention as the cents-sum oracle queries, so the DuckDB
        # twin is bit-identical. Seconds (not μs) keep num/den inside
        # BIGINT: DuckDB's BIGINT→DOUBLE cast is correctly rounded but
        # its HUGEINT→DOUBLE cast is NOT, so magnitudes must stay
        # < 2^63 for cross-engine equality.
        # null ts/value rows carry no signal and would poison the
        # integer stats (NaN → int raises, NaT → garbage epoch)
        pdf = pdf.dropna(subset=[time_col, value_col])
        if len(pdf) == 0:
            return pd.DataFrame(
                {key: pdf[key], "slope_per_hour": [], "intercept": [], "n": []}
            )
        x = (pdf[time_col].astype("int64") // 1_000_000_000).tolist()  # ns → s
        t = pdf[value_col].to_numpy(dtype="float64") * 100.0
        # half-away-from-zero, matching SQL round() (np.round is half-even)
        y = [int(v) for v in np.where(t >= 0, np.floor(t + 0.5), np.ceil(t - 0.5))]
        n = len(x)
        x0 = min(x)
        x = [v - x0 for v in x]
        sx, sy = sum(x), sum(y)
        sxy = sum(a * b for a, b in zip(x, y))
        sxx = sum(a * a for a in x)
        num, den = n * sxy - sx * sy, n * sxx - sx * sx
        ybar = float(sy) / (100.0 * float(n))
        if n < 2 or den == 0:
            slope_per_hour, intercept = 0.0, ybar
        else:
            slope_sec = float(num) / float(den)          # cents per second
            slope_per_hour = slope_sec * 3600.0 / 100.0
            intercept = ybar - (slope_sec / 100.0) * (float(sx) / float(n))
        return pd.DataFrame({
            key: [pdf[key].iloc[0]],
            "slope_per_hour": [slope_per_hour],
            "intercept": [intercept],
            "n": [n],
        })

    return df.select(key, time_col, value_col).groupBy(key).applyInPandas(fit, out_schema)


def histogram(
    df: DataFrame,
    group_col: str,
    value_col: str,
    bin_width: float,
    n_bins: int,
) -> DataFrame:
    """Fixed-width histogram per group: values bucketed by
    ``floor(v / bin_width)``, clamped to ``[0, n_bins)`` (under/
    overflow land in the edge bins). One map-side projection + one
    partial-aggregated shuffle on (group, bin) — the profile/monitoring
    primitive that stays cheap at any scale.

    Output: ``(group, bin, bin_lo, n)``.
    """
    b = (
        F.least(
            F.greatest(F.floor(F.col(value_col) / F.lit(bin_width)), F.lit(0)),
            F.lit(n_bins - 1),
        )
        .cast("long")
    )
    return (
        df.select(F.col(group_col), b.alias("bin"))
        .groupBy(group_col, "bin")
        .agg(F.count("*").alias("n"))
        .select(
            group_col,
            "bin",
            (F.col("bin").cast("double") * F.lit(bin_width)).alias("bin_lo"),
            "n",
        )
    )


def kmv_distinct(
    df: DataFrame,
    group_col: str,
    value_col: str,
    k: int = 64,
) -> DataFrame:
    """Approximate distinct count per group via a KMV (k-minimum-
    values) sketch [Bar-Yossef et al. 2002]: keep the k smallest
    60-bit hashes of the values; estimate = (k−1)/R_k where R_k is the
    k-th smallest hash normalized to [0,1). Exact when the group has
    < k distinct values.

    Unlike HLL (``approx_count_distinct``), every step is a
    deterministic portable expression (md5-tail hash, window top-k,
    one double division), so the DuckDB oracle reproduces the estimate
    bit-for-bit — a cardinality sketch that passes an exact-equality
    correctness gate.

    Scale shape: one shuffle for the (group, hash) distinct, one for
    the per-group top-k window — both on pre-hashed 8-byte keys; the
    map-side distinct-partial keeps the shuffle near |groups|·k rows.
    """
    from harmony_energy_data_pipeline_spark.functions.hashx import portable_hash60

    scale = float((k - 1) * (1 << 60))
    hashed = df.select(
        F.col(group_col), portable_hash60(F.col(value_col)).alias("__h")
    ).distinct()
    w = Window.partitionBy(group_col).orderBy(F.col("__h").asc())
    topk = hashed.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") <= k)
    return (
        topk.groupBy(group_col)
        .agg(F.count("*").alias("__cnt"), F.max("__h").alias("__hk"))
        .select(
            F.col(group_col),
            F.when(F.col("__cnt") < k, F.col("__cnt"))
            .otherwise(
                F.round(F.lit(scale) / F.col("__hk").cast("double")).cast("long")
            )
            .alias("approx_" + value_col),
        )
    )


def hash_sample_quantiles(
    df: DataFrame,
    key: str,
    value_col: str,
    probs: list[float],
    k: int = 1000,
) -> DataFrame:
    """Approximate quantiles from a BOTTOM-k-HASH sample: the k rows
    with the smallest portable 60-bit key hashes form a uniform,
    deterministic, mergeable sample (the KMV idea applied to
    sampling); exact interpolated percentiles over that sample
    estimate the population quantiles with error O(1/√k).

    Unlike ``approx_percentile``'s KLL sketch, the sample — and hence
    the estimate — is identical on any engine and partition layout,
    so the sketch passes an exact-equality oracle. Output:
    ``(p, value)``, one row per requested quantile.

    Scale shape: the bottom-k-by-hash is TakeOrderedAndProject
    (per-partition heaps of size k, no shuffle of the data itself);
    the final exact percentile runs on k rows. Merging shards =
    union + re-take-k, which is how a 1000-executor run combines.
    """
    from harmony_energy_data_pipeline_spark.functions.hashx import portable_hash60

    sample = (
        df.select(F.col(value_col), F.col(key), portable_hash60(F.col(key)).alias("__h"))
        .orderBy(F.col("__h").asc(), F.col(key).asc())
        .limit(k)
    )
    pct = sample.agg(
        F.expr(
            f"percentile({value_col}, array({', '.join(str(p) for p in probs)}))"
        ).alias("__q")
    )
    return pct.select(
        F.posexplode("__q").alias("__i", "value")
    ).select(
        F.element_at(F.array(*[F.lit(p) for p in probs]), F.col("__i") + 1).alias("p"),
        "value",
    )


def key_skew_profile(df: DataFrame, key: str) -> DataFrame:
    """Skew diagnosis for a prospective join/agg key — the measurement
    behind choosing plain hash partitioning vs ``salted_join`` vs
    relying on AQE skew-split. One row:

    - ``n_rows``, ``n_keys``
    - ``max_share_ppm``: heaviest key's row share in parts-per-million
    - ``entropy_micro_nats``: Shannon entropy of the key distribution
      ×10⁶ (max = ln(n_keys)·10⁶ when uniform; low = concentrated)

    Exactness: per-key entropy terms quantize ``ln(c/N)`` to integer
    micro-nats BEFORE the weighted sum (the ``unigram_nll`` trick), so
    the aggregation is exact integers and engines agree bit-for-bit.
    Two shuffles: the key-count agg, then a 4-value reduce.
    """
    counts = df.groupBy(key).agg(F.count("*").alias("__c"))
    total = counts.agg(F.sum("__c").alias("__n"))
    li = F.round(
        F.log(F.col("__c").cast("double") / F.col("__n").cast("double"))
        * F.lit(1_000_000.0)
    ).cast("long")
    return (
        counts.crossJoin(F.broadcast(total))
        .select("__c", "__n", li.alias("__li"))
        .agg(
            F.max("__n").cast("long").alias("n_rows"),
            F.count("*").cast("long").alias("n_keys"),
            F.round(
                F.max("__c").cast("double") * 1_000_000.0
                / F.max("__n").cast("double")
            ).cast("long").alias("max_share_ppm"),
            # DECIMAL(38,0) accumulator: |__li|·__c can reach
            # ~4e19 (> int64) for trillion-row tables with spread
            # keys — exactly the tables this operator profiles; a
            # BIGINT sum would wrap silently with ANSI off (the
            # digest_sum trick from expectations.table_digest)
            F.round(
                -F.sum(F.col("__li").cast("decimal(38,0)") * F.col("__c"))
                .cast("double")
                / F.max("__n").cast("double")
            ).cast("long").alias("entropy_micro_nats"),
        )
    )


def quantile_bins(
    df: DataFrame,
    key: str,
    value_col: str,
    probs: list[float],
    k: int = 1000,
) -> DataFrame:
    """Sketch-driven quantile discretization (feature binning): compute
    deterministic cutpoints with ``hash_sample_quantiles``, broadcast
    them, and label every row with ``bin`` = number of cutpoints at or
    below its value (0..len(probs)).

    The comparison quantizes BOTH sides to cents, so the bin edge is
    an integer test — engines that differ in the last ulp of the
    interpolated cutpoint still bin identically. One TakeOrdered pass
    for the sketch, then a map-side broadcast fold per row; nothing
    shuffles the data itself.
    """
    cuts = (
        hash_sample_quantiles(df, key, value_col, probs, k)
        .select(F.round(F.col("value") * 100).cast("long").alias("__cut"))
        .agg(F.sort_array(F.collect_list("__cut")).alias("__cuts"))
    )
    vc = F.round(F.col(value_col) * 100).cast("long")
    return df.crossJoin(F.broadcast(cuts)).select(
        F.col(key),
        F.aggregate(
            "__cuts",
            F.lit(0).cast("long"),
            lambda acc, c: acc + F.when(vc >= c, 1).otherwise(0),
        ).alias("bin"),
    )


def funnel(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    type_col: str,
    steps: list[str],
) -> DataFrame:
    """Ordered-funnel analysis (ClickHouse ``windowFunnel`` family,
    unbounded window): a user reaches step i when events matching
    ``steps[0..i]`` exist at strictly increasing timestamps. Output:
    ``(step_idx, step, n_users)``, 1-based, cumulative-ordered.

    Earliest-first greedy (min ts of step 1, then min ts of step 2
    after it, …) decides existence optimally for the unbounded case,
    so the whole funnel is a CHAIN of filtered per-user min-aggs —
    one user-keyed shuffle per step on an already user-collapsed
    frame (step 2+ aggregates |users| rows, not |events|), never a
    per-user sort or session reconstruction.
    """
    base = df.select(
        F.col(user_col).alias("__u"), F.col(ts_col).alias("__ts"),
        F.col(type_col).alias("__t"),
    )
    reached: list[tuple[str, DataFrame]] = []
    cur = None
    for step in steps:
        ev = base.filter(F.col("__t") == step)
        if cur is None:
            cur = ev.groupBy("__u").agg(F.min("__ts").alias("__at"))
        else:
            cur = (
                ev.join(cur.select("__u", F.col("__at").alias("__prev")), "__u")
                .filter(F.col("__ts") > F.col("__prev"))
                .groupBy("__u")
                .agg(F.min("__ts").alias("__at"))
            )
        reached.append((step, cur))
    parts = [
        c.agg(F.count("*").cast("long").alias("n_users")).select(
            F.lit(i + 1).alias("step_idx"), F.lit(s).alias("step"), "n_users"
        )
        for i, (s, c) in enumerate(reached)
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def transition_counts(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    type_col: str,
    id_col: str,
) -> DataFrame:
    """First-order Markov transition counts between event types:
    ``(prev_type, next_type, n)`` over each user's event sequence
    ordered by (ts, id) — the id tiebreak makes the sequence (and so
    the counts) deterministic under timestamp collisions.

    One user-keyed window (lag), one pair-keyed agg — the standard
    two-shuffle shape; no session state or per-user collect."""
    w = Window.partitionBy(user_col).orderBy(
        F.col(ts_col).asc(), F.col(id_col).asc()
    )
    return (
        df.select(
            F.lag(type_col).over(w).alias("prev_type"),
            F.col(type_col).alias("next_type"),
        )
        .filter(F.col("prev_type").isNotNull())
        .groupBy("prev_type", "next_type")
        .agg(F.count("*").cast("long").alias("n"))
    )


def cohort_retention(
    df: DataFrame,
    user_col: str,
    ts_col: str,
) -> DataFrame:
    """Weekly cohort retention: users grouped by first-activity week,
    counted per week offset — ``(cohort_week, week_offset, n_users)``.

    Two user-keyed aggs (first week, then distinct user-week pairs)
    and one (cohort, offset) agg; weeks via ``date_trunc`` so cohort
    boundaries are calendar-stable across engines. The offset is a
    calendar-DAY difference div 7 — DST-immune (epoch-second division
    misbuckets by one week in DST session timezones, where consecutive
    date_trunc('week') boundaries are 604800±3600 s apart)."""
    weeks = df.select(
        F.col(user_col).alias("__u"),
        F.date_trunc("week", F.col(ts_col)).alias("__w"),
    ).distinct()
    first = weeks.groupBy("__u").agg(F.min("__w").alias("cohort_week"))
    return (
        weeks.join(first, "__u")
        .select(
            "cohort_week",
            F.expr("datediff(__w, cohort_week) div 7")
            .cast("long").alias("week_offset"),
        )
        .groupBy("cohort_week", "week_offset")
        .agg(F.count("*").cast("long").alias("n_users"))
    )


def profile(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """Per-column data profile: null count, exact distinct count, and
    min/max (computed on the native type, then rendered as strings so
    heterogeneous columns fit one output schema).

    Output: one row per profiled column —
    ``(col_name, n_nulls, n_distinct, min_str, max_str)``.

    Shape (round 6): one two-level aggregation branch PER COLUMN —
    ``groupBy(col)`` reduces rows to per-value counts with map-side
    partial aggregation, then a 1-row rollup derives the profile
    (distinct = non-null key count, nulls = the null key's row count,
    min/max native on the keys). The first form put all N exact
    distinct-counts in ONE agg, which plans as Expand — every input
    row fans out N+1 ways and the SHUFFLE carries rows, not values;
    per-column branches shuffle only each column's distinct values
    (bounded by the domain, not the row count — the thing that
    matters at 100 TB), and each branch's parquet scan prunes to its
    single column. For very wide tables prefer
    ``approx_count_distinct`` — exact distinct is the profile/audit
    variant.
    """
    cols = cols or df.columns
    parts = []
    for c in cols:
        per_val = df.groupBy(F.col(c).alias("__v")).agg(
            F.count(F.lit(1)).alias("__c")
        )
        parts.append(
            per_val.agg(
                F.coalesce(
                    F.sum(F.when(F.col("__v").isNull(), F.col("__c"))), F.lit(0)
                ).alias("n_nulls"),
                F.count("__v").alias("n_distinct"),
                F.min("__v").cast("string").alias("min_str"),
                F.max("__v").cast("string").alias("max_str"),
            ).select(
                F.lit(c).alias("col_name"),
                "n_nulls", "n_distinct", "min_str", "max_str",
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def robust_outliers(
    df: DataFrame,
    group_col: str,
    value_col: str,
    k_num: int = 7,
    k_den: int = 2,
) -> DataFrame:
    """Per-group robust outlier detection: flag rows whose deviation
    from the group median exceeds k × MAD (median absolute deviation),
    the standard-deviation-free screen that survives the heavy-tailed
    value distributions where mean/stddev z-scores break down.
    k = k_num / k_den (default 3.5) stays rational so the threshold
    compares as exact integers: flagged ⇔ k_den·dev > k_num·MAD.

    Median here is the *lower* median (the element at rank ⌊(n+1)/2⌋
    of the sorted group) — single-element, no interpolation, hence
    bit-identical across engines on the cents-integer scale.

    Scale shape — histogram medians, not rank windows: a
    ``row_number`` window per group sorts each group's FULL row set in
    one task, so parallelism collapses to the number of groups (a
    5-group, 100 TB table would sort 20 TB per task). Instead the rows
    reduce to per-(group, value) counts — that shuffle keys on the
    well-distributed composite, with map-side partial aggregation —
    and the median comes from a cumulative-count window over the
    DISTINCT values of each group (bounded by the value domain, not
    the row count: cents of a physical measure have ~10⁴ distinct
    values regardless of row count). Same again for the MAD over the
    deviation histogram. The two median/MAD lookup tables are one row
    per group and ride broadcast joins back onto the row stream.

    Output: ``df``'s columns for flagged rows only, plus med/mad
    context columns.
    """
    cents = F.round(F.col(value_col) * 100).cast("long")
    # NULL values carry no deviation signal and would otherwise enter
    # the median rank count (nulls-first sort → median skewed low, or
    # selected as a NULL median that silently flags nothing)
    base = df.filter(F.col(value_col).isNotNull()).withColumn("__v", cents)

    def hist_lower_median(rows: DataFrame, val: str, out: str) -> DataFrame:
        counts = rows.groupBy(group_col, val).agg(F.count("*").alias("__c"))
        w_cum = (
            Window.partitionBy(group_col)
            .orderBy(val)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        w_grp = Window.partitionBy(group_col)
        cum = counts.withColumn("__cum", F.sum("__c").over(w_cum)).withColumn(
            "__mid", F.floor((F.sum("__c").over(w_grp) + 1) / 2)
        )
        return cum.filter(
            (F.col("__cum") >= F.col("__mid"))
            & (F.col("__cum") - F.col("__c") < F.col("__mid"))
        ).select(F.col(group_col), F.col(val).alias(out))

    med = hist_lower_median(base, "__v", "__med")
    dev = base.join(F.broadcast(med), group_col).withColumn(
        "__dev", F.abs(F.col("__v") - F.col("__med"))
    )
    mad = hist_lower_median(dev, "__dev", "__mad")
    flagged = dev.join(F.broadcast(mad), group_col).filter(
        F.lit(k_den) * F.col("__dev") > F.lit(k_num) * F.col("__mad")
    )
    return flagged.select(
        *[F.col(c) for c in df.columns],
        (F.col("__med").cast("double") / 100).alias("med"),
        (F.col("__mad").cast("double") / 100).alias("mad"),
    )


def cms_estimates(
    df: DataFrame,
    key_col: str,
    width: int = 256,
    depth: int = 3,
    min_est: int | None = None,
) -> DataFrame:
    """Count-Min sketch frequency estimates (Cormode & Muthukrishnan
    2005): ``depth`` hash rows of ``width`` counters; a key's estimate
    is the MIN of its counters — never an underestimate, over by at
    most the collision mass of its buckets. Hashes are the engine's
    portable 60-bit md5 (``functions.hashx``), so the sketch — and
    therefore every estimate — is bit-identical in the SQL oracle.

    Output: ``(key, est_count, exact_count)``, optionally filtered to
    ``est_count >= min_est`` (heavy-hitter mode; CMS guarantees the
    result is a SUPERSET of the true heavy hitters).

    Scale shape: raw rows are touched by ONE plain keyed agg (no
    hashing); the md5 bucket expression — ~8× the cost of a native
    hash, the price of oracle portability — runs on the DISTINCT-key
    table only, ×``depth``, and the sketch is that frame re-aggregated
    with count weights (identical cell values to hashing every row).
    The ``width·depth``-cell sketch broadcasts to the estimate join.
    ``exact_count`` is included for error visibility at test scale; at
    100 TB the point is to DROP it and keep only the fixed-size
    sketch, estimating just a candidate key set (the distinct-key
    estimate here doubles as the oracle surface).
    """
    from harmony_energy_data_pipeline_spark.functions.hashx import portable_hash60

    key_s = F.col("__key").cast("string")
    js = F.array(*[F.lit(i) for i in range(depth)])
    bucket = F.pmod(
        portable_hash60(F.concat(F.col("__j").cast("string"), F.lit(":"), key_s)),
        F.lit(width),
    )
    keys = df.groupBy(F.col(key_col).alias("__key")).agg(
        F.count("*").alias("exact_count")
    )
    hashed = (
        keys.select("__key", "exact_count", F.explode(js).alias("__j"))
        .withColumn("__b", bucket)
    )
    sketch = hashed.groupBy("__j", "__b").agg(
        F.sum("exact_count").cast("long").alias("__c")
    )
    est = (
        hashed.join(F.broadcast(sketch), ["__j", "__b"])
        .groupBy("__key", "exact_count")
        .agg(F.min("__c").cast("long").alias("est_count"))
        .select(F.col("__key").alias(key_col), "est_count", "exact_count")
    )
    if min_est is not None:
        est = est.filter(F.col("est_count") >= min_est)
    return est


# --- HyperLogLog with a portable, integer-exact register pipeline -----------------

#: Register-count exponent: m = 2^_HLL_P registers. 9 keeps the
#: register table broadcast-trivial (512 rows) with ~4.6% standard
#: error — the sketch shape, not the tuning, is the point here.
_HLL_P = 9
_HLL_M = 1 << _HLL_P
#: rho is capped at the suffix width + 1 (60-bit hash minus p bits).
_HLL_RMAX = 60 - _HLL_P + 1


def hll_registers(df: DataFrame, value_col: str) -> DataFrame:
    """HyperLogLog register table [Flajolet et al. 2007] for the
    distinct values of ``value_col``: ``(idx, r)`` with
    ``idx = h mod m`` and ``r`` the register maximum of the
    trailing-zero rank of the hash suffix — the geometric observable
    HLL estimates from (trailing-zero and leading-zero variants are
    statistically identical; trailing zeros rank via
    ``bit_count((w & -w) - 1)``, PURE integer arithmetic, so every
    register value is bit-identical on any engine — no log2 rounding
    at the edge of a power of two).

    Scale shape: one map-side-combined groupBy onto at most m=512
    rows, whatever the input size; sketches of shards MERGE by
    element-wise max (:func:`hll_merge`) — the distributive-sketch
    contract that lets 1000 executors each sketch locally and union
    in O(m).
    """
    from harmony_energy_data_pipeline_spark.functions.hashx import portable_hash60

    h = portable_hash60(F.col(value_col))
    # Distinct-count semantics exclude NULL; hashing NULL would also
    # yield a (idx=NULL, r=NULL) register row that inflates
    # n_registers and skews the estimate downstream.
    hashed = df.filter(F.col(value_col).isNotNull()).select(
        h.alias("__h")
    ).select(
        F.pmod(F.col("__h"), F.lit(_HLL_M)).alias("idx"),
        F.expr(f"__h DIV {_HLL_M}").alias("__w"),
    )
    rho = F.when(F.col("__w") == 0, F.lit(_HLL_RMAX)).otherwise(
        F.lit(1) + F.expr("bit_count((__w & -__w) - 1)")
    )
    return (
        hashed.select("idx", rho.cast("int").alias("__rho"))
        .groupBy("idx")
        .agg(F.max("__rho").alias("r"))
    )


def hll_merge(*register_tables: DataFrame) -> DataFrame:
    """Union of the sketched sets: element-wise register max. Exact
    algebra — merging shard sketches yields the IDENTICAL register
    table (hence identical estimate) as sketching the union, which
    the oracle gate checks literally."""
    out = register_tables[0]
    for t in register_tables[1:]:
        out = out.unionByName(t)
    return out.groupBy("idx").agg(F.max("r").alias("r"))


def hll_estimate(registers: DataFrame) -> DataFrame:
    """One-row cardinality estimate from a register table:
    ``(n_registers, v_zero, scaled_sum, est)``.

    The indicator sum ``Z = Σ 2^-r`` is computed as the INTEGER
    ``scaled_sum = Σ 2^(RMAX - r)`` (absent registers contribute
    ``2^RMAX``) — a shiftleft sum that fits a BIGINT exactly and is
    order-independent, so the only floating-point steps are the final
    alpha multiply/divide (and ``ln`` in the small-range linear-
    counting branch), each a fixed expression evaluated once.
    ``est`` is rounded to 2 decimals; the raw-branch arithmetic is
    bit-identical cross-engine, and the ln branch agrees to far more
    than 2 decimals on any IEEE libm."""
    m = float(_HLL_M)
    # alpha_m for m >= 128, written exactly as the oracle writes it so
    # the literal arithmetic matches double-for-double
    two_rmax = float(1 << _HLL_RMAX)
    agg = registers.agg(
        F.count("*").alias("n_registers"),
        F.sum(
            F.expr(f"shiftleft(CAST(1 AS BIGINT), {_HLL_RMAX} - r)")
        ).alias("__s"),
    ).select(
        "n_registers",
        (F.lit(_HLL_M) - F.col("n_registers")).alias("v_zero"),
        (
            F.col("__s")
            + (F.lit(_HLL_M) - F.col("n_registers"))
            * F.lit(1 << _HLL_RMAX)
        ).alias("scaled_sum"),
    )
    raw = (
        F.lit(0.7213) / (F.lit(1.0) + F.lit(1.079) / F.lit(m))
        * F.lit(m) * F.lit(m) * F.lit(two_rmax)
        / F.col("scaled_sum").cast("double")
    )
    linear = F.lit(m) * F.log(F.lit(m) / F.col("v_zero").cast("double"))
    est = F.when(
        (F.col("v_zero") > 0) & (raw <= F.lit(2.5) * F.lit(m)), linear
    ).otherwise(raw)
    return agg.select(
        "n_registers", "v_zero", "scaled_sum", F.round(est, 2).alias("est")
    )


def hll_registers_by(
    df: DataFrame, keys: list[str], value_col: str
) -> DataFrame:
    """Per-group HLL register table ``(keys…, idx, r)`` — the grouped
    twin of :func:`hll_registers` (same portable integer arithmetic,
    same merge law per group). At most ``m=512`` rows per group
    whatever the group's size; one map-side-combined shuffle keyed by
    ``(keys, idx)``."""
    from harmony_energy_data_pipeline_spark.functions.hashx import portable_hash60

    h = portable_hash60(F.col(value_col))
    hashed = df.filter(F.col(value_col).isNotNull()).select(
        *keys, h.alias("__h")
    ).select(
        *keys,
        F.pmod(F.col("__h"), F.lit(_HLL_M)).alias("idx"),
        F.expr(f"__h DIV {_HLL_M}").alias("__w"),
    )
    rho = F.when(F.col("__w") == 0, F.lit(_HLL_RMAX)).otherwise(
        F.lit(1) + F.expr("bit_count((__w & -__w) - 1)")
    )
    return (
        hashed.select(*keys, "idx", rho.cast("int").alias("__rho"))
        .groupBy(*keys, "idx")
        .agg(F.max("__rho").alias("r"))
    )


def hll_merge_by(
    keys: list[str], *register_tables: DataFrame
) -> DataFrame:
    """Per-group register union: element-wise max within each
    ``(keys, idx)`` — merging per-group shard sketches equals
    sketching each group's union exactly (the same distributive law
    :func:`hll_merge` holds globally)."""
    out = register_tables[0]
    for t in register_tables[1:]:
        out = out.unionByName(t)
    return out.groupBy(*keys, "idx").agg(F.max("r").alias("r"))


def hll_estimate_by(registers: DataFrame, keys: list[str]) -> DataFrame:
    """Per-group cardinality estimate ``(keys…, n_registers, v_zero,
    scaled_sum, est)`` from a grouped register table — the identical
    integer-exact indicator sum and estimator branches as
    :func:`hll_estimate`, evaluated per group."""
    m = float(_HLL_M)
    two_rmax = float(1 << _HLL_RMAX)
    agg = registers.groupBy(*keys).agg(
        F.count("*").alias("n_registers"),
        F.sum(
            F.expr(f"shiftleft(CAST(1 AS BIGINT), {_HLL_RMAX} - r)")
        ).alias("__s"),
    ).select(
        *keys,
        "n_registers",
        (F.lit(_HLL_M) - F.col("n_registers")).alias("v_zero"),
        (
            F.col("__s")
            + (F.lit(_HLL_M) - F.col("n_registers"))
            * F.lit(1 << _HLL_RMAX)
        ).alias("scaled_sum"),
    )
    raw = (
        F.lit(0.7213) / (F.lit(1.0) + F.lit(1.079) / F.lit(m))
        * F.lit(m) * F.lit(m) * F.lit(two_rmax)
        / F.col("scaled_sum").cast("double")
    )
    linear = F.lit(m) * F.log(F.lit(m) / F.col("v_zero").cast("double"))
    est = F.when(
        (F.col("v_zero") > 0) & (raw <= F.lit(2.5) * F.lit(m)), linear
    ).otherwise(raw)
    return agg.select(
        *keys, "n_registers", "v_zero", "scaled_sum",
        F.round(est, 2).alias("est"),
    )
