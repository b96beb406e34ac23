"""Cleaning core: schema alignment, lenient parse/cast, %-consistency
repair, null handling, two-phase keep-last dedup, quality summary.

Mirrors the reference transform stage
(/root/reference/src/transform/transform.py:91-233) with identical
semantics, re-expressed as lazy Catalyst plans. The reference runs
eager Polars kernels per step; here the whole chain is one logical
plan so Catalyst fuses projections and prunes columns end-to-end.

Scale notes (100 TB posture):
- align/parse/cast/repair/fill are pure projections — no shuffle,
  fully pipelined inside one WholeStageCodegen span.
- the only shuffles in the chain are the two dedup windows, which
  hash-partition by `_id` then by the time column; at scale, salt or
  pre-bucket by the dedup key if one key is hot (for this data model
  `_id` is unique-ish so skew is bounded).
- counters (null rows, inconsistent rows, removed dupes) are separate
  actions in the reference; here they are exposed both as lazy
  DataFrames and as an optional eager summary.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from harmony_energy_data_pipeline_spark.io import local_relation
from pyspark.sql import types as T

from harmony_energy_data_pipeline_spark.schemas import FUEL_COLS, GENERATION_SCHEMA

# Order matters for reference parity: the per-fuel repair loop runs in
# this (alphabetical-ish) order — columns are independent so the loop
# is commutative, but we keep the reference order anyway
# (transform.py:142-146).
REPAIR_FUEL_ORDER: list[str] = [
    "BIOMASS", "COAL", "GAS", "HYDRO", "IMPORTS",
    "NUCLEAR", "OTHER", "SOLAR", "STORAGE", "WIND_EMB", "WIND",
]


# ---------------------------------------------------------------------------
# P1 — schema-align projection (transform.py:91-118)
# ---------------------------------------------------------------------------

def align_schema(df: DataFrame, schema: T.StructType | None = None) -> DataFrame:
    """Coerce ``df`` to the declared schema: add missing columns as
    typed nulls, drop unexpected columns, emit in declared order.

    A single ``select`` — Catalyst folds it into adjacent projections.
    Missing columns become ``lit(None).cast(t)`` (Spark needs concrete
    types where Polars used a Null dtype).
    """
    schema = schema or GENERATION_SCHEMA
    have = set(df.columns)
    cols = [
        (F.col(f.name) if f.name in have else F.lit(None).cast(f.dataType)).alias(f.name)
        for f in schema.fields
    ]
    return df.select(*cols)


# ---------------------------------------------------------------------------
# F1/F2 — lenient timestamp parse + numeric cast (transform.py:122-136)
# ---------------------------------------------------------------------------

ISO_FORMAT = "yyyy-MM-dd'T'HH:mm:ss"


def parse_timestamp(col: Column | str, fmt: str = ISO_FORMAT) -> Column:
    """ISO-8601 string → timestamp; malformed input → NULL.

    ``try_to_timestamp`` is explicit null-on-error regardless of the
    session ANSI flag (reference: strptime(strict=False),
    transform.py:128).
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.try_to_timestamp(c, F.lit(fmt))


def lenient_cast(col: Column | str, dtype: str = "double") -> Column:
    """Cast with null-on-failure (reference: cast(strict=False),
    transform.py:134). ``try_cast`` keeps the semantics even if a
    caller session has ANSI enabled."""
    c = F.col(col) if isinstance(col, str) else col
    return c.try_cast(dtype)


def parse_and_cast(
    df: DataFrame,
    dt_col: str = "DATETIME",
    numeric_cols: list[str] | None = None,
    sort: bool = True,
) -> DataFrame:
    """Parse the event-time column, lenient-cast numerics, and (by
    default) sort by event time (transform.py:122-136).

    The reference sorts here for its serve path (ordered scans). A
    global sort is a full range-shuffle at scale and downstream window
    operators re-shuffle by their own keys anyway, so pipeline callers
    (``transform_generation``) pass ``sort=False`` and ordering is
    applied only where the serve contract needs it.
    """
    if numeric_cols is None:
        numeric_cols = [c for c in df.columns if c not in ("_id", dt_col)]
    out = df.withColumn(dt_col, parse_timestamp(dt_col))
    out = out.select(
        *[
            lenient_cast(c).alias(c) if c in numeric_cols else F.col(c)
            for c in out.columns
        ]
    )
    return out.orderBy(dt_col) if sort else out


# ---------------------------------------------------------------------------
# P8/P9/F3/F4 — %-consistency repair (transform.py:139-182)
# ---------------------------------------------------------------------------

def repaired_perc(fuel_col: Column | str, perc_col: Column | str,
                  total_col: Column | str = "GENERATION",
                  tolerance: float = 1.0) -> Column:
    """CASE WHEN |fuel/total*100 − perc| > tol THEN recomputed ELSE raw.

    One expression per fuel — no helper columns materialized, unlike
    the reference's `_calc`/`_diff` add-then-drop dance
    (transform.py:158-180); Catalyst sees the fused expression.
    """
    fuel = F.col(fuel_col) if isinstance(fuel_col, str) else fuel_col
    perc = F.col(perc_col) if isinstance(perc_col, str) else perc_col
    total = F.col(total_col) if isinstance(total_col, str) else total_col
    calc = fuel / total * F.lit(100.0)
    return F.when(F.abs(calc - perc) > F.lit(tolerance), calc).otherwise(perc)


def repair_percentages(
    df: DataFrame,
    fuel_cols: list[str] | None = None,
    total_col: str = "GENERATION",
    tolerance: float = 1.0,
) -> DataFrame:
    """Repair every `{fuel}_perc` column present in ``df``
    (transform.py:139-182). Pure projection — no shuffle."""
    fuel_cols = fuel_cols if fuel_cols is not None else REPAIR_FUEL_ORDER
    out = df
    for fuel in fuel_cols:
        perc = f"{fuel}_perc"
        if perc in out.columns and fuel in out.columns:
            out = out.withColumn(
                perc, repaired_perc(fuel, perc, total_col, tolerance)
            )
    return out


def count_inconsistent(
    df: DataFrame,
    fuel_cols: list[str] | None = None,
    total_col: str = "GENERATION",
    tolerance: float = 1.0,
) -> DataFrame:
    """Per-fuel count of rows whose reported % is off by > tolerance
    (the pre-repair counters at transform.py:166).

    One pass: conditional-sum aggregation instead of the reference's
    N filter+count scans — at 100 TB, one scan versus eleven.
    """
    fuel_cols = fuel_cols if fuel_cols is not None else REPAIR_FUEL_ORDER
    aggs = []
    for fuel in fuel_cols:
        perc = f"{fuel}_perc"
        if perc in df.columns and fuel in df.columns:
            calc = F.col(fuel) / F.col(total_col) * F.lit(100.0)
            bad = F.abs(calc - F.col(perc)) > F.lit(tolerance)
            aggs.append(
                F.sum(F.when(bad, F.lit(1)).otherwise(F.lit(0))).alias(fuel)
            )
    if not aggs:
        raise ValueError("no *_perc columns found to validate")
    return df.agg(*aggs)


# ---------------------------------------------------------------------------
# P5/P6/P7 — null handling (transform.py:189-203)
# ---------------------------------------------------------------------------

def null_row_filter(df: DataFrame) -> Column:
    """Predicate: row has ≥1 NULL in any column (transform.py:194)."""
    pred = F.lit(False)
    for c in df.columns:
        pred = pred | F.col(c).isNull()
    return pred


def handle_missing_values(
    df: DataFrame,
    key_cols: tuple[str, ...] = ("_id", "DATETIME"),
    fill_value: float = 0.0,
) -> DataFrame:
    """Drop rows with null keys; zero-fill float/double measure columns
    (transform.py:189-203). Pure filter+projection — no shuffle."""
    float_cols = [
        f.name for f in df.schema.fields
        if isinstance(f.dataType, (T.DoubleType, T.FloatType))
    ]
    out = df.na.drop(subset=[c for c in key_cols if c in df.columns])
    if float_cols:
        out = out.na.fill(fill_value, subset=float_cols)
    return out


# ---------------------------------------------------------------------------
# D1 — two-phase keep-last dedup (transform.py:206-220)
# ---------------------------------------------------------------------------

def dedup_keep_last(
    df: DataFrame,
    key: str = "_id",
    order: str = "DATETIME",
    tiebreak: list[str] | None = None,
    strategy: str = "window",
    max_dup_keys: int = 4_000_000,
) -> DataFrame:
    """Per ``key``, keep the row with the greatest ``order`` value.

    Three strategies, identical semantics (argmax of the same ordering —
    NOT ``dropDuplicates``, which keeps an arbitrary row; ties resolve
    by explicit ``tiebreak`` columns if given, else all remaining
    columns ``DESC NULLS LAST``):

    * ``"window"`` (default): ``row_number`` over PARTITION BY key —
      one exchange, one sort per partition, rows stream through
      whole-stage codegen.
    * ``"agg"``: ``groupBy(key).agg(max_by(struct(<all>),
      struct(order, tiebreak...)))`` — gets PARTIAL (map-side) combine
      before the exchange, so shuffle bytes shrink when keys repeat
      heavily. The argmax struct compares ascending with NULLS
      SMALLEST per field — i.e. exactly ``DESC NULLS LAST``.
    * ``"split"``: census-split for NEAR-UNIQUE keys — count-census
      finds the keys that repeat, the dup-key set broadcasts, and only
      duplicate rows pay the window; singletons pass through a
      broadcast anti-join with no shuffle at all. Falls back to the
      window plan when more than ``max_dup_keys`` keys repeat (the
      broadcast would stop being small) or when duplicate rows exceed
      20% of the input (most rows would pay the window anyway).

      Measured and NOT made the default: at the 1000× fixture the
      route lost 2–4× to the window on BOTH narrow (events, ~40 B)
      and wide (documents, ~300 B) rows, single-JVM and
      local-cluster[4,7] alike — its three extra input passes
      (census, anti, semi) cost more than the one in-memory sort
      shuffle they avoid (SCALING.md round 6). It remains available
      for deployments where input re-scan is cheaper than shuffle
      (hot object-store cache, shuffle-constrained network).

    Round-6 A/B at the 300× fixture (30M-row events, both local[28]
    and local-cluster[4,7], 32 and 128 shuffle partitions,
    interleaved best-of-2): the window form won every configuration by
    20–35% — ``max_by`` over a full-row struct plans as SortAggregate
    (struct buffers are not hash-agg mutable), paying TWO sorts per
    phase, and on a near-unique key the partial combine removes almost
    nothing. Round 5's reported 2–3× cross-JVM window penalty did NOT
    reproduce (window on 4×7: 4.1–5.6 s vs the 12.7–15.3 s recorded —
    measurement contamination, see SCALING.md round 6). ``"agg"``
    stays available for heavily-repeated keys, where map-side combine
    is a real bytes win.
    """
    tb = tiebreak if tiebreak is not None else [
        c for c in df.columns if c not in (key, order)
    ]
    if strategy == "agg":
        best = F.max_by(
            F.struct(*[F.col(c) for c in df.columns]),
            F.struct(F.col(order), *[F.col(c) for c in tb]),
        )
        return df.groupBy(key).agg(best.alias("__best")).select("__best.*")
    if strategy not in ("window", "split"):
        raise ValueError(
            f"strategy must be 'window', 'agg' or 'split', got {strategy!r}"
        )
    ordering = [F.col(order).desc_nulls_last()] + [
        F.col(c).desc_nulls_last() for c in tb
    ]
    w = Window.partitionBy(key).orderBy(*ordering)
    if strategy == "split":
        # Census-split: the wide sort-shuffle only ever sees rows whose
        # key actually repeats. The census shuffles (key, count) pairs —
        # a key-pruned scan plus a map-combined narrow exchange — and the
        # dup-key set broadcasts, so SINGLETON rows (the bulk of a
        # near-unique corpus) pass through as a broadcast anti-join with
        # zero shuffle. Only the duplicate subset pays the window. The
        # extra full-width scan this costs is a read; the full-row sort
        # shuffle it saves is a write+network+spill — at the 1000×
        # fixture the window form's exponent was 1.37 for exactly that
        # reason. Census-and-refuse: if more than ``max_dup_keys`` keys
        # repeat (broadcast would not be small), fall back to the
        # window plan for the whole input.
        dup_census = (
            df.groupBy(key).count().filter(F.col("count") > 1)
        ).persist()
        try:
            stats = dup_census.agg(
                F.count(F.lit(1)).alias("dup_keys"),
                F.coalesce(F.sum("count"), F.lit(0)).alias("dup_rows"),
            ).first()
            n_dups, dup_rows = stats["dup_keys"], stats["dup_rows"]
            total = df.count() if n_dups <= max_dup_keys else None
        except Exception:
            dup_census.unpersist()
            raise
        # Split pays off only when duplicate ROWS are rare: the route
        # trades the full-row sort shuffle for a census plus an extra
        # scan, which loses whenever most rows go through the window
        # anyway (e.g. a key where every value repeats). Refuse unless
        # dup rows are a small fraction of the input.
        if n_dups > max_dup_keys or (total and dup_rows > 0.2 * total):
            dup_census.unpersist()
        else:
            dups = dup_census.select(key)
            # name-keyed joins surface the key column first; restore
            # the caller's column order on both branches
            singles = df.join(F.broadcast(dups), key, "left_anti").select(
                *df.columns
            )
            dup_best = (
                df.join(F.broadcast(dups), key, "left_semi")
                .withColumn("__rn", F.row_number().over(w))
                .filter(F.col("__rn") == 1)
                .drop("__rn")
                .select(*df.columns)
            )
            return singles.unionByName(dup_best)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def suppress_repeats_within(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    id_col: str,
    horizon_seconds: int,
) -> DataFrame:
    """Rate-limit duplicates in time: keep a row iff the PREVIOUS
    same-key row (by ts, id-tiebroken) is older than
    ``horizon_seconds`` — the 'suppress repeated alerts/events within
    N minutes' semantic. Lag-based (measured against the previous raw
    row, not the previous kept row), which one window expresses
    exactly and deterministically; chained suppression is a session
    recurrence — use ``streaming.sessionized_agg`` gaps for that.

    One key-partitioned window shuffle; no state, no iteration.
    """
    w = Window.partitionBy(*key_cols).orderBy(
        F.col(ts_col).asc(), F.col(id_col).asc()
    )
    prev = F.lag(F.col(ts_col)).over(w)
    keep = prev.isNull() | (
        F.col(ts_col).cast("long") - prev.cast("long") > horizon_seconds
    )
    return df.withColumn("__keep", keep).filter(F.col("__keep")).drop("__keep")


def dedup_two_phase(
    df: DataFrame,
    id_col: str = "_id",
    time_col: str = "DATETIME",
    strategy: str = "window",
) -> DataFrame:
    """Reference dedup (transform.py:206-220): phase 1 — per ``id_col``
    keep latest ``time_col``; phase 2 — per ``time_col`` keep largest
    ``id_col``. Phase order is semantic (phase 2 sees phase 1's
    survivors; tests/test_transform.py:184-204).

    Two hash-shuffles (by id, then by time) under the default window
    strategy. At 100 TB with a date-partitioned table, phase 2 becomes
    partition-local; phase 1's key is near-unique so partial
    aggregation keeps shuffle volume ≈ output volume.
    ``strategy="split"`` threads the census-split form through both
    phases (each phase's census routes independently — the per-phase
    fallback matters: at the scale fixtures phase 1 is near-unique but
    phase 2's time key repeats ~N_replica times); see
    ``dedup_keep_last`` for why window remains the measured default.
    """
    phase1 = dedup_keep_last(df, key=id_col, order=time_col, strategy=strategy)
    if strategy == "split":
        # Phase 2's census + anti + semi branches would each recompute
        # phase 1 from the scan; materialize it once (LRU-evictable).
        phase1 = phase1.persist()
    phase2 = dedup_keep_last(phase1, key=time_col, order=id_col, strategy=strategy)
    return phase2


# ---------------------------------------------------------------------------
# A4/A5 — quality summary (transform.py:223-233)
# ---------------------------------------------------------------------------

def quality_summary(
    spark: SparkSession,
    total_raw: int,
    total_clean: int,
    issues: list[tuple[str, int]] | None = None,
) -> DataFrame:
    """2-column (Check, Count) summary frame (transform.py:223-233)."""
    rows = [
        ("Total raw records", total_raw),
        ("Valid cleaned records", total_clean),
        ("Dropped / invalid records", total_raw - total_clean),
    ] + list(issues or [])
    return local_relation(spark, rows, "Check string, Count long")


# ---------------------------------------------------------------------------
# Full transform chain (transform.py:14-88 orchestration)
# ---------------------------------------------------------------------------

def transform_generation(
    df_raw: DataFrame,
    tolerance: float = 1.0,
) -> DataFrame:
    """The reference's transform_records as ONE lazy plan:
    align → parse/cast → %-repair → null-handling → two-phase dedup.

    Counters (quality summary) are intentionally separate actions —
    call `count_inconsistent` / `quality_summary` when audit numbers
    are needed, so the hot path stays a single job.
    """
    aligned = align_schema(df_raw)
    parsed = parse_and_cast(aligned, "DATETIME",
                            [c for c in aligned.columns if c not in ("_id", "DATETIME")],
                            sort=False)
    repaired = repair_percentages(parsed, REPAIR_FUEL_ORDER, "GENERATION", tolerance)
    filled = handle_missing_values(repaired)
    return dedup_two_phase(filled)


def quantile_band_filter(
    df: DataFrame,
    col: str,
    lo: float = 0.05,
    hi: float = 0.95,
) -> DataFrame:
    """Keep rows whose ``col`` lies within the corpus-global
    [P(lo), P(hi)] band — the standard outlier trim before training
    (drop the truncated fragments AND the concatenation monsters).

    Two passes by construction: an exact-percentile aggregate (one
    reduction to a single row) and a broadcast of the two thresholds
    back over the corpus — the corpus itself never shuffles. The
    thresholds are rounded to 6 dp so every engine computes the
    identical cut (exact interpolated percentiles agree cross-engine
    at that precision; the band moves by ≤1e-6 which no real filter
    cares about)."""
    th = df.agg(
        F.round(F.percentile(col, F.lit(lo)), 6).alias("__lo"),
        F.round(F.percentile(col, F.lit(hi)), 6).alias("__hi"),
    )
    return (
        df.crossJoin(F.broadcast(th))
        .filter((F.col(col) >= F.col("__lo")) & (F.col(col) <= F.col("__hi")))
        .drop("__lo", "__hi")
    )


__all__ = [
    "FUEL_COLS", "REPAIR_FUEL_ORDER", "align_schema", "parse_timestamp",
    "lenient_cast", "parse_and_cast", "repaired_perc", "repair_percentages",
    "count_inconsistent", "null_row_filter", "handle_missing_values",
    "dedup_keep_last", "dedup_two_phase", "quality_summary",
    "transform_generation", "quantile_band_filter",
]
