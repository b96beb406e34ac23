"""Incremental view maintenance over the snapshot log.

A materialized per-key aggregate (COUNT + SUM / MIN / MAX, with AVG
derived) of a snapshot table, refreshed from the CDC delta instead of
a full rescan: each refresh reads only the rows appended since the
source version the view last reflected (``read_snapshot_changes``),
folds them into partial aggregates, and FULL-OUTER-merges those with
the stored view — the standard self-maintainable-aggregate shape
(COUNT/SUM are distributive; MIN/MAX are distributive UNDER INSERTS,
which is exactly what the append-only CDC fast path delivers) that
Delta/Materialize-style incremental MVs use. Refresh cost is
O(|delta| + |view|) regardless of how large the source table has
grown — the property that matters at 100 TB, where the view is
typically orders of magnitude smaller than the fact table.

MIN/MAX caveat (the standard one), refined: an insert can only
tighten an extremum, so the fast path merges with least/greatest; a
DELETION can evict the current extremum, which no stored aggregate
can repair without rescanning the group. When the commit range is
row-level expressible (change feed), the refresh computes the
DANGER GROUPS — those where a deleted value sits at the group's
combined extremum (:func:`_danger_keys`): every other group folds
exactly like COUNT/SUM, and only the danger groups rescan the
source (a PARTIAL rescan stitched into the fold — aggregation state
O(danger groups), never a full re-aggregation for one hot group's
eviction). Only a feed-inexpressible rewrite still recomputes the
whole view, so correctness never depends on the fast path.

AVG is derived, not merged: the view stores (n, sum) and finalizes
``avg_<c> = sum_<c> / n`` after each merge — exact under re-derivation
where merging running averages would not be.

The view is itself a snapshot table; its manifest records the exact
source version it reflects (``ivm_source_version``), so refresh is
idempotent (no new source commits → no-op) and crash-safe (a crashed
refresh leaves the old view version live; the next refresh redoes the
same delta). :func:`refresh_agg_views` maintains SEVERAL views of one
source off a SINGLE persisted CDC read per distinct version range —
the fan-out shape a real pipeline has (one fact stream, many rollups).

Reference scope note: the reference recomputes its serve-side chart
aggregates from the full SQLite table on every dashboard load
(src/app/streamlit_app.py:47-71); this module is the
incremental-refresh upgrade of that read path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from harmony_energy_data_pipeline_spark.sinks import snapshots as snap

#: Manifest key on the VIEW table: the source version it reflects.
SOURCE_VERSION_KEY = "ivm_source_version"


def _measure_names(sum_cols, min_cols, max_cols) -> list[str]:
    return (
        ["n"]
        + [f"sum_{c}" for c in sum_cols]
        + [f"min_{c}" for c in min_cols]
        + [f"max_{c}" for c in max_cols]
    )


def _aggregate(
    df: DataFrame, keys: list[str], sum_cols, min_cols=(), max_cols=()
) -> DataFrame:
    return df.groupBy(*keys).agg(
        F.count("*").alias("n"),
        *[F.sum(c).alias(f"sum_{c}") for c in sum_cols],
        *[F.min(c).alias(f"min_{c}") for c in min_cols],
        *[F.max(c).alias(f"max_{c}") for c in max_cols],
    )


def _aggregate_signed(feed: DataFrame, keys: list[str], sum_cols) -> DataFrame:
    """Partials from a ROW-LEVEL change feed: inserts contribute +1,
    deletes −1 — COUNT and SUM are group-invertible, so a deletion
    folds incrementally where MIN/MAX cannot (an evicted extremum
    needs a rescan)."""
    sign = F.when(
        F.col("_change_type") == "delete", F.lit(-1)
    ).otherwise(F.lit(1))
    return feed.groupBy(*keys).agg(
        F.sum(sign).alias("n"),
        *[
            # NULL values stay NULL through the sign multiply, so the
            # sum skips them exactly as the plain aggregate does
            F.sum(sign * F.col(c)).alias(f"sum_{c}")
            for c in sum_cols
        ],
    )


def _aggregate_signed_minmax(
    feed: DataFrame, keys: list[str], sum_cols, min_cols, max_cols
) -> DataFrame:
    """Signed COUNT/SUM partials plus INSERT-ONLY min/max partials in
    one aggregate — valid precisely when :func:`_deletes_touch_extrema`
    said no deleted value can evict a stored extremum: inserts then
    only TIGHTEN, and ``_merge``'s least/greatest (both null-skipping)
    does the rest. Delete rows contribute NULL to the extrema columns,
    which min/max ignore."""
    sign = F.when(
        F.col("_change_type") == "delete", F.lit(-1)
    ).otherwise(F.lit(1))
    is_ins = F.col("_change_type") != "delete"
    return feed.groupBy(*keys).agg(
        F.sum(sign).alias("n"),
        *[F.sum(sign * F.col(c)).alias(f"sum_{c}") for c in sum_cols],
        *[F.min(F.when(is_ins, F.col(c))).alias(f"min_{c}")
          for c in min_cols],
        *[F.max(F.when(is_ins, F.col(c))).alias(f"max_{c}")
          for c in max_cols],
    )


def _danger_keys(
    feed: DataFrame, old: DataFrame, keys: list[str], min_cols, max_cols
) -> DataFrame:
    """The DISTINCT groups where a deleted row's value sits at (or
    beyond) the group's extremum — the only groups whose MIN/MAX a
    deletion can evict, hence the only groups that need a source
    rescan. Everything else folds without touching the source — the
    common case (deletes land strictly inside the extrema).

    The comparison bound is the COMBINED extremum of the stored view
    and the window's own inserts: a row inserted and then deleted
    within one refresh window can be that window's extremum while the
    group is absent from (or looser in) the stored view — comparing
    against the view alone would miss the eviction. Equality counts
    as danger (the deleted row may be the unique achiever; a
    surviving tie just makes the rescan a no-op). NULL deleted
    values never endanger an extremum (min/max ignore NULLs); NULL
    keys join null-safely to match the grouping semantics.

    Cost: one aggregate over the window's inserts + one
    broadcast-sized join of the delete rows."""
    dels = feed.filter(F.col("_change_type") == "delete")
    ins_ext = (
        feed.filter(F.col("_change_type") != "delete")
        .groupBy(*keys)
        .agg(
            *[F.min(c).alias(f"min_{c}") for c in min_cols],
            *[F.max(c).alias(f"max_{c}") for c in max_cols],
        )
    )
    o, i = old.alias("o"), ins_ext.alias("i")
    jc = F.lit(True)
    for k in keys:
        jc = jc & F.col(f"o.{k}").eqNullSafe(F.col(f"i.{k}"))
    combined = o.join(i, jc, "full").select(
        *[
            F.coalesce(F.col(f"o.{k}"), F.col(f"i.{k}")).alias(k)
            for k in keys
        ],
        # least/greatest skip the missing side's NULLs
        *[
            F.least(F.col(f"o.min_{c}"), F.col(f"i.min_{c}"))
            .alias(f"min_{c}")
            for c in min_cols
        ],
        *[
            F.greatest(F.col(f"o.max_{c}"), F.col(f"i.max_{c}"))
            .alias(f"max_{c}")
            for c in max_cols
        ],
    )
    d, b = dels.alias("d"), combined.alias("b")
    jc2 = F.lit(True)
    for k in keys:
        jc2 = jc2 & F.col(f"d.{k}").eqNullSafe(F.col(f"b.{k}"))
    danger = F.lit(False)
    for c in min_cols:
        danger = danger | (F.col(f"d.{c}") <= F.col(f"b.min_{c}"))
    for c in max_cols:
        danger = danger | (F.col(f"d.{c}") >= F.col(f"b.max_{c}"))
    return (
        d.join(b, jc2, "inner")
        .filter(danger)
        .select(*[F.col(f"d.{k}").alias(k) for k in keys])
        .distinct()
    )


def _pruned_source_for(
    spark: SparkSession, source_path: str, version: int,
    danger: DataFrame, keys: list[str],
) -> DataFrame:
    """The source read for a danger-group rescan, zone-map-pruned when
    possible: with a SINGLE group key and no NULL danger key, read
    only the files whose recorded [min, max] overlaps the danger
    keys' interval (``read_snapshot(where=…)`` — loose, never wrong;
    the caller's semi-join is the exact group filter). Multi-key
    specs, NULL danger keys, or untracked sources fall back to the
    full file list."""
    if len(keys) == 1:
        k = keys[0]
        has_null = (
            danger.filter(F.col(k).isNull()).limit(1).count() > 0
        )
        if not has_null:
            kb = danger.agg(F.min(k), F.max(k)).first()
            if kb[0] is not None:
                return snap.read_snapshot(
                    spark, source_path, version,
                    where=[(k, kb[0], kb[1])],
                )
    return snap.read_snapshot(spark, source_path, version)


def _semi_nullsafe(
    df: DataFrame, keys_df: DataFrame, keys: list[str], anti: bool = False
) -> DataFrame:
    """Null-safe LEFT SEMI (or ANTI) join on the group keys — the
    group-membership filter matching groupBy's NULL semantics."""
    a, b = df.alias("a"), keys_df.alias("b")
    jc = F.lit(True)
    for k in keys:
        jc = jc & F.col(f"a.{k}").eqNullSafe(F.col(f"b.{k}"))
    return a.join(b, jc, "left_anti" if anti else "left_semi")


def _merge(
    old: DataFrame, part: DataFrame, keys: list[str],
    sum_cols, min_cols=(), max_cols=(),
) -> DataFrame:
    """view ⊕ delta-partials: full-outer on the keys; counts and sums
    add with missing sides as zero; inserts can only TIGHTEN an
    extremum, so min/max merge via least/greatest (both skip the
    missing side's NULL). A key only in the delta appears; a key
    absent from the delta is untouched.

    Null-safe key equality: groupBy puts all NULL keys in ONE group,
    but a plain equi-join never matches NULL = NULL — eqNullSafe (<=>)
    restores the grouping semantics; the key columns are then
    coalesced back."""
    o, d = old.alias("o"), part.alias("d")
    join_cond = F.lit(True)
    for k in keys:
        join_cond = join_cond & F.col(f"o.{k}").eqNullSafe(F.col(f"d.{k}"))
    merged = o.join(d, on=join_cond, how="full")
    cols = [
        F.coalesce(F.col(f"o.{k}"), F.col(f"d.{k}")).alias(k) for k in keys
    ]
    for m in ["n"] + [f"sum_{c}" for c in sum_cols]:
        cols.append(
            (F.coalesce(F.col(f"o.{m}"), F.lit(0))
             + F.coalesce(F.col(f"d.{m}"), F.lit(0))).alias(m)
        )
    for c in min_cols:
        cols.append(F.least(F.col(f"o.min_{c}"), F.col(f"d.min_{c}"))
                    .alias(f"min_{c}"))
    for c in max_cols:
        cols.append(F.greatest(F.col(f"o.max_{c}"), F.col(f"d.max_{c}"))
                    .alias(f"max_{c}"))
    return merged.select(*cols)


def _finalize(df: DataFrame, avg_cols) -> DataFrame:
    """Derived measures, recomputed exactly after every merge."""
    for c in avg_cols:
        df = df.withColumn(
            f"avg_{c}", F.col(f"sum_{c}") / F.col("n")
        )
    return df


def _norm_spec(
    keys, sum_cols, min_cols, max_cols, avg_cols
) -> tuple[list, list, list, list, list]:
    sum_cols = list(sum_cols or [])
    min_cols = list(min_cols or [])
    max_cols = list(max_cols or [])
    avg_cols = list(avg_cols or [])
    # AVG derives from (n, sum): make sure the sum is stored
    for c in avg_cols:
        if c not in sum_cols:
            sum_cols.append(c)
    return list(keys), sum_cols, min_cols, max_cols, avg_cols


def refresh_agg_view(
    spark: SparkSession,
    source_path: str,
    view_path: str,
    keys: list[str],
    sum_cols: list[str] | None = None,
    protocol: str = "link",
    min_cols: list[str] | None = None,
    max_cols: list[str] | None = None,
    avg_cols: list[str] | None = None,
) -> int:
    """Refresh the materialized aggregate at ``view_path`` to reflect
    the LATEST version of the snapshot table at ``source_path``.
    Returns the source version the view now reflects.

    Fast path: only the appended delta is scanned and merged into the
    stored view. Fallbacks to a full recompute: first refresh, a view
    without a recorded source version, or ANY non-append commit in the
    source range (overwrite, row-level rewrite, DV delete — the cases
    where a stored MIN/MAX could have lost its extremum).
    """
    return _refresh(
        spark, source_path,
        [{
            "view_path": view_path, "keys": keys, "sum_cols": sum_cols,
            "min_cols": min_cols, "max_cols": max_cols,
            "avg_cols": avg_cols,
        }],
        protocol,
    )


def refresh_agg_views(
    spark: SparkSession,
    source_path: str,
    specs: list[dict],
    protocol: str = "link",
) -> int:
    """Refresh SEVERAL materialized views of one source table,
    sharing one persisted CDC read per distinct version range — N
    rollups of a fact stream cost one delta scan, not N. Each spec is
    ``{"view_path", "keys", "sum_cols"?, "min_cols"?, "max_cols"?,
    "avg_cols"?}``. Returns the source version all views now
    reflect."""
    return _refresh(spark, source_path, specs, protocol)


def _refresh(
    spark: SparkSession, source_path: str, specs: list[dict], protocol: str
) -> int:
    cur = snap.latest_version(source_path)
    if cur is None:
        raise FileNotFoundError(f"no snapshots at {source_path}")

    # group pending views by the source version they last reflected,
    # so one CDC read serves every view at the same position
    by_last: dict[int | None, list[dict]] = {}
    for spec in specs:
        view_version = snap.latest_version(spec["view_path"])
        last = None
        if view_version is not None:
            m = snap._read_manifest_raw(spec["view_path"], view_version)
            last = m.get(SOURCE_VERSION_KEY)
        if last == cur:
            continue  # idempotent: this view is current
        by_last.setdefault(last, []).append(
            {**spec, "_view_version": view_version}
        )

    full_group: list[dict] = by_last.pop(None, [])
    for last, group in by_last.items():
        feed = None
        try:
            delta = snap.read_snapshot_changes(spark, source_path, last, cur)
        except ValueError:
            # non-append commit in range. A DELETION-VECTOR delete /
            # MOR update / CDF-recorded rewrite is still row-level
            # expressible: the change feed recovers the changed rows,
            # and COUNT/SUM/AVG views fold them as SIGNED
            # contributions — no recompute. MIN/MAX views fold too
            # UNLESS a deleted value sits at a stored extremum (the
            # eviction case no stored aggregate can repair — checked
            # per spec below); feed-inexpressible rewrites (COW
            # without change files, compaction) recompute as before.
            delta = None
            try:
                feed = snap.read_snapshot_changes_feed(
                    spark, source_path, last, cur
                )
            except ValueError:
                feed = None
            if feed is None:
                full_group.extend(group)
                continue
        src_df = delta if delta is not None else feed
        many = len(group) > 1
        if many:
            src_df = src_df.persist()
        try:
            for spec in group:
                keys, sums, mins, maxs, avgs = _norm_spec(
                    spec["keys"], spec.get("sum_cols"),
                    spec.get("min_cols"), spec.get("max_cols"),
                    spec.get("avg_cols"),
                )
                old_df = snap.read_snapshot(
                    spark, spec["view_path"], spec["_view_version"]
                )
                needed = keys + _measure_names(sums, mins, maxs)
                if not set(needed) <= set(old_df.columns):
                    # spec evolved (e.g. min/max added): the stored
                    # view can't supply the new measures — recompute
                    full_group.append(spec)
                    continue
                old = old_df.select(needed)
                rescan = None
                if delta is not None:
                    part = _aggregate(src_df, keys, sums, mins, maxs)
                elif mins or maxs:
                    danger = _danger_keys(
                        src_df, old, keys, mins, maxs
                    ).persist()
                    if danger.isEmpty():
                        part = _aggregate_signed_minmax(
                            src_df, keys, sums, mins, maxs
                        )
                    else:
                        # PARTIAL RESCAN: only the groups whose
                        # extremum a delete may have evicted recompute
                        # from the source; every other group still
                        # folds. Aggregation state is O(danger
                        # groups), not O(all groups) — the view never
                        # pays a full re-aggregation for one hot
                        # group's eviction. On a stats-tracked source
                        # with a single group key, the scan itself is
                        # zone-map-pruned to the danger keys' interval
                        # (loose but never wrong — the semi-join below
                        # is the exact filter), so a clustered fact
                        # table pays O(danger files), not O(table
                        # bytes).
                        rescan_src = _pruned_source_for(
                            spark, source_path, cur, danger, keys
                        )
                        rescan = _aggregate(
                            _semi_nullsafe(rescan_src, danger, keys),
                            keys, sums, mins, maxs,
                        )
                        old = _semi_nullsafe(old, danger, keys,
                                             anti=True)
                        part = _aggregate_signed_minmax(
                            _semi_nullsafe(src_df, danger, keys,
                                           anti=True),
                            keys, sums, mins, maxs,
                        )
                else:
                    part = _aggregate_signed(src_df, keys, sums)
                merged = _merge(old, part, keys, sums, mins, maxs)
                if delta is None:
                    # a group whose rows were ALL deleted folds to
                    # n = 0; a recompute would not emit it at all
                    merged = merged.filter(F.col("n") > 0)
                if rescan is not None:
                    merged = merged.unionByName(rescan)
                try:
                    snap.snapshot_write(
                        _finalize(merged, avgs), spec["view_path"],
                        mode="overwrite", protocol=protocol,
                        extra={SOURCE_VERSION_KEY: cur},
                    )
                finally:
                    if (delta is None) and (mins or maxs):
                        danger.unpersist()
        finally:
            if many:
                src_df.unpersist()

    if full_group:
        src = snap.read_snapshot(spark, source_path, cur)
        if len(full_group) > 1:
            src = src.persist()
        try:
            for spec in full_group:
                keys, sums, mins, maxs, avgs = _norm_spec(
                    spec["keys"], spec.get("sum_cols"),
                    spec.get("min_cols"), spec.get("max_cols"),
                    spec.get("avg_cols"),
                )
                full = _aggregate(src, keys, sums, mins, maxs)
                snap.snapshot_write(
                    _finalize(full, avgs), spec["view_path"],
                    mode="overwrite", protocol=protocol,
                    extra={SOURCE_VERSION_KEY: cur},
                )
        finally:
            if len(full_group) > 1:
                src.unpersist()
    return cur


def read_view(spark: SparkSession, view_path: str) -> DataFrame:
    """The materialized aggregate as of its last refresh."""
    return snap.read_snapshot(spark, view_path)


def refresh_distinct_agg_view(
    spark: SparkSession,
    source_path: str,
    view_path: str,
    keys: list[str],
    distinct_col: str,
    protocol: str = "link",
) -> int:
    """Incrementally-maintained per-key APPROX-DISTINCT view: the
    view materializes each group's HyperLogLog register table
    (``keys…, idx, r`` — ≤512 rows per group whatever the group's
    size), and a refresh folds only the appended delta by the HLL
    merge law (element-wise register max), which is EXACT: the merged
    registers are bit-identical to sketching the full source, so the
    estimate never drifts under incremental maintenance. COUNT
    DISTINCT is the canonical non-self-maintainable aggregate — no
    bounded exact state can fold inserts — which is precisely why the
    sketch view is the scale shape (the Materialize/Druid answer):
    refresh cost O(|delta| + |view|), view size O(groups × 512).

    Registers are insert-only: any non-append commit in the range
    (DV delete, rewrite — compactions excepted, they're
    row-preserving) recomputes from the source, exactly like the
    MIN/MAX fallback. Read estimates with
    :func:`read_distinct_view`. Returns the reflected source
    version."""
    from harmony_energy_data_pipeline_spark.operators.analytics import (
        hll_merge_by,
        hll_registers_by,
    )

    cur = snap.latest_version(source_path)
    if cur is None:
        raise FileNotFoundError(f"no snapshots at {source_path}")
    view_v = snap.latest_version(view_path)
    last = None
    if view_v is not None:
        last = snap._read_manifest_raw(view_path, view_v).get(
            SOURCE_VERSION_KEY
        )
    if last == cur:
        return cur  # idempotent: the view is current
    delta = None
    if last is not None:
        try:
            delta = snap.read_snapshot_changes(
                spark, source_path, last, cur
            )
        except ValueError:
            delta = None  # non-append range: registers can't unfold
    if delta is not None:
        part = hll_registers_by(delta, keys, distinct_col)
        merged = hll_merge_by(keys, read_view(spark, view_path), part)
    else:
        merged = hll_registers_by(
            snap.read_snapshot(spark, source_path, cur), keys, distinct_col
        )
    snap.snapshot_write(
        merged, view_path, mode="overwrite", protocol=protocol,
        extra={SOURCE_VERSION_KEY: cur},
    )
    return cur


def read_distinct_view(
    spark: SparkSession, view_path: str, keys: list[str]
) -> DataFrame:
    """Per-key estimates ``(keys…, n_registers, v_zero, scaled_sum,
    est)`` from a :func:`refresh_distinct_agg_view` view as of its
    last refresh."""
    from harmony_energy_data_pipeline_spark.operators.analytics import (
        hll_estimate_by,
    )

    return hll_estimate_by(read_view(spark, view_path), keys)


def _bin_expr(value_col: str, bin_width: float, n_bins: int):
    # identical clamp to operators.analytics.histogram: under/overflow
    # land in the edge bins
    return F.least(
        F.greatest(
            F.floor(F.col(value_col) / F.lit(bin_width)), F.lit(0)
        ),
        F.lit(n_bins - 1),
    ).cast("long")


def refresh_histogram_view(
    spark: SparkSession,
    source_path: str,
    view_path: str,
    keys: list[str],
    value_col: str,
    bin_width: float,
    n_bins: int,
    protocol: str = "link",
) -> int:
    """Incrementally-maintained per-key fixed-width HISTOGRAM view
    ``(keys…, bin, n)`` — the distribution/quantile-monitoring shape.
    Bin counts are SIGNED-self-maintainable: appends fold ``+1`` per
    row, row-level deletes fold ``-1`` through the change feed, and a
    merge-on-read update folds as delete+insert — so unlike MIN/MAX
    (danger rescan) or COUNT DISTINCT (insert-only sketch), the
    histogram absorbs EVERY feed-expressible commit exactly, with no
    fallback and no approximation. Only a feed-inexpressible rewrite
    recomputes. Refresh cost O(|changes| + |view|); view size
    O(groups × n_bins). Approximate quantiles derive from the
    cumulative bins at read time (:func:`histogram_quantiles`).
    Returns the reflected source version."""
    cur = snap.latest_version(source_path)
    if cur is None:
        raise FileNotFoundError(f"no snapshots at {source_path}")
    view_v = snap.latest_version(view_path)
    last = None
    if view_v is not None:
        last = snap._read_manifest_raw(view_path, view_v).get(
            SOURCE_VERSION_KEY
        )
    if last == cur:
        return cur
    feed = None
    if last is not None:
        try:
            feed = snap.read_snapshot_changes_feed(
                spark, source_path, last, cur
            )
        except ValueError:
            feed = None  # rewrite in range: recompute below
    on = [*keys, "bin"]
    if feed is not None:
        sign = F.when(
            F.col("_change_type") == "delete", F.lit(-1)
        ).otherwise(F.lit(1))
        part = feed.select(
            *keys, _bin_expr(value_col, bin_width, n_bins).alias("bin"),
            sign.alias("__s"),
        ).groupBy(*on).agg(F.sum("__s").alias("n"))
        # union + re-group, NOT a full-outer join: groupBy treats a
        # NULL group key as one group, where join keys never match
        # NULL and would split it into duplicate view rows
        merged = (
            read_view(spark, view_path).select(*on, "n")
            .unionByName(part)
            .groupBy(*on).agg(F.sum("n").alias("n"))
            .filter(F.col("n") > 0)
        )
    else:
        merged = (
            snap.read_snapshot(spark, source_path, cur)
            .select(
                *keys,
                _bin_expr(value_col, bin_width, n_bins).alias("bin"),
            )
            .groupBy(*on).agg(F.count("*").alias("n"))
        )
    snap.snapshot_write(
        merged, view_path, mode="overwrite", protocol=protocol,
        extra={SOURCE_VERSION_KEY: cur},
    )
    return cur


def histogram_quantiles(
    bins: DataFrame, keys: list[str], qs: list[float], bin_width: float
) -> DataFrame:
    """Per-key approximate quantiles ``(keys…, q, value)`` from a
    histogram view's bins: the upper edge of the first bin whose
    cumulative count reaches ``q × total`` — deterministic, exact
    given the binning, error bounded by ``bin_width``."""
    from pyspark.sql import Window

    w = Window.partitionBy(*keys).orderBy("bin").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    tot = Window.partitionBy(*keys)
    c = bins.withColumn("__cum", F.sum("n").over(w)).withColumn(
        "__tot", F.sum("n").over(tot)
    )
    out = None
    for q in qs:
        hit = (
            c.filter(F.col("__cum") >= F.col("__tot") * F.lit(float(q)))
            .groupBy(*keys).agg(F.min("bin").alias("__b"))
            .select(
                *keys, F.lit(float(q)).alias("q"),
                ((F.col("__b") + 1) * F.lit(float(bin_width)))
                .alias("value"),
            )
        )
        out = hit if out is None else out.unionByName(hit)
    return out


def _topk_rank(
    df: DataFrame, keys: list[str], order_col: str, k: int,
    descending: bool, tiebreak_cols: list[str],
) -> DataFrame:
    from pyspark.sql import Window

    ob = [
        F.col(order_col).desc_nulls_last()
        if descending else F.col(order_col).asc_nulls_last()
    ]
    ob += [F.col(c).asc() for c in tiebreak_cols]
    w = Window.partitionBy(*keys).orderBy(*ob)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )


def refresh_topk_view(
    spark: SparkSession,
    source_path: str,
    view_path: str,
    keys: list[str],
    order_col: str,
    k: int,
    tiebreak_cols: list[str] | tuple = (),
    payload_cols: list[str] | None = None,
    descending: bool = True,
    protocol: str = "link",
    _shared: tuple | None = None,
) -> int:
    """Incrementally-maintained per-key TOP-K view — the leaderboard /
    keep-best shape: the view stores, for every group, the ``k`` rows
    ranked first by ``order_col`` (then by ``tiebreak_cols``, which
    should make the order TOTAL for deterministic results). Top-k is
    not an aggregate Spark can fold, but it IS insert-monotone, which
    gives it a cheap delta algebra:

    * **appends** — a new row either beats the group's retained set or
      it doesn't; either way ``topk(view ∪ Δ) = topk(table)`` because
      every unretained old row was already beaten by all k retained
      rows. Refresh cost O(|view| + |Δ|), never O(table).
    * **row-level deletes** (DV / MOR, via the change feed) — a delete
      strictly below its group's retained threshold (the k-th value)
      is a proven no-op and folds for free. A delete AT or ABOVE the
      threshold may evict a retained row, whose replacement lives
      below the view's horizon — only those DANGER GROUPS rescan the
      source (zone-map-pruned via :func:`_pruned_source_for`), every
      other group folds. NULL-ordered deletes and groups absent from
      the view rescan conservatively.
    * **feed-inexpressible rewrites** — recompute; never serve stale.

    The view is a snapshot table recording ``ivm_source_version``, so
    refresh is idempotent and crash-safe like the aggregate views.
    Returns the source version the view now reflects."""
    keys = list(keys)
    tiebreak_cols = list(tiebreak_cols)
    cols: list[str] = list(keys)
    for c in [order_col, *tiebreak_cols, *(payload_cols or [])]:
        if c not in cols:
            cols.append(c)
    cur = snap.latest_version(source_path)
    if cur is None:
        raise FileNotFoundError(f"no snapshots at {source_path}")
    view_v = snap.latest_version(view_path)
    last = None
    if view_v is not None:
        last = snap._read_manifest_raw(view_path, view_v).get(
            SOURCE_VERSION_KEY
        )
    if last == cur:
        return cur  # idempotent: the view is current

    def rank(df: DataFrame) -> DataFrame:
        return _topk_rank(df, keys, order_col, k, descending,
                          tiebreak_cols)

    def recompute() -> None:
        src = snap.read_snapshot(spark, source_path, cur).select(*cols)
        snap.snapshot_write(
            rank(src), view_path, mode="overwrite", protocol=protocol,
            extra={SOURCE_VERSION_KEY: cur},
        )

    if last is None:
        recompute()
        return cur
    old_df = read_view(spark, view_path)
    if not set(cols) <= set(old_df.columns):
        recompute()  # spec evolved: stored view lacks the columns
        return cur
    old = old_df.select(*cols)
    # a fan-out refresh (refresh_topk_views) hands every view at the
    # same position ONE persisted change read; use it only when this
    # view's computed range matches the caller's (a racing commit
    # between the group read and this refresh falls back to own reads)
    sh_delta = sh_feed = None
    if _shared is not None and _shared[0] == last and _shared[1] == cur:
        sh_delta, sh_feed = _shared[2], _shared[3]
    danger = None
    try:
        delta = (
            sh_delta if sh_delta is not None
            else snap.read_snapshot_changes(spark, source_path, last, cur)
        )
        merged = rank(old.unionByName(delta.select(*cols)))
    except ValueError:
        try:
            feed = (
                sh_feed if sh_feed is not None
                else snap.read_snapshot_changes_feed(
                    spark, source_path, last, cur
                )
            )
        except ValueError:
            recompute()  # rewrite the feed can't express
            return cur
        ins = feed.filter(
            F.col("_change_type") != "delete"
        ).select(*cols)
        dels = feed.filter(F.col("_change_type") == "delete").select(
            *keys, order_col
        )
        # per-group retained threshold: the weakest value the view
        # still holds — any delete strictly inside it is a no-op
        thr_agg = F.min(order_col) if descending else F.max(order_col)
        thr = old.groupBy(*keys).agg(thr_agg.alias("__thr"))
        d, t = dels.alias("d"), thr.alias("t")
        jc = F.lit(True)
        for kk in keys:
            jc = jc & F.col(f"d.{kk}").eqNullSafe(F.col(f"t.{kk}"))
        reach = (
            F.col(f"d.{order_col}") >= F.col("t.__thr")
            if descending
            else F.col(f"d.{order_col}") <= F.col("t.__thr")
        )
        danger = (
            d.join(t, jc, "left")
            .filter(
                F.col("t.__thr").isNull()          # group absent / all-NULL
                | F.col(f"d.{order_col}").isNull()  # NULL-ordered delete
                | reach
            )
            .select(*[F.col(f"d.{kk}").alias(kk) for kk in keys])
            .distinct()
            .persist()
        )
        if danger.isEmpty():
            merged = rank(old.unionByName(ins))
        else:
            # PARTIAL RESCAN: only the groups whose retained set a
            # delete may have evicted re-rank from the source; every
            # other group folds from view ∪ inserts
            rescan_src = _pruned_source_for(
                spark, source_path, cur, danger, keys
            )
            rescan = rank(
                _semi_nullsafe(rescan_src.select(*cols), danger, keys)
            )
            fold = rank(
                _semi_nullsafe(old, danger, keys, anti=True).unionByName(
                    _semi_nullsafe(ins, danger, keys, anti=True)
                )
            )
            merged = fold.unionByName(rescan)
    try:
        snap.snapshot_write(
            merged, view_path, mode="overwrite", protocol=protocol,
            extra={SOURCE_VERSION_KEY: cur},
        )
    finally:
        if danger is not None:
            danger.unpersist()
    return cur


def refresh_topk_views(
    spark: SparkSession,
    source_path: str,
    specs: list[dict],
    protocol: str = "link",
) -> int:
    """Refresh SEVERAL top-k views of one source table — the fan-out
    shape (one fact stream, many leaderboards): each spec is
    ``{"view_path", "keys", "order_col", "k", "tiebreak_cols"?,
    "payload_cols"?, "descending"?}``. Views at the same reflected
    position share ONE persisted change read per distinct version
    range, so N leaderboards cost one delta scan, not N (the
    :func:`refresh_agg_views` contract). Returns the source version
    all views now reflect."""
    cur = snap.latest_version(source_path)
    if cur is None:
        raise FileNotFoundError(f"no snapshots at {source_path}")
    by_last: dict = {}
    for spec in specs:
        view_v = snap.latest_version(spec["view_path"])
        last = None
        if view_v is not None:
            last = snap._read_manifest_raw(
                spec["view_path"], view_v
            ).get(SOURCE_VERSION_KEY)
        if last != cur:
            by_last.setdefault(last, []).append(spec)
    for last, group in by_last.items():
        delta = feed = None
        if last is not None and len(group) > 1:
            try:
                delta = snap.read_snapshot_changes(
                    spark, source_path, last, cur
                ).persist()
            except ValueError:
                try:
                    feed = snap.read_snapshot_changes_feed(
                        spark, source_path, last, cur
                    ).persist()
                except ValueError:
                    feed = None  # rewrite range: each view recomputes
        try:
            for spec in group:
                refresh_topk_view(
                    spark, source_path, protocol=protocol,
                    _shared=(last, cur, delta, feed), **spec,
                )
        finally:
            if delta is not None:
                delta.unpersist()
            if feed is not None:
                feed.unpersist()
    return cur


#: Manifest key on a JOIN view: the dimension version it reflects.
DIM_VERSION_KEY = "ivm_dim_version"


def _join_dim(fact_df: DataFrame, dim_df: DataFrame, on) -> DataFrame:
    """INNER equi-join of a fact(-delta) against the dimension.
    ``on`` is a list of shared column names, or ``{fact_col:
    dim_col}`` (the dim side is renamed to the fact names first, so
    the output carries one unambiguous copy of each join key)."""
    if isinstance(on, dict):
        for fk, pk in on.items():
            if pk != fk:
                dim_df = dim_df.withColumnRenamed(pk, fk)
        on = list(on.keys())
    return fact_df.join(dim_df, on=list(on), how="inner")


def refresh_join_agg_view(
    spark: SparkSession,
    fact_path: str,
    dim_path: str,
    view_path: str,
    on,
    keys: list[str],
    sum_cols: list[str] | None = None,
    min_cols: list[str] | None = None,
    max_cols: list[str] | None = None,
    avg_cols: list[str] | None = None,
    protocol: str = "link",
) -> tuple[int, int]:
    """Incrementally maintain a FACT ⋈ DIM aggregate view — the
    delta-join MV shape: ``view = agg(keys, measures) over (fact
    INNER JOIN dim ON on)``. Returns ``(fact_version, dim_version)``
    the view now reflects.

    Maintenance algebra (V = γ(F ⋈ D)):

    * **dim unchanged, fact appended** — Δ V = γ(ΔF ⋈ D), folded into
      the stored view. The delta-join costs O(|ΔF| ⋈ D): only the new
      fact rows are scanned and joined (broadcast when the dim is
      small), never the fact history — the property that matters when
      the fact table is 100 TB and the refresh cadence is minutes.
      MIN/MAX participate (inserts only tighten).
    * **dim unchanged, fact changed row-level** (DV deletes / MOR
      updates, via the change feed) — signed fold: insert rows join
      the dim with +1, delete rows with −1; COUNT/SUM are
      group-invertible through the join. MIN/MAX cannot fold a
      deletion without a rescan, so specs with extrema recompute on
      this path (the single-source danger-group analysis does not yet
      extend through a join).
    * **dim changed row-level** — the full delta algebra:
      ``γ(F_new ⋈ D_new) = V_old ⊕ γ(ΔF ⋈ D_new) ⊕ γ(F_old ⋈ ΔD)``
      (expand ``(F_old + ΔF) ⋈ (D_old + ΔD)``). The dim's change feed
      supplies ΔD signed — an updated dim row is delete(old) ⊕
      insert(new), so a fact's group MOVING between dim attributes
      folds as −1 under the old attribute and +1 under the new. The
      ``F_old ⋈ ΔD`` term scans the fact AT ITS OLD VERSION (time
      travel) joined against only the changed dim rows — broadcast
      when small — so cost is O(fact ⋈ ΔD), not a full
      re-aggregation; COUNT/SUM/AVG only (extrema can be evicted by
      the signed deletes, so specs with MIN/MAX recompute here).
    * **dim changed, feed-inexpressible** (overwrite/rewrite without
      change files) — recompute; a stale view is never served.

    The view is a snapshot table recording BOTH positions
    (``ivm_source_version`` = fact, ``ivm_dim_version``), so refresh
    stays idempotent and crash-safe exactly like the single-source
    views."""
    keys, sums, mins, maxs, avgs = _norm_spec(
        keys, sum_cols, min_cols, max_cols, avg_cols
    )
    cur_f = snap.latest_version(fact_path)
    cur_d = snap.latest_version(dim_path)
    if cur_f is None or cur_d is None:
        raise FileNotFoundError(
            f"missing snapshots: fact={fact_path} dim={dim_path}"
        )
    last_f = last_d = None
    view_v = snap.latest_version(view_path)
    if view_v is not None:
        vm = snap._read_manifest_raw(view_path, view_v)
        last_f = vm.get(SOURCE_VERSION_KEY)
        last_d = vm.get(DIM_VERSION_KEY)
    if last_f == cur_f and last_d == cur_d:
        return cur_f, cur_d  # nothing new: no-op
    dim_df = snap.read_snapshot(spark, dim_path, cur_d)
    extra = {SOURCE_VERSION_KEY: cur_f, DIM_VERSION_KEY: cur_d}

    def recompute() -> None:
        fact = snap.read_snapshot(spark, fact_path, cur_f)
        full = _aggregate(_join_dim(fact, dim_df, on), keys, sums,
                          mins, maxs)
        snap.snapshot_write(
            _finalize(full, avgs), view_path, mode="overwrite",
            protocol=protocol, extra=extra,
        )

    if last_f is None:
        recompute()
        return cur_f, cur_d
    needed = keys + _measure_names(sums, mins, maxs)
    old_df = read_view(spark, view_path)
    if not set(needed) <= set(old_df.columns):
        recompute()  # spec evolved: stored view lacks the measures
        return cur_f, cur_d
    old = old_df.select(needed)
    dim_part = None
    signed_path = False
    if last_d != cur_d:
        if mins or maxs:
            # a signed dim delete can evict a stored extremum
            recompute()
            return cur_f, cur_d
        try:
            dim_feed = snap.read_snapshot_changes_feed(
                spark, dim_path, last_d, cur_d
            )
        except ValueError:
            recompute()  # dim rewrite the feed can't express
            return cur_f, cur_d
        # the F_old ⋈ ΔD term: the fact at the version the view
        # already reflects (its OWN delta folds separately below),
        # joined against only the changed dim rows. With a single
        # equi-key, the fact scan is zone-map-pruned to the changed
        # keys' interval first — loose but never wrong (the join is
        # the exact filter), so a fact clustered on its foreign key
        # pays O(files touching the changed keys), not O(fact bytes).
        fk = pk = None
        if isinstance(on, dict) and len(on) == 1:
            fk, pk = next(iter(on.items()))
        elif not isinstance(on, dict) and len(list(on)) == 1:
            fk = pk = list(on)[0]
        fact_old = None
        if fk is not None:
            b = dim_feed.agg(
                F.min(pk).alias("lo"), F.max(pk).alias("hi")
            ).first()
            if b.lo is not None:
                fact_old = snap.read_snapshot(
                    spark, fact_path, last_f, where=[(fk, b.lo, b.hi)]
                )
        if fact_old is None:
            fact_old = snap.read_snapshot(spark, fact_path, last_f)
        dim_part = _aggregate_signed(
            _join_dim(fact_old, dim_feed, on), keys, sums
        )
        signed_path = True
    merged = old
    if last_f != cur_f:
        try:
            delta = snap.read_snapshot_changes(
                spark, fact_path, last_f, cur_f
            )
            part = _aggregate(_join_dim(delta, dim_df, on), keys, sums,
                              mins, maxs)
            merged = _merge(merged, part, keys, sums, mins, maxs)
        except ValueError:
            if mins or maxs:
                # a deletion may have evicted a stored extremum; the
                # danger-group analysis doesn't extend through joins
                recompute()
                return cur_f, cur_d
            try:
                feed = snap.read_snapshot_changes_feed(
                    spark, fact_path, last_f, cur_f
                )
            except ValueError:
                recompute()  # rewrite the feed can't express
                return cur_f, cur_d
            part = _aggregate_signed(
                _join_dim(feed, dim_df, on), keys, sums
            )
            merged = _merge(merged, part, keys, sums, (), ())
            signed_path = True
    if dim_part is not None:
        merged = _merge(merged, dim_part, keys, sums, (), ())
    if signed_path:
        # a group whose contributions all cancelled folds to n = 0;
        # a recompute would not emit it at all
        merged = merged.filter(F.col("n") > 0)
    snap.snapshot_write(
        _finalize(merged, avgs), view_path, mode="overwrite",
        protocol=protocol, extra=extra,
    )
    return cur_f, cur_d


#: Manifest key on a STAR view: {dim_path: version} it reflects.
STAR_VERSIONS_KEY = "ivm_star_versions"


def refresh_star_agg_view(
    spark: SparkSession,
    fact_path: str,
    dims: list[tuple],
    view_path: str,
    keys: list[str],
    sum_cols: list[str] | None = None,
    avg_cols: list[str] | None = None,
    protocol: str = "link",
) -> dict:
    """STAR-SCHEMA incremental view: ``γ(fact ⋈ dim₁ ⋈ … ⋈ dimₙ)``
    with COUNT/SUM/AVG measures. ``dims`` is ``[(dim_path, on), …]``
    (each ``on`` as in :func:`refresh_join_agg_view`). Returns the
    ``{path: version}`` map (fact under its path) the view reflects.

    Delta algebra, generalized one changed input at a time: with at
    most ONE dim changed row-level,
    ``ΔV = γ(ΔF ⋈ D₁' ⋈ … ⋈ Dₙ') ⊕ γ(F_old ⋈ D₁ ⋈ … ⋈ ΔDᵢ ⋈ … ⋈ Dₙ')``
    — the fact delta joins every dim at its NEW version, and the
    changed dim's signed delta joins the fact at its OLD version with
    the other dims at their new (== old, unchanged) versions. Two or
    more dims changing in one refresh window recomputes (the cross
    terms ``F ⋈ ΔDᵢ ⋈ ΔDⱼ`` are where star IVM stops paying for
    itself; Materialize/DBSP handle them with full multilinear
    expansion — at warehouse refresh cadences the multi-dim-change
    window is rare enough that the recompute fallback is the sane
    trade). MIN/MAX are not offered on star views (any signed path
    can evict extrema)."""
    keys, sums, _mins, _maxs, avgs = _norm_spec(
        keys, sum_cols, None, None, avg_cols
    )
    cur_f = snap.latest_version(fact_path)
    if cur_f is None:
        raise FileNotFoundError(f"no snapshots at {fact_path}")
    cur_d = {}
    for dp, _on in dims:
        dv = snap.latest_version(dp)
        if dv is None:
            raise FileNotFoundError(f"no snapshots at {dp}")
        cur_d[dp] = dv
    positions = {fact_path: cur_f, **cur_d}
    last_f = None
    last_d: dict = {}
    view_v = snap.latest_version(view_path)
    if view_v is not None:
        vm = snap._read_manifest_raw(view_path, view_v)
        last_f = vm.get(SOURCE_VERSION_KEY)
        last_d = vm.get(STAR_VERSIONS_KEY) or {}
    extra = {SOURCE_VERSION_KEY: cur_f, STAR_VERSIONS_KEY: cur_d}

    def _join_all(df: DataFrame, skip: str | None = None) -> DataFrame:
        # every dim PINNED at the version captured above — reading
        # "latest" here would let a dim commit racing this refresh
        # into the fold while the manifest records the older version,
        # double-counting that commit's delta on the NEXT refresh
        for dp, on in dims:
            if dp == skip:
                continue
            df = _join_dim(
                df, snap.read_snapshot(spark, dp, cur_d[dp]), on
            )
        return df

    def recompute() -> None:
        full = _aggregate(
            _join_all(snap.read_snapshot(spark, fact_path, cur_f)),
            keys, sums, (), (),
        )
        snap.snapshot_write(
            _finalize(full, avgs), view_path, mode="overwrite",
            protocol=protocol, extra=extra,
        )

    changed_dims = [dp for dp, _on in dims if last_d.get(dp) != cur_d[dp]]
    if last_f is None or len(changed_dims) > 1:
        recompute()
        return positions
    if last_f == cur_f and not changed_dims:
        return positions  # nothing new: no-op
    needed = keys + _measure_names(sums, (), ())
    old_df = read_view(spark, view_path)
    if not set(needed) <= set(old_df.columns):
        recompute()
        return positions
    merged = old_df.select(needed)
    signed = False
    if last_f != cur_f:
        try:
            delta = snap.read_snapshot_changes(
                spark, fact_path, last_f, cur_f
            )
            part = _aggregate(_join_all(delta), keys, sums, (), ())
        except ValueError:
            try:
                feed = snap.read_snapshot_changes_feed(
                    spark, fact_path, last_f, cur_f
                )
            except ValueError:
                recompute()
                return positions
            part = _aggregate_signed(_join_all(feed), keys, sums)
            signed = True
        merged = _merge(merged, part, keys, sums, (), ())
    if changed_dims:
        dp = changed_dims[0]
        if dp not in last_d:
            # the dim LIST itself changed since the last refresh —
            # the stored view was computed over a different join
            recompute()
            return positions
        on = next(o for p, o in dims if p == dp)
        try:
            dim_feed = snap.read_snapshot_changes_feed(
                spark, dp, last_d[dp], cur_d[dp]
            )
        except ValueError:
            recompute()
            return positions
        fact_old = snap.read_snapshot(spark, fact_path, last_f)
        part = _aggregate_signed(
            _join_all(_join_dim(fact_old, dim_feed, on), skip=dp),
            keys, sums,
        )
        merged = _merge(merged, part, keys, sums, (), ())
        signed = True
    if signed:
        merged = merged.filter(F.col("n") > 0)
    snap.snapshot_write(
        _finalize(merged, avgs), view_path, mode="overwrite",
        protocol=protocol, extra=extra,
    )
    return positions


__all__ = [
    "refresh_agg_view", "refresh_agg_views", "refresh_join_agg_view",
    "refresh_star_agg_view", "refresh_distinct_agg_view",
    "refresh_topk_view", "refresh_topk_views",
    "read_view", "read_distinct_view",
    "SOURCE_VERSION_KEY", "DIM_VERSION_KEY", "STAR_VERSIONS_KEY",
]
