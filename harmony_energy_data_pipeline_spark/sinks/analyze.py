"""ANALYZE for snapshot tables — table-level column statistics in the
log, and the layout advisor that consumes them.

``snapshot_analyze`` is the ``ANALYZE TABLE … COMPUTE STATISTICS FOR
COLUMNS`` shape: ONE stacked pass over the live rows computes, per
column, the null count, min/max, and an NDV estimate from the
engine-portable HyperLogLog sketch (operators/analytics.py — integer
register arithmetic, so the estimate is bit-reproducible on any
engine, and an EXACT-equality oracle can check an approximate
statistic). Results commit METADATA-ONLY (empty delta, one small JSON
write however large the table) stamped with the version they were
computed at, so staleness is always explicit.

Why table-level stats when the manifest already has per-file zone
maps: zone maps answer "can this FILE match" — they say nothing about
cardinality. NDV is what layout and strategy decisions actually key
on: a 100 TB fact table merges by a key whose NDV ≈ row count
(bucket it), partitions by a column with NDV in the tens (hive it),
and clusters by the column range queries filter on.
``suggest_layout`` encodes exactly those rules and nothing
speculative — every suggestion names the statistic it derives from.

Scale: the stacked NDV pass is one map-side-combined shuffle onto
``cols × 512`` register rows whatever the table size; min/max/nulls
are one aggregate. Cost O(live bytes) once, reused by every
planning decision until the next ANALYZE.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from harmony_energy_data_pipeline_spark.sinks import snapshots as snap

#: Manifest key: {"computed_at_version", "n_rows", "columns": {...}}
COLUMN_STATS_KEY = "column_stats"

#: Types the portable NDV hash is sound for (string form is
#: render-identical across engines — same contract as bucket routing).
#: float/double admit through the CANONICAL ENCODING below, not the
#: raw string render (which differs between engines).
_NDV_OK_TYPES = {"byte", "short", "integer", "long", "string", "date",
                 "boolean", "float", "double"}


def _bq(col: str) -> str:
    """Backtick-quote a column name for generated SQL — matching
    ``F.col`` semantics, so non-identifier names (``col-k9``) survive
    the ``F.expr`` round-trip. Embedded backticks escape by
    doubling, per the Spark/Hive identifier rule."""
    return "`" + col.replace("`", "``") + "`"


def _ndv_canon_sql(col: str, type_name: str) -> str:
    """The portable hash INPUT for one column, as a SQL expression
    valid (and render-identical) in BOTH Spark and DuckDB.

    Floats/doubles have no portable string render (Spark says
    ``0E-9`` where DuckDB says ``0.000000000``, and double→decimal
    conversions round differently past 2⁵³), so they canonicalize
    piecewise:

    * ``|v| < 8e9`` → ``round(v·10⁶)`` as a scale-0 decimal string —
      the product stays under 2⁵³ so the integer is EXACT in both
      engines. Float NDV is therefore *distinct-at-1e-6-precision*
      (values closer than 5e-7 collapse) — a defined, documented
      statistic rather than an engine-dependent one.
    * beyond → a sign+decade bucket (``big+12``): astronomical values
      collapse per decade (conservative undercount, named in docs).
    * NaN/±Inf → named tokens.
    """
    q = _bq(col)
    if type_name in ("float", "double"):
        return (
            f"CASE WHEN isnan({q}) THEN 'nan' "
            f"WHEN {q} = CAST('Infinity' AS DOUBLE) THEN 'inf' "
            f"WHEN {q} = CAST('-Infinity' AS DOUBLE) THEN '-inf' "
            f"WHEN abs({q}) < 8.0e9 THEN "
            f"CAST(CAST(round({q} * 1000000) AS DECIMAL(38,0)) "
            f"AS STRING) "
            f"ELSE concat('big', CASE WHEN {q} < 0 THEN '-' "
            f"ELSE '+' END, "
            f"CAST(CAST(round(log10(abs({q}))) AS INT) AS STRING)) "
            f"END"
        )
    return f"CAST({q} AS STRING)"


def _json_safe(v):
    try:
        json.dumps(v)
        return v
    except (TypeError, ValueError):
        return str(v)


def snapshot_analyze(
    spark: SparkSession,
    path: str,
    cols: list[str] | None = None,
    protocol: str = "link",
) -> int:
    """Compute and commit column statistics for the table's LATEST
    version. ``cols`` defaults to every column of a portable type.
    Returns the metadata-only commit's version."""
    v = snap.latest_version(path)
    if v is None:
        raise FileNotFoundError(f"no snapshots at {path}")
    df = snap.read_snapshot(spark, path, version=v)
    types = {f.name: f.dataType.typeName() for f in df.schema.fields}
    if cols is None:
        cols = [c for c in df.columns if types[c] in _NDV_OK_TYPES]
    missing = [c for c in cols if c not in df.columns]
    if missing:
        raise ValueError(f"analyze columns not in the table: {missing}")
    bad = [c for c in cols if types[c] not in _NDV_OK_TYPES]
    if bad:
        raise ValueError(
            f"columns {bad} have non-portable types for the NDV hash; "
            f"supported: {sorted(_NDV_OK_TYPES)}"
        )
    from harmony_energy_data_pipeline_spark.operators.analytics import (
        hll_estimate_by,
        hll_registers_by,
    )

    # one aggregate: row count, per-column non-null counts and bounds
    aggs = [F.count("*").alias("__n")]
    for c in cols:
        aggs += [
            F.count(c).alias(f"nn:{c}"),
            F.min(c).alias(f"mn:{c}"),
            F.max(c).alias(f"mx:{c}"),
        ]
    base = df.agg(*aggs).first()
    n_rows = base["__n"]
    # one stacked pass: every column's values as (col, val-string)
    # rows, sketched by ONE grouped HLL — cols × 512 register rows
    # out of a shuffle with map-side combine, never O(rows) state
    stacked = df.select(
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(c).alias("col"),
                    F.expr(_ndv_canon_sql(c, types[c])).alias("val"),
                )
                for c in cols
            ])
        ).alias("kv")
    ).select("kv.col", "kv.val")
    est = {
        r["col"]: r["est"]
        for r in hll_estimate_by(
            hll_registers_by(stacked, ["col"], "val"), ["col"]
        ).collect()
    }
    stats = {
        "computed_at_version": v,
        "n_rows": int(n_rows),
        "columns": {
            c: {
                "type": types[c],
                "n_nulls": int(n_rows - base[f"nn:{c}"]),
                "ndv_est": float(est.get(c, 0.0)),
                "min": _json_safe(base[f"mn:{c}"]),
                "max": _json_safe(base[f"mx:{c}"]),
            }
            for c in cols
        },
    }
    return snap._commit_metadata_only(
        path, lambda pm: {COLUMN_STATS_KEY: stats}, "analyze", protocol
    )


def snapshot_column_stats(path: str, version: int | None = None) -> dict | None:
    """The most recent ANALYZE result at or before ``version``
    (default: latest), or None if the table was never analyzed. The
    walk reads raw manifests backward — stats are version-stamped, so
    the caller always sees how stale they are
    (``latest - computed_at_version`` commits)."""
    v = snap.latest_version(path) if version is None else version
    if v is None:
        raise FileNotFoundError(f"no snapshots at {path}")
    while v is not None and v >= 0:
        m = snap._read_manifest_raw(path, v)
        cs = m.get(COLUMN_STATS_KEY)
        if cs is not None:
            return cs
        v = m.get("parent")
    return None


def analyzed_ndv(df_or_stats, col: str) -> float | None:
    cs = df_or_stats
    if cs is None:
        return None
    c = cs.get("columns", {}).get(col)
    return None if c is None else c.get("ndv_est")


#: NDV at or below this → a hive partition column is sane (file count
#: stays bounded); the Delta partitioning guidance order of magnitude.
_PARTITION_NDV_MAX = 200
#: NDV fraction of rows at or above this → the column behaves like a
#: key: bucket it for merge/point-lookup scoping.
_KEY_NDV_FRACTION = 0.5


def suggest_layout(spark: SparkSession, path: str) -> list[dict]:
    """Layout advisor: reads the table's ANALYZE stats + file-level
    info and returns ``[{suggestion, column?, reason}, …]`` — each
    suggestion names the statistic it derives from; no stats, no
    advice (it tells you to ANALYZE first). Rules:

    * key-like column (NDV ≈ rows, portable type) and no bucket spec
      → ``bucket_by``: merge/point-lookup scoping with zero per-file
      metadata.
    * low-NDV column and no partition spec → ``partition_by``: exact
      planning-time pruning, bounded directory fan-out.
    * stats-tracked columns whose zone maps don't prune (no cluster
      layout) are the maintenance module's domain — here we only
      flag a table whose read patterns must rely on full scans.
    """
    info = snap.snapshot_table_info(path)
    cs = snapshot_column_stats(path)
    if cs is None:
        return [{
            "suggestion": "analyze",
            "reason": "no column statistics in the log; run "
                      "snapshot_analyze first",
        }]
    out: list[dict] = []
    n = max(cs.get("n_rows", 0), 1)
    staleness = info["version"] - cs["computed_at_version"]
    if staleness > 20:
        out.append({
            "suggestion": "re-analyze",
            "reason": f"stats are {staleness} commits old",
        })
    for c, st in sorted(cs.get("columns", {}).items()):
        ndv = st.get("ndv_est") or 0.0
        if (
            ndv >= _KEY_NDV_FRACTION * n
            and not info.get("bucket_spec")
            and st["type"] in snap._BUCKET_OK_TYPES
        ):
            out.append({
                "suggestion": "bucket_by", "column": c,
                "reason": f"NDV≈{ndv:.0f} of {n} rows (key-like): "
                          "bucketing scopes merges and point lookups "
                          "to 1/n of the files",
            })
        elif 1 < ndv <= _PARTITION_NDV_MAX and not info.get(
            "partition_cols"
        ):
            out.append({
                "suggestion": "partition_by", "column": c,
                "reason": f"NDV≈{ndv:.0f}: hive partitioning gives "
                          "exact pruning with bounded directories",
            })
    if not info.get("stats_coverage") and not info.get("partition_cols"):
        out.append({
            "suggestion": "stats_cols",
            "reason": "no zone maps recorded: every predicate scans "
                      "all files; re-write or compact with stats_cols",
        })
    out.extend(_clustering_advice(path, info))
    return out


#: Per-file spans averaging above this fraction of the column's
#: domain mean the zone maps can't skip anything — the unclustered
#: signature a range-clustered or z-ordered rewrite fixes.
_UNCLUSTERED_SPAN = 0.5


def _clustering_advice(path: str, info: dict) -> list[dict]:
    """Zone-map EFFECTIVENESS advice: a stats-tracked NUMERIC column
    whose files each span most of the domain has pruning-useless
    stats (the round-written-unclustered signature); the fix is a
    clustered/z-ordered compaction, and the evidence is the measured
    span ratio, not a guess."""
    m = snap._read_manifest(path, info["version"])
    stats = m.get("stats") or {}
    if len(m.get("files", [])) < 3:
        return []
    per_col: dict[str, list] = {}
    for s in stats.values():
        for c, e in s.items():
            if c.startswith("#") or not isinstance(e, list):
                continue
            lo, hi = e[0], e[1]
            if isinstance(lo, (int, float)) and isinstance(
                hi, (int, float)
            ) and not isinstance(lo, bool) and not isinstance(hi, bool):
                per_col.setdefault(c, []).append((float(lo), float(hi)))
    out = []
    for c, spans in sorted(per_col.items()):
        if len(spans) < 3:
            continue
        glo = min(lo for lo, _ in spans)
        ghi = max(hi for _, hi in spans)
        if ghi <= glo:
            continue
        ratio = sum(hi - lo for lo, hi in spans) / (
            len(spans) * (ghi - glo)
        )
        if ratio >= _UNCLUSTERED_SPAN:
            out.append({
                "suggestion": "cluster_by", "column": c,
                "reason": f"files span {ratio:.0%} of {c}'s domain on "
                          "average — its zone maps can't prune; "
                          "re-cluster via snapshot_compact("
                          f"cluster_by=['{c}']) or zorder_by",
            })
    return out


__all__ = [
    "snapshot_analyze", "snapshot_column_stats", "suggest_layout",
    "analyzed_ndv", "COLUMN_STATS_KEY",
]
