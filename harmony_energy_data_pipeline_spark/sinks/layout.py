"""Z-order (Morton-curve) data layout: multi-dimensional clustering
for parquet data skipping.

A table range-partitioned and sorted on ONE column skips files well
for predicates on that column and poorly for every other. Interleaving
the bits of several bucketed dimensions into one Morton key and
range-sorting on it keeps rows that are close in ANY clustered
dimension close on disk, so parquet min/max stats prune files for
predicates on each dimension — the standard multi-dimensional layout
technique for 100 TB fact tables (cf. the DataBricks/Iceberg Z-ORDER
DDLs; here it is an explicit, engine-portable expression).

The key is pure Catalyst bit arithmetic (shift/and/or — unrolled at
plan-build time, whole-stage codegen'd): no UDF in the layout path.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from harmony_energy_data_pipeline_spark.sinks.pathnorm import normalizes_paths


def zorder_key(cols: list[Column | str], bits: int = 16) -> Column:
    """Morton-interleave the low ``bits`` bits of each (non-negative
    integer) column: column j's bit i lands at output position
    ``i * len(cols) + j``. Callers pre-bucket real-valued or
    high-cardinality dimensions (e.g. ``sampling.split_bucket`` or
    cents-clamping) — the key only sees small ints.

    2 cols × 16 bits → a 32-bit key; 3 × 16 → 48 bits (still a long).
    ``len(cols) * bits`` must stay ≤ 63: position 63 is the BIGINT
    sign bit (negative keys invert the range-sort order) and shifts
    ≥ 64 wrap mod 64 on the JVM, aliasing high bits onto low
    positions — either way the locality the layout exists for breaks
    silently, so over-wide configurations are rejected here.
    """
    ncols = [F.col(c) if isinstance(c, str) else c for c in cols]
    n = len(ncols)
    if n * bits > 63:
        raise ValueError(
            f"zorder_key width {n}*{bits}={n * bits} exceeds 63 usable "
            f"BIGINT bits; lower bits to <= {63 // n} for {n} columns"
        )
    terms = [
        F.shiftleft(F.shiftright(c.cast("long"), i).bitwiseAND(F.lit(1)), i * n + j)
        for i in range(bits)
        for j, c in enumerate(ncols)
    ]
    return reduce(lambda a, b: a.bitwiseOR(b), terms)


def zorder_key_sql(cols: list[str], bits: int = 16) -> str:
    """The identical Morton expression as ANSI SQL text (the DuckDB
    oracle twin of :func:`zorder_key` — same unroll, same positions)."""
    n = len(cols)
    terms = [
        f"((({c} >> {i}) & 1) << {i * n + j})"
        for i in range(bits)
        for j, c in enumerate(cols)
    ]
    return " | ".join(terms)


def string_rank64(col: Column | str) -> Column:
    """Order-preserving 60-bit integer image of a STRING dimension —
    what lets z-order interleave strings next to numerics (the Delta
    ``ZORDER BY`` string support shape): the first 15 hex digits
    (7.5 bytes) of the UTF-8 encoding, zero-padded, read base-16.
    Lexicographic byte order == numeric order by construction; ties
    beyond the prefix share a bucket, which only costs layout
    resolution, never correctness. Pure Catalyst (encode/hex/conv),
    and small enough (< 2^60) that double bucket arithmetic keeps
    full resolution. NULLs stay NULL (range-partitioned first)."""
    c = F.col(col) if isinstance(col, str) else col
    h = F.hex(F.encode(c, "UTF-8"))
    return F.conv(
        F.rpad(F.substring(h, 1, 15), 15, "0"), 16, 10
    ).cast("long")


def string_rank64_py(s: str) -> int:
    """Driver-side mirror of :func:`string_rank64` — converts STRING
    zone-map bounds to the rank domain so a stats-tracked table
    z-orders on string dimensions metadata-only."""
    h = s.encode("utf-8").hex().upper()[:15]
    return int(h.ljust(15, "0"), 16) if h else 0


def scale_to_bits(
    col: Column | str, lo: float, hi: float, bits: int = 16
) -> Column:
    """Affine-bucket a dimension into [0, 2**bits): z-ordering only
    interleaves fairly when every dimension spans the same bit width —
    a 4-bit dimension interleaved with a 16-bit one degenerates to a
    plain sort on the wider one (its high bits dominate the key).
    Bounds come from stats the caller already has (table min/max);
    values outside clamp to the edge buckets."""
    c = F.col(col) if isinstance(col, str) else col
    n = 1 << bits
    # Integer-inclusive domains use span hi-lo+1 (each of the hi-lo+1
    # values gets an equal bucket run); REAL-valued domains must use
    # span hi-lo — the +1 would waste the top fraction of the bucket
    # range whenever the span is small (e.g. a [0, 0.1] discount maps
    # into only 1/11th of the buckets, zeroing the dimension's high
    # bits and degrading the interleave to a sort on the other cols).
    is_integral = float(lo).is_integer() and float(hi).is_integer()
    span = (hi - lo + 1) if is_integral else (hi - lo)
    bucket = F.floor((c - F.lit(lo)) * F.lit(n) / F.lit(span))
    return F.least(F.greatest(bucket, F.lit(0)), F.lit(n - 1)).cast("long")


@normalizes_paths('path')
def zorder_write(
    df: DataFrame,
    cols: list[Column | str],
    path: str,
    bits: int = 16,
    num_partitions: int | None = None,
    fmt: str = "parquet",
    snapshot_log: bool = True,
    stats_cols: list[str] | None = None,
) -> None:
    """Range-partition on the Morton key, sort within partitions, and
    write: each output file then covers a compact hyper-rectangle of
    the clustered dimensions, so its parquet min/max row-group stats
    prune scans filtered on ANY of them.

    One range shuffle (sampled boundaries — balanced even when the
    key space is sparse), the sort is partition-local, and the key
    column is dropped before write (it is a layout device, not data).

    By default (round 4) the rewrite lands as a SNAPSHOT-LOG commit:
    new files under ``<path>/data/<txid>/``, one manifest publish, so
    a concurrent reader holding the previous version's frozen file
    list is never torn or FileNotFound'd mid-rewrite — read back with
    ``sinks.snapshots.read_zorder``/``read_snapshot`` (and re-cluster
    a live table as often as compaction policy wants). Pass
    ``snapshot_log=False`` for a flat directory readable by plain
    ``spark.read.parquet(path)``, which lands via the marker-protected
    directory swap (single-writer, reader-retry contract).
    """
    import os
    import shutil
    import uuid

    keyed = df.withColumn("__z", zorder_key(cols, bits))
    parted = (
        keyed.repartitionByRange(num_partitions, "__z")
        if num_partitions
        else keyed.repartitionByRange("__z")
    )
    sorted_df = parted.sortWithinPartitions("__z").drop("__z")
    if snapshot_log:
        from harmony_energy_data_pipeline_spark.sinks.snapshots import (
            snapshot_publish_staged,
        )

        txid = uuid.uuid4().hex[:12]
        sorted_df.write.mode("error").format(fmt).save(
            os.path.join(path, "data", txid)
        )
        # Z-order clusters EVERY keyed dimension into compact per-file
        # ranges, so zone maps on the clustered columns (default) make
        # the manifest prunable on any of them — layout and file
        # skipping compose.
        if stats_cols is None:
            stats_cols = [c for c in cols if isinstance(c, str)]
        snapshot_publish_staged(
            path, txid,
            extra={"format": fmt, "layout": {"zorder": True, "bits": bits}},
            stats_cols=stats_cols or None,
            schema=sorted_df.schema.jsonValue(),
        )
        return
    tmp = f"{path.rstrip('/')}.__tmp_{uuid.uuid4().hex[:8]}"
    sorted_df.write.mode("overwrite").format(fmt).save(tmp)
    # marker-protected swap (shared with the legacy JSONL export): a
    # crash mid-swap rolls forward instead of stranding the rewrite
    from harmony_energy_data_pipeline_spark.sinks.dirswap import swap_dir_commit

    try:
        swap_dir_commit(path, tmp)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


@normalizes_paths('path')
def read_zorder(spark, path: str, fmt: str = "parquet"):
    """Read a ``zorder_write`` table regardless of which publication
    mode produced it: snapshot-log tables resolve the latest manifest
    (frozen file list), flat tables read the directory."""
    import os

    if os.path.isdir(os.path.join(path, "_snapshots")):
        from harmony_energy_data_pipeline_spark.sinks.snapshots import (
            read_snapshot,
        )

        return read_snapshot(spark, path)
    return spark.read.format(fmt).load(path)


__all__ = [
    "zorder_key", "zorder_key_sql", "scale_to_bits", "zorder_write",
    "read_zorder", "string_rank64", "string_rank64_py",
]
