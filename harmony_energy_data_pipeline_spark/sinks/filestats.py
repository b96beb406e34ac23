"""Per-file column statistics (zone maps) for the snapshot log.

At 100 TB the dominant scan cost is files you did not need to open.
Iceberg and Delta both answer this with per-file min/max column
statistics carried in table metadata, consulted at planning time to
skip whole files before the engine schedules a single task. This
module is that mechanism for the manifest-based snapshot log
(``sinks.snapshots``):

* at COMMIT time, the writer reads each new parquet file's FOOTER
  (row-group statistics — metadata-only, no data pages) and records
  ``{column: [min, max]}`` per file in the manifest;
* at READ time, ``read_snapshot(..., where=[(col, lo, hi), ...])``
  drops every file whose recorded interval cannot overlap the
  predicate, then applies the same predicate as a residual DataFrame
  filter — pruning is an optimization, never a semantics change.

Conservatism contract: a file with no recorded stats for a predicate
column (older commit, all-null column, unsupported type, non-parquet
format) is always KEPT. Pruning can only ever skip files whose
recorded bounds PROVE no row can match.

Values are canonicalized to a JSON-stable, totally-ordered form:
numbers stay numbers, booleans widen to ints, date/datetime become
epoch microseconds, strings stay strings (parquet writers truncate
string stats only in bound-preserving ways). Unsupported types
(binary, nested) record no stats.

Reference scope note: the reference's single SQLite table relies on
B-tree indexes for selective reads (src/db/models.py); zone-map file
skipping is the parquet-lake equivalent of that access path.
"""

from __future__ import annotations

import datetime as _dt
from concurrent.futures import ThreadPoolExecutor


def _canon(v):
    """Canonical ordered form for a stat/predicate value, or None if
    the type is unsupported (no stats recorded → file kept)."""
    if v is None:
        return None
    if isinstance(v, bool):
        return int(v)
    if isinstance(v, int):
        return v
    if isinstance(v, float):
        return None if v != v else v  # NaN bounds are meaningless
    if isinstance(v, _dt.datetime):
        if v.tzinfo is not None:
            v = v.astimezone(_dt.timezone.utc).replace(tzinfo=None)
        epoch = _dt.datetime(1970, 1, 1)
        return int((v - epoch) / _dt.timedelta(microseconds=1))
    if isinstance(v, _dt.date):
        return int(
            (v - _dt.date(1970, 1, 1)) / _dt.timedelta(days=1)
        ) * 86_400_000_000
    if isinstance(v, str):
        return v
    # pandas.Timestamp & friends: duck-type via to_pydatetime
    to_py = getattr(v, "to_pydatetime", None)
    if to_py is not None:
        return _canon(to_py())
    return None


def file_column_stats(fpath: str, cols: list[str]) -> dict:
    """``{col: [min, max]}`` from ``fpath``'s parquet footer, for the
    requested columns only, plus the file's exact row count under the
    reserved ``"#rows"`` key (the ``#`` prefix cannot collide with a
    SQL-addressable column and is excluded wherever tracked COLUMNS
    are derived from recorded stats). Row counts make manifest-only
    aggregates possible — ``snapshot_stats_agg`` answers COUNT(*)
    without scanning a byte. A column whose stats are absent in ANY
    row group (or whose type is unsupported) gets no entry. Footer
    read only — cost is O(row groups), independent of data size."""
    import pyarrow.parquet as pq

    want = set(cols)
    out: dict[str, list | None] = {}
    try:
        md = pq.ParquetFile(fpath).metadata
    except Exception:
        return {}  # not parquet / unreadable: no stats, file stays kept
    out["#rows"] = int(md.num_rows)
    for rg in range(md.num_row_groups):
        rgm = md.row_group(rg)
        for ci in range(rgm.num_columns):
            c = rgm.column(ci)
            name = c.path_in_schema
            if name not in want or out.get(name, "") is None:
                continue
            st = c.statistics
            if st is None or not st.has_min_max:
                out[name] = None  # this file is unprunable on `name`
                continue
            mn, mx = _canon(st.min), _canon(st.max)
            if mn is None or mx is None:
                out[name] = None
                continue
            cur = out.get(name)
            if cur is None or cur == "":
                out[name] = [mn, mx]
            else:
                out[name] = [min(cur[0], mn), max(cur[1], mx)]
    return {k: v for k, v in out.items() if v is not None}


def collect_file_stats(files: list[str], cols: list[str]) -> dict:
    """Footer stats for many files, keyed by path. Thread-parallel —
    footer reads are I/O-bound; at commit time this touches only the
    NEW files of the commit (appends carry parent stats forward in
    the manifest), so cost tracks commit size, not table size."""
    if not files or not cols:
        return {}
    with ThreadPoolExecutor(max_workers=min(16, len(files))) as ex:
        stats = list(ex.map(lambda f: file_column_stats(f, cols), files))
    return {f: s for f, s in zip(files, stats) if s}


def file_matches(
    stats: dict | None, predicates: list[tuple]
) -> bool:
    """Could a file with these recorded stats contain a matching row?
    ``predicates`` are inclusive intervals ``(col, lo, hi)`` (None =
    open end), AND-combined. Missing stats for a column → True
    (conservative); incomparable types → True (conservative)."""
    if not stats:
        return True
    for col, lo, hi in predicates:
        entry = stats.get(col)
        if entry is None:
            continue
        mn, mx = entry
        try:
            if lo is not None:
                clo = _canon(lo)
                if clo is not None and mx < clo:
                    return False
            if hi is not None:
                chi = _canon(hi)
                if chi is not None and mn > chi:
                    return False
        except TypeError:
            continue  # stats/predicate types don't compare: keep
    return True


# --- membership sketches: equality-predicate file skipping ------------------------
#
# Zone maps only skip files when the predicate column is CLUSTERED
# (sorted/z-ordered layouts give tight per-file ranges). For point
# lookups on an unclustered high-cardinality column — "this user",
# "this order" — every file's [min, max] spans the domain and nothing
# prunes. The lake answer is a per-file membership structure (Delta's
# bloom filter index, Iceberg's bloom_filter write option): here a
# 4096-bucket one-hash Bloom bitmap (512 bytes base64 in the
# manifest) over the PORTABLE 60-bit md5 hash, whose Python twin lets
# the planner test `col = v` membership driver-side with no Spark
# job. A set bit the value lacks can only produce a conservative
# keep (false positive), never a wrong skip; a file whose sketch
# saturates past 75% records nothing (no pruning value).
#
# Collection reads the commit's new files ONCE (column-pruned scan) —
# unlike zone maps it is not footer-only, which is why it is a
# separate opt-in (``member_cols=``).

import base64

_MEMBER_BITS = 4096


def _h60(s: str) -> int:
    import hashlib

    h = int.from_bytes(hashlib.md5(s.encode()).digest()[8:16], "little")
    return h & ((1 << 60) - 1)


def portable_bucket(value, bits: int = _MEMBER_BITS) -> int | None:
    """Driver-side twin of ``pmod(portable_hash60(v), bits)``: the low
    60 bits of the little-endian tail of md5(str(v)). Only int and
    str values are supported (their Python ``str()`` form matches
    Spark's CAST AS STRING); anything else returns None → the
    membership check is skipped (conservative keep)."""
    if isinstance(value, bool) or not isinstance(value, (int, str)):
        return None
    return _h60(str(value)) % bits


def portable_buckets_k(value, bits: int, k: int) -> list[int] | None:
    """The k Bloom positions of ``value`` under double hashing
    [Kirsch & Mitzenmacher 2006]: ``(h1 + i*h2) mod bits`` with
    ``h2`` forced odd (coprime to the power-of-two ``bits``, so the
    probe sequence never degenerates). Twin of the Spark expression
    in :func:`collect_member_sketches`."""
    if isinstance(value, bool) or not isinstance(value, (int, str)):
        return None
    s = str(value)
    h1 = _h60(s) % bits
    h2 = (_h60(s + "#") % bits) | 1
    return [(h1 + i * h2) % bits for i in range(k)]


def _pack_bits(buckets, bits: int) -> str:
    arr = bytearray(bits // 8)
    for b in buckets:
        arr[b >> 3] |= 1 << (b & 7)
    return base64.b64encode(bytes(arr)).decode("ascii")


#: Folding stops once the next halving would push the fill factor
#: past this (FPR at fill f with k probes is f^k: 0.5^5 ≈ 3%, still a
#: decisive pruning filter), or below this floor.
_FOLD_MAX_FILL = 0.5
_FOLD_MIN_BITS = 4096

#: Folding stops while the projected per-probe false-positive rate —
#: fill^k for a k-hash Bloom — stays at or under this. The round-9
#: bucket-vs-sketch measurement (`tools/measure_bucket_scale.py`)
#: caught the previous flat 0.5 fill cap folding a 3-hash sketch to
#: fill 0.35 (FP 4.2%/key): an 8-key merge rewrote 24 files where 8
#: were true — fold savings paid back as rewrite amplification. At 2%
#: the same merge rewrites ~9.
_FOLD_FP_TARGET = 0.02


def _fold_to_fit(buckets: set, bits: int, hashes: int = 1) -> tuple[set, int]:
    """Shrink an over-provisioned bitmap by FOLDING: position p in the
    half-size table collects every p' ≡ p (mod bits/2). For
    power-of-two tables this is EXACT, not approximate — the double-
    hash probe (h1 + i·h2) mod bits commutes with mod bits/2
    (``x mod 2^k = (x mod 2^{k+1}) mod 2^k`` and the ``|1`` on h2
    only touches bit 0, inside any table's low bits), so the folded
    bitmap is bit-identical to one collected directly at the smaller
    size. One table-wide ``member_bits`` sized for the LARGEST file
    therefore no longer taxes every small file ~87 KB: each file's
    sketch folds to its own cardinality — but never past the point
    where the folded FP rate (fill^hashes, bounded by the pre-
    collision fill estimate) would exceed ``_FOLD_FP_TARGET``: a
    sketch that no longer prunes is worse than a bigger one."""
    while bits // 2 >= _FOLD_MIN_BITS:
        fill = len(buckets) / (bits // 2)
        if fill > _FOLD_MAX_FILL or fill ** hashes > _FOLD_FP_TARGET:
            break
        bits //= 2
        buckets = {b % bits for b in buckets}
    return buckets, bits


def _pack_sketch(buckets, bits: int, hashes: int):
    """Manifest form of one bitmap: fold to the file's own cardinality
    (see :func:`_fold_to_fit`), then store DEFLATE-compressed
    (``zb64``) whenever that wins ≥ 25% — together typically 5-50×
    smaller than the collection shape, which is what keeps
    checkpoints of sketch-heavy tables readable at lake file counts.
    Default-shape sketches keep the legacy bare-b64 form; readers
    accept all three via :func:`sketch_bytes`."""
    import zlib

    if bits == _MEMBER_BITS and hashes == 1:
        arr = bytearray(bits // 8)
        for b in buckets:
            arr[b >> 3] |= 1 << (b & 7)
        return base64.b64encode(bytes(arr)).decode("ascii")  # legacy
    buckets, bits = _fold_to_fit(set(buckets), bits, hashes)
    arr = bytearray(bits // 8)
    for b in buckets:
        arr[b >> 3] |= 1 << (b & 7)
    raw = bytes(arr)
    comp = zlib.compress(raw, 6)
    if len(comp) <= 0.75 * len(raw):
        return {
            "bits": bits, "k": hashes,
            "zb64": base64.b64encode(comp).decode("ascii"),
        }
    return {
        "bits": bits, "k": hashes,
        "b64": base64.b64encode(raw).decode("ascii"),
    }


def sketch_bits(sketch) -> int:
    """A sketch's bucket count. Legacy entries are bare base64
    strings of the 4096-bit default; sized entries are
    ``{"bits": n, "k": h, "b64": ...}``."""
    if isinstance(sketch, dict):
        return int(sketch["bits"])
    return _MEMBER_BITS


def sketch_hashes(sketch) -> int:
    """Bloom hash count: 1 for legacy bare-b64 entries."""
    if isinstance(sketch, dict):
        return int(sketch.get("k", 1))
    return 1


def sketch_bytes(sketch) -> bytes:
    """Decode the bitmap ONCE; callers probing many values against
    one sketch must hold this instead of re-decoding per probe.
    Accepts legacy bare-b64, sized ``{"b64"}``, and compressed
    ``{"zb64"}`` entries."""
    if isinstance(sketch, dict) and "zb64" in sketch:
        import zlib

        return zlib.decompress(base64.b64decode(sketch["zb64"]))
    b64 = sketch["b64"] if isinstance(sketch, dict) else sketch
    return base64.b64decode(b64)


def _bit(arr: bytes, bucket: int) -> bool:
    return bool(arr[bucket >> 3] & (1 << (bucket & 7)))


def sketch_contains(sketch, bucket: int) -> bool:
    return _bit(sketch_bytes(sketch), bucket)


def sketch_may_contain(sketch, value, _decoded: bytes | None = None) -> bool:
    """Bloom membership of ``value``: True unless some probe position
    is unset (all k must be set for a possible hit). Unsupported
    value types are conservatively True. Pass ``_decoded`` (from
    :func:`sketch_bytes`) when probing many values."""
    arr = sketch_bytes(sketch) if _decoded is None else _decoded
    ks = portable_buckets_k(value, sketch_bits(sketch), sketch_hashes(sketch))
    if ks is None:
        return True
    return all(_bit(arr, b) for b in ks)


def collect_member_sketches(
    spark, data_dir: "str | list[str]", cols: list[str],
    bits: int = _MEMBER_BITS, hashes: int = 1,
) -> dict:
    """Per-file membership bitmaps for the staged files under
    ``data_dir`` (a directory, or an explicit file list for
    backfills): one column-pruned pass over the COMMIT's files (not
    the table), aggregated map-side to ≤ one row per file. Returns
    ``{abs_path: {col: sketch}}``; saturated (or all-null) columns
    record no entry.

    ``bits`` sizes the bitmap and ``hashes`` sets the Bloom probe
    count (double hashing; a value may be present only when ALL its
    probe positions are set). The sketch records nothing once a
    file's set-bit count passes 75% of ``bits`` (no pruning value),
    so SIZE TO THE FILE'S KEY CARDINALITY: the single-hash 4096-bit
    default (512 B/file/column) suits ≲3 k distinct keys per file;
    a 128 MB parquet file of ~1 M unique keys wants
    ``bits=1<<23, hashes=5`` (1 MB — ~8 bits/key, per-key FPR
    ~2 %, the Delta/Iceberg bloom scale). Non-default shapes store
    ``{"bits": n, "k": h, "b64": ...}``; readers adapt per entry, so
    mixed shapes coexist in one manifest across commits."""
    from pyspark.sql import functions as F

    from harmony_energy_data_pipeline_spark.functions.hashx import (
        portable_hash60,
    )

    if not cols:
        return {}
    if bits < 64 or bits & (bits - 1):
        raise ValueError(f"bits must be a power of two >= 64, got {bits}")
    if hashes < 1:
        raise ValueError(f"hashes must be >= 1, got {hashes}")
    cap = int(bits * 0.75)
    proj = [F.input_file_name().alias("__f")]
    aggs = []
    for c in cols:
        s = F.col(c).cast("string")
        h1 = F.pmod(portable_hash60(s), F.lit(bits))
        if hashes == 1:
            proj.append(h1.alias(f"{c}__0"))
            aggs.append(F.collect_set(f"{c}__0").alias(f"{c}__0"))
            continue
        # double hashing: h2 forced odd so every probe stride is
        # coprime to the power-of-two table size
        h2 = F.pmod(portable_hash60(F.concat(s, F.lit("#"))),
                    F.lit(bits)).bitwiseOR(F.lit(1))
        for i in range(hashes):
            proj.append(
                F.pmod(h1 + F.lit(i) * h2, F.lit(bits)).alias(f"{c}__{i}")
            )
            aggs.append(F.collect_set(f"{c}__{i}").alias(f"{c}__{i}"))
    src = data_dir if isinstance(data_dir, list) else [data_dir]
    df = spark.read.parquet(*src).select(*proj)
    rows = df.groupBy("__f").agg(*aggs).collect()
    out: dict = {}
    for r in rows:
        f = r["__f"]
        if f.startswith("file:"):
            from urllib.parse import unquote, urlparse

            f = unquote(urlparse(f).path)
        entry = {}
        for c in cols:
            buckets: set[int] = set()
            for i in range(hashes):
                buckets.update(r[f"{c}__{i}"] or [])
            if not buckets or len(buckets) > cap:
                continue
            entry[c] = _pack_sketch(buckets, bits, hashes)
        if entry:
            out[f] = entry
    return out


def file_matches_members(
    members: dict | None, predicates: list[tuple]
) -> bool:
    """Equality predicates (``lo == hi``) against the membership
    sketches: False only when the sketch PROVES the value absent.
    Missing sketch / unsupported value type → True (conservative)."""
    if not members:
        return True
    for col, lo, hi in predicates:
        if lo is None or lo != hi:
            continue
        sketch = members.get(col)
        if sketch is None:
            continue
        if not sketch_may_contain(sketch, lo):
            return False
    return True


__all__ = [
    "collect_file_stats", "file_column_stats", "file_matches",
    "collect_member_sketches", "file_matches_members", "portable_bucket",
    "portable_buckets_k", "sketch_contains", "sketch_bits",
    "sketch_hashes", "sketch_bytes", "sketch_may_contain",
]
