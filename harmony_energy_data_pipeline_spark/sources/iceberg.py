"""Apache Iceberg TABLE-FORMAT interop — read and write the public
v2 metadata tree (iceberg.apache.org/spec) with no iceberg-spark
dependency, so tables move between this engine and any Iceberg
reader (Spark+iceberg-runtime, Trino, DuckDB iceberg, pyiceberg) as
plain directories. The Delta twin lives in ``deltalake.py``; Avro
manifests decode/encode through ``avrolite``.

Scope (honest, checked, raising beyond it):

* **read**: ``metadata/*.metadata.json`` (``version-hint.text`` is a
  HINT, never load-bearing — discovery falls back to the newest
  metadata file), snapshot → manifest list (Avro) → manifests
  (Avro, any conforming writer's: the container's embedded schema
  drives decoding), live = entries with status EXISTING/ADDED in the
  snapshot's manifests. Data files store ALL columns in Iceberg
  (identity-partition values included), so the scan is a plain
  parquet read with the Iceberg schema mapped to Spark types.
  Time travel by ``snapshot_id`` or timestamp. File skipping at
  PLANNING time from per-file ``lower_bounds``/``upper_bounds``
  (spec Appendix D single-value serialization) and
  identity-transform partition values; the predicate re-applies
  row-level, so pruning is purely a scan-cost optimization.
  V2 POSITION DELETES (``content`` 1) apply merge-on-read — one
  anti-join on the (file_path, pos) pairs; EQUALITY deletes
  (``content`` 2) raise rather than resurrecting rows.
* **write**: format-version 2 — staged parquet under ``data/``, one
  manifest (Avro, spec field-ids, int-keyed maps in the required
  array-of-record encoding), a manifest LIST, a snapshot entry and a
  new ``v<N>.metadata.json`` + ``version-hint.text``. ``append``
  writes a fast-append snapshot whose manifest list carries the
  previous manifests forward; ``overwrite`` starts a fresh live set
  (previous files drop out of the new snapshot but remain readable
  through older snapshots — Iceberg's own semantics). The metadata
  file is claimed with an atomic ``os.link`` put-if-absent, so
  racing writers conflict instead of clobbering.

``snapshot_import_iceberg`` adopts a table ZERO-COPY into the native
log (record counts → ``#rows``, bounds → zone maps);
``snapshot_export_iceberg`` republishes a native table (deletion
vectors applied, time travel honored) as one Iceberg snapshot.
"""

from __future__ import annotations

import json
import os
import re
import struct
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from harmony_energy_data_pipeline_spark.sources.avrolite import (
    read_avro,
    write_avro,
)


class IcebergProtocolError(ValueError):
    """The table needs an Iceberg feature this bridge doesn't speak."""


def _meta_dir(path: str) -> str:
    return os.path.join(path, "metadata")


def _metadata_files(path: str) -> list[str]:
    """``*.metadata.json`` names in VERSION order — numeric when the
    name parses (``v10`` must sort after ``v9``; plain lexicographic
    order broke every table past its 9th commit), lexicographic
    fallback for foreign naming schemes (UUID-suffixed names sort
    stably among themselves)."""
    d = _meta_dir(path)
    if not os.path.isdir(d):
        return []

    def _key(n: str):
        head = n[:-len(".metadata.json")].lstrip("v")
        head = head.split("-", 1)[0]  # '00003-<uuid>' Spark naming
        try:
            return (0, int(head), n)
        except ValueError:
            return (1, 0, n)

    return sorted(
        (n for n in os.listdir(d) if n.endswith(".metadata.json")),
        key=_key,
    )


def table_metadata(path: str) -> dict:
    """The CURRENT table metadata document. ``version-hint.text``
    names a candidate; discovery falls back to the newest
    ``*.metadata.json`` (the hint is advisory in the spec)."""
    d = _meta_dir(path)
    hint = os.path.join(d, "version-hint.text")
    if os.path.exists(hint):
        with open(hint, encoding="utf-8") as fh:
            v = fh.read().strip()
        for cand in (f"v{v}.metadata.json", f"{v}.metadata.json"):
            p = os.path.join(d, cand)
            if os.path.exists(p):
                with open(p, encoding="utf-8") as fh:
                    return json.load(fh)
    names = _metadata_files(path)
    if not names:
        raise FileNotFoundError(f"no Iceberg metadata at {d}")
    with open(os.path.join(d, names[-1]), encoding="utf-8") as fh:
        return json.load(fh)


def _current_schema(meta: dict) -> dict:
    if "schemas" in meta:
        sid = meta.get("current-schema-id", 0)
        for s in meta["schemas"]:
            if s.get("schema-id") == sid:
                return s
        return meta["schemas"][-1]
    return meta["schema"]  # format-version 1


_PRIM = {
    "boolean": T.BooleanType(), "int": T.IntegerType(),
    "long": T.LongType(), "float": T.FloatType(),
    "double": T.DoubleType(), "date": T.DateType(),
    "timestamp": T.TimestampNTZType(),
    "timestamptz": T.TimestampType(),
    "string": T.StringType(), "uuid": T.StringType(),
    "binary": T.BinaryType(),
}


def _ice_type_to_spark(t):
    if isinstance(t, str):
        if t in _PRIM:
            return _PRIM[t]
        if t.startswith("decimal("):
            p, s = t[8:-1].split(",")
            return T.DecimalType(int(p), int(s))
        if t.startswith("fixed["):
            return T.BinaryType()
        raise IcebergProtocolError(f"Iceberg type {t!r} not supported")
    tt = t.get("type")
    if tt == "struct":
        return T.StructType([
            T.StructField(
                f["name"], _ice_type_to_spark(f["type"]),
                not f.get("required", False),
            )
            for f in t["fields"]
        ])
    if tt == "list":
        return T.ArrayType(
            _ice_type_to_spark(t["element"]),
            not t.get("element-required", False),
        )
    if tt == "map":
        return T.MapType(
            _ice_type_to_spark(t["key"]),
            _ice_type_to_spark(t["value"]),
            not t.get("value-required", False),
        )
    raise IcebergProtocolError(f"Iceberg type {t!r} not supported")


def _schema_to_spark(schema: dict) -> T.StructType:
    return _ice_type_to_spark({"type": "struct",
                               "fields": schema["fields"]})


_SPARK_TO_ICE = {
    "boolean": "boolean", "integer": "int", "long": "long",
    "float": "float", "double": "double", "date": "date",
    "timestamp": "timestamptz", "timestamp_ntz": "timestamp",
    "string": "string", "binary": "binary",
}


def _spark_schema_to_ice(schema: T.StructType) -> dict:
    fields = []
    for i, f in enumerate(schema.fields, start=1):
        tn = f.dataType.typeName()
        if tn in _SPARK_TO_ICE:
            it = _SPARK_TO_ICE[tn]
        elif tn == "decimal":
            it = f"decimal({f.dataType.precision},{f.dataType.scale})"
        else:
            raise IcebergProtocolError(
                f"column {f.name!r}: Spark type {tn!r} has no Iceberg "
                "mapping in this bridge (nested types export via a "
                "flattening select first)"
            )
        fields.append({
            "id": i, "name": f.name, "required": not f.nullable,
            "type": it,
        })
    return {"type": "struct", "schema-id": 0, "fields": fields}


# --- Appendix-B transforms (bucket / truncate / dates) -------------------------------
#
# Pure-Python Iceberg partition transforms, needed so READS of foreign
# tables partitioned by bucket[N]/truncate[W]/year/month/day/hour can
# prune files from their manifest partition tuples (spec Appendix B:
# 32-bit Murmur3, x86 variant, seed 0; unit-pinned against the spec's
# own test vectors).


def _murmur3_32(data: bytes, seed: int = 0) -> int:
    """murmur3_x86_32 — signed 32-bit result, matching Iceberg."""
    c1, c2 = 0xCC9E2D51, 0x1B873593
    h = seed & 0xFFFFFFFF
    n = len(data)
    rounded = n - (n & 3)
    for i in range(0, rounded, 4):
        k = int.from_bytes(data[i:i + 4], "little")
        k = (k * c1) & 0xFFFFFFFF
        k = ((k << 15) | (k >> 17)) & 0xFFFFFFFF
        k = (k * c2) & 0xFFFFFFFF
        h ^= k
        h = ((h << 13) | (h >> 19)) & 0xFFFFFFFF
        h = (h * 5 + 0xE6546B64) & 0xFFFFFFFF
    k = 0
    tail = data[rounded:]
    if len(tail) >= 3:
        k ^= tail[2] << 16
    if len(tail) >= 2:
        k ^= tail[1] << 8
    if len(tail) >= 1:
        k ^= tail[0]
        k = (k * c1) & 0xFFFFFFFF
        k = ((k << 15) | (k >> 17)) & 0xFFFFFFFF
        k = (k * c2) & 0xFFFFFFFF
        h ^= k
    h ^= n
    h ^= h >> 16
    h = (h * 0x85EBCA6B) & 0xFFFFFFFF
    h ^= h >> 13
    h = (h * 0xC2B2AE35) & 0xFFFFFFFF
    h ^= h >> 16
    return h - 0x100000000 if h >= 0x80000000 else h


def _days_from_epoch(v):
    import datetime as _dt

    if isinstance(v, _dt.datetime):
        v = v.date()
    if isinstance(v, _dt.date):
        return (v - _dt.date(1970, 1, 1)).days
    if isinstance(v, int):
        return v
    return None


def _micros_from_epoch(v):
    import calendar
    import datetime as _dt

    if isinstance(v, _dt.datetime):
        if v.tzinfo is not None:
            return int(v.timestamp() * 1_000_000)
        return (calendar.timegm(v.timetuple()) * 1_000_000
                + v.microsecond)
    if isinstance(v, _dt.date):
        return calendar.timegm(
            _dt.datetime(v.year, v.month, v.day).timetuple()
        ) * 1_000_000
    if isinstance(v, int):
        return v
    return None


def _bucket_hash_input(value, ice_type: str):
    """The byte serialization Appendix B hashes, per source type.
    None = this value/type pair does not bucket (caller must not
    prune)."""
    import uuid as _uuid
    from decimal import Decimal

    if ice_type in ("int", "long", "date"):
        if ice_type == "date":
            value = _days_from_epoch(value)
        if not isinstance(value, int):
            return None
        return struct.pack("<q", value)
    if ice_type in ("timestamp", "timestamptz", "time"):
        m = _micros_from_epoch(value)
        return None if m is None else struct.pack("<q", m)
    if ice_type == "string":
        return value.encode("utf-8") if isinstance(value, str) else None
    if ice_type == "uuid":
        if isinstance(value, str):
            value = _uuid.UUID(value)
        if isinstance(value, _uuid.UUID):
            return value.bytes
        return None
    if ice_type == "binary" or ice_type.startswith("fixed"):
        if isinstance(value, (bytes, bytearray)):
            return bytes(value)
        return None
    if ice_type.startswith("decimal("):
        if not isinstance(value, Decimal):
            return None
        _p, s = (int(x) for x in ice_type[8:-1].split(","))
        unscaled = int(value.scaleb(s).to_integral_value())
        blen = max(1, (unscaled.bit_length() + 8) // 8)
        return unscaled.to_bytes(blen, "big", signed=True)
    return None  # float/double/boolean do not bucket (spec)


def iceberg_bucket(value, n: int, ice_type: str):
    """``bucket[n]`` of ``value`` (None on null or a non-bucketable
    type — callers treat None as 'cannot prune')."""
    if value is None:
        return None
    raw = _bucket_hash_input(value, ice_type)
    if raw is None:
        return None
    return (_murmur3_32(raw) & 0x7FFFFFFF) % n


def iceberg_transform_value(transform: str, value, ice_type: str):
    """Apply a MONOTONE transform (identity/truncate/year/month/day/
    hour) to a predicate bound, landing in the partition-tuple value
    space manifests store (ints for the date family). None = cannot
    transform (no pruning). ``bucket[n]`` is NOT monotone — use
    :func:`iceberg_bucket` and only for equality predicates."""
    import datetime as _dt

    if value is None:
        return None
    if transform == "identity":
        return value
    if transform in ("year", "month", "day", "hour"):
        is_dateish = ice_type == "date" or (
            isinstance(value, _dt.date)
            and not isinstance(value, _dt.datetime)
        )
        if is_dateish:
            days = _days_from_epoch(value)
            if days is None:
                return None
            d = _dt.date(1970, 1, 1) + _dt.timedelta(days=days)
            if transform == "year":
                return d.year - 1970
            if transform == "month":
                return (d.year - 1970) * 12 + d.month - 1
            if transform == "day":
                return days
            return None  # hour of a date is undefined
        micros = _micros_from_epoch(value)
        if micros is None:
            return None
        if transform == "hour":
            return micros // 3_600_000_000
        secs = micros // 1_000_000
        d = _dt.datetime(1970, 1, 1) + _dt.timedelta(seconds=secs)
        if transform == "year":
            return d.year - 1970
        if transform == "month":
            return (d.year - 1970) * 12 + d.month - 1
        return micros // 86_400_000_000
    mt = re.match(r"^truncate\[(\d+)\]$", transform)
    if mt:
        w = int(mt.group(1))
        if isinstance(value, bool):
            return None
        if isinstance(value, int):
            return value - (value % w)  # floor semantics, negatives too
        if isinstance(value, str):
            return value[:w]
        return None
    return None


def _mm3_long_np(vals):
    """Vectorized murmur3_x86_32 over int64 values serialized as
    8-byte little-endian (the Appendix-B long/int/date/time/timestamp
    hash input) — exactly two 4-byte blocks, no tail. Returns the
    uint32 hash per element (numpy array)."""
    import numpy as np

    M = np.uint64(0xFFFFFFFF)
    v = np.asarray(vals, dtype=np.int64).view(np.uint64)
    k_lo = v & M
    k_hi = (v >> np.uint64(32)) & M
    h = np.zeros(len(v), np.uint64)
    for k in (k_lo, k_hi):
        kk = (k * np.uint64(0xCC9E2D51)) & M
        kk = (((kk << np.uint64(15)) & M) | (kk >> np.uint64(17)))
        kk = (kk * np.uint64(0x1B873593)) & M
        h ^= kk
        h = (((h << np.uint64(13)) & M) | (h >> np.uint64(19)))
        h = (h * np.uint64(5) + np.uint64(0xE6546B64)) & M
    h ^= np.uint64(8)  # byte length
    h ^= h >> np.uint64(16)
    h = (h * np.uint64(0x85EBCA6B)) & M
    h ^= h >> np.uint64(13)
    h = (h * np.uint64(0xC2B2AE35)) & M
    h ^= h >> np.uint64(16)
    return h


_TR_RE_BUCKET = re.compile(
    r"^bucket\s*(?:\[(\d+)\]\s*\(\s*(\w+)\s*\)"
    r"|\(\s*(\d+)\s*,\s*(\w+)\s*\))$",
    re.IGNORECASE,
)
_TR_RE_TRUNC = re.compile(
    r"^truncate\s*(?:\[(\d+)\]\s*\(\s*(\w+)\s*\)"
    r"|\(\s*(\d+)\s*,\s*(\w+)\s*\))$",
    re.IGNORECASE,
)
_TR_RE_DATE = re.compile(
    r"^(year|month|day|hour)\s*\(\s*(\w+)\s*\)$", re.IGNORECASE
)


def _parse_partition_entry(entry: str) -> dict:
    """``partition_by`` entry → ``{src, transform, pv_name}``.
    Accepts a bare column (identity), ``bucket[N](c)`` /
    ``bucket(N, c)``, ``truncate[W](c)`` / ``truncate(W, c)``, and
    ``year/month/day/hour(c)`` — both the spec spelling and the Spark
    SQL one. Partition field names follow the Iceberg convention
    (``c_bucket``, ``c_trunc``, ``c_day`` …)."""
    e = entry.strip()
    mt = _TR_RE_BUCKET.match(e)
    if mt:
        n = int(mt.group(1) or mt.group(3))
        c = mt.group(2) or mt.group(4)
        return {"src": c, "transform": f"bucket[{n}]",
                "pv_name": f"{c}_bucket"}
    mt = _TR_RE_TRUNC.match(e)
    if mt:
        w = int(mt.group(1) or mt.group(3))
        c = mt.group(2) or mt.group(4)
        return {"src": c, "transform": f"truncate[{w}]",
                "pv_name": f"{c}_trunc"}
    mt = _TR_RE_DATE.match(e)
    if mt:
        tr = mt.group(1).lower()
        c = mt.group(2)
        return {"src": c, "transform": tr, "pv_name": f"{c}_{tr}"}
    if not re.match(r"^[A-Za-z_]\w*$", e):
        raise ValueError(
            f"unsupported partition transform {entry!r}; supported: "
            "identity column, bucket[N](c), truncate[W](c), "
            "year/month/day/hour(c)"
        )
    return {"src": e, "transform": "identity", "pv_name": e}


def _transform_result_ice_type(transform: str, src_type: str) -> str:
    if transform == "identity":
        return src_type
    if transform.startswith("truncate["):
        return src_type
    return "int"  # bucket/year/month/day/hour land as ints


def _transform_column(spec: dict, src_type: str):
    """The staged partition-value Column for one transform — pure
    expressions for everything except bucket, which needs the
    Appendix-B murmur3 (seed 0, 8-byte-LE serialization) Spark's
    own hash() cannot produce (seed 42): an Arrow-vectorized
    pandas_udf computes it batch-wise (numpy for the fixed-width
    family, per-value only for strings)."""
    from pyspark.sql.functions import pandas_udf

    c, tr = spec["src"], spec["transform"]
    if tr == "identity":
        return F.col(c)
    mt = re.match(r"^truncate\[(\d+)\]$", tr)
    if mt:
        w = int(mt.group(1))
        if src_type == "string":
            return F.substring(F.col(c), 1, w)
        if src_type in ("int", "long"):
            return F.col(c) - (
                ((F.col(c) % w) + w) % w
            )
        raise IcebergProtocolError(
            f"truncate over {src_type!r} not supported by this writer"
        )
    if tr in ("year", "month", "day", "hour"):
        if src_type == "date":
            if tr == "year":
                return F.year(c) - F.lit(1970)
            if tr == "month":
                return (F.year(c) - 1970) * 12 + F.month(c) - 1
            if tr == "day":
                return F.datediff(F.col(c), F.lit("1970-01-01"))
            raise IcebergProtocolError("hour(date) is undefined")
        if src_type in ("timestamp", "timestamptz"):
            col = F.col(c)
            if src_type == "timestamp":  # ntz: pin the UTC reading
                col = col.cast("timestamp")
            # every arm derives from unix_micros (the internal UTC
            # instant — session-TZ-independent); year/month walk
            # through a DATE computed by day arithmetic, never
            # F.year(timestamp), which renders in
            # spark.sql.session.timeZone and would emit spec-violating
            # tuples under a non-UTC session
            micros = F.unix_micros(col)
            if tr == "day":
                return F.floor(micros / F.lit(86_400_000_000))
            if tr == "hour":
                return F.floor(micros / F.lit(3_600_000_000))
            days = F.floor(micros / F.lit(86_400_000_000)).cast("int")
            d = F.date_add(F.to_date(F.lit("1970-01-01")), days)
            if tr == "year":
                return F.year(d) - F.lit(1970)
            return (F.year(d) - 1970) * 12 + F.month(d) - 1
        raise IcebergProtocolError(
            f"{tr} over {src_type!r} not supported by this writer"
        )
    mt = re.match(r"^bucket\[(\d+)\]$", tr)
    if mt:
        n = int(mt.group(1))
        itype = src_type

        @pandas_udf("int")
        def _bucket(s):
            import numpy as np
            import pandas as pd

            if itype in ("int", "long"):
                base = pd.to_numeric(s, errors="coerce")
                mask = base.notna()
                vals = base.fillna(0).astype("int64").to_numpy()
            elif itype == "date":
                dt = pd.to_datetime(s, errors="coerce")
                mask = dt.notna()
                vals = (
                    (dt - pd.Timestamp("1970-01-01")).dt.days
                    .fillna(0).astype("int64").to_numpy()
                )
            elif itype in ("timestamp", "timestamptz"):
                dt = pd.to_datetime(s, errors="coerce")
                try:
                    dt = dt.dt.tz_localize(None)
                except (TypeError, AttributeError):
                    pass
                mask = dt.notna()
                ns = dt.astype("int64").where(mask, 0)
                vals = (ns // 1000).astype("int64").to_numpy()
            elif itype == "string":
                out = pd.array(
                    [iceberg_bucket(v, n, "string") for v in s],
                    dtype="Int32",
                )
                return pd.Series(out)
            else:
                raise IcebergProtocolError(
                    f"bucket over {itype!r} not supported"
                )
            h = _mm3_long_np(vals)
            b = ((h & np.uint64(0x7FFFFFFF)) % np.uint64(n)).astype(
                "int64"
            )
            res = pd.Series(b).astype("Int32")
            res[~mask.to_numpy()] = pd.NA
            return res

        return _bucket(F.col(c))
    raise IcebergProtocolError(f"unknown transform {tr!r}")


# --- Appendix-D single-value serialization (bounds) ----------------------------------

def _decode_bound(raw: bytes, ice_type: str):
    """Spec Appendix D: binary single-value → comparable Python value
    (None when the type has no sound comparison here)."""
    import datetime as dt

    try:
        if ice_type == "int":
            return struct.unpack("<i", raw)[0]
        if ice_type == "long":
            # a column WIDENED int→long keeps old manifests' 4-byte
            # bounds; decoding them keeps pruning exact post-widen
            if len(raw) == 4:
                return struct.unpack("<i", raw)[0]
            return struct.unpack("<q", raw)[0]
        if ice_type == "float":
            return struct.unpack("<f", raw)[0]
        if ice_type == "double":
            if len(raw) == 4:  # widened float→double bounds
                return float(struct.unpack("<f", raw)[0])
            return struct.unpack("<d", raw)[0]
        if ice_type in ("string", "uuid"):
            return raw.decode("utf-8")
        if ice_type == "date":
            days = struct.unpack("<i", raw)[0]
            return dt.date(1970, 1, 1) + dt.timedelta(days=days)
        if ice_type in ("timestamp", "timestamptz"):
            us = struct.unpack("<q", raw)[0]
            return dt.datetime(1970, 1, 1) + dt.timedelta(microseconds=us)
        if ice_type == "boolean":
            return raw[0] != 0
    except (struct.error, UnicodeDecodeError, IndexError):
        return None
    return None


def _encode_bound(v, itype: str) -> bytes | None:
    """Appendix-D single-value serialization for the column's
    DECLARED type (int is 4 bytes, long 8 — the decode side keys off
    the schema, so the encode side must too)."""
    import datetime as dt

    try:
        if itype == "boolean":
            return b"\x01" if v else b"\x00"
        if itype == "int":
            return struct.pack("<i", int(v))
        if itype == "long":
            return struct.pack("<q", int(v))
        if itype == "float":
            return struct.pack("<f", float(v))
        if itype == "double":
            return struct.pack("<d", float(v))
        if itype == "string":
            return str(v).encode("utf-8")
        if itype in ("timestamp", "timestamptz") and \
                isinstance(v, dt.datetime):
            us = int(
                (v.replace(tzinfo=None) - dt.datetime(1970, 1, 1))
                .total_seconds() * 1e6
            )
            return struct.pack("<q", us)
        if itype == "date" and isinstance(v, dt.date):
            return struct.pack("<i", (v - dt.date(1970, 1, 1)).days)
    except (struct.error, TypeError, ValueError):
        return None
    return None


# --- snapshot resolution ---------------------------------------------------------------

def _snapshot(meta: dict, snapshot_id: int | None) -> dict:
    snaps = meta.get("snapshots") or []
    if not snaps:
        raise FileNotFoundError("Iceberg table has no snapshots")
    if snapshot_id is None:
        cur = meta.get("current-snapshot-id")
        for s in snaps:
            if s["snapshot-id"] == cur:
                return s
        return snaps[-1]
    for s in snaps:
        if s["snapshot-id"] == snapshot_id:
            return s
    raise ValueError(f"no Iceberg snapshot {snapshot_id}")


def iceberg_snapshot_at_timestamp(path: str, ts_unix: float) -> int:
    """Latest snapshot committed at or before ``ts_unix`` — the
    ``TIMESTAMP AS OF`` resolver."""
    meta = table_metadata(path)
    best = None
    for s in sorted(meta.get("snapshots") or [],
                    key=lambda s: s["timestamp-ms"]):
        if s["timestamp-ms"] / 1000.0 <= ts_unix:
            best = s["snapshot-id"]
    if best is None:
        raise ValueError(
            f"no Iceberg snapshot at {path} at or before unix {ts_unix}"
        )
    return best


def iceberg_history(path: str) -> list[dict]:
    meta = table_metadata(path)
    return [
        {"snapshot_id": s["snapshot-id"],
         "timestamp_ms": s["timestamp-ms"],
         "operation": (s.get("summary") or {}).get("operation")}
        for s in sorted(meta.get("snapshots") or [],
                        key=lambda s: s["timestamp-ms"])
    ]


def _resolve_file_path(table_path: str, fp: str) -> str:
    p = fp
    if "://" in p:
        scheme, _, rest = p.partition("://")
        if scheme != "file":
            raise IcebergProtocolError(
                f"data file on scheme {scheme!r}; this bridge reads "
                "local paths"
            )
        p = "/" + rest.lstrip("/")
    if not os.path.isabs(p):
        p = os.path.join(table_path, p)
    return p


def live_files(
    path: str, meta: dict | None = None, snapshot_id: int | None = None
) -> tuple[list[dict], list[dict]]:
    """The snapshot's live file records, split ``(data_files,
    delete_files)`` (status EXISTING or ADDED across the snapshot's
    manifests). Delete records carry their ``content`` (1 = position,
    2 = equality); every record gains ``__seq`` — the entry's data
    sequence number (inherited from its manifest when the entry's is
    null, per the spec's inheritance rule) — which equality-delete
    application needs (a delete applies only to data SEQUENCED BEFORE
    it). Records also gain ``__spec_id`` — the owning manifest's
    partition-spec id, which partition pruning must resolve PER FILE
    on a table whose spec evolved (files written under an old spec
    carry that spec's partition tuple, not the current one)."""
    meta = meta or table_metadata(path)
    snap = _snapshot(meta, snapshot_id)
    ml = _resolve_file_path(path, snap["manifest-list"])
    manifests, _ = read_avro(ml)
    data: list[dict] = []
    deletes: list[dict] = []
    for m in manifests:
        entries, _ = read_avro(
            _resolve_file_path(path, m["manifest_path"])
        )
        for e in entries:
            if e.get("status") == 2:  # DELETED in this snapshot
                continue
            df_rec = e.get("data_file") or {}
            seq = e.get("sequence_number")
            if seq is None:
                seq = m.get("sequence_number", 0)
            df_rec["__seq"] = seq
            df_rec["__spec_id"] = m.get("partition_spec_id", 0)
            content = df_rec.get("content") or 0
            if content == 0:
                data.append(df_rec)
            else:
                deletes.append(df_rec)
    return data, deletes


def live_data_files(
    path: str, meta: dict | None = None, snapshot_id: int | None = None
) -> list[dict]:
    """Back-compat: the live data files only; raises if the snapshot
    carries delete files the caller would otherwise ignore."""
    data, deletes = live_files(path, meta, snapshot_id)
    if deletes:
        raise IcebergProtocolError(
            "snapshot has position-delete files; use live_files() and "
            "apply them (read_iceberg does)"
        )
    return data


def _bounds_of(df_rec: dict, field_types: dict) -> dict:
    """Per-column [lo, hi] decoded from a data_file record's
    lower/upper bound maps (field-id keyed; Avro's array-of-record
    map encoding arrives as list[{'key','value'}])."""
    def as_map(v):
        if isinstance(v, dict):
            return {int(k): b for k, b in v.items()}
        return {int(kv["key"]): kv["value"] for kv in (v or [])}

    lows = as_map(df_rec.get("lower_bounds"))
    highs = as_map(df_rec.get("upper_bounds"))
    out: dict = {}
    for fid, (name, itype) in field_types.items():
        lo = (_decode_bound(lows[fid], itype)
              if fid in lows else None)
        hi = (_decode_bound(highs[fid], itype)
              if fid in highs else None)
        if lo is not None and hi is not None:
            out[name] = [lo, hi]
    return out


def _prune_data_files(meta: dict, schema: dict, files: list,
                      where: "list[tuple] | None") -> list:
    """PLANNING-TIME file skipping shared by :func:`read_iceberg`
    and the row-level DML scans: inclusive interval triples prune on
    decoded lower/upper bounds, identity partition tuples (per
    spec-id — an evolved table's files prune against THEIR OWN
    spec), and Appendix-B transforms (monotone ones map predicate
    bounds into partition-value space; bucket[N] prunes equality
    only). Conservative everywhere information is missing —
    correctness never depends on this, callers re-apply the
    predicate row-level."""
    if not where:
        return list(files)
    field_types = {
        f["id"]: (f["name"], f["type"])
        for f in schema["fields"] if isinstance(f["type"], str)
    }
    by_id = {f["id"]: f["type"] for f in schema["fields"]
             if isinstance(f["type"], str)}
    by_id_name = {f["id"]: f["name"] for f in schema["fields"]
                  if isinstance(f["type"], str)}
    spec_ident_types: dict = {}
    spec_tr_fields: dict = {}
    for sp in meta.get("partition-specs", []):
        m_ident: dict = {}
        m_tr: dict = {}
        for f in sp.get("fields", []):
            sid = f.get("source-id")
            if sid not in by_id:
                continue
            tr = f.get("transform")
            if tr == "identity":
                # keyed by the source column's CURRENT name (a
                # renamed column still prunes); the partition TUPLE
                # stays keyed by the spec field's own name
                m_ident[by_id_name[sid]] = (f["name"], by_id[sid])
            else:
                m_tr.setdefault(by_id_name[sid], []).append(
                    (f["name"], tr, by_id[sid])
                )
        spec_ident_types[sp.get("spec-id", 0)] = m_ident
        spec_tr_fields[sp.get("spec-id", 0)] = m_tr

    def _part_pred_value(v, itype: str):
        import datetime as _dt

        if itype == "date" and isinstance(v, _dt.date):
            return (v - _dt.date(1970, 1, 1)).days
        if itype in ("int", "long") and isinstance(v, int):
            return v
        if itype == "double" and isinstance(v, (int, float)):
            return float(v)
        if itype == "string" and isinstance(v, str):
            return v
        return None

    kept = []
    for df_rec in files:
        bounds = _bounds_of(df_rec, field_types)
        pv = df_rec.get("partition") or {}
        ident_types = spec_ident_types.get(
            df_rec.get("__spec_id", 0), {}
        )
        tr_fields = spec_tr_fields.get(
            df_rec.get("__spec_id", 0), {}
        )
        ok = True
        for c, lo, hi in where:
            for pv_name, tr, src_type in tr_fields.get(c, ()):
                tv = pv.get(pv_name)
                if tv is None:
                    continue
                if tr.startswith("bucket["):
                    if lo is not None and lo == hi:
                        b = iceberg_bucket(
                            lo, int(tr[7:-1]), src_type
                        )
                        if b is not None and tv != b:
                            ok = False
                            break
                    continue
                tlo = iceberg_transform_value(tr, lo, src_type)
                thi = iceberg_transform_value(tr, hi, src_type)
                try:
                    if tlo is not None and tv < tlo:
                        ok = False
                        break
                    if thi is not None and tv > thi:
                        ok = False
                        break
                except TypeError:
                    continue
            if not ok:
                break
            if c in ident_types \
                    and pv.get(ident_types[c][0]) is not None:
                tuple_key, ityp = ident_types[c]
                val = pv[tuple_key]
                clo = (_part_pred_value(lo, ityp)
                       if lo is not None else None)
                chi = (_part_pred_value(hi, ityp)
                       if hi is not None else None)
                try:
                    if clo is not None and val < clo:
                        ok = False
                        break
                    if chi is not None and val > chi:
                        ok = False
                        break
                except TypeError:
                    pass  # incomparable: fall through to bounds
            b = bounds.get(c)
            if b is None:
                continue
            try:
                if hi is not None and type(b[0]) is type(hi) \
                        and b[0] > hi:
                    ok = False
                    break
                if lo is not None and type(b[1]) is type(lo) \
                        and b[1] < lo:
                    ok = False
                    break
            except TypeError:
                continue
        if ok:
            kept.append(df_rec)
    return kept


def _rename_alternates(meta: dict, schema: dict):
    """Current top-level field name → HISTORICAL names (current
    excluded) for every field whose id ever carried another name —
    gathered from the metadata's prior ``schemas`` and the spec's
    ``schema.name-mapping.default`` property (how a foreign table
    without parquet field-ids advertises old names). Returns None
    when no field was ever renamed — the common case costs one dict
    sweep and no plan change. Raises when one historical name maps
    to TWO different field-ids (genuinely ambiguous name-based
    resolution; the spec resolves it via parquet field-ids, which a
    name-based scan does not have)."""
    cur_by_id = {f["id"]: f["name"] for f in schema["fields"]}
    cur_names = set(cur_by_id.values())
    hist: "dict[int, set]" = {}
    pools = list(meta.get("schemas") or [])
    if "schema" in meta:  # format-v1 single-schema key
        pools.append(meta["schema"])
    for s in pools:
        for f in s.get("fields", []):
            hist.setdefault(f["id"], set()).add(f["name"])
    nm = (meta.get("properties") or {}).get(
        "schema.name-mapping.default"
    )
    if nm:
        try:
            for ent in json.loads(nm):
                fid = ent.get("field-id")
                if fid is None:
                    continue
                for n in ent.get("names") or []:
                    hist.setdefault(fid, set()).add(n)
        except (ValueError, TypeError, AttributeError):
            pass  # malformed mapping: prior schemas still resolve
    owners: "dict[str, set]" = {}
    for fid in cur_by_id:
        for n in hist.get(fid, ()):
            owners.setdefault(n, set()).add(fid)
    alts: "dict[str, list[str]]" = {}
    for fid, cur in cur_by_id.items():
        cand = []
        for n in sorted(hist.get(fid, ())):
            if n == cur or n in cur_names:
                continue
            if len(owners.get(n, ())) > 1:
                raise IcebergProtocolError(
                    f"historical column name {n!r} maps to multiple "
                    f"field-ids {sorted(owners[n])}; name-based "
                    "resolution is ambiguous — compact the table to "
                    "materialize current names first"
                )
            cand.append(n)
        if cand:
            alts[cur] = cand
    return alts or None


def _data_scan(spark, path, abs_paths, spark_schema, meta, schema):
    """The ONE parquet scan door for Iceberg DATA files — resolves
    RENAMED columns: files written before a rename carry the OLD
    physical column name, so the scan reads an EXTENDED schema (the
    current fields plus each historical name, null-filled where
    absent) and the returned ``project`` callable coalesces each
    renamed field across its names back to the current name. Callers
    apply ``project`` AFTER anything needing ``_metadata`` or the
    raw scan (position-delete subtraction, provenance columns) and
    list pass-through columns in ``extra``. With no renames in the
    table's history the scan and plan are byte-identical to a plain
    ``spark.read.schema(...).parquet(...)``."""
    alts = _rename_alternates(meta, schema)
    names = [f.name for f in spark_schema.fields]
    if not alts:
        df = spark.read.schema(spark_schema).parquet(*abs_paths)

        def project(d, extra=()):
            want = list(names) + list(extra)
            return d if list(d.columns) == want else d.select(*want)

        return df, project
    ext_fields = list(spark_schema.fields)
    typ = {f.name: f.dataType for f in spark_schema.fields}
    for cur, cands in sorted(alts.items()):
        for a in cands:
            ext_fields.append(T.StructField(a, typ[cur], True))
    df = spark.read.schema(T.StructType(ext_fields)).parquet(
        *abs_paths
    )

    def project(d, extra=()):
        sel = []
        for f in spark_schema.fields:
            if f.name in alts:
                sel.append(F.coalesce(
                    F.col(f.name),
                    *[F.col(a) for a in alts[f.name]],
                ).alias(f.name))
            else:
                sel.append(F.col(f.name))
        return d.select(*sel, *extra)

    return df, project


def read_iceberg(
    spark: SparkSession, path: str, snapshot_id: int | None = None,
    where: list[tuple] | None = None,
    as_of_unix: float | None = None,
) -> DataFrame:
    """Read an Iceberg table directory (any writer's) at
    ``snapshot_id`` (default: current; or ``as_of_unix`` timestamp
    travel). ``where``: the engine-standard inclusive interval
    triples — files are skipped at PLANNING time on decoded
    lower/upper bounds, then the predicate re-applies row-level.

    V2 POSITION DELETES (content=1) apply merge-on-read: the delete
    files' (file_path, pos) pairs anti-join the scan's hidden
    ``_metadata`` identity — pairs are exact whatever the sequence
    numbers say because data file paths are unique. Equality deletes
    refuse (see :func:`live_files`)."""
    if as_of_unix is not None:
        if snapshot_id is not None:
            raise ValueError("pass snapshot_id OR as_of_unix, not both")
        snapshot_id = iceberg_snapshot_at_timestamp(path, as_of_unix)
    meta = table_metadata(path)
    schema = _current_schema(meta)
    if snapshot_id is not None:
        # time travel reads through the schema THAT SNAPSHOT wrote
        # (field ids/columns may have evolved since)
        sid = _snapshot(meta, snapshot_id).get("schema-id")
        if sid is not None:
            schema = next(
                (s for s in meta.get("schemas", [])
                 if s.get("schema-id") == sid),
                schema,
            )
    spark_schema = _schema_to_spark(schema)
    field_types = {
        f["id"]: (f["name"], f["type"])
        for f in schema["fields"] if isinstance(f["type"], str)
    }
    files, deletes = live_files(path, meta, snapshot_id)
    residual = None
    if where:
        residual = F.lit(True)
        for c, lo, hi in where:
            if lo is not None:
                residual = residual & (F.col(c) >= F.lit(lo))
            if hi is not None:
                residual = residual & (F.col(c) <= F.lit(hi))
        kept = _prune_data_files(meta, schema, files, where)
        if not kept and files:
            kept, residual = files[:1], F.lit(False)
        files = kept
    if not files:
        return spark.createDataFrame([], spark_schema)
    pos_dels = [d for d in deletes if (d.get("content") or 0) == 1]
    eq_dels = [d for d in deletes if (d.get("content") or 0) == 2]
    if eq_dels:
        out = _read_with_equality_deletes(
            spark, path, files, spark_schema, schema, eq_dels,
            pos_dels, meta,
        )
        return out if residual is None else out.filter(residual)
    paths = [_resolve_file_path(path, f["file_path"]) for f in files]
    out, project = _data_scan(
        spark, path, paths, spark_schema, meta, schema
    )
    if pos_dels:
        out = _subtract_position_deletes(spark, path, out, pos_dels)
    out = project(out)
    return out if residual is None else out.filter(residual)


def _eq_delete_scan_groups(
    files: list[dict], eq_dels: list[dict]
) -> list[tuple[int, list[dict]]]:
    """Group data files by their APPLICABLE-DELETE-SET: two files
    share a scan arm iff no equality delete is sequenced strictly
    between them, so arm count is bounded by #DISTINCT DELETE
    SEQUENCES + 1 — not by #commits. A year of hourly CDC appends
    against a handful of delete boundaries stays a handful of arms
    (r10 VERDICT weak-for-scale item: the old per-``__seq`` grouping
    built one arm per commit generation). Returns ``[(rep_seq,
    files)]`` sorted; ``rep_seq`` is any member's sequence (all
    members see the same deletes)."""
    import bisect

    del_seqs = sorted({int(d.get("__seq") or 0) for d in eq_dels})
    groups: dict[int, tuple[int, list[dict]]] = {}
    for f in files:
        fseq = int(f.get("__seq") or 0)
        # deletes apply iff delete.__seq > fseq, so the count of
        # delete seqs <= fseq identifies the applicable set
        gidx = bisect.bisect_right(del_seqs, fseq)
        if gidx in groups:
            groups[gidx][1].append(f)
        else:
            groups[gidx] = (fseq, [f])
    return [groups[g] for g in sorted(groups)]


def _read_with_equality_deletes(
    spark: SparkSession, path: str, files: list[dict],
    spark_schema, ice_schema: dict, eq_dels: list[dict],
    pos_dels: list[dict], meta: "dict | None" = None,
) -> DataFrame:
    """EQUALITY deletes (content=2), sequence-scoped per the spec: a
    delete applies to data files whose data sequence number is
    STRICTLY LOWER than the delete's. Data files group by their
    APPLICABLE-DELETE-SET (:func:`_eq_delete_scan_groups` — one arm
    per delete boundary, not per commit); each group subtracts its
    position deletes (while ``_metadata`` is still resolvable), then
    anti-joins the union of equality deletes sequenced AFTER it,
    NULL-SAFELY on the delete file's equality columns (pure equi
    join, broadcast build side)."""
    by_name = {f["id"]: f["name"] for f in ice_schema["fields"]}
    eq_groups: dict[tuple, list[dict]] = {}
    for d in eq_dels:
        ids = tuple(sorted(d.get("equality_ids") or []))
        if not ids or any(i not in by_name for i in ids):
            raise IcebergProtocolError(
                "equality delete file lacks resolvable equality_ids"
            )
        eq_groups.setdefault(ids, []).append(d)
    alts = (_rename_alternates(meta, ice_schema) or {}) if meta \
        else {}
    typ = {f.name: f.dataType for f in spark_schema.fields}
    out = None
    for fseq, group in _eq_delete_scan_groups(files, eq_dels):
        part, project = _data_scan(
            spark, path,
            [_resolve_file_path(path, f["file_path"]) for f in group],
            spark_schema, meta or {}, ice_schema,
        )
        if pos_dels:
            part = _subtract_position_deletes(spark, path, part, pos_dels)
        part = project(part)
        for ids, dels in sorted(eq_groups.items()):
            applicable = [
                d for d in dels if int(d.get("__seq") or 0) > fseq
            ]
            if not applicable:
                continue
            cols = [by_name[i] for i in ids]
            # a delete file written before a rename stores the OLD
            # column name: read every historical name for each eq
            # column and coalesce, like the data scan does
            dd_fields, dd_expr = [], []
            for c in cols:
                dd_fields.append(T.StructField(c, typ[c], True))
                for a in alts.get(c, ()):
                    dd_fields.append(T.StructField(a, typ[c], True))
                dd_expr.append(
                    F.coalesce(
                        F.col(c), *[F.col(a) for a in alts.get(c, ())]
                    ).alias(f"__eq_{c}")
                    if alts.get(c) else
                    F.col(c).alias(f"__eq_{c}")
                )
            dd = spark.read.schema(T.StructType(dd_fields)).parquet(
                *sorted(
                    _resolve_file_path(path, d["file_path"])
                    for d in applicable
                )
            ).select(*dd_expr).dropDuplicates()
            cond = None
            for c in cols:
                c2 = F.col(c).eqNullSafe(F.col(f"__eq_{c}"))
                cond = c2 if cond is None else cond & c2
            part = part.join(F.broadcast(dd), cond, "left_anti")
        out = part if out is None else out.unionByName(part)
    return out


def _norm_content_path(path: str, col):
    """Normalize a delete file's ``file_path`` VALUE (whatever the
    writer wrote: scheme URI, absolute, or table-relative) to a plain
    absolute path, expression-side."""
    no_scheme = F.regexp_replace(col, "^[a-zA-Z0-9]+:/+", "/")
    return F.when(
        no_scheme.startswith("/"), no_scheme
    ).otherwise(
        F.concat(F.lit(os.path.abspath(path) + "/"), no_scheme)
    )


def _subtract_position_deletes(
    spark: SparkSession, path: str, scan: DataFrame, deletes: list[dict]
) -> DataFrame:
    """ONE left-anti join on (absolute data path, row position)
    against the union of the snapshot's position-delete parquet files
    — O(delete rows) build side (AQE broadcasts when small), applied
    around the single data scan. ``scan`` must come straight off the
    parquet source (``_metadata`` resolves only there)."""
    del_paths = sorted(
        _resolve_file_path(path, d["file_path"]) for d in deletes
    )
    dv = spark.read.schema(
        "file_path string, pos long"
    ).parquet(*del_paths).select(
        _norm_content_path(path, F.col("file_path")).alias("__dvf"),
        F.col("pos").alias("__dvp"),
    )
    cols = scan.columns
    # the scan's file identity is a percent-encoded URI: decode to
    # the same plain-absolute form ('+' protected — a literal plus is
    # a real plus at both encoding layers)
    scan_path = F.url_decode(F.replace(
        F.regexp_replace(
            F.col("_metadata.file_path"), "^[a-zA-Z0-9]+:/+", "/"
        ),
        F.lit("+"), F.lit("%2B"),
    ))
    return scan.select(
        "*", scan_path.alias("__f"),
        F.col("_metadata.row_index").alias("__p"),
    ).join(
        dv,
        (F.col("__f") == F.col("__dvf"))
        & (F.col("__p") == F.col("__dvp")),
        "left_anti",
    ).select(*cols)


# --- write -----------------------------------------------------------------------------

def _ice_map_schema(name: str, key_id: int, val_id: int,
                    val_type: str = "bytes"):
    """Iceberg's required Avro encoding for int-keyed maps: an array
    of key/value records with a map logicalType."""
    return ["null", {
        "type": "array", "logicalType": "map",
        "items": {
            "type": "record", "name": name, "fields": [
                {"name": "key", "type": "int", "field-id": key_id},
                {"name": "value", "type": val_type, "field-id": val_id},
            ],
        },
    }]


_ICE_PART_AVRO = {"int": "int", "long": "long", "string": "string",
                  "boolean": "boolean", "double": "double",
                  "date": "int"}


def _manifest_entry_schema(partition_fields: list | None = None) -> dict:
    """``partition_fields``: ``[{name, type(ice), field-id}]`` for an
    identity spec — the r102 partition record gets one typed optional
    field per partition column (empty for unpartitioned)."""
    pf = []
    for f in partition_fields or []:
        avro_t = _ICE_PART_AVRO.get(f["type"])
        if avro_t is None:
            raise IcebergProtocolError(
                f"partition column {f['name']!r}: type {f['type']!r} "
                "has no manifest partition encoding in this bridge"
            )
        pf.append({"name": f["name"], "type": ["null", avro_t],
                   "default": None, "field-id": f["field-id"]})
    data_file = {
        "type": "record", "name": "r2", "fields": [
            {"name": "content", "type": "int", "field-id": 134},
            {"name": "file_path", "type": "string", "field-id": 100},
            {"name": "file_format", "type": "string", "field-id": 101},
            {"name": "partition", "field-id": 102, "type": {
                "type": "record", "name": "r102", "fields": pf}},
            {"name": "record_count", "type": "long", "field-id": 103},
            {"name": "file_size_in_bytes", "type": "long",
             "field-id": 104},
            {"name": "lower_bounds", "field-id": 125, "default": None,
             "type": _ice_map_schema("k126_v127", 126, 127)},
            {"name": "upper_bounds", "field-id": 128, "default": None,
             "type": _ice_map_schema("k129_v130", 129, 130)},
            {"name": "equality_ids", "field-id": 135, "default": None,
             "type": ["null", {"type": "array", "items": "int"}]},
        ],
    }
    return {
        "type": "record", "name": "manifest_entry", "fields": [
            {"name": "status", "type": "int", "field-id": 0},
            {"name": "snapshot_id", "type": ["null", "long"],
             "default": None, "field-id": 1},
            {"name": "sequence_number", "type": ["null", "long"],
             "default": None, "field-id": 3},
            {"name": "file_sequence_number", "type": ["null", "long"],
             "default": None, "field-id": 4},
            {"name": "data_file", "type": data_file, "field-id": 2},
        ],
    }


def _manifest_file_schema() -> dict:
    return {
        "type": "record", "name": "manifest_file", "fields": [
            {"name": "manifest_path", "type": "string", "field-id": 500},
            {"name": "manifest_length", "type": "long", "field-id": 501},
            {"name": "partition_spec_id", "type": "int",
             "field-id": 502},
            {"name": "content", "type": "int", "field-id": 517},
            {"name": "sequence_number", "type": "long", "field-id": 515},
            {"name": "min_sequence_number", "type": "long",
             "field-id": 516},
            {"name": "added_snapshot_id", "type": "long",
             "field-id": 503},
            {"name": "added_files_count", "type": "int",
             "field-id": 504},
            {"name": "existing_files_count", "type": "int",
             "field-id": 505},
            {"name": "deleted_files_count", "type": "int",
             "field-id": 506},
            {"name": "added_rows_count", "type": "long",
             "field-id": 512},
            {"name": "existing_rows_count", "type": "long",
             "field-id": 513},
            {"name": "deleted_rows_count", "type": "long",
             "field-id": 514},
        ],
    }


def _file_bounds_maps(fp: str, cols: list[str], ice_fields: list[dict]):
    """(lower, upper) array-of-record maps for one parquet file's
    footer stats on ``cols``, field-id keyed per the table schema."""
    from harmony_energy_data_pipeline_spark.sinks.filestats import (
        file_column_stats,
    )

    ids = {f["name"]: f["id"] for f in ice_fields}
    types = {f["name"]: f["type"] for f in ice_fields
             if isinstance(f["type"], str)}
    st = file_column_stats(fp, cols) if cols else {}
    lows, highs = [], []
    for c, b in st.items():
        if c.startswith("#") or c not in ids or c not in types:
            continue
        lo = _encode_bound(b[0], types[c])
        hi = _encode_bound(b[1], types[c])
        if lo is not None and hi is not None:
            lows.append({"key": ids[c], "value": lo})
            highs.append({"key": ids[c], "value": hi})
    n_rows = int(st.get("#rows", 0)) if st else None
    return lows or None, highs or None, n_rows


def _commit_metadata(path: str, meta: dict,
                     prev_meta: "dict | None") -> int:
    """Atomically publish ``meta`` as the next ``vN.metadata.json``
    (+ ``version-hint.text``) — the one commit door every writer in
    this module walks through. Appends the PREVIOUS metadata file to
    ``metadata-log`` per the spec (the chain foreign tools'
    ``.metadata_log_entries`` / metadata time travel inspect), so the
    history is populated on every commit, not left ``[]``. The
    version file is claimed with an atomic link; racing writers get
    ``FileExistsError``. Returns the published version number."""
    names = _metadata_files(path)
    version = 1
    if names:
        try:
            version = int(names[-1].split(".")[0].lstrip("v")) + 1
        except ValueError:
            version = len(names) + 1
    meta = dict(meta)
    mlog = list((prev_meta or {}).get("metadata-log") or [])
    if names and prev_meta is not None:
        mlog.append({
            "timestamp-ms": prev_meta.get("last-updated-ms"),
            "metadata-file": f"metadata/{names[-1]}",
        })
    # the spec's write.metadata.previous-versions-max (default 100):
    # the log tracks the most recent previous files, not all history
    meta["metadata-log"] = mlog[-100:]
    final = os.path.join(_meta_dir(path), f"v{version}.metadata.json")
    tmp = final + f".tmp-{uuid.uuid4().hex[:8]}"
    with open(tmp, "w", encoding="utf-8") as fh:
        json.dump(meta, fh)
        fh.flush()
        os.fsync(fh.fileno())
    try:
        os.link(tmp, final)  # atomic put-if-absent
    except FileExistsError:
        raise FileExistsError(
            f"Iceberg metadata v{version} at {path} was claimed by a "
            "concurrent writer; re-read and retry"
        )
    finally:
        os.unlink(tmp)
    hint = os.path.join(_meta_dir(path), "version-hint.text")
    tmp = hint + f".tmp-{uuid.uuid4().hex[:8]}"
    with open(tmp, "w", encoding="utf-8") as fh:
        fh.write(str(version))
    os.replace(tmp, hint)
    return version


def _global_delete_spec(meta: dict) -> tuple:
    """``(spec_id, partition_specs)`` to write GLOBAL position
    deletes under: the table's registered UNPARTITIONED spec, or a
    freshly allocated one appended to ``partition-specs`` (the spec
    explicitly allows path-scoped position deletes under an
    unpartitioned spec). Never stamps a delete manifest with a
    partitioned spec-id while claiming an empty partition struct —
    that mis-scopes deletes in strict foreign readers."""
    specs = list(meta.get("partition-specs") or [])
    hit = next((sp for sp in specs if not sp.get("fields")), None)
    if hit is not None:
        return hit["spec-id"], specs
    sid = 1 + max((sp["spec-id"] for sp in specs), default=-1)
    specs.append({"spec-id": sid, "fields": []})
    return sid, specs


def _stage_pos_delete_entries(
    spark: SparkSession, path: str, pos_df: DataFrame, snap_id: int,
) -> list[dict]:
    """Stage position-delete parquet DISTRIBUTED: ``pos_df`` carries
    ``file_path`` (spelled exactly as the manifests spell it) and
    ``pos``. Executors write the spec-shaped files (each sorted by
    file_path, pos — multiple delete files are legal); the driver
    touches only per-file descriptors, never the O(matched rows)
    positions. Returns content=1 manifest entries."""
    import pyarrow.parquet as pq

    staging = os.path.join(path, f"_staging-{uuid.uuid4().hex[:12]}")
    (
        pos_df.select(
            F.col("file_path").cast("string").alias("file_path"),
            F.col("pos").cast("long").alias("pos"),
        )
        .repartition(F.col("file_path"))
        .sortWithinPartitions("file_path", "pos")
        .write.mode("error").parquet(staging)
    )
    entries: list[dict] = []
    staged = []
    for root, _dirs, fnames in os.walk(staging):
        staged.extend(
            os.path.join(root, n) for n in fnames
            if n.endswith(".parquet")
        )
    for src_fp in sorted(staged):
        md = pq.read_metadata(src_fp)
        if md.num_rows == 0:
            continue
        rel = f"data/delete-{uuid.uuid4().hex}.parquet"
        os.rename(src_fp, os.path.join(path, rel))
        entries.append({
            "status": 1, "snapshot_id": snap_id,
            "sequence_number": None, "file_sequence_number": None,
            "data_file": {
                "content": 1, "file_path": rel,
                "file_format": "PARQUET",
                "partition": {}, "record_count": md.num_rows,
                "file_size_in_bytes": os.path.getsize(
                    os.path.join(path, rel)),
                "lower_bounds": None, "upper_bounds": None,
            },
        })
    import shutil

    shutil.rmtree(staging, ignore_errors=True)
    return entries


def _commit_position_deletes(
    spark: SparkSession, path: str, pos_df: DataFrame,
) -> tuple:
    """Commit a POSITION-DELETE snapshot from a DISTRIBUTED
    ``(file_path, pos)`` DataFrame: delete parquet staged
    executor-side, ONE content=1 delete manifest under the table's
    (registered-if-absent) unpartitioned spec, appended to the
    current manifest list. Returns ``(snapshot_id, n_deleted)`` —
    ``(current, 0)`` with no commit when the frame is empty."""
    prev_meta = table_metadata(path)
    snap_prev = _snapshot(prev_meta, None)
    seq = prev_meta.get("last-sequence-number", 0) + 1
    snap_id = int.from_bytes(os.urandom(7), "big")
    entries = _stage_pos_delete_entries(spark, path, pos_df, snap_id)
    if not entries:
        return (prev_meta.get("current-snapshot-id"), 0)
    n = sum(e["data_file"]["record_count"] for e in entries)
    gsid, specs = _global_delete_spec(prev_meta)
    man_rel = f"metadata/manifest-{uuid.uuid4().hex}.avro"
    man_len = write_avro(
        os.path.join(path, man_rel), _manifest_entry_schema(), entries,
        metadata={"schema": json.dumps(_current_schema(prev_meta)),
                  "partition-spec": "[]",
                  "partition-spec-id": str(gsid),
                  "format-version": "2", "content": "deletes"},
    )
    manifests = [{
        "manifest_path": man_rel, "manifest_length": man_len,
        "partition_spec_id": gsid, "content": 1,
        "sequence_number": seq, "min_sequence_number": seq,
        "added_snapshot_id": snap_id,
        "added_files_count": len(entries),
        "existing_files_count": 0, "deleted_files_count": 0,
        "added_rows_count": n,
        "existing_rows_count": 0, "deleted_rows_count": 0,
    }]
    prev_list, _ = read_avro(
        _resolve_file_path(path, snap_prev["manifest-list"])
    )
    manifests.extend(prev_list)
    ml_rel = f"metadata/snap-{snap_id}-{uuid.uuid4().hex[:8]}.avro"
    write_avro(os.path.join(path, ml_rel), _manifest_file_schema(),
               manifests, metadata={"format-version": "2"})
    now_ms = int(time.time() * 1000)
    meta = dict(prev_meta)
    meta["last-sequence-number"] = seq
    meta["last-updated-ms"] = now_ms
    meta["current-snapshot-id"] = snap_id
    meta["partition-specs"] = specs
    meta["snapshots"] = list(prev_meta.get("snapshots") or []) + [{
        "snapshot-id": snap_id, "timestamp-ms": now_ms,
        "sequence-number": seq, "summary": {"operation": "delete"},
        "manifest-list": ml_rel,
        "schema-id": prev_meta.get("current-schema-id", 0),
    }]
    meta["snapshot-log"] = list(prev_meta.get("snapshot-log") or []) + [
        {"snapshot-id": snap_id, "timestamp-ms": now_ms}
    ]
    _commit_metadata(path, meta, prev_meta)
    return (snap_id, n)


def write_position_deletes(
    spark: SparkSession, path: str, pairs: list[tuple[str, int]],
) -> int:
    """Commit a POSITION-DELETE snapshot (Iceberg v2 row-level
    delete): spec-shaped delete parquet (columns ``file_path``,
    ``pos``) plus a delete MANIFEST (content=1) appended to the
    current manifest list under a new ``delete`` snapshot — written
    under the table's (registered-if-absent) UNPARTITIONED spec, so
    the manifest is spec-valid on partitioned tables too. ``pairs``:
    (data file_path exactly as the manifests spell it, 0-based row
    position). Returns the new snapshot id. Mainly the fixture/export
    shape — :func:`iceberg_delete_where` keeps positions DISTRIBUTED
    and goes through :func:`_commit_position_deletes` directly."""
    if not pairs:
        raise ValueError("position-delete commit needs >= 1 pair")
    pos_df = spark.createDataFrame(
        [(p, int(x)) for p, x in sorted(pairs)],
        "file_path string, pos long",
    )
    snap_id, _n = _commit_position_deletes(spark, path, pos_df)
    return snap_id


def write_equality_deletes(
    spark: SparkSession, path: str, rows: list[dict],
    equality_cols: list[str],
) -> int:
    """Commit an EQUALITY-DELETE snapshot (Iceberg v2): rows whose
    ``equality_cols`` values match any entry in ``rows`` are deleted
    from all data SEQUENCED BEFORE this snapshot — the CDC-upsert
    shape Flink writers emit. One spec-shaped delete parquet (just
    the equality columns) + a content=1 delete MANIFEST whose entry
    carries ``equality_ids`` (content=2 on the data_file record).
    Returns the new snapshot id."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    if not rows:
        raise ValueError("equality-delete commit needs >= 1 row")
    prev_meta = table_metadata(path)
    schema = _current_schema(prev_meta)
    ids_of = {f["name"]: f["id"] for f in schema["fields"]}
    missing = [c for c in equality_cols if c not in ids_of]
    if missing:
        raise ValueError(f"equality columns not in the schema: {missing}")
    spark_schema = _schema_to_spark(schema)
    sub = T.StructType([
        spark_schema[c] for c in equality_cols
    ])
    snap_prev = _snapshot(prev_meta, None)
    seq = prev_meta.get("last-sequence-number", 0) + 1
    snap_id = int.from_bytes(os.urandom(7), "big")
    rel = f"data/eqdelete-{uuid.uuid4().hex}.parquet"
    fp = os.path.join(path, rel)
    from pyspark.sql.pandas.types import to_arrow_type

    pq.write_table(pa.table({
        c: pa.array([r.get(c) for r in rows],
                    to_arrow_type(sub[c].dataType))
        for c in equality_cols
    }), fp)
    entry = {
        "status": 1, "snapshot_id": snap_id,
        "sequence_number": None, "file_sequence_number": None,
        "data_file": {
            "content": 2, "file_path": rel, "file_format": "PARQUET",
            "partition": {}, "record_count": len(rows),
            "file_size_in_bytes": os.path.getsize(fp),
            "lower_bounds": None, "upper_bounds": None,
            "equality_ids": [ids_of[c] for c in equality_cols],
        },
    }
    man_rel = f"metadata/manifest-{uuid.uuid4().hex}.avro"
    man_len = write_avro(
        os.path.join(path, man_rel), _manifest_entry_schema(), [entry],
        metadata={"schema": json.dumps(schema),
                  "partition-spec": "[]", "partition-spec-id": "0",
                  "format-version": "2", "content": "deletes"},
    )
    manifests = [{
        "manifest_path": man_rel, "manifest_length": man_len,
        "partition_spec_id": 0, "content": 1,
        "sequence_number": seq, "min_sequence_number": seq,
        "added_snapshot_id": snap_id, "added_files_count": 1,
        "existing_files_count": 0, "deleted_files_count": 0,
        "added_rows_count": len(rows),
        "existing_rows_count": 0, "deleted_rows_count": 0,
    }]
    prev_list, _ = read_avro(
        _resolve_file_path(path, snap_prev["manifest-list"])
    )
    manifests.extend(prev_list)
    ml_rel = f"metadata/snap-{snap_id}-{uuid.uuid4().hex[:8]}.avro"
    write_avro(os.path.join(path, ml_rel), _manifest_file_schema(),
               manifests, metadata={"format-version": "2"})
    now_ms = int(time.time() * 1000)
    meta = dict(prev_meta)
    meta["last-sequence-number"] = seq
    meta["last-updated-ms"] = now_ms
    meta["current-snapshot-id"] = snap_id
    meta["snapshots"] = list(prev_meta.get("snapshots") or []) + [{
        "snapshot-id": snap_id, "timestamp-ms": now_ms,
        "sequence-number": seq, "summary": {"operation": "delete"},
        "manifest-list": ml_rel,
        "schema-id": prev_meta.get("current-schema-id", 0),
    }]
    meta["snapshot-log"] = list(prev_meta.get("snapshot-log") or []) + [
        {"snapshot-id": snap_id, "timestamp-ms": now_ms}
    ]
    _commit_metadata(path, meta, prev_meta)
    return snap_id


def _stage_data_entries(
    df: DataFrame, path: str, pspec: list, types_of: dict,
    ice_schema: dict, stats_cols, snap_id: int,
) -> list:
    """Stage ``df`` as final ``data/`` parquet files under ``pspec``
    (``[]`` = unpartitioned) and return content=0 manifest entries
    with typed partition tuples — the ONE distributed
    repartition+partitionBy stage that :func:`write_iceberg` and
    :func:`iceberg_update_where` both commit through (so a
    partitioned UPDATE lands files with spec-true tuples, not empty
    structs). Timestamp-transform stages pin the session zone to UTC
    (spec rule) around the write action."""
    import pyarrow.parquet as pq

    staging = os.path.join(path, f"_staging-{uuid.uuid4().hex[:12]}")
    pv_types = {
        pp["pv_name"]: _transform_result_ice_type(
            pp["transform"], types_of[pp["src"]]
        )
        for pp in pspec
    }
    if pspec:
        staged = df
        for pp in pspec:
            staged = staged.withColumn(
                f"__p_{pp['pv_name']}",
                _transform_column(pp, types_of[pp["src"]]),
            )
        # align input partitions to the PARTITION TUPLES before the
        # split: a raw partitionBy writes up to
        # #input-partitions × #tuples files (the small-files explosion
        # that kills a 100 TB table's manifest); one shuffle keyed by
        # the tuple lands ~one right-sized file per tuple per write
        staged = staged.repartition(
            *[F.col(f"__p_{pp['pv_name']}") for pp in pspec]
        )
        # spec rule: timestamp transforms partition by the UTC
        # instant (ntz by its literal wall clock read AS UTC). The
        # ntz→timestamp cast and the Arrow bucket path both resolve
        # in spark.sql.session.timeZone at ACTION time, so the stage
        # runs pinned to UTC and restores the caller's zone after.
        tz_sensitive = any(
            pp["transform"] != "identity"
            and types_of[pp["src"]] in ("timestamp", "timestamptz")
            for pp in pspec
        )
        sess = df.sparkSession
        saved_tz = sess.conf.get("spark.sql.session.timeZone")
        try:
            if tz_sensitive:
                sess.conf.set("spark.sql.session.timeZone", "UTC")
            staged.write.mode("error").partitionBy(
                *[f"__p_{pp['pv_name']}" for pp in pspec]
            ).parquet(staging)
        finally:
            if tz_sensitive:
                sess.conf.set("spark.sql.session.timeZone", saved_tz)
    else:
        df.write.mode("error").parquet(staging)

    def _typed_part_value(c: str, raw: str):
        import datetime as _dt
        from urllib.parse import unquote as _unq

        if raw == "__HIVE_DEFAULT_PARTITION__":
            return None
        raw = _unq(raw)
        t = pv_types[c]
        if t in ("int", "long"):
            return int(raw)
        if t == "double":
            return float(raw)
        if t == "boolean":
            return raw.lower() == "true"
        if t == "date":  # avro int: days since epoch
            return (_dt.date.fromisoformat(raw)
                    - _dt.date(1970, 1, 1)).days
        return raw

    staged_files: list = []
    for root, _dirs, fnames in os.walk(staging):
        for n in fnames:
            if not n.endswith(".parquet"):
                continue
            segs = os.path.relpath(
                os.path.join(root, n), staging
            ).split(os.sep)[:-1]
            pv: dict = {}
            for seg in segs:
                k, sep, raw = seg.partition("=")
                if sep and k.startswith("__p_"):
                    c = k[4:]
                    pv[c] = _typed_part_value(c, raw)
            staged_files.append((os.path.join(root, n), pv))

    def _finalize(item):
        # per-file rename + footer/bounds read: pure I/O, safely
        # thread-parallel — a partitioned write can stage hundreds of
        # files and a serial driver loop was the wall (≈8 ms/file of
        # footer reads)
        src_fp, pv = item
        if pq.read_metadata(src_fp).num_rows == 0:
            return None  # empty part file: not a data file
        final = f"data/{uuid.uuid4().hex}.parquet"
        os.rename(src_fp, os.path.join(path, final))
        fp = os.path.join(path, final)
        lows, highs, n_rows = _file_bounds_maps(
            fp, list(stats_cols or []), ice_schema["fields"]
        )
        return {
            "status": 1, "snapshot_id": snap_id,
            "sequence_number": None, "file_sequence_number": None,
            "data_file": {
                "content": 0, "file_path": final,
                "file_format": "PARQUET",
                "partition": {
                    pp["pv_name"]: pv.get(pp["pv_name"])
                    for pp in pspec
                },
                "record_count": (
                    n_rows if n_rows is not None
                    else pq.read_metadata(fp).num_rows
                ),
                "file_size_in_bytes": os.path.getsize(fp),
                "lower_bounds": lows, "upper_bounds": highs,
            },
        }

    from concurrent.futures import ThreadPoolExecutor

    data_files: list = []
    with ThreadPoolExecutor(max_workers=16) as pool:
        for rec in pool.map(_finalize, sorted(staged_files)):
            if rec is not None:
                data_files.append(rec)
    import shutil

    shutil.rmtree(staging, ignore_errors=True)
    return data_files


def write_iceberg(
    df: DataFrame, path: str, mode: str = "overwrite",
    stats_cols: list[str] | None = None,
    partition_by: list[str] | None = None,
    evolve_spec: bool = False,
    operation: "str | None" = None,
    branch: "str | None" = None,
) -> int:
    """Commit ``df`` to an Iceberg v2 table directory any Iceberg
    reader can open. ``append`` adds a fast-append snapshot (the new
    manifest list carries previous manifests forward); ``overwrite``
    starts a fresh live set. Returns the new snapshot id. The
    metadata file is claimed with an atomic link, racing writers get
    ``FileExistsError``.

    ``partition_by``: spec entries — a bare column (identity),
    ``bucket[N](c)`` / ``bucket(N, c)``, ``truncate[W](c)``, or
    ``year/month/day/hour(c)`` (Appendix-B transforms; bucket rides a
    vectorized Arrow pandas_udf computing the spec's murmur3 — Spark's
    own hash() seeds differently). Iceberg requires data files to
    STORE source columns, so the stage computes each transform under
    a hidden ``__p_<pv>`` name for the directory split (one partition
    tuple per file) while the real columns stay in the files; each
    file's typed tuple lands in the manifest's partition struct (spec
    field-ids allocated past ``last-partition-id``), giving foreign
    readers — and :func:`read_iceberg` — partition pruning (exact for
    identity, bound-mapped for monotone transforms, equality-only for
    bucket). ``evolve_spec=True`` lets an append CHANGE the
    layout: a new spec-id is allocated, old files keep pruning under
    theirs (readers resolve the spec per manifest).

    METADATA CONTINUITY (spec rules): same-named columns keep their
    field ids across overwrites, new columns allocate monotonically
    past ``last-column-id`` (ids never renumber — old manifests'
    bounds stay decodable); prior schemas stay listed under their
    schema-ids (snapshots resolve the schema they wrote); prior
    partition-specs carry forward."""
    import pyarrow.parquet as pq

    if mode not in ("overwrite", "append"):
        raise ValueError(f"mode must be overwrite|append, got {mode!r}")
    if branch and branch != "main" and not _metadata_files(path):
        raise ValueError(
            "branch write on a table with no main history — create "
            "the table first, then branch"
        )
    if partition_by is None and mode == "append":
        # honor the table's DEFAULT SPEC by default — after a
        # metadata-only SET PARTITION SPEC (or any foreign spec
        # evolution) a bare append lands under the current layout
        # instead of erroring
        names0 = _metadata_files(path)
        if names0:
            with open(os.path.join(_meta_dir(path), names0[-1]),
                      encoding="utf-8") as fh:
                partition_by = _spec_to_partition_by(json.load(fh))
    pspec = [_parse_partition_entry(e) for e in (partition_by or [])]
    pcols = [p["src"] for p in pspec]
    missing = [c for c in pcols if c not in df.columns]
    if missing:
        raise ValueError(f"partition_by columns not in the batch: {missing}")
    os.makedirs(_meta_dir(path), exist_ok=True)
    os.makedirs(os.path.join(path, "data"), exist_ok=True)
    prev_meta = None
    names = _metadata_files(path)
    if names:
        with open(os.path.join(_meta_dir(path), names[-1]),
                  encoding="utf-8") as fh:
            prev_meta = json.load(fh)
    ice_schema = _spark_schema_to_ice(df.schema)
    if prev_meta is not None:
        have = _current_schema(prev_meta)
        if [(f["name"], f["type"]) for f in have["fields"]] != \
           [(f["name"], f["type"]) for f in ice_schema["fields"]]:
            if mode == "append":
                raise ValueError(
                    "append schema differs from the table's; overwrite "
                    "to evolve"
                )
    # FIELD-ID CONTINUITY (spec rule: a column's field id is
    # immutable for the life of the table, and ids are never
    # reused). Same-named columns keep their prior id; new columns
    # allocate monotonically past last-column-id — so bounds in OLD
    # manifests still decode with the ids they were written under
    # after an overwrite evolves the schema, and foreign appends
    # never renumber a table's history.
    schemas: list[dict]
    cur_schema_id = 0
    if prev_meta is not None:
        have = _current_schema(prev_meta)
        prev_ids = {f["name"]: f["id"] for f in have["fields"]}
        last_col = prev_meta.get(
            "last-column-id",
            max((f["id"] for f in have["fields"]), default=0),
        )
        for f in ice_schema["fields"]:
            if f["name"] in prev_ids:
                f["id"] = prev_ids[f["name"]]
            else:
                last_col += 1
                f["id"] = last_col
        last_col = max(
            last_col,
            max((f["id"] for f in ice_schema["fields"]), default=0),
        )
        # SCHEMA HISTORY: prior schemas stay listed under their own
        # schema-ids; the current schema reuses a matching entry or
        # appends a new one (old snapshots keep resolving theirs)
        schemas = list(prev_meta.get("schemas") or [])
        if not schemas and "schema" in prev_meta:  # format-v1 shape
            schemas = [dict(prev_meta["schema"], **{"schema-id": 0})]

        def _sig(s: dict):
            return [
                (f["id"], f["name"], f["type"],
                 bool(f.get("required")))
                for f in s["fields"]
            ]

        hit = next(
            (s for s in schemas if _sig(s) == _sig(ice_schema)), None
        )
        if hit is not None:
            cur_schema_id = hit.get("schema-id", 0)
            ice_schema = hit
        else:
            cur_schema_id = 1 + max(
                (s.get("schema-id", 0) for s in schemas), default=-1
            )
            ice_schema = dict(ice_schema, **{"schema-id": cur_schema_id})
            schemas.append(ice_schema)
        last_column_id = last_col
    else:
        schemas = [ice_schema]
        last_column_id = max(
            (f["id"] for f in ice_schema["fields"]), default=0
        )
    # identity partition spec: typed fields, stable spec field-ids —
    # prior specs carry forward; an identical spec (same columns,
    # transforms, source ids) reuses its spec-id, a changed layout
    # appends a new spec with partition field ids allocated past
    # last-partition-id (never reused)
    ids_of = {f["name"]: f["id"] for f in ice_schema["fields"]}
    types_of = {f["name"]: f["type"] for f in ice_schema["fields"]}
    prev_specs = list(
        (prev_meta or {}).get("partition-specs") or []
    )
    last_partition_id = (prev_meta or {}).get("last-partition-id", 999)
    want_sig = [
        (p["pv_name"], p["transform"], ids_of[p["src"]]) for p in pspec
    ]
    spec_hit = next(
        (sp for sp in prev_specs
         if [(f["name"], f["transform"], f["source-id"])
             for f in sp.get("fields", [])] == want_sig),
        None,
    )
    by_src_type = {f["id"]: f["type"] for f in ice_schema["fields"]}
    if spec_hit is not None:
        spec_id = spec_hit["spec-id"]
        part_fields = [
            dict(f, type=_transform_result_ice_type(
                f["transform"], by_src_type[f["source-id"]]
            ))
            for f in spec_hit["fields"]
        ]
    else:
        spec_id = 1 + max(
            (sp["spec-id"] for sp in prev_specs), default=-1
        )
        part_fields = []
        for pp in pspec:
            last_partition_id += 1
            part_fields.append({
                "name": pp["pv_name"],
                "type": _transform_result_ice_type(
                    pp["transform"], types_of[pp["src"]]
                ),
                "field-id": last_partition_id,
                "source-id": ids_of[pp["src"]],
                "transform": pp["transform"],
            })
        prev_specs = prev_specs + [{
            "spec-id": spec_id,
            "fields": [
                {k: f[k] for k in
                 ("name", "transform", "source-id", "field-id")}
                for f in part_fields
            ],
        }]
    if prev_meta is not None and mode == "append" and not evolve_spec:
        prev_spec = next(
            (sp for sp in prev_meta.get("partition-specs", [])
             if sp["spec-id"] == prev_meta.get("default-spec-id", 0)),
            {"fields": []},
        )
        if [(f["name"], f["transform"])
                for f in prev_spec.get("fields", [])] != \
                [(p["pv_name"], p["transform"]) for p in pspec]:
            raise ValueError(
                f"append partitioned by {pcols} onto a table "
                f"partitioned by "
                f"{[f['name'] for f in prev_spec.get('fields', [])]} "
                "— pass evolve_spec=True to EVOLVE the layout (old "
                "files keep their spec, new files land under the new "
                "one; readers prune per file)"
            )
    seq = (prev_meta or {}).get("last-sequence-number", 0) + 1
    snap_id = int.from_bytes(os.urandom(7), "big")
    # stage data files; a partitioned stage splits on DUPLICATED
    # hidden columns so the real ones stay stored in the files (the
    # spec requires it), one tuple per file
    data_files = _stage_data_entries(
        df, path, pspec, types_of, ice_schema, stats_cols, snap_id
    )
    if not data_files:
        raise ValueError("empty batch: Iceberg snapshots need >= 1 file")
    # one manifest for the new files
    man_rel = f"metadata/manifest-{uuid.uuid4().hex}.avro"
    man_len = write_avro(
        os.path.join(path, man_rel),
        _manifest_entry_schema(part_fields),
        data_files,
        metadata={
            "schema": json.dumps(ice_schema),
            "partition-spec": json.dumps([
                {k: f[k] for k in
                 ("name", "transform", "source-id", "field-id")}
                for f in part_fields
            ]),
            "partition-spec-id": str(spec_id),
            "format-version": "2", "content": "data",
        },
    )
    added_rows = sum(
        e["data_file"]["record_count"] for e in data_files
    )
    manifest_entry = {
        "manifest_path": man_rel, "manifest_length": man_len,
        "partition_spec_id": spec_id, "content": 0,
        "sequence_number": seq, "min_sequence_number": seq,
        "added_snapshot_id": snap_id,
        "added_files_count": len(data_files),
        "existing_files_count": 0, "deleted_files_count": 0,
        "added_rows_count": added_rows,
        "existing_rows_count": 0, "deleted_rows_count": 0,
    }
    manifests = [manifest_entry]
    parent_sid = (prev_meta or {}).get("current-snapshot-id")
    if branch and branch != "main" and prev_meta is not None:
        bref = ((prev_meta.get("refs") or {}).get(branch))
        if bref is not None:
            parent_sid = int(bref["snapshot-id"])
        # an absent branch forks from the CURRENT head (the
        # write-audit-publish convention: first write creates it)
    if mode == "append" and prev_meta is not None and \
            parent_sid is not None:
        prev_snap = _snapshot(prev_meta, parent_sid)
        prev_list, _ = read_avro(
            _resolve_file_path(path, prev_snap["manifest-list"])
        )
        manifests.extend(prev_list)
    ml_rel = f"metadata/snap-{snap_id}-{uuid.uuid4().hex[:8]}.avro"
    write_avro(
        os.path.join(path, ml_rel), _manifest_file_schema(), manifests,
        metadata={"format-version": "2"},
    )
    now_ms = int(time.time() * 1000)
    snapshot = {
        "snapshot-id": snap_id, "timestamp-ms": now_ms,
        "sequence-number": seq,
        "summary": {"operation": operation or (
            "append" if mode == "append" else "overwrite")},
        "manifest-list": ml_rel, "schema-id": cur_schema_id,
    }
    meta = {
        "format-version": 2,
        "table-uuid": (prev_meta or {}).get("table-uuid",
                                            str(uuid.uuid4())),
        "location": path,
        "last-sequence-number": seq,
        "last-updated-ms": now_ms,
        "last-column-id": last_column_id,
        "current-schema-id": cur_schema_id,
        "schemas": schemas,
        "default-spec-id": spec_id,
        "partition-specs": prev_specs,
        "last-partition-id": last_partition_id,
        # carry table PROPERTIES, sort orders and refs through a
        # data commit — a rebuilt-from-scratch metadata would
        # silently strip a foreign table's configuration (retention
        # settings, schema.name-mapping.default, branch refs)
        "properties": dict(
            (prev_meta or {}).get("properties") or {}
        ),
        "default-sort-order-id": (prev_meta or {}).get(
            "default-sort-order-id", 0
        ),
        "sort-orders": (
            list((prev_meta or {}).get("sort-orders") or [])
            or [{"order-id": 0, "fields": []}]
        ),
        "current-snapshot-id": (
            snap_id if not branch or branch == "main"
            else (prev_meta or {}).get("current-snapshot-id")
        ),
        "snapshots": (
            list((prev_meta or {}).get("snapshots") or []) + [snapshot]
        ),
        "snapshot-log": (
            list((prev_meta or {}).get("snapshot-log") or [])
            + ([{"snapshot-id": snap_id, "timestamp-ms": now_ms}]
               if not branch or branch == "main" else [])
        ),
    }
    if snapshot.get("parent-snapshot-id") is None and \
            parent_sid is not None:
        snapshot["parent-snapshot-id"] = parent_sid
    prev_refs = (prev_meta or {}).get("refs")
    if branch and branch != "main":
        # a BRANCH write: the branch head advances; main and the
        # snapshot-log (which tracks the CURRENT pointer) stay put —
        # the write-audit-publish shape (iceberg_fast_forward
        # publishes)
        refs = {k: dict(v) for k, v in (prev_refs or {}).items()}
        if not refs and (prev_meta or {}).get(
            "current-snapshot-id"
        ) is not None:
            refs["main"] = {
                "snapshot-id": prev_meta["current-snapshot-id"],
                "type": "branch",
            }
        refs[branch] = dict(refs.get(branch) or {"type": "branch"},
                            **{"snapshot-id": snap_id})
        meta["refs"] = refs
    elif prev_refs:
        # a foreign table tracking branches: advance main, keep the
        # rest (tags and side branches still resolve their snapshots)
        refs = {k: dict(v) for k, v in prev_refs.items()}
        refs["main"] = dict(refs.get("main") or {"type": "branch"},
                            **{"snapshot-id": snap_id})
        meta["refs"] = refs
    _commit_metadata(path, meta, prev_meta)
    return snap_id


def _spec_to_partition_by(meta: dict) -> "list[str] | None":
    """The current default spec re-expressed in ``write_iceberg``'s
    ``partition_by`` entry language (so compaction preserves the
    layout). None when unpartitioned; raises on a transform this
    writer cannot re-produce."""
    schema = _current_schema(meta)
    by_id = {f["id"]: f["name"] for f in schema["fields"]}
    spec = next(
        (sp for sp in meta.get("partition-specs", [])
         if sp.get("spec-id") == meta.get("default-spec-id", 0)),
        {"fields": []},
    )
    out = []
    for f in spec.get("fields", []):
        src_name = by_id.get(f.get("source-id"))
        tr = f.get("transform")
        if src_name is None:
            raise IcebergProtocolError(
                f"partition field {f.get('name')!r} sources a column "
                "absent from the current schema"
            )
        if tr == "identity":
            out.append(src_name)
        elif tr in ("year", "month", "day", "hour") or (
            tr and (tr.startswith("bucket[")
                    or tr.startswith("truncate["))
        ):
            mt = re.match(r"^(\w+)\[(\d+)\]$", tr or "")
            if mt:
                out.append(f"{mt.group(1)}[{mt.group(2)}]({src_name})")
            else:
                out.append(f"{tr}({src_name})")
        else:
            raise IcebergProtocolError(
                f"transform {tr!r} cannot be re-produced by this "
                "writer"
            )
    return out or None


def _provenance_scan(spark, path, data, spark_schema, deletes,
                     meta=None, ice_schema=None):
    """ONE scan over the live data files carrying ``__f`` (decoded
    absolute path) and ``__p`` (row position) provenance columns,
    with existing POSITION deletes subtracted by a single distributed
    anti-join — never decoded into driver-side sets (an existing
    delete backlog can be O(table)). With ``meta``/``ice_schema``
    the scan resolves RENAMED columns (files predating a rename
    carry the old physical name)."""
    paths = sorted(
        os.path.abspath(_resolve_file_path(path, d["file_path"]))
        for d in data
    )
    if meta is not None and ice_schema is not None:
        scan, project = _data_scan(
            spark, path, paths, spark_schema, meta, ice_schema
        )
    else:
        scan = spark.read.schema(spark_schema).parquet(*paths)
        project = None
    scan_path = F.url_decode(F.replace(
        F.regexp_replace(
            F.col("_metadata.file_path"), "^[a-zA-Z0-9]+:/+", "/"
        ),
        F.lit("+"), F.lit("%2B"),
    ))
    base = scan.select(
        "*", scan_path.alias("__f"),
        F.col("_metadata.row_index").alias("__p"),
    )
    pos_dels = [d for d in (deletes or [])
                if (d.get("content") or 0) == 1]
    if pos_dels:
        del_paths = sorted(
            _resolve_file_path(path, d["file_path"]) for d in pos_dels
        )
        dv = spark.read.schema(
            "file_path string, pos long"
        ).parquet(*del_paths).select(
            _norm_content_path(path, F.col("file_path")).alias("__dvf"),
            F.col("pos").alias("__dvp"),
        )
        base = base.join(
            dv,
            (F.col("__f") == F.col("__dvf"))
            & (F.col("__p") == F.col("__dvp")),
            "left_anti",
        )
    if project is not None:
        base = project(base, extra=("__f", "__p"))
    return base


def _spelled_positions(spark, path, data, hits):
    """``(file_path, pos)`` of ``hits`` (which carries ``__f``/
    ``__p``) with the file path spelled exactly as the manifests
    spell it — a broadcast map join over the O(#files) live set, with
    an executor-side raise if a scanned file is no longer live
    (concurrent commit)."""
    smap = spark.createDataFrame(
        [(os.path.abspath(_resolve_file_path(path, d["file_path"])),
          d["file_path"]) for d in data],
        "__absf string, __spelled string",
    )
    return hits.select("__f", "__p").join(
        F.broadcast(smap), F.col("__f") == F.col("__absf"), "left"
    ).select(
        F.when(
            F.col("__spelled").isNull(),
            F.raise_error(F.concat(
                F.lit("scanned file "), F.col("__f"),
                F.lit(" is not a live data file; concurrent commit "
                      "— retry"),
            )),
        ).otherwise(F.col("__spelled")).alias("file_path"),
        F.col("__p").alias("pos"),
    )


def iceberg_delete_where(
    spark: SparkSession, path: str, pred: str,
) -> tuple:
    """Row-level DELETE on an Iceberg table IN ITS OWN FORMAT —
    merge-on-read via a spec POSITION-DELETE snapshot, PARTITIONED
    tables included: the delete manifest is written under a
    registered UNPARTITIONED spec (the global position-delete shape
    the spec allows), never a partitioned spec-id claiming an empty
    tuple — strict foreign readers (Spark+Iceberg, Trino) resolve
    applicability through the spec and would mis-scope that.

    Scale shape: matched positions stay DISTRIBUTED end to end —
    existing deletes subtract via one anti-join, the predicate
    evaluates ONCE into executor-written delete parquet (each sorted
    by file_path, pos), and the driver touches only per-file
    descriptors, never O(matched rows). Returns
    ``(snapshot_id, n_deleted)``; no commit when nothing matches.
    Tables carrying EQUALITY deletes refuse — their sequence-scoped
    value matching makes exact position accounting ambiguous; run
    :func:`iceberg_compact` first."""
    meta = table_metadata(path)
    schema = _current_schema(meta)
    spark_schema = _schema_to_spark(schema)
    data, deletes = live_files(path, meta)
    if any((d.get("content") or 0) == 2 for d in deletes):
        raise IcebergProtocolError(
            "DELETE WHERE on a table with EQUALITY deletes: compact "
            "first (iceberg_compact) so positions are unambiguous"
        )
    if not data:
        return (meta.get("current-snapshot-id"), 0)
    from harmony_energy_data_pipeline_spark.sinks.snapshots import (
        parse_conjunctive_where,
    )

    # planning-time file pruning: a conjunctive predicate skips
    # files on bounds + partition tuples (all transforms) exactly
    # like read_iceberg — `DELETE WHERE day < X` on a 100 TB table
    # scans candidates, not the table
    triples = parse_conjunctive_where(pred)
    if triples:
        data = _prune_data_files(meta, schema, data, triples)
        if not data:
            return (meta.get("current-snapshot-id"), 0)
    base = _provenance_scan(spark, path, data, spark_schema,
                             deletes, meta, schema)
    pos_df = _spelled_positions(
        spark, path, data, base.filter(F.expr(pred))
    )
    sid, n = _commit_position_deletes(spark, path, pos_df)
    if n == 0:
        return (meta.get("current-snapshot-id"), 0)
    return (sid, n)


def _staging_spec(meta: dict, schema: dict) -> tuple:
    """Validate that the table's CURRENT default partition spec is
    one this writer can stage data under, and compile it into the
    ``(pspec, part_fields)`` pair :func:`_stage_data_entries` takes.
    Metadata-only — a refusal costs nothing and orphans nothing.
    Shared by the wire-format UPDATE and MERGE paths."""
    cur_spec = next(
        (sp for sp in meta.get("partition-specs", [])
         if sp.get("spec-id") == meta.get("default-spec-id", 0)),
        {"fields": []},
    )
    by_id_name = {f["id"]: f["name"] for f in schema["fields"]}
    by_src_type = {f["id"]: f["type"] for f in schema["fields"]
                   if isinstance(f["type"], str)}
    pspec, part_fields = [], []
    for f in cur_spec.get("fields", []):
        src = by_id_name.get(f.get("source-id"))
        tr = f.get("transform") or ""
        if src is None or not (
            tr == "identity"
            or tr in ("year", "month", "day", "hour")
            or tr.startswith(("bucket[", "truncate["))
        ):
            raise IcebergProtocolError(
                f"cannot stage data under partition transform "
                f"{tr!r} — rewrite via read_iceberg + write_iceberg"
            )
        pspec.append({"src": src, "transform": tr,
                      "pv_name": f["name"]})
        part_fields.append(dict(
            f, type=_transform_result_ice_type(
                tr, by_src_type[f["source-id"]]),
        ))
    return pspec, part_fields


def _commit_mor_snapshot(
    spark: SparkSession, path: str, meta: dict, schema: dict,
    pos_df: "DataFrame | None", produced: "DataFrame | None",
    pspec: "list | None", part_fields: "list | None",
    stats_cols: "list | None" = None,
) -> tuple:
    """ONE v2 snapshot carrying a position-delete manifest (from the
    distributed ``pos_df`` of ``(file_path, pos)``, written under a
    registered UNPARTITIONED spec — the global shape) AND/OR a data
    manifest (``produced`` rows staged under the table's CURRENT
    default spec with real partition tuples): a reader sees the
    mutation atomically, never a deleted-but-not-reinserted middle.
    Shared by the wire-format UPDATE and MERGE committers. Returns
    ``(snapshot_id, n_deleted, n_added)``; commits nothing and
    returns the current snapshot when both halves are empty."""
    seq = meta.get("last-sequence-number", 0) + 1
    snap_id = int.from_bytes(os.urandom(7), "big")
    del_entries = (
        _stage_pos_delete_entries(spark, path, pos_df, snap_id)
        if pos_df is not None else []
    )
    data_entries = []
    if produced is not None:
        types_of = {f["name"]: f["type"] for f in schema["fields"]}
        data_entries = _stage_data_entries(
            produced, path, pspec, types_of, schema, stats_cols,
            snap_id,
        )
    if not del_entries and not data_entries:
        return (meta.get("current-snapshot-id"), 0, 0)
    # two manifests, one snapshot: deletes under the unpartitioned
    # global spec, data under the table's default spec
    gsid, specs = _global_delete_spec(meta)
    spec_id = meta.get("default-spec-id", 0)
    manifests = []
    for content, entries, pf, sid_, spec_json in (
        (1, del_entries, None, gsid, "[]"),
        (0, data_entries, part_fields, spec_id, json.dumps([
            {k: f[k] for k in
             ("name", "transform", "source-id", "field-id")}
            for f in (part_fields or [])
        ])),
    ):
        if not entries:
            continue
        man_rel = f"metadata/manifest-{uuid.uuid4().hex}.avro"
        man_len = write_avro(
            os.path.join(path, man_rel),
            _manifest_entry_schema(pf), entries,
            metadata={
                "schema": json.dumps(schema),
                "partition-spec": spec_json,
                "partition-spec-id": str(sid_),
                "format-version": "2",
                "content": "deletes" if content == 1 else "data",
            },
        )
        manifests.append({
            "manifest_path": man_rel, "manifest_length": man_len,
            "partition_spec_id": sid_, "content": content,
            "sequence_number": seq, "min_sequence_number": seq,
            "added_snapshot_id": snap_id,
            "added_files_count": len(entries),
            "existing_files_count": 0, "deleted_files_count": 0,
            "added_rows_count": sum(
                e["data_file"]["record_count"] for e in entries),
            "existing_rows_count": 0, "deleted_rows_count": 0,
        })
    prev_snap = _snapshot(meta, None)
    prev_list, _ = read_avro(
        _resolve_file_path(path, prev_snap["manifest-list"])
    )
    manifests.extend(prev_list)
    ml_rel = f"metadata/snap-{snap_id}-{uuid.uuid4().hex[:8]}.avro"
    write_avro(os.path.join(path, ml_rel), _manifest_file_schema(),
               manifests, metadata={"format-version": "2"})
    now_ms = int(time.time() * 1000)
    new_meta = dict(meta)
    new_meta["last-sequence-number"] = seq
    new_meta["last-updated-ms"] = now_ms
    new_meta["current-snapshot-id"] = snap_id
    new_meta["partition-specs"] = specs
    new_meta["snapshots"] = list(meta.get("snapshots") or []) + [{
        "snapshot-id": snap_id, "timestamp-ms": now_ms,
        "sequence-number": seq,
        "summary": {"operation": "overwrite"},
        "manifest-list": ml_rel,
        "schema-id": meta.get("current-schema-id", 0),
    }]
    new_meta["snapshot-log"] = (
        list(meta.get("snapshot-log") or [])
        + [{"snapshot-id": snap_id, "timestamp-ms": now_ms}]
    )
    _commit_metadata(path, new_meta, meta)
    return (
        snap_id,
        sum(e["data_file"]["record_count"] for e in del_entries),
        sum(e["data_file"]["record_count"] for e in data_entries),
    )


def iceberg_update_where(
    spark: SparkSession, path: str, pred: str, set_exprs: dict,
    stats_cols: "list[str] | None" = None,
) -> tuple:
    """Row-level UPDATE on an Iceberg table in its own format — ONE
    v2 snapshot carrying BOTH a position-delete manifest (the old
    rows, under a registered unpartitioned spec — the global shape)
    and a data manifest (the transformed rows, staged under the
    table's CURRENT default spec with real partition tuples —
    PARTITIONED tables included): a reader sees the update
    atomically, never the deleted-but-not-reinserted middle.

    The matched set is evaluated ONCE: the predicate materializes the
    hit rows (with file/position provenance) to a staging parquet,
    and both the delete positions and the re-inserted rows derive
    from that materialization — a non-deterministic predicate
    (rand(), now()-relative) cannot desynchronize them. Positions
    stay distributed; the driver sees only per-file descriptors.
    SET results cast back to the DECLARED column types. Returns
    ``(snapshot_id, n_updated)``. Equality-delete tables refuse as
    in :func:`iceberg_delete_where`."""
    import shutil

    if not set_exprs:
        raise ValueError("update needs at least one SET expression")
    meta = table_metadata(path)
    schema = _current_schema(meta)
    spark_schema = _schema_to_spark(schema)
    data, deletes = live_files(path, meta)
    if any((d.get("content") or 0) == 2 for d in deletes):
        raise IcebergProtocolError(
            "UPDATE WHERE on a table with EQUALITY deletes: compact "
            "first (iceberg_compact) so positions are unambiguous"
        )
    if not data:
        return (meta.get("current-snapshot-id"), 0)
    # validate the CURRENT default spec FIRST (metadata-only): a
    # refusal must cost nothing and orphan nothing — staging happens
    # only after this passes
    pspec, part_fields = _staging_spec(meta, schema)
    from harmony_energy_data_pipeline_spark.sinks.snapshots import (
        parse_conjunctive_where,
        stage_rows_once,
    )

    # planning-time file pruning, as in iceberg_delete_where
    triples = parse_conjunctive_where(pred)
    if triples:
        data = _prune_data_files(meta, schema, data, triples)
        if not data:
            return (meta.get("current-snapshot-id"), 0)
    base = _provenance_scan(spark, path, data, spark_schema,
                             deletes, meta, schema)
    # SINGLE EVALUATION: materialize the matched rows once
    staged, n, hitstage = stage_rows_once(
        spark, path, base.filter(F.expr(pred))
    )
    if n == 0:
        return (meta.get("current-snapshot-id"), 0)
    try:
        # the old rows' positions → executor-written delete parquet
        pos_df = _spelled_positions(spark, path, data, staged)
        # the transformed rows, staged under the CURRENT default spec
        cols = [f["name"] for f in schema["fields"]]
        ttypes = {f.name: f.dataType for f in spark_schema.fields}
        upd = staged
        for c, e in set_exprs.items():
            if c not in ttypes:
                raise ValueError(f"SET column {c!r} not in table")
            col = F.expr(e) if isinstance(e, str) else e
            upd = upd.withColumn(c, col.cast(ttypes[c]))
        upd = upd.select(*cols)
        snap_id, _nd, _na = _commit_mor_snapshot(
            spark, path, meta, schema, pos_df, upd, pspec,
            part_fields, stats_cols,
        )
    finally:
        shutil.rmtree(hitstage, ignore_errors=True)
    return (snap_id, n)


def _iceberg_merge_scope(meta: dict, schema: dict, data: list,
                         source: DataFrame, key: str, skey: str,
                         nmbs: list) -> list:
    """The data files a wire-format MERGE must SCAN — the Iceberg
    twin of :func:`_delta_merge_scope`: files whose manifest bounds /
    partition tuples provably exclude EVERY source key (one bounded
    min/max aggregation) cannot contain a match, so their rows are
    untouched by construction; conjunctive-range NOT MATCHED BY
    SOURCE conditions widen the scope, unbounded ones force a full
    scan. No-false-negative everywhere (:func:`_prune_data_files`
    is conservative where information is missing)."""
    import datetime as _dt

    from harmony_energy_data_pipeline_spark.sinks.snapshots import (
        parse_conjunctive_where,
        strip_target_alias,
    )

    nmbs_wheres: list = []
    if nmbs:
        for cl in nmbs:
            cond = cl.get("condition")
            parsed = (
                None if cond is None
                else parse_conjunctive_where(strip_target_alias(cond))
            )
            if parsed is None:
                return list(data)  # unbounded NMBS: full scan
            nmbs_wheres.append(parsed)
    row = source.agg(
        F.min(skey).alias("lo"), F.max(skey).alias("hi")
    ).collect()[0]
    lo, hi = row["lo"], row["hi"]
    prunable = (int, float, str, _dt.date)
    if lo is not None and isinstance(lo, prunable) \
            and not isinstance(lo, _dt.datetime):
        scoped = _prune_data_files(meta, schema, data,
                                   [(key, lo, hi)])
    elif lo is None:
        # empty / all-NULL source keys: nothing can match — only the
        # NMBS ranges (if any) need target rows
        scoped = []
    else:
        return list(data)  # unprunable key type: full scan
    seen = {d["file_path"] for d in scoped}
    for w in nmbs_wheres:
        for d in _prune_data_files(meta, schema, data, w):
            if d["file_path"] not in seen:
                seen.add(d["file_path"])
                scoped.append(d)
    return scoped


def iceberg_merge_when(
    spark: SparkSession, path: str, source: DataFrame, key: str,
    matched: "list | tuple" = (), not_matched: "list | tuple" = (),
    not_matched_by_source: "list | tuple" = (),
    source_key: "str | None" = None,
    stats_cols: "list[str] | None" = None,
    evolve_schema: bool = False,
) -> tuple:
    """MERGE INTO an Iceberg table IN ITS OWN FORMAT — the full
    WHEN-clause surface of :func:`snapshot_merge_when` (same clause
    dicts, first-match semantics, SQL cardinality rule) as ONE v2
    merge-on-read snapshot: target rows hit by an UPDATE/DELETE
    clause position-delete out of their files (global unpartitioned
    delete spec), clause-produced rows (update post-images + inserts)
    stage under the table's CURRENT default spec with real partition
    tuples — partitioned tables included, one atomic snapshot, no
    adoption. The daily CDC upsert (reference: src/serve/load.py:43-46)
    lands on a foreign Iceberg table without leaving its wire format.

    Scale shape: the labeling engine's full-outer join shuffles
    target∪source on the key ONCE; the target scan is scoped by
    source-key min/max against manifest bounds + partition transforms
    (:func:`_iceberg_merge_scope`, no-false-negative); the labeled
    rows materialize ONCE (:func:`stage_rows_once`) and both commit
    halves derive from that staging; delete parquet and data files
    write executor-side with O(#files) driver descriptors.
    :func:`read_iceberg_changes` replays the snapshot as
    delete+insert rows, the same shape the single-snapshot UPDATE
    emits.

    Returns ``(snapshot_id, n_changed)`` — clause-hit rows (updates +
    deletes + inserts); ``(current_snapshot_id, 0)`` with NO commit
    when no clause fires. Equality-delete tables refuse as in
    :func:`iceberg_delete_where`."""
    import shutil

    from harmony_energy_data_pipeline_spark.sinks.snapshots import (
        _merge_cardinality_check,
        _merge_check_clauses,
        _merge_evolve_wire,
        _merge_labeled,
        _merge_out_cols,
        stage_rows_once,
    )

    matched, not_matched, nmbs = _merge_check_clauses(
        matched, not_matched, not_matched_by_source
    )
    skey = source_key or key
    meta = table_metadata(path)
    schema = _current_schema(meta)
    if evolve_schema and _merge_evolve_wire(
        source, {f["name"] for f in schema["fields"]},
        lambda cols: iceberg_add_columns(path, cols),
    ):
        # MERGE WITH SCHEMA EVOLUTION: new source columns landed as a
        # metadata-only schema commit — re-read so the clauses see
        # them (NULL for pre-existing rows)
        meta = table_metadata(path)
        schema = _current_schema(meta)
    spark_schema = _schema_to_spark(schema)
    data, deletes = live_files(path, meta)
    if any((d.get("content") or 0) == 2 for d in deletes):
        raise IcebergProtocolError(
            "MERGE on a table with EQUALITY deletes: compact first "
            "(iceberg_compact) so positions are unambiguous"
        )
    tcols = [f["name"] for f in schema["fields"]]
    ttypes = {f.name: f.dataType for f in spark_schema.fields}
    if key not in ttypes:
        raise ValueError(f"merge key {key!r} not a table column")
    if skey not in source.columns:
        raise ValueError(
            f"merge source key {skey!r} not a source column"
        )
    # clauses that PRODUCE rows need a stageable default spec —
    # validated FIRST (metadata-only, orphans nothing); a pure-delete
    # merge commits no data manifest and skips the requirement
    produces_rows = bool(not_matched) or any(
        cl["action"] == "update" for cl in (*matched, *nmbs)
    )
    pspec, part_fields = (
        _staging_spec(meta, schema) if produces_rows else (None, None)
    )
    if matched:
        _merge_cardinality_check(source, skey)
    scoped = (
        _iceberg_merge_scope(meta, schema, data, source, key, skey,
                             nmbs)
        if data else []
    )
    if scoped:
        base = _provenance_scan(spark, path, scoped, spark_schema,
                                deletes, meta, schema)
    else:
        from pyspark.sql.types import LongType, StringType
        from pyspark.sql.types import StructField as _SF
        from pyspark.sql.types import StructType as _ST

        base = spark.createDataFrame([], _ST(
            list(spark_schema.fields)
            + [_SF("__f", StringType()), _SF("__p", LongType())]
        ))
    j, labels, drop_labels = _merge_labeled(
        base, source, key, skey, matched, not_matched, nmbs
    )
    touched_labels = sorted(
        label for label, _cl, kind in labels
        if kind in ("matched", "nmbs")
    )
    ins_labels = sorted(
        label for label, _cl, kind in labels if kind == "insert"
    )
    # SINGLE EVALUATION: every clause-hit row (with target provenance
    # and source struct) materializes exactly once; both commit
    # halves derive from this staging
    staged, n_changed, stage_dir = stage_rows_once(
        spark, path,
        j.filter(F.col("__act").isin(touched_labels + ins_labels)),
    )
    if n_changed == 0:
        return (meta.get("current-snapshot-id"), 0)
    try:
        pos_df = None
        if touched_labels:
            del_rows = staged.filter(
                F.col("__act").isin(touched_labels)
            ).select("t.*")
            pos_df = _spelled_positions(spark, path, scoped, del_rows)
        produced = None
        produced_labels = sorted(
            label for label, _cl, kind in labels
            if label not in drop_labels
        )
        if produced_labels:
            out_cols = _merge_out_cols(
                labels, drop_labels, tcols, ttypes, key, skey,
                list(source.columns),
            )
            produced = staged.filter(
                F.col("__act").isin(produced_labels)
            ).select(*out_cols)
        snap_id, _nd, _na = _commit_mor_snapshot(
            spark, path, meta, schema, pos_df, produced, pspec,
            part_fields, stats_cols,
        )
    finally:
        shutil.rmtree(stage_dir, ignore_errors=True)
    return (snap_id, n_changed)


def iceberg_replace_where(
    spark: SparkSession, path: str, pred: str, df: DataFrame,
    stats_cols: "list[str] | None" = None,
) -> tuple:
    """Atomically REPLACE a predicate region of an Iceberg table IN
    ITS OWN FORMAT — the ``replaceWhere`` backfill shape as ONE v2
    MOR snapshot: rows matching ``pred`` position-delete out (global
    unpartitioned delete spec), the batch stages under the table's
    CURRENT default spec — readers never observe the
    deleted-but-not-reinserted middle. The batch is VALIDATED to
    satisfy the predicate first (a stray row would escape the next
    backfill's delete). Returns ``(snapshot_id, n_deleted)``.
    Equality-delete tables refuse as in
    :func:`iceberg_delete_where`."""
    import shutil

    from harmony_energy_data_pipeline_spark.sinks.snapshots import (
        parse_conjunctive_where,
        stage_rows_once,
    )

    meta = table_metadata(path)
    schema = _current_schema(meta)
    spark_schema = _schema_to_spark(schema)
    data, deletes = live_files(path, meta)
    if any((d.get("content") or 0) == 2 for d in deletes):
        raise IcebergProtocolError(
            "REPLACE WHERE on a table with EQUALITY deletes: compact "
            "first (iceberg_compact) so positions are unambiguous"
        )
    pspec, part_fields = _staging_spec(meta, schema)
    stray = df.filter(
        ~F.coalesce(F.expr(pred), F.lit(False))
    ).limit(1).count()
    if stray > 0:
        raise ValueError(
            "replace_where batch contains rows NOT matching the "
            f"predicate {pred!r}; such rows would escape the "
            "region's delete on the next backfill — filter the "
            "batch or widen the predicate"
        )
    ttypes = {f.name: f.dataType for f in spark_schema.fields}
    missing = [f.name for f in spark_schema.fields
               if f.name not in df.columns]
    if missing:
        raise ValueError(
            f"replace_where batch lacks table columns {missing}"
        )
    produced = df.select(*[
        F.col(f.name).cast(ttypes[f.name]).alias(f.name)
        for f in spark_schema.fields
    ])
    triples = parse_conjunctive_where(pred)
    scoped = data
    if triples and scoped:
        scoped = _prune_data_files(meta, schema, scoped, triples)
    staged, n_hits, hitstage = (None, 0, None)
    if scoped:
        base = _provenance_scan(spark, path, scoped, spark_schema,
                                deletes, meta, schema)
        staged, n_hits, hitstage = stage_rows_once(
            spark, path, base.filter(F.expr(pred))
        )
    try:
        pos_df = (
            _spelled_positions(spark, path, scoped, staged)
            if n_hits else None
        )
        snap_id, _nd, _na = _commit_mor_snapshot(
            spark, path, meta, schema, pos_df, produced, pspec,
            part_fields, stats_cols,
        )
    finally:
        if hitstage:
            shutil.rmtree(hitstage, ignore_errors=True)
    return (snap_id, n_hits)


def iceberg_restore(path: str, snapshot_id: int) -> int:
    """ROLL BACK an Iceberg table to ``snapshot_id`` — the spec's
    ``rollback_to_snapshot``: current-snapshot-id moves to the
    existing snapshot (which must still be in ``snapshots``), the
    snapshot-log records the change, nothing is deleted — history
    stays inspectable until :func:`iceberg_expire_snapshots`. Pure
    metadata; foreign readers resolve the restored state through the
    snapshot's own manifest list. Returns ``snapshot_id``."""
    meta = table_metadata(path)
    if meta.get("current-snapshot-id") == snapshot_id:
        return snapshot_id
    known = {s["snapshot-id"] for s in meta.get("snapshots") or []}
    if snapshot_id not in known:
        raise ValueError(
            f"no Iceberg snapshot {snapshot_id} at {path} (expired "
            "or never committed)"
        )
    now_ms = int(time.time() * 1000)
    new_meta = dict(meta)
    new_meta["current-snapshot-id"] = snapshot_id
    new_meta["last-updated-ms"] = now_ms
    new_meta["snapshot-log"] = (
        list(meta.get("snapshot-log") or [])
        + [{"snapshot-id": snapshot_id, "timestamp-ms": now_ms}]
    )
    _commit_metadata(path, new_meta, meta)
    return snapshot_id


def iceberg_add_columns(path: str, cols: "dict[str, str]") -> int:
    """ADD optional (nullable) columns to an Iceberg table — one
    METADATA-ONLY commit: a NEW schema appends to ``schemas`` under
    the next schema-id, field ids allocate monotonically past
    ``last-column-id`` (ids are immutable and never reused — old
    manifests' bounds keep decoding), ``current-schema-id`` advances,
    prior schemas stay listed so old snapshots resolve theirs.
    ``cols`` maps name → Spark DDL type string. Returns the new
    schema-id."""
    from pyspark.sql.types import StructField as _SF
    from pyspark.sql.types import StructType as _ST
    from pyspark.sql.types import _parse_datatype_string

    meta = table_metadata(path)
    schema = _current_schema(meta)
    have = {f["name"] for f in schema["fields"]}
    last_col = meta.get(
        "last-column-id",
        max((f["id"] for f in schema["fields"]), default=0),
    )
    new_fields = []
    for cname, ddl in cols.items():
        if cname in have:
            raise ValueError(
                f"column {cname!r} already exists at {path}"
            )
        ice_f = _spark_schema_to_ice(_ST([
            _SF(cname, _parse_datatype_string(ddl), True)
        ]))["fields"][0]
        last_col += 1
        ice_f["id"] = last_col
        ice_f["required"] = False
        new_fields.append(ice_f)
    # name-resurrection guard: a DROPPED (or renamed-away) name that
    # ever belonged to a DIFFERENT field-id must not come back —
    # name-based readers (this one, and any foreign reader resolving
    # through schema.name-mapping.default) would associate old files'
    # physical column with the NEW field and read stale values where
    # the spec demands NULL
    hist_ids: "dict[str, set]" = {}
    for s in (meta.get("schemas") or []) + (
        [meta["schema"]] if "schema" in meta else []
    ):
        for f in s.get("fields", []):
            hist_ids.setdefault(f["name"], set()).add(f["id"])
    for cname in cols:
        if hist_ids.get(cname):
            raise ValueError(
                f"column name {cname!r} was previously used by "
                f"field-id(s) {sorted(hist_ids[cname])} at {path}; "
                "re-adding it would resurrect old files' values — "
                "pick a fresh name"
            )
    new_schema = {
        "type": "struct",
        "fields": list(schema["fields"]) + new_fields,
    }
    return _commit_schema_change(path, meta, new_schema,
                                 last_column_id=last_col)


def _commit_schema_change(path: str, meta: dict, new_schema: dict,
                          last_column_id: "int | None" = None,
                          properties: "dict | None" = None) -> int:
    """Append ``new_schema`` under the next schema-id and advance
    ``current-schema-id`` — ONE metadata-only commit (prior schemas
    stay listed so old snapshots resolve theirs). Optionally merges
    ``properties`` into the table properties. Returns the new
    schema-id."""
    schemas = list(meta.get("schemas") or [])
    if not schemas and "schema" in meta:  # format-v1 shape
        schemas = [dict(meta["schema"], **{"schema-id": 0})]
    new_sid = 1 + max(
        (s.get("schema-id", 0) for s in schemas), default=-1
    )
    new_schema = dict(new_schema, **{"schema-id": new_sid})
    schemas.append(new_schema)
    new_meta = dict(meta)
    new_meta["schemas"] = schemas
    new_meta["current-schema-id"] = new_sid
    if last_column_id is not None:
        new_meta["last-column-id"] = last_column_id
    if properties:
        new_meta["properties"] = dict(
            meta.get("properties") or {}, **properties
        )
    new_meta["last-updated-ms"] = int(time.time() * 1000)
    if "schema" in meta:  # keep the v1 single-schema key current
        new_meta["schema"] = new_schema
    _commit_metadata(path, new_meta, meta)
    return new_sid


def _name_mapping_property(meta: dict, new_schema: dict) -> str:
    """``schema.name-mapping.default`` covering EVERY name each
    field-id has carried (current included) — the spec's artifact for
    resolving files that lack parquet field-ids, so a FOREIGN reader
    maps a pre-rename file's old column name to the right field."""
    hist: "dict[int, set]" = {}
    for s in (meta.get("schemas") or []) + (
        [meta["schema"]] if "schema" in meta else []
    ) + [new_schema]:
        for f in s.get("fields", []):
            hist.setdefault(f["id"], set()).add(f["name"])
    cur_ids = [f["id"] for f in new_schema["fields"]]
    return json.dumps([
        {"field-id": fid, "names": sorted(hist[fid])}
        for fid in cur_ids
    ])


def iceberg_rename_column(path: str, old: str, new: str) -> int:
    """RENAME a column — METADATA-ONLY per the spec: the field keeps
    its immutable id (manifest bounds, partition-spec source-ids and
    old data files' stats all keep decoding), only the name in the
    NEW current schema changes. ``schema.name-mapping.default``
    updates so foreign readers resolve pre-rename files (which store
    the old physical name and, from this writer, no parquet
    field-ids); this engine's own scans coalesce across historical
    names (:func:`_rename_alternates`). Renaming TO a name that any
    OTHER field-id ever carried refuses — name-based resolution
    would become ambiguous. Returns the new schema-id."""
    meta = table_metadata(path)
    schema = _current_schema(meta)
    by_name = {f["name"]: f for f in schema["fields"]}
    if old not in by_name:
        raise ValueError(f"column {old!r} does not exist at {path}")
    if new in by_name:
        raise ValueError(f"column {new!r} already exists at {path}")
    fid = by_name[old]["id"]
    hist_ids: "dict[str, set]" = {}
    for s in (meta.get("schemas") or []) + (
        [meta["schema"]] if "schema" in meta else []
    ):
        for f in s.get("fields", []):
            hist_ids.setdefault(f["name"], set()).add(f["id"])
    others = hist_ids.get(new, set()) - {fid}
    if others:
        raise ValueError(
            f"name {new!r} was previously used by field-id(s) "
            f"{sorted(others)} at {path}; renaming onto it would make "
            "old files' column resolution ambiguous — pick a fresh "
            "name"
        )
    new_schema = {
        "type": "struct",
        "fields": [
            dict(f, name=new) if f["id"] == fid else dict(f)
            for f in schema["fields"]
        ],
    }
    return _commit_schema_change(
        path, meta, new_schema,
        properties={"schema.name-mapping.default":
                    _name_mapping_property(meta, new_schema)},
    )


def iceberg_widen_column(path: str, name: str, ddl_type: str) -> int:
    """WIDEN a column's type — METADATA-ONLY, the spec's allowed
    promotions only: ``int → long``, ``float → double``,
    ``decimal(P,S) → decimal(P',S)`` with ``P' >= P``. The field
    keeps its id; old data files keep the narrow physical encoding
    and the vectorized parquet reader upcasts pages on scan (the
    same mechanism the Delta typeWidening read path leans on); old
    manifests' narrow bounds keep pruning (`_decode_bound` is
    width-aware). ``ddl_type`` is a Spark DDL type string. Returns
    the new schema-id."""
    from pyspark.sql.types import _parse_datatype_string

    meta = table_metadata(path)
    schema = _current_schema(meta)
    by_name = {f["name"]: f for f in schema["fields"]}
    if name not in by_name:
        raise ValueError(f"column {name!r} does not exist at {path}")
    dt = _parse_datatype_string(ddl_type)
    tn = dt.typeName()
    if tn in _SPARK_TO_ICE:
        new_t = _SPARK_TO_ICE[tn]
    elif tn == "decimal":
        new_t = f"decimal({dt.precision},{dt.scale})"
    else:
        raise IcebergProtocolError(
            f"type {ddl_type!r} has no Iceberg mapping"
        )
    old_t = by_name[name]["type"]
    ok = (
        (old_t, new_t) in (("int", "long"), ("float", "double"))
    )
    if (not ok and isinstance(old_t, str)
            and old_t.startswith("decimal(")
            and new_t.startswith("decimal(")):
        fp, fs = (int(x) for x in old_t[8:-1].split(","))
        tp, ts = (int(x) for x in new_t[8:-1].split(","))
        ok = tp >= fp and ts == fs
    if not ok:
        raise ValueError(
            f"{old_t!r} → {new_t!r} is not an Iceberg-allowed type "
            "promotion (int→long, float→double, decimal precision "
            "widening)"
        )
    fid = by_name[name]["id"]
    new_schema = {
        "type": "struct",
        "fields": [
            dict(f, type=new_t) if f["id"] == fid else dict(f)
            for f in schema["fields"]
        ],
    }
    return _commit_schema_change(path, meta, new_schema)


def iceberg_create_ref(path: str, name: str, kind: str = "tag",
                       snapshot_id: "int | None" = None) -> int:
    """CREATE a named REF — the spec's ``refs`` map: a ``tag`` pins
    a snapshot forever (expire keeps it reachable in real Iceberg;
    here it simply stays listed), a ``branch`` is a mutable head
    (``write_iceberg`` advances ``main`` and carries every other
    branch through untouched). Metadata-only. Returns the pinned
    snapshot id."""
    if kind not in ("tag", "branch"):
        raise ValueError("kind must be tag|branch")
    meta = table_metadata(path)
    sid = snapshot_id if snapshot_id is not None else \
        meta.get("current-snapshot-id")
    if sid is None:
        raise ValueError(f"table {path} has no snapshot to pin")
    if not any(s["snapshot-id"] == sid
               for s in meta.get("snapshots") or []):
        raise ValueError(f"snapshot {sid} not in table {path}")
    refs = {k: dict(v) for k, v in (meta.get("refs") or {}).items()}
    if name in refs:
        raise ValueError(f"ref {name!r} already exists at {path}")
    if not refs and meta.get("current-snapshot-id") is not None:
        # first explicit ref: materialize the implicit main branch
        # so foreign readers see a spec-complete refs map
        refs["main"] = {
            "snapshot-id": meta["current-snapshot-id"],
            "type": "branch",
        }
    refs[name] = {"snapshot-id": sid, "type": kind}
    new_meta = dict(meta, refs=refs)
    new_meta["last-updated-ms"] = int(time.time() * 1000)
    _commit_metadata(path, new_meta, meta)
    return sid


def iceberg_drop_ref(path: str, name: str) -> None:
    """DROP a named ref (``main`` refuses — the table head)."""
    if name == "main":
        raise ValueError("cannot drop the main branch")
    meta = table_metadata(path)
    refs = {k: dict(v) for k, v in (meta.get("refs") or {}).items()}
    if name not in refs:
        raise KeyError(f"no ref {name!r} at {path}")
    del refs[name]
    new_meta = dict(meta, refs=refs)
    new_meta["last-updated-ms"] = int(time.time() * 1000)
    _commit_metadata(path, new_meta, meta)


def iceberg_fast_forward(path: str, branch: str) -> int:
    """PUBLISH a branch: fast-forward ``main`` (and the current
    snapshot pointer) to the branch head — the write-audit-publish
    closing step, metadata-only. Returns the published snapshot
    id."""
    meta = table_metadata(path)
    refs = {k: dict(v) for k, v in (meta.get("refs") or {}).items()}
    if branch not in refs:
        raise KeyError(f"no branch {branch!r} at {path}")
    sid = int(refs[branch]["snapshot-id"])
    if sid == meta.get("current-snapshot-id"):
        return sid
    refs["main"] = dict(refs.get("main") or {"type": "branch"},
                        **{"snapshot-id": sid})
    now_ms = int(time.time() * 1000)
    new_meta = dict(meta, refs=refs)
    new_meta["current-snapshot-id"] = sid
    new_meta["snapshot-log"] = list(
        meta.get("snapshot-log") or []
    ) + [{"snapshot-id": sid, "timestamp-ms": now_ms}]
    new_meta["last-updated-ms"] = now_ms
    _commit_metadata(path, new_meta, meta)
    return sid


def iceberg_resolve_ref(path: str, name: str) -> int:
    """Ref name → snapshot id (KeyError when absent)."""
    meta = table_metadata(path)
    ref = (meta.get("refs") or {}).get(name)
    if ref is None:
        raise KeyError(f"no ref {name!r} at {path}")
    return int(ref["snapshot-id"])


def iceberg_set_partition_spec(path: str,
                               entries: "list[str]") -> int:
    """SET the table's default PARTITION SPEC — METADATA-ONLY spec
    evolution, the Iceberg way: a new (or matching prior) spec-id
    becomes ``default-spec-id``; NOT ONE data file is touched.
    Existing files keep pruning under the spec they were written
    with (readers resolve the spec per manifest — the r11
    spec-evolution read machinery), future appends land under the
    new layout (``write_iceberg`` derives ``partition_by`` from the
    default spec when not given). ``entries`` use the
    ``partition_by`` language: bare column, ``bucket[N](c)``,
    ``truncate[W](c)``, ``year/month/day/hour(c)``; ``[]`` =
    unpartitioned. Returns the new default spec-id."""
    meta = table_metadata(path)
    schema = _current_schema(meta)
    ids_of = {f["name"]: f["id"] for f in schema["fields"]}
    pspec = [_parse_partition_entry(e) for e in entries]
    missing = [p["src"] for p in pspec if p["src"] not in ids_of]
    if missing:
        raise ValueError(
            f"partition source columns not in the schema: {missing}"
        )
    specs = list(meta.get("partition-specs") or [])
    want_sig = [
        (p["pv_name"], p["transform"], ids_of[p["src"]])
        for p in pspec
    ]
    hit = next(
        (sp for sp in specs
         if [(f["name"], f["transform"], f["source-id"])
             for f in sp.get("fields", [])] == want_sig),
        None,
    )
    last_pid = meta.get("last-partition-id", 999)
    if hit is not None:
        sid = hit["spec-id"]
    else:
        sid = 1 + max((sp["spec-id"] for sp in specs), default=-1)
        fields = []
        for p in pspec:
            last_pid += 1
            fields.append({
                "name": p["pv_name"], "transform": p["transform"],
                "source-id": ids_of[p["src"]], "field-id": last_pid,
            })
        specs = specs + [{"spec-id": sid, "fields": fields}]
    new_meta = dict(meta)
    new_meta["partition-specs"] = specs
    new_meta["default-spec-id"] = sid
    new_meta["last-partition-id"] = last_pid
    new_meta["last-updated-ms"] = int(time.time() * 1000)
    _commit_metadata(path, new_meta, meta)
    return sid


def iceberg_drop_column(path: str, name: str) -> int:
    """DROP a column — METADATA-ONLY: the NEW current schema omits
    the field (its id is never reused; old snapshots' schemas keep
    it for time travel), data files keep the physical column and
    every reader simply stops projecting it. Refuses when any
    partition spec derives from the field (partition tuples would
    lose their source) and when it is the last column. Returns the
    new schema-id."""
    meta = table_metadata(path)
    schema = _current_schema(meta)
    by_name = {f["name"]: f for f in schema["fields"]}
    if name not in by_name:
        raise ValueError(f"column {name!r} does not exist at {path}")
    if len(schema["fields"]) == 1:
        raise ValueError("cannot drop the only column")
    fid = by_name[name]["id"]
    for sp in meta.get("partition-specs", []):
        for f in sp.get("fields", []):
            if f.get("source-id") == fid:
                raise ValueError(
                    f"column {name!r} is the source of partition "
                    f"field {f.get('name')!r} (spec "
                    f"{sp.get('spec-id', 0)}); drop the partition "
                    "spec first"
                )
    for so in meta.get("sort-orders", []):
        for f in so.get("fields", []):
            if f.get("source-id") == fid:
                raise ValueError(
                    f"column {name!r} is referenced by sort order "
                    f"{so.get('order-id', 0)}"
                )
    new_schema = {
        "type": "struct",
        "fields": [dict(f) for f in schema["fields"]
                   if f["id"] != fid],
    }
    return _commit_schema_change(
        path, meta, new_schema,
        properties={"schema.name-mapping.default":
                    _name_mapping_property(meta, new_schema)},
    )


def _lineage_ids(meta: dict, to_sid: "int | None"):
    """Snapshot-ids on the PARENT CHAIN ending at ``to_sid`` —
    branch (write-audit-publish) commits that were never published
    are NOT on it, so changelogs and streams over main never count
    staged-only data. Returns None when the history has no parent
    links at all (legacy linear tables: every snapshot is on the
    line). A parent-less snapshot mid-chain marks the pre-parent-id
    prefix, which is linear by construction — everything at or
    below its sequence number is included."""
    snaps = sorted(
        meta.get("snapshots") or [],
        key=lambda s: (s.get("sequence-number", 0),
                       s["timestamp-ms"]),
    )
    by_id = {s["snapshot-id"]: s for s in snaps}
    if to_sid is None or to_sid not in by_id:
        return None
    if not any("parent-snapshot-id" in s for s in snaps):
        return None
    out: set = set()
    cur = by_id.get(to_sid)
    guard = len(snaps) + 1
    while cur is not None and guard > 0:
        guard -= 1
        out.add(cur["snapshot-id"])
        pid = cur.get("parent-snapshot-id")
        if pid is not None:
            cur = by_id.get(pid)  # None = parent expired: chain ends
        else:
            # parent UNRECORDED (optional in the spec, and commits
            # predating branch support don't carry it): assume the
            # seq-previous snapshot — the linear-history convention
            idx = snaps.index(cur)
            cur = snaps[idx - 1] if idx > 0 else None
    return out


def read_iceberg_changes(
    spark: SparkSession, path: str,
    from_snapshot_id: "int | None" = None,
    to_snapshot_id: "int | None" = None,
) -> DataFrame:
    """ROW-LEVEL incremental changes from the ICEBERG WIRE FORMAT —
    the changelog-scan shape (the Delta twin is
    :func:`deltalake.read_delta_changes`): every change committed
    strictly AFTER ``from_snapshot_id`` (None = from table creation)
    up to and including ``to_snapshot_id`` (None = current), with
    ``_change_type`` (``insert``/``delete``) and ``_snapshot_id``
    columns. An UPDATE snapshot (position-delete + data manifests in
    one commit) expresses as delete + insert rows, exactly like
    Iceberg's own changelog.

    Per snapshot: ``append`` → added data files read as inserts;
    ``delete`` → added position-delete files materialize the deleted
    rows (joined back against their data files); ``overwrite`` that
    RETAINS prior manifests (the MOR update shape) → both; a FULL
    overwrite (prior manifests dropped) → every previously-live row
    as delete + the new set as insert; ``replace`` (compaction) →
    skipped, logical content unchanged. EQUALITY deletes in range
    refuse (their sequence-scoped value matching has no exact row
    set without replaying — compact first).

    Scale shape: ONE data scan for all inserted files in range and
    ONE for all delete-referenced files, each joined to a broadcast
    O(#files) path→snapshot map — plan arms bounded by change KINDS,
    not by snapshots. Schema: the ``to`` snapshot's (older files
    null-fill newer columns)."""
    meta = table_metadata(path)
    snaps = sorted(meta.get("snapshots") or [],
                   key=lambda s: (s.get("sequence-number", 0),
                                  s["timestamp-ms"]))
    if to_snapshot_id is None:
        to_snapshot_id = meta.get("current-snapshot-id")
    lineage = _lineage_ids(meta, to_snapshot_id)
    if lineage is not None:
        # unpublished BRANCH commits are not changes of this lineage
        snaps = [s for s in snaps if s["snapshot-id"] in lineage]
    ids = [s["snapshot-id"] for s in snaps]
    if to_snapshot_id not in ids:
        raise ValueError(f"snapshot {to_snapshot_id} not in table")
    hi = ids.index(to_snapshot_id)
    lo = -1
    if from_snapshot_id is not None:
        if from_snapshot_id not in ids:
            raise ValueError(
                f"snapshot {from_snapshot_id} not in table (expired?)"
            )
        lo = ids.index(from_snapshot_id)
    schema = _current_schema(meta)
    sid_sch = snaps[hi].get("schema-id")
    if sid_sch is not None:
        schema = next(
            (s for s in meta.get("schemas", [])
             if s.get("schema-id") == sid_sch),
            schema,
        )
    spark_schema = _schema_to_spark(schema)
    cols = [f["name"] for f in schema["fields"]]

    def _added(sid):
        """Per-snapshot manifest walk: returns ``(data_entries,
        delete_entries, removed_entries, carried_existing,
        manifest_path_set)`` — ADDED data/delete files, REMOVED
        (status=2) data files a foreign copy-on-write commit tombs
        inside rewritten manifests, and whether any entry was
        carried as status=0 EXISTING (a rewrite, not a fresh live
        set)."""
        snap = next(s for s in snaps if s["snapshot-id"] == sid)
        mlist, _ = read_avro(
            _resolve_file_path(path, snap["manifest-list"])
        )
        data_e, del_e, removed_e = [], [], []
        carried = False
        for man in mlist:
            if man.get("added_snapshot_id") != sid:
                continue
            entries, _m = read_avro(
                _resolve_file_path(path, man["manifest_path"])
            )
            for e in entries:
                rec = e.get("data_file") or {}
                if (rec.get("content") or 0) == 2:
                    raise IcebergProtocolError(
                        "changelog over EQUALITY deletes is not "
                        "expressible without a replay — compact "
                        "first (iceberg_compact)"
                    )
                if e.get("status") == 0:
                    carried = True
                    continue
                if e.get("status") == 2:
                    if (rec.get("content") or 0) == 0:
                        removed_e.append(rec)
                    continue
                if (rec.get("content") or 0) == 0:
                    data_e.append(rec)
                else:
                    del_e.append(rec)
        return (data_e, del_e, removed_e, carried,
                {m["manifest_path"] for m in mlist})

    ins_map = []   # (abs data file, snapshot id)
    del_files = []  # (abs delete parquet, snapshot id)
    full_ow = []    # (snapshot id, [prev live data recs])
    prev_manifests: "set | None" = None
    prev_live: "list | None" = None
    if lo >= 0:
        prev_snap = snaps[lo]
        pml, _ = read_avro(
            _resolve_file_path(path, prev_snap["manifest-list"])
        )
        prev_manifests = {m["manifest_path"] for m in pml}
        prev_live = None  # resolved lazily only for a full overwrite
    for i in range(lo + 1, hi + 1):
        s = snaps[i]
        sid = s["snapshot-id"]
        op = (s.get("summary") or {}).get("operation", "append")
        if op == "replace":
            # compaction: logical content unchanged — contribute no
            # rows, but its manifest set is the next snapshot's
            # "prior" for full-overwrite detection
            mlist_r, _ = read_avro(
                _resolve_file_path(path, s["manifest-list"])
            )
            prev_manifests = {m["manifest_path"] for m in mlist_r}
            continue
        data_e, del_e, removed_e, carried, mset = _added(sid)
        if removed_e:
            # foreign copy-on-write rewrite: status=2 tombstones name
            # the removed files exactly — their previously-live rows
            # read as deletes (the rewritten survivors re-appear as
            # inserts via the snapshot's ADDED files, the same
            # delete+insert representation our own UPDATE uses)
            if i == 0:
                # ids[i-1] would wrap to the NEWEST snapshot; the
                # true prior state precedes the retained history
                raise IcebergProtocolError(
                    "oldest retained snapshot rewrites files whose "
                    "prior state was expired — changelog from the "
                    "table start is unavailable; pass "
                    "from_snapshot_id within retained history"
                )
            _lp, dels_prev = live_files(
                path, meta, snapshot_id=ids[i - 1]
            )
            if any((d.get("content") or 0) == 2 for d in dels_prev):
                raise IcebergProtocolError(
                    "changelog over EQUALITY deletes is not "
                    "expressible without a replay — compact first"
                )
            full_ow.append((sid, removed_e, [
                d for d in dels_prev
                if (d.get("content") or 0) == 1
            ]))
        dropped_prior = (
            op == "overwrite"
            and prev_manifests is not None
            and not (prev_manifests & mset)
            and not del_e
            and not removed_e
            and not carried
        )
        if dropped_prior:
            # FULL overwrite: previous live rows all deleted
            live_prev, dels_prev = live_files(
                path, meta, snapshot_id=ids[i - 1]
            )
            if any((d.get("content") or 0) == 2 for d in dels_prev):
                raise IcebergProtocolError(
                    "changelog over EQUALITY deletes is not "
                    "expressible without a replay — compact first"
                )
            full_ow.append((sid, live_prev, [
                d for d in dels_prev
                if (d.get("content") or 0) == 1
            ]))
        for rec in data_e:
            ins_map.append((os.path.abspath(
                _resolve_file_path(path, rec["file_path"])), sid))
        for rec in del_e:
            del_files.append((os.path.abspath(
                _resolve_file_path(path, rec["file_path"])), sid))
        prev_manifests = mset

    from pyspark.sql.types import LongType, StringType
    from pyspark.sql.types import StructField as _SF

    out_schema = T.StructType(
        list(spark_schema.fields)
        + [_SF("_change_type", StringType(), True),
           _SF("_snapshot_id", LongType(), True)]
    )
    parts = []
    scan_path = F.url_decode(F.replace(
        F.regexp_replace(
            F.col("_metadata.file_path"), "^[a-zA-Z0-9]+:/+", "/"
        ),
        F.lit("+"), F.lit("%2B"),
    ))
    if ins_map:
        smap = spark.createDataFrame(
            ins_map, "__absf string, __sid long"
        )
        raw, proj = _data_scan(
            spark, path, sorted({p_ for p_, _s in ins_map}),
            spark_schema, meta, schema,
        )
        scan = proj(raw.select("*", scan_path.alias("__f")),
                    extra=("__f",))
        parts.append(
            scan.join(F.broadcast(smap),
                      F.col("__f") == F.col("__absf"), "inner")
            .select(*cols, F.lit("insert").alias("_change_type"),
                    F.col("__sid").alias("_snapshot_id"))
        )
    if del_files:
        # ONE union of the range's delete parquet, tagged by
        # snapshot, joined back against ONE scan of the referenced
        # data files to materialize the deleted rows
        dmap = spark.createDataFrame(
            del_files, "__dpath string, __sid long"
        )
        dv = spark.read.schema(
            "file_path string, pos long"
        ).parquet(*sorted({p_ for p_, _s in del_files})).select(
            _norm_content_path(path, F.col("file_path")).alias("__tf"),
            F.col("pos").alias("__tp"),
            scan_path.alias("__src"),
        ).join(
            F.broadcast(dmap),
            F.col("__src") == F.col("__dpath"), "inner",
        ).select("__tf", "__tp", "__sid")
        targets = sorted({
            r["__tf"]
            for r in dv.select("__tf").distinct().collect()
        })  # O(#files) paths, driver-bounded
        raw_t, proj_t = _data_scan(
            spark, path, targets, spark_schema, meta, schema
        )
        tscan = proj_t(
            raw_t.select(
                "*", scan_path.alias("__f"),
                F.col("_metadata.row_index").alias("__p"),
            ),
            extra=("__f", "__p"),
        )
        parts.append(
            tscan.join(
                dv,
                (F.col("__f") == F.col("__tf"))
                & (F.col("__p") == F.col("__tp")),
                "inner",
            ).select(*cols, F.lit("delete").alias("_change_type"),
                     F.col("__sid").alias("_snapshot_id"))
        )
    for sid, live_prev, pos_prev in full_ow:
        scan, proj_ow = _data_scan(
            spark, path,
            sorted(_resolve_file_path(path, rec["file_path"])
                   for rec in live_prev),
            spark_schema, meta, schema,
        )
        if pos_prev:
            scan = _subtract_position_deletes(
                spark, path, scan, pos_prev
            )
        scan = proj_ow(scan)
        parts.append(scan.select(
            *cols, F.lit("delete").alias("_change_type"),
            F.lit(sid).alias("_snapshot_id"),
        ))
    if not parts:
        return spark.createDataFrame([], out_schema)
    out = parts[0]
    for part in parts[1:]:
        out = out.unionByName(part)
    return out


def iceberg_expire_snapshots(
    path: str, keep_last: int = 1, dry_run: bool = False,
) -> list[str]:
    """Expire all but the last ``keep_last`` snapshots and delete
    every file ONLY they referenced — the ``expire_snapshots``
    maintenance shape for the wire format (the native log's twin is
    ``vacuum``). Deletion is by REFERENCE-SET DIFFERENCE (files
    listed by removed snapshots minus files listed by kept ones), so
    nothing outside the table's own manifests is ever touched — no
    directory walk, no mtime heuristics. Returns the deleted (or,
    dry-run, deletable) relative paths."""
    meta = table_metadata(path)
    snaps = sorted(meta.get("snapshots") or [],
                   key=lambda s: s["timestamp-ms"])
    if keep_last < 1:
        raise ValueError("keep_last must be >= 1")
    kept = snaps[-keep_last:]
    kept_ids = {s["snapshot-id"] for s in kept}
    # named refs PIN their snapshots (the spec's ref retention): a
    # tagged or branched snapshot never expires out from under its
    # ref
    ref_ids = {
        int(r["snapshot-id"])
        for r in (meta.get("refs") or {}).values()
        if r.get("snapshot-id") is not None
    }
    if ref_ids - kept_ids:
        extra = [s for s in snaps
                 if s["snapshot-id"] in (ref_ids - kept_ids)]
        kept = sorted(kept + extra, key=lambda s: s["timestamp-ms"])
        kept_ids |= ref_ids
    cur = meta.get("current-snapshot-id")
    if cur is not None and cur not in kept_ids:
        raise ValueError(
            "expiration would drop the CURRENT snapshot; raise "
            "keep_last"
        )
    removed = [s for s in snaps if s["snapshot-id"] not in kept_ids]
    if not removed:
        return []

    def _referenced(snapshot: dict) -> set:
        out = set()
        ml = snapshot.get("manifest-list")
        if not ml:
            return out
        out.add(_resolve_file_path(path, ml))
        manifests, _ = read_avro(_resolve_file_path(path, ml))
        for m in manifests:
            mp = _resolve_file_path(path, m["manifest_path"])
            out.add(mp)
            entries, _ = read_avro(mp)
            for e in entries:
                rec = e.get("data_file") or {}
                if rec.get("file_path"):
                    out.add(_resolve_file_path(path, rec["file_path"]))
        return out

    keep_files: set = set()
    for s in kept:
        keep_files |= _referenced(s)
    drop_files: set = set()
    for s in removed:
        drop_files |= _referenced(s)
    doomed = sorted(drop_files - keep_files)
    root = os.path.abspath(path)
    rels = [os.path.relpath(fp, root) for fp in doomed]
    if dry_run:
        return rels
    # metadata first: a reader racing the deletes must already see
    # the expired snapshots gone
    now_ms = int(time.time() * 1000)
    new_meta = dict(meta)
    new_meta["snapshots"] = [
        s for s in (meta.get("snapshots") or [])
        if s["snapshot-id"] in kept_ids
    ]
    new_meta["snapshot-log"] = [
        e for e in (meta.get("snapshot-log") or [])
        if e.get("snapshot-id") in kept_ids
    ]
    new_meta["last-updated-ms"] = now_ms
    _commit_metadata(path, new_meta, meta)
    for fp in doomed:
        try:
            os.unlink(fp)
        except OSError:
            pass
    return rels


def iceberg_compact(
    spark: SparkSession, path: str,
    stats_cols: "list[str] | None" = None,
    zorder_by: "list[str] | None" = None,
    zorder_bits: int = 16,
    target_file_mb: float = 128,
) -> int:
    """Rewrite the table's LIVE rows (position + equality deletes
    applied) as one fresh snapshot under the CURRENT partition spec —
    the ``rewrite_data_files`` maintenance shape: a CDC-heavy table's
    delete files and commit-generation fragmentation collapse to a
    clean file set, while older snapshots stay listed for time
    travel. Returns the new snapshot id."""
    meta = table_metadata(path)
    df = read_iceberg(spark, path)
    pby = _spec_to_partition_by(meta)
    if zorder_by:
        if pby:
            raise IcebergProtocolError(
                "compact with zorder_by on a partitioned table is "
                "not supported here — the tuple-aligned staging "
                "shuffle would undo the interleave"
            )
        from harmony_energy_data_pipeline_spark.sinks.snapshots import (
            _zorder_clustered,
        )

        data, _d = live_files(path, meta)
        total = sum(int(d.get("file_size_in_bytes") or 0)
                    for d in data)
        import math as _math

        n_files = max(
            1, _math.ceil(total / (target_file_mb * (1 << 20)))
        )
        df = _zorder_clustered(
            df, path, {}, list(zorder_by), zorder_bits, n_files
        )
        if stats_cols is None:
            stats_cols = list(zorder_by)
    # operation "replace" (the spec's rewrite_data_files stamp):
    # logical content unchanged, so changelog readers skip it
    return write_iceberg(
        df, path, mode="overwrite",
        partition_by=pby,
        stats_cols=stats_cols, operation="replace",
    )


# --- bridges to the native log ----------------------------------------------------------

def snapshot_import_iceberg(
    spark: SparkSession, iceberg_path: str, protocol: str = "link"
) -> int:
    """Adopt an Iceberg table IN PLACE as a NATIVE snapshot table —
    ZERO data copied, one manifest commit referencing the live files
    (the Delta twin is ``snapshot_import_delta``). Carries over:
    ``record_count`` → ``#rows`` (manifest-only COUNT), decoded
    lower/upper bounds → native ZONE MAPS (pruning works
    immediately). Iceberg data files store every column, so no
    partition spec needs reconstructing — the adopted table reads as
    unpartitioned files with the columns inline. V2 POSITION DELETES
    carry over: their (file_path, pos) pairs decode into the native
    positional-delete parquet and ride the manifest's ``dvs`` (reads
    subtract them, the next copy-on-write materializes them,
    manifest-only COUNT stays exact). EQUALITY DELETES adopt too:
    ONE sequence-scoped data scan (grouped per delete boundary, the
    read path's own grouping) materializes the matching row
    positions into the same native positional-delete parquet — the
    value-matching semantics become exact positions at import time,
    after which the native log needs no equality machinery. The
    position pipeline is DISTRIBUTED end to end (round 12): delete
    parquet reads, the root-layout guard, dedup, and the keyed
    write all run in DataFrames; the driver streams only per-file
    distinct keys for the dvs manifest. Raises
    if a native log already exists or files live outside the table
    dir."""
    from harmony_energy_data_pipeline_spark.sinks import snapshots as snap

    if snap.latest_version(iceberg_path) is not None:
        raise FileExistsError(
            f"{iceberg_path} already has a native snapshot log; import "
            "adopts a table exactly once"
        )
    meta = table_metadata(iceberg_path)
    schema = _current_schema(meta)
    spark_schema = _schema_to_spark(schema)
    field_types = {
        f["id"]: (f["name"], f["type"])
        for f in schema["fields"] if isinstance(f["type"], str)
    }
    data_recs, all_deletes = live_files(iceberg_path, meta)
    delete_recs = [d for d in all_deletes
                   if (d.get("content") or 0) == 1]
    eq_recs = [d for d in all_deletes
               if (d.get("content") or 0) == 2]
    files, stats = [], {}
    for df_rec in data_recs:
        fp = _resolve_file_path(iceberg_path, df_rec["file_path"])
        rel = os.path.relpath(fp, os.path.abspath(iceberg_path))
        if rel.startswith(".."):
            raise ValueError(
                f"data file {fp} lives outside the table directory; "
                "in-place adoption needs self-contained layout — "
                "rewrite via read_iceberg + snapshot_write"
            )
        files.append(rel)
        entry: dict = dict(_bounds_of(df_rec, field_types))
        if df_rec.get("record_count") is not None:
            entry["#rows"] = int(df_rec["record_count"])
        if entry:
            stats[rel] = entry
    if not files:
        raise ValueError(f"Iceberg table at {iceberg_path} has no files")
    dvs_manifest: dict = {}
    root = os.path.abspath(iceberg_path)
    pos_parts = []  # DataFrames of (__abs, __p) — kept DISTRIBUTED
    if delete_recs:
        # decode (file_path, pos) pairs into native positional-delete
        # parquet — read distributed (a foreign delete backlog can be
        # O(table); never pulled into driver sets)
        del_paths = sorted(
            _resolve_file_path(iceberg_path, d["file_path"])
            for d in delete_recs
        )
        pos_parts.append(
            spark.read.schema("file_path string, pos long")
            .parquet(*del_paths)
            .select(
                _norm_content_path(
                    iceberg_path, F.col("file_path")
                ).alias("__abs"),
                F.col("pos").cast("long").alias("__p"),
            )
        )
    if eq_recs:
        # ONE distributed scan per delete boundary materializes the
        # value matches as exact positions — the adoption twin of the
        # read path's sequence-scoped application; matches stay in
        # DataFrames end to end
        by_name = {f["id"]: f["name"] for f in schema["fields"]
                   if isinstance(f["type"], str)}
        eq_groups: dict[tuple, list[dict]] = {}
        for d in eq_recs:
            ids = tuple(sorted(d.get("equality_ids") or []))
            if not ids or any(i not in by_name for i in ids):
                raise IcebergProtocolError(
                    "equality delete file lacks resolvable equality_ids"
                )
            eq_groups.setdefault(ids, []).append(d)
        for rep_seq, group in _eq_delete_scan_groups(data_recs, eq_recs):
            if not any(int(d.get("__seq") or 0) > rep_seq
                       for d in eq_recs):
                continue
            scan, proj_ad = _data_scan(
                spark, iceberg_path,
                [_resolve_file_path(iceberg_path, f["file_path"])
                 for f in group],
                spark_schema, meta, schema,
            )
            scan_path = F.url_decode(F.replace(
                F.regexp_replace(
                    F.col("_metadata.file_path"), "^[a-zA-Z0-9]+:/+", "/"
                ),
                F.lit("+"), F.lit("%2B"),
            ))
            base = proj_ad(
                scan.select(
                    "*", scan_path.alias("__f"),
                    F.col("_metadata.row_index").alias("__p"),
                ),
                extra=("__f", "__p"),
            )
            for ids, dels in sorted(eq_groups.items()):
                applicable = [
                    d for d in dels if int(d.get("__seq") or 0) > rep_seq
                ]
                if not applicable:
                    continue
                cols = [by_name[i] for i in ids]
                dd = spark.read.parquet(*sorted(
                    _resolve_file_path(iceberg_path, d["file_path"])
                    for d in applicable
                )).select(*[
                    F.col(c).alias(f"__eq_{c}") for c in cols
                ]).dropDuplicates()
                cond = None
                for c in cols:
                    c2 = F.col(c).eqNullSafe(F.col(f"__eq_{c}"))
                    cond = c2 if cond is None else cond & c2
                pos_parts.append(
                    base.join(F.broadcast(dd), cond, "left_semi")
                    .select(F.col("__f").alias("__abs"), "__p")
                )
    if pos_parts:
        import pyarrow.parquet as pq

        union_df = pos_parts[0]
        for part in pos_parts[1:]:
            union_df = union_df.unionByName(part)
        rootp = root + os.sep
        # executor-side layout guard + root-relative rel + the
        # _dv_key canonical form ("data/" + tail past the last
        # data/), all expression-side
        guarded = union_df.select(
            F.when(
                ~F.col("__abs").startswith(F.lit(rootp)),
                F.raise_error(F.concat(
                    F.lit("position/equality delete references "),
                    F.col("__abs"),
                    F.lit(" outside the table directory; adoption "
                          "needs self-contained layout"),
                )),
            ).otherwise(
                F.expr(f"substring(__abs, {len(rootp) + 1})")
            ).alias("__rel"),
            F.col("__p"),
        ).dropDuplicates(["__rel", "__p"])
        keyed = guarded.select(
            F.concat(
                F.lit("data/"),
                F.element_at(F.split(F.col("__rel"), "data/"), -1),
            ).alias("file"),
            F.col("__p").alias("pos"),
        ).repartition(F.col("file")).sortWithinPartitions(
            "file", "pos"
        )
        staging = os.path.join(
            iceberg_path, f"_dvstage-{uuid.uuid4().hex[:12]}"
        )
        keyed.write.mode("error").parquet(staging)
        # per-file finalize: rename + STREAM each file's distinct keys
        # (driver memory is O(one batch), never O(positions))
        key_to_rel = {snap._dv_key(rel): rel for rel in files}
        staged = []
        for sroot, _dirs, fnames in os.walk(staging):
            staged.extend(
                os.path.join(sroot, n_) for n_ in fnames
                if n_.endswith(".parquet")
            )
        for src_fp in sorted(staged):
            pf = pq.ParquetFile(src_fp)
            if pf.metadata.num_rows == 0:
                continue
            dv_rel = f"dvimport-{uuid.uuid4().hex[:12]}.parquet"
            keys: set = set()
            for batch in pf.iter_batches(columns=["file"]):
                keys.update(batch.column(0).unique().to_pylist())
            pf.close()
            os.rename(src_fp, os.path.join(iceberg_path, dv_rel))
            for k in keys:
                rel = key_to_rel.get(k, k)
                dvs_manifest.setdefault(rel, []).append(dv_rel)
        import shutil

        shutil.rmtree(staging, ignore_errors=True)
    payload = {
        "version": 0,
        "parent": None,
        "operation": "overwrite",
        "txid": uuid.uuid4().hex[:12],
        "committed_at_unix": int(time.time()),
        "files": files,
        "n_live_files": len(files),
        "schema": spark_schema.jsonValue(),
        "imported_from_iceberg": meta.get("current-snapshot-id"),
        **({"stats": stats} if stats else {}),
        **({"dvs": dvs_manifest} if dvs_manifest else {}),
    }
    snap._publish_manifest(iceberg_path, 0, payload, protocol=protocol)
    return 0


def snapshot_export_iceberg(
    spark: SparkSession, snapshot_path: str, iceberg_path: str,
    version: int | None = None, link_files: bool = False,
) -> int:
    """Republish a NATIVE snapshot table's live state (deletion
    vectors applied, time travel honored) as one Iceberg v2 snapshot
    — the hand-off for consumers that speak Iceberg but not this
    engine's log. Columns the native manifest zone-map-tracks export
    as lower/upper bounds (file skipping survives the hand-off).

    ``link_files=True`` is the ZERO-COPY path (the Delta twin is
    ``snapshot_export_delta(link_files=True)``): live parquet files
    HARDLINK into the Iceberg directory, zone maps re-encode as
    Appendix-D bounds, and native deletion vectors export as a spec
    POSITION-DELETE snapshot — O(metadata + links), no byte
    rewritten. Refused when a plain Iceberg reader would mis-read
    the linked layout: rename lineage (old files store old names) or
    a PARTITIONED native table (the hive layout drops partition
    columns from data files, which Iceberg requires them to store) —
    materialize with ``link_files=False`` instead."""
    from harmony_energy_data_pipeline_spark.sinks import snapshots as snap

    v = snap.latest_version(snapshot_path) if version is None else version
    m = snap._read_manifest(snapshot_path, v)
    if not link_files:
        stat_cols = sorted({
            c for s in m.get("stats", {}).values() for c in s
            if not c.startswith("#")
        })
        df = snap.read_snapshot(spark, snapshot_path, version=v)
        pby = list(m.get("partition_cols") or [])
        bspec = m.get("bucket_spec")
        if bspec:
            # the native bucket layout exports as a REAL Iceberg
            # bucket[N] spec — tuples recomputed under the spec's
            # murmur3 (the native hash differs), so a foreign
            # reader's bucket pruning works on the hand-off
            amap = snap._schema_alias_map(m.get("schema"))
            bcol = amap.get(bspec["column"], bspec["column"])
            if bcol in df.columns:
                pby.append(f"bucket[{bspec['buckets']}]({bcol})")
        return write_iceberg(
            df, iceberg_path, mode="overwrite",
            stats_cols=stat_cols or None,
            partition_by=pby or None,
        )
    return _export_iceberg_linked(spark, snapshot_path, iceberg_path, m)


def _export_iceberg_linked(
    spark: SparkSession, snapshot_path: str, iceberg_path: str, m: dict
) -> int:
    import shutil

    import pyarrow.parquet as pq
    from pyspark.sql.types import StructType as _ST

    from harmony_energy_data_pipeline_spark.sinks import snapshots as snap

    if _metadata_files(iceberg_path):
        raise FileExistsError(
            f"{iceberg_path} already has Iceberg metadata; linked "
            "export targets a fresh directory"
        )
    if "schema" not in m:
        raise ValueError(
            "linked export needs a schema-tracked manifest; "
            "materialize with link_files=False"
        )
    if any(
        snap._field_aliases(f) for f in m["schema"].get("fields", [])
    ):
        raise ValueError(
            "table has rename lineage (old files store old column "
            "names) — a plain Iceberg reader would mis-read the "
            "linked files; materialize with link_files=False"
        )
    if m.get("partition_cols"):
        raise ValueError(
            "native hive layout drops partition columns from data "
            "files, which Iceberg requires them to store — "
            "materialize with link_files=False"
        )
    ice_schema = _spark_schema_to_ice(_ST.fromJson(m["schema"]))
    ids = {f["name"]: f["id"] for f in ice_schema["fields"]}
    types = {f["name"]: f["type"] for f in ice_schema["fields"]
             if isinstance(f["type"], str)}
    os.makedirs(_meta_dir(iceberg_path), exist_ok=True)
    os.makedirs(os.path.join(iceberg_path, "data"), exist_ok=True)
    stats_m = m.get("stats", {})
    seq = 1
    snap_id = int.from_bytes(os.urandom(7), "big")
    data_files: list[dict] = []
    linked_rel: dict[str, str] = {}  # native rel -> iceberg rel
    for rel in m["files"]:
        src = snap._abs_file(snapshot_path, rel)
        dst_rel = f"data/{uuid.uuid4().hex}.parquet"
        dst = os.path.join(iceberg_path, dst_rel)
        try:
            os.link(src, dst)
        except OSError:
            shutil.copy2(src, dst)  # cross-device: copy, still O(file)
        linked_rel[rel] = dst_rel
        st = stats_m.get(rel) or {}
        lows, highs = [], []
        for c, b in st.items():
            if c.startswith("#") or c not in ids or c not in types:
                continue
            lo = _encode_bound(b[0], types[c])
            hi = _encode_bound(b[1], types[c])
            if lo is not None and hi is not None:
                lows.append({"key": ids[c], "value": lo})
                highs.append({"key": ids[c], "value": hi})
        n_rows = (
            int(st["#rows"]) if st.get("#rows") is not None
            else pq.read_metadata(dst).num_rows
        )
        data_files.append({
            "status": 1, "snapshot_id": snap_id,
            "sequence_number": None, "file_sequence_number": None,
            "data_file": {
                "content": 0, "file_path": dst_rel,
                "file_format": "PARQUET", "partition": {},
                "record_count": n_rows,
                "file_size_in_bytes": os.path.getsize(dst),
                "lower_bounds": lows or None,
                "upper_bounds": highs or None,
            },
        })
    if not data_files:
        raise ValueError("linked export needs >= 1 live file")
    man_rel = f"metadata/manifest-{uuid.uuid4().hex}.avro"
    man_len = write_avro(
        os.path.join(iceberg_path, man_rel), _manifest_entry_schema(),
        data_files,
        metadata={"schema": json.dumps(ice_schema),
                  "partition-spec": "[]", "partition-spec-id": "0",
                  "format-version": "2", "content": "data"},
    )
    manifests = [{
        "manifest_path": man_rel, "manifest_length": man_len,
        "partition_spec_id": 0, "content": 0,
        "sequence_number": seq, "min_sequence_number": seq,
        "added_snapshot_id": snap_id,
        "added_files_count": len(data_files),
        "existing_files_count": 0, "deleted_files_count": 0,
        "added_rows_count": sum(
            e["data_file"]["record_count"] for e in data_files
        ),
        "existing_rows_count": 0, "deleted_rows_count": 0,
    }]
    ml_rel = f"metadata/snap-{snap_id}-{uuid.uuid4().hex[:8]}.avro"
    write_avro(os.path.join(iceberg_path, ml_rel),
               _manifest_file_schema(), manifests,
               metadata={"format-version": "2"})
    now_ms = int(time.time() * 1000)
    meta = {
        "format-version": 2, "table-uuid": str(uuid.uuid4()),
        "location": iceberg_path,
        "last-sequence-number": seq, "last-updated-ms": now_ms,
        "last-column-id": len(ice_schema["fields"]),
        "current-schema-id": 0, "schemas": [ice_schema],
        "default-spec-id": 0,
        "partition-specs": [{"spec-id": 0, "fields": []}],
        "last-partition-id": 999, "default-sort-order-id": 0,
        "sort-orders": [{"order-id": 0, "fields": []}],
        "current-snapshot-id": snap_id,
        "snapshots": [{
            "snapshot-id": snap_id, "timestamp-ms": now_ms,
            "sequence-number": seq,
            "summary": {"operation": "overwrite"},
            "manifest-list": ml_rel, "schema-id": 0,
        }],
        "snapshot-log": [{"snapshot-id": snap_id,
                          "timestamp-ms": now_ms}],
        "metadata-log": [],
    }
    final = os.path.join(_meta_dir(iceberg_path), "v1.metadata.json")
    tmp = final + f".tmp-{uuid.uuid4().hex[:8]}"
    with open(tmp, "w", encoding="utf-8") as fh:
        json.dump(meta, fh)
        fh.flush()
        os.fsync(fh.fileno())
    try:
        os.link(tmp, final)
    except FileExistsError:
        raise FileExistsError(
            f"Iceberg metadata v1 at {iceberg_path} was claimed "
            "concurrently"
        )
    finally:
        os.unlink(tmp)
    hint = os.path.join(_meta_dir(iceberg_path), "version-hint.text")
    tmp = hint + f".tmp-{uuid.uuid4().hex[:8]}"
    with open(tmp, "w", encoding="utf-8") as fh:
        fh.write("1")
    os.replace(tmp, hint)
    # native deletion vectors -> one spec POSITION-DELETE snapshot
    if m.get("dvs"):
        key_of = {snap._dv_key(rel): rel for rel in m["files"]}
        dv_files = sorted({
            snap._abs_file(snapshot_path, d)
            for ds in m["dvs"].values() for d in ds
        })
        pairs = []
        for d in dv_files:
            tbl = pq.read_table(d, columns=["file", "pos"])
            for k, pos in zip(tbl.column("file").to_pylist(),
                              tbl.column("pos").to_pylist()):
                rel = key_of.get(k)
                if rel is not None:
                    pairs.append((linked_rel[rel], int(pos)))
        if pairs:
            return write_position_deletes(spark, iceberg_path, pairs)
    return snap_id


__all__ = [
    "read_iceberg", "write_iceberg", "table_metadata",
    "live_data_files", "live_files", "write_position_deletes",
    "write_equality_deletes",
    "iceberg_history",
    "iceberg_snapshot_at_timestamp",
    "iceberg_rename_column", "iceberg_drop_column",
    "iceberg_widen_column", "iceberg_set_partition_spec",
    "iceberg_create_ref", "iceberg_drop_ref", "iceberg_resolve_ref",
    "iceberg_fast_forward",
    "snapshot_import_iceberg", "snapshot_export_iceberg",
    "IcebergProtocolError",
]
