"""Minimal Avro OBJECT CONTAINER FILE codec (Avro 1.12 spec) — pure
Python, no avro/fastavro dependency — sized for Apache Iceberg's
metadata tree (manifest lists and manifests are Avro files; the
container embeds its writer schema, so a generic schema-driven
decoder reads ANY conforming writer's manifests, not just ours).

Implements the public spec exactly:

* container layout: magic ``Obj\\x01``, file-metadata map
  (``avro.schema`` JSON + ``avro.codec``), 16-byte sync marker, then
  blocks of ``<count: zigzag-varint><size: zigzag-varint><data>``
  each followed by the sync marker;
* codecs: ``null`` and ``deflate`` (raw zlib, per spec);
* binary encoding for: null, boolean, int, long (zigzag varint),
  float, double (IEEE LE), bytes, string, fixed, enum, record,
  array, map, union (with block-form arrays/maps, negative-count
  blocks included). Logical types ride through untouched (they only
  annotate the underlying type).

Decode is driven by the EMBEDDED writer schema; encode by the schema
you pass — schema resolution/evolution between the two is out of
scope (Iceberg readers read with the writer schema, as we do).
"""

from __future__ import annotations

import io
import json
import os
import struct
import zlib

_MAGIC = b"Obj\x01"


# --- primitive binary encoding -------------------------------------------------------

def _zz_encode(n: int) -> bytes:
    u = (n << 1) ^ (n >> 63)
    out = bytearray()
    while True:
        b = u & 0x7F
        u >>= 7
        if u:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _zz_decode(buf, pos: int) -> tuple[int, int]:
    shift, u = 0, 0
    while True:
        b = buf[pos]
        pos += 1
        u |= (b & 0x7F) << shift
        if not (b & 0x80):
            break
        shift += 7
    return (u >> 1) ^ -(u & 1), pos


def _norm(schema):
    """A schema node's type name (str) or the node itself for
    complex/union forms; named-type references resolve via ``names``
    at call sites."""
    if isinstance(schema, str):
        return schema
    if isinstance(schema, dict):
        return schema["type"]
    return None


class _Encoder:
    def __init__(self, schema, names=None):
        self.names = names if names is not None else {}
        self._collect(schema)
        self.schema = schema

    def _collect(self, s):
        if isinstance(s, dict):
            t = s.get("type")
            if t in ("record", "enum", "fixed") and s.get("name"):
                self.names[s["name"]] = s
            if t == "record":
                for f in s.get("fields", []):
                    self._collect(f["type"])
            elif t == "array":
                self._collect(s["items"])
            elif t == "map":
                self._collect(s["values"])
        elif isinstance(s, list):
            for b in s:
                self._collect(b)

    def encode(self, value, schema, out: bytearray):
        if isinstance(schema, str) and schema in self.names:
            schema = self.names[schema]
        if isinstance(schema, list):  # union: first matching branch
            idx = self._pick_branch(value, schema)
            out += _zz_encode(idx)
            return self.encode(value, schema[idx], out)
        t = _norm(schema)
        if t == "null":
            return
        if t == "boolean":
            out.append(1 if value else 0)
        elif t in ("int", "long"):
            out += _zz_encode(int(value))
        elif t == "float":
            out += struct.pack("<f", float(value))
        elif t == "double":
            out += struct.pack("<d", float(value))
        elif t == "bytes":
            b = bytes(value)
            out += _zz_encode(len(b))
            out += b
        elif t == "string":
            b = str(value).encode("utf-8")
            out += _zz_encode(len(b))
            out += b
        elif t == "fixed":
            b = bytes(value)
            if len(b) != schema["size"]:
                raise ValueError(
                    f"fixed {schema.get('name')} needs {schema['size']} "
                    f"bytes, got {len(b)}"
                )
            out += b
        elif t == "enum":
            out += _zz_encode(schema["symbols"].index(value))
        elif t == "record":
            for f in schema["fields"]:
                try:
                    self.encode(value.get(f["name"]), f["type"], out)
                except Exception as exc:
                    raise ValueError(
                        f"field {f['name']!r}: {exc}"
                    ) from exc
        elif t == "array":
            items = list(value or [])
            if items:
                out += _zz_encode(len(items))
                for it in items:
                    self.encode(it, schema["items"], out)
            out += _zz_encode(0)
        elif t == "map":
            entries = dict(value or {})
            if entries:
                out += _zz_encode(len(entries))
                for k, v in entries.items():
                    self.encode(str(k), "string", out)
                    self.encode(v, schema["values"], out)
            out += _zz_encode(0)
        else:
            raise ValueError(f"unsupported Avro type {t!r}")

    def _pick_branch(self, value, union: list) -> int:
        def kind(s):
            if isinstance(s, str) and s in self.names:
                s = self.names[s]
            return _norm(s)

        if value is None:
            for i, b in enumerate(union):
                if kind(b) == "null":
                    return i
            raise ValueError("None for a union without null")
        for i, b in enumerate(union):
            k = kind(b)
            if k == "null":
                continue
            if isinstance(value, bool) and k == "boolean":
                return i
            if isinstance(value, int) and k in ("int", "long"):
                return i
            if isinstance(value, float) and k in ("float", "double"):
                return i
            if isinstance(value, str) and k in ("string", "enum"):
                return i
            if isinstance(value, (bytes, bytearray)) and k in (
                "bytes", "fixed"
            ):
                return i
            if isinstance(value, dict) and k in ("record", "map"):
                return i
            if isinstance(value, (list, tuple)) and k == "array":
                return i
        raise ValueError(
            f"no union branch for {type(value).__name__}"
        )


class _Decoder:
    def __init__(self, schema):
        self.names: dict = {}
        _Encoder(schema, self.names)  # reuse the name collector
        self.schema = schema

    def decode(self, buf, pos: int, schema) -> tuple[object, int]:
        if isinstance(schema, str) and schema in self.names:
            schema = self.names[schema]
        if isinstance(schema, list):
            idx, pos = _zz_decode(buf, pos)
            return self.decode(buf, pos, schema[idx])
        t = _norm(schema)
        if t == "null":
            return None, pos
        if t == "boolean":
            return buf[pos] == 1, pos + 1
        if t in ("int", "long"):
            return _zz_decode(buf, pos)
        if t == "float":
            return struct.unpack_from("<f", buf, pos)[0], pos + 4
        if t == "double":
            return struct.unpack_from("<d", buf, pos)[0], pos + 8
        if t in ("bytes", "string"):
            n, pos = _zz_decode(buf, pos)
            raw = bytes(buf[pos:pos + n])
            pos += n
            return (raw.decode("utf-8") if t == "string" else raw), pos
        if t == "fixed":
            n = schema["size"]
            return bytes(buf[pos:pos + n]), pos + n
        if t == "enum":
            idx, pos = _zz_decode(buf, pos)
            return schema["symbols"][idx], pos
        if t == "record":
            rec = {}
            for f in schema["fields"]:
                rec[f["name"]], pos = self.decode(buf, pos, f["type"])
            return rec, pos
        if t == "array":
            out = []
            while True:
                n, pos = _zz_decode(buf, pos)
                if n == 0:
                    return out, pos
                if n < 0:  # block with byte-size prefix
                    _sz, pos = _zz_decode(buf, pos)
                    n = -n
                for _ in range(n):
                    v, pos = self.decode(buf, pos, schema["items"])
                    out.append(v)
        if t == "map":
            out = {}
            while True:
                n, pos = _zz_decode(buf, pos)
                if n == 0:
                    return out, pos
                if n < 0:
                    _sz, pos = _zz_decode(buf, pos)
                    n = -n
                for _ in range(n):
                    k, pos = self.decode(buf, pos, "string")
                    out[k], pos = self.decode(buf, pos, schema["values"])
        raise ValueError(f"unsupported Avro type {t!r}")


# --- object container file ------------------------------------------------------------

def read_avro(path: str) -> tuple[list[dict], dict]:
    """Read every record of an Avro object container file →
    ``(records, file_metadata)`` — decode driven by the embedded
    writer schema (``file_metadata['avro.schema']`` is returned
    parsed under the key ``schema``)."""
    with open(path, "rb") as fh:
        buf = fh.read()
    if buf[:4] != _MAGIC:
        raise ValueError(f"{path} is not an Avro container file")
    dec0 = _Decoder({"type": "map", "values": "bytes"})
    meta, pos = dec0.decode(buf, 4, dec0.schema)
    schema = json.loads(meta["avro.schema"].decode("utf-8"))
    codec = meta.get("avro.codec", b"null").decode("utf-8")
    if codec not in ("null", "deflate", ""):
        raise ValueError(f"Avro codec {codec!r} not supported")
    sync = bytes(buf[pos:pos + 16])
    pos += 16
    dec = _Decoder(schema)
    out: list[dict] = []
    n_total = len(buf)
    while pos < n_total:
        count, pos = _zz_decode(buf, pos)
        size, pos = _zz_decode(buf, pos)
        block = bytes(buf[pos:pos + size])
        pos += size
        if buf[pos:pos + 16] != sync:
            raise ValueError(f"{path}: sync marker mismatch")
        pos += 16
        if codec == "deflate":
            block = zlib.decompress(block, -15)
        bpos = 0
        for _ in range(count):
            rec, bpos = dec.decode(block, bpos, schema)
            out.append(rec)
    return out, {"schema": schema, "codec": codec or "null"}


def write_avro(
    path: str, schema: dict, records: list[dict],
    metadata: dict | None = None, codec: str = "null",
) -> int:
    """Write records as one Avro object container file (single
    block); returns the file size in bytes. ``metadata``: extra
    file-metadata strings (e.g. Iceberg's ``schema`` /
    ``partition-spec`` keys)."""
    if codec not in ("null", "deflate"):
        raise ValueError(f"codec must be null|deflate, got {codec!r}")
    enc = _Encoder(schema)
    body = bytearray()
    for r in records:
        enc.encode(r, schema, body)
    if codec == "deflate":
        comp = zlib.compressobj(wbits=-15)
        body = comp.compress(bytes(body)) + comp.flush()
    meta = {"avro.schema": json.dumps(schema), "avro.codec": codec}
    for k, v in (metadata or {}).items():
        meta[k] = v
    out = bytearray(_MAGIC)
    menc = _Encoder({"type": "map", "values": "bytes"})
    menc.encode(
        {k: v.encode("utf-8") if isinstance(v, str) else v
         for k, v in meta.items()},
        menc.schema, out,
    )
    sync = os.urandom(16)
    out += sync
    out += _zz_encode(len(records))
    out += _zz_encode(len(body))
    out += bytes(body)
    out += sync
    with open(path, "wb") as fh:
        fh.write(out)
    return len(out)


__all__ = ["read_avro", "write_avro"]
