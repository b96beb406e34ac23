"""Delta Lake DELETION-VECTOR wire format — pure-Python codec for
the public spec (delta.io PROTOCOL.md, "Deletion Vectors"), no
RoaringBitmap library dependency.

What the spec pins down, and this module implements symmetrically
(read AND write, so tests can round-trip and exports interoperate):

* **Descriptor** (rides the ``add`` action as ``deletionVector``):
  ``{storageType, pathOrInlineDv, offset, sizeInBytes, cardinality}``.
  ``storageType``: ``"u"`` = file under the table root named from a
  Z85-encoded UUID (plus an optional random prefix for key
  distribution), ``"i"`` = the serialized bitmap Z85-inlined into the
  descriptor itself, ``"p"`` = absolute path.
* **Z85** (ZeroMQ spec 32): 4 bytes → 5 chars over the 85-char
  alphabet; the UUID encoding is exactly 20 chars for 16 bytes.
* **DV file layout**: 1 format-version byte (``1``), then each
  vector blob at its descriptor's ``offset``:
  ``<dataSize: int32 BE><data: dataSize bytes><crc32(data): int32 BE>``
  with ``sizeInBytes = dataSize``.
* **data = portable RoaringBitmapArray**: ``<magic 1681511377:
  int32 LE><numBitmaps: int64 LE>`` then each 32-bit roaring bitmap
  (consecutive keys 0..n-1, i.e. bitmap *i* covers row indexes
  ``[i·2³², (i+1)·2³²)``) in the standard RoaringFormatSpec portable
  serialization (cookie 12346/12347, array / bitmap / run
  containers, all little-endian).

The reader handles all three container kinds; the writer emits array
containers (≤4096 values) or bitmap containers — never runs — which
every conforming reader must accept.
"""

from __future__ import annotations

import os
import struct
import uuid as _uuid
import zlib

_Z85_CHARS = (
    "0123456789abcdefghijklmnopqrstuvwxyz"
    "ABCDEFGHIJKLMNOPQRSTUVWXYZ.-:+=^!/*?&<>()[]{}@%$#"
)
_Z85_INDEX = {c: i for i, c in enumerate(_Z85_CHARS)}

_MAGIC = 1681511377
_SERIAL_COOKIE_NO_RUN = 12346
_SERIAL_COOKIE_RUN = 12347
_NO_OFFSET_THRESHOLD = 4


def z85_encode(data: bytes) -> str:
    if len(data) % 4:
        raise ValueError("Z85 encodes 4-byte groups; pad first")
    out = []
    for i in range(0, len(data), 4):
        (v,) = struct.unpack(">I", data[i:i + 4])
        chunk = []
        for _ in range(5):
            chunk.append(_Z85_CHARS[v % 85])
            v //= 85
        out.extend(reversed(chunk))
    return "".join(out)


def z85_decode(s: str) -> bytes:
    if len(s) % 5:
        raise ValueError("Z85 decodes 5-char groups")
    out = bytearray()
    for i in range(0, len(s), 5):
        v = 0
        for ch in s[i:i + 5]:
            v = v * 85 + _Z85_INDEX[ch]
        out += struct.pack(">I", v)
    return bytes(out)


# --- 32-bit roaring bitmap (RoaringFormatSpec portable) -----------------------------

def _serialize_roaring32(values: list[int]) -> bytes:
    """Standard portable serialization of one 32-bit roaring bitmap
    from SORTED unique uint32 ``values`` (array/bitmap containers)."""
    containers: list[tuple[int, list[int]]] = []
    cur_key, cur = None, []
    for v in values:
        k = v >> 16
        if k != cur_key:
            if cur:
                containers.append((cur_key, cur))
            cur_key, cur = k, []
        cur.append(v & 0xFFFF)
    if cur:
        containers.append((cur_key, cur))
    n = len(containers)
    body = bytearray()
    body += struct.pack("<II", _SERIAL_COOKIE_NO_RUN, n)
    for key, vals in containers:
        body += struct.pack("<HH", key, len(vals) - 1)
    # offset header (always present for the no-run cookie)
    off = len(body) + 4 * n
    payloads = []
    for _key, vals in containers:
        if len(vals) <= 4096:
            p = struct.pack(f"<{len(vals)}H", *vals)
        else:
            bits = bytearray(8192)
            for lo in vals:
                bits[lo >> 3] |= 1 << (lo & 7)
            p = bytes(bits)
        payloads.append(p)
        body += struct.pack("<I", off)
        off += len(p)
    for p in payloads:
        body += p
    return bytes(body)


def _deserialize_roaring32(buf: bytes, pos: int) -> tuple[list[int], int]:
    """One 32-bit roaring bitmap at ``buf[pos:]`` → (sorted values,
    new position). Handles array, bitmap and run containers."""
    (cookie,) = struct.unpack_from("<I", buf, pos)
    base = pos
    run_flags = None
    if (cookie & 0xFFFF) == _SERIAL_COOKIE_RUN:
        n = (cookie >> 16) + 1
        pos += 4
        nbytes = (n + 7) // 8
        run_flags = buf[pos:pos + nbytes]
        pos += nbytes
    elif cookie == _SERIAL_COOKIE_NO_RUN:
        (n,) = struct.unpack_from("<I", buf, pos + 4)
        pos += 8
    else:
        raise ValueError(f"bad roaring cookie {cookie} at {base}")
    keys, cards = [], []
    for i in range(n):
        k, c = struct.unpack_from("<HH", buf, pos)
        keys.append(k)
        cards.append(c + 1)
        pos += 4
    has_offsets = (
        run_flags is None or n >= _NO_OFFSET_THRESHOLD
    )
    if has_offsets:
        pos += 4 * n  # containers follow in order; offsets redundant
    out: list[int] = []
    for i in range(n):
        hi = keys[i] << 16
        is_run = bool(run_flags and (run_flags[i >> 3] >> (i & 7)) & 1)
        if is_run:
            (n_runs,) = struct.unpack_from("<H", buf, pos)
            pos += 2
            for _ in range(n_runs):
                start, length = struct.unpack_from("<HH", buf, pos)
                pos += 4
                out.extend(hi | v for v in range(start, start + length + 1))
        elif cards[i] > 4096:
            bits = buf[pos:pos + 8192]
            pos += 8192
            for byte_i, b in enumerate(bits):
                while b:
                    low = b & (-b)
                    out.append(hi | (byte_i << 3) | low.bit_length() - 1)
                    b ^= low
        else:
            vals = struct.unpack_from(f"<{cards[i]}H", buf, pos)
            pos += 2 * cards[i]
            out.extend(hi | v for v in vals)
    return out, pos


def serialize_dv(row_indexes) -> bytes:
    """Sorted 64-bit row indexes → the spec's ``data`` blob
    (magic + portable RoaringBitmapArray, consecutive keys)."""
    vals = sorted(set(int(v) for v in row_indexes))
    if vals and vals[0] < 0:
        raise ValueError("row indexes are non-negative")
    n_maps = (vals[-1] >> 32) + 1 if vals else 0
    out = bytearray(struct.pack("<iq", _MAGIC, n_maps))
    i = 0
    for m in range(n_maps):
        hi_end = (m + 1) << 32
        j = i
        while j < len(vals) and vals[j] < hi_end:
            j += 1
        out += _serialize_roaring32([v & 0xFFFFFFFF for v in vals[i:j]])
        i = j
    return bytes(out)


def deserialize_dv(data: bytes) -> list[int]:
    """The spec's ``data`` blob → sorted 64-bit row indexes."""
    magic, n_maps = struct.unpack_from("<iq", data, 0)
    if magic != _MAGIC:
        raise ValueError(f"bad deletion-vector magic {magic}")
    pos, out = 12, []
    for m in range(n_maps):
        vals, pos = _deserialize_roaring32(data, pos)
        out.extend((m << 32) | v for v in vals)
    return out


# --- DV file + descriptor -----------------------------------------------------------

def dv_file_name(uuid_str: str, prefix: str = "") -> str:
    """The on-disk name the spec derives from a ``u`` descriptor:
    ``[<prefix>/]deletion_vector_<uuid>.bin``."""
    base = f"deletion_vector_{uuid_str}.bin"
    return f"{prefix}/{base}" if prefix else base


def resolve_dv_path(table_path: str, desc: dict) -> str:
    st = desc["storageType"]
    if st == "p":
        return desc["pathOrInlineDv"]
    if st != "u":
        raise ValueError(f"descriptor storageType {st!r} has no path")
    enc = desc["pathOrInlineDv"]
    prefix, uid_part = enc[:-20], enc[-20:]
    uid = str(_uuid.UUID(bytes=z85_decode(uid_part)))
    return os.path.join(table_path, dv_file_name(uid, prefix))


def read_dv(table_path: str, desc: dict) -> list[int]:
    """Descriptor → sorted deleted row indexes, CRC-verified."""
    if desc["storageType"] == "i":
        data = z85_decode(desc["pathOrInlineDv"])
        # inline blobs are Z85 (4-byte groups): the true length is
        # sizeInBytes; trailing pad bytes (if any) are dropped
        data = data[: desc["sizeInBytes"]]
        return deserialize_dv(data)
    fp = resolve_dv_path(table_path, desc)
    with open(fp, "rb") as fh:
        fh.seek(desc["offset"])
        (size,) = struct.unpack(">i", fh.read(4))
        data = fh.read(size)
        (crc,) = struct.unpack(">I", fh.read(4))
    if size != desc["sizeInBytes"]:
        raise ValueError(
            f"DV size mismatch at {fp}:{desc['offset']}: file says "
            f"{size}, descriptor says {desc['sizeInBytes']}"
        )
    if (zlib.crc32(data) & 0xFFFFFFFF) != (crc & 0xFFFFFFFF):
        raise ValueError(f"DV checksum mismatch at {fp}:{desc['offset']}")
    return deserialize_dv(data)


def write_dv_file(
    table_path: str, vectors: list, prefix: str = ""
) -> list[dict]:
    """Write one spec-conformant DV FILE holding every vector in
    ``vectors`` (each a list of row indexes); returns one ``u``
    descriptor per vector, in order. The file gets the spec's
    1-byte format version header; each blob lands at its own offset
    with length + CRC framing."""
    uid = str(_uuid.uuid4())
    rel = dv_file_name(uid, prefix)
    fp = os.path.join(table_path, rel)
    os.makedirs(os.path.dirname(fp) or table_path, exist_ok=True)
    descs = []
    enc_uuid = z85_encode(_uuid.UUID(uid).bytes)
    with open(fp, "wb") as fh:
        fh.write(b"\x01")  # format version
        for rows in vectors:
            data = serialize_dv(rows)
            off = fh.tell()
            fh.write(struct.pack(">i", len(data)))
            fh.write(data)
            fh.write(struct.pack(">I", zlib.crc32(data) & 0xFFFFFFFF))
            descs.append({
                "storageType": "u",
                "pathOrInlineDv": prefix + enc_uuid,
                "offset": off,
                "sizeInBytes": len(data),
                "cardinality": len(set(int(v) for v in rows)),
            })
    return descs


__all__ = [
    "z85_encode", "z85_decode", "serialize_dv", "deserialize_dv",
    "read_dv", "write_dv_file", "resolve_dv_path", "dv_file_name",
]
