"""Cross-engine-portable hash expressions.

``portable_hash60`` produces the low 60 bits of the little-endian
interpretation of the LAST 8 bytes of the md5 digest — exactly
DuckDB's ``md5_number_lower(x) % 2**60`` — as a pure Catalyst
expression (md5 + substring shuffling + base-16 conv, all JVM-side).
60 bits rather than 64 so the value always fits a signed BIGINT on
both engines; used wherever a hash must be recomputable in the ANSI
SQL correctness oracle (KMV sketches, portable SimHash, sampling).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def portable_hash60(col: Column | str) -> Column:
    """60-bit md5-tail hash of a string column, equal to DuckDB's
    ``md5_number_lower(col) % 2**60``.

    md5 hex chars 17..32 are the last 8 digest bytes; little-endian
    means reversing the byte (hex-pair) order; dropping the first
    nibble of the reversed string keeps the low 60 bits.
    """
    s = F.md5(_c(col).cast("string"))
    rev = F.concat(*[F.substring(s, 31 - 2 * i, 2) for i in range(8)])
    return F.conv(F.substring(rev, 2, 15), 16, 10).cast("long")
