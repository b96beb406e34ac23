"""Text expression helpers: normalization, tokenization, shingling.

Normalization/tokenization are pure Catalyst expressions (regexp +
split — codegen'd, JVM-side). Shingle construction is the exception:
per-position array slicing through higher-order functions is
interpreted (HOFs don't codegen) and ~10× slower than an
Arrow-batched pandas UDF, so the hashed-shingle hot path
(``shingle_hashes``) is vectorized Python by design.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def normalize_text(col: Column | str) -> Column:
    """Lowercase, collapse non-alphanumerics to single spaces, trim."""
    return F.trim(F.regexp_replace(F.lower(_c(col)), "[^a-z0-9]+", " "))


def tokens(col: Column | str) -> Column:
    """Whitespace tokens of the normalized text (empty → empty array)."""
    norm = normalize_text(col)
    return F.when(norm == "", F.array().cast("array<string>")).otherwise(
        F.split(norm, " ")
    )


def word_shingles(col: Column | str, n: int = 3) -> Column:
    """Distinct n-word shingles (space-joined). Texts shorter than n
    tokens contribute their whole token sequence as one shingle, so no
    document maps to an empty set."""
    t = tokens(col)
    shingled = F.when(
        F.size(t) >= n,
        F.transform(
            F.sequence(F.lit(0), F.size(t) - n),
            lambda i: F.concat_ws(" ", F.slice(t, i + 1, n)),
        ),
    ).otherwise(F.array(F.concat_ws(" ", t)))
    return F.array_distinct(shingled)


def shingle_hashes(col: Column | str, n: int = 3) -> Column:
    """Distinct n-word shingles of the normalized text, as stable
    64-bit hashes (first 8 md5 bytes — process-independent, unlike
    Python's salted ``hash``).

    Same set semantics as ``word_shingles`` (short texts contribute
    their whole token sequence as one shingle) but 8-byte elements:
    downstream inverted indexes and signatures shuffle longs, not
    multi-word strings. Tokenization stays JVM-side; only the
    per-position shingle build is Python (Arrow-batched).
    """
    t = tokens(col)

    @F.pandas_udf("array<long>")
    def _hashes(tok_ser: pd.Series) -> pd.Series:
        out = []
        for toks in tok_ser:
            if toks is None:  # NULL text -> NULL token array -> empty set
                out.append(np.array([], dtype=np.int64))
                continue
            toks = list(toks)
            if len(toks) >= n:
                sset = {" ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)}
            else:
                sset = {" ".join(toks)}
            out.append(np.array(
                [int.from_bytes(hashlib.md5(s.encode()).digest()[:8], "little", signed=True)
                 for s in sset],
                dtype=np.int64,
            ))
        return pd.Series(out)

    return _hashes(t)


def char_ngrams(col: Column | str, n: int = 3) -> Column:
    """Distinct character n-grams of the normalized text."""
    norm = normalize_text(col)
    grams = F.when(
        F.length(norm) >= n,
        F.transform(
            F.sequence(F.lit(1), F.length(norm) - n + 1),
            lambda i: F.substring(norm, i, n),
        ),
    ).otherwise(F.array(norm))
    return F.array_distinct(grams)


def jaccard(a: Column | str, b: Column | str) -> Column:
    """|A∩B| / |A∪B| over two array columns (treated as sets)."""
    inter = F.size(F.array_intersect(_c(a), _c(b)))
    union = F.size(F.array_union(_c(a), _c(b)))
    return F.when(union > 0, inter.cast("double") / union.cast("double")).otherwise(F.lit(0.0))
