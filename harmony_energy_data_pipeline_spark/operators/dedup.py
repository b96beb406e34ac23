"""Document deduplication family: exact, MinHash+LSH, SimHash,
n-gram Jaccard — the operators a training-data pipeline needs at
100 TB (extension beyond the reference's keyed dedup; the reference's
own two-phase keyed dedup lives in operators.cleaning).

Everything below is expression-level Catalyst (higher-order array
functions + hash expressions). The scale shape of each:

- exact:       one hash-shuffle on the content digest.
- MinHash LSH: map-side signature computation (no shuffle), explode to
               (band, band_hash) keys, shuffle ONCE on the band key,
               pair-join inside buckets, exact-Jaccard verify on the
               (small) candidate set. Never an all-pairs join.
- SimHash:     map-side 64-bit signature; near-dup = signatures within
               Hamming distance d, found by the band trick on bit
               blocks (pigeonhole: d≤3 with 4 blocks → one block equal).
- n-gram Jaccard: exact pairwise verify via a shingle-equality join —
               selective because shingles are n-grams, not words.
"""

from __future__ import annotations

import hashlib
import random
import struct

import numpy as np
import pandas as pd

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.storagelevel import StorageLevel

from harmony_energy_data_pipeline_spark.io import local_relation
from harmony_energy_data_pipeline_spark.functions.textx import (
    char_ngrams,
    jaccard,
    normalize_text,
    shingle_hashes,
    tokens,
)

# ---------------------------------------------------------------------------
# Exact dedup (hash-groupBy on content digest)
# ---------------------------------------------------------------------------

def exact_dedup(
    df: DataFrame,
    id_col: str,
    text_col: str,
    normalize: bool = True,
) -> DataFrame:
    """Keep one row (smallest id) per distinct text digest.

    md5 over the (optionally normalized) content, then a min-id window
    per digest: one shuffle keyed by digest. The digest-first shape is
    what scales — grouping on a 16-byte key, not on multi-KB text.
    """
    content = normalize_text(text_col) if normalize else F.col(text_col)
    digest = F.md5(content).alias("__digest")
    w = Window.partitionBy("__digest").orderBy(F.col(id_col).asc())
    return (
        df.withColumn("__digest", digest)
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn", "__digest")
    )


def paragraph_dedup(
    df: DataFrame,
    id_col: str,
    text_col: str,
    sep: str = "\n",
    min_chars: int = 1,
) -> DataFrame:
    """Corpus-wide PARAGRAPH-level exact dedup (the CCNet/RefinedWeb
    line-dedup shape): split every document on ``sep``, keep each
    distinct paragraph's FIRST occurrence (ordered by ``(id, position)``),
    drop every later repeat, and reassemble each document from its
    surviving paragraphs in original order. Boilerplate — headers,
    footers, cookie banners, navigation — repeats across pages far
    more often than whole documents do, so paragraph granularity
    removes what document-level dedup cannot see.

    Scale shape: ``posexplode`` is map-side; the keep-first window
    shuffles ONCE keyed by the paragraph's 16-byte md5 digest (never
    the multi-KB text); reassembly is one ``groupBy(id)``. Documents
    whose every paragraph was dropped vanish from the result (their
    content was pure boilerplate).

    Paragraphs shorter than ``min_chars`` after trimming are treated
    as formatting, not content: excluded from dedup AND from the
    reassembled text.

    Returns ``(id_col, clean_text, n_paras)``.
    """
    parts = df.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), sep)).alias("__pos", "__para"),
    ).filter(F.length(F.trim(F.col("__para"))) >= min_chars)
    w = Window.partitionBy(F.md5(F.trim(F.col("__para")))).orderBy(
        F.col(id_col).asc(), F.col("__pos").asc()
    )
    kept = (
        parts.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
    )
    return kept.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("__pos", "__para"))),
                lambda s: s["__para"],
            ),
            sep,
        ).alias("clean_text"),
        F.count("*").alias("n_paras"),
    )


def boilerplate_strip(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_df: int,
    sep: str = "\n",
    min_chars: int = 1,
) -> DataFrame:
    """Remove paragraphs whose DOCUMENT FREQUENCY exceeds ``max_df``
    from EVERY document (the CCNet boilerplate filter): headers,
    footers, cookie banners, and navigation repeat corpus-wide, and
    unlike :func:`paragraph_dedup` (which keeps each paragraph's
    first occurrence) true boilerplate should not survive anywhere —
    its first occurrence is as worthless as its thousandth.

    Scale shape: ``posexplode`` map-side; document frequency is one
    digest-keyed groupBy (a paragraph repeated within one doc counts
    once — dropDuplicates on (digest, id) first, map-side combined);
    the strip is a digest-keyed LEFT ANTI join against the (small)
    over-threshold set; reassembly is one groupBy(id). Documents
    whose every paragraph was boilerplate vanish.

    Returns ``(id_col, clean_text, n_paras)``.
    """
    parts = df.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), sep)).alias("__pos", "__para"),
    ).filter(F.length(F.trim(F.col("__para"))) >= min_chars).withColumn(
        "__digest", F.md5(F.trim(F.col("__para")))
    )
    hot = (
        parts.select("__digest", id_col)
        .dropDuplicates(["__digest", id_col])
        .groupBy("__digest")
        .agg(F.count("*").alias("__df"))
        .filter(F.col("__df") > max_df)
        .select("__digest")
    )
    kept = parts.join(hot, "__digest", "left_anti")
    return kept.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("__pos", "__para"))),
                lambda s: s["__para"],
            ),
            sep,
        ).alias("clean_text"),
        F.count("*").alias("n_paras"),
    )


# ---------------------------------------------------------------------------
# MinHash + LSH near-dedup
# ---------------------------------------------------------------------------

_MERSENNE_P = (1 << 31) - 1


def _hash_params(num_hashes: int, seed: int = 42) -> list[tuple[int, int]]:
    """Deterministic (a, b) pairs for the universal-hash family
    h(x) = (a·x + b) mod p."""
    rng = random.Random(seed)
    return [
        (rng.randrange(1, _MERSENNE_P), rng.randrange(0, _MERSENNE_P))
        for _ in range(num_hashes)
    ]


def minhash_signature(
    hash_col: Column | str,
    num_hashes: int = 64,
    seed: int = 42,
) -> Column:
    """Array of ``num_hashes`` min-hash values over a column of 64-bit
    shingle hashes (``textx.shingle_hashes``).

    One Arrow-batched pandas UDF doing a (num_hashes × n_shingles)
    matrix op in numpy — map-side, no shuffle. Higher-order-function
    expressions are interpreted (no codegen), so 64 interpreted passes
    per row are ~10× slower than this vectorized form; the UDF is the
    fast path here, not the slow one.
    """
    col = F.col(hash_col) if isinstance(hash_col, str) else hash_col
    params = _hash_params(num_hashes, seed)
    a_vec = np.array([a for a, _ in params], dtype=np.int64)
    b_vec = np.array([b for _, b in params], dtype=np.int64)

    @F.pandas_udf("array<long>")
    def _sig(hashes: pd.Series) -> pd.Series:
        out = []
        for h in hashes:
            if h is None:
                out.append(np.full(num_hashes, _MERSENNE_P, dtype=np.int64))
                continue
            h = np.asarray(h, dtype=np.int64) % _MERSENNE_P  # fold into [0, p)
            if h.size == 0:
                out.append(np.full(num_hashes, _MERSENNE_P, dtype=np.int64))
                continue
            # a < 2^31 and h ∈ [0, 2^31) ⇒ a·h + b < 2^62: no overflow.
            m = (a_vec[:, None] * h[None, :] + b_vec[:, None]) % _MERSENNE_P
            out.append(m.min(axis=1))
        return pd.Series(out)

    # the function is pure, but marking it non-deterministic stops the
    # optimizer from pushing the sentinel filter BELOW the projection
    # and re-evaluating the whole _sig(_hashes(...)) chain twice per
    # row (two ArrowEvalPython nodes for one signature — guide §4.4)
    return _sig.asNondeterministic()(col)


def minhash_candidate_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    shingle_size: int = 3,
    num_hashes: int = 64,
    bands: int = 16,
    seed: int = 42,
) -> DataFrame:
    """LSH candidate pairs: docs sharing ≥1 identical signature band.

    rows-per-band r = num_hashes / bands; collision prob for Jaccard s
    is 1 − (1 − s^r)^bands (the classic S-curve). Returns distinct
    (id_a, id_b) with id_a < id_b.
    """
    assert num_hashes % bands == 0, "bands must divide num_hashes"
    r = num_hashes // bands
    sigs = df.select(
        F.col(id_col),
        minhash_signature(shingle_hashes(text_col, shingle_size), num_hashes, seed).alias("__sig"),
    )
    # Null/empty-shingle docs all share the sentinel signature (every
    # value = p), so they'd collide in EVERY band and the self-join
    # would materialize a d²/2 candidate clique that the Jaccard
    # verify then rejects pair by pair (empty-set Jaccard = 0) — the
    # exact skew case a crawl corpus hits. A real minimum is always
    # < p, so one element_at probe excludes them with no recompute.
    sigs = sigs.filter(F.element_at("__sig", 1) != F.lit(_MERSENNE_P))
    # the band-hash array as ONE JVM-parsed SQL expression instead of
    # ~bands×r py4j Column objects (each of which re-analyzes the
    # growing plan): AST-identical, construction-time only — the same
    # fold that took lsh_topk signature construction 6.5 → 0.9 s
    band_sql = ", ".join(
        "xxhash64(concat_ws(',', {parts}))".format(
            parts=", ".join(
                f"cast(element_at(__sig, {j * r + i + 1}) as string)"
                for i in range(r)
            )
        )
        for j in range(bands)
    )
    banded = sigs.select(
        F.col(id_col),
        F.posexplode(F.expr(f"array({band_sql})")).alias(
            "__band", "__bhash"
        ),
    )
    # Materialize band keys once: the self-join would otherwise
    # recompute shingling + signatures on BOTH sides. At cluster scale
    # the same move is persist-to-disk or a checkpointed signature
    # table; either way signatures are computed exactly once.
    banded = banded.persist(StorageLevel.MEMORY_AND_DISK)
    left = banded.alias("a")
    right = banded.alias("b")
    return (
        left.join(
            right,
            on=[
                F.col("a.__band") == F.col("b.__band"),
                F.col("a.__bhash") == F.col("b.__bhash"),
                F.col(f"a.{id_col}") < F.col(f"b.{id_col}"),
            ],
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
        )
        .distinct()
    )


def minhash_dedup(
    df: DataFrame,
    id_col: str,
    text_col: str,
    shingle_size: int = 3,
    num_hashes: int = 64,
    bands: int = 16,
    threshold: float = 0.8,
    seed: int = 42,
    exact_prepass: bool = True,
) -> DataFrame:
    """Near-dedup: LSH candidates → exact-Jaccard verify → drop the
    larger id of each confirmed pair (keep-first representative).

    Keep-first is the standard single-pass approximation of connected
    components: any doc that is the *larger* id in some confirmed pair
    is removed. (Full transitive closure needs iterative joins —
    GraphFrames CC at real scale.)

    EXACT-DUPLICATE PREPASS (round 4; provably result-identical, the
    same argument as ``semdedup``'s): byte-identical texts have
    identical shingle sets, hence identical signatures and bands, so
    every copy beyond the min-id representative is (a) guaranteed to
    be LSH-caught and Jaccard-1-confirmed against its rep — dropped
    either way — and (b) interchangeable with its rep in any
    confirmed pair against a third doc (a group's rep id is its
    minimum, so "some lower-id copy confirms against x" iff "the rep
    confirms against x"). Collapsing copies to reps BEFORE the band
    self-join makes LSH bucket membership — and the candidate-pair
    mass, the only quadratic term (measured exponent 1.25 at 30×
    replication) — scale with DISTINCT texts, not rows. Exactly the
    standard 100 TB pipeline order: exact dedup, then near-dedup.
    NULL texts bypass the grouping (their empty shingle set is
    sentinel-excluded from LSH, so the original semantics keep every
    copy).
    """
    keep_cols = [F.col(id_col), F.col(text_col)]
    if exact_prepass:
        groupable = F.col(text_col).isNotNull()
        reps = (
            df.filter(groupable)
            .groupBy(F.md5(text_col).alias("__dig"))
            .agg(F.min(F.struct(*keep_cols)).alias("__s"))
            .select(f"__s.{id_col}", f"__s.{text_col}")
        )
        sides = reps.unionByName(df.filter(~groupable).select(*keep_cols))
    else:
        sides = df.select(*keep_cols)
    pairs = minhash_candidate_pairs(
        sides, id_col, text_col, shingle_size, num_hashes, bands, seed
    )
    # Hashed shingle sets for the exact-Jaccard verify: 8-byte set
    # elements (same Jaccard w.h.p.), computed once for both join sides.
    sh = sides.select(
        F.col(id_col), shingle_hashes(text_col, shingle_size).alias("__sh")
    ).persist(StorageLevel.MEMORY_AND_DISK)
    confirmed = (
        pairs.join(sh.withColumnRenamed(id_col, "id_a").withColumnRenamed("__sh", "__sh_a"), "id_a")
        .join(sh.withColumnRenamed(id_col, "id_b").withColumnRenamed("__sh", "__sh_b"), "id_b")
        .filter(jaccard("__sh_a", "__sh_b") >= F.lit(threshold))
    )
    doomed = confirmed.select(F.col("id_b").alias(id_col)).distinct()
    if exact_prepass:
        # every non-rep copy is dominated by its (lower-id, Jaccard-1)
        # rep: doomed regardless of the rep's own fate
        non_reps = (
            df.filter(F.col(text_col).isNotNull())
            .select(id_col)
            .join(sides.select(id_col), id_col, "left_anti")
        )
        doomed = doomed.unionByName(non_reps).distinct()
    return df.join(doomed, on=id_col, how="left_anti")


# ---------------------------------------------------------------------------
# n-gram Jaccard (exact) near-dup pairs
# ---------------------------------------------------------------------------

def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    shingle_size: int = 3,
    threshold: float = 0.5,
    max_doc_freq: int | None = None,
) -> DataFrame:
    """Exact Jaccard-similar pairs via an inverted-index join on
    shared shingles (never an all-pairs cross join).

    explode(shingles) → self-join on shingle → count = |A∩B| per pair
    → join set sizes → Jaccard = inter / (|A| + |B| − inter).
    Shuffles: one on shingle (the index join), one on the pair key.

    ``max_doc_freq`` is the hot-shingle skew guard: shingles appearing
    in more than that many documents are dropped from BOTH the index
    and the set sizes before the self-join (stop-shingle removal —
    Jaccard is then over the informative-shingle space). A shingle
    with document frequency d produces d·(d−1)/2 join rows, so a few
    template shingles dominate the join at corpus scale; the hot list
    is tiny by construction and rides a broadcast anti-join, and the
    df aggregation is map-side combined on 8-byte keys.

    Scale shape: shingles are xxhash64-hashed to int64 before the
    explode, so the inverted index and its shuffle carry 8-byte keys
    instead of multi-word strings; the shingle table is computed once
    and persisted (it feeds the size lookup and both self-join sides).
    Output: (id_a, id_b, jaccard) with id_a < id_b, jaccard ≥ threshold.
    """
    sh = df.select(
        F.col(id_col), shingle_hashes(text_col, shingle_size).alias("__sh")
    ).persist(StorageLevel.MEMORY_AND_DISK)
    return _jaccard_pairs_from_sets(sh, id_col, threshold, max_doc_freq)


def char_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 5,
    threshold: float = 0.4,
    max_doc_freq: int | None = None,
) -> DataFrame:
    """Character-n-gram Jaccard pairs — the char-level near-dup
    variant of ``ngram_jaccard_pairs``, same inverted-index shape
    (never an all-pairs cross join; round 6 replaced a brute-force
    pairwise ``array_intersect`` form that interpreted O(pairs·set)
    HOF folds). Join keys stay raw n-char substrings (already tiny)
    rather than hashes, keeping counts provably collision-free
    against a substring-joining oracle.
    """
    sh = df.select(
        F.col(id_col), char_ngrams(text_col, n).alias("__sh")
    ).persist(StorageLevel.MEMORY_AND_DISK)
    return _jaccard_pairs_from_sets(sh, id_col, threshold, max_doc_freq)


def _jaccard_pairs_from_sets(
    sh: DataFrame,
    id_col: str,
    threshold: float,
    max_doc_freq: int | None,
) -> DataFrame:
    """Shared inverted-index Jaccard body over a persisted
    (id, set-array ``__sh``) table: explode → self-join on element →
    |A∩B| counts → size join → threshold filter."""
    inv = sh.select(F.col(id_col), F.explode("__sh").alias("__s"))
    if max_doc_freq is not None:
        hot = (
            inv.groupBy("__s")
            .agg(F.count("*").alias("__df"))
            .filter(F.col("__df") > max_doc_freq)
            .select("__s")
        )
        inv = inv.join(F.broadcast(hot), "__s", "left_anti").persist(
            StorageLevel.MEMORY_AND_DISK
        )
        sizes = inv.groupBy(id_col).agg(F.count("*").alias("__n"))
    else:
        sizes = sh.select(F.col(id_col), F.size("__sh").alias("__n"))
    a = inv.alias("a")
    b = inv.alias("b")
    inter = (
        a.join(b, on=[F.col("a.__s") == F.col("b.__s"),
                      F.col(f"a.{id_col}") < F.col(f"b.{id_col}")])
        .groupBy(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
        )
        .agg(F.count("*").alias("__inter"))
    )
    return (
        inter.join(sizes.withColumnRenamed(id_col, "id_a").withColumnRenamed("__n", "__na"), "id_a")
        .join(sizes.withColumnRenamed(id_col, "id_b").withColumnRenamed("__n", "__nb"), "id_b")
        .select(
            "id_a", "id_b",
            (F.col("__inter").cast("double")
             / (F.col("__na") + F.col("__nb") - F.col("__inter")).cast("double")
             ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= F.lit(threshold))
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

def simhash64(text_col: Column | str, nbits: int = 64, portable: bool = False) -> Column:
    """SimHash over whitespace tokens: bit i of the signature is set
    iff Σ_tokens (±1 by token-hash bit i) ≥ 0.

    Default: token hashes are JVM-side (``xxhash64`` in one array
    pass); the bit-vote fold is a vectorized numpy pandas UDF — an
    interpreted higher-order-function fold would cost 64 interpreted
    evals per token (HOFs don't codegen), ~10× slower than the Arrow
    batch.

    ``portable=True`` swaps the token hash for the low 60 bits of the
    little-endian md5 tail (DuckDB's ``md5_number_lower % 2^60``), so
    the signature is reproducible in ANSI SQL for the correctness
    oracle — same SimHash semantics, hash family chosen for
    cross-engine determinism (requires ``nbits <= 60``)."""
    t = tokens(text_col)
    shifts = np.arange(nbits, dtype=np.uint64)

    if portable:
        assert nbits <= 60, "portable token hashes carry 60 usable bits"
        mask = (1 << 60) - 1

        @F.pandas_udf("long")
        def _sim_portable(tok_ser: pd.Series) -> pd.Series:
            out = np.empty(len(tok_ser), dtype=np.int64)
            for i, toks in enumerate(tok_ser):
                if toks is None or len(toks) == 0:
                    out[i] = 0
                    continue
                h = np.array(
                    [struct.unpack("<Q", hashlib.md5(w.encode()).digest()[8:])[0] & mask
                     for w in toks],
                    dtype=np.uint64,
                )
                bits = (h[:, None] >> shifts[None, :]) & np.uint64(1)
                votes = (2 * bits.astype(np.int64) - 1).sum(axis=0)
                out[i] = int(((votes >= 0).astype(np.uint64) << shifts).sum(dtype=np.uint64))
            return pd.Series(out)

        return _sim_portable(t)

    hashed = F.transform(t, lambda tok: F.xxhash64(tok))

    @F.pandas_udf("long")
    def _sim(hashes: pd.Series) -> pd.Series:
        out = np.empty(len(hashes), dtype=np.int64)
        for i, h in enumerate(hashes):
            if h is None:
                out[i] = 0
                continue
            h = np.asarray(h, dtype=np.int64).astype(np.uint64)
            if h.size == 0:
                out[i] = 0
                continue
            bits = (h[:, None] >> shifts[None, :]) & np.uint64(1)  # (n_tok, 64)
            votes = (2 * bits.astype(np.int64) - 1).sum(axis=0)
            sig = ((votes >= 0).astype(np.uint64) << shifts).sum(dtype=np.uint64)
            out[i] = sig.astype(np.int64)  # two's-complement wrap
        return pd.Series(out)

    return _sim(hashed)


def simhash_near_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_hamming: int = 3,
    blocks: int = 4,
    nbits: int = 64,
    portable: bool = False,
) -> DataFrame:
    """Near-dup pairs by SimHash: Hamming(sig_a, sig_b) ≤ max_hamming.

    Degenerate-corpus note: token-free documents all hash to signature
    0 and are emitted as pairs (they ARE identical after
    normalization) — like any pair-based dedup, run ``exact_dedup``
    first so identical-document cliques collapse to one representative
    before the quadratic pair stage (the SemDeDup prepass lesson,
    SCALING.md).

    Pigeonhole band trick: split the ``nbits``-bit signature into
    ``blocks`` equal blocks; any pair within Hamming d < blocks must
    agree on at least one block, so candidates are found with a single
    equi-join on (block_idx, block_value) — no all-pairs scan, and
    (unlike MinHash LSH) EXACT: recall is 1 by pigeonhole, and the
    popcount-on-XOR verify makes precision 1. ``portable=True`` uses
    the md5-based token hash (see ``simhash64``) so the whole query is
    reproducible in the DuckDB oracle.
    """
    assert nbits % blocks == 0
    # pigeonhole bound: with `blocks` blocks, a pair within Hamming
    # distance d is only guaranteed to agree on >=1 block when d < blocks
    assert max_hamming < blocks, "max_hamming must be < blocks (pigeonhole)"
    width = nbits // blocks
    sigs = df.select(F.col(id_col), simhash64(text_col, nbits, portable).alias("__sig"))
    banded = sigs.select(
        F.col(id_col),
        F.col("__sig"),
        F.posexplode(
            F.array(*[
                F.shiftrightunsigned("__sig", j * width)
                .bitwiseAND(F.lit((1 << width) - 1))
                for j in range(blocks)
            ])
        ).alias("__blk", "__bval"),
    )
    # Same materialize-once move as minhash_candidate_pairs: don't
    # recompute signatures on both sides of the self-join.
    banded = banded.persist(StorageLevel.MEMORY_AND_DISK)
    a = banded.alias("a")
    b = banded.alias("b")
    cand = (
        a.join(b, on=[F.col("a.__blk") == F.col("b.__blk"),
                      F.col("a.__bval") == F.col("b.__bval"),
                      F.col(f"a.{id_col}") < F.col(f"b.{id_col}")])
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.col("a.__sig").alias("__sa"),
            F.col("b.__sig").alias("__sb"),
        )
        .distinct()
    )
    hamming = F.bit_count(F.col("__sa").bitwiseXOR(F.col("__sb"))).cast("long")
    return (
        cand.select("id_a", "id_b", hamming.alias("hamming"))
        .filter(F.col("hamming") <= F.lit(max_hamming))
    )


# ---------------------------------------------------------------------------
# Dedup clusters: connected components over a near-dup pair graph
# ---------------------------------------------------------------------------

def connected_components(
    pairs: DataFrame,
    a_col: str = "id_a",
    b_col: str = "id_b",
    max_iter: int = 25,
    max_local_edges: int = 1_000_000,
) -> DataFrame:
    """Connected components of the undirected pair graph by min-label
    propagation: every node's component becomes the smallest node id
    reachable from it. Output: ``(node, component)`` for every node
    that appears in ``pairs``.

    Near-dup PAIRS are only half of dedup — keeping "one doc per
    duplicate set" needs the transitive closure (A~B, B~C ⇒ drop two
    of {A,B,C}), which no single join can express.

    Execution: an iterative loop of (edge ⋈ label → min per node)
    shuffles, converging in O(graph diameter) rounds — near-dup
    graphs are shallow (duplicate sets are near-cliques), so 2-4
    rounds is typical. Each round ``persist()``-s its labels (the
    convergence probe materializes them; an aggregated count, not a
    collect) and unpersists the previous round's; ``persist`` keeps
    lineage, so executor loss recomputes from the last reliable
    checkpoint — which ``operators.iterative.truncate_every`` writes
    every few rounds to keep plans shallow on pathological chain
    graphs. This is the standard Pregel shape (cf. GraphX/GraphFrames
    connectedComponents); for pathological chain graphs raise
    ``max_iter`` (rounds, not data, is the cost: every round is one
    shuffle of |V| labels).

    DRIVER-LOCAL ROUTE (round 6, the BPE-trainer playbook): near-dup
    pair graphs are tiny relative to the corpus — the sf0.1 documents
    graph is 256 edges, yet the Pregel loop paid ~8 scheduled jobs
    for it. When the (deduplicated, undirected) edge count is at most
    ``max_local_edges``, the edge list is collected and union-find
    with path-halving labels components on the driver — same
    min-label output, one collect instead of O(diameter) shuffle
    rounds. The census count rides on the already-persisted edge
    table the loop would materialize anyway; bigger graphs take the
    distributed loop unchanged. Both routes are parity-tested against
    a reference union-find.
    """
    from .iterative import ensure_checkpoint_dir, truncate_every

    ensure_checkpoint_dir(pairs.sparkSession)
    edges = (
        pairs.select(F.col(a_col).alias("src"), F.col(b_col).alias("dst"))
        .union(pairs.select(F.col(b_col).alias("src"), F.col(a_col).alias("dst")))
        .distinct()
        .persist()
    )
    if max_local_edges is not None and edges.count() <= 2 * max_local_edges:
        rows = edges.collect()  # symmetric dups are union no-ops;
        parent: dict = {}       # self-edges still register the node

        def find(x):
            parent.setdefault(x, x)
            while parent[x] != x:
                parent[x] = parent[parent[x]]  # path halving
                x = parent[x]
            return x

        for a, b in rows:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        # min-root unions keep every root the component minimum
        out = [(n, find(n)) for n in parent]
        edges.unpersist()
        id_type = pairs.schema[a_col].dataType
        schema = T.StructType([
            T.StructField("node", id_type),
            T.StructField("component", id_type),
        ])
        return local_relation(pairs.sparkSession, out, schema.simpleString())
    labels = (
        edges.select(F.col("src").alias("node"))
        .distinct()
        .select("node", F.col("node").alias("component"))
        .persist()
    )
    prev = labels
    for i in range(max_iter):
        # smallest label among each node's neighbors (and itself)
        neighbor_min = (
            edges.join(labels, edges["dst"] == labels["node"])
            .groupBy("src")
            .agg(F.min("component").alias("__nc"))
        )
        merged = (
            labels.join(neighbor_min, labels["node"] == neighbor_min["src"], "left")
            .select(
                "node",
                F.least(
                    F.col("component"), F.coalesce(F.col("__nc"), F.col("component"))
                ).alias("component"),
                (F.coalesce(F.col("__nc"), F.col("component")) < F.col("component"))
                .cast("int")
                .alias("__changed"),
            )
        )
        merged = truncate_every(merged, i, every=5)
        merged = merged.persist()
        # materializes this round's labels (and populates the cache),
        # after which the previous round's blocks are dead weight
        changed = merged.agg(F.sum("__changed")).first()[0] or 0
        prev.unpersist()
        prev = merged
        labels = merged.select("node", "component")
        if changed == 0:
            break
    return labels


def dedup_by_clusters(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str,
    a_col: str = "id_a",
    b_col: str = "id_b",
) -> DataFrame:
    """Keep one representative (smallest id) per near-dup cluster:
    rows of ``df`` whose id is either outside the pair graph or equal
    to its component's minimum. One anti-join against the (small)
    non-representative set — ``df`` itself is never shuffled."""
    comps = connected_components(pairs, a_col, b_col)
    losers = comps.filter(F.col("node") != F.col("component")).select(
        F.col("node").alias(id_col)
    )
    return df.join(losers, id_col, "left_anti")


def dedup_by_clusters_best(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str,
    score_col: str,
    a_col: str = "id_a",
    b_col: str = "id_b",
) -> DataFrame:
    """Quality-aware cluster dedup (the Dolma/FineWeb keep-best
    pattern): one representative per near-dup cluster, chosen by
    HIGHEST ``score_col`` (ties break on smallest id, so the choice is
    deterministic on any engine) — rather than smallest id as in
    ``dedup_by_clusters``. Near-dup sets usually mix a clean original
    with mangled copies; keeping the best-scoring member preserves
    corpus quality instead of whichever id sorted first.

    Scale shape: the component table (nodes in the pair graph only —
    tiny vs the corpus) joins the scores for just those rows, a
    per-component argmax window ranks them, and the corpus is touched
    by ONE anti-join against the loser set. ``df`` never shuffles.
    """
    comps = connected_components(pairs, a_col, b_col)
    scored = comps.join(
        df.select(F.col(id_col).alias("node"), F.col(score_col).alias("__s")),
        "node",
    )
    w = Window.partitionBy("component").orderBy(
        F.col("__s").desc(), F.col("node").asc()
    )
    losers = (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") > 1)
        .select(F.col("node").alias(id_col))
    )
    return df.join(losers, id_col, "left_anti")


def fuzzy_match_pairs(
    df: DataFrame,
    id_col: str,
    name_col: str,
    max_edit: int = 2,
    prefix: int = 4,
    len_band: int = 8,
    max_block: int | None = None,
    strategy: str = "auto",
    dup_ratio: float = 1.5,
) -> DataFrame:
    """Blocked fuzzy matching (classic record-linkage blocking, e.g.
    Christen 2012): candidate pairs share a BLOCK KEY — the first
    ``prefix`` chars of the normalized name plus a length band — and a
    pair survives iff ``levenshtein(a, b) <= max_edit``. Output
    ``(id_a, id_b, dist)`` with ``id_a < id_b``.

    Contract: names differing inside the prefix or across a length
    boundary are never candidates — the standard blocking
    recall/cost trade-off; run a second pass with a different key
    (e.g. suffix) and union when higher recall matters.

    Scale shape: block-keyed equi-self-join, cost Σ|block|² instead of
    |table|². A block shared by b rows makes b·(b−1)/2 candidates, so
    one popular name (or a low-entropy name domain) turns quadratic —
    ``max_block`` is the guard: blocks larger than the cap are dropped
    from matching entirely (same playbook as the hot-shingle df-cap in
    ``ngram_jaccard_pairs``; a block that big is almost always a
    constant/boilerplate name, and a keyed exact-dup pass catches it
    far cheaper than edit distance). The block census is one cheap
    pre-agg broadcast against the main stream.

    ``strategy`` picks the physical shape of the verify:

    - ``"direct"``: the row-level block self-join above — right when
      names are (near-)unique, since any factorization would just
      add shuffles.
    - ``"factorize"``: DISTINCT-NAME factorization — run blocking +
      levenshtein over the distinct-name table only, then expand the
      surviving name pairs back to id pairs by group membership
      (identical names ⇒ dist 0, always within one block, never
      touch levenshtein). Row-identical output, but the edit-distance
      work drops from Σ|row-block|² to Σ|name-block|² — decisive on
      low-entropy name domains where duplicate names dominate the
      candidate mass AND collapse join-key cardinality (a 12-key
      self-join can't parallelize past 12 tasks).
    - ``"auto"`` (default): one cheap name census (same eager
      census-and-decide playbook as ``semdedup``'s cell census)
      chooses: factorize iff rows ≥ ``dup_ratio`` × distinct names.
    """
    nm = normalize_text(name_col)

    def blk_of(col: Column) -> Column:
        return F.concat_ws(
            "|",
            F.substring(col, 1, prefix),
            F.floor(F.length(col) / len_band).cast("string"),
        )

    return _blocked_pairs(
        df, id_col, nm, blk_of, max_edit, max_block, strategy, dup_ratio
    )


def _blocked_pairs(
    df: DataFrame,
    id_col: str,
    nm: Column,
    blk_of,
    max_edit: int,
    max_block: int | None,
    strategy: str = "auto",
    dup_ratio: float = 1.5,
) -> DataFrame:
    """Shared body of the blocked fuzzy passes: block self-join with
    the optional hot-block census guard, then the levenshtein verify.
    ``blk_of`` is a Column→Column function so the block key can be
    recomputed over the distinct-name table in the factorized path."""
    if strategy not in ("auto", "direct", "factorize"):
        raise ValueError(f"unknown fuzzy-match strategy: {strategy!r}")

    if strategy != "direct":
        # Distinct-name census: one scan of the name column. In
        # "auto" mode it decides the route; in "factorize" it is the
        # first step anyway. The grouped table is persisted because
        # the factorized plan reads it from four subtrees.
        groups = (
            df.select(nm.alias("__nm"))
            .groupBy("__nm")
            .agg(F.count("*").alias("__c"))
            .withColumn("__blk", blk_of(F.col("__nm")))
            .persist(StorageLevel.MEMORY_AND_DISK)
        )
        tot_rows, n_names = groups.agg(
            F.sum("__c"), F.count(F.lit(1))
        ).first()
        if strategy == "factorize" or (
            tot_rows is not None and tot_rows >= dup_ratio * n_names
        ):
            return _factorized_pairs(df, id_col, nm, groups, max_edit, max_block)
        groups.unpersist()

    # Direct row-level path.
    blk = blk_of(nm)
    a = df.select(
        F.col(id_col).alias("id_a"), nm.alias("__na"), blk.alias("__blk")
    )
    b = df.select(
        F.col(id_col).alias("id_b"), nm.alias("__nb"), blk.alias("__blk")
    )
    if max_block is not None:
        hot = (
            a.groupBy("__blk")
            .agg(F.count("*").alias("__n"))
            .filter(F.col("__n") > max_block)
            .select("__blk")
        )
        a = a.join(F.broadcast(hot), "__blk", "left_anti")
        b = b.join(F.broadcast(hot), "__blk", "left_anti")
    # Verify via the 3-arg ``levenshtein(l, r, threshold)``: banded
    # O(len·k) with early exit (−1 past the threshold) instead of the
    # full O(len²) matrix. Round-6 A/B note: a |len(a)−len(b)| <=
    # max_edit prefilter (a valid Levenshtein lower bound) measured
    # 1.7× SLOWER here — the extra join-side columns and filter break
    # the joined stage's codegen for no selectivity on a name domain
    # whose lengths cluster tightly; the real cost driver is the
    # blocking contract's Σ|block|² candidate mass, which is what
    # ``max_block`` exists to bound.
    return (
        a.join(b, "__blk")
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn(
            "dist",
            F.levenshtein("__na", "__nb", int(max_edit)).cast("long"),
        )
        .filter((F.col("dist") >= 0) & (F.col("dist") <= max_edit))
        .select("id_a", "id_b", "dist")
    )


def _factorized_pairs(
    df: DataFrame,
    id_col: str,
    nm: Column,
    groups: DataFrame,
    max_edit: int,
    max_block: int | None,
) -> DataFrame:
    """Distinct-name expansion of the blocked verify. Exactly the
    direct join's row set, derived in three output-bounded pieces:

    1. hot-block guard over NAME GROUPS (block size = Σ group counts —
       identical to the direct row census, so the same blocks drop);
    2. levenshtein over distinct-name pairs sharing a block (names
       are distinct ⇒ dist ≥ 1; equal-name pairs are case 3);
    3. expansion: surviving name pairs × member ids (cross groups,
       ``least/greatest`` restores the id_a < id_b canon), plus the
       within-group all-pairs at dist 0 (equal names always share a
       block, so blocking never separates them).

    Each expansion join is bounded by the OUTPUT pair count — the
    irreducible cost of enumerating the answer — instead of the
    Σ|block|² candidate mass.
    """
    if max_block is not None:
        hot = (
            groups.groupBy("__blk")
            .agg(F.sum("__c").alias("__n"))
            .filter(F.col("__n") > max_block)
            .select("__blk")
        )
        groups = groups.join(F.broadcast(hot), "__blk", "left_anti")

    ids = df.select(F.col(id_col).alias("__id"), nm.alias("__nm"))

    # Cross-name: levenshtein on distinct names only, then expand.
    ga = groups.select(F.col("__nm").alias("__nm_a"), "__blk")
    gb = groups.select(F.col("__nm").alias("__nm_b"), "__blk")
    qual = (
        ga.join(gb, "__blk")
        .filter(F.col("__nm_a") < F.col("__nm_b"))
        .withColumn(
            "dist", F.levenshtein("__nm_a", "__nm_b", int(max_edit)).cast("long")
        )
        .filter(F.col("dist") >= 0)
        .select("__nm_a", "__nm_b", "dist")
    )
    e1 = ids.join(qual, ids["__nm"] == qual["__nm_a"]).select(
        F.col("__id").alias("__ia"), "__nm_b", "dist"
    )
    e2 = ids.select(F.col("__id").alias("__ib"), F.col("__nm").alias("__nmb"))
    cross = e1.join(e2, e1["__nm_b"] == e2["__nmb"]).select(
        F.least("__ia", "__ib").alias("id_a"),
        F.greatest("__ia", "__ib").alias("id_b"),
        "dist",
    )

    # Within-group (equal normalized names): all id pairs at dist 0.
    multi = groups.filter(F.col("__c") >= 2).select("__nm")
    member = ids.join(multi, "__nm", "left_semi")
    xa = member.select("__nm", F.col("__id").alias("id_a"))
    xb = member.select("__nm", F.col("__id").alias("id_b"))
    within = (
        xa.join(xb, "__nm")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", F.lit(0).cast("long").alias("dist"))
    )

    return cross.unionByName(within).select("id_a", "id_b", "dist")


def fuzzy_match_pairs_multipass(
    df: DataFrame,
    id_col: str,
    name_col: str,
    max_edit: int = 2,
    prefix: int = 4,
    len_band: int = 8,
    max_block: int | None = None,
    strategy: str = "auto",
) -> DataFrame:
    """Two-pass blocked fuzzy matching: the PREFIX block of
    ``fuzzy_match_pairs`` plus a second pass blocked on the name
    SUFFIX, unioned and de-duplicated. A single blocking key misses
    any pair that differs inside that key (an edit in the first
    ``prefix`` chars escapes the prefix block); multi-pass blocking
    with complementary keys is the standard recall fix (Christen
    2012, ch. 4) — a pair with ≤ ``max_edit`` edits clears at least
    one of the two keys unless its edits span BOTH ends of the name.

    Cost is two block joins (each guarded by ``max_block``) and one
    dropDuplicates on the (small) verified pair set.
    """
    first = fuzzy_match_pairs(
        df, id_col, name_col, max_edit, prefix, len_band, max_block, strategy
    )
    nm = normalize_text(name_col)

    def suffix_blk_of(col: Column) -> Column:
        return F.concat_ws(
            "|",
            F.substring(col, -prefix, prefix),
            F.floor(F.length(col) / len_band).cast("string"),
        )

    second = _blocked_pairs(
        df, id_col, nm, suffix_blk_of, max_edit, max_block, strategy
    )
    return first.unionByName(second).dropDuplicates(["id_a", "id_b"])


def decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str,
    text_col: str,
    shingle_size: int = 3,
    min_overlap: int = 1,
    mode: str = "flag",
) -> DataFrame:
    """Benchmark decontamination: find (or drop) corpus documents that
    share word n-grams with an evaluation/benchmark set — the standard
    guard against test-set leakage into a training corpus.

    Both sides shingle through the same normalizer
    (``textx.shingle_hashes``: distinct n-word shingles as 64-bit md5
    hashes). The benchmark side is collapsed to its distinct shingle
    set — tiny relative to the corpus (eval suites are MBs; corpora
    are TBs) — and broadcast, so the corpus-side inverted index
    streams map-side against it: zero corpus shuffle for the match,
    one small agg shuffle on doc_id for the per-document overlap
    count. The corpus shingle explode carries 8-byte hashes, not
    strings.

    ``mode="flag"`` returns (doc_id, n_hit) for documents with at
    least ``min_overlap`` distinct shingles in common with the
    benchmark; ``mode="clean"`` returns the corpus rows with those
    documents removed (broadcast anti-join on the flagged ids).
    """
    bench_sh = (
        benchmark.select(F.explode(shingle_hashes(text_col, shingle_size)).alias("__s"))
        .distinct()
    )
    inv = corpus.select(
        F.col(id_col).alias("doc_id"),
        F.explode(shingle_hashes(text_col, shingle_size)).alias("__s"),
    )
    hits = (
        inv.join(F.broadcast(bench_sh), "__s")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_hit"))
        .filter(F.col("n_hit") >= min_overlap)
    )
    if mode == "clean":
        return corpus.join(
            F.broadcast(hits.select(F.col("doc_id").alias(id_col))), id_col, "left_anti"
        )
    return hits


def incremental_dedup(
    batch: DataFrame,
    corpus: DataFrame,
    id_col: str,
    text_col: str,
    normalize: bool = True,
) -> DataFrame:
    """Dedup an incoming batch against an already-ingested corpus —
    the continuous-ingest shape: every new crawl/delivery must drop
    (a) its own internal duplicates and (b) anything the corpus
    already holds, without ever rewriting the corpus.

    Both gates key on the content digest, never the text: the batch
    dedups internally with a min-id window (one shuffle on the
    16-byte digest), then anti-joins the corpus's digest *projection*
    — the corpus scan prunes to the single text column it needs to
    hash, and only digests shuffle. At 100 TB the right deployment
    stores the corpus digest set as its own bucketed table (one
    16-byte column, bucketed by digest) so the anti-join co-locates
    with zero corpus-side exchange; this operator takes any corpus
    DataFrame and lets AQE pick sort-merge vs broadcast by the
    digest-set size.
    """
    content = (
        normalize_text(text_col) if normalize else F.col(text_col)
    )
    fresh = exact_dedup(batch, id_col, text_col, normalize=normalize)
    seen = corpus.select(F.md5(content).alias("__digest")).distinct()
    return (
        fresh.withColumn("__digest", F.md5(content))
        .join(seen, "__digest", "left_anti")
        .drop("__digest")
    )


# ---------------------------------------------------------------------------
# Bloom-pruned incremental dedup (broadcast-bitmap membership join)
# ---------------------------------------------------------------------------

def _bloom_probes(digest: Column, m_bits: int, k: int) -> list[Column]:
    """k deterministic probe positions in [0, m_bits): the first 12 hex
    chars (48 bits) of md5(digest ':' i) mod m — portable (identical in
    any engine with md5+conv) and independent per probe."""
    return [
        F.conv(
            F.substring(F.md5(F.concat(digest, F.lit(f":{i}"))), 1, 12), 16, 10
        ).cast("long")
        % F.lit(m_bits)
        for i in range(k)
    ]


def bloom_build(
    digests: DataFrame, digest_col: str, m_bits: int, k: int = 7
) -> DataFrame:
    """Build a Bloom filter OF the digest set AS a DataFrame:
    ``(word_id, bits)`` — bit p lives in word ``p div 64``. The build is
    one ``bit_or`` aggregation with map-side partial combine (never a
    driver-side bitmap): each corpus partition ORs its own probe bits,
    and only ≤ m/64 sparse words shuffle. At ~10 bits/element the word
    table is an order of magnitude smaller than the digest set itself,
    which is what makes it broadcastable when the digest set is not."""
    probes = F.array(*_bloom_probes(F.col(digest_col), m_bits, k))
    pos = digests.select(F.explode(probes).alias("__p"))
    # shiftleft with a COLUMN shift count is SQL-only (the pyspark
    # wrapper insists on an int literal)
    mask = F.expr("shiftleft(CAST(1 AS BIGINT), CAST(__p % 64 AS INT))")
    return pos.groupBy(F.expr("__p div 64").alias("word_id")).agg(
        F.bit_or(mask).alias("bits")
    )


def bloom_maybe_contains(
    df: DataFrame, digest_col: str, words: DataFrame, m_bits: int, k: int = 7
) -> DataFrame:
    """Adds ``__maybe`` — true iff every probe bit is set (the classic
    no-false-negative membership test). The probe is a broadcast
    equi-join on word_id plus a bitwise AND: no UDF, no driver data
    path, whole-stage codegen throughout.

    NULL digests (null-text rows) can't be bloom members — they get
    ``__maybe = false`` directly rather than flowing through the
    equi-join, where NULL = NULL would silently DROP them (the bloom
    variant must keep row-for-row parity with ``incremental_dedup``,
    whose anti-join keeps null keys)."""
    null_part = df.filter(F.col(digest_col).isNull()).withColumn(
        "__maybe", F.lit(False)
    )
    df = df.filter(F.col(digest_col).isNotNull())
    probes = F.array(*_bloom_probes(F.col(digest_col), m_bits, k))
    exploded = df.select(
        F.col(digest_col), F.posexplode(probes).alias("__i", "__p")
    ).select(
        digest_col,
        F.expr("__p div 64").alias("word_id"),
        F.expr("shiftleft(CAST(1 AS BIGINT), CAST(__p % 64 AS INT))").alias("__mask"),
    )
    hits = (
        exploded.join(F.broadcast(words), "word_id", "left")
        .withColumn(
            "__hit",
            F.coalesce(F.col("bits").bitwiseAND(F.col("__mask")) != 0, F.lit(False)),
        )
        .groupBy(digest_col)
        .agg(F.min("__hit").alias("__maybe"))
    )
    return df.join(hits, digest_col).unionByName(null_part)


def incremental_dedup_bloom(
    batch: DataFrame,
    corpus: DataFrame,
    id_col: str,
    text_col: str,
    normalize: bool = True,
    m_bits: int = 1 << 20,
    k: int = 7,
) -> DataFrame:
    """`incremental_dedup` with a Bloom pre-filter: identical output
    (the filter only PRUNES the anti-join's probe side — false
    positives are re-checked exactly, false negatives cannot occur),
    but rows the corpus has definitely never seen skip the corpus
    anti-join entirely.

    Why it matters at 100 TB: a daily batch anti-joining a petabyte
    corpus digest set pays a massive shuffle even when overlap is ~0.
    The word table costs ~``m_bits/8`` bytes broadcast (size m at ~10
    bits per corpus element for ~1% false positives) and cuts the
    anti-join input to (overlap + fp·batch) rows. Both arms reuse one
    persisted digest projection; the corpus digest scan still prunes
    to the text column only.
    """
    content = normalize_text(text_col) if normalize else F.col(text_col)
    fresh = (
        exact_dedup(batch, id_col, text_col, normalize=normalize)
        .withColumn("__digest", F.md5(content))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    seen = corpus.select(F.md5(content).alias("__digest")).distinct()
    words = bloom_build(seen, "__digest", m_bits, k)
    flagged = bloom_maybe_contains(fresh, "__digest", words, m_bits, k).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    definitely_new = flagged.filter(~F.col("__maybe"))
    rechecked = flagged.filter(F.col("__maybe")).join(
        seen, "__digest", "left_anti"
    )
    return definitely_new.unionByName(rechecked).drop("__digest", "__maybe")


__all__ = [
    "exact_dedup", "paragraph_dedup", "boilerplate_strip",
    "minhash_signature", "minhash_candidate_pairs",
    "minhash_dedup", "ngram_jaccard_pairs", "simhash64", "simhash_near_pairs",
    "connected_components", "dedup_by_clusters", "decontaminate",
    "incremental_dedup", "bloom_build", "bloom_maybe_contains",
    "incremental_dedup_bloom",
]
