"""Text analysis operators: language ID, quality scoring, token
counting, document fingerprinting.

All pure Catalyst expressions over the ``documents`` table — each is a
map-side projection (zero shuffle), so they pipeline with any
downstream filter/dedup at 100 TB. Every function here has an exact
ANSI-SQL twin (used as the DuckDB oracle) because the heuristics are
deliberately arithmetic: token filters + ratios, no model inference.
"""

from __future__ import annotations

import re as _re

import numpy as np
import pandas as pd

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from harmony_energy_data_pipeline_spark.functions.textx import normalize_text, tokens
from harmony_energy_data_pipeline_spark.io import local_relation

# Tiny per-language stopword lists — an n-gram/stopword-hit heuristic,
# not a trained model (deterministic and SQL-expressible by design).
STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "it", "that", "for"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "zu", "mit", "den"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "es", "se", "no"],
    "fr": ["le", "la", "de", "et", "un", "est", "que", "pour", "dans", "ce"],
}


def token_count(text_col: Column | str) -> Column:
    """Whitespace token count (0 for empty/blank)."""
    t = tokens(text_col)
    return F.size(t)


def bpe_ish_token_count(text_col: Column | str) -> Column:
    """BPE-flavored proxy token count: word pieces ≈ ceil(len(word)/4)
    summed over words — a deterministic stand-in for a real tokenizer
    (which would be a pandas UDF; this keeps the hot path JVM-side)."""
    t = tokens(text_col)
    return F.aggregate(
        t,
        F.lit(0).cast("long"),
        lambda acc, w: acc + F.ceil(F.length(w) / F.lit(4.0)).cast("long"),
    )


def stopword_hits(text_col: Column | str, lang: str) -> Column:
    """Count of tokens (non-distinct) in the language's stopword list."""
    t = tokens(text_col)
    sw = F.lit(STOPWORDS[lang]).cast("array<string>")
    return F.size(F.filter(t, lambda x: F.array_contains(sw, x)))


def detect_language(text_col: Column | str, min_ratio: float = 0.03) -> Column:
    """Language with the highest stopword-hit ratio; 'und' if the best
    ratio is below ``min_ratio``. Deterministic tiebreak: language
    list order (en, de, es, fr) — a greatest-hits argmax via a chained
    CASE WHEN, identical in the SQL oracle."""
    n = token_count(text_col)
    ratios = {
        lang: F.when(n > 0, stopword_hits(text_col, lang).cast("double") / n.cast("double")).otherwise(F.lit(0.0))
        for lang in STOPWORDS
    }
    langs = list(STOPWORDS)
    best = F.greatest(*[ratios[lang] for lang in langs])
    out = F.lit("und")
    # Build the argmax back-to-front so earlier languages win ties.
    for lang in reversed(langs):
        out = F.when((best >= F.lit(min_ratio)) & (ratios[lang] == best), F.lit(lang)).otherwise(out)
    return out


def punct_ratio(text_col: Column | str) -> Column:
    """Non-alphanumeric, non-space chars / total chars (0 for empty)."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    total = F.length(c)
    punct = total - F.length(F.regexp_replace(c, r"[^a-zA-Z0-9\s]", ""))
    return F.when(total > 0, punct.cast("double") / total.cast("double")).otherwise(F.lit(0.0))


def mean_word_length(text_col: Column | str) -> Column:
    t = tokens(text_col)
    total = F.aggregate(t, F.lit(0).cast("long"), lambda acc, w: acc + F.length(w))
    return F.when(F.size(t) > 0, total.cast("double") / F.size(t).cast("double")).otherwise(F.lit(0.0))


def quality_score(text_col: Column | str) -> Column:
    """Heuristic quality in [0,1]: rewards reasonable length and
    stopword density, penalizes punctuation soup and degenerate word
    lengths — the classic cheap pre-filter before expensive pipeline
    stages (ratios per Gopher/C4-style rules, arithmetic only)."""
    n = token_count(text_col)
    length_term = F.least(n.cast("double") / F.lit(50.0), F.lit(1.0))
    sw = F.when(n > 0, stopword_hits(text_col, "en").cast("double") / n.cast("double")).otherwise(F.lit(0.0))
    stop_term = F.least(sw * F.lit(10.0), F.lit(1.0))
    punct_term = F.lit(1.0) - F.least(punct_ratio(text_col) * F.lit(5.0), F.lit(1.0))
    mwl = mean_word_length(text_col)
    word_term = F.when((mwl >= 2.0) & (mwl <= 12.0), F.lit(1.0)).otherwise(F.lit(0.0))
    return (length_term + stop_term + punct_term + word_term) / F.lit(4.0)


def fingerprint(text_col: Column | str) -> Column:
    """Deterministic content fingerprint: md5 of the normalized text.
    (md5 rather than xxhash64 so the DuckDB oracle can reproduce it.)"""
    return F.md5(normalize_text(text_col))


def winnowing_fingerprints(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 5,
    window: int = 4,
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken,
    SIGMOD'03): rolling Rabin-Karp hashes over character k-grams of
    the normalized text; from every ``window`` consecutive hashes keep
    the minimum (rightmost on ties). Output: (id, fingerprint) pairs —
    the selected hash set is a position-robust local signature (shared
    fingerprints locate copied PASSAGES, where whole-document digests
    only catch exact dupes).

    Arrow-batched pandas UDF with a fully VECTORIZED row kernel
    (round 6 — the first form ran a per-character Python loop, ~4 s
    at sf0.1): the k-gram hash mod M = 2⁶¹−1 is a sum of k per-
    position lookup-table terms ``T_p[c] = c·B^p mod M`` (normalized
    text is ASCII, so tables are 128-wide); each term is < M, so up
    to 7 terms accumulate in uint64 without overflow (7·M < 2⁶⁴) —
    larger k folds ``% M`` into the accumulation every 7 terms. The
    residue is identical to the rolling-recurrence canonical value.
    Window minima (rightmost on ties) come from one
    ``sliding_window_view`` argmin. Map-side until the final explode.
    """
    import re

    norm_re = re.compile(r"[^a-z0-9]+")
    B, M = 257, (1 << 61) - 1
    # T[j][c] = c · B^(k-1-j) mod M — term of the j-th k-gram char
    T = np.stack([
        np.array([(c * pow(B, k - 1 - j, M)) % M for c in range(128)],
                 dtype=np.uint64)
        for j in range(k)
    ])
    M_u = np.uint64(M)

    @F.pandas_udf("array<long>")
    def _fps(texts: pd.Series) -> pd.Series:
        out = []
        for txt in texts:
            if txt is None:
                out.append(None)
                continue
            s = norm_re.sub(" ", txt.lower()).strip()
            n = len(s)
            if n < k:
                out.append(np.array([], dtype=np.int64))
                continue
            arr = np.frombuffer(s.encode("ascii"), dtype=np.uint8)
            m = n - k + 1
            acc = np.zeros(m, dtype=np.uint64)
            for j in range(k):
                acc += T[j][arr[j:j + m]]
                if (j + 1) % 7 == 0:
                    acc %= M_u
            hashes = (acc % M_u).astype(np.int64)
            if len(hashes) <= window:
                out.append(np.unique(hashes.min(keepdims=True)))
                continue
            # winnowing: min of each window, rightmost on ties —
            # argmin over the reversed window axis
            wins = np.lib.stride_tricks.sliding_window_view(hashes, window)
            idx = window - 1 - np.argmin(wins[:, ::-1], axis=1)
            sel = np.unique(idx + np.arange(len(wins)))
            out.append(np.unique(hashes[sel]))
        return pd.Series(out)

    # pure, but marked non-deterministic so the explode-inferred
    # `size(__fps)>0` filter can't be pushed below the projection and
    # re-run the fingerprint kernel twice per row (guide §4.4)
    fps = _fps.asNondeterministic()
    return (
        df.select(F.col(id_col), fps(F.col(text_col)).alias("__fps"))
        .select(F.col(id_col), F.explode("__fps").alias("fingerprint"))
    )


def text_stats(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """One-pass per-document stats projection (expression form — each
    stat recomputes the token array; fine for a few stats, see
    ``text_stats_full`` for the all-stats hot path)."""
    return df.select(
        F.col(id_col),
        F.length(F.col(text_col)).alias("n_chars_raw"),
        token_count(text_col).alias("n_tokens"),
        bpe_ish_token_count(text_col).alias("n_tokens_bpe"),
        mean_word_length(text_col).alias("mean_word_len"),
        punct_ratio(text_col).alias("punct_ratio"),
        detect_language(text_col).alias("lang_detected"),
        quality_score(text_col).alias("quality"),
        fingerprint(text_col).alias("fingerprint"),
    )


def text_stats_full(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """All per-document stats in ONE Arrow-batched pass (mapInPandas).

    Value-identical to the expression builders above (same IEEE op
    order, same ASCII-range regexes as the Java forms), but tokens are
    computed once per row instead of once per stat — the expression
    form pays ~10 interpreted higher-order-function passes per row
    (HOFs don't codegen). Only (id, text) ship to Python.
    """
    import hashlib
    import math
    import re

    import pandas as pd

    norm_re = re.compile(r"[^a-z0-9]+")
    # explicit ASCII class: Java's \s is ASCII-only, Python's is not
    punct_re = re.compile(r"[^a-zA-Z0-9 \t\n\x0b\f\r]")
    stopsets = {lang: frozenset(ws) for lang, ws in STOPWORDS.items()}
    langs = list(STOPWORDS)

    def run(batches):
        for pdf in batches:
            rows = []
            for _id, txt in zip(pdf[id_col], pdf[text_col]):
                if txt is None:
                    rows.append((_id,) + (None,) * 9)
                    continue
                norm = norm_re.sub(" ", txt.lower()).strip()
                toks = norm.split(" ") if norm else []
                n = len(toks)
                sum_len = sum(len(w) for w in toks)
                bpe = sum(math.ceil(len(w) / 4.0) for w in toks)
                mwl = sum_len / n if n else 0.0
                n_chars = len(txt)
                p_cnt = n_chars - len(punct_re.sub("", txt))
                p_ratio = p_cnt / n_chars if n_chars else 0.0
                ratios = [
                    (sum(1 for w in toks if w in stopsets[lang]) / n if n else 0.0)
                    for lang in langs
                ]
                best = max(ratios)
                lang = "und"
                if best >= 0.03:
                    lang = langs[ratios.index(best)]
                quality = (
                    min(n / 50.0, 1.0)
                    + min(ratios[0] * 10.0, 1.0)
                    + (1.0 - min(p_ratio * 5.0, 1.0))
                    + (1.0 if 2.0 <= mwl <= 12.0 else 0.0)
                ) / 4.0
                rows.append((
                    _id, n_chars, n, bpe, mwl, p_ratio, ratios[0], lang,
                    quality, hashlib.md5(norm.encode()).hexdigest(),
                ))
            yield pd.DataFrame(
                rows,
                columns=[
                    id_col, "n_chars_raw", "n_tokens", "n_tokens_bpe",
                    "mean_word_len", "punct_ratio", "en_stopword_ratio",
                    "lang_detected", "quality", "fingerprint",
                ],
            )

    schema = (
        f"{id_col} long, n_chars_raw long, n_tokens long, n_tokens_bpe long, "
        "mean_word_len double, punct_ratio double, en_stopword_ratio double, "
        "lang_detected string, quality double, fingerprint string"
    )
    return df.select(F.col(id_col), F.col(text_col)).mapInPandas(run, schema)


def clean_corpus(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    lang: str = "en",
    min_quality: float = 0.5,
    min_tokens: int = 5,
    max_tokens: int = 1000,
) -> DataFrame:
    """End-to-end training-corpus cleaning: language gate → quality
    gate → token-length bounds → exact dedup (keep-smallest-id on the
    normalized-content fingerprint).

    Output: one row per surviving document with its stats
    (``text_stats_full`` columns). All stats come from the single
    Arrow pass, so the whole chain is one map stage plus the one
    fingerprint shuffle for dedup — the shape that matters at corpus
    scale (filters run BEFORE the shuffle, so only survivors move).

    The quality threshold compares the 6-dp rounded score, mirroring
    the engine's oracle convention (raw doubles match bit-exactly
    across engines only when expression shapes are identical; rounding
    makes the gate robust to reordering).
    """
    stats = text_stats_full(df, id_col, text_col)
    kept = stats.filter(
        (F.col("lang_detected") == lang)
        & (F.round("quality", 6) >= min_quality)
        & F.col("n_tokens").between(min_tokens, max_tokens)
    )
    w = Window.partitionBy("fingerprint").orderBy(F.col(id_col).asc())
    return (
        kept.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def _doc_tokens(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(doc_id, token) pairs — one row per token occurrence.

    Map-side explode (no shuffle); empty/whitespace-only documents
    contribute no rows, matching ``string_split`` + ``<> ''`` in SQL.
    """
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(tokens(F.col(text_col))).alias("token"),
    ).filter(F.col("token") != "")


def vocabulary(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Corpus vocabulary: per token, total occurrences (``term_freq``)
    and number of distinct documents containing it (``doc_freq``).

    One shuffle on (doc_id, token) collapses duplicates map-side, then
    the token-level agg derives both frequencies from the collapsed
    rows — cheaper than a ``count_distinct`` over raw occurrences at
    corpus scale (the heavy stream is pre-reduced before the second,
    token-keyed shuffle).
    """
    per_doc = (
        _doc_tokens(df, id_col, text_col)
        .groupBy("doc_id", "token")
        .agg(F.count("*").alias("__tf"))
    )
    return per_doc.groupBy("token").agg(
        F.sum("__tf").alias("term_freq"),
        F.count("*").alias("doc_freq"),
    )


def tf_idf(
    df: DataFrame,
    id_col: str,
    text_col: str,
    score: "callable | None" = None,
) -> DataFrame:
    """Per-(document, token) tf-idf: columns ``doc_id, token, tf, df,
    score``.

    ``score(tf, df, n_docs)`` defaults to ``tf * ln((n+1)/(df+1))``
    (smoothed idf). Pass a custom callable for e.g. a rational idf when
    bit-exact cross-engine determinism matters (``ln`` may differ in
    the last ulp between libm implementations).

    Shape at scale: tf is one shuffle on (doc, token); doc-frequency is
    a token-keyed agg of the *already collapsed* tf rows joined back on
    token; the corpus size joins in as a broadcast 1-row cross join —
    no driver collect.
    """
    if score is None:
        def score(tf, dfreq, n):  # noqa: ANN001 - Column arithmetic
            return tf.cast("double") * F.log((n.cast("double") + 1.0) / (dfreq.cast("double") + 1.0))

    tf = (
        _doc_tokens(df, id_col, text_col)
        .groupBy("doc_id", "token")
        .agg(F.count("*").alias("tf"))
    )
    dfreq = tf.groupBy("token").agg(F.count("*").alias("df"))
    n = df.agg(F.count("*").alias("n_docs"))
    return (
        tf.join(dfreq, "token")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "token",
            "tf",
            "df",
            score(F.col("tf"), F.col("df"), F.col("n_docs")).alias("score"),
        )
    )


# Deliberately simple, cross-dialect-safe patterns (char classes and
# bounded quantifiers only — identical semantics in Java regex and
# DuckDB's RE2, so the redaction is oracle-checkable).
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "phone": r"\+?[0-9]{1,3}[-. ][0-9]{3}[-. ][0-9]{3,4}[-. ]?[0-9]{0,4}",
    "ipv4": r"[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}",
}


def wordpiece_udf(vocab: list[str], unk: str = "[UNK]"):
    """Arrow-vectorized greedy WordPiece tokenizer over a broadcast
    vocabulary (Wu et al. 2016, arXiv:1609.08144 — BERT's subword
    scheme): per word, repeatedly take the LONGEST vocab piece that
    matches at the cursor; continuation pieces carry the ``##``
    prefix; a word with no match at some cursor becomes one ``unk``.

    Returns a ``pandas_udf`` mapping a word column to its
    ``array<string>`` of pieces. Per-position greedy matching is a
    data-dependent loop — the legitimate pandas-UDF case (HOFs can't
    express it, and they don't codegen anyway); matching itself is
    O(max_piece_len) set probes per emitted piece, and at a given
    cursor the longest match is UNIQUE (the substring determines the
    piece), so the greedy result is deterministic on any engine.
    """
    import pandas as pd

    start = {p for p in vocab if not p.startswith("##")}
    cont = {p[2:] for p in vocab if p.startswith("##")}
    max_start = max((len(p) for p in start), default=0)
    max_cont = max((len(p) for p in cont), default=0)

    def split_word(w: str) -> list[str]:
        out: list[str] = []
        off = 0
        n = len(w)
        while off < n:
            table, cap, pre = (
                (start, max_start, "") if off == 0 else (cont, max_cont, "##")
            )
            match = None
            for adv in range(min(cap, n - off), 0, -1):
                sub = w[off : off + adv]
                if sub in table:
                    match = (sub, adv)
                    break
            if match is None:
                return [unk]
            out.append(pre + match[0])
            off += match[1]
        return out

    @F.pandas_udf("array<string>")
    def pieces(words: pd.Series) -> pd.Series:
        cache: dict[str, list[str]] = {}

        def lookup(w: str) -> list[str]:
            # NOT setdefault(w, split_word(w)): that would evaluate the
            # split eagerly on every occurrence and void the memo
            if w not in cache:
                cache[w] = split_word(w)
            return cache[w]

        return words.map(lookup)

    # pure function, but marked non-deterministic so the optimizer
    # cannot push the explode-inferred `size(pieces)>0` filter below
    # the distinct-word aggregation — that pushdown re-evaluated the
    # UDF on every corpus OCCURRENCE (ArrowEvalPython below the word
    # agg) instead of once per distinct word (guide §4.4; the whole
    # point of the |vocab|-not-|corpus| design)
    return pieces.asNondeterministic()


def wordpiece_token_counts(
    df: DataFrame,
    id_col: str,
    text_col: str,
    vocab: list[str],
    unk: str = "[UNK]",
) -> DataFrame:
    """Corpus-wide subword histogram: ``(piece, n)`` — total
    occurrences of each WordPiece across all documents.

    Scale shape: tokenization runs over DISTINCT words only (natural
    language vocabularies are millions of words vs trillions of
    occurrences), then the per-word piece lists explode and join back
    to the word occurrence counts — the expensive Python loop touches
    |vocabulary| rows, not |corpus| rows. Two shuffles (word agg,
    piece agg); the UDF additionally memoizes within each Arrow batch.
    """
    words = (
        _doc_tokens(df, id_col, text_col)
        .groupBy("token")
        .agg(F.count("*").alias("__n"))
    )
    pieces = wordpiece_udf(vocab, unk)
    return (
        words.withColumn("__p", pieces(F.col("token")))
        .select(F.explode("__p").alias("piece"), "__n")
        .groupBy("piece")
        .agg(F.sum("__n").cast("long").alias("n"))
    )


def wordpiece_tokenize_docs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    vocab: list[str],
    unk: str = "[UNK]",
    broadcast_words: bool = True,
) -> DataFrame:
    """Per-document subword stream: ``(doc_id, widx, pidx, piece)`` —
    word index and piece-within-word index give the loader a total
    order.

    Scale shape: the Python UDF tokenizes the DISTINCT-word table
    only (same first stage as ``wordpiece_token_counts`` — natural
    language vocabularies are millions of words vs trillions of
    occurrences), then the piece lists equi-join back onto the
    exploded occurrence stream. With ``broadcast_words`` (default)
    the word→pieces map rides a broadcast, so the corpus side stays
    entirely map-side — the per-occurrence cost is a hash probe, not
    a Python call. Set ``broadcast_words=False`` for vocabularies too
    large for executor memory (a shuffle join on the word key).

    Use ``wordpiece_token_counts`` when only the histogram is needed.
    """
    pieces = wordpiece_udf(vocab, unk)
    toks = df.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(tokens(F.col(text_col))).alias("widx", "__w"),
    ).filter(F.col("__w") != "")
    word_pieces = toks.select("__w").distinct().select(
        "__w", pieces(F.col("__w")).alias("__p")
    )
    if broadcast_words:
        word_pieces = F.broadcast(word_pieces)
    # posexplode_OUTER: the piece list is never empty (split_word
    # yields >=1 piece), so outer is semantically identical — but the
    # plain explode lets Catalyst infer `size(__p)>0` and push a
    # UDF-evaluating filter BELOW the distinct, which would re-run the
    # tokenizer per occurrence (the exact cost this join removes)
    return toks.join(word_pieces, "__w").select(
        "doc_id", "widx", F.posexplode_outer("__p").alias("pidx", "piece")
    )


def unigram_nll(
    df: DataFrame,
    id_col: str,
    text_col: str,
    quantum: int = 1_000_000,
) -> DataFrame:
    """Per-document unigram-LM negative log-likelihood — the
    perplexity-style quality signal of CCNet (Wenzek et al. 2020,
    arXiv:1911.00359) and the Gopher filters, with the unigram model
    trained on the corpus itself: ``p(tok) = tf/total`` over all
    token occurrences, document score = mean ``-ln p(tok)``. High NLL
    = improbable token stream (gibberish, boilerplate soup); low =
    repetitive/common text. Output: (doc_id, n_tokens, nll).

    Exactness: per-token log-probs are quantized to integer
    MICRO-NATS (``round(ln(tf/total)·10⁶)``), so the per-document
    aggregation is exact integer arithmetic on any engine and only
    one rounded division produces the final double.

    Shape at scale: token tf is one (token)-keyed agg over rows
    already collapsed per (doc, token); the corpus total joins in as
    a broadcast 1-row cross join (no driver collect); scoring joins
    doc-tokens to the vocab on token (broadcastable for bounded
    vocabularies) and re-aggregates per document.
    """
    per_doc = (
        _doc_tokens(df, id_col, text_col)
        .groupBy("doc_id", "token")
        .agg(F.count("*").alias("__tf"))
    )
    vocab = per_doc.groupBy("token").agg(F.sum("__tf").alias("__cf"))
    total = vocab.agg(F.sum("__cf").alias("__total"))
    li = F.round(
        F.log(F.col("__cf").cast("double") / F.col("__total").cast("double"))
        * F.lit(float(quantum))
    ).cast("long")
    scored = (
        per_doc.join(vocab, "token")
        .crossJoin(F.broadcast(total))
        .select("doc_id", "__tf", li.alias("__li"))
    )
    return scored.groupBy("doc_id").agg(
        F.sum("__tf").cast("long").alias("n_tokens"),
        (
            -F.sum(F.col("__li") * F.col("__tf")).cast("double")
            / (F.lit(float(quantum)) * F.sum("__tf").cast("double"))
        ).alias("nll"),
    )


def hashed_linear_score(
    text_col: Column | str,
    salt: str = "qw",
    resolution: int = 1000,
) -> Column:
    """fastText-style linear quality classifier over HASHED token
    features (Joulin et al. 2016, arXiv:1607.01759 — the model family
    behind CCNet/RedPajama quality filters): each token maps to an
    integer weight in [-resolution, +resolution] derived from
    ``md5(salt:token)``, the document logit is the mean token weight
    (÷resolution), and the score is ``sigmoid(logit)``.

    The md5-derived weight table is a deterministic stand-in for
    learned weights (production swaps in a broadcast map-lookup of a
    trained vector; the plumbing — tokenize, per-token weight, mean,
    sigmoid — is identical). Everything is a Catalyst expression: the
    per-token fold is exact INTEGER arithmetic, so engines agree
    bit-for-bit up to the single final sigmoid. Empty documents score
    sigmoid(0) = 0.5.
    """
    total = hashed_linear_total(text_col, salt, resolution)
    n = F.size(tokens(text_col))
    logit = F.when(n > 0, total.cast("double") / (n * F.lit(float(resolution)))).otherwise(
        F.lit(0.0)
    )
    return F.lit(1.0) / (F.lit(1.0) + F.exp(-logit))


def hashed_linear_total(
    text_col: Column | str,
    salt: str = "qw",
    resolution: int = 1000,
) -> Column:
    """The exact-integer logit numerator of ``hashed_linear_score``
    (sum of token weights). ``total >= 0 ⇔ score >= 0.5``, so keep
    decisions can be made on integers — no float boundary."""
    span = 2 * resolution + 1

    def wt(tk: Column) -> Column:
        h = F.conv(
            F.substring(F.md5(F.concat_ws(":", F.lit(salt), tk)), 1, 15), 16, 10
        ).cast("long")
        return h % span - resolution

    return F.aggregate(
        tokens(text_col), F.lit(0).cast("long"), lambda acc, tk: acc + wt(tk)
    )


def hashed_linear_outputs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    salt: str = "qw",
    resolution: int = 1000,
) -> DataFrame:
    """``(id, score, keep)`` with the md5-per-token fold evaluated
    ONCE per row.

    ``hashed_linear_score`` + ``hashed_linear_total`` composed in one
    projection evaluate the fold twice and the tokenizer five times:
    the two Column builders produce independent lambda trees, so
    neither codegen CSE (higher-order functions are interpreted) nor
    subexpression elimination (the lambda variable ids differ)
    unifies them. Staging the token array and the fold through
    intermediate projections pins single evaluation — CollapseProject
    keeps a non-cheap alias that is referenced more than once
    (SPARK-36718), so the layers survive optimization. Values are
    bit-identical to the Column builders (same expression shapes).
    """
    span = 2 * resolution + 1

    def wt(tk: Column) -> Column:
        h = F.conv(
            F.substring(F.md5(F.concat_ws(":", F.lit(salt), tk)), 1, 15), 16, 10
        ).cast("long")
        return h % span - resolution

    # stage the normalized string too: ``tokens()`` references it
    # twice (empty-check + split), which would run the regex twice
    nrm = df.select(F.col(id_col), normalize_text(text_col).alias("__norm"))
    t = nrm.select(
        F.col(id_col),
        F.when(F.col("__norm") == "", F.array().cast("array<string>"))
        .otherwise(F.split("__norm", " "))
        .alias("__toks"),
    )
    s = t.select(
        id_col,
        F.aggregate(
            F.col("__toks"), F.lit(0).cast("long"), lambda acc, tk: acc + wt(tk)
        ).alias("__total"),
        F.size("__toks").alias("__n"),
    )
    logit = F.when(
        F.col("__n") > 0,
        F.col("__total").cast("double") / (F.col("__n") * F.lit(float(resolution))),
    ).otherwise(F.lit(0.0))
    score = F.lit(1.0) / (F.lit(1.0) + F.exp(-logit))
    return s.select(
        id_col, score.alias("score"), (F.col("__total") >= 0).alias("keep")
    )


def redact_pii(
    df: DataFrame,
    id_col: str,
    text_col: str,
    patterns: dict[str, str] | None = None,
) -> DataFrame:
    """PII scrubbing for training corpora: replace each pattern class
    with a ``<CLASS>`` tag and count the redactions per class.

    Output: (id, redacted text, n_<class> counts). Pure Catalyst
    regexp expressions — map-side, zero shuffle, codegen'd; the count
    is (len − len(after-removal)) / avg-match-len-free via a
    split-based occurrence count (size(split(text, pat)) − 1), which
    is dialect-portable.

    Classes apply in dict order; later patterns see earlier tags (so
    e.g. phone patterns can't re-match inside an ``<EMAIL>`` tag).
    """
    patterns = PII_PATTERNS if patterns is None else patterns
    out = df.select(F.col(id_col), F.col(text_col))
    redacted = F.col(text_col)
    counts = []
    for name, pat in patterns.items():
        counts.append(
            (F.size(F.split(redacted, pat)) - 1).cast("long").alias(f"n_{name}")
        )
        redacted = F.regexp_replace(redacted, pat, f"<{name.upper()}>")
    return out.select(
        F.col(id_col), *counts, redacted.alias("redacted")
    )


def repetition_ratio(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 2,
) -> DataFrame:
    """Repetition quality signal: fraction of duplicated word n-grams,
    ``1 − distinct/total`` (0 = no repetition; → 1 for loop spam).
    The classic Gopher-style rep filter.

    Round 6: Arrow-batched pandas UDF, replacing the interpreted
    higher-order-function form the first full-surface bench caught at
    11.4 s for 60k docs (per-gram ``slice``+``concat_ws`` lambdas run
    on the interpreted expression path — the same finding as the
    shingle/minhash family, README "Declarative first" caveat).
    Tokenization replicates :func:`functions.textx.tokens` exactly
    (lowercase, collapse non-alphanumerics, split), the ratio is the
    same float64 arithmetic, and the 6-decimal rounding stays in
    Spark so the DuckDB oracle remains bit-identical. Still a
    map-side projection — zero shuffle.

    Output: (id, n_ngrams, rep_ratio) — docs shorter than n tokens
    have 0 n-grams and ratio 0.0.
    """
    nonword = _re.compile(r"[^a-z0-9]+")

    @F.pandas_udf("struct<n_ngrams: long, rep_raw: double>")
    def _rep(texts: pd.Series) -> pd.DataFrame:
        totals = np.zeros(len(texts), dtype=np.int64)
        raws = np.zeros(len(texts), dtype=np.float64)
        for j, txt in enumerate(texts):
            if txt is None:
                continue
            toks = nonword.sub(" ", txt.lower()).split()
            total = len(toks) - n + 1
            if total <= 0:
                continue
            grams = {tuple(toks[i:i + n]) for i in range(total)}
            totals[j] = total
            raws[j] = 1.0 - len(grams) / total
        return pd.DataFrame({"n_ngrams": totals, "rep_raw": raws})

    c = F.col(text_col) if isinstance(text_col, str) else text_col
    return df.select(F.col(id_col), _rep(c).alias("__r")).select(
        F.col(id_col),
        F.col("__r.n_ngrams").alias("n_ngrams"),
        F.round(F.col("__r.rep_raw"), 6).alias("rep_ratio"),
    )


def url_domain_stats(
    df: DataFrame,
    id_col: str,
    text_col: str,
) -> DataFrame:
    """Corpus-level URL domain frequency: extract every http(s) URL,
    reduce to its registrable host, count docs per domain.

    Output: (domain, n_docs, n_urls). One explode + one agg shuffle on
    the (short) domain string; extraction is JVM regexp on the scan.
    """
    urls = F.expr(
        rf"regexp_extract_all({text_col}, 'https?://([A-Za-z0-9.-]+)', 1)"
    )
    ex = df.select(F.col(id_col).alias("doc_id"), F.explode(urls).alias("domain"))
    return ex.groupBy("domain").agg(
        F.count_distinct("doc_id").alias("n_docs"),
        F.count("*").alias("n_urls"),
    )


def chunk_documents(
    df: DataFrame,
    id_col: str,
    text_col: str,
    chunk_size: int = 64,
    stride: int = 48,
) -> DataFrame:
    """Sliding-window document chunking: split each document into
    token windows of ``chunk_size`` words advancing by ``stride``
    (overlap = chunk_size − stride), the standard pre-tokenization
    step before packing a training corpus into fixed-length sequences.

    Chunk i covers tokens [i·stride+1, i·stride+chunk_size]; a
    document with n tokens yields 1 chunk if n ≤ chunk_size, else
    ⌊(n − chunk_size + stride − 1) / stride⌋ + 1, so the final
    (possibly short) tail is always emitted and every token lands in
    ≥1 chunk. Empty documents yield no chunks.

    Scale shape: pure Catalyst — tokenize (JVM regexp) → one
    ``explode(sequence(...))`` per document → ``slice`` projections.
    Zero shuffle; output rows stay co-partitioned with their source
    document, so a downstream per-chunk transform or write pipelines
    map-side. Chunk text rides as an md5 fingerprint plus the token
    count, not the repeated text, keeping the fan-out narrow (the
    caller can re-slice lazily when materializing chunks).

    Output: (doc_id, chunk_id, n_tokens, chunk_hash).
    """
    t = tokens(text_col)
    sized = df.select(
        F.col(id_col).alias("doc_id"), t.alias("__t"), F.size(t).alias("__n")
    ).filter(F.col("__n") > 0)
    n_chunks = F.when(F.col("__n") <= chunk_size, F.lit(1)).otherwise(
        F.floor((F.col("__n") - chunk_size + stride - 1) / stride) + 1
    )
    ex = sized.select(
        "doc_id", "__t",
        F.explode(F.sequence(F.lit(0), (n_chunks - 1).cast("int"))).alias("chunk_id"),
    )
    chunk = F.slice(F.col("__t"), F.col("chunk_id") * stride + 1, chunk_size)
    return ex.select(
        "doc_id",
        F.col("chunk_id").cast("long").alias("chunk_id"),
        F.size(chunk).cast("long").alias("n_tokens"),
        F.md5(F.concat_ws(" ", chunk)).alias("chunk_hash"),
    )


def span_dedup(
    df: DataFrame,
    id_col: str,
    text_col: str,
    split_re: str = "\n",
    join_delim: str = "\n",
    min_len: int = 15,
) -> DataFrame:
    """Corpus-global span-level dedup (the C4/RefinedWeb line-dedup
    family): split every document into spans, keep each distinct span
    only at its FIRST global occurrence (ordered by ``(doc id,
    position)``), and rebuild documents from their surviving spans —
    boilerplate that repeats across pages (nav bars, cookie banners,
    license headers) vanishes corpus-wide in one pass.

    Spans shorter than ``min_len`` pass through untouched (deduping
    "the" would shred the corpus) AND skip the dedup shuffle entirely —
    only long spans pay the global window. Scale shape: explode is
    map-side; the keep-first window shuffles on ``md5(span)`` (16-byte
    key, never multi-KB text); the rebuild regroups by doc id. Two
    keyed shuffles total, both on well-distributed keys.

    Documents whose text is NULL are dropped (split yields no rows) —
    run after null-handling, like the rest of the cleaning chain.
    """
    parts = df.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), split_re, -1)).alias(
            "__pos", "__span"
        ),
    )
    long_spans = parts.filter(F.length("__span") >= min_len)
    short_spans = parts.filter(F.length("__span") < min_len)
    w = Window.partitionBy(F.md5("__span")).orderBy(
        F.col(id_col).asc(), F.col("__pos").asc()
    )
    kept_long = (
        long_spans.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
    ordered = F.array_sort(F.collect_list(F.struct("__pos", "__span")))
    return (
        kept_long.unionByName(short_spans)
        .groupBy(id_col)
        .agg(
            F.array_join(
                F.transform(ordered, lambda x: x["__span"]), join_delim
            ).alias(text_col)
        )
    )


def bigram_nll(
    df: DataFrame,
    id_col: str,
    text_col: str,
    quantum: int = 1_000_000,
) -> DataFrame:
    """Per-document bigram-LM negative log-likelihood — the
    conditional-probability upgrade of ``unigram_nll``: the model is
    ``p(w2 | w1) = cf(w1,w2) / cf(w1,·)`` trained on the corpus's own
    adjacent-token stream (MLE, no smoothing — every observed bigram
    has positive probability by construction), document score = mean
    ``-ln p`` over its bigram occurrences. Catches word-salad text
    that unigram NLL misses: common words in improbable ORDER.

    Same exactness contract as ``unigram_nll``: per-bigram log-probs
    quantize to integer micro-nats, per-doc sums are exact integers,
    one rounded division at the end. Documents with fewer than two
    tokens emit no row (they have no bigram stream).

    Output: ``(doc_id, n_bigrams, nll)``.

    Scale shape: bigrams explode map-side from the token array (no
    shuffle); the raw bigram stream is materialized through ONE
    doc-keyed exchange that both consumers (model training and
    scoring) read back — the corpus is scanned and tokenized exactly
    once, as a ReusedExchange, instead of once per consumer; the model
    is two keyed aggs (pair cf, then left-context cf) over map-side
    partial combines; scoring joins occurrences to the pair model on
    (w1, w2) — broadcastable for bounded vocabularies — and
    re-aggregates per document. All log-model rows are |distinct
    bigrams|, not corpus occurrences.
    """
    bg = (
        df.select(
            F.col(id_col).alias("doc_id"), tokens(F.col(text_col)).alias("__t")
        )
        # documents with <2 tokens have no bigram stream; filtering
        # BEFORE the slices also keeps slice lengths non-negative
        # (slice with length -1 throws on empty/punctuation-only text)
        .filter(F.size("__t") >= 2)
        .select(
            "doc_id",
            F.explode(
                F.arrays_zip(
                    F.slice("__t", 1, F.size("__t") - 1).alias("w1"),
                    F.slice("__t", 2, F.size("__t") - 1).alias("w2"),
                )
            ).alias("b"),
        )
        .select("doc_id", F.col("b.w1").alias("w1"), F.col("b.w2").alias("w2"))
        .filter((F.col("w1") != "") & (F.col("w2") != ""))
        # pin an explicit exchange under BOTH consumers: identical
        # subtrees → Spark's exchange reuse evaluates scan + tokenize +
        # explode once and serves the second consumer from shuffle files
        .repartition("doc_id")
    )
    pair_cf = bg.groupBy("w1", "w2").agg(F.count("*").cast("long").alias("__cf2"))
    left_cf = pair_cf.groupBy("w1").agg(F.sum("__cf2").cast("long").alias("__cf1"))
    li = F.round(
        F.log(F.col("__cf2").cast("double") / F.col("__cf1").cast("double"))
        * F.lit(float(quantum))
    ).cast("long")
    # assemble the log-prob MODEL first (|bigram types| rows), so the
    # big occurrence stream shuffles through ONE join instead of two.
    # The model side is the explicitly-broadcast build side: left to
    # its size estimates Spark broadcast the OCCURRENCE stream and
    # streamed the model, which (a) dies at the 8 GB broadcast cap at
    # scale and (b) re-keys the join output by (w1, w2), forcing the
    # final per-doc agg to re-shuffle every occurrence — with the
    # model broadcast, the probe side keeps its doc_id partitioning
    # and the scoring agg needs NO further exchange.
    model = pair_cf.join(left_cf, "w1").select("w1", "w2", li.alias("__li"))
    scored = bg.join(F.broadcast(model), ["w1", "w2"]).select("doc_id", "__li")
    return scored.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_bigrams"),
        (
            -F.sum("__li").cast("double")
            / (F.lit(float(quantum)) * F.count("*").cast("double"))
        ).alias("nll"),
    )


def _bpe_wrapped_hist(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """DISTINCT-word histogram with each word as a wrapped-symbol
    sequence ``<c><a><t>`` — the shared first stage of BPE learn and
    encode. Wrapping makes literal ``replace`` both exact (a pattern
    cannot match across symbol boundaries) and greedy left-to-right,
    i.e. precisely BPE's application order."""
    wrap = F.concat_ws(
        "",
        F.transform(
            F.regexp_extract_all(F.col("word"), F.lit("."), 0),
            lambda c: F.concat(F.lit("<"), c, F.lit(">")),
        ),
    )
    return (
        _doc_tokens(df, id_col, text_col)
        .groupBy(F.col("token").alias("word"))
        .agg(F.count("*").alias("wc"))
        .select(wrap.alias("seq"), "wc")
    )


def _bpe_syms():
    # built lazily: Column construction requires an active SparkContext
    return F.regexp_extract_all(F.col("seq"), F.lit("<[^<>]*>"), 0)


#: Histogram-size dial for the driver-local BPE trainer: when the
#: DISTINCT-word histogram fits under this many rows it is collected
#: once and the merge loop runs locally (the shape every production
#: BPE trainer uses — merge learning is vocabulary-bound, not
#: corpus-bound); above it, the fully-lazy distributed chain runs.
_BPE_LOCAL_MAX_VOCAB = 500_000

_BPE_SYM_RE = _re.compile(r"<[^<>]*>")


def _bpe_collect_small_hist(
    hist: DataFrame, max_rows: int | None
) -> list[tuple[str, int]] | None:
    """One-job probe-and-fetch: pull up to ``max_rows + 1`` histogram
    rows; a result within budget IS the full histogram (return it),
    an overflow returns None (caller takes the distributed path)."""
    if max_rows is None:
        return None
    rows = hist.limit(max_rows + 1).collect()
    if len(rows) > max_rows:
        return None
    return [(r["seq"], r["wc"]) for r in rows]


def _bpe_local_plan(
    rows: list[tuple[str, int]], n_merges: int
) -> tuple[list[tuple[str, str, str, int]], list[str], list[int]]:
    """Driver-local merge trainer over the collected histogram —
    EXACTLY the distributed semantics: per round, count adjacent
    wrapped-symbol pairs weighted by word count (overlaps counted,
    as ``arrays_zip`` does), pick the winner by (count desc, left
    asc, right asc), rewrite every sequence with one left-to-right
    non-overlapping literal replace (``str.replace`` ==
    ``F.replace``). Returns (merges, final_seqs, word_counts)."""
    seqs = [s for s, _ in rows]
    wcs = [w for _, w in rows]
    merges: list[tuple[str, str, str, int]] = []
    for _ in range(n_merges):
        counts: dict[tuple[str, str], int] = {}
        for s, w in zip(seqs, wcs):
            syms = _BPE_SYM_RE.findall(s)
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                counts[p] = counts.get(p, 0) + w
        if not counts:
            break  # no word has >= 2 symbols left: no further rules
        (left, right), c = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        merged = "<" + left[1:-1] + right[1:-1] + ">"
        merges.append((left, right, merged, int(c)))
        pat = left + right
        seqs = [s.replace(pat, merged) for s in seqs]
    return merges, seqs, wcs


def _bpe_inner(c):
    return F.substring(c, 2, F.length(c) - 2)


def _bpe_top_pair(hist: DataFrame) -> DataFrame:
    """The round's winning merge: top adjacent symbol pair by summed
    word frequency (count desc, then lexicographic — deterministic
    under ties). 1 row, or 0 rows when no word has ≥2 symbols left."""
    pairs = (
        hist.select(
            "wc",
            F.explode(
                F.arrays_zip(
                    F.slice(_bpe_syms(), 1, F.size(_bpe_syms()) - 1).alias("l"),
                    F.slice(_bpe_syms(), 2, F.size(_bpe_syms()) - 1).alias("r"),
                )
            ).alias("pr"),
        )
        .select("wc", F.col("pr.l").alias("l"), F.col("pr.r").alias("r"))
    )
    return (
        pairs.groupBy("l", "r")
        .agg(F.sum("wc").cast("long").alias("pair_count"))
        .orderBy(F.col("pair_count").desc(), F.col("l").asc(), F.col("r").asc())
        .limit(1)
        .select(
            "l", "r",
            F.concat(
                F.lit("<"), _bpe_inner(F.col("l")), _bpe_inner(F.col("r")), F.lit(">")
            ).alias("merged"),
            "pair_count",
        )
    )


def _bpe_apply(hist: DataFrame, top: DataFrame) -> DataFrame:
    """Rewrite every sequence with the winning merge — EMPTY-SAFE: a
    0-row winner (pair-free round) leaves the histogram unchanged via
    a constant-key left join (a crossJoin would annihilate it)."""
    keyed = F.broadcast(
        top.select(
            F.lit(1).alias("__k"),
            F.concat("l", "r").alias("__pat"),
            F.col("merged").alias("__rep"),
        )
    )
    return (
        hist.withColumn("__k", F.lit(1))
        .join(keyed, "__k", "left")
        .select(
            F.when(F.col("__pat").isNull(), F.col("seq"))
            .otherwise(F.replace(F.col("seq"), F.col("__pat"), F.col("__rep")))
            .alias("seq"),
            "wc",
        )
    )


def bpe_learn(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n_merges: int = 3,
    local_max_vocab: int | None = _BPE_LOCAL_MAX_VOCAB,
) -> DataFrame:
    """Byte-Pair-Encoding merge training (Sennrich et al. 2016,
    arXiv:1508.07909) — learn the first ``n_merges`` merge rules from
    the corpus, entirely in Catalyst expressions (no Python UDF).

    Per round, on the DISTINCT-word histogram (never the occurrence
    stream): count adjacent symbol pairs weighted by word frequency,
    pick the top pair (count desc, then lexicographic — deterministic
    under ties), rewrite every word's symbol sequence with one
    ``replace``. A round with no remaining pairs yields no rule and
    leaves the histogram unchanged. Output: ``(merge_round, left_sym,
    right_sym, merged, pair_count)`` — one row per learned rule.

    Scale shape (MEASURED-PROBE ROUTED, round 5 — the same playbook
    as ``topk_route``): the corpus collapses to the DISTINCT-word
    histogram with one map-side-combined agg — merge learning is then
    VOCABULARY-bound, never corpus-bound.

    * ``local`` (|histogram| ≤ ``local_max_vocab``): the histogram is
      collected ONCE (a single job; the ``limit(n+1)`` fetch is the
      size probe) and the merge loop runs on the driver — the shape
      every production BPE trainer uses; at the registered corpus the
      vocabulary is a few thousand rows, so per-round Spark jobs
      (round 4's eager collects: ×2.9 on the sf0.1 bench) and their
      cached histograms (round 3's leak) both disappear. Results are
      returned as a driver-local relation — re-evaluation recomputes
      nothing.
    * ``distributed`` (above the dial, or ``local_max_vocab=None``):
      one aggregation job per round over the persisted base histogram;
      each round collects its 1-ROW winner and stacks the rewrite as a
      literal projection (a lazy chain would reference round r's
      histogram twice from round r+1 — O(2^n) recompute; the per-round
      driver state here is one merge rule, ~bytes). The persist is
      released before return. Both paths are exact and tie-break
      identically (count desc, left asc, right asc).
    """
    spark = df.sparkSession
    hist = _bpe_wrapped_hist(df, id_col, text_col)
    schema = (
        "merge_round int, left_sym string, right_sym string, "
        "merged string, pair_count long"
    )
    local = _bpe_collect_small_hist(hist, local_max_vocab)
    if local is not None:
        planned, _seqs, _wcs = _bpe_local_plan(local, n_merges)
        return local_relation(
            spark,
            [
                (r + 1, left, right, merged, c)
                for r, (left, right, merged, c) in enumerate(planned)
            ],
            schema,
        )
    # Distributed route (round 6): the fully-lazy broadcast-join chain
    # referenced round r's histogram TWICE from round r+1 (once as the
    # apply input, once inside the top-pair subquery) - evaluating
    # round n recomputed the corpus-collapse aggregation O(2^n) times.
    # Now the loop collects each round's 1-row winner (the textbook
    # iterative-algorithm shape: per-round driver state is one merge
    # rule, ~bytes) and stacks the rewrite as a LITERAL projection, so
    # each round is exactly one aggregation job over the persisted base
    # histogram - linear in n_merges. The persist is released before
    # return, so no registered cache entry outlives the call.
    merges_rows: list[tuple] = []
    hist = hist.persist()
    try:
        cur = hist
        for r in range(1, n_merges + 1):
            top = _bpe_top_pair(cur).collect()
            if not top:  # no word has >= 2 symbols left: no further rules
                break
            t = top[0]
            merges_rows.append(
                (r, t["l"], t["r"], t["merged"], int(t["pair_count"]))
            )
            if r < n_merges:
                cur = cur.select(
                    F.replace(
                        F.col("seq"),
                        F.lit(t["l"] + t["r"]),
                        F.lit(t["merged"]),
                    ).alias("seq"),
                    "wc",
                )
    finally:
        hist.unpersist()
    return local_relation(spark, merges_rows, schema)


def bpe_token_counts(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n_merges: int = 3,
    top_k: int | None = 50,
    local_max_vocab: int | None = _BPE_LOCAL_MAX_VOCAB,
) -> DataFrame:
    """Apply ``bpe_learn``'s merge rules back to the corpus and count
    the resulting subword tokens — learn + encode as one lazy plan
    (the encode reuses the same wrapped-symbol histogram, so merges
    rewrite |distinct words| sequences, never the occurrence stream).

    Output: ``(token, token_count)`` — unwrapped symbols, weighted by
    word frequency; ``top_k`` keeps the head of the vocabulary
    (count desc, token asc — deterministic), None keeps all.

    Routed like :func:`bpe_learn`: a histogram under
    ``local_max_vocab`` rows trains AND encodes on the driver from
    one collected copy (a single Spark job end-to-end); above the
    dial the distributed chain runs one aggregation job per round
    over the persisted base histogram, collecting only the 1-row
    winner (linear in ``n_merges``; the persist is released before
    return).
    """
    spark = df.sparkSession
    hist = _bpe_wrapped_hist(df, id_col, text_col)
    local = _bpe_collect_small_hist(hist, local_max_vocab)
    if local is not None:
        _planned, seqs, wcs = _bpe_local_plan(local, n_merges)
        counts: dict[str, int] = {}
        for s, w in zip(seqs, wcs):
            for sym in _BPE_SYM_RE.findall(s):
                tok = sym[1:-1]
                counts[tok] = counts.get(tok, 0) + w
        items = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        if top_k is not None:
            items = items[:top_k]
        return local_relation(
            spark,
            [(t, int(c)) for t, c in items],
            "token string, token_count long",
        )
    # Same linearization as bpe_learn's distributed route (round 6):
    # collect each round's 1-row winner and stack the rewrite as a
    # literal projection over the persisted base histogram — one
    # aggregation job per round, linear in n_merges. The persist is
    # released before return; the caller's single action then
    # recomputes the base collapse once (no double-reference remains,
    # since the merge rules are literals, not lazy subplans).
    base = hist.persist()
    try:
        for _ in range(n_merges):
            top = _bpe_top_pair(hist).collect()
            if not top:
                break
            t = top[0]
            hist = hist.select(
                F.replace(
                    F.col("seq"), F.lit(t["l"] + t["r"]), F.lit(t["merged"])
                ).alias("seq"),
                "wc",
            )
    finally:
        base.unpersist()
    out = (
        hist.select(F.explode(_bpe_syms()).alias("sym"), "wc")
        .groupBy(_bpe_inner(F.col("sym")).alias("token"))
        .agg(F.sum("wc").cast("long").alias("token_count"))
    )
    if top_k is not None:
        out = out.orderBy(
            F.col("token_count").desc(), F.col("token").asc()
        ).limit(top_k)
    return out



__all__ = [
    "STOPWORDS", "PII_PATTERNS", "token_count", "bpe_ish_token_count",
    "stopword_hits", "detect_language", "punct_ratio", "mean_word_length",
    "quality_score", "fingerprint", "text_stats", "text_stats_full",
    "winnowing_fingerprints", "vocabulary", "tf_idf", "clean_corpus",
    "redact_pii", "repetition_ratio", "url_domain_stats", "chunk_documents",
    "span_dedup", "bpe_learn", "bpe_token_counts", "bigram_nll",
]
