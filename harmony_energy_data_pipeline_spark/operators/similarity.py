"""Similarity search over embedding columns (array<float>).

Two paths with the same output contract (query_id, neighbor_id, score,
rank):

- ``cosine_topk`` — exact brute force: broadcast the (small) query set
  against the corpus, score with a JVM-side fold, take top-k per query
  with a window. The corpus is never shuffled; the scoring join is a
  BroadcastNestedLoopJoin over a pruned two-column projection. This is
  the CORRECTNESS baseline and is also the right physical plan at
  scale whenever |queries| is small — 100 TB of corpus streams through
  map-side scoring once.

- ``lsh_topk`` — approximate: random-hyperplane signatures bucket both
  sides; only same-bucket candidates are scored (multi-probe via
  several independent signature tables raises recall). The scale path
  when |queries| is itself large: turns the nested-loop into an
  equi-join on bucket ids.
"""

from __future__ import annotations

import random
import warnings

import numpy as np
import pandas as pd

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.storagelevel import StorageLevel

from harmony_energy_data_pipeline_spark.functions.vector import (
    cosine_similarity,
    random_hyperplane_signature,
)


def cosine_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 10,
    query_id: str = "vec_id",
    corpus_id: str = "vec_id",
    query_vec: str = "embedding",
    corpus_vec: str = "embedding",
    include_self: bool = False,
    scorer: str = "expr",
) -> DataFrame:
    """Exact top-k cosine neighbors per query (brute force).

    Output: (query_id, neighbor_id, score, rank), rank 1..k, ties
    broken by neighbor_id ascending (deterministic).

    ``scorer="expr"`` (default): the pure-Catalyst fold — the DuckDB
    oracle twin, bit-stable across engines for the hash gate.
    ``scorer="gemm"`` (opt-in production path for large corpora):
    one float64 BLAS matmul per corpus Arrow batch against the whole
    query matrix (collected into the closure — the query side is the
    small side by this operator's contract), per-batch exact top-k
    (score-boundary ties fully expanded before an id-tiebreak sort),
    then a |q|·k·n_batches global merge window. Same neighbors; the
    float SCORE can differ from the expr fold in the last ulp (BLAS
    summation order), which is why it is not the oracle default.
    """
    if scorer not in ("expr", "gemm"):
        raise ValueError(f"scorer must be expr|gemm, got {scorer!r}")
    q = queries.select(
        F.col(query_id).alias("query_id"), F.col(query_vec).alias("__qv")
    )
    c = corpus.select(
        F.col(corpus_id).alias("neighbor_id"), F.col(corpus_vec).alias("__cv")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("neighbor_id").asc()
    )
    if scorer == "gemm":
        prebatch = _cosine_gemm_topk(q, c, k, include_self)
        return (
            prebatch.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
        )
    scored = F.broadcast(q).crossJoin(c)
    if not include_self:
        scored = scored.filter(F.col("query_id") != F.col("neighbor_id"))
    scored = scored.select(
        "query_id",
        "neighbor_id",
        cosine_similarity("__qv", "__cv").alias("score"),
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def _cosine_gemm_topk(
    q: DataFrame, c: DataFrame, k: int, include_self: bool
) -> DataFrame:
    """Float twin of ``_quantized_gemm_topk``: normalized query matrix
    in the closure, one GEMM per corpus batch, exact per-batch top-k
    under (score desc, neighbor_id asc) — boundary score ties are
    expanded to the full tie class before the id-tiebreak sort, so the
    global merge reproduces brute force over THESE float scores."""
    qrows = q.collect()
    if len(qrows) == 0:
        return q.sparkSession.createDataFrame(
            [], "query_id long, neighbor_id long, score double"
        )
    qids = np.array([r["query_id"] for r in qrows], dtype=np.int64)
    Q = np.stack([np.asarray(r["__qv"], dtype=np.float64) for r in qrows])
    qn = np.linalg.norm(Q, axis=1)
    qn[qn == 0.0] = 1.0
    Qn = Q / qn[:, None]
    block = int(_GEMM_QUERY_BLOCK)  # driver-side capture (see above)

    def score_batches(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            C = np.stack(pdf["__cv"].to_numpy()).astype(np.float64)
            nids = pdf["neighbor_id"].to_numpy(dtype=np.int64)
            cn = np.linalg.norm(C, axis=1)
            cn[cn == 0.0] = 1.0
            Cn = C / cn[:, None]
            # query-block loop bounds per-worker memory (see
            # _GEMM_QUERY_BLOCK); blocks are disjoint queries, exactness
            # unchanged
            for lo in range(0, len(qids), block):
                qb = qids[lo:lo + block]
                scores = Cn @ Qn[lo:lo + block].T  # n×block
                n, m = scores.shape
                out_q, out_n, out_s = [], [], []
                for j in range(m):
                    s = scores[:, j].copy()
                    if include_self is False:
                        s[nids == qb[j]] = -np.inf
                    k_eff = min(k, n)
                    part = np.argpartition(-s, k_eff - 1)[:k_eff]
                    thr = s[part].min()
                    if thr == -np.inf:
                        cand = np.flatnonzero(s > -np.inf)
                        if cand.size == 0:
                            continue
                    else:
                        cand = np.flatnonzero(s >= thr)  # all boundary ties
                    order = np.lexsort((nids[cand], -s[cand]))[:k_eff]
                    sel = cand[order]
                    out_q.append(np.full(sel.size, qb[j], dtype=np.int64))
                    out_n.append(nids[sel])
                    out_s.append(scores[sel, j])
                if out_q:
                    yield pd.DataFrame(
                        {
                            "query_id": np.concatenate(out_q),
                            "neighbor_id": np.concatenate(out_n),
                            "score": np.concatenate(out_s),
                        }
                    )

    return c.mapInPandas(
        score_batches, "query_id long, neighbor_id long, score double"
    )


def _planes(dim: int, nbits: int, seed: int) -> list[list[float]]:
    rng = random.Random(seed)
    return [[rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(nbits)]


def lsh_topk(
    queries: DataFrame,
    corpus: DataFrame,
    dim: int,
    k: int = 10,
    nbits: int = 12,
    tables: int = 4,
    seed: int = 42,
    query_id: str = "vec_id",
    corpus_id: str = "vec_id",
    query_vec: str = "embedding",
    corpus_vec: str = "embedding",
) -> DataFrame:
    """Approximate top-k: score only candidates sharing an LSH bucket
    in at least one of ``tables`` independent signature tables.

    Recall rises with ``tables`` and falls with ``nbits`` (narrower
    buckets); exactness is recovered as nbits→0. Same output contract
    as cosine_topk, so the two are drop-in interchangeable.
    """
    def signed(df: DataFrame, id_alias: str, vec_col: str) -> DataFrame:
        sigs = F.array(*[
            random_hyperplane_signature(vec_col, _planes(dim, nbits, seed + t))
            for t in range(tables)
        ])
        return df.select(
            F.col(id_alias),
            F.col(vec_col),
            F.posexplode(sigs).alias("__table", "__bucket"),
        )

    q = signed(
        queries.select(F.col(query_id).alias("query_id"), F.col(query_vec).alias("__qv")),
        "query_id", "__qv",
    )
    c = signed(
        corpus.select(F.col(corpus_id).alias("neighbor_id"), F.col(corpus_vec).alias("__cv")),
        "neighbor_id", "__cv",
    )
    # score FIRST, dedup by max(score): a pair colliding in several
    # tables has the identical score every time, so max == the score.
    # The old dropDuplicates carried both VECTORS through its exchange
    # and planned first(array) as a SortAggregate; this shuffles 24
    # bytes per pair through a map-side-combined HashAggregate instead
    # (guide §2.3: shuffle keys and metadata, not payloads)
    scored = (
        q.join(c, on=["__table", "__bucket"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            cosine_similarity("__qv", "__cv").alias("score"),
        )
        .groupBy("query_id", "neighbor_id")
        .agg(F.max("score").alias("score"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def ivf_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 10,
    n_centroids: int = 16,
    n_probe: int = 4,
    seed: int = 42,
    query_id: str = "vec_id",
    corpus_id: str = "vec_id",
    query_vec: str = "embedding",
    corpus_vec: str = "embedding",
) -> DataFrame:
    """IVF (inverted-file) approximate top-k: coarse-quantize the
    corpus into ``n_centroids`` Voronoi cells (seeded KMeans); each
    query scores only the cells of its ``n_probe`` nearest centroids.

    Scale shape: the centroid table is tiny and lives on the driver /
    in broadcast; the corpus is shuffled ONCE by cell id (in a real
    deployment: written out partitioned by cell, so queries touch
    ~n_probe/n_centroids of the data). ``n_probe == n_centroids``
    recovers exact brute force — the recall/latency dial.
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    corpus_feat = corpus.select(
        F.col(corpus_id).alias("neighbor_id"),
        F.col(corpus_vec).alias("__cv"),
        array_to_vector(F.col(corpus_vec)).alias("__feat"),
    )
    km = KMeans(k=n_centroids, seed=seed, featuresCol="__feat", predictionCol="__cell")
    model = km.fit(corpus_feat)
    centroids = np.vstack([np.asarray(c) for c in model.clusterCenters()])
    assigned = model.transform(corpus_feat).select("neighbor_id", "__cv", "__cell")

    @F.pandas_udf("array<int>")
    def probe_cells(vecs: pd.Series) -> pd.Series:
        out = []
        for v in vecs:
            d = ((centroids - np.asarray(v, dtype=np.float64)) ** 2).sum(axis=1)
            out.append(np.argsort(d, kind="stable")[:n_probe].astype(np.int32))
        return pd.Series(out)

    q = queries.select(
        F.col(query_id).alias("query_id"),
        F.col(query_vec).alias("__qv"),
        F.explode(probe_cells(F.col(query_vec))).alias("__cell"),
    )
    scored = (
        q.join(assigned, on="__cell")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", cosine_similarity("__qv", "__cv").alias("score"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def ivf_topk_portable(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 10,
    n_centroids: int = 8,
    n_probe: int = 4,
    scale: int = 1_000_000,
    query_id: str = "vec_id",
    corpus_id: str = "vec_id",
    query_vec: str = "embedding",
    corpus_vec: str = "embedding",
) -> DataFrame:
    """IVF top-k with a DETERMINISTIC coarse quantizer: one Lloyd
    M-step over the seed partition ``cell = id % n_centroids``, with
    vectors quantized to ``round(x·scale)`` integers so every distance
    comparison (cell assignment, probe ranking) is exact integer
    arithmetic — identical on any engine, which makes this the
    oracle-checkable twin of ``ivf_topk``'s KMeans quantizer. The
    recall/latency dial (n_probe of n_centroids cells scored) is the
    same; only the quantizer training differs.

    Scale shape: the centroid table (n_centroids × dim rows) is a
    broadcast on both distance joins; the corpus explodes map-side for
    the assignment agg (one shuffle on id), and candidate scoring is a
    cell-keyed equi-join — the corpus is never all-pairs scanned.
    """
    probes, assigned = _portable_cell_probes(
        queries, corpus, query_id, corpus_id, query_vec, corpus_vec,
        n_centroids, n_probe, scale,
    )
    qv = queries.select(F.col(query_id).alias("query_id"), F.col(query_vec).alias("__qv"))
    cv = corpus.select(F.col(corpus_id).alias("neighbor_id"), F.col(corpus_vec).alias("__cv"))
    # each corpus vector lives in exactly one cell and probes are
    # distinct cells, so (query, neighbor) pairs are already unique
    cand = probes.join(assigned, "cell").filter(F.col("query_id") != F.col("neighbor_id"))
    scored = (
        cand.join(F.broadcast(qv), "query_id")
        .join(cv, "neighbor_id")
        .select("query_id", "neighbor_id", cosine_similarity("__qv", "__cv").alias("score"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def gram_matrix(
    df: DataFrame,
    vec_col: str = "embedding",
    scale: int = 1_000_000,
) -> DataFrame:
    """Distributed Gram matrix Σ xᵀx over an embedding column — the
    reduction at the heart of PCA/whitening (e.g. SemDeDup's
    preprocessing): output ``(i, j, s)`` for the upper triangle
    (i ≤ j), where ``s = Σ_rows vmᵢ·vmⱼ`` over vectors quantized to
    ``round(x·scale)`` integers — EXACT integer sums, so any engine
    agrees bit-for-bit. Mean-center / normalize by n driver-side
    (d×d is tiny) before the eigensolve.

    Scale shape: each Arrow batch contributes one d×d partial via a
    numpy GEMM in ``mapInPandas`` (the batch never leaves the
    executor; only d·(d+1)/2 partial sums per batch are emitted), and
    one (i,j)-keyed agg merges partials — shuffle volume is
    |batches|·d²/2 rows of 3 longs, independent of corpus size.
    """
    import pandas as pd

    def partials(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            m = np.rint(
                np.stack(pdf[vec_col].to_numpy()).astype("float64") * scale
            ).astype("int64")
            # int64 GEMM is safe PER BATCH (|batch| · scale² / d);
            # the global merge is not — see the decimal sum below
            g = m.T @ m
            iu, ju = np.triu_indices(g.shape[0])
            yield pd.DataFrame({"i": iu, "j": ju, "s": g[iu, ju]})

    part = df.select(vec_col).mapInPandas(partials, "i long, j long, s long")
    # DECIMAL(38,0) accumulator for the cross-batch merge: diagonal
    # entries grow ~n_rows·scale²/d (~1.6e10 per row at scale=1e6,
    # d=64), so a BIGINT sum wraps silently past ~6e8 rows with ANSI
    # off. The final cast keeps the public column BIGINT; past int64
    # range it nulls out loudly instead of wrapping.
    return part.groupBy("i", "j").agg(
        F.sum(F.col("s").cast("decimal(38,0)")).cast("long").alias("s")
    )


def pca_project(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 8,
    scale: int = 1_000_000,
) -> DataFrame:
    """Project embeddings onto their top-k principal directions.

    The Gram matrix reduces distributed (``gram_matrix``, exact
    integers); the d×d eigensolve runs on the DRIVER (d is model
    dimension — trivial); the projection is a broadcast matrix
    multiply back over the corpus via ``mapInPandas``. This is the
    standard big-n/small-d PCA split: nothing quadratic in rows ever
    shuffles. Signs are fixed (first nonzero component positive) so
    output is reproducible. Output: ``(id_col, pc array<double>)``.
    """
    import pandas as pd

    tri = gram_matrix(df, vec_col, scale).collect()  # d(d+1)/2 rows - tiny
    d = max(r["j"] for r in tri) + 1
    g = np.zeros((d, d))
    for r in tri:
        g[r["i"], r["j"]] = r["s"]
        g[r["j"], r["i"]] = r["s"]
    g /= float(scale) * scale
    _, vecs = np.linalg.eigh(g)
    comps = vecs[:, ::-1][:, :k]  # descending eigenvalue order
    for c in range(comps.shape[1]):  # deterministic sign convention
        nz = np.flatnonzero(comps[:, c])
        if len(nz) and comps[nz[0], c] < 0:
            comps[:, c] = -comps[:, c]

    def project(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            m = np.stack(pdf[vec_col].to_numpy()).astype("float64")
            p = m @ comps
            yield pd.DataFrame({id_col: pdf[id_col], "pc": list(p)})

    return df.select(id_col, vec_col).mapInPandas(
        project, f"{id_col} long, pc array<double>"
    )


def portable_cells(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_cells: int = 8,
    scale: int = 1_000_000,
) -> DataFrame:
    """Deterministic coarse-quantizer cell assignment: seed partition
    ``cell = id % n_cells``, one Lloyd M-step, nearest centroid by
    EXACT integer distance over ``round(x·scale)`` quantized vectors —
    the same engine-portable quantizer ``ivf_topk_portable`` uses
    (kept in sync with its inline twin; both are oracle-checked).

    Returns (id_col, cell). Scale shape: centroid table (n_cells × dim)
    broadcasts; the only shuffle is the per-id distance agg.
    """
    vm = F.round(F.col("v").cast("double") * F.lit(float(scale))).cast("long")
    pe = df.select(
        F.col(id_col), F.posexplode(vec_col).alias("pos", "v")
    ).select(id_col, "pos", vm.alias("vm"))
    cent = (
        pe.withColumn("cell", F.col(id_col) % n_cells)
        .groupBy("cell", "pos")
        .agg(F.round(F.sum("vm").cast("double") / F.count("*")).cast("long").alias("cm"))
    )
    d = F.col("vm") - F.col("cm")
    dist = (
        pe.join(F.broadcast(cent), "pos")
        .groupBy(id_col, "cell")
        .agg(F.sum(d * d).alias("__d2"))
    )
    w = Window.partitionBy(id_col).orderBy(F.col("__d2").asc(), F.col("cell").asc())
    return (
        dist.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(id_col, "cell")
    )


def semdedup(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.3,
    n_cells: int = 8,
    scale: int = 1_000_000,
    vectorized: bool = True,
    max_cell_rows: int = 16_384,
    prefilter: bool = True,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic
    near-duplicate pruning. Cluster embeddings with a coarse quantizer,
    compare cosine ONLY within a cluster, and drop every row whose
    similarity to a lower-id row in the same cell meets the threshold
    (keep-first rule — the same convention ``minhash_dedup`` uses, so
    the survivor set is deterministic and engine-portable).

    Scale shape: the paper's O(n²) similarity matrix is sharded by
    cell — pair cost is Σ|cell|², never |corpus|², and n_cells is the
    dial that bounds the largest shard (measured in SCALING.md: fixed
    cells at 10× data ⇒ pairs ×100; cells scaled with the corpus ⇒
    ×10). The quantizer is ``portable_cells`` (broadcast centroids,
    exact integer distances). Returns KEPT rows as (id_col, cell).

    ``vectorized=True`` (default, the 100 TB path) runs each cell's
    similarity block as one numpy GEMM inside ``applyInPandas`` —
    one shuffle on cell, float64 BLAS instead of a per-pair
    interpreted fold (~20× faster locally). ``vectorized=False``
    evaluates per-pair Catalyst expressions — bit-identical to the
    SQL oracle (BLAS sum order differs in the last ulp), so the
    driver-checked query uses it; both modes are equivalence-tested.

    EXACT-DUPLICATE PREPASS (always on; provably result-identical):
    byte-identical vectors share a cell (the cell is a function of
    the vector), their cosine is 1, and the keep-first rule drops
    every copy but the min-id one — so copies collapse to that rep
    BEFORE the quadratic stage, and the rep inherits exactly the
    original's survival condition (any lower-id similar row implies a
    lower-id similar REP, since a group's rep id is its minimum).
    The pair cost then scales with DISTINCT vectors, not rows — on a
    duplicate-heavy corpus (the replication fixture is 99% copies)
    this removes the only superlinear term SCALING.md found. Zero and
    NaN vectors bypass the grouping: their normalized cosine is 0/NaN
    (never ≥ threshold), so the original semantics keep every copy.

    MEMORY CONTRACT (``max_cell_rows``, vectorized path): one cell's
    DISTINCT vectors must fit a single Python worker — the GEMM
    builds a |cell|×|cell| float64 similarity matrix (≈2 GiB at the
    16 384 default). A cell over the cap raises with the remedy
    (raise ``n_cells`` so |distinct vectors|/n_cells fits, or raise
    the cap on big-memory workers) instead of OOM-killing the
    executor mid-job — the same census-and-refuse playbook as
    ``fuzzy_match_pairs``' ``max_block``, except refusal here is an
    error: silently dropping a cell would change the survivor set.
    The expression path (``vectorized=False``) streams pairs through
    a join and needs no cap — unless ``prefilter`` (below) is on.

    GEMM PREFILTER for the expression path (``prefilter=True``, the
    default; round 6): the pure per-pair Catalyst fold is bit-
    identical to the SQL oracle but interprets every within-cell pair
    (~50 µs each — 6 s at sf0.1 vs 1.4 s for the GEMM mode). Same
    cure as ``embedding_near_dup_pairs``' exact route: one per-cell
    float64 GEMM emits CANDIDATE pairs at ``threshold − 1e-9``
    (BLAS-vs-fold error is ~1e-15, so no true pair can sit outside
    the margin), and only the sparse candidate set is rescored with
    the exact Catalyst fold that decides ``≥ threshold`` — final
    drop set bit-identical to the pure fold, O(pairs-interpreted)
    reduced to the near-dup density. The prefilter shares the GEMM
    path's ``max_cell_rows`` memory contract; it auto-disables for
    ``threshold ≤ 0`` (a zero vector's GEMM score is 0 but the
    fold's is null — only equivalent when the threshold is
    positive), falling back to the uncapped pure-expression join.
    """
    assigned = portable_cells(df, id_col, vec_col, n_cells, scale)
    sides = df.select(F.col(id_col).alias("__id"), F.col(vec_col).alias("__v")).join(
        assigned.withColumnRenamed(id_col, "__id"), "__id"
    )
    groupable = F.exists("__v", lambda x: x != 0.0) & ~F.exists(
        "__v", lambda x: F.isnan(x)
    )
    reps = (
        sides.filter(groupable)
        .groupBy("cell", "__v")
        .agg(F.min("__id").alias("__id"))
        .select("__id", "__v", "cell")
    )
    sides = reps.unionByName(
        sides.filter(~groupable).select("__id", "__v", "cell")
    ).persist(StorageLevel.MEMORY_AND_DISK)
    # persisted: the quantizer chain (posexplode + centroid join +
    # per-id window) feeds two subtrees in the GEMM mode and four in
    # the prefiltered expression mode; recomputing it per subtree
    # dominated the expression route's wall clock at sf0.1.
    if vectorized:
        def drop_ids(pdf: pd.DataFrame) -> pd.DataFrame:
            if len(pdf) > max_cell_rows:
                raise ValueError(
                    f"semdedup cell {pdf['cell'].iloc[0]} holds {len(pdf)} "
                    f"distinct vectors > max_cell_rows={max_cell_rows}; its "
                    "similarity matrix would not fit one worker — increase "
                    "n_cells (or max_cell_rows on big-memory executors)"
                )
            pdf = pdf.sort_values("__id", kind="mergesort").reset_index(drop=True)
            m = np.stack(pdf["__v"].to_numpy()).astype("float64")
            norms = np.linalg.norm(m, axis=1)
            norms[norms == 0.0] = 1.0
            m /= norms[:, None]
            sims = m @ m.T
            # strictly-upper mask: col j dropped if any row i<j meets t
            dup = (np.triu(sims, k=1) >= threshold).any(axis=0)
            return pd.DataFrame({"__drop": pdf["__id"][dup]})

        drops = (
            sides.groupBy("cell")
            .applyInPandas(drop_ids, "__drop long")
            .withColumnRenamed("__drop", id_col)
        )
    elif prefilter and threshold > 0:
        def cand_pairs(pdf: pd.DataFrame) -> pd.DataFrame:
            if len(pdf) > max_cell_rows:
                raise ValueError(
                    f"semdedup cell {pdf['cell'].iloc[0]} holds {len(pdf)} "
                    f"distinct vectors > max_cell_rows={max_cell_rows}; its "
                    "similarity matrix would not fit one worker — increase "
                    "n_cells (or max_cell_rows on big-memory executors), or "
                    "pass prefilter=False for the streaming expression join"
                )
            pdf = pdf.sort_values("__id", kind="mergesort").reset_index(drop=True)
            m = np.stack(pdf["__v"].to_numpy()).astype("float64")
            norms = np.linalg.norm(m, axis=1)
            norms[norms == 0.0] = 1.0
            m /= norms[:, None]
            sims = m @ m.T
            i, j = np.nonzero(np.triu(sims, k=1) >= threshold - 1e-9)
            ids_ = pdf["__id"].to_numpy()
            return pd.DataFrame({"id_a": ids_[i], "id_b": ids_[j]})

        cand = sides.groupBy("cell").applyInPandas(
            cand_pairs, "id_a long, id_b long"
        )
        a = sides.select(F.col("__id").alias("id_a"), F.col("__v").alias("__va"))
        b = sides.select(F.col("__id").alias("id_b"), F.col("__v").alias("__vb"))
        drops = (
            cand.join(a, "id_a")
            .join(b, "id_b")
            .filter(cosine_similarity("__va", "__vb") >= F.lit(threshold))
            .select(F.col("id_b").alias(id_col))
            .distinct()
        )
    else:
        a = sides.select(
            F.col("__id").alias("id_a"), "cell", F.col("__v").alias("__va")
        )
        b = sides.select(
            F.col("__id").alias("id_b"), "cell", F.col("__v").alias("__vb")
        )
        drops = (
            a.join(b, "cell")
            .filter(F.col("id_a") < F.col("id_b"))
            .filter(cosine_similarity("__va", "__vb") >= F.lit(threshold))
            .select(F.col("id_b").alias(id_col))
            .distinct()
        )
    # survivors are exactly the undropped prepass rows (every non-rep
    # copy is dominated by its rep, so it can never survive)
    kept = sides.select(F.col("__id").alias(id_col), "cell")
    return kept.join(drops, id_col, "left_anti")


def embedding_near_dup_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    dim: int | None = None,
    nbits: int = 8,
    tables: int = 6,
    seed: int = 42,
    exact: bool = False,
    max_exact_rows: int = 200_000,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: (id_a, id_b, score) with
    id_a < id_b and cosine ≥ threshold.

    ``exact=True`` is brute force over every pair (small corpora /
    oracle checks); default is LSH-bucketed candidates — the 100 TB
    path.

    Round 6: the exact route is GEMM-PREFILTERED. The first full-
    surface bench caught the old expression-join form at 101 s for a
    2 000-vector corpus — 2M interpreted higher-order-function cosine
    folds (~50 µs each) — versus milliseconds of BLAS for the same
    arithmetic. Now the normalized corpus matrix rides in the closure
    (guarded by ``max_exact_rows`` — the exact route's documented
    contract is small corpora), one blocked float64 matmul per Arrow
    batch emits CANDIDATE pairs at ``threshold − 1e-9`` (BLAS-vs-fold
    error is ~1e-15, so no true pair can sit outside the margin), and
    only the surviving candidates — the sparse near-dup set — are
    RESCORED with the same Catalyst fold the DuckDB oracle mirrors.
    Final scores and the threshold cut are therefore bit-identical to
    the old form; only the O(n²) interpreted work is gone.
    """
    a = df.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("__va"))
    b = df.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("__vb"))
    if exact:
        cand = _exact_pair_candidates(
            df, id_col, vec_col, threshold, max_exact_rows
        ).join(a, "id_a").join(b, "id_b")
    else:
        assert dim is not None, "dim required for LSH mode"

        def signed(side: DataFrame, idc: str, vecc: str) -> DataFrame:
            sigs = F.array(*[
                random_hyperplane_signature(vecc, _planes(dim, nbits, seed + t))
                for t in range(tables)
            ])
            return side.select(
                F.col(idc), F.col(vecc), F.posexplode(sigs).alias("__table", "__bucket")
            )

        cand = (
            signed(a, "id_a", "__va")
            .join(signed(b, "id_b", "__vb"), on=["__table", "__bucket"])
            .filter(F.col("id_a") < F.col("id_b"))
            .dropDuplicates(["id_a", "id_b"])
        )
    return (
        cand.select("id_a", "id_b", cosine_similarity("__va", "__vb").alias("score"))
        .filter(F.col("score") >= F.lit(threshold))
    )


def _exact_pair_candidates(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float,
    max_exact_rows: int,
) -> DataFrame:
    """(id_a, id_b) candidates with GEMM cosine ≥ threshold − 1e-9 and
    id_a < id_b: the corpus matrix (collected once, L2-normalized;
    zero vectors score 0 and can never pass a positive threshold, the
    same outcome as the fold's null) is broadcast in the closure, and
    each Arrow batch runs one blocked float64 matmul against it —
    per-worker peak is batch × 2048 column-block doubles, the same
    memory contract as the quantized top-k scorer."""
    rows = (
        df.select(F.col(id_col), F.col(vec_col))
        .limit(max_exact_rows + 1)
        .collect()
    )
    if len(rows) > max_exact_rows:
        raise ValueError(
            f"exact near-dup is quadratic: corpus exceeds max_exact_rows="
            f"{max_exact_rows}; use the LSH route (exact=False) or raise "
            "the guard deliberately"
        )
    ids = np.array([r[0] for r in rows], dtype=np.int64)
    M = np.array([r[1] for r in rows], dtype=np.float64)
    norms = np.linalg.norm(M, axis=1)
    norms[norms == 0.0] = 1.0
    N = M / norms[:, None]
    thr = float(threshold) - 1e-9
    col_block = 2048
    spark = df.sparkSession

    def gen(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            B = np.array(list(pdf[vec_col]), dtype=np.float64)
            bn = np.linalg.norm(B, axis=1)
            bn[bn == 0.0] = 1.0
            Bn = B / bn[:, None]
            bids = pdf[id_col].to_numpy(dtype=np.int64)
            outs_a, outs_b = [], []
            for s in range(0, len(ids), col_block):
                S = Bn @ N[s:s + col_block].T
                bi, cj = np.nonzero(S >= thr)
                ia, ib = bids[bi], ids[s + cj]
                keep = ia < ib
                outs_a.append(ia[keep])
                outs_b.append(ib[keep])
            yield pd.DataFrame({
                "id_a": np.concatenate(outs_a) if outs_a else
                np.array([], dtype=np.int64),
                "id_b": np.concatenate(outs_b) if outs_b else
                np.array([], dtype=np.int64),
            })

    return df.select(F.col(id_col), F.col(vec_col)).mapInPandas(
        gen, "id_a long, id_b long"
    )


def assign_nearest_centroid(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    scale: int = 1_000_000,
) -> DataFrame:
    """Nearest-centroid assignment (one Lloyd E-step / centroid
    classifier): per-``label_col`` mean centroids, then each vector is
    assigned to the centroid with the smallest squared L2 distance.

    Output: ``(id, label, assigned_label, d2)`` — ``d2`` in squared
    micro-units (exact BIGINT).

    Determinism contract: vectors and centroids are quantized to
    ``round(x * scale)`` integers, so distances are exact integer sums
    — identical across engines and summation orders (the float-sum
    centroid mean is reduced to one double division before rounding).
    Tie-break: smallest label wins.

    Scale shape: the centroid table is (n_labels × dim) rows — a
    broadcast; the vector side explodes to (n × dim) rows map-side,
    and the only shuffle is the (id, label) distance aggregation. For
    very wide fleets prefer the numpy matrix path in ``ivf_topk`` —
    this exploded form is the exact/oracle-checkable variant.
    """
    vm = F.round(F.col("v").cast("double") * F.lit(float(scale))).cast("long")
    pe = df.select(
        F.col(id_col).alias("id"),
        F.col(label_col).alias("label"),
        F.posexplode(vec_col).alias("pos", "v"),
    ).select("id", "label", "pos", vm.alias("vm"))
    cent = (
        pe.groupBy(F.col("label").alias("assigned_label"), "pos")
        .agg(
            F.round(F.sum("vm").cast("double") / F.count("*")).cast("long").alias("cm")
        )
    )
    d = F.col("vm") - F.col("cm")
    dist = (
        pe.join(F.broadcast(cent), "pos")
        .groupBy("id", "label", "assigned_label")
        .agg(F.sum(d * d).alias("d2"))
    )
    w = Window.partitionBy("id").orderBy(F.col("d2").asc(), F.col("assigned_label").asc())
    return (
        dist.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def _portable_cell_probes(
    queries: DataFrame,
    corpus: DataFrame,
    query_id: str,
    corpus_id: str,
    query_vec: str,
    corpus_vec: str,
    n_centroids: int,
    n_probe: int,
    scale: int = 1_000_000,
) -> tuple[DataFrame, DataFrame]:
    """Deterministic IVF candidate structure shared by
    ``ivf_topk_portable`` and ``quantized_dot_topk``'s bucketed
    route: one Lloyd M-step over the ``id % n_centroids`` seed on
    ``round(x·scale)`` integer vectors, then exact-integer nearest
    cells. Returns ``(probes, assigned)`` — ``(query_id, cell)`` for
    each query's ``n_probe`` nearest cells and ``(neighbor_id,
    cell)`` for each corpus row's single nearest cell. Broadcast
    centroid joins only; the corpus shuffles once, by id."""
    vm = F.round(F.col("v").cast("double") * F.lit(float(scale))).cast("long")
    pe_c = corpus.select(
        F.col(corpus_id).alias("neighbor_id"),
        F.posexplode(corpus_vec).alias("pos", "v"),
    ).select("neighbor_id", "pos", vm.alias("vm"))
    cent = (
        pe_c.withColumn("cell", F.col("neighbor_id") % n_centroids)
        .groupBy("cell", "pos")
        .agg(F.round(F.sum("vm").cast("double") / F.count("*")).cast("long").alias("cm"))
    )
    d = F.col("vm") - F.col("cm")

    def nearest_cells(pe: DataFrame, idc: str, n_keep: int) -> DataFrame:
        dist = (
            pe.join(F.broadcast(cent), "pos")
            .groupBy(idc, "cell")
            .agg(F.sum(d * d).alias("__d2"))
        )
        w = Window.partitionBy(idc).orderBy(F.col("__d2").asc(), F.col("cell").asc())
        return (
            dist.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") <= n_keep)
            .select(idc, "cell")
        )

    assigned = nearest_cells(pe_c, "neighbor_id", 1)
    pe_q = queries.select(
        F.col(query_id).alias("query_id"), F.posexplode(query_vec).alias("pos", "v")
    ).select("query_id", "pos", vm.alias("vm"))
    probes = nearest_cells(pe_q, "query_id", n_probe)
    return probes, assigned


def topk_route(
    n_queries: int, max_broadcast_queries: int | None
) -> str:
    """Pure routing decision for query-side top-k scoring (unit-
    tested like ``joins.choose_join_strategy``): ``"broadcast"``
    while the query side fits the driver/executor broadcast budget —
    the corpus then never shuffles — else ``"bucketed"``, the
    IVF-candidate path whose cost is |q|·|corpus|·(n_probe/n_cells)
    instead of the full cross product."""
    if max_broadcast_queries is None or n_queries <= max_broadcast_queries:
        return "broadcast"
    return "bucketed"


def quantized_dot_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 10,
    query_id: str = "vec_id",
    corpus_id: str = "vec_id",
    query_vec: str = "embedding",
    corpus_vec: str = "embedding",
    qscale: int = 127,
    include_self: bool = False,
    max_broadcast_queries: int | None = 50_000,
    n_centroids: int = 16,
    n_probe: int = 4,
    scorer: str = "auto",
    approximate: bool | None = None,
) -> DataFrame:
    """Exact top-k by INT8-quantized dot product — the
    storage-compression ANN path: vectors quantize per-dimension to
    ``clamp(round(x·qscale), ±qscale)`` (int8 range at the default
    127 → 4× smaller than float32 at rest and on the wire), and
    scoring is a pure-integer dot product — bit-identical on any
    engine, no float accumulation order to worry about. For
    unit-normalized embeddings the integer dot is a monotone proxy
    for cosine; ``dot_q / qscale²`` recovers the approximate cosine.

    Output: ``(query_id, neighbor_id, dot_q, rank)`` — ``dot_q`` the
    raw integer score, rank 1..k, ties broken by neighbor_id.

    Scale shape (MEASURED-PROBE ROUTED, round 4 — the same playbook
    as ``joins.skew_aware_join``): a cheap ``count()`` of the query
    side picks the plan via :func:`topk_route`.

    * ``broadcast`` (|q| ≤ ``max_broadcast_queries``): identical to
      ``cosine_topk`` — the quantized query side broadcasts, the
      corpus streams through one map-side ``zip_with``/``aggregate``
      fold (JVM-side, no explode, no shuffle of the corpus), and only
      the per-query top-k heap shuffles. EXACT.
    * ``bucketed`` (|q| above the dial — SCALING.md measured the
      registered |q|≈|corpus| configuration at 24× wall at 30×):
      candidates restrict to each query's ``n_probe`` nearest of
      ``n_centroids`` deterministic IVF cells (the
      ``ivf_topk_portable`` quantizer), scored with the same integer
      dot — cost falls by ~n_probe/n_centroids; approximate unless
      ``n_probe == n_centroids`` (then provably identical to
      broadcast, which the unit test asserts).

    ``max_broadcast_queries=None`` skips the probe and forces the
    broadcast plan (the oracle-registered query does this implicitly
    at test SFs). The int64 accumulator is exact either way: |dot| ≤
    dim·qscale² (~1e6 per 64 dims), nowhere near overflow.

    ``scorer`` picks the broadcast route's physical scorer:

    * ``"gemm"`` (the ``"auto"`` default): one ``mapInPandas`` pass
      over the corpus with the quantized query matrix in the closure —
      each Arrow batch scores against ALL queries via one int64 GEMM
      and emits only its per-batch top-k per query (selected under
      the exact global order, so the merged global top-k is provably
      identical to brute force); the |q|·|corpus| pair frame is never
      materialized. Measured at the 100× fixture (|q|=2062,
      |corpus|=200k): 240.7 s (expr) → GEMM is the production path.
    * ``"expr"``: the pure-Catalyst ``zip_with``/``aggregate`` fold —
      engine-portable (the DuckDB oracle twin), but higher-order
      functions are interpreted per element, so it pays ~|q|·|corpus|
      ·dim interpreted ops; keep for oracle parity and no-numpy
      deployments. Both scorers are bit-identical (integer
      arithmetic; parity-tested).

    ``scorer="auto"`` requires integral id columns on BOTH sides (the
    GEMM path materializes ids as an int64 ndarray); non-integral ids
    (string doc ids, …) auto-fall back to the ``expr`` scorer, while
    an EXPLICIT ``scorer="gemm"`` raises with the remedy named.

    ``approximate`` governs the route downgrade when |q| exceeds
    ``max_broadcast_queries``: ``None`` (default) takes the bucketed
    IVF route but emits a ``UserWarning`` — the result is then
    approximate (n_probe of n_centroids cells) despite this
    function's exact headline; ``True`` opts in silently; ``False``
    raises instead of ever returning approximate neighbors.
    """
    if scorer not in ("auto", "gemm", "expr"):
        raise ValueError(f"scorer must be auto|gemm|expr, got {scorer!r}")
    integral_ids = all(
        isinstance(df.schema[col].dataType,
                   (T.ByteType, T.ShortType, T.IntegerType, T.LongType))
        for df, col in ((queries, query_id), (corpus, corpus_id))
    )
    if not integral_ids:
        if scorer == "gemm":
            raise TypeError(
                "scorer='gemm' requires integral query/corpus id columns "
                "(ids ride an int64 ndarray through the GEMM batches); "
                "use scorer='expr' for non-integer ids"
            )
        scorer = "expr"  # silent exact fallback from 'auto'
    def q8(vc: str) -> Column:
        return F.transform(
            F.col(vc),
            lambda x: F.greatest(
                F.lit(-qscale),
                F.least(F.lit(qscale), F.round(x.cast("double") * qscale)),
            ).cast("long"),
        )

    q = queries.select(
        F.col(query_id).alias("query_id"), q8(query_vec).alias("__q8")
    )
    c = corpus.select(
        F.col(corpus_id).alias("neighbor_id"), q8(corpus_vec).alias("__c8")
    )
    dot = F.aggregate(
        F.zip_with("__q8", "__c8", lambda a, b: a * b),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )
    route = "broadcast"
    if max_broadcast_queries is not None:
        # bounded census, not a full count: the route only needs to
        # know WHETHER |q| exceeds the dial, so the probe job stops
        # after max_broadcast_queries+1 rows (same idiom as
        # joins.skew_aware_join / sinks.upsert) — at corpus scale a
        # full count() of the query side scans everything to answer
        # a ≤-50k question
        probe = queries.select(query_id).limit(
            max_broadcast_queries + 1
        ).count()
        route = topk_route(probe, max_broadcast_queries)
    if route == "bucketed" and n_probe < n_centroids:
        if approximate is False:
            raise ValueError(
                f"query side exceeds max_broadcast_queries="
                f"{max_broadcast_queries} and approximate=False — the "
                "bucketed IVF route returns approximate neighbors; raise "
                "the broadcast budget (max_broadcast_queries=None forces "
                "the exact plan) or pass approximate=True"
            )
        if approximate is None:
            warnings.warn(
                "quantized_dot_topk: query side exceeds "
                f"max_broadcast_queries={max_broadcast_queries}; routing to "
                f"the bucketed IVF path (n_probe={n_probe} of "
                f"{n_centroids} cells) — results are APPROXIMATE. Pass "
                "approximate=True to silence, approximate=False to refuse, "
                "or max_broadcast_queries=None to force the exact plan.",
                UserWarning,
                stacklevel=2,
            )
    w = Window.partitionBy("query_id").orderBy(
        F.col("dot_q").desc(), F.col("neighbor_id").asc()
    )
    if route == "bucketed":
        probes, assigned = _portable_cell_probes(
            queries, corpus, query_id, corpus_id, query_vec, corpus_vec,
            n_centroids, n_probe,
        )
        scored = (
            probes.join(assigned, "cell")
            .join(q, "query_id")
            .join(c, "neighbor_id")
        )
    elif scorer in ("auto", "gemm"):
        prebatch = _quantized_gemm_topk(q, c, k, include_self)
        return (
            prebatch.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
        )
    else:
        scored = F.broadcast(q).crossJoin(c)
    if not include_self:
        scored = scored.filter(F.col("query_id") != F.col("neighbor_id"))
    scored = scored.select("query_id", "neighbor_id", dot.alias("dot_q"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


#: Query-block width for the GEMM scorers: per-worker peak memory is
#: ~3 × arrow_batch_rows × block × 8 bytes (dot + key + mask), so at the
#: default 10k-row Arrow batches a 1024 block holds each of local[32]'s
#: concurrent Python workers to ~250 MB. Raise on big-memory executors.
_GEMM_QUERY_BLOCK = 1024


def _check_gemm_batch_len(n: int) -> None:
    """The GEMM scorers' composite order key ``dot·2²⁰ − row_rank``
    reserves 20 bits for the within-batch id-rank; an Arrow batch of
    ≥ 2²⁰ rows would overlap the dot term and silently corrupt the
    per-batch top-k selection — fail loudly with the config remedy."""
    if n >= (1 << 20):
        raise ValueError(
            f"GEMM scorer received an Arrow batch of {n} rows; the "
            "exact-order composite key requires < 2^20 rows per batch — "
            "lower spark.sql.execution.arrow.maxRecordsPerBatch (and "
            "never set it to 0/unlimited) for this operator"
        )


def _quantized_gemm_topk(
    q: DataFrame, c: DataFrame, k: int, include_self: bool
) -> DataFrame:
    """Broadcast-route GEMM scorer for ``quantized_dot_topk``: the
    quantized query matrix (|q|×dim int64 — bounded by the caller's
    broadcast budget) rides the task closure; each corpus Arrow batch
    computes its |batch|×|q| integer dot matrix in ONE matmul and
    emits only its per-batch top-k per query. Selection uses the
    composite key ``dot·2²⁰ − rank(neighbor_id within batch)`` so the
    per-batch winners are chosen under the EXACT global order
    (dot desc, neighbor_id asc) — any global top-k element is in its
    batch's top-k under the same order, so the Spark-side merge
    (window over |q|·k·n_batches rows, not |q|·|corpus|) reproduces
    brute force bit-for-bit. |dot| ≤ dim·qscale² < 2⁴³ keeps the
    composite exact in int64."""
    qrows = q.collect()
    qids_all = np.array([r["query_id"] for r in qrows], dtype=np.int64)
    if len(qrows) == 0:
        return q.sparkSession.createDataFrame(
            [], "query_id long, neighbor_id long, dot_q long"
        )
    Q_all = np.stack([np.asarray(r["__q8"], dtype=np.int64) for r in qrows])
    # captured driver-side so the executor closure sees the value (a
    # module-global read would re-resolve against a fresh worker import)
    block = int(_GEMM_QUERY_BLOCK)

    def score_batches(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            _check_gemm_batch_len(len(pdf))
            pdf = pdf.sort_values("neighbor_id", kind="mergesort").reset_index(
                drop=True
            )
            C = np.stack(pdf["__c8"].to_numpy()).astype(np.int64)
            nids = pdf["neighbor_id"].to_numpy(dtype=np.int64)
            # query-BLOCK loop: the dot/key matrices are batch×block, so
            # per-worker peak memory is bounded by the block dial, not
            # |q| — the 300× rehearsal OOM-killed the JVM when a 6k-query
            # unchunked matrix met 32 concurrent workers. Blocks are
            # disjoint queries, so per-block top-k is globally exact.
            for lo in range(0, len(qids_all), block):
                qids = qids_all[lo:lo + block]
                dots = C @ Q_all[lo:lo + block].T  # n×block int64
                # composite per-batch order key: dot major, id-rank minor
                key = dots * (1 << 20) - np.arange(len(pdf), dtype=np.int64)[:, None]
                if include_self is False:
                    key = np.where(
                        nids[:, None] == qids[None, :], np.int64(-(1 << 62)), key
                    )
                k_eff = min(k, len(pdf))
                top = np.argpartition(-key, k_eff - 1, axis=0)[:k_eff]  # k×block
                m = len(qids)
                qcol = np.repeat(qids[None, :], k_eff, axis=0).ravel()
                ncol = nids[top.ravel()]
                dcol = dots[top.ravel(), np.tile(np.arange(m), k_eff)]
                mask = np.ones(len(qcol), dtype=bool)
                if include_self is False:
                    mask = ncol != qcol  # drop masked self rows in the k
                yield pd.DataFrame(
                    {
                        "query_id": qcol[mask],
                        "neighbor_id": ncol[mask],
                        "dot_q": dcol[mask],
                    }
                )

    return c.mapInPandas(
        score_batches, "query_id long, neighbor_id long, dot_q long"
    )


def kmeans_fixed_point(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 8,
    n_iter: int = 2,
    scale: int = 1_000_000,
    checkpoint_every: int = 5,
    assign_mode: str = "expr",
) -> DataFrame:
    """Full Lloyd's K-means with ``n_iter`` fixed synchronous rounds
    and ENGINE-PORTABLE arithmetic — the iterative generalization of
    ``portable_cells`` (which is exactly the r=0 seed + one M-step).

    Determinism contract (every step exact or single-rounded):

    * vectors quantize to ``round(x·scale)`` BIGINT micro-units;
    * seed partition is ``id % k`` (no RNG — reproducible anywhere);
    * E-step distances are exact integer sums of squared deltas,
      tie-break to the smallest cell id;
    * M-step centroid = ``round(sum/count)`` with the sum carried in
      DECIMAL(38,0) (an int64 sum wraps at ~1e12 members × 1e6
      micro-units — the exact corpus sizes this engine targets) and
      ONE double division before the round.

    Clusters that lose every member simply drop out of the centroid
    table (both engines shrink identically).

    Output: final centroids ``(cell, pos, cm, n_members)`` — k×dim
    rows after the last M-step, with the member count of the final
    assignment.

    Scale shape: the exploded (id, pos, vm) frame is ``persist()``-ed
    once (lineage kept — executor-loss safe) and every round is ONE
    shuffle: the (id, cell) distance agg; the centroid table (k×dim)
    stays broadcast-size on the probe side of each join. Rounds
    between reliable checkpoints stay lazy; long loops truncate
    lineage through ``iterative.truncate_every`` like PageRank
    (operators/graph.py) rather than fault-fragile localCheckpoint.

    ``assign_mode`` picks the E-step's physical form (round 4):

    * ``"expr"`` (default, the oracle twin): exploded exact-integer
      Catalyst expressions — the broadcast centroid join fans each
      (id, pos) row ×k before the partial agg, so shuffle rows are
      n·k after map-side combine; fine for small k, superlinear in k.
    * ``"gemm"``: the assignment runs as one ``mapInPandas`` pass
      over the un-exploded vectors — centroids (k×dim, collected per
      round, broadcast in the closure) against each Arrow batch via
      the int64 expansion ``|x|² + |c|² − 2·X@Cᵀ``; NO join fanout,
      no E-step shuffle at all, cost linear in n with a k×dim GEMM
      per batch — the production path for large k (the same
      exact-vs-GEMM split SemDeDup uses). All arithmetic stays
      integer (HALF_UP quantization mirrors ``F.round``), so the two
      modes are bit-identical — parity-tested on real embeddings.
    """
    from .iterative import ensure_checkpoint_dir, truncate_every

    if assign_mode not in ("expr", "gemm"):
        raise ValueError(f"assign_mode must be expr|gemm, got {assign_mode!r}")
    ensure_checkpoint_dir(df.sparkSession)
    vm = F.round(F.col("v").cast("double") * F.lit(float(scale))).cast("long")
    src = df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("__vec"))
    pe = (
        df.select(F.col(id_col).alias("id"), F.posexplode(vec_col).alias("pos", "v"))
        .select("id", "pos", vm.alias("vm"))
        .persist()
    )
    mean_cm = (
        F.round(
            F.sum(F.col("vm").cast("decimal(38,0)")).cast("double") / F.count("*")
        ).cast("long").alias("cm")
    )
    cent = (
        pe.withColumn("cell", F.col("id") % k)
        .groupBy("cell", "pos")
        .agg(mean_cm)
    )
    d = F.col("vm") - F.col("cm")
    # n_iter=0 = "seed centroids only": membership is the id%k seed
    assign = pe.select("id").distinct().select(
        "id", (F.col("id") % k).alias("cell")
    )
    for r in range(n_iter):
        if assign_mode == "gemm":
            assign = _kmeans_assign_gemm(src, cent, scale)
        else:
            dist = (
                pe.join(F.broadcast(cent), "pos")
                .groupBy("id", "cell")
                .agg(F.sum(d * d).alias("__d2"))
            )
            # argmin as an aggregate: min of struct(__d2, cell) is the
            # lexicographic minimum — smallest distance, ties to the
            # smallest cell id, exactly the former row_number window's
            # ORDER BY __d2 ASC, cell ASC. Struct min buffers aren't
            # UnsafeRow-mutable so this plans as a SortAggregate, but
            # with MAP-SIDE PARTIAL COMBINE (k rows per id per
            # partition max) — the window paid a full exchange+sort of
            # the whole (id, cell) distance table with no reduction
            # (interleaved A/B: 2.12 → 1.91 s)
            assign = (
                dist.groupBy("id")
                .agg(F.min(F.struct("__d2", "cell")).alias("__m"))
                .select("id", F.col("__m.cell").alias("cell"))
            )
        cent = (
            pe.join(assign, "id")
            .groupBy("cell", "pos")
            .agg(mean_cm)
        )
        cent = truncate_every(cent, r, n_rounds=n_iter, every=checkpoint_every)
    counts = assign.groupBy("cell").agg(F.count("*").alias("n_members"))
    return cent.join(F.broadcast(counts), "cell").select(
        "cell", "pos", "cm", "n_members"
    )


def _kmeans_assign_gemm(
    src: DataFrame, cent: DataFrame, scale: int
) -> DataFrame:
    """GEMM E-step: collect the (k×dim) centroid table — per-round
    driver traffic of k·dim longs, trivially small — and assign every
    vector in one ``mapInPandas`` pass. Exact-integer throughout:
    vectors quantize with HALF_UP (mirroring Spark's ``F.round``),
    distances expand as ``|x|² + |c|² − 2·X@Cᵀ`` in int64 (|terms| ≤
    dim·scale²·max|x|² ≈ 1e14 — far from overflow), and ties argmin
    to the smallest cell id exactly like the expression path's
    ``ORDER BY __d2, cell``."""
    rows = cent.collect()
    if not rows:
        raise ValueError("kmeans: empty centroid table")
    cells = sorted({r["cell"] for r in rows})
    dim = max(r["pos"] for r in rows) + 1
    C = np.zeros((len(cells), dim), dtype=np.int64)
    cell_index = {c: i for i, c in enumerate(cells)}
    for r in rows:
        C[cell_index[r["cell"]], r["pos"]] = r["cm"]
    cells_arr = np.asarray(cells, dtype=np.int64)
    c2 = (C * C).sum(axis=1)

    def assign_batches(batches):
        for pdf in batches:
            y = np.stack(pdf["__vec"].to_numpy()).astype("float64") * float(scale)
            xq = (np.sign(y) * np.floor(np.abs(y) + 0.5)).astype(np.int64)
            x2 = (xq * xq).sum(axis=1)
            d2 = x2[:, None] + c2[None, :] - 2 * (xq @ C.T)
            # argmin returns the FIRST minimum; cells_arr is ascending,
            # so ties break to the smallest cell id
            yield pd.DataFrame(
                {"id": pdf["id"], "cell": cells_arr[np.argmin(d2, axis=1)]}
            )

    return src.mapInPandas(assign_batches, "id long, cell long")


__all__ = [
    "cosine_topk", "lsh_topk", "ivf_topk", "ivf_topk_portable",
    "embedding_near_dup_pairs", "assign_nearest_centroid",
    "kmeans_fixed_point", "quantized_dot_topk", "topk_route",
]
