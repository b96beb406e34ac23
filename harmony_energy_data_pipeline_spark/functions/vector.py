"""Vector (array<float>) expression helpers — all JVM-side Catalyst
expressions (higher-order functions), no Python UDFs: the dot product
of two array columns is an ``aggregate(zip_with(...))`` fold that runs
inside whole-stage codegen.

Folds are sequential left-to-right over the array, which makes the
double-precision result deterministic for a given row — important for
oracle hash-matching.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def dot(a: Column | str, b: Column | str) -> Column:
    """Σ aᵢ·bᵢ as a sequential double fold."""
    prods = F.zip_with(_c(a), _c(b), lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, v: acc + v)


def l2_norm(a: Column | str) -> Column:
    return F.sqrt(
        F.aggregate(_c(a), F.lit(0.0),
                    lambda acc, v: acc + v.cast("double") * v.cast("double"))
    )


def cosine_similarity(a: Column | str, b: Column | str) -> Column:
    """cos(a,b) = a·b / (‖a‖‖b‖); null/zero-norm inputs → NULL (double
    division by zero yields NULL only for decimal — for doubles Spark
    gives ±Infinity/NaN, so guard explicitly)."""
    denom = l2_norm(a) * l2_norm(b)
    return F.when(denom != F.lit(0.0), dot(a, b) / denom)


def l2_distance(a: Column | str, b: Column | str) -> Column:
    diffs = F.zip_with(
        _c(a), _c(b),
        lambda x, y: (x.cast("double") - y.cast("double"))
        * (x.cast("double") - y.cast("double")),
    )
    return F.sqrt(F.aggregate(diffs, F.lit(0.0), lambda acc, v: acc + v))


def random_hyperplane_signature(vec: Column | str, planes: list[list[float]]) -> Column:
    """Sign-bit LSH signature: bit j = 1 if vec·plane_j ≥ 0. Returns a
    BIGINT bucket id (≤63 planes). Cosine-similar vectors collide with
    high probability — the bucketing key for approximate NN search.

    Round 6: when ``vec`` is a column NAME the whole signature is built
    as ONE SQL string parsed JVM-side. The first full-surface bench
    caught a 16-table × 4-bit caller paying ~6.5 s of plan
    CONSTRUCTION — hundreds of py4j round-trips assembling per-bit
    ``zip_with``/``aggregate`` lambdas — before any row moved. The SQL
    form is AST-identical (same left-to-right float64 fold, so every
    sign bit matches the oracle's), constructed in one parse. Column
    inputs keep the per-bit builder.
    """
    assert len(planes) <= 63, "at most 63 hyperplanes per signature"
    if isinstance(vec, str):
        def flit(x: float) -> str:
            r = repr(float(x))
            # repr round-trips the double exactly; string→double cast
            # re-parses it to the identical bits in Spark
            return f"CAST('{r}' AS DOUBLE)"

        bits = []
        for j, plane in enumerate(planes):
            arr = "array(" + ",".join(flit(x) for x in plane) + ")"
            dot = (
                f"aggregate(zip_with(`{vec}`, {arr}, "
                "(x, y) -> CAST(x AS DOUBLE) * y), "
                "CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"
            )
            bits.append(
                f"(CASE WHEN {dot} >= 0 THEN CAST({1 << j} AS BIGINT) "
                "ELSE CAST(0 AS BIGINT) END)"
            )
        return F.expr("CAST(0 AS BIGINT) + " + " + ".join(bits))
    sig = F.lit(0).cast("long")
    for j, plane in enumerate(planes):
        d = F.aggregate(
            F.zip_with(_c(vec), F.lit(plane).cast("array<double>"),
                       lambda x, y: x.cast("double") * y),
            F.lit(0.0), lambda acc, v: acc + v,
        )
        sig = sig + F.when(d >= 0, F.lit(1 << j).cast("long")).otherwise(F.lit(0).cast("long"))
    return sig
