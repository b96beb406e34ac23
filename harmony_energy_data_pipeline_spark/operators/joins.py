"""Join strategies beyond stock ``df.join``: skew-salted equi-join.

The reference has no joins (SURVEY.md §2.3), but at the 100 TB design
point skewed join keys are the classic cluster-killer: one hot key
lands an entire shuffle partition on one task. AQE's skew-join split
(`spark.sql.adaptive.skewJoin.enabled`, on by default in the engine
session) handles sort-merge skew at runtime; explicit salting remains
the tool when AQE can't help — e.g. hot keys in a shuffled hash join,
or aggregations keyed by the skewed column downstream.

Shape: fan the SMALL side out ×``n_salts`` (explode a literal salt
array), give each big-side row a deterministic salt, join on
(key, salt). Shuffle partitions for a hot key then spread across
``n_salts`` tasks. Cost: small side duplicated ``n_salts`` times —
keep n_salts ≈ cluster parallelism / hot-key count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SALT = "__salt"


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``big ⋈ small`` on column ``on`` with key salting.

    ``big`` rows get a deterministic salt (xxhash64 of the whole row —
    stable across retries, unlike ``rand()``, so speculative/retried
    tasks produce identical output); ``small`` is exploded to carry
    every salt value. Result set is identical to ``big.join(small,
    on, how)`` for inner/left joins.
    """
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports inner/left joins")
    big_salted = big.withColumn(
        _SALT, F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(n_salts))
    )
    small_fanned = small.withColumn(
        _SALT, F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    joined = big_salted.join(
        small_fanned,
        on=[big_salted[on] == small_fanned[on], big_salted[_SALT] == small_fanned[_SALT]],
        how=how,
    )
    # drop the duplicate key/salt columns from the small side
    return joined.drop(small_fanned[on]).drop(small_fanned[_SALT]).drop(big_salted[_SALT])


__all__ = ["salted_join"]
