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


def choose_join_strategy(
    small_rows: int,
    max_share_ppm: int,
    parallelism: int,
    broadcast_max_rows: int = 1_000_000,
    salt_share_ppm: int | None = None,
) -> str:
    """Pure decision function behind ``skew_aware_join`` (unit-testable
    without a cluster): ``'broadcast'`` when the small side fits the
    broadcast budget (skew is then irrelevant — no shuffle of the big
    side at all); else ``'salted'`` when the hottest key's row share
    exceeds ``salt_share_ppm`` (default: 1/parallelism — the point
    where one key's shuffle partition outweighs an even task's work);
    else ``'plain'`` (hash/sort-merge + AQE's runtime skew split)."""
    if small_rows <= broadcast_max_rows:
        return "broadcast"
    if salt_share_ppm is None:
        salt_share_ppm = max(1, 1_000_000 // max(parallelism, 1))
    return "salted" if max_share_ppm >= salt_share_ppm else "plain"


def skew_aware_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    how: str = "inner",
    n_salts: int | None = None,
    broadcast_max_rows: int = 1_000_000,
    salt_share_ppm: int | None = None,
    profile_row=None,
) -> DataFrame:
    """Equi-join that PICKS its physical strategy from measured key
    statistics instead of hoping: probes the small side's size (bounded
    count), consults ``analytics.key_skew_profile`` on the big side's
    key (``profile_row``: pass a cached profile row to skip the
    measurement pass — at 100 TB you profile once per table/key, not
    per query), and routes through ``choose_join_strategy``:

    - broadcast: small side under the budget — no big-side shuffle;
    - salted: hot key beyond ``salt_share_ppm`` — ``salted_join``
      spreads it over ``n_salts`` tasks;
    - plain: stock join; AQE's skew split covers residual sort-merge
      skew at runtime.

    The result set is identical in all three branches; only the
    physical plan changes. Cost of auto mode: one bounded count on the
    small side + one two-shuffle profile pass on the big side. The two
    probe jobs are independent, so they run CONCURRENTLY (the driver
    submits both; the scheduler back-fills one job's task tail with
    the other's tasks) — wall-clock is the slower probe, not the sum.
    When the small-side count decides the route on its own (broadcast
    fits, or a how= that salting can't express), the still-running
    profile job group is cancelled so a 100 TB big-side scan isn't
    paid for a decision that no longer needs it.
    """
    import uuid as _uuid
    from concurrent.futures import ThreadPoolExecutor

    from harmony_energy_data_pipeline_spark.operators.analytics import (
        key_skew_profile,
    )

    sc = big.sparkSession.sparkContext
    prof_fut = None
    prof_gid = None
    pool = None
    if profile_row is None and how in ("inner", "left"):
        prof_gid = f"skew-probe-{_uuid.uuid4().hex[:8]}"

        def _profile():
            # job group is thread-local: tags only this probe's jobs
            sc.setJobGroup(prof_gid, "skew_aware_join: big-side key profile",
                           interruptOnCancel=True)
            try:
                return key_skew_profile(big, on).first()
            finally:
                sc.setJobGroup(None, None)

        pool = ThreadPoolExecutor(max_workers=1)
        prof_fut = pool.submit(_profile)
    try:
        small_rows = small.select(on).limit(broadcast_max_rows + 1).count()
        if small_rows <= broadcast_max_rows:
            if prof_fut is not None:
                sc.cancelJobGroup(prof_gid)
            return big.join(F.broadcast(small), on, how)
        if how not in ("inner", "left"):
            # salting can't express right/full/semi joins; route them
            # plain UNCONDITIONALLY rather than crashing the day the
            # data skews (AQE's runtime skew split still covers
            # sort-merge skew)
            return big.join(small, on, how)
        if prof_fut is not None:
            profile_row = prof_fut.result()
            prof_fut = None
        elif profile_row is None:
            profile_row = key_skew_profile(big, on).first()
    finally:
        if prof_fut is not None:
            # a cancelled/abandoned probe must not surface its error
            prof_fut.cancel()
            prof_fut.add_done_callback(lambda f: f.exception())
        if pool is not None:
            pool.shutdown(wait=False)
    if profile_row is None or profile_row["max_share_ppm"] is None:
        # empty big side (no rows / NULL profile): nothing to skew
        return big.join(small, on, how)
    parallelism = big.sparkSession.sparkContext.defaultParallelism
    strategy = choose_join_strategy(
        small_rows,
        int(profile_row["max_share_ppm"]),
        parallelism,
        broadcast_max_rows,
        salt_share_ppm,
    )
    if strategy == "salted":
        return salted_join(
            big, small, on, n_salts=n_salts or min(64, parallelism), how=how
        )
    return big.join(small, on, how)


__all__ = ["salted_join", "choose_join_strategy", "skew_aware_join"]
