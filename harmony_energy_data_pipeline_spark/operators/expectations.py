"""Data-quality gates: table digests and declarative expectations.

At 100 TB you cannot eyeball a snapshot — validation is (a) a cheap
order-independent DIGEST that two engines / two snapshots can compare,
and (b) a declarative expectation pass (dbt-test / Great-Expectations
style) that reports violation counts in ONE scan. Both are pure
aggregations: no shuffle for row-level checks, one keyed agg per
uniqueness check.

Extends the reference's quality accounting (count_inconsistent /
quality_summary over generation percentages — see
/root/reference/src/transform/transform.py) into a general gate.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from harmony_energy_data_pipeline_spark.functions.hashx import portable_hash60

_MOD = 1 << 60


def table_digest(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """Order-independent whole-table fingerprint:
    ``(n_rows, digest_xor, digest_sum)`` over the 60-bit md5 hash of
    each row's canonical string form (columns joined with unit
    separators, NULL as a sentinel).

    Two accumulators because each is blind somewhere: XOR cancels
    rows with even multiplicity; the wrap-around SUM (mod 2⁶⁰, summed
    in decimal so no engine overflows) is multiset-sensitive but
    weaker per-bit. Together a changed/duplicated/dropped row is
    caught with overwhelming probability — at any scale the whole
    check is one map-side scan + a 3-value reduce, the cheapest
    possible cross-snapshot comparison.

    Canonicalize floats/timestamps to fixed-point/ISO strings BEFORE
    digesting (the engine's cents convention) — raw float→string
    formatting is not engine-portable.
    """
    cols = cols or df.columns
    # presence prefix (\x01 = value, \x00 = NULL) so NULL is distinct
    # from EVERY string; values additionally ESCAPE the separator
    # (\x02 as escape char, itself escaped first) so a value
    # containing \x1f cannot forge a field boundary — without this,
    # ("a\x1f\x01b", NULL) and ("a", "b\x1f\x00") would canonicalize
    # identically and a changed row could go undetected
    def _esc(c: Column) -> Column:
        return F.replace(
            F.replace(c.cast("string"), F.lit("\x02"), F.lit("\x02\x02")),
            F.lit("\x1f"),
            F.lit("\x02\x1f"),
        )

    canon = F.concat_ws(
        "\x1f",
        *[
            F.coalesce(F.concat(F.lit("\x01"), _esc(F.col(c))), F.lit("\x00"))
            for c in cols
        ],
    )
    h = portable_hash60(canon)
    return df.select(h.alias("__h")).agg(
        F.count("*").alias("n_rows"),
        F.expr("bit_xor(__h)").alias("digest_xor"),
        F.expr(
            f"CAST(sum(CAST(__h AS DECIMAL(38,0))) % {_MOD} AS BIGINT)"
        ).alias("digest_sum"),
    )


@dataclass(frozen=True)
class Check:
    """One expectation: ``name`` labels the output row; ``predicate``
    is a boolean Column that is True when the row VIOLATES the
    expectation (row-level checks), or None for key-uniqueness checks
    (``unique_cols`` set instead)."""

    name: str
    predicate: Column | None = None
    unique_cols: tuple[str, ...] | None = None


def not_null(col: str) -> Check:
    return Check(f"not_null:{col}", F.col(col).isNull())


def in_range(col: str, lo, hi) -> Check:
    c = F.col(col)
    return Check(f"in_range:{col}", c.isNull() | (c < lo) | (c > hi))


def matches(col: str, pattern: str) -> Check:
    c = F.col(col)
    return Check(f"matches:{col}", c.isNull() | ~c.rlike(pattern))


def unique(*cols: str) -> Check:
    return Check("unique:" + ",".join(cols), unique_cols=tuple(cols))


def expect(df: DataFrame, checks: list[Check]) -> DataFrame:
    """Evaluate expectations; output ``(check, violations)`` — one row
    per check, 0 = pass. Row-level checks fold into a SINGLE
    aggregation over one scan (sum of violation flags); each
    uniqueness check adds one keyed two-level agg (duplicate keys =
    Σ(count−1), i.e. rows that would vanish under dedup)."""
    row_checks = [c for c in checks if c.predicate is not None]
    parts: list[DataFrame] = []
    if row_checks:
        # coalesce: SUM over zero rows is NULL, and an empty table must
        # report 0 violations, not an indistinguishable NULL
        agg = df.agg(
            *[
                F.coalesce(F.sum(c.predicate.cast("long")), F.lit(0)).alias(c.name)
                for c in row_checks
            ]
        )
        stack = ", ".join(f"'{c.name}', `{c.name}`" for c in row_checks)
        parts.append(
            agg.selectExpr(
                f"stack({len(row_checks)}, {stack}) AS (check, violations)"
            )
        )
    for c in checks:
        if c.unique_cols is not None:
            dup = (
                df.groupBy(*c.unique_cols)
                .agg((F.count("*") - 1).alias("__extra"))
                .agg(
                    F.coalesce(F.sum("__extra"), F.lit(0)).cast("long").alias(
                        "violations"
                    )
                )
                .select(F.lit(c.name).alias("check"), "violations")
            )
            parts.append(dup)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out
