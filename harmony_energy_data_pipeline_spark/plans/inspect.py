"""Physical-plan inspection helpers — the engine's "did Catalyst do
what we designed for?" feedback loop. Tests assert on these so scans
keep their pushed filters / pruned schemas and joins keep their
broadcast strategy as the code evolves.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def physical_plan(df: DataFrame) -> str:
    """The formatted physical plan as a string."""
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "formatted"
    )


def has_pushed_filter(df: DataFrame, fragment: str) -> bool:
    """True if the parquet scan carries a pushed filter mentioning
    ``fragment`` (e.g. a column name)."""
    plan = physical_plan(df)
    return any(
        fragment in line
        for line in plan.splitlines()
        if "PushedFilters" in line
    )


def read_schema_columns(df: DataFrame) -> list[str]:
    """Column names in the scan's ReadSchema — the columns actually
    read off disk (column-pruning check)."""
    import re

    plan = physical_plan(df)
    cols: list[str] = []
    for line in plan.splitlines():
        if "ReadSchema" in line:
            cols.extend(re.findall(r"(\w+):", line.split("struct<", 1)[-1]))
    return cols


def in_wholestage_codegen(df: DataFrame, operator: str) -> bool:
    """True if ``operator`` (e.g. "Project", "HashAggregate") appears
    inside a whole-stage-codegen span — the formatted plan prefixes
    codegen'd operators with ``*``."""
    plan = physical_plan(df)
    return any(
        line.strip().lstrip(":+- ").startswith(f"* {operator}")
        for line in plan.splitlines()
    )


def uses_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in physical_plan(df) or "BroadcastNestedLoopJoin" in physical_plan(df)


def shuffle_count(df: DataFrame) -> int:
    """Number of shuffle-exchange operators in the physical plan.

    Counts tree nodes ``Exchange (N)`` — the formatted explain repeats
    every node in a details section (``(N) Exchange``), which must not
    double-count. Broadcast and reused exchanges are not shuffles and
    are excluded.
    """
    import re

    plan = physical_plan(df)
    return sum(
        1 for line in plan.splitlines()
        if re.search(r"\bExchange \(\d+\)", line)
        and "BroadcastExchange" not in line
        and "ReusedExchange" not in line
    )
