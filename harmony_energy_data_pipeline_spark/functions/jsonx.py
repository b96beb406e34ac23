"""JSON column helpers for semi-structured event props.

``get_json_object`` / ``from_json`` are Catalyst expressions; for a
known schema prefer ``from_json`` so downstream field access prunes.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def json_get(col: Column | str, path: str) -> Column:
    """Extract a JSON field as string (``$.field`` path syntax)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.get_json_object(c, path)


def parse_props(df: DataFrame, col: str, schema: str) -> DataFrame:
    """Parse a JSON string column into a typed struct column
    ``{col}_parsed`` using a DDL schema string (e.g. ``"k INT"``)."""
    return df.withColumn(f"{col}_parsed", F.from_json(F.col(col), schema))
