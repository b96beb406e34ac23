"""Lenient file-format sources: CSV and JSON-lines with explicit
schemas and corrupt-record capture.

The reference coerces malformed input to nulls instead of failing
(``strict=False`` on every parse — reference
``src/transform/transform.py:128,134``). These readers generalize that
contract to file ingestion: PERMISSIVE mode with an explicit
``_corrupt_record`` column, so one bad row never kills a 100 TB scan,
and the quarantined raw text stays queryable for repair/audit.

Always pass an explicit schema: schema inference is a second full scan
of the input (fatal at scale) and can silently flip types between
daily drops. ``stored as parquet`` remains the engine's native format
— these readers exist for the landing zone.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

CORRUPT_COL = "_corrupt_record"


def _with_corrupt(schema: T.StructType) -> T.StructType:
    """Schema plus the corrupt-record capture column (idempotent)."""
    if CORRUPT_COL in schema.fieldNames():
        return schema
    return T.StructType(list(schema.fields) + [T.StructField(CORRUPT_COL, T.StringType())])


def read_csv_lenient(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    header: bool = True,
    **options,
) -> DataFrame:
    """CSV scan that never throws on malformed rows: unparseable rows
    come back with data columns null and the raw line in
    ``_corrupt_record``. Splittable and predicate/projection-prunable
    like any file scan (column pruning still reads the full line — CSV
    is row-major; convert to parquet for hot paths)."""
    return spark.read.csv(
        path,
        schema=_with_corrupt(schema),
        header=header,
        mode="PERMISSIVE",
        columnNameOfCorruptRecord=CORRUPT_COL,
        **options,
    )


def read_jsonl_lenient(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    **options,
) -> DataFrame:
    """JSON-lines scan with the same quarantine contract as
    :func:`read_csv_lenient`. Missing fields are null (not corrupt);
    only syntactically invalid JSON lands in ``_corrupt_record``."""
    return spark.read.json(
        path,
        schema=_with_corrupt(schema),
        mode="PERMISSIVE",
        columnNameOfCorruptRecord=CORRUPT_COL,
        **options,
    )


def split_corrupt(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(clean, quarantine): clean rows without the capture column, and
    full rows (raw text + null data columns) for every row that failed
    to parse.

    The quarantine keeps all columns deliberately: Spark refuses plans
    that reference ONLY ``_corrupt_record`` from a raw CSV/JSON scan
    (QUERY_ONLY_CORRUPT_RECORD_COLUMN — pruning to just the capture
    column would skip the parse that populates it)."""
    clean = df.filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    quarantine = df.filter(F.col(CORRUPT_COL).isNotNull())
    return clean, quarantine


__all__ = [
    "CORRUPT_COL",
    "read_csv_lenient",
    "read_jsonl_lenient",
    "split_corrupt",
]
