"""Serve layer: versioned cached loads + the four chart queries.

Mirrors the reference dashboard's data path
(/root/reference/src/app/utils/data_loader.py:25-55 — cache keyed by
``max(_id)``; /root/reference/src/app/components/charts.py — the four
chart projections). Rendering is out of engine scope; each chart
function returns the DataFrame the chart consumes.

Scale shape: the version probe is a single-column max over the key.
The engine session enables ``spark.sql.parquet.aggregatePushdown``,
so for plain parquet the max resolves from row-group statistics
(footer metadata), not a data scan — the same cheap probe Delta gets
from its log; snapshot tables can answer it even cheaper via
``sinks.snapshots.latest_version`` (one directory listing). The cached DataFrame is ``.cache()``-pinned until the version
moves, so repeated UI interactions hit executor block storage, not
the source files.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class VersionedCache:
    """Reference T6: reload + re-cache only when ``max(version_col)``
    changes (data_loader.py:35-51)."""

    def __init__(self, load, version_col: str = "_id"):
        self._load = load            # () -> DataFrame
        self._version_col = version_col
        self._version = None
        self._df: DataFrame | None = None

    def get(self) -> DataFrame:
        fresh = self._load()
        version = fresh.agg(F.max(self._version_col)).first()[0]
        if self._df is None or version != self._version:
            if self._df is not None:
                self._df.unpersist()
            self._df = fresh.cache()
            self._version = version
        return self._df

    def invalidate(self) -> None:
        if self._df is not None:
            self._df.unpersist()
        self._df, self._version = None, None


# --- the four chart projections (charts.py:22-141) -------------------------

def fuel_mix_long(df: DataFrame, dt_col: str, fuel_cols: list[str]) -> DataFrame:
    """Chart 1 (charts.py:22-23): absolute generation, wide→long.
    Schema drift to ZERO matching columns renders an empty chart
    frame rather than raising (unpivot requires ≥1 value column)."""
    present = [c for c in fuel_cols if c in df.columns]
    if not present:
        return df.sparkSession.createDataFrame(
            [], f"`{dt_col}` {df.schema[dt_col].dataType.simpleString()}, "
                "Fuel string, value double",
        )
    return df.select(dt_col, *present).unpivot(
        ids=[dt_col], values=present, variableColumnName="Fuel", valueColumnName="value"
    )


def fuel_share_long(df: DataFrame, dt_col: str, perc_cols: list[str]) -> DataFrame:
    """Chart 2 (charts.py:55-58): % shares, wide→long, Fuel name without
    the ``_perc`` suffix."""
    present = [c for c in perc_cols if c in df.columns]
    if not present:
        return df.sparkSession.createDataFrame(
            [], f"`{dt_col}` {df.schema[dt_col].dataType.simpleString()}, "
                "Fuel string, value double",
        )
    long = df.select(dt_col, *present).unpivot(
        ids=[dt_col], values=present, variableColumnName="Fuel", valueColumnName="value"
    )
    return long.withColumn("Fuel", F.regexp_replace("Fuel", "_perc$", ""))


def carbon_split(df: DataFrame, dt_col: str,
                 gen_col: str = "GENERATION",
                 zero_carbon_col: str = "ZERO_CARBON") -> DataFrame:
    """Chart 3 (charts.py:91): derived CARBON = GENERATION − ZERO_CARBON."""
    return df.select(
        dt_col,
        F.col(zero_carbon_col),
        (F.col(gen_col) - F.col(zero_carbon_col)).alias("CARBON"),
    )


def dual_axis(df: DataFrame, dt_col: str, left_col: str, right_col: str) -> DataFrame:
    """Chart 4 (charts.py:128-141): two measures on one time axis."""
    return df.select(dt_col, left_col, right_col)


def default_date_range(min_date, max_date, interval: str = "1y"):
    """Default (start, end) selection per interval — the reference's
    date_range_selector defaults (selectors.py:39-46): 30m→7d back,
    1h→14d, 1d→13w, 1mo→5y, 1y→full range; unknown intervals fall back
    to the full range. Driver-side pure Python by design (F7): it
    parameterizes the ``filter_range`` engine query, it is not one."""
    from datetime import timedelta

    defaults = {
        "30m": max_date - timedelta(days=7),
        "1h": max_date - timedelta(days=14),
        "1d": max_date - timedelta(weeks=13),
        "1mo": max_date - timedelta(days=365 * 5),
        "1y": min_date,
    }
    start = defaults.get(interval, min_date)
    return max(start, min_date), max_date


__all__ = [
    "VersionedCache", "fuel_mix_long", "fuel_share_long", "carbon_split", "dual_axis",
    "default_date_range",
]
