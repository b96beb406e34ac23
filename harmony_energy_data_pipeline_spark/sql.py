"""SQL over snapshot tables, time travel included.

``snapshot_sql(spark, query, tables={name: path})`` is the SELECT
surface a warehouse user expects: write ANSI SQL against named
snapshot tables and travel with the Delta/Iceberg syntax —

    SELECT * FROM orders VERSION AS OF 3
    SELECT * FROM orders TIMESTAMP AS OF '2026-08-16 12:00:00'

Resolution is PLAN-TIME and per-occurrence: each distinct
``(table, version)`` the query mentions becomes one frozen
``read_snapshot`` DataFrame registered as a temp view, so one query
can join a table's present against its own past (the audit/diff
shape) and a concurrent commit never tears any occurrence.

Scope honestly stated: the travel clause is recognized after a
registered table name (optionally aliased) — the regex rewrite does
not parse full SQL, so a string literal containing ``<name> VERSION
AS OF`` would be rewritten too; keep such literals out of queries run
through this facade (the standard caveat of every lightweight SQL
preprocessor).
"""

from __future__ import annotations

import datetime as _dt
import re
import uuid

from pyspark.sql import DataFrame, SparkSession

from harmony_energy_data_pipeline_spark.sinks.snapshots import (
    read_snapshot,
    version_at_timestamp,
)


def _travel_pattern(name: str) -> re.Pattern:
    return re.compile(
        rf"\b{re.escape(name)}\b"
        r"(?:\s+VERSION\s+AS\s+OF\s+(\d+)"
        r"|\s+TIMESTAMP\s+AS\s+OF\s+'([^']+)')?",
        re.IGNORECASE,
    )


def _ts_to_unix(ts: str) -> float:
    for fmt in ("%Y-%m-%d %H:%M:%S", "%Y-%m-%dT%H:%M:%S", "%Y-%m-%d"):
        try:
            return _dt.datetime.strptime(ts, fmt).timestamp()
        except ValueError:
            continue
    raise ValueError(
        f"TIMESTAMP AS OF {ts!r}: use 'YYYY-MM-DD[ HH:MM:SS]'"
    )


def _is_delta_only(path: str) -> bool:
    import os

    return (
        os.path.isdir(os.path.join(path, "_delta_log"))
        and not os.path.isdir(os.path.join(path, "_snapshots"))
    )


def snapshot_sql(
    spark: SparkSession, query: str, tables: dict[str, str]
) -> DataFrame:
    """Run ``query`` with each name in ``tables`` resolved to its
    table (latest version, or the version/timestamp the query's
    travel clause names). A path holding only a ``_delta_log``
    resolves through the Delta wire-format reader — one SQL surface,
    time travel included, over BOTH table formats (an adopted table's
    native log wins). Returns the result DataFrame."""
    rewritten = query
    registered: dict[tuple, str] = {}
    for name, path in tables.items():
        pat = _travel_pattern(name)
        is_delta = _is_delta_only(path)

        def sub(mt: re.Match, _name=name, _path=path,
                _delta=is_delta) -> str:
            v: int | None
            if mt.group(1) is not None:
                v = int(mt.group(1))
            elif mt.group(2) is not None:
                ts = _ts_to_unix(mt.group(2))
                if _delta:
                    from harmony_energy_data_pipeline_spark.sources import (
                        deltalake as dl,
                    )

                    v = dl.delta_version_at_timestamp(_path, ts)
                else:
                    v = version_at_timestamp(_path, ts)
            else:
                v = None
            key = (_name, v)
            if key not in registered:
                view = (
                    _name if v is None
                    else f"{_name}__v{v}_{uuid.uuid4().hex[:6]}"
                )
                if _delta:
                    from harmony_energy_data_pipeline_spark.sources import (
                        deltalake as dl,
                    )

                    df = dl.read_delta(spark, _path, version=v)
                else:
                    df = read_snapshot(spark, _path, version=v)
                df.createOrReplaceTempView(view)
                registered[key] = view
            return registered[key]

        rewritten = pat.sub(sub, rewritten)
    return spark.sql(rewritten)


__all__ = ["snapshot_sql"]
