"""Spark 4 Python DataSource over a SQLite database file — the
reference's actual serve store (S5/S6:
/root/reference/src/serve/load.py writes SQLite/Postgres via
SQLAlchemy; /root/reference/src/app/utils/data_loader.py:25-33 reads
it back with ``SELECT ... ORDER BY``). This source scans the same
storage natively from Spark, JDBC-style but pure stdlib:

- **Partitioned scan**: the table is split into ``numPartitions``
  rowid ranges at planning time (one cheap min/max query), so
  executors read disjoint slices concurrently — the classic JDBC
  ``partitionColumn/lowerBound/upperBound`` pattern.
- **Predicate pushdown**: simple comparison/null filters are
  translated to a SQL WHERE and evaluated INSIDE SQLite (b-tree
  indexes apply), not post-scan; ``pushFilters`` yields anything it
  can't translate back to Spark.

Usage:
    spark.dataSource.register(SqliteTableDataSource)
    (spark.read.format("sqlite_table")
        .schema("event_id BIGINT, value DOUBLE")
        .option("path", "/data/app.db").option("table", "events")
        .load())
"""

from __future__ import annotations

import json
import os
import sqlite3
import tempfile
import uuid
from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    EqualTo,
    GreaterThan,
    GreaterThanOrEqual,
    InputPartition,
    IsNotNull,
    IsNull,
    LessThan,
    LessThanOrEqual,
    WriterCommitMessage,
)
from pyspark.sql.types import StructType

_OPS = {
    EqualTo: "=",
    GreaterThan: ">",
    GreaterThanOrEqual: ">=",
    LessThan: "<",
    LessThanOrEqual: "<=",
}


def _quote_ident(name: str) -> str:
    return '"' + name.replace('"', '""') + '"'


@dataclass
class RowidRange(InputPartition):
    lo: int  # inclusive
    hi: int  # inclusive


class SqliteTableReader(DataSourceReader):
    def __init__(self, options, schema: StructType):
        self.path = options["path"]
        self.table = options["table"]
        self.num_partitions = int(options.get("numpartitions", 4))
        self.fields = [f.name for f in schema.fields]
        self.where: list[str] = []
        self.params: list = []

    def pushFilters(self, filters):
        for f in filters:
            op = _OPS.get(type(f))
            if op is not None and len(f.attribute) == 1:
                self.where.append(f"{_quote_ident(f.attribute[0])} {op} ?")
                self.params.append(f.value)
            elif isinstance(f, IsNull) and len(f.attribute) == 1:
                self.where.append(f"{_quote_ident(f.attribute[0])} IS NULL")
            elif isinstance(f, IsNotNull) and len(f.attribute) == 1:
                self.where.append(f"{_quote_ident(f.attribute[0])} IS NOT NULL")
            else:
                yield f  # untranslatable — Spark re-evaluates post-scan

    def partitions(self):
        con = sqlite3.connect(self.path)
        try:
            lo, hi = con.execute(
                f"SELECT MIN(rowid), MAX(rowid) FROM {_quote_ident(self.table)}"
            ).fetchone()
        finally:
            con.close()
        if lo is None:
            return [RowidRange(0, -1)]
        n = max(1, self.num_partitions)
        span = hi - lo + 1
        step = max(1, span // n)
        parts = []
        start = lo
        while start <= hi:
            end = hi if len(parts) == n - 1 else min(hi, start + step - 1)
            parts.append(RowidRange(start, end))
            start = end + 1
        return parts

    def read(self, partition: RowidRange):
        cols = ", ".join(_quote_ident(c) for c in self.fields)
        where = " AND ".join(["rowid BETWEEN ? AND ?", *self.where])
        con = sqlite3.connect(self.path)
        try:
            cur = con.execute(
                f"SELECT {cols} FROM {_quote_ident(self.table)} WHERE {where}",
                [partition.lo, partition.hi, *self.params],
            )
            yield from cur
        finally:
            con.close()


@dataclass
class StagedFile(WriterCommitMessage):
    path: str
    n_rows: int


class SqliteUpsertWriter(DataSourceWriter):
    """Keyed-upsert sink with a stage-then-commit protocol: SQLite is a
    single-writer store, so executor tasks never touch the database —
    each stages its partition as a JSONL file and the COMMIT applies
    every staged file in ONE driver-side transaction with
    ``INSERT OR REPLACE`` (primary key = ``key`` option). The write is
    therefore atomic (all-or-nothing across partitions) and idempotent
    (rerunning replaces the same keys) — the reference's S4 upsert
    contract (/root/reference/src/serve/load.py:14-51) against its own
    store, expressed as a Spark sink commit protocol.

    Deployment constraint (inherited from SQLite itself): the staging
    directory must be visible to BOTH executors and driver — local
    mode or a shared filesystem. ``commit`` fails loudly with the
    offending path if a staged file is unreachable, instead of
    applying a partial batch. (A multi-node deployment without shared
    storage should write to parquet and export, or point ``stagedir``
    at network storage — SQLite as the TARGET already implies a
    single-machine serving boundary, exactly the reference's.)"""

    def __init__(self, options, schema: StructType):
        self.path = options["path"]
        self.table = options["table"]
        self.key = options.get("key", "_id")
        self.fields = [f.name for f in schema.fields]
        self.stage_dir = options.get(
            "stagedir", os.path.join(tempfile.gettempdir(), "sqlite_stage")
        )

    @staticmethod
    def _jsonable(v):
        """SQLite-compatible JSON staging for non-JSON row types:
        datetime/date → ISO-8601 text (how SQLite stores DATETIME —
        and how the reference's ORM round-trips it), Decimal → str
        (exact), bytes → hex text."""
        import datetime
        import decimal

        if isinstance(v, (datetime.datetime, datetime.date)):
            return v.isoformat(sep=" ") if isinstance(v, datetime.datetime) else v.isoformat()
        if isinstance(v, decimal.Decimal):
            return str(v)
        if isinstance(v, (bytes, bytearray)):
            return v.hex()
        return v

    def write(self, rows) -> StagedFile:
        os.makedirs(self.stage_dir, exist_ok=True)
        path = os.path.join(self.stage_dir, f"stage_{uuid.uuid4().hex}.jsonl")
        n = 0
        with open(path, "w") as fh:
            for row in rows:
                fh.write(json.dumps([self._jsonable(v) for v in row]) + "\n")
                n += 1
        return StagedFile(path=path, n_rows=n)

    def commit(self, messages) -> None:
        missing = [m.path for m in messages if not os.path.exists(m.path)]
        if missing:
            raise FileNotFoundError(
                "staged partition files unreachable from the driver "
                f"(stagedir must be on a driver-visible filesystem): {missing[:3]}"
            )
        qt = _quote_ident(self.table)
        cols = ", ".join(_quote_ident(c) for c in self.fields)
        col_defs = ", ".join(
            _quote_ident(c)
            + (" PRIMARY KEY" if c == self.key else "")
            for c in self.fields
        )
        con = sqlite3.connect(self.path)
        try:
            con.execute(f"CREATE TABLE IF NOT EXISTS {qt} ({col_defs})")
            con.execute("BEGIN")
            for m in messages:
                with open(m.path) as fh:
                    con.executemany(
                        f"INSERT OR REPLACE INTO {qt} ({cols}) "
                        f"VALUES ({', '.join('?' for _ in self.fields)})",
                        (json.loads(line) for line in fh),
                    )
            con.commit()
        finally:
            con.close()
        for m in messages:
            os.unlink(m.path)

    def abort(self, messages) -> None:
        for m in messages:
            if m is not None and os.path.exists(m.path):
                os.unlink(m.path)


class SqliteTableDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "sqlite_table"

    def schema(self) -> str:
        if "schema" not in self.options:
            raise ValueError("sqlite_table requires .schema(...) or a schema option")
        return self.options["schema"]

    def reader(self, schema: StructType) -> SqliteTableReader:
        return SqliteTableReader(self.options, schema)

    def writer(self, schema: StructType, overwrite: bool) -> SqliteUpsertWriter:
        if overwrite:
            raise ValueError("sqlite_table sink is upsert-only; use mode('append')")
        return SqliteUpsertWriter(self.options, schema)


def write_sqlite_table(
    db_path: str, table: str, columns: list[str], rows: list[tuple]
) -> None:
    """Test/materialization helper: (re)create ``table`` with the given
    rows. Column affinity is left to SQLite (dynamic typing); readers
    declare the Spark schema explicitly."""
    os.makedirs(os.path.dirname(db_path) or ".", exist_ok=True)
    con = sqlite3.connect(db_path)
    try:
        qt = _quote_ident(table)
        con.execute(f"DROP TABLE IF EXISTS {qt}")
        con.execute(
            f"CREATE TABLE {qt} ({', '.join(_quote_ident(c) for c in columns)})"
        )
        con.executemany(
            f"INSERT INTO {qt} VALUES ({', '.join('?' for _ in columns)})", rows
        )
        con.commit()
    finally:
        con.close()


__all__ = [
    "SqliteTableDataSource", "SqliteTableReader", "SqliteUpsertWriter",
    "write_sqlite_table",
]
