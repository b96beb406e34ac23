"""SQL over snapshot tables — SELECT with time travel, plus the DML
write surface (CREATE TABLE AS / INSERT / UPDATE / DELETE / MERGE /
DROP) routed to the native snapshot operations.

``snapshot_sql(spark, query, tables={name: path})`` is the surface a
warehouse user expects: ANSI SQL against NAMED tables —

    SELECT * FROM orders VERSION AS OF 3
    SELECT * FROM orders TIMESTAMP AS OF '2026-08-16 12:00:00'
    CREATE TABLE hot PARTITIONED BY (day) AS SELECT ... FROM events
    INSERT INTO hot VALUES (1, 'a'), (2, 'b')
    UPDATE hot SET v = v * 2 WHERE k >= 10 AND k < 20
    DELETE FROM hot WHERE k = 7
    MERGE INTO hot USING updates ON hot.k = updates.k
      WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *

Names resolve through an explicit ``tables`` dict, a persistent
:class:`~harmony_energy_data_pipeline_spark.catalog.Catalog`, or both
(the dict wins). ``CREATE TABLE`` registers new names in the catalog
at a default location, so paths never appear in SQL.

SELECT resolution is PLAN-TIME and per-occurrence: each distinct
``(table, version)`` the query mentions becomes one frozen
``read_snapshot`` DataFrame registered as a temp view, so one query
can join a table's present against its own past (the audit/diff
shape) and a concurrent commit never tears any occurrence. Names
resolve across THREE formats — the native log, Delta, and Iceberg
(explicit catalog format or on-disk detection; a native log wins) —
and ``VERSION AS OF '<name>'`` (quoted) resolves a native table's
NAMED REF: a tag pins its version, a branch reads the branch table.
INSERT appends to wire-format tables through their own writers;
UPDATE / DELETE / MERGE on them run IN the wire format
(:func:`delta_update_where` / :func:`iceberg_delete_where` /
:func:`delta_merge_when` / :func:`iceberg_merge_when` — MOR
commits, no adoption); the remaining native-only statements refuse
with adoption guidance.

DML routes to the native ops and inherits their semantics wholesale:

* ``CREATE TABLE [IF NOT EXISTS] name [PARTITIONED BY (c, …)] AS
  select`` → :func:`snapshot_write` (overwrite; the select may time
  travel — CTAS from a historical version is the reproducible-input
  shape);
* ``INSERT INTO name [(cols)] select|VALUES …`` →
  :func:`snapshot_write` append, batch aligned to the table schema
  (missing nullable columns null-fill, types cast);
* ``UPDATE name SET c = expr, … [WHERE pred]`` →
  :func:`snapshot_update_where` — the WHERE string still PRUNES
  files when it parses as a conjunction of range clauses
  (:func:`parse_conjunctive_where`);
* ``DELETE FROM name [WHERE pred]`` → :func:`snapshot_delete_where`;
* ``MERGE INTO t USING s ON t.k = s.k WHEN …`` — the full WHEN
  surface: ``WHEN MATCHED [AND cond] THEN UPDATE SET */c=e…|DELETE``,
  ``WHEN NOT MATCHED [AND cond] THEN INSERT */(cols) VALUES (…)``,
  ``WHEN NOT MATCHED BY SOURCE [AND cond] THEN DELETE|UPDATE SET …``
  (first matching clause wins, in order). The canonical
  unconditional pair routes to :func:`snapshot_merge_into` (the
  sketch-scoped fast path); richer forms to
  :func:`snapshot_merge_when`; Delta/Iceberg targets take the SAME
  WHEN surface through :func:`delta_merge_when` /
  :func:`iceberg_merge_when` (single-commit MOR in the wire format).
  The source may be a name or a parenthesized sub-select;
* ``DROP TABLE [IF EXISTS] name`` → catalog unbind, METADATA-ONLY
  (external-table semantics: data files stay for other readers).

Time travel on a DML TARGET is refused — you cannot UPDATE the past.
DML returns a one-row DataFrame ``(operation, table, version)`` so
results compose with the rest of the facade.

Scope honestly stated: the travel clause is recognized after a
registered table name (optionally aliased) — the regex rewrite does
not parse full SQL, but it IS literal-safe: quoted string literals
are span-masked first, so a literal containing ``<name> VERSION AS
OF`` passes through untouched while the clause's own quoted operand
still resolves (the match anchors at the table name, outside the
literal).

Reference parity: the only SQL the reference itself authors is a
SELECT pushed to CKAN (src/ingest/fetch_neso.py:66-71); the DML half
here is what makes a SQL facade over a writable lakehouse usable.
"""

from __future__ import annotations

import datetime as _dt
import os
import re
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from harmony_energy_data_pipeline_spark.io import local_relation

from harmony_energy_data_pipeline_spark.catalog import Catalog
from harmony_energy_data_pipeline_spark.sinks.snapshots import (
    latest_version,
    read_snapshot,
    snapshot_delete_where,
    snapshot_merge_into,
    snapshot_update_where,
    snapshot_write,
    version_at_timestamp,
)


def _travel_pattern(name: str) -> re.Pattern:
    return re.compile(
        rf"\b{re.escape(name)}\b"
        r"(?:\s+VERSION\s+AS\s+OF\s+(?:(\d+)|'([^']+)')"
        r"|\s+TIMESTAMP\s+AS\s+OF\s+'([^']+)')?",
        re.IGNORECASE,
    )


def _ts_to_unix(ts: str) -> float:
    """Parse a travel timestamp literal AS UTC. Commit stamps are
    ``time.time()`` UTC epochs and the session pins
    ``spark.sql.session.timeZone=UTC`` — a naive ``.timestamp()``
    would read the literal in HOST-local time and shift the resolved
    instant on any non-UTC machine."""
    for fmt in ("%Y-%m-%d %H:%M:%S", "%Y-%m-%dT%H:%M:%S", "%Y-%m-%d"):
        try:
            return _dt.datetime.strptime(ts, fmt).replace(
                tzinfo=_dt.timezone.utc
            ).timestamp()
        except ValueError:
            continue
    raise ValueError(
        f"TIMESTAMP AS OF {ts!r}: use 'YYYY-MM-DD[ HH:MM:SS]'"
    )


def _literal_spans(sql: str) -> list[tuple[int, int]]:
    """Spans of quoted string literals (single or double quoted;
    doubled-quote escaping) — the regex rewrites must not fire on a
    table name that merely APPEARS inside a literal."""
    spans: list[tuple[int, int]] = []
    i, n = 0, len(sql)
    while i < n:
        ch = sql[i]
        if ch in ("'", '"'):
            j = i + 1
            while j < n:
                if sql[j] == ch:
                    if j + 1 < n and sql[j + 1] == ch:  # '' escape
                        j += 2
                        continue
                    break
                j += 1
            spans.append((i, min(j + 1, n)))
            i = j + 1
        else:
            i += 1
    return spans


def _in_spans(pos: int, spans: list[tuple[int, int]]) -> bool:
    return any(a <= pos < b for a, b in spans)


def _sub_outside_literals(pat: re.Pattern, repl, sql: str) -> str:
    """``pat.sub`` that skips matches STARTING inside a string
    literal (the travel clause's own quoted operand still matches —
    the match starts at the table name, outside the literal)."""
    spans = _literal_spans(sql)
    out, last = [], 0
    for mt in pat.finditer(sql):
        if _in_spans(mt.start(), spans):
            continue
        out.append(sql[last:mt.start()])
        out.append(repl(mt))
        last = mt.end()
    out.append(sql[last:])
    return "".join(out)


def _is_delta_only(path: str) -> bool:
    return (
        os.path.isdir(os.path.join(path, "_delta_log"))
        and not os.path.isdir(os.path.join(path, "_snapshots"))
    )


def _table_format(entry: dict) -> str:
    """The format a name resolves through: explicit catalog format,
    else on-disk detection — a native log wins (an adopted wire-format
    table evolves natively), then Delta, then Iceberg."""
    fmt = entry.get("format", "auto")
    if fmt in ("snapshot", "delta", "iceberg"):
        return fmt
    path = entry["path"]
    if os.path.isdir(os.path.join(path, "_snapshots")):
        return "snapshot"
    if os.path.isdir(os.path.join(path, "_delta_log")):
        return "delta"
    md = os.path.join(path, "metadata")
    if os.path.isdir(md) and any(
        n.endswith(".metadata.json") for n in os.listdir(md)
    ):
        return "iceberg"
    return "snapshot"


def _resolve_names(
    tables: dict[str, str] | None, catalog: Catalog | None
) -> dict[str, dict]:
    """Combined name → ``{path, format}`` map; the explicit dict wins
    over same-named catalog entries."""
    out: dict[str, dict] = {}
    if catalog is not None:
        out.update(catalog.tables())
    for name, path in (tables or {}).items():
        out[name] = {"path": path, "format": "auto"}
    return out


def _reads_delta(entry: dict) -> bool:
    return _table_format(entry) == "delta"


_TABLE_CHANGES_RE = re.compile(
    r"\bTABLE_CHANGES\s*\(\s*'?(?P<tcn>[A-Za-z_]\w*)'?\s*,\s*"
    r"(?P<tca>\d+|'[^']+')\s*(?:,\s*(?P<tcb>\d+|'[^']+'))?\s*\)",
    re.IGNORECASE,
)


def _rewrite_select(
    spark: SparkSession, query: str, resolved: dict[str, dict]
) -> str:
    """Rewrite ``query`` replacing each registered name (and optional
    travel clause) with a frozen temp view; returns the rewritten
    SQL. ``TABLE_CHANGES(name, from[, to])`` — the Delta
    ``table_changes`` table function — resolves per format to the
    row-level change feed (native feed / ``read_delta_changes`` /
    ``read_iceberg_changes``); args are versions (snapshot ids for
    Iceberg) or quoted UTC timestamps."""
    rewritten = query

    def _tc_sub(mt: re.Match) -> str:
        name = mt.group("tcn")
        entry = resolved.get(name)
        if entry is None:
            raise KeyError(
                f"TABLE_CHANGES({name!r}): name is not a registered "
                "table"
            )
        _path = entry["path"]
        fmt = _table_format(entry)

        def _arg(raw: "str | None"):
            if raw is None:
                return None
            if raw.startswith("'"):
                ts = _ts_to_unix(raw[1:-1])
                if fmt == "delta":
                    from harmony_energy_data_pipeline_spark.sources import (  # noqa: E501
                        deltalake as dl,
                    )

                    return dl.delta_version_at_timestamp(_path, ts)
                if fmt == "iceberg":
                    from harmony_energy_data_pipeline_spark.sources import (  # noqa: E501
                        iceberg as ice,
                    )

                    return ice.iceberg_snapshot_at_timestamp(_path, ts)
                return version_at_timestamp(_path, ts)
            return int(raw)

        frm = _arg(mt.group("tca"))
        to = _arg(mt.group("tcb"))
        if fmt == "delta":
            from harmony_energy_data_pipeline_spark.sources import (
                deltalake as dl,
            )

            df = dl.read_delta_changes(spark, _path, frm, to)
        elif fmt == "iceberg":
            from harmony_energy_data_pipeline_spark.sources import (
                iceberg as ice,
            )

            df = ice.read_iceberg_changes(spark, _path, frm, to)
        else:
            from harmony_energy_data_pipeline_spark.sinks.snapshots import (  # noqa: E501
                read_snapshot_changes_feed,
            )

            if to is None:
                to = latest_version(_path)
            df = read_snapshot_changes_feed(spark, _path, frm, to)
        view = f"{name}__changes_{uuid.uuid4().hex[:6]}"
        df.createOrReplaceTempView(view)
        return view

    rewritten = _sub_outside_literals(_TABLE_CHANGES_RE, _tc_sub,
                                      rewritten)
    registered: dict[tuple, str] = {}
    for name, entry in resolved.items():
        pat = _travel_pattern(name)
        fmt = _table_format(entry)

        def sub(mt: re.Match, _name=name, _path=entry["path"],
                _fmt=fmt) -> str:
            # groups: 1 = integer version / snapshot id,
            #         2 = quoted NAMED REF (tag or branch),
            #         3 = quoted timestamp
            v: "int | None" = None
            branch: "str | None" = None
            if mt.group(1) is not None:
                v = int(mt.group(1))
            elif mt.group(2) is not None:
                ref = mt.group(2)
                if _fmt == "iceberg":
                    # the spec's refs map: tag or branch name →
                    # pinned snapshot id
                    from harmony_energy_data_pipeline_spark.sources \
                        import iceberg as _ice

                    try:
                        v = _ice.iceberg_resolve_ref(_path, ref)
                    except KeyError:
                        raise KeyError(
                            f"no tag or branch {ref!r} on table "
                            f"{_name!r}"
                        ) from None
                elif _fmt != "snapshot":
                    raise ValueError(
                        f"VERSION AS OF {ref!r}: named refs resolve on "
                        f"native and iceberg tables only "
                        f"({_name} reads as {_fmt})"
                    )
                else:
                    from harmony_energy_data_pipeline_spark.sinks \
                        import refs

                    try:
                        v = refs.resolve_tag(_path, ref)
                    except KeyError:
                        if ref in refs.list_branches(_path):
                            branch = ref
                        else:
                            raise KeyError(
                                f"no tag or branch {ref!r} on table "
                                f"{_name!r}"
                            ) from None
            elif mt.group(3) is not None:
                ts = _ts_to_unix(mt.group(3))
                if _fmt == "delta":
                    from harmony_energy_data_pipeline_spark.sources import (
                        deltalake as dl,
                    )

                    v = dl.delta_version_at_timestamp(_path, ts)
                elif _fmt == "iceberg":
                    from harmony_energy_data_pipeline_spark.sources import (
                        iceberg as ice,
                    )

                    v = ice.iceberg_snapshot_at_timestamp(_path, ts)
                else:
                    v = version_at_timestamp(_path, ts)
            key = (_name, v, branch)
            if key not in registered:
                tag = re.sub(r"\W", "_", branch or f"v{v}")
                view = (
                    _name if v is None and branch is None
                    else f"{_name}__{tag}_{uuid.uuid4().hex[:6]}"
                )
                if branch is not None:
                    from harmony_energy_data_pipeline_spark.sinks import (
                        refs,
                    )

                    df = refs.read_branch(spark, _path, branch)
                elif _fmt == "delta":
                    from harmony_energy_data_pipeline_spark.sources import (
                        deltalake as dl,
                    )

                    df = dl.read_delta(spark, _path, version=v)
                elif _fmt == "iceberg":
                    from harmony_energy_data_pipeline_spark.sources import (
                        iceberg as ice,
                    )

                    df = ice.read_iceberg(spark, _path, snapshot_id=v)
                else:
                    df = read_snapshot(spark, _path, version=v)
                df.createOrReplaceTempView(view)
                registered[key] = view
            return registered[key]

        rewritten = _sub_outside_literals(pat, sub, rewritten)
    return rewritten


# --- DML parsing helpers ------------------------------------------------------------

_CREATE_RE = re.compile(
    r"^\s*CREATE\s+(?P<orr>OR\s+REPLACE\s+)?TABLE\s+"
    r"(?P<ine>IF\s+NOT\s+EXISTS\s+)?"
    r"(?P<name>[A-Za-z_]\w*)\s*"
    # one paren-nesting level so parameterized types — DECIMAL(10,2),
    # VARCHAR(8) — and transform specs — day(ts) — don't end the list
    # at their inner ')'
    r"(?:\((?P<cols>(?:[^()]|\([^()]*\))*)\)\s*)?"
    r"(?:PARTITIONED\s+BY\s*\((?P<pcols>(?:[^()]|\([^()]*\))*)\)\s*)?"
    r"(?:AS\s+(?P<select>.+))?$",
    re.IGNORECASE | re.DOTALL,
)
_INSERT_RW_RE = re.compile(
    r"^\s*INSERT\s+INTO\s+(?P<name>[A-Za-z_]\w*)\s+"
    r"REPLACE\s+WHERE\s+(?P<pred>.+?)\s+"
    r"(?P<body>(?:SELECT|WITH|VALUES)\b.+)$",
    re.IGNORECASE | re.DOTALL,
)
_RESTORE_RE = re.compile(
    r"^\s*RESTORE\s+TABLE\s+(?P<name>[A-Za-z_]\w*)\s+TO\s+"
    r"(?:VERSION\s+AS\s+OF\s+(?P<v>\d+)"
    r"|TIMESTAMP\s+AS\s+OF\s+'(?P<ts>[^']+)')\s*$",
    re.IGNORECASE,
)
_INSERT_RE = re.compile(
    r"^\s*INSERT\s+(?P<over>OVERWRITE\s+|INTO\s+)"
    r"(?P<name>[A-Za-z_]\w*)\s*"
    r"(?:\((?P<cols>[^)]*)\)\s*)?"
    r"(?P<body>(?:SELECT|WITH|VALUES)\b.+)$",
    re.IGNORECASE | re.DOTALL,
)
_UPDATE_RE = re.compile(
    r"^\s*UPDATE\s+(?P<name>[A-Za-z_]\w*)\s+SET\s+(?P<sets>.+?)"
    r"(?:\s+WHERE\s+(?P<where>.+))?$",
    re.IGNORECASE | re.DOTALL,
)
_DELETE_RE = re.compile(
    r"^\s*DELETE\s+FROM\s+(?P<name>[A-Za-z_]\w*)"
    r"(?:\s+WHERE\s+(?P<where>.+))?$",
    re.IGNORECASE | re.DOTALL,
)
_DROP_RE = re.compile(
    r"^\s*DROP\s+TABLE\s+(?P<ie>IF\s+EXISTS\s+)?(?P<name>[A-Za-z_]\w*)\s*$",
    re.IGNORECASE,
)
_MERGE_HEAD_RE = re.compile(
    r"^\s*MERGE\s+(?P<evolve>WITH\s+SCHEMA\s+EVOLUTION\s+)?"
    r"INTO\s+(?P<name>[A-Za-z_]\w*)"
    r"(?:\s+(?:AS\s+)?(?P<alias>[A-Za-z_]\w*))?\s+USING\s+",
    re.IGNORECASE,
)
_CANON_WHENS = (
    "WHEN MATCHED THEN UPDATE SET * "
    "WHEN NOT MATCHED THEN INSERT *"
)


def _split_top(s: str, sep: str = ",") -> list[str]:
    """Split on ``sep`` outside parens and quotes."""
    parts, buf, depth, q = [], [], 0, None
    for ch in s:
        if q:
            if ch == q:
                q = None
        elif ch in ("'", '"'):
            q = ch
        elif ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        elif ch == sep and depth == 0:
            parts.append("".join(buf))
            buf = []
            continue
        buf.append(ch)
    parts.append("".join(buf))
    return [p.strip() for p in parts if p.strip()]


def _refuse_target_travel(stmt: str, name: str) -> None:
    spans = _literal_spans(stmt)
    hit = any(
        not _in_spans(mt.start(), spans)
        for mt in re.finditer(
            rf"\b{re.escape(name)}\s+(?:VERSION|TIMESTAMP)\s+AS\s+OF\b",
            stmt, re.IGNORECASE,
        )
    )
    if hit:
        raise ValueError(
            f"time travel on the DML target {name!r} is not allowed — "
            "you cannot mutate a historical version (read it with "
            "SELECT … VERSION AS OF, or restore first)"
        )


def _target(resolved: dict, name: str, catalog: Catalog | None) -> dict:
    if name in resolved:
        return resolved[name]
    raise KeyError(
        f"table {name!r} is not registered (tables= dict"
        + (" or catalog" if catalog is not None else "")
        + ")"
    )


def _require_native(entry: dict, op: str) -> str:
    fmt = _table_format(entry)
    if fmt != "snapshot":
        raise ValueError(
            f"{op} targets a {fmt} wire-format table at "
            f"{entry['path']}; row-level DML runs on the native log — "
            f"adopt it first (snapshot_import_{fmt}) or use the "
            f"write_{fmt} API"
        )
    return entry["path"]


def _table_schema(spark: SparkSession, path: str):
    from pyspark.sql.types import StructType

    from harmony_energy_data_pipeline_spark.sinks import snapshots as snap

    v = latest_version(path)
    if v is None:
        raise FileNotFoundError(
            f"table at {path} has no snapshots yet — CREATE TABLE … "
            "AS SELECT first"
        )
    m = snap._read_manifest(path, v)
    if not m.get("schema"):
        return read_snapshot(spark, path, version=v).schema
    return StructType.fromJson(m["schema"])


def _align_to_schema(df: DataFrame, schema) -> DataFrame:
    """Project ``df`` onto the table schema: present columns cast to
    the table type, absent columns null-filled; EXTRA batch columns
    raise (an INSERT never silently drops data)."""
    extra = [c for c in df.columns
             if c not in {f.name for f in schema.fields}]
    if extra:
        raise ValueError(
            f"INSERT batch has columns {extra} the table lacks; "
            "evolve the schema first (snapshot_add_column)"
        )
    cols = []
    for f in schema.fields:
        if f.name in df.columns:
            cols.append(F.col(f.name).cast(f.dataType).alias(f.name))
        else:
            cols.append(F.lit(None).cast(f.dataType).alias(f.name))
    return df.select(*cols)


def _dml_result(
    spark: SparkSession, operation: str, table: str, version: int | None
) -> DataFrame:
    return local_relation(spark, 
        [(operation, table, version)],
        "operation string, table string, version bigint",
    )


def _parse_merge(stmt: str):
    """``(target, source, source_is_select, src_alias, tgt_alias,
    key, whens_text)`` — head/source/ON parsing shared by the
    canonical fast path and the rich WHEN-clause route."""
    head = _MERGE_HEAD_RE.match(stmt)
    if head is None:
        raise ValueError(
            "could not parse MERGE statement; expected MERGE INTO "
            "<table> USING <src> ON <cond> WHEN …"
        )
    rest = stmt[head.end():].lstrip()
    if rest.startswith("("):
        depth, i = 0, 0
        for i, ch in enumerate(rest):
            if ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
                if depth == 0:
                    break
        if depth != 0:
            raise ValueError("unbalanced parens in MERGE source")
        source, rest = rest[1:i].strip(), rest[i + 1:].lstrip()
        source_is_select = True
    else:
        mt = re.match(r"^([A-Za-z_]\w*)", rest)
        if mt is None:
            raise ValueError("could not parse MERGE source")
        source, rest = mt.group(1), rest[mt.end():].lstrip()
        source_is_select = False
    # optional source alias (not the ON keyword)
    mt = re.match(r"^(?:AS\s+)?([A-Za-z_]\w*)\s+", rest, re.IGNORECASE)
    src_alias = None
    if mt and mt.group(1).upper() != "ON":
        src_alias = mt.group(1)
        rest = rest[mt.end():].lstrip()
    mt = re.match(
        r"^ON\s+(?P<on>.+?)\s+(?P<whens>WHEN\s+.+)$",
        rest, re.IGNORECASE | re.DOTALL,
    )
    if mt is None:
        raise ValueError("MERGE needs ON <cond> WHEN <clauses>")
    on, whens = mt.group("on").strip(), mt.group("whens")
    key_mt = re.match(
        r"^(?:([A-Za-z_]\w*)\.)?([A-Za-z_]\w*)\s*=\s*"
        r"(?:([A-Za-z_]\w*)\.)?([A-Za-z_]\w*)$",
        on,
    )
    if key_mt is None:
        raise NotImplementedError(
            f"MERGE ON must be a single key equality (t.k = s.k); "
            f"got {on!r} — use snapshot_merge_when for anything richer"
        )
    tgt_alias = head.group("alias")
    name = head.group("name")
    q1, n1, q2, n2 = key_mt.groups()
    if n1 == n2:
        tkey = skey = n1
    else:
        # differently-named keys resolve by their qualifiers
        tq = {a for a in (tgt_alias, name) if a}
        sq = {a for a in (src_alias,
                          None if source_is_select else source) if a}
        if q1 in tq and q2 in sq:
            tkey, skey = n1, n2
        elif q1 in sq and q2 in tq:
            tkey, skey = n2, n1
        else:
            raise NotImplementedError(
                f"MERGE ON {on!r}: differently-named keys need both "
                "sides qualified by their table/alias"
            )
    return (
        name, source, source_is_select, src_alias,
        tgt_alias, tkey, skey, whens,
        head.group("evolve") is not None,
    )


_SQL_KEYWORDS = frozenset(
    "AND OR NOT NULL TRUE FALSE CASE WHEN THEN ELSE END IS IN LIKE "
    "BETWEEN CAST AS DISTINCT INTERVAL DATE TIMESTAMP T S".split()
)


def _qualify_expr(
    expr: str, tgt_cols: "set[str]", src_cols: "set[str]",
    tgt_alias: "str | None", src_alias: "str | None",
    prefer_source: bool = False,
) -> str:
    """Rewrite a MERGE clause expression into the ``t.<col>`` /
    ``s.<col>`` form :func:`snapshot_merge_when` evaluates: the
    user's aliases map onto ``t``/``s``; bare column names qualify by
    membership (target-first in MATCHED/NMBS clauses, source-first in
    INSERT clauses — the SQL resolution order). Literal-safe; names
    followed by ``(`` are function calls and pass through."""
    spans = _literal_spans(expr)
    aliases = {a for a in (tgt_alias, src_alias) if a}
    out, last = [], 0
    for mt in re.finditer(r"[A-Za-z_]\w*", expr):
        word, start, end = mt.group(0), mt.start(), mt.end()
        if _in_spans(start, spans):
            continue
        prev = expr[start - 1] if start > 0 else ""
        nxt = expr[end:].lstrip()[:1]
        if prev == ".":
            continue  # qualified tail: handled with its qualifier
        out.append(expr[last:start])
        last = end
        if nxt and nxt == ".":
            # a qualifier: the user's aliases (or raw names) → t/s
            if word == tgt_alias:
                out.append("t")
            elif word == src_alias:
                out.append("s")
            elif word in ("t", "s") and word not in aliases:
                out.append(word)  # already canonical
            else:
                out.append(word)
            continue
        if nxt == "(" or word.upper() in _SQL_KEYWORDS:
            out.append(word)
            continue
        first, second = (
            (src_cols, tgt_cols) if prefer_source
            else (tgt_cols, src_cols)
        )
        pfx = "s." if prefer_source else "t."
        pfx2 = "t." if prefer_source else "s."
        if word in first:
            out.append(pfx + word)
        elif word in second:
            out.append(pfx2 + word)
        else:
            out.append(word)
    out.append(expr[last:])
    return "".join(out)


_WHEN_SPLIT_RE = re.compile(r"\bWHEN\b", re.IGNORECASE)
_WHEN_CLAUSE_RE = re.compile(
    r"^\s*(?P<kind>NOT\s+MATCHED\s+BY\s+SOURCE"
    r"|NOT\s+MATCHED(?:\s+BY\s+TARGET)?"
    r"|MATCHED)\s*"
    r"(?:AND\s+(?P<cond>.+?)\s*)?"
    r"THEN\s+(?P<act>.+?)\s*$",
    re.IGNORECASE | re.DOTALL,
)


def _split_whens(whens: str) -> list[str]:
    """Clause texts from the WHEN… tail, split on top-level WHEN
    keywords (those inside string literals or a CASE expression's
    WHEN stay put — CASE WHENs are always preceded by CASE/paren
    nesting; we track literals and parens)."""
    spans = _literal_spans(whens)
    # find WHEN positions outside literals and outside CASE…END
    depth_case = 0
    cuts: list[int] = []
    for mt in re.finditer(r"\b(WHEN|CASE|END)\b", whens, re.IGNORECASE):
        if _in_spans(mt.start(), spans):
            continue
        w = mt.group(1).upper()
        if w == "CASE":
            depth_case += 1
        elif w == "END":
            depth_case = max(0, depth_case - 1)
        elif depth_case == 0:
            cuts.append(mt.start())
    if not cuts or cuts[0] != 0:
        raise ValueError("MERGE WHEN clauses must start with WHEN")
    cuts.append(len(whens))
    return [
        whens[cuts[i]:cuts[i + 1]].strip()[4:].strip()  # drop 'WHEN'
        for i in range(len(cuts) - 1)
    ]


def _parse_when_clauses(
    whens: str, tgt_cols: "set[str]", src_cols: "set[str]",
    tgt_alias: "str | None", src_alias: "str | None",
):
    """Parse the WHEN tail into the three
    :func:`snapshot_merge_when` clause lists, expressions rewritten
    to the ``t.``/``s.`` form."""
    matched: list[dict] = []
    not_matched: list[dict] = []
    nmbs: list[dict] = []

    def _q(e: str, prefer_source: bool = False) -> str:
        return _qualify_expr(
            e, tgt_cols, src_cols, tgt_alias, src_alias,
            prefer_source=prefer_source,
        )

    for text in _split_whens(whens):
        mt = _WHEN_CLAUSE_RE.match(text)
        if mt is None:
            raise ValueError(f"could not parse MERGE clause WHEN {text!r}")
        kind = re.sub(r"\s+", " ", mt.group("kind")).upper()
        cond, act = mt.group("cond"), mt.group("act").strip()
        is_nmbs = kind == "NOT MATCHED BY SOURCE"
        is_ins = kind.startswith("NOT MATCHED") and not is_nmbs
        qcond = (
            None if cond is None
            else _q(cond.strip(), prefer_source=is_ins)
        )
        if re.match(r"^DELETE\s*$", act, re.IGNORECASE):
            if is_ins:
                raise ValueError(
                    "WHEN NOT MATCHED cannot DELETE (nothing to delete)"
                )
            (nmbs if is_nmbs else matched).append(
                {"condition": qcond, "action": "delete"}
            )
            continue
        m2 = re.match(r"^UPDATE\s+SET\s+(.+)$", act,
                      re.IGNORECASE | re.DOTALL)
        if m2:
            if is_ins:
                raise ValueError(
                    "WHEN NOT MATCHED cannot UPDATE; use INSERT"
                )
            body = m2.group(1).strip()
            if body == "*":
                st = None
            else:
                st = {}
                for item in _split_top(body):
                    m3 = re.match(
                        r"^(?:[A-Za-z_]\w*\.)?([A-Za-z_]\w*)\s*=\s*(.+)$",
                        item, re.DOTALL,
                    )
                    if m3 is None:
                        raise ValueError(
                            f"could not parse SET clause {item!r}"
                        )
                    st[m3.group(1)] = _q(m3.group(2).strip())
            (nmbs if is_nmbs else matched).append(
                {"condition": qcond, "action": "update", "set": st}
            )
            continue
        m2 = re.match(
            r"^INSERT\s*(?:\*|\((?P<cols>[^)]*)\)\s*"
            r"VALUES\s*\((?P<vals>.*)\))\s*$",
            act, re.IGNORECASE | re.DOTALL,
        )
        if m2:
            if not is_ins:
                raise ValueError(
                    f"WHEN {kind} cannot INSERT; use UPDATE/DELETE"
                )
            if m2.group("cols") is None:
                values = None  # INSERT *
            else:
                cols = [c.strip() for c in m2.group("cols").split(",")
                        if c.strip()]
                exprs = _split_top(m2.group("vals"))
                if len(cols) != len(exprs):
                    raise ValueError(
                        f"INSERT column/value arity mismatch: "
                        f"{len(cols)} vs {len(exprs)}"
                    )
                values = {
                    c: _q(e, prefer_source=True)
                    for c, e in zip(cols, exprs)
                }
            not_matched.append({"condition": qcond, "values": values})
            continue
        raise ValueError(
            f"unsupported MERGE action {act[:60]!r}; supported: "
            "UPDATE SET */c=e…, DELETE, INSERT */(...) VALUES (...)"
        )
    return matched, not_matched, nmbs


def snapshot_sql(
    spark: SparkSession,
    query: str,
    tables: dict[str, str] | None = None,
    catalog: Catalog | None = None,
) -> DataFrame:
    """Run one SQL statement — SELECT (time travel included) or DML —
    with names resolved through ``tables`` and/or ``catalog`` (the
    dict wins on conflict). See the module docstring for the exact
    dialect. SELECT returns its result; DML returns one row
    ``(operation, table, version)``."""
    resolved = _resolve_names(tables, catalog)
    stmt = query.strip().rstrip(";").strip()
    head = stmt[:6].upper()

    if head.startswith(("SELECT", "WITH", "VALUES")) or not stmt:
        return spark.sql(_rewrite_select(spark, stmt, resolved))

    if re.match(r"^\s*EXPLAIN\b", stmt, re.IGNORECASE):
        # EXPLAIN [EXTENDED|FORMATTED|...] <select>: table names (and
        # travel clauses) rewrite exactly as for SELECT, then Spark's
        # own EXPLAIN renders the plan — the facade user's way to
        # check pushdown/pruning without leaving SQL
        return spark.sql(_rewrite_select(spark, stmt, resolved))

    mt = re.match(
        r"^\s*(?:UPDATE|DELETE\s+FROM|INSERT\s+(?:INTO|OVERWRITE)"
        r"|MERGE\s+INTO)\s+"
        r"([A-Za-z_]\w*)\s+(?:VERSION|TIMESTAMP)\s+AS\s+OF\b",
        stmt, re.IGNORECASE,
    )
    if mt:
        _refuse_target_travel(
            f"{mt.group(1)} VERSION AS OF", mt.group(1)
        )

    mt = re.match(
        r"^\s*CREATE\s+TABLE\s+(?P<name>[A-Za-z_]\w*)\s+"
        r"SHALLOW\s+CLONE\s+(?P<src>[A-Za-z_]\w*)\s*$",
        stmt, re.IGNORECASE,
    )
    if mt:
        # zero-copy clone: one commit referencing the source's live
        # files by absolute path (Delta wire format only)
        name, src_name = mt.group("name"), mt.group("src")
        src_entry = _target(resolved, src_name, catalog)
        if _table_format(src_entry) != "delta":
            raise ValueError(
                f"SHALLOW CLONE sources a {_table_format(src_entry)} "
                "table; only delta tables clone"
            )
        if name in resolved:
            dst_path = resolved[name]["path"]
        elif catalog is not None:
            dst_path = catalog.register(name, format="delta")
        else:
            raise KeyError(
                f"CREATE TABLE {name}: name is unregistered and no "
                "catalog was passed to place it"
            )
        from harmony_energy_data_pipeline_spark.sources import (
            deltalake as dl,
        )

        v = dl.delta_clone(spark, src_entry["path"], dst_path)
        return _dml_result(spark, "clone", name, v)

    mt = _CREATE_RE.match(stmt)
    if mt:
        name = mt.group("name")
        if name in resolved:
            entry = resolved[name]
            path = entry["path"]
        elif catalog is not None:
            path = catalog.register(name)
            entry = {"path": path, "format": "auto"}
        else:
            raise KeyError(
                f"CREATE TABLE {name}: name is unregistered and no "
                "catalog was passed to place it"
            )
        fmt = _table_format(entry)
        if mt.group("orr") and mt.group("ine"):
            raise ValueError(
                "CREATE OR REPLACE and IF NOT EXISTS are mutually "
                "exclusive"
            )
        exists = (
            latest_version(path) is not None
            or _is_delta_only(path)
            or (fmt == "iceberg"
                and os.path.isdir(os.path.join(path, "metadata")))
        )
        if exists and not mt.group("orr"):
            if mt.group("ine"):
                return _dml_result(
                    spark, "create_skipped", name, latest_version(path)
                )
            raise FileExistsError(
                f"table {name!r} already exists at {path} "
                "(use IF NOT EXISTS, CREATE OR REPLACE, or DROP "
                "TABLE first)"
            )
        pcols = None
        if mt.group("pcols"):
            # paren-aware split: PARTITIONED BY (day(ts), region)
            pcols = [c.strip() for c in _split_top(mt.group("pcols"))
                     if c.strip()]
        if mt.group("cols") and mt.group("select"):
            raise ValueError(
                "CREATE TABLE takes a column list OR AS SELECT, "
                "not both"
            )
        if mt.group("cols"):
            # explicit-schema DDL: an EMPTY table with the declared
            # columns (INSERT fills it; the native log handles
            # zero-row versions)
            from pyspark.sql.types import (
                CharType,
                StringType,
                StructField,
                StructType,
                VarcharType,
            )

            ddl = ", ".join(_split_top(mt.group("cols")))
            st = StructType.fromDDL(ddl)
            # CHAR(n)/VARCHAR(n) store as plain strings (Spark's own
            # table behavior; createDataFrame refuses raw char types)
            st = StructType([
                StructField(
                    f.name,
                    StringType()
                    if isinstance(f.dataType, (CharType, VarcharType))
                    else f.dataType,
                    f.nullable,
                )
                for f in st.fields
            ])
            df = local_relation(spark, [], st)
        elif mt.group("select"):
            df = spark.sql(
                _rewrite_select(spark, mt.group("select"), resolved)
            )
        else:
            raise ValueError(
                "CREATE TABLE needs a column list (c type, ...) or "
                "AS SELECT"
            )
        if fmt == "delta":
            from harmony_energy_data_pipeline_spark.sources import (
                deltalake as dl,
            )

            v = dl.write_delta(
                df, path, mode="overwrite", partition_by=pcols
            )
        elif fmt == "iceberg":
            from harmony_energy_data_pipeline_spark.sources import (
                iceberg as ice,
            )

            v = ice.write_iceberg(
                df, path, mode="overwrite", partition_by=pcols
            )
        else:
            v = snapshot_write(
                df, path, mode="overwrite", partition_by=pcols,
                stats_cols=None,
            )
        return _dml_result(
            spark, "replace" if (exists and mt.group("orr"))
            else "create", name, v,
        )

    mt = _RESTORE_RE.match(stmt)
    if mt:
        from harmony_energy_data_pipeline_spark.sinks.snapshots import (
            snapshot_restore,
        )

        name = mt.group("name")
        entry = _target(resolved, name, catalog)
        fmt = _table_format(entry)
        path = entry["path"]
        if fmt == "delta":
            from harmony_energy_data_pipeline_spark.sources import (
                deltalake as dl,
            )

            tv = (int(mt.group("v")) if mt.group("v") is not None
                  else dl.delta_version_at_timestamp(
                      path, _ts_to_unix(mt.group("ts"))))
            v, _nf = dl.delta_restore(spark, path, tv)
            return _dml_result(spark, "restore", name, v)
        if fmt == "iceberg":
            from harmony_energy_data_pipeline_spark.sources import (
                iceberg as ice,
            )

            sid = (int(mt.group("v")) if mt.group("v") is not None
                   else ice.iceberg_snapshot_at_timestamp(
                       path, _ts_to_unix(mt.group("ts"))))
            v = ice.iceberg_restore(path, sid)
            return _dml_result(spark, "restore", name, v)
        tv = (int(mt.group("v")) if mt.group("v") is not None
              else version_at_timestamp(path, _ts_to_unix(mt.group("ts"))))
        v = snapshot_restore(path, tv)
        return _dml_result(spark, "restore", name, v)

    mt = _INSERT_RW_RE.match(stmt)
    if mt:
        # the Delta ``INSERT INTO t REPLACE WHERE pred SELECT …``
        # shape: ONE atomic commit = delete the predicate region ⊕
        # insert the batch — the idempotent backfill primitive
        from harmony_energy_data_pipeline_spark.sinks.snapshots import (
            snapshot_replace_where,
        )

        name = mt.group("name")
        _refuse_target_travel(stmt, name)
        entry = _target(resolved, name, catalog)
        fmt = _table_format(entry)
        path = entry["path"]
        if fmt == "delta":
            from harmony_energy_data_pipeline_spark.sources import (
                deltalake as dl,
            )

            schema = dl.read_delta(spark, path).schema
        elif fmt == "iceberg":
            from harmony_energy_data_pipeline_spark.sources import (
                iceberg as ice,
            )

            schema = ice.read_iceberg(spark, path).schema
        else:
            schema = _table_schema(spark, path)
        body = mt.group("body").strip()
        if body.upper().startswith("VALUES"):
            names = [f.name for f in schema.fields]
            body = (
                f"SELECT * FROM ({body}) AS __ins({', '.join(names)})"
            )
        df = _align_to_schema(
            spark.sql(_rewrite_select(spark, body, resolved)), schema
        )
        if fmt == "delta":
            v, _nd = dl.delta_replace_where(
                spark, path, mt.group("pred").strip(), df
            )
        elif fmt == "iceberg":
            v, _nd = ice.iceberg_replace_where(
                spark, path, mt.group("pred").strip(), df
            )
        else:
            v = snapshot_replace_where(
                spark, path, mt.group("pred").strip(), df
            )
        return _dml_result(spark, "replace_where", name, v)

    mt = _INSERT_RE.match(stmt)
    if mt:
        name = mt.group("name")
        overwrite = mt.group("over").strip().upper() == "OVERWRITE"
        _refuse_target_travel(stmt, name)
        entry = _target(resolved, name, catalog)
        body = mt.group("body").strip()
        cols = None
        if mt.group("cols"):
            cols = [c.strip() for c in mt.group("cols").split(",")
                    if c.strip()]
        fmt = _table_format(entry)
        if fmt == "delta":
            from harmony_energy_data_pipeline_spark.sources import (
                deltalake as dl,
            )

            schema = dl.read_delta(spark, entry["path"]).schema
        elif fmt == "iceberg":
            from harmony_energy_data_pipeline_spark.sources import (
                iceberg as ice,
            )

            schema = ice.read_iceberg(spark, entry["path"]).schema
        else:
            schema = _table_schema(spark, entry["path"])
        if body.upper().startswith("VALUES"):
            names = cols or [f.name for f in schema.fields]
            body = (
                f"SELECT * FROM ({body}) AS __ins({', '.join(names)})"
            )
        elif cols:
            body = f"SELECT * FROM ({body}) AS __ins({', '.join(cols)})"
        df = _align_to_schema(
            spark.sql(_rewrite_select(spark, body, resolved)), schema
        )
        wmode = "overwrite" if overwrite else "append"
        if fmt == "delta":
            from harmony_energy_data_pipeline_spark.sources import (
                deltalake as dl,
            )

            v = dl.write_delta(df, entry["path"], mode=wmode)
        elif fmt == "iceberg":
            from harmony_energy_data_pipeline_spark.sources import (
                iceberg as ice,
            )

            v = ice.write_iceberg(df, entry["path"], mode=wmode)
        else:
            v = snapshot_write(df, entry["path"], mode=wmode)
        return _dml_result(
            spark, "insert_overwrite" if overwrite else "insert",
            name, v,
        )

    mt = _UPDATE_RE.match(stmt)
    if mt:
        name = mt.group("name")
        _refuse_target_travel(stmt, name)
        entry = _target(resolved, name, catalog)
        set_exprs: dict[str, str] = {}
        for item in _split_top(mt.group("sets")):
            m2 = re.match(r"^([A-Za-z_]\w*)\s*=\s*(.+)$", item, re.DOTALL)
            if m2 is None:
                raise ValueError(f"could not parse SET clause {item!r}")
            set_exprs[m2.group(1)] = m2.group(2).strip()
        where = (mt.group("where") or "true").strip()
        if _table_format(entry) == "delta":
            # MOR update in the wire format: old positions DV out,
            # transformed rows re-append — one commit, no adoption
            from harmony_energy_data_pipeline_spark.sources import (
                deltalake as dl,
            )

            v, _n = dl.delta_update_where(
                spark, entry["path"], where, set_exprs
            )
            return _dml_result(spark, "update", name, v)
        if _table_format(entry) == "iceberg":
            # the Iceberg twin: one snapshot carrying the
            # position-delete AND data manifests
            from harmony_energy_data_pipeline_spark.sources import (
                iceberg as ice,
            )

            sid, _n = ice.iceberg_update_where(
                spark, entry["path"], where, set_exprs
            )
            return _dml_result(spark, "update", name, sid)
        path = _require_native(entry, "UPDATE")
        v = snapshot_update_where(spark, path, where, set_exprs)
        return _dml_result(spark, "update", name, v)

    mt = _DELETE_RE.match(stmt)
    if mt:
        name = mt.group("name")
        _refuse_target_travel(stmt, name)
        entry = _target(resolved, name, catalog)
        where = (mt.group("where") or "true").strip()
        if _table_format(entry) == "delta":
            # MOR delete IN the wire format: matching positions land
            # in spec deletion vectors — no adoption, no data rewrite
            from harmony_energy_data_pipeline_spark.sources import (
                deltalake as dl,
            )

            v, _n = dl.delta_delete_where(spark, entry["path"], where)
            return _dml_result(spark, "delete", name, v)
        if _table_format(entry) == "iceberg":
            # the Iceberg twin: one spec position-delete snapshot
            from harmony_energy_data_pipeline_spark.sources import (
                iceberg as ice,
            )

            sid, _n = ice.iceberg_delete_where(
                spark, entry["path"], where
            )
            return _dml_result(spark, "delete", name, sid)
        path = _require_native(entry, "DELETE")
        v = snapshot_delete_where(spark, path, where)
        return _dml_result(spark, "delete", name, v)

    mt = _DROP_RE.match(stmt)
    if mt:
        name = mt.group("name")
        if catalog is None:
            raise ValueError(
                "DROP TABLE needs a catalog (the binding is what gets "
                "dropped; data files stay — external-table semantics)"
            )
        try:
            catalog.unregister(name)
        except KeyError:
            if not mt.group("ie"):
                raise
            return _dml_result(spark, "drop_skipped", name, None)
        return _dml_result(spark, "drop", name, None)

    if re.match(r"^\s*MERGE\b", stmt, re.IGNORECASE):
        (name, source, is_select, src_alias, tgt_alias, key, skey,
         whens, evolve) = _parse_merge(stmt)
        _refuse_target_travel(stmt, name)
        entry = _target(resolved, name, catalog)
        fmt = _table_format(entry)
        path = entry["path"]
        if is_select:
            src_df = spark.sql(_rewrite_select(spark, source, resolved))
        else:
            src_df = spark.sql(
                _rewrite_select(spark, f"SELECT * FROM {source}", resolved)
            )
        # SQL literals arrive as whatever type the parser picked
        # (e.g. DECIMAL for -1.0) — cast same-named source columns to
        # the TABLE's types so a literal never widens the table schema
        if fmt == "delta":
            from harmony_energy_data_pipeline_spark.sources import (
                deltalake as dl,
            )

            schema = dl.read_delta(spark, path).schema
        elif fmt == "iceberg":
            from harmony_energy_data_pipeline_spark.sources import (
                iceberg as ice,
            )

            schema = ice.read_iceberg(spark, path).schema
        else:
            schema = _table_schema(spark, path)
        ttypes = {f.name: f.dataType for f in schema.fields}
        src_df = src_df.select(*[
            F.col(c).cast(ttypes[c]).alias(c) if c in ttypes
            else F.col(c)
            for c in src_df.columns
        ])
        if fmt in ("delta", "iceberg"):
            # MERGE IN the wire format: one MOR commit — matched/NMBS
            # rows position-delete (Iceberg) / DV out (Delta),
            # clause-produced rows append. WITH SCHEMA EVOLUTION
            # lands new source columns as the format's own
            # metadata-only add-column commit first.
            tgt_cols = {f.name for f in schema.fields}
            if evolve:
                tgt_cols |= set(src_df.columns)
            m_cl, nm_cl, nmbs_cl = _parse_when_clauses(
                whens,
                tgt_cols=tgt_cols,
                src_cols=set(src_df.columns),
                tgt_alias=tgt_alias or name,
                src_alias=src_alias or (None if is_select else source),
            )
            if fmt == "delta":
                v, _n = dl.delta_merge_when(
                    spark, path, src_df, key=key, matched=m_cl,
                    not_matched=nm_cl, not_matched_by_source=nmbs_cl,
                    source_key=skey if skey != key else None,
                    evolve_schema=evolve,
                )
            else:
                v, _n = ice.iceberg_merge_when(
                    spark, path, src_df, key=key, matched=m_cl,
                    not_matched=nm_cl, not_matched_by_source=nmbs_cl,
                    source_key=skey if skey != key else None,
                    evolve_schema=evolve,
                )
            return _dml_result(spark, "merge", name, v)
        canon = re.sub(r"\s+", " ", whens).strip().upper()
        if canon == _CANON_WHENS:
            # canonical unconditional upsert: the sketch-scoped fast
            # path with source-wins semantics. WITH SCHEMA EVOLUTION
            # maps to the native evolve_schema (source columns the
            # table lacks are ADDED; absent ones NULL-fill).
            # A differently-named source key renames onto the
            # target's (the upsert writes it as the target column).
            if skey != key:
                if key in src_df.columns:
                    raise ValueError(
                        f"MERGE ON {name}.{key} = …{skey}: the source "
                        f"also has a column {key!r}; rename one side"
                    )
                src_df = src_df.withColumnRenamed(skey, key)
                if key in ttypes:
                    src_df = src_df.withColumn(
                        key, F.col(key).cast(ttypes[key])
                    )
            v = snapshot_merge_into(
                spark, path, src_df, key=key, evolve_schema=evolve
            )
            return _dml_result(spark, "merge", name, v)
        from harmony_energy_data_pipeline_spark.sinks.snapshots import (
            snapshot_merge_when,
        )

        # WITH SCHEMA EVOLUTION + rich WHEN clauses: new source
        # columns are about to be ADDED, so clause expressions may
        # already reference them as target columns
        tgt_cols = {f.name for f in schema.fields}
        if evolve:
            tgt_cols |= set(src_df.columns)
        m_cl, nm_cl, nmbs_cl = _parse_when_clauses(
            whens,
            tgt_cols=tgt_cols,
            src_cols=set(src_df.columns),
            tgt_alias=tgt_alias or name,
            src_alias=src_alias or (None if is_select else source),
        )
        v = snapshot_merge_when(
            spark, path, src_df, key=key, matched=m_cl,
            not_matched=nm_cl, not_matched_by_source=nmbs_cl,
            source_key=skey if skey != key else None,
            evolve_schema=evolve,
        )
        return _dml_result(spark, "merge", name, v)

    mt = re.match(
        r"^\s*ALTER\s+TABLE\s+(?P<name>[A-Za-z_]\w*)\s+(?P<rest>.+)$",
        stmt, re.IGNORECASE | re.DOTALL,
    )
    if mt:
        name, rest = mt.group("name"), mt.group("rest").strip()
        _refuse_target_travel(stmt, name)
        entry = _target(resolved, name, catalog)
        fmt = _table_format(entry)
        m2 = re.match(
            r"^ADD\s+COLUMN\s+([A-Za-z_]\w*)\s+(.+)$", rest,
            re.IGNORECASE,
        )
        if m2 and fmt in ("delta", "iceberg"):
            # ADD COLUMN lands as the wire format's own metadata-only
            # schema commit (field ids allocated per each spec's
            # evolution rules)
            if fmt == "delta":
                from harmony_energy_data_pipeline_spark.sources import (
                    deltalake as dl,
                )

                v = dl.delta_add_columns(
                    entry["path"], {m2.group(1): m2.group(2).strip()}
                )
            else:
                from harmony_energy_data_pipeline_spark.sources import (
                    iceberg as ice,
                )

                v = ice.iceberg_add_columns(
                    entry["path"], {m2.group(1): m2.group(2).strip()}
                )
            return _dml_result(spark, "add_column", name, v)
        m2 = re.match(
            r"^RENAME\s+COLUMN\s+([A-Za-z_]\w*)\s+TO\s+"
            r"([A-Za-z_]\w*)\s*$",
            rest, re.IGNORECASE,
        )
        if m2 and fmt in ("delta", "iceberg"):
            # metadata-only in both formats: Iceberg renames the
            # field over its immutable id (+ name-mapping for
            # foreign readers), Delta relabels over a stable
            # physicalName (column mapping enabled in the same
            # commit when absent)
            if fmt == "delta":
                from harmony_energy_data_pipeline_spark.sources import (
                    deltalake as dl,
                )

                v = dl.delta_rename_column(
                    entry["path"], m2.group(1), m2.group(2)
                )
            else:
                from harmony_energy_data_pipeline_spark.sources import (
                    iceberg as ice,
                )

                v = ice.iceberg_rename_column(
                    entry["path"], m2.group(1), m2.group(2)
                )
            return _dml_result(spark, "rename_column", name, v)
        m2 = re.match(
            r"^DROP\s+COLUMN\s+([A-Za-z_]\w*)\s*$", rest,
            re.IGNORECASE,
        )
        if m2 and fmt in ("delta", "iceberg"):
            if fmt == "delta":
                from harmony_energy_data_pipeline_spark.sources import (
                    deltalake as dl,
                )

                v = dl.delta_drop_column(entry["path"], m2.group(1))
            else:
                from harmony_energy_data_pipeline_spark.sources import (
                    iceberg as ice,
                )

                v = ice.iceberg_drop_column(entry["path"], m2.group(1))
            return _dml_result(spark, "drop_column", name, v)
        m2 = re.match(
            r"^ALTER\s+COLUMN\s+([A-Za-z_]\w*)\s+SET\s+GENERATED\s+"
            r"(?:ALWAYS\s+)?AS\s*\((.+)\)\s*$",
            rest, re.IGNORECASE | re.DOTALL,
        )
        if m2 and fmt == "delta":
            # delta.generationExpression: existing rows verified,
            # future batches compute-on-absent / validate-on-present
            from harmony_energy_data_pipeline_spark.sources import (
                deltalake as dl,
            )

            v = dl.delta_set_generated_column(
                spark, entry["path"], m2.group(1),
                m2.group(2).strip(),
            )
            return _dml_result(spark, "set_generated", name, v)
        m2 = re.match(
            r"^ALTER\s+COLUMN\s+([A-Za-z_]\w*)\s+TYPE\s+(.+)$",
            rest, re.IGNORECASE,
        )
        if m2 and fmt in ("delta", "iceberg"):
            # metadata-only widening: Delta records the change under
            # the typeWidening feature, Iceberg promotes the field
            # type over its id — old files keep narrow pages, the
            # vectorized reader upcasts on scan
            if fmt == "delta":
                from harmony_energy_data_pipeline_spark.sources import (
                    deltalake as dl,
                )

                v = dl.delta_widen_column(
                    entry["path"], m2.group(1), m2.group(2).strip()
                )
            else:
                from harmony_energy_data_pipeline_spark.sources import (
                    iceberg as ice,
                )

                v = ice.iceberg_widen_column(
                    entry["path"], m2.group(1), m2.group(2).strip()
                )
            return _dml_result(spark, "widen_column", name, v)
        m2 = re.match(
            r"^ADD\s+CONSTRAINT\s+(?:([A-Za-z_]\w*)\s+)?CHECK\s*"
            r"\((.+)\)\s*$",
            rest, re.IGNORECASE | re.DOTALL,
        )
        if m2 and fmt == "delta":
            # delta.constraints.<name>: verified against existing
            # rows, enforced on every subsequent write/DML
            from harmony_energy_data_pipeline_spark.sources import (
                deltalake as dl,
            )

            cname = m2.group(1)
            if not cname:
                _a, meta_c, _p, _v = dl._replay(entry["path"], None)
                cname = f"chk_{len(dl._table_constraints(meta_c))}"
            v = dl.delta_add_check_constraint(
                spark, entry["path"], cname, m2.group(2).strip()
            )
            return _dml_result(spark, "add_constraint", name, v)
        m2 = re.match(
            r"^DROP\s+CONSTRAINT\s+([A-Za-z_]\w*)\s*$", rest,
            re.IGNORECASE,
        )
        if m2 and fmt == "delta":
            from harmony_energy_data_pipeline_spark.sources import (
                deltalake as dl,
            )

            v = dl.delta_drop_constraint(entry["path"], m2.group(1))
            return _dml_result(spark, "drop_constraint", name, v)
        m2 = re.match(
            r"^CREATE\s+(TAG|BRANCH)\s+'([^']+)'\s*$", rest,
            re.IGNORECASE,
        )
        if m2 and fmt == "iceberg":
            from harmony_energy_data_pipeline_spark.sources import (
                iceberg as ice,
            )

            kind = m2.group(1).lower()
            v = ice.iceberg_create_ref(entry["path"], m2.group(2),
                                       kind=kind)
            return _dml_result(spark, f"create_{kind}", name, v)
        m2 = re.match(
            r"^DROP\s+(TAG|BRANCH)\s+'([^']+)'\s*$", rest,
            re.IGNORECASE,
        )
        if m2 and fmt == "iceberg":
            from harmony_energy_data_pipeline_spark.sources import (
                iceberg as ice,
            )

            ice.iceberg_drop_ref(entry["path"], m2.group(2))
            return _dml_result(
                spark, f"drop_{m2.group(1).lower()}", name, None
            )
        m2 = re.match(
            r"^SET\s+PARTITION\s+SPEC\s*\((.*)\)\s*$", rest,
            re.IGNORECASE | re.DOTALL,
        )
        if m2 and fmt == "iceberg":
            # metadata-only spec evolution: existing files keep
            # pruning under their own spec, future appends land
            # under the new default. Entries split on TOP-LEVEL
            # commas only — bucket(4, c) carries its own
            from harmony_energy_data_pipeline_spark.sources import (
                iceberg as ice,
            )

            cols, depth, cur = [], 0, []
            for ch in m2.group(1):
                if ch in "([":
                    depth += 1
                elif ch in ")]":
                    depth -= 1
                if ch == "," and depth == 0:
                    cols.append("".join(cur).strip())
                    cur = []
                else:
                    cur.append(ch)
            if "".join(cur).strip():
                cols.append("".join(cur).strip())
            v = ice.iceberg_set_partition_spec(entry["path"], cols)
            return _dml_result(spark, "set_partition_spec", name, v)
        path = _require_native(entry, "ALTER TABLE")
        from harmony_energy_data_pipeline_spark.sinks import refs
        from harmony_energy_data_pipeline_spark.sinks import (
            snapshots as _snap,
        )

        m2 = re.match(
            r"^ADD\s+COLUMN\s+([A-Za-z_]\w*)\s+(.+)$", rest,
            re.IGNORECASE,
        )
        if m2:
            v = _snap.snapshot_add_column(
                path, m2.group(1), m2.group(2).strip()
            )
            return _dml_result(spark, "add_column", name, v)
        m2 = re.match(
            r"^RENAME\s+COLUMN\s+([A-Za-z_]\w*)\s+TO\s+([A-Za-z_]\w*)\s*$",
            rest, re.IGNORECASE,
        )
        if m2:
            v = _snap.snapshot_rename_column(
                path, m2.group(1), m2.group(2)
            )
            return _dml_result(spark, "rename_column", name, v)
        m2 = re.match(
            r"^DROP\s+COLUMN\s+([A-Za-z_]\w*)\s*$", rest, re.IGNORECASE
        )
        if m2:
            v = _snap.snapshot_drop_column(path, m2.group(1))
            return _dml_result(spark, "drop_column", name, v)
        m2 = re.match(
            r"^ALTER\s+COLUMN\s+([A-Za-z_]\w*)\s+TYPE\s+(.+)$",
            rest, re.IGNORECASE,
        )
        if m2:
            v = _snap.snapshot_widen_column(
                path, m2.group(1), m2.group(2).strip()
            )
            return _dml_result(spark, "widen_column", name, v)
        m2 = re.match(
            r"^SET\s+PARTITION\s+SPEC\s*\(([^)]*)\)\s*$", rest,
            re.IGNORECASE,
        )
        if m2:
            cols = [c.strip() for c in m2.group(1).split(",")
                    if c.strip()]
            v = _snap.snapshot_set_partition_spec(path, cols)
            return _dml_result(spark, "set_partition_spec", name, v)
        m2 = re.match(
            r"^ADD\s+CONSTRAINT\s+CHECK\s*\((.+)\)\s*$", rest,
            re.IGNORECASE | re.DOTALL,
        )
        if m2:
            cur = _snap._read_manifest_raw(
                path, latest_version(path)
            ).get("constraints") or []
            v = _snap.snapshot_set_constraints(
                spark, path, list(cur) + [m2.group(1).strip()]
            )
            return _dml_result(spark, "add_constraint", name, v)
        if re.match(r"^DROP\s+CONSTRAINTS\s*$", rest, re.IGNORECASE):
            v = _snap.snapshot_set_constraints(spark, path, [])
            return _dml_result(spark, "drop_constraints", name, v)
        m2 = re.match(
            r"^CREATE\s+(TAG|BRANCH)\s+'([^']+)'\s*$", rest,
            re.IGNORECASE,
        )
        if m2:
            kind = m2.group(1).lower()
            if kind == "tag":
                v = refs.create_tag(path, m2.group(2))
                return _dml_result(spark, "create_tag", name, v)
            refs.create_branch(path, m2.group(2))
            return _dml_result(spark, "create_branch", name, None)
        m2 = re.match(
            r"^DROP\s+(TAG|BRANCH)\s+'([^']+)'\s*$", rest, re.IGNORECASE
        )
        if m2:
            if m2.group(1).lower() == "tag":
                refs.delete_tag(path, m2.group(2))
                return _dml_result(spark, "drop_tag", name, None)
            refs.drop_branch(path, m2.group(2))
            return _dml_result(spark, "drop_branch", name, None)
        raise ValueError(
            f"unsupported ALTER TABLE clause {rest[:50]!r}; supported: "
            "ADD COLUMN, RENAME COLUMN … TO, DROP COLUMN, ALTER COLUMN "
            "… TYPE, SET PARTITION SPEC (…), ADD CONSTRAINT CHECK (…), "
            "DROP CONSTRAINTS, CREATE/DROP TAG '…', CREATE/DROP "
            "BRANCH '…'"
        )

    if re.match(r"^\s*SHOW\s+TABLES\s*$", stmt, re.IGNORECASE):
        rows = sorted(
            (n, e["path"], _table_format(e)) for n, e in resolved.items()
        )
        return local_relation(spark, 
            rows or [(None, None, None)],
            "table string, path string, format string",
        ).filter(F.col("table").isNotNull())

    mt = re.match(
        r"^\s*DESCRIBE\s+HISTORY\s+(?P<name>[A-Za-z_]\w*)\s*$",
        stmt, re.IGNORECASE,
    )
    if mt:
        from harmony_energy_data_pipeline_spark.sinks.snapshots import (
            snapshot_history,
        )

        name = mt.group("name")
        entry = _target(resolved, name, catalog)
        fmt = _table_format(entry)
        if fmt == "delta":
            from harmony_energy_data_pipeline_spark.sources import (
                deltalake as dl,
            )

            rows = [
                (h.get("version"), None, h.get("operation"), None)
                for h in dl.delta_history(entry["path"])
            ]
            return local_relation(spark, 
                rows, "version bigint, parent bigint, "
                      "operation string, n_files bigint",
            )
        if fmt == "iceberg":
            from harmony_energy_data_pipeline_spark.sources import (
                iceberg as ice,
            )

            rows = [
                (h.get("snapshot_id"), None, h.get("operation"), None)
                for h in ice.iceberg_history(entry["path"])
            ]
            return local_relation(spark, 
                rows, "version bigint, parent bigint, "
                      "operation string, n_files bigint",
            )
        path = _require_native(entry, "DESCRIBE HISTORY")
        rows = [
            (h.get("version"), h.get("parent"), h.get("operation"),
             h.get("n_files"))
            for h in snapshot_history(path)
        ]
        return local_relation(spark, 
            rows, "version bigint, parent bigint, operation string, "
                  "n_files bigint",
        )

    mt = re.match(
        r"^\s*DESCRIBE\s+DETAIL\s+(?P<name>[A-Za-z_]\w*)\s*$",
        stmt, re.IGNORECASE,
    )
    if mt:
        # one metadata-only row: format, location, live file
        # count/bytes, partition layout — the Delta DESCRIBE DETAIL
        # shape, answered for every registered format without
        # touching a data file
        name = mt.group("name")
        entry = _target(resolved, name, catalog)
        fmt = _table_format(entry)
        p = entry["path"]
        if fmt == "delta":
            from harmony_energy_data_pipeline_spark.sources import (
                deltalake as dl,
            )

            adds, meta_d, _pr, _v = dl._replay(p, None)
            n_files = len(adds)
            size = sum(int(a.get("size") or 0) for a in adds)
            pcols = list(meta_d.get("partitionColumns") or [])
        elif fmt == "iceberg":
            from harmony_energy_data_pipeline_spark.sources import (
                iceberg as ice,
            )

            data, _dels = ice.live_files(p)
            n_files = len(data)
            size = sum(
                int(d.get("file_size_in_bytes") or 0) for d in data
            )
            meta_i = ice.table_metadata(p)
            try:
                pcols = ice._spec_to_partition_by(meta_i) or []
            except Exception:
                pcols = []
        else:
            import os as _os

            from harmony_energy_data_pipeline_spark.sinks import (
                snapshots as _snap,
            )

            v = _snap.latest_version(p)
            man = _snap._read_manifest_raw(p, v) if v is not None \
                else {}
            files = list(man.get("files") or [])
            n_files = len(files)
            size = 0
            for f in files:
                fp = _os.path.join(p, f)
                if _os.path.exists(fp):
                    size += _os.path.getsize(fp)
            pcols = list(man.get("partition_cols") or [])
        return local_relation(spark, 
            [(fmt, p, n_files, size, ",".join(pcols) or None)],
            "format string, location string, num_files bigint, "
            "size_bytes bigint, partition_columns string",
        )

    mt = re.match(
        r"^\s*SHOW\s+TBLPROPERTIES\s+(?P<name>[A-Za-z_]\w*)\s*$",
        stmt, re.IGNORECASE,
    )
    if mt:
        name = mt.group("name")
        entry = _target(resolved, name, catalog)
        fmt = _table_format(entry)
        p = entry["path"]
        if fmt == "delta":
            from harmony_energy_data_pipeline_spark.sources import (
                deltalake as dl,
            )

            _a, meta_d, _pr, _v = dl._replay(p, None)
            props = dict(meta_d.get("configuration") or {})
        elif fmt == "iceberg":
            from harmony_energy_data_pipeline_spark.sources import (
                iceberg as ice,
            )

            props = dict(
                ice.table_metadata(p).get("properties") or {}
            )
        else:
            import json as _json

            from harmony_energy_data_pipeline_spark.sinks import (
                snapshots as _snap,
            )

            v = _snap.latest_version(p)
            man = _snap._read_manifest_raw(p, v) if v is not None \
                else {}
            props = {}
            for k in ("partition_cols", "bucket_spec",
                      "generated_cols", "constraints",
                      "dropped_cols"):
                if man.get(k):
                    props[k] = _json.dumps(man[k])
        rows = sorted(props.items()) or [(None, None)]
        return local_relation(spark, 
            rows, "key string, value string",
        ).filter(F.col("key").isNotNull())

    mt = re.match(
        r"^\s*DESCRIBE\s+(?:TABLE\s+)?(?P<name>[A-Za-z_]\w*)\s*$",
        stmt, re.IGNORECASE,
    )
    if mt:
        name = mt.group("name")
        entry = _target(resolved, name, catalog)
        fmt = _table_format(entry)
        if fmt == "delta":
            from harmony_energy_data_pipeline_spark.sources import (
                deltalake as dl,
            )

            schema = dl.read_delta(spark, entry["path"]).schema
        elif fmt == "iceberg":
            from harmony_energy_data_pipeline_spark.sources import (
                iceberg as ice,
            )

            schema = ice.read_iceberg(spark, entry["path"]).schema
        else:
            schema = _table_schema(spark, entry["path"])
        return local_relation(spark, 
            [(f.name, f.dataType.simpleString(), f.nullable)
             for f in schema.fields],
            "col_name string, data_type string, nullable boolean",
        )

    mt = re.match(
        r"^\s*SHOW\s+CREATE\s+TABLE\s+(?P<name>[A-Za-z_]\w*)\s*$",
        stmt, re.IGNORECASE,
    )
    if mt:
        name = mt.group("name")
        entry = _target(resolved, name, catalog)
        fmt = _table_format(entry)
        if fmt == "delta":
            from harmony_energy_data_pipeline_spark.sources import (
                deltalake as dl,
            )

            schema = dl.read_delta(spark, entry["path"]).schema
            pcols = []
        elif fmt == "iceberg":
            from harmony_energy_data_pipeline_spark.sources import (
                iceberg as ice,
            )

            schema = ice.read_iceberg(spark, entry["path"]).schema
            meta = ice.table_metadata(entry["path"])
            spec = next(
                (sp for sp in meta.get("partition-specs", [])
                 if sp["spec-id"] == meta.get("default-spec-id", 0)),
                {"fields": []},
            )
            pcols = [f["name"] for f in spec.get("fields", [])]
        else:
            from harmony_energy_data_pipeline_spark.sinks import (
                snapshots as _snap,
            )

            schema = _table_schema(spark, entry["path"])
            m = _snap._read_manifest(
                entry["path"], latest_version(entry["path"])
            )
            pcols = list(m.get("partition_cols") or [])
        cols = ",\n  ".join(
            f"{f.name} {f.dataType.simpleString().upper()}"
            + ("" if f.nullable else " NOT NULL")
            for f in schema.fields
        )
        ddl = f"CREATE TABLE {name} (\n  {cols}\n)"
        if pcols:
            ddl += f"\nPARTITIONED BY ({', '.join(pcols)})"
        ddl += f"\nUSING {fmt}\nLOCATION '{entry['path']}'"
        return local_relation(spark, 
            [(ddl,)], "createtab_stmt string"
        )

    mt = re.match(
        r"^\s*OPTIMIZE\s+(?P<name>[A-Za-z_]\w*)"
        r"(?:\s+ZORDER\s+BY\s*\((?P<zcols>[^)]*)\))?\s*$",
        stmt, re.IGNORECASE,
    )
    if mt:
        from harmony_energy_data_pipeline_spark.sinks.snapshots import (
            snapshot_compact,
        )

        name = mt.group("name")
        zcols = [c.strip() for c in (mt.group("zcols") or "").split(",")
                 if c.strip()] or None
        entry = _target(resolved, name, catalog)
        fmt = _table_format(entry)
        if fmt == "delta":
            from harmony_energy_data_pipeline_spark.sources import (
                deltalake as dl,
            )

            v = dl.delta_optimize(spark, entry["path"],
                                  zorder_by=zcols)
            return _dml_result(spark, "optimize", name, v)
        if fmt == "iceberg":
            from harmony_energy_data_pipeline_spark.sources import (
                iceberg as ice,
            )

            v = ice.iceberg_compact(spark, entry["path"],
                                    zorder_by=zcols)
            return _dml_result(spark, "optimize", name, v)
        path = _require_native(entry, "OPTIMIZE")
        v = snapshot_compact(spark, path, zorder_by=zcols)
        return _dml_result(spark, "optimize", name, v)

    mt = re.match(
        r"^\s*VACUUM\s+(?P<name>[A-Za-z_]\w*)"
        r"(?:\s+RETAIN\s+(?P<n>\d+)\s+VERSIONS)?\s*$",
        stmt, re.IGNORECASE,
    )
    if mt:
        from harmony_energy_data_pipeline_spark.sinks.snapshots import (
            vacuum,
        )

        name = mt.group("name")
        entry = _target(resolved, name, catalog)
        if _table_format(entry) == "delta":
            # the wire format has its own retention contract
            # (deletedFileRetentionDuration); RETAIN n VERSIONS is a
            # native-log notion and does not apply
            from harmony_energy_data_pipeline_spark.sources import (
                deltalake as dl,
            )

            if mt.group("n"):
                raise ValueError(
                    "VACUUM ... RETAIN n VERSIONS is the native "
                    "log's retention; Delta tables vacuum by time "
                    "(delta_vacuum retention_s)"
                )
            removed = len(dl.delta_vacuum(entry["path"]))
            return local_relation(spark, 
                [("vacuum", name, None, removed)],
                "operation string, table string, version bigint, "
                "removed_files bigint",
            )
        if _table_format(entry) == "iceberg":
            from harmony_energy_data_pipeline_spark.sources import (
                iceberg as ice,
            )

            removed = len(ice.iceberg_expire_snapshots(
                entry["path"], keep_last=int(mt.group("n") or 1)
            ))
            return local_relation(spark, 
                [("vacuum", name, None, removed)],
                "operation string, table string, version bigint, "
                "removed_files bigint",
            )
        path = _require_native(entry, "VACUUM")
        removed = vacuum(
            path, keep_last=int(mt.group("n") or 1)
        )
        # a removed-file COUNT is not a table version — report it in
        # its own column so the (operation, table, version) contract
        # stays unambiguous
        return local_relation(spark, 
            [("vacuum", name, None, removed)],
            "operation string, table string, version bigint, "
            "removed_files bigint",
        )

    mt = re.match(
        r"^\s*ANALYZE\s+(?:TABLE\s+)?(?P<name>[A-Za-z_]\w*)\s*$",
        stmt, re.IGNORECASE,
    )
    if mt:
        from harmony_energy_data_pipeline_spark.sinks.analyze import (
            snapshot_analyze,
        )

        name = mt.group("name")
        path = _require_native(_target(resolved, name, catalog),
                               "ANALYZE")
        v = snapshot_analyze(spark, path)
        return _dml_result(spark, "analyze", name, v)

    raise ValueError(
        f"unsupported statement (first tokens {stmt[:40]!r}); this "
        "facade speaks SELECT/WITH/VALUES, CREATE [OR REPLACE] TABLE "
        "(cols)|… AS, INSERT INTO [REPLACE WHERE], INSERT OVERWRITE, "
        "UPDATE, DELETE FROM, MERGE [WITH SCHEMA EVOLUTION] INTO, "
        "RESTORE TABLE … TO VERSION/TIMESTAMP AS OF, DROP TABLE, "
        "DESCRIBE HISTORY, SHOW TABLES, DESCRIBE, OPTIMIZE, VACUUM "
        "[RETAIN n VERSIONS], ANALYZE"
    )


def snapshot_sql_script(
    spark: SparkSession,
    script: str,
    tables: dict[str, str] | None = None,
    catalog: Catalog | None = None,
) -> DataFrame:
    """Run ``;``-separated statements in order (each through
    :func:`snapshot_sql`); returns the LAST statement's result — the
    ETL-script shape (CREATE → INSERT → UPDATE → … → final SELECT)."""
    out: DataFrame | None = None
    for stmt in _split_top(script, sep=";"):
        out = snapshot_sql(spark, stmt, tables=tables, catalog=catalog)
    if out is None:
        raise ValueError("empty SQL script")
    return out


__all__ = ["snapshot_sql", "snapshot_sql_script"]
