"""Incremental keyset-paginated sources.

The reference ingests by looping
``SELECT * FROM <resource> WHERE _id > {cursor} ORDER BY _id LIMIT {n}``
against a remote CKAN datastore, advancing the cursor to the last _id
of each page and stopping on a short page
(/root/reference/src/ingest/fetch_neso.py:42-97). That pattern splits
into two Spark-native pieces:

1. ``incremental_scan`` — the keyset predicate+sort+limit as a
   DataFrame plan over any Catalyst source. The ``_id > cursor``
   filter lands in PushedFilters and ``orderBy().limit()`` plans as
   TakeOrderedAndProject (distributed top-k), so a page fetch reads
   only the new tail of the table even at 100 TB.
2. ``paginate`` / ``fetch_http_pages`` — the driver-side cursor loop.
   For HTTP sources the loop stays on the driver (like the
   reference); each page then becomes a micro-batch via
   ``records_to_df``.
"""

from __future__ import annotations

import json
import time
import urllib.error
import urllib.parse
import urllib.request
from collections.abc import Callable, Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def incremental_scan(
    df: DataFrame,
    cursor_col: str,
    last_value,
    batch_size: int | None = None,
) -> DataFrame:
    """Keyset page: ``WHERE cursor > last ORDER BY cursor [LIMIT n]``
    (fetch_neso.py:66-71). Filter pushes to the scan; the limit plans
    as a distributed top-k, not a global sort."""
    out = df.filter(F.col(cursor_col) > F.lit(last_value)).orderBy(cursor_col)
    if batch_size is not None:
        out = out.limit(batch_size)
    return out


def resume_cursor(df: DataFrame, cursor_col: str, default=0):
    """Read the resume cursor from the sink itself: ``max(cursor)``
    (/root/reference/src/pipeline/run.py:19-21)."""
    row = df.agg(F.max(cursor_col).alias("v")).first()
    v = row["v"] if row else None
    return default if v is None else v


def paginate(
    fetch_page: Callable[[int, int], list[dict]],
    last_id: int = 0,
    batch_size: int = 30_000,
    max_records: int | None = None,
    id_key: str = "_id",
) -> list[dict]:
    """Driver-side keyset pagination loop (fetch_neso.py:42-97):
    advance the cursor to the last id of each page; stop on an empty
    or short page, or once ``max_records`` is reached.

    ``fetch_page(last_id, limit) -> records`` abstracts the transport
    so tests can inject a fake; ``fetch_http_pages`` supplies the real
    HTTP one.
    """
    records: list[dict] = []
    cursor = last_id
    while True:
        limit = batch_size
        if max_records is not None:
            limit = min(limit, max_records - len(records))
            if limit <= 0:
                break
        page = fetch_page(cursor, limit)
        if not page:
            break
        records.extend(page)
        cursor = page[-1][id_key]
        if len(page) < limit:
            break
    return records


def http_get_json(
    url: str,
    params: dict | None = None,
    timeout: float = 60.0,
    max_tries: int = 5,
    backoff_base: float = 1.0,
    sleep=time.sleep,
) -> dict:
    """GET with exponential backoff and an envelope ``success`` check
    (fetch_neso.py:17-35). Driver-side concern — Spark task retries
    cover executor-side failures; this covers the driver's own fetch.
    """
    full = url if not params else f"{url}?{urllib.parse.urlencode(params)}"
    last_err: Exception | None = None
    for attempt in range(max_tries):
        try:
            with urllib.request.urlopen(full, timeout=timeout) as resp:
                payload = json.loads(resp.read().decode("utf-8"))
            if not payload.get("success", False):
                raise RuntimeError(f"API envelope success=false for {url}")
            return payload
        except (urllib.error.URLError, TimeoutError, RuntimeError, json.JSONDecodeError) as e:
            last_err = e
            if attempt < max_tries - 1:
                sleep(backoff_base * (2 ** attempt))
    raise RuntimeError(f"GET {url} failed after {max_tries} tries") from last_err


def fetch_http_pages(
    base_url: str,
    resource_id: str,
    *,
    timeout: float = 60.0,
) -> Callable[[int, int], list[dict]]:
    """Build a ``fetch_page`` for a CKAN-style datastore_search_sql
    endpoint: the keyset SQL is pushed to the REMOTE engine, exactly
    the reference's only authored SQL (fetch_neso.py:66-71)."""

    def fetch_page(last_id: int, limit: int) -> list[dict]:
        sql = (
            f'SELECT * FROM "{resource_id}" '
            f'WHERE "_id" > {int(last_id)} '
            f'ORDER BY "_id" ASC LIMIT {int(limit)}'
        )
        payload = http_get_json(base_url, {"sql": sql}, timeout=timeout)
        return payload.get("result", {}).get("records", [])

    return fetch_page


def records_to_df(
    spark: SparkSession,
    records: list[dict],
    schema: T.StructType,
) -> DataFrame:
    """JSON records → DataFrame with a declared schema
    (transform.py:35 — schema override instead of inference).

    Values are passed through Row construction leniently: for
    STRING-typed fields, non-string JSON values (a CKAN page can emit
    ``25000.5`` where the raw schema says string) are stringified here
    rather than tripping ``createDataFrame``'s type verifier — the
    actual parse/repair stays with the cleaning layer's
    try_cast/try_to_timestamp, so the raw schema should be
    string-typed for dirty fields (schemas.GENERATION_RAW_SCHEMA).
    """
    def lenient(v, dt):
        if v is not None and isinstance(dt, T.StringType) and not isinstance(v, str):
            return str(v)
        return v

    rows = [
        tuple(lenient(r.get(f.name), f.dataType) for f in schema.fields)
        for r in records
    ]
    return spark.createDataFrame(rows, schema)


def micro_batches(
    fetch_page: Callable[[int, int], list[dict]],
    spark: SparkSession,
    schema: T.StructType,
    last_id: int = 0,
    batch_size: int = 30_000,
    id_key: str = "_id",
) -> Iterator[DataFrame]:
    """Yield each keyset page as one micro-batch DataFrame — the
    incremental-batch analogue of a streaming source (SURVEY.md §2.10
    T2); feed to ``sinks.upsert.merge_upsert`` per batch."""
    cursor = last_id
    while True:
        page = fetch_page(cursor, batch_size)
        if not page:
            return
        yield records_to_df(spark, page, schema)
        cursor = page[-1][id_key]
        if len(page) < batch_size:
            return
