"""Round-6 end-to-end rehearsal (VERDICT r5 #8): the full reference
lifecycle — keyset ingest → transform chain → merge upsert →
run-history audit → serve queries — composed as ONE integration flow
at the 10× fixture volume, asserting row counts, audit rows, and a
serve-side digest.

The unit suite exercises each stage in isolation on tens of rows; this
test is the "does the composition hold at volume" check: hundreds of
thousands of keyset-fetched records through the same
``pipeline.run.run_pipeline`` seam the reference's hourly job uses
(reference: src/pipeline/run.py:13-51), then the serve layer reads the
table the pipeline produced.
"""

from __future__ import annotations

import os
import time

import numpy as np
import pytest
from pyspark.sql import functions as F

from harmony_energy_data_pipeline_spark.io import load_table
from harmony_energy_data_pipeline_spark.pipeline.run import run_pipeline
from harmony_energy_data_pipeline_spark.serve import VersionedCache, fuel_mix_long

SCALE10 = "/tmp/scale10"

INITIAL_ROWS = 240_000
INCREMENTAL_ROWS = 60_000
MALFORMED_EVERY = 997  # every Nth _id ships a garbage DATETIME


@pytest.fixture(scope="module")
def feed(spark):
    """A keyset-paginated generation feed derived deterministically
    from the 10× events fixture: compact columnar base on the driver,
    dict pages materialized per fetch (so driver memory holds one page
    of dicts, not the corpus)."""
    if not os.path.isdir(SCALE10):
        pytest.skip(f"10x fixture not present at {SCALE10}")
    base = (
        load_table(spark, "events", SCALE10)
        .select("event_id", "ts", "value")
        .orderBy("event_id")
        .limit(INITIAL_ROWS + INCREMENTAL_ROWS)
        .toPandas()
    )
    # keyset cursors start at 0, so ids must be >= 1 (an id-0 row
    # would sit below the initial cursor forever)
    ids = base["event_id"].to_numpy() + 1
    # generation data is a half-hourly series with UNIQUE timestamps
    # (the transform's phase-2 dedup keeps one row per DATETIME, by
    # design) — synthesize the series from _id, not the event ts,
    # which the replicated fixture duplicates across copies
    epoch = np.datetime64("2020-01-01T00:00:00")
    vals = base["value"].to_numpy()

    def fetch_page(last_id, limit):
        lo = np.searchsorted(ids, last_id, side="right")
        hi = min(lo + limit, len(ids))
        out = []
        for i in range(lo, hi):
            _id = int(ids[i])
            rec = {
                "_id": _id,
                "DATETIME": "not-a-timestamp" if _id % MALFORMED_EVERY == 0
                else str(epoch + np.timedelta64(1800 * _id, "s")),
                "GAS": str(round(float(vals[i]), 3)),
                "WIND": str(round(float(vals[i]) * 0.5, 3)),
                "GENERATION": str(round(float(vals[i]) * 1.5, 3)),
            }
            out.append(rec)
        return out

    return ids, fetch_page


@pytest.mark.slow  # ~45 s scale rehearsal
def test_pipeline_rehearsal_10x(spark, tmp_path, feed):
    ids, fetch_page = feed
    table = str(tmp_path / "generation")
    hist = str(tmp_path / "run_history")
    t0 = time.monotonic()

    # -- run 1: initial backfill of the first INITIAL_ROWS ids ---------
    cutoff = int(ids[INITIAL_ROWS - 1])

    def fetch_initial(last_id, limit):
        page = fetch_page(last_id, limit)
        return [r for r in page if r["_id"] <= cutoff]

    m1 = run_pipeline(spark, fetch_initial, table, hist, batch_size=30_000)
    assert m1["total_fetched"] == INITIAL_ROWS
    assert m1["last_fetched_id"] == cutoff
    n_malformed_1 = int(sum(1 for i in ids[:INITIAL_ROWS]
                            if i % MALFORMED_EVERY == 0))
    assert m1["valid_records"] == INITIAL_ROWS - n_malformed_1

    # -- run 2: incremental tail resumes from the sink's cursor --------
    m2 = run_pipeline(spark, fetch_page, table, hist, batch_size=30_000)
    assert m2["total_fetched"] == INCREMENTAL_ROWS
    n_malformed_2 = int(sum(1 for i in ids[INITIAL_ROWS:]
                            if i % MALFORMED_EVERY == 0))
    assert m2["valid_records"] == INCREMENTAL_ROWS - n_malformed_2

    # -- run 3: nothing new — idempotent no-op -------------------------
    m3 = run_pipeline(spark, fetch_page, table, hist, batch_size=30_000)
    assert m3["total_fetched"] == 0

    # -- table state: every valid id exactly once ----------------------
    tbl = spark.read.parquet(table)
    expect_rows = (INITIAL_ROWS + INCREMENTAL_ROWS
                   - n_malformed_1 - n_malformed_2)
    assert tbl.count() == expect_rows
    assert tbl.select("_id").distinct().count() == expect_rows

    # -- audit: three runs recorded, all successful --------------------
    h = spark.read.parquet(hist)
    assert h.count() == 3
    assert h.filter(F.col("success")).count() == 3
    assert {r["total_fetched"] for r in h.collect()} == {
        INITIAL_ROWS, INCREMENTAL_ROWS, 0
    }

    # -- serve: version probe + chart query + digest -------------------
    cache = VersionedCache(lambda: spark.read.parquet(table))
    served = cache.get()
    mix = fuel_mix_long(served, "DATETIME", ["GAS", "WIND"])
    assert mix.count() == expect_rows * 2
    digest = served.agg(
        F.count("*").alias("n"),
        F.max("_id").alias("max_id"),
        F.sum("GAS").alias("gas_sum"),
    ).first()
    assert digest["n"] == expect_rows
    assert digest["max_id"] == int(ids[-1]) if int(ids[-1]) % MALFORMED_EVERY \
        else int(ids[-2])
    assert digest["gas_sum"] is not None and digest["gas_sum"] > 0

    elapsed = time.monotonic() - t0
    assert elapsed < 120, f"rehearsal took {elapsed:.0f}s (budget 120s)"
