"""Local replica of the driver's DuckDB-oracle comparison: run the
Spark query and the oracle SQL on the same parquet, normalize, and
compare exactly (row count + column names + values)."""

from __future__ import annotations

import duckdb
import pandas as pd

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def duckdb_conn(sf_dir: str) -> duckdb.DuckDBPyConnection:
    import os

    con = duckdb.connect()
    for t in TABLES:
        path = f"{sf_dir}/{t}.parquet"
        # driver testdata ships single parquet FILES; the scale
        # fixtures are Spark-written DIRECTORIES of part files
        if os.path.isdir(path):
            path = f"{path}/*.parquet"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
    return con


def normalize(pdf: pd.DataFrame) -> pd.DataFrame:
    out = pdf.copy()
    out = out[sorted(out.columns)]
    for c in out.columns:
        if pd.api.types.is_datetime64_any_dtype(out[c]):
            out[c] = out[c].astype("datetime64[us]")
        elif pd.api.types.is_integer_dtype(out[c]):
            out[c] = out[c].astype("float64")  # unify int widths/nullability
    return (
        out.sort_values(by=list(out.columns), kind="mergesort")
        .reset_index(drop=True)
    )


def compare(spark_df, con: duckdb.DuckDBPyConnection, sql: str) -> None:
    got = normalize(spark_df.toPandas())
    want = normalize(con.execute(sql).fetchdf())
    assert list(got.columns) == list(want.columns), (
        f"columns differ: {list(got.columns)} vs {list(want.columns)}"
    )
    assert len(got) == len(want), f"row counts differ: {len(got)} vs {len(want)}"
    try:
        pd.testing.assert_frame_equal(got, want, check_dtype=False, check_exact=True)
    except AssertionError:
        # diagnose: is it a near-miss (float drift) or a real mismatch?
        pd.testing.assert_frame_equal(
            got, want, check_dtype=False, rtol=1e-9, atol=1e-12,
            obj="NEAR-MISS (values within 1e-9 but not exact — driver hash would fail)",
        )
        raise AssertionError("near-miss: values within 1e-9 but not bit-exact")
