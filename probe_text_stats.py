"""Localize the text_stats hash mismatch at sf0.01: compare each column
independently between the Spark engine and the DuckDB oracle."""
import sys

import duckdb
import pandas as pd

import __spark_entry__ as entrymod
from harmony_energy_data_pipeline_spark.session import get_spark
from tests.oracle_util import duckdb_conn, normalize

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

spark = get_spark()
con = duckdb_conn(SF)

name = "text_stats"
got = normalize(entrymod.queries()[name](spark, SF).toPandas())
want = normalize(con.execute(entrymod.oracle_sql()[name]).fetchdf())

got = got.sort_values("doc_id").reset_index(drop=True)
want = want.sort_values("doc_id").reset_index(drop=True)
print("rows:", len(got), len(want))
for c in got.columns:
    try:
        pd.testing.assert_series_equal(got[c], want[c], check_dtype=False, check_exact=True)
        print(f"  OK   {c}")
    except AssertionError:
        neq = got[c] != want[c]
        # NaN-safe
        neq = neq & ~(got[c].isna() & want[c].isna())
        bad = got.loc[neq, ["doc_id", c]].head(5)
        bad["oracle"] = want.loc[neq, c].head(5).values
        print(f"  DIFF {c}: {neq.sum()} rows differ")
        print(bad.to_string())
        # show the raw text of the first offender
        did = int(got.loc[neq, "doc_id"].iloc[0])
        txt = con.execute(f"SELECT text FROM documents WHERE doc_id={did}").fetchone()[0]
        print("    first offender text:", repr(txt[:300]))
