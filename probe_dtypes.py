"""Audit: for every query with an oracle, compare the pandas dtypes of
the Spark result vs the DuckDB result. Correlate with CORRECTNESS_r01
hash status to infer the driver's hash sensitivity."""
import json
import sys
import traceback

import __spark_entry__ as entrymod
from harmony_energy_data_pipeline_spark.session import get_spark
from tests.oracle_util import duckdb_conn

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

spark = get_spark()
con = duckdb_conn(SF)
r01 = json.load(open("CORRECTNESS_r01.json"))

Q = entrymod.queries()
O = entrymod.oracle_sql()

for name in sorted(O):
    status = r01.get(name, {}).get("hash_match", "NOT-RUN")
    try:
        sp = Q[name](spark, SF).limit(0).toPandas()
        du = con.execute(f"SELECT * FROM ({O[name]}) LIMIT 0").fetchdf()
    except Exception as e:
        print(f"{name}: ERROR {type(e).__name__}: {e}")
        continue
    mism = []
    for c in sorted(sp.columns):
        a, b = str(sp[c].dtype), str(du[c].dtype) if c in du.columns else "MISSING"
        if a != b:
            mism.append(f"{c}: spark={a} duck={b}")
    tag = {True: "GREEN", False: "RED  ", "NOT-RUN": "NORUN"}.get(status, "?????")
    if mism:
        print(f"{tag} {name}: {'; '.join(mism)}")
