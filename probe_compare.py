"""Run named queries (or all with oracles) through the local compare at a
given SF dir, with a dtype-strictness report mirroring the driver's
observed hash sensitivity (int-vs-float fails; widths/datetime units ok)."""
import sys

import pandas as pd

import __spark_entry__ as entrymod
from harmony_energy_data_pipeline_spark.session import get_spark
from tests.oracle_util import duckdb_conn, normalize

SF = "/root/testdata/sf0.01"
names = [a for a in sys.argv[1:] if not a.startswith("/")]
for a in sys.argv[1:]:
    if a.startswith("/"):
        SF = a

spark = get_spark()
con = duckdb_conn(SF)
Q, O = entrymod.queries(), entrymod.oracle_sql()
if not names:
    names = sorted(O)

KIND = {"i": "int", "u": "int", "f": "float", "M": "dt", "O": "obj", "b": "bool"}

fails = []
for name in names:
    try:
        sp_raw = Q[name](spark, SF).toPandas()
        du_raw = con.execute(O[name]).fetchdf()
        got, want = normalize(sp_raw), normalize(du_raw)
        assert list(got.columns) == list(want.columns), f"cols {list(got.columns)} vs {list(want.columns)}"
        assert len(got) == len(want), f"rows {len(got)} vs {len(want)}"
        pd.testing.assert_frame_equal(got, want, check_dtype=False, check_exact=True)
        # driver-style dtype check: int-vs-float or obj mismatch is fatal
        bad = []
        for c in got.columns:
            a = KIND.get(sp_raw[c].dtype.kind, "?")
            b = KIND.get(du_raw[c].dtype.kind, "?")
            if a != b:
                bad.append(f"{c}({sp_raw[c].dtype} vs {du_raw[c].dtype})")
        if bad:
            print(f"DTYPE-RISK {name}: {', '.join(bad)}")
            fails.append(name)
        else:
            print(f"OK    {name} ({len(got)} rows)")
    except Exception as e:
        msg = str(e).replace("\n", " | ")[:300]
        print(f"FAIL  {name}: {msg}")
        fails.append(name)

print(f"\n{len(names) - len(fails)}/{len(names)} ok; failures: {fails}")
sys.exit(1 if fails else 0)
