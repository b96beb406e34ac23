"""Build the 10x scale-rehearsal fixture: replicate an SF dir's tables
with id offsets so keys stay distinct across replicas (new entities,
not duplicates) — sf0.1 x 10 ~ sf1 row counts.

Usage: python tools/make_scale_fixture.py [src_sf_dir] [out_dir] [factor]
Defaults: /root/testdata/sf0.1 /tmp/scale10 10

Protocol notes (SCALING.md): dims region/nation are NOT replicated
(their keys are a fixed domain referenced by fact foreign keys);
part names get a per-replica suffix so fuzzy-linkage blocks model
new-entity growth; document text is replicated unchanged — the
conservative worst case for near-dup operators (every shingle's
document frequency multiplies by the factor), which is exactly what
their df-cap/LSH guards must absorb.
"""

from __future__ import annotations

import os
import sys

from pyspark.sql import DataFrame, functions as F

# (table, [id columns to offset], {col: transform})
TABLES: list[tuple[str, list[str]]] = [
    ("region", []),
    ("nation", []),
    ("customer", ["c_custkey"]),
    ("supplier", ["s_suppkey"]),
    ("part", ["p_partkey"]),
    ("orders", ["o_orderkey", "o_custkey"]),
    ("lineitem", ["l_orderkey", "l_partkey", "l_suppkey"]),
    ("events", ["event_id", "user_id"]),
    ("documents", ["doc_id"]),
    ("embeddings", ["vec_id"]),
]


def replicate(df: DataFrame, id_cols: list[str], factor: int, table: str) -> DataFrame:
    if not id_cols:
        return df
    strides = {
        c: df.agg(F.max(c)).first()[0] + 1 for c in id_cols
    }
    parts = []
    for i in range(factor):
        rep = df
        for c, stride in strides.items():
            rep = rep.withColumn(c, F.col(c) + F.lit(i * stride))
        if table == "part" and i > 0:
            rep = rep.withColumn(
                "p_name", F.concat(F.col("p_name"), F.lit(f" rep{i}"))
            )
        parts.append(rep)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/scale10"
    factor = int(sys.argv[3]) if len(sys.argv) > 3 else 10

    from harmony_energy_data_pipeline_spark.io import load_table
    from harmony_energy_data_pipeline_spark.session import get_spark

    spark = get_spark("scale-fixture")
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(out_dir, exist_ok=True)
    for table, id_cols in TABLES:
        df = load_table(spark, table, src)
        rep = replicate(df, id_cols, factor, table)
        target = os.path.join(out_dir, f"{table}.parquet")
        rep.write.mode("overwrite").parquet(target)
        print(f"{table}: {rep.count()} rows -> {target}")
    spark.stop()


if __name__ == "__main__":
    main()
