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


#: Key-domain owner per column: a foreign key's offset stride MUST be
#: its owning entity's stride (max PK + 1), not the referencing
#: table's own max — max(FK) < max(PK) whenever some dimension keys go
#: unreferenced (standard TPC-H: a third of customers have no orders),
#: and a per-table stride would then dangle every replica's FKs.
DOMAIN_OF = {
    "c_custkey": ("customer", "c_custkey"),
    "o_custkey": ("customer", "c_custkey"),
    "s_suppkey": ("supplier", "s_suppkey"),
    "l_suppkey": ("supplier", "s_suppkey"),
    "p_partkey": ("part", "p_partkey"),
    "l_partkey": ("part", "p_partkey"),
    "o_orderkey": ("orders", "o_orderkey"),
    "l_orderkey": ("orders", "o_orderkey"),
    "event_id": ("events", "event_id"),
    "user_id": ("events", "user_id"),
    "doc_id": ("documents", "doc_id"),
    "vec_id": ("embeddings", "vec_id"),
}


def domain_strides(load, spark, src: str) -> dict[tuple[str, str], int]:
    """max(PK)+1 per key domain, computed once from the OWNING table."""
    strides: dict[tuple[str, str], int] = {}
    for dom in set(DOMAIN_OF.values()):
        tbl, col = dom
        strides[dom] = load(spark, tbl, src).agg(F.max(col)).first()[0] + 1
    return strides


def replicate(
    df: DataFrame,
    id_cols: list[str],
    factor: int,
    table: str,
    strides_by_domain: dict[tuple[str, str], int],
) -> DataFrame:
    if not id_cols:
        return df
    strides = {c: strides_by_domain[DOMAIN_OF[c]] for c in id_cols}
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
    strides = domain_strides(load_table, spark, src)
    for table, id_cols in TABLES:
        df = load_table(spark, table, src)
        rep = replicate(df, id_cols, factor, table, strides)
        target = os.path.join(out_dir, f"{table}.parquet")
        rep.write.mode("overwrite").parquet(target)
        print(f"{table}: {rep.count()} rows -> {target}")
    spark.stop()


if __name__ == "__main__":
    main()
