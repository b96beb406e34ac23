"""Temperature mixture sampling and deterministic epoch shuffle:
the rebalance math (√n weighting, small domains up-weighted), run
stability, and the write-order guarantees the shuffle exists for."""

from __future__ import annotations

import math
import tempfile

from pyspark.sql import functions as F

from harmony_energy_data_pipeline_spark.io import load_table
from harmony_energy_data_pipeline_spark.operators.sampling import (
    epoch_shuffle_key,
    shuffled_write,
    temperature_mixture,
)


def test_temperature_mixture_sqrt_weighting(spark, sf_dir):
    docs = load_table(spark, "documents", sf_dir).select("doc_id", "lang")
    n_by = {r["lang"]: r["n"] for r in docs.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    target = 250
    out = temperature_mixture(docs, "doc_id", "lang", target_rows=target)
    got = {r["lang"]: r["n"] for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    s_tot = sum(math.sqrt(n) for n in n_by.values())
    for lang, n in n_by.items():
        expect = min(n, target * math.sqrt(n) / s_tot)
        # binomial noise: 4σ on the kept count
        tol = 4 * math.sqrt(max(expect, 1.0)) + 1
        assert abs(got.get(lang, 0) - expect) <= tol, (lang, got.get(lang), expect)
    # the whole point: the smallest domain keeps a LARGER fraction of
    # itself than the biggest one
    small = min(n_by, key=n_by.get)
    big = max(n_by, key=n_by.get)
    if n_by[big] > 2 * n_by[small]:
        assert got[small] / n_by[small] > got[big] / n_by[big]


def test_temperature_mixture_repartition_stable(spark, sf_dir):
    docs = load_table(spark, "documents", sf_dir).select("doc_id", "lang")
    a = {r["doc_id"] for r in temperature_mixture(docs, "doc_id", "lang", 100).collect()}
    b = {
        r["doc_id"]
        for r in temperature_mixture(docs.repartition(7), "doc_id", "lang", 100).collect()
    }
    assert a == b and len(a) > 0


def test_temperature_mixture_saturates_small_domains(spark):
    # a domain smaller than its √-weighted target keeps every row
    rows = [(i, "tiny" if i < 5 else "huge") for i in range(1000)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    out = temperature_mixture(df, "doc_id", "lang", target_rows=900)
    kept_tiny = out.filter(F.col("lang") == "tiny").count()
    assert kept_tiny == 5


def test_epoch_shuffle_write_order_and_epochs(spark, sf_dir):
    docs = load_table(spark, "documents", sf_dir).select("doc_id")
    with tempfile.TemporaryDirectory() as out:
        shuffled_write(docs, "doc_id", epoch=1, path=f"{out}/e1", num_files=4)
        shuffled_write(docs, "doc_id", epoch=1, path=f"{out}/e1b", num_files=4)
        shuffled_write(docs, "doc_id", epoch=2, path=f"{out}/e2", num_files=4)

        def order_of(path):
            back = (
                spark.read.parquet(path)
                .withColumn("__f", F.input_file_name())
                .withColumn("__sk", epoch_shuffle_key("doc_id", 1))
            )
            return back

        b1 = order_of(f"{out}/e1")
        # (a) no rows lost, layout key not leaked
        assert b1.count() == docs.count()
        assert set(b1.columns) == {"doc_id", "__f", "__sk"}
        # (b) per-file key ranges are disjoint => file order IS global order
        spans = sorted(
            (r["lo"], r["hi"])
            for r in b1.groupBy("__f")
            .agg(F.min("__sk").alias("lo"), F.max("__sk").alias("hi"))
            .collect()
        )
        for (_, hi_prev), (lo_next, _) in zip(spans, spans[1:]):
            assert hi_prev <= lo_next
        # (c) same epoch twice => byte-identical assignment of rows to
        # ordered files
        def file_sets(path):
            back = (
                spark.read.parquet(path)
                .withColumn("__f", F.input_file_name())
                .withColumn("__sk", epoch_shuffle_key("doc_id", 1))
            )
            spans = back.groupBy("__f").agg(F.min("__sk").alias("lo")).collect()
            order = {r["__f"]: i for i, r in enumerate(sorted(spans, key=lambda r: r["lo"]))}
            rows = back.select("__f", "doc_id").collect()
            out_sets: dict[int, set] = {}
            for r in rows:
                out_sets.setdefault(order[r["__f"]], set()).add(r["doc_id"])
            return out_sets

        assert file_sets(f"{out}/e1") == file_sets(f"{out}/e1b")
        # (d) a different epoch is a genuinely different permutation
        e1_first = file_sets(f"{out}/e1")[0]
        back2 = spark.read.parquet(f"{out}/e2").withColumn(
            "__sk", epoch_shuffle_key("doc_id", 2)
        )
        spans2 = back2.withColumn("__f", F.input_file_name()).groupBy("__f").agg(
            F.min("__sk").alias("lo")
        ).collect()
        first2 = sorted(spans2, key=lambda r: r["lo"])[0]["__f"]
        e2_first = {
            r["doc_id"]
            for r in back2.withColumn("__f", F.input_file_name())
            .filter(F.col("__f") == first2)
            .collect()
        }
        assert e1_first != e2_first
