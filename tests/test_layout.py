"""Z-order layout: Morton-key correctness and the data-skipping
property the layout exists for (per-file min/max ranges tighten in
EVERY clustered dimension, not just the leading sort column)."""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from harmony_energy_data_pipeline_spark.io import load_table
from harmony_energy_data_pipeline_spark.sinks.layout import (
    scale_to_bits,
    zorder_key,
    zorder_write,
)


def test_zorder_key_matches_known_morton_codes(spark):
    # canonical 2-D Morton codes: x bits at even positions, y at odd
    cases = [(0, 0, 0), (1, 0, 1), (0, 1, 2), (1, 1, 3),
             (2, 1, 6), (3, 3, 15), (7, 7, 63), (5, 0, 17)]
    df = spark.createDataFrame(cases, "x long, y long, want long")
    got = df.select("want", zorder_key(["x", "y"], bits=4).alias("z")).collect()
    for r in got:
        assert r["z"] == r["want"], (r["want"], r["z"])


def test_zorder_key_three_columns(spark):
    # bit i of col j lands at position i*3 + j
    df = spark.createDataFrame([(1, 1, 1), (2, 0, 0)], "a long, b long, c long")
    got = [r["z"] for r in df.select(zorder_key(["a", "b", "c"], bits=2).alias("z")).collect()]
    assert got == [7, 8]  # (1,1,1)->0b111 ; a=2 -> bit1 at pos 3


def test_zorder_write_tightens_both_dimensions(spark, sf_dir):
    raw = load_table(spark, "events", sf_dir).select(
        "event_id", F.col("value").cast("double").alias("val")
    ).na.drop()
    lo_hi = raw.agg(
        F.min("event_id"), F.max("event_id"), F.min("val"), F.max("val")
    ).collect()[0]
    # both dimensions bucketed to the same 8-bit width — unequal widths
    # degenerate the curve into a sort on the wider dimension
    ev = raw.select(
        scale_to_bits("event_id", lo_hi[0], lo_hi[1], bits=8).alias("u"),
        scale_to_bits("val", lo_hi[2], lo_hi[3], bits=8).alias("v"),
    )
    n_files = 8
    with tempfile.TemporaryDirectory() as out:
        path = f"{out}/z"
        zorder_write(ev, ["u", "v"], path, bits=8, num_partitions=n_files)
        from harmony_energy_data_pipeline_spark.sinks.layout import read_zorder
        back = read_zorder(spark, path).withColumn("__f", F.input_file_name())
        spans = back.groupBy("__f").agg(
            (F.max("u") - F.min("u")).alias("su"),
            (F.max("v") - F.min("v")).alias("sv"),
        )
        g = ev.agg(
            (F.max("u") - F.min("u")).alias("su"),
            (F.max("v") - F.min("v")).alias("sv"),
        ).collect()[0]
        rows = spans.collect()
        assert len(rows) >= n_files // 2  # range partitioner actually split
        mean_su = sum(r["su"] for r in rows) / len(rows)
        mean_sv = sum(r["sv"] for r in rows) / len(rows)
        # a single-column sort leaves the OTHER dimension at ~full span
        # per file; the z-order must tighten both
        assert mean_su < 0.7 * g["su"], (mean_su, g["su"])
        assert mean_sv < 0.7 * g["sv"], (mean_sv, g["sv"])
        # layout column must not leak into the data
        assert "__z" not in back.columns


def test_zorder_key_rejects_sign_bit_overflow(spark):
    import pytest as _pytest

    from harmony_energy_data_pipeline_spark.sinks.layout import zorder_key

    with _pytest.raises(ValueError, match="63"):
        zorder_key(["a", "b", "c", "d"], bits=16)  # 64 bits: sign-bit


def test_scale_to_bits_uses_full_range_for_float_spans(spark):
    from harmony_energy_data_pipeline_spark.sinks.layout import scale_to_bits

    df = spark.createDataFrame([(0.0,), (0.05,), (0.1,)], "d double")
    out = [r.b for r in df.select(
        scale_to_bits("d", 0.0, 0.1, bits=4).alias("b")).collect()]
    # full 4-bit range: max value clamps to bucket 15, midpoint to 8
    assert out == [0, 8, 15]


def test_string_rank64_mirror_and_order(spark):
    from harmony_energy_data_pipeline_spark.sinks.layout import (
        string_rank64,
        string_rank64_py,
    )

    vals = ["", "a", "ab", "abcdefgh", "abcdefghij", "naïve", "Z",
            "1-URGENT", "5-LOW"]
    df = spark.createDataFrame([(v,) for v in vals], "s string")
    got = {r["s"]: r["r"] for r in df.select(
        "s", string_rank64("s").alias("r")).collect()}
    for v in vals:
        assert got[v] == string_rank64_py(v), v
    # order-preserving on byte order
    ranked = sorted(vals, key=lambda v: string_rank64_py(v))
    assert ranked == sorted(vals, key=lambda v: v.encode("utf-8")[:8])


def test_zorder_compact_on_string_dimension(spark, tmp_path):
    from harmony_energy_data_pipeline_spark.sinks import snapshots as snap

    t = str(tmp_path / "t")
    df = spark.range(1_500_000).select(
        (F.col("id") % 997).alias("k"),
        F.concat(
            F.lit("cat"), (F.col("id") % 7).cast("string")
        ).alias("c"),
        F.concat(F.lit("padding-padding-"), F.col("id")).alias("pad"),
    )
    snap.snapshot_write(df.repartition(8), t, stats_cols=["k", "c"])
    snap.snapshot_compact(spark, t, target_file_mb=1,
                          zorder_by=["k", "c"])
    # predicates on EITHER dimension prune the z-ordered layout
    kept_k, total = snap.prune_files(t, [("k", 10, 30)])
    kept_c, _ = snap.prune_files(t, [("c", "cat3", "cat3")])
    assert total > 2
    assert len(kept_k) < total, "numeric dim should prune"
    assert len(kept_c) < total, "string dim should prune"
    # correctness: the layout changed nothing
    got = snap.read_snapshot(spark, t, where=[("c", "cat3", "cat3")])
    assert got.count() == df.filter("c = 'cat3'").count()
