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
