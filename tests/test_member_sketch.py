"""Membership-sketch file skipping: hash-twin agreement, equality
pruning on unclustered columns, saturation fallback, survival through
append/compact."""
from __future__ import annotations

import os

from pyspark.sql import functions as F

from harmony_energy_data_pipeline_spark.sinks import snapshots as snap
from harmony_energy_data_pipeline_spark.sinks.filestats import (
    _MEMBER_BITS,
    portable_bucket,
)


def test_python_bucket_twin_matches_spark(spark):
    from harmony_energy_data_pipeline_spark.functions.hashx import portable_hash60

    vals = [0, 1, 42, 999983, -7, "alpha", "user_00042", ""]
    df = spark.createDataFrame([(str(v),) for v in vals], "s string")
    got = [
        r.b
        for r in df.select(
            F.pmod(portable_hash60(F.col("s")), F.lit(_MEMBER_BITS)).alias("b")
        ).collect()
    ]
    assert got == [portable_bucket(v) for v in vals]


def test_equality_pruning_on_unclustered_column(spark, tmp_path):
    path = str(tmp_path / "t")
    # 8 files, each holding a DISTINCT set of users
    df = spark.range(0, 4096).select(
        (F.col("id") % 64).alias("user"), F.col("id").alias("v")
    ).repartition(8, "user")
    snap.snapshot_write(df, path, member_cols=["user"], stats_cols=["user"])
    kept, total = snap.prune_files(path, [("user", 7, 7)])
    assert total == 8 and len(kept) < total
    got = snap.read_snapshot(spark, path, where=[("user", 7, 7)])
    want = snap.read_snapshot(spark, path).filter(F.col("user") == 7)
    assert sorted(r.v for r in got.collect()) == sorted(
        r.v for r in want.collect()
    )
    # value absent from the table: the sketch proves it for every file
    kept_absent, _ = snap.prune_files(path, [("user", 999, 999)])
    got_absent = snap.read_snapshot(spark, path, where=[("user", 999, 999)])
    assert got_absent.count() == 0
    # range predicates ignore the sketch (interval, not point)
    kept_rng, _ = snap.prune_files(path, [("user", 0, 63)])
    assert len(kept_rng) == total


def test_saturated_column_records_nothing(spark, tmp_path):
    path = str(tmp_path / "t")
    # ~4096 distinct values in one file: past the 75% bucket cap
    df = spark.range(0, 2 * _MEMBER_BITS).select(F.col("id").alias("k"))
    snap.snapshot_write(df.coalesce(1), path, member_cols=["k"])
    m = snap._read_manifest(path, 0)
    assert "members" not in m  # sketch refused: no pruning value
    kept, total = snap.prune_files(path, [("k", 5, 5)])
    assert len(kept) == total  # conservative keep


def test_members_survive_append_and_compact(spark, tmp_path):
    path = str(tmp_path / "t")
    a = spark.range(0, 100).select(F.lit("odd").alias("tag"), F.col("id").alias("v"))
    b = spark.range(100, 200).select(F.lit("even").alias("tag"), F.col("id").alias("v"))
    snap.snapshot_write(a.coalesce(1), path, member_cols=["tag"])
    snap.snapshot_write(b.coalesce(1), path, mode="append", member_cols=["tag"])
    kept, total = snap.prune_files(path, [("tag", "odd", "odd")])
    assert total == 2 and len(kept) == 1
    v = snap.snapshot_compact(spark, path, target_file_mb=1)
    m = snap._read_manifest(path, v)
    assert m.get("members")  # recomputed for the rewritten files
    got = snap.read_snapshot(spark, path, where=[("tag", "odd", "odd")])
    assert got.count() == 100


def test_sized_sketches_prune_high_cardinality(spark, tmp_path):
    """Default 4096-bit sketches saturate on files with many distinct
    keys (everything kept); sizing the bitmap restores surgical
    pruning — mixed sizes coexist across commits."""
    path = str(tmp_path / "t")
    # 4 files x ~8k distinct keys each: saturates the 4096 default
    df = spark.range(0, 32768).select(F.col("id").alias("k"))
    snap.snapshot_write(df.repartition(4, "k"), path, member_cols=["k"])
    m0 = snap._read_manifest(path, 0)
    assert "members" not in m0  # saturated: nothing recorded
    # sized commit: 2^17 bits holds 8k keys at ~6% saturation
    snap.snapshot_write(
        df.repartition(4, "k"), path, member_cols=["k"],
        member_bits=1 << 17,
    )
    kept, total = snap.prune_files(path, [("k", 5, 5)])
    assert total == 4 and len(kept) < total
    got = snap.read_snapshot(spark, path, where=[("k", 5, 5)])
    assert got.count() == 1
    # merge adapts its bucket set to the per-entry size
    src = spark.createDataFrame([(5,), (40000,)], "k long")
    v = snap.snapshot_merge_into(spark, path, src, key="k")
    mm = snap._read_manifest(path, v)
    assert mm["rewrite"]["carried_files"] >= 1
    assert snap.read_snapshot(spark, path).count() == 32769


def test_legacy_string_sketch_still_reads(spark, tmp_path):
    """Bare-base64 entries (the pre-sized format) keep working."""
    import json
    import os as _os

    path = str(tmp_path / "t")
    df = spark.range(0, 100).select(F.col("id").alias("k"))
    snap.snapshot_write(df.coalesce(1), path, member_cols=["k"])
    mp = _os.path.join(path, "_snapshots", f"v{0:012d}.json")
    m = json.load(open(mp))
    (entry,) = m["members"].values()
    assert isinstance(entry["k"], str)  # default size stores bare b64
    kept, total = snap.prune_files(path, [("k", 5, 5)])
    assert len(kept) == total == 1
    kept2, _ = snap.prune_files(path, [("k", 5000, 5000)])
    assert kept2 == []


def test_khash_bloom_survives_many_source_keys(spark, tmp_path):
    """Single-hash FPR compounds over source keys (a 100-key merge
    touches almost every file); the k-hash Bloom keeps file scoping
    surgical. Twin check: Python probes equal Spark collection."""
    from harmony_energy_data_pipeline_spark.sinks.filestats import (
        sketch_hashes,
    )

    path = str(tmp_path / "t")
    df = spark.range(0, 32768).select(F.col("id").alias("k"))
    snap.snapshot_write(
        df.repartition(8, "k"), path,
        member_cols=["k"], member_bits=1 << 17, member_hashes=5,
    )
    m = snap._read_manifest(path, 0)
    (any_entry,) = list(m["members"].values())[:1]
    assert sketch_hashes(any_entry["k"]) == 5
    # 64 ABSENT keys: the blooms prove every file clean (the k-hash
    # FPR at this fill is ~1e-4 per key; a false keep would rewrite)
    src2 = spark.createDataFrame([(10**9 + i,) for i in range(64)], "k long")
    v2 = snap.snapshot_merge_into(spark, path, src2, key="k")
    m2 = snap._read_manifest(path, v2)
    assert m2["rewrite"]["rewritten_files"] <= 1  # statistical bound
    assert snap.read_snapshot(spark, path).count() == 32768 + 64
    # 64 PRESENT keys: correctness regardless of scoping
    src = spark.createDataFrame([(i * 512, ) for i in range(64)], "k long")
    snap.snapshot_merge_into(spark, path, src, key="k")
    assert snap.read_snapshot(spark, path).count() == 32768 + 64


# --- round 7: per-file fold + DEFLATE compression ----------------------------------


def test_fold_is_bit_identical_to_direct_collection():
    """Folding a big-bits sketch to the file's own cardinality must be
    EXACT: identical to collecting at the small size directly (the
    double-hash probe commutes with mod 2^k), so no false negatives
    can exist by construction."""
    from harmony_energy_data_pipeline_spark.sinks.filestats import (
        _pack_sketch, portable_buckets_k, sketch_bits, sketch_bytes,
        sketch_may_contain,
    )

    vals = [f"key-{i * 7919}" for i in range(3000)]
    big = set()
    for v in vals:
        big.update(portable_buckets_k(v, 1 << 19, 5))
    sk = _pack_sketch(big, 1 << 19, 5)
    assert sketch_bits(sk) < (1 << 19)  # folded
    assert "zb64" in sk or "b64" in sk
    assert all(sketch_may_contain(sk, v) for v in vals)
    direct = set()
    for v in vals:
        direct.update(portable_buckets_k(v, sketch_bits(sk), 5))
    arr = bytearray(sketch_bits(sk) // 8)
    for b in direct:
        arr[b >> 3] |= 1 << (b & 7)
    assert bytes(arr) == sketch_bytes(sk)
    # still a decisive filter after folding
    fp = sum(
        1 for i in range(5000) if sketch_may_contain(sk, f"absent-{i}")
    )
    assert fp / 5000 < 0.05


def test_folded_sketches_shrink_manifest_and_still_prune(spark, tmp_path):
    from pyspark.sql import functions as F

    from harmony_energy_data_pipeline_spark.sinks import snapshots as snap

    path = str(tmp_path / "t")
    df = spark.range(0, 40_000).select(F.col("id").alias("k"))
    snap.snapshot_write(
        df.repartition(16, "k"), path,
        member_cols=["k"], member_bits=1 << 19, member_hashes=5,
    )
    sz = os.path.getsize(snap._manifest_path(path, 0))
    # 16 sketches; the unfolded 2^19 collection shape would be ~87 KB
    # each (1.4 MB total) — folded+compressed must be at least 5x less
    assert sz < 1_400_000 / 5, sz
    kept, total = snap.prune_files(path, [("k", 123, 123)])
    assert total == 16 and len(kept) == 1
    assert snap.read_snapshot(
        spark, path, where=[("k", 123, 123)]
    ).count() == 1
