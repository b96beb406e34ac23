"""Hash-bucket layout in the snapshot log (snapshot_write bucket_by).

The contract: routing is engine-portable (Catalyst expression, Python
planner mirror, DuckDB oracle all agree), equality predicates on the
bucketed column prune to one bucket's files, MERGE scopes its rewrite
to the source keys' buckets, and maintenance restores the layout."""

from __future__ import annotations

import os
import tempfile

import pytest
from pyspark.sql import functions as F

from harmony_energy_data_pipeline_spark.sinks import snapshots as snap
from harmony_energy_data_pipeline_spark.sinks.snapshots import (
    _BUCKET_SEG,
    _file_bucket_id,
    bucket_id_of,
)


def _tmp():
    return tempfile.mkdtemp(prefix="bucket_") + "/t"


def _df(spark, n=200):
    return spark.range(n).select(
        F.col("id").cast("long").alias("k"),
        (F.col("id") * 3 % 17).cast("int").alias("v"),
        F.concat(F.lit("u"), F.col("id")).alias("name"),
    )


def test_python_mirror_matches_catalyst(spark):
    """bucket_id_of == pmod(portable_hash60(col), n) for int/long/str."""
    from harmony_energy_data_pipeline_spark.sinks.snapshots import (
        _bucket_route_expr,
    )

    df = spark.createDataFrame(
        [(0, "a"), (7, "xyz"), (123456789, ""), (-5, "naïve"),
         (2**40, "u42")],
        "k long, s string",
    )
    rows = df.select(
        "k", "s",
        _bucket_route_expr("k", 16).alias("bk"),
        _bucket_route_expr("s", 7).alias("bs"),
    ).collect()
    for r in rows:
        assert bucket_id_of(r["k"], 16) == r["bk"], r
        assert bucket_id_of(r["s"], 7) == r["bs"], r


def test_python_mirror_matches_duckdb(spark):
    import duckdb

    con = duckdb.connect()
    for v in [0, 7, 123456789, -5, "a", "xyz", "naïve"]:
        lit = f"'{v}'" if isinstance(v, str) else f"CAST({v} AS VARCHAR)"
        got = con.execute(
            f"SELECT (md5_number_lower({lit}) % (1::HUGEINT << 60)) % 16"
        ).fetchone()[0]
        assert bucket_id_of(v, 16) == int(got), v


def test_roundtrip_and_hidden_column(spark):
    t = _tmp()
    df = _df(spark)
    snap.snapshot_write(df, t, bucket_by=("k", 8))
    back = snap.read_snapshot(spark, t)
    assert _BUCKET_SEG not in back.columns
    assert sorted(r["k"] for r in back.collect()) == list(range(200))
    m = snap._read_manifest(t, snap.latest_version(t))
    assert m["bucket_spec"] == {"column": "k", "buckets": 8}
    # every file landed in exactly one bucket dir
    assert all(_file_bucket_id(f) is not None for f in m["files"])
    assert _BUCKET_SEG not in {
        f["name"] for f in m["schema"]["fields"]
    }


def test_equality_prunes_to_one_bucket(spark):
    t = _tmp()
    snap.snapshot_write(_df(spark).repartition(4), t, bucket_by=("k", 8))
    m = snap._read_manifest(t, snap.latest_version(t))
    b = bucket_id_of(42, 8)
    kept, total = snap.prune_files(t, [("k", 42, 42)])
    assert 0 < len(kept) < total
    assert all(_file_bucket_id(os.path.relpath(f, t)) == b for f in kept)
    got = snap.read_snapshot(spark, t, where=[("k", 42, 42)]).collect()
    assert [r["k"] for r in got] == [42]
    # range predicates don't bucket-prune (hash order ≠ value order)
    kept_r, _ = snap.prune_files(t, [("k", 40, 45)])
    assert len(kept_r) == total


def test_append_inherits_layout(spark):
    t = _tmp()
    snap.snapshot_write(_df(spark, 100), t, bucket_by=("k", 4))
    snap.snapshot_write(
        spark.createDataFrame([(1000, 1, "x")], "k long, v int, name string"),
        t, mode="append",
    )
    m = snap._read_manifest(t, snap.latest_version(t))
    assert m["bucket_spec"] == {"column": "k", "buckets": 4}
    assert all(_file_bucket_id(f) is not None for f in m["files"])
    got = snap.read_snapshot(spark, t, where=[("k", 1000, 1000)])
    assert [r["k"] for r in got.collect()] == [1000]


def test_conflicting_append_spec_raises(spark):
    t = _tmp()
    snap.snapshot_write(_df(spark, 50), t, bucket_by=("k", 4))
    with pytest.raises(ValueError, match="bucketed by"):
        snap.snapshot_write(
            _df(spark, 10), t, mode="append", bucket_by=("k", 8)
        )
    with pytest.raises(ValueError, match="bucketed by"):
        snap.snapshot_write(
            _df(spark, 10), t, mode="append", bucket_by=("v", 4)
        )


def test_bad_bucket_column_rejected(spark):
    t = _tmp()
    df = spark.range(5).select(
        F.col("id").alias("k"), F.rand(7).alias("f")
    )
    with pytest.raises(ValueError, match="portable bucket routing"):
        snap.snapshot_write(df, t, bucket_by=("f", 4))
    with pytest.raises(ValueError, match="not in the batch"):
        snap.snapshot_write(df, t, bucket_by=("nope", 4))
    with pytest.raises(ValueError, match=">= 1 buckets"):
        snap.snapshot_write(df, t, bucket_by=("k", 0))


def test_merge_scopes_to_source_buckets(spark):
    t = _tmp()
    snap.snapshot_write(
        _df(spark, 400).repartition(2), t, bucket_by=("k", 8)
    )
    before = set(snap._read_manifest(t, snap.latest_version(t))["files"])
    src = spark.createDataFrame(
        [(3, 99, "upd3"), (3000, 1, "new")], "k long, v int, name string"
    )
    snap.snapshot_merge_into(spark, t, src, key="k")
    m = snap._read_manifest(t, snap.latest_version(t))
    after = set(m["files"])
    touched_buckets = {bucket_id_of(3, 8), bucket_id_of(3000, 8)}
    # files in untouched buckets were carried byte-identical
    for f in before:
        if _file_bucket_id(f) not in touched_buckets:
            assert f in after, f
    # every file in a touched bucket was rewritten or replaced
    assert all(
        f in after or _file_bucket_id(f) in touched_buckets
        for f in before
    )
    got = snap.read_snapshot(spark, t)
    assert got.count() == 401
    assert got.filter(F.col("k") == 3).first()["name"] == "upd3"
    assert got.filter(F.col("k") == 3000).first()["name"] == "new"


def test_compact_restores_layout(spark):
    t = _tmp()
    snap.snapshot_write(_df(spark, 200), t, bucket_by=("k", 4))
    # round 9: a copy-on-write delete restages its surviving rows back
    # INTO the bucket layout — point lookups keep pruning through it
    snap.snapshot_delete_where(spark, t, [("v", 0, 1)])
    m = snap._read_manifest(t, snap.latest_version(t))
    assert all(_file_bucket_id(f) is not None for f in m["files"])
    kept_mid, total_mid = snap.prune_files(t, [("k", 42, 42)])
    assert 0 < len(kept_mid) < total_mid
    snap.snapshot_compact(spark, t, target_file_mb=1)
    m2 = snap._read_manifest(t, snap.latest_version(t))
    assert m2["bucket_spec"] == {"column": "k", "buckets": 4}
    assert all(_file_bucket_id(f) is not None for f in m2["files"])
    got = snap.read_snapshot(spark, t, where=[("k", 42, 42)]).collect()
    assert [r["k"] for r in got] == [42]


def test_arrow_checkpoint_path_prunes(spark, monkeypatch):
    monkeypatch.setattr(snap, "_CHECKPOINT_INTERVAL", 2)
    t = _tmp()
    snap.snapshot_write(_df(spark, 60), t, bucket_by=("k", 4))
    for i in range(3):
        snap.snapshot_write(
            spark.createDataFrame(
                [(500 + i, i, f"a{i}")], "k long, v int, name string"
            ),
            t, mode="append",
        )
    v = snap.latest_version(t)
    snap._read_manifest(t, v)  # long walk → columnar checkpoint
    fast = snap._prune_files_arrow(t, v, [("k", 42, 42)])
    assert fast is not None, "columnar checkpoint should cover v"
    kept, total = fast
    assert 0 < len(kept) < total
    b = bucket_id_of(42, 4)
    assert all(
        _file_bucket_id(os.path.relpath(f, t)) == b for f in kept
    )
    got = snap.read_snapshot(spark, t, where=[("k", 42, 42)]).collect()
    assert [r["k"] for r in got] == [42]


def test_null_keys_scope_nothing(spark):
    t = _tmp()
    snap.snapshot_write(_df(spark, 50), t, bucket_by=("name", 4))
    src = spark.createDataFrame(
        [(9999, 0, None)], "k long, v int, name string"
    )
    # NULL merge key: equi-matches nothing, inserts fine
    snap.snapshot_merge_into(spark, t, src, key="name")
    assert snap.read_snapshot(spark, t).count() == 51


def test_streaming_append_sink_inherits_layout(spark, tmp_path):
    """A streaming append sink into a bucketed table with generated
    columns: micro-batch commits route through snapshot_write, so the
    table-level layout (buckets) and generated spec apply to every
    batch without the sink knowing either exists."""
    from harmony_energy_data_pipeline_spark.streaming.incremental import (
        file_stream,
        start_snapshot_append_sink,
    )

    t = str(tmp_path / "tbl")
    base = spark.range(10).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    )
    snap.snapshot_write(
        base, t, bucket_by=("k", 4),
        generated_cols={"v2": "v * 10"},
    )
    src = str(tmp_path / "src")
    spark.range(10, 30).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    ).coalesce(1).write.parquet(src)
    stream = file_stream(spark, src, spark.read.parquet(src).schema)
    q = start_snapshot_append_sink(
        stream, t, str(tmp_path / "ckpt"), available_now=True
    )
    q.awaitTermination(120)
    m = snap._read_manifest(t, snap.latest_version(t))
    assert m["bucket_spec"] == {"column": "k", "buckets": 4}
    assert all(_file_bucket_id(f) is not None for f in m["files"])
    got = snap.read_snapshot(spark, t)
    assert got.count() == 30
    assert got.filter(F.col("v2") != F.col("v") * 10).count() == 0
    # point lookup on the streamed table prunes to one bucket
    kept, total = snap.prune_files(t, [("k", 25, 25)])
    assert len(kept) < total
