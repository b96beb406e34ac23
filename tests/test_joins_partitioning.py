"""Salted join parity, partitioned-write pruning, and the
pushdown-aware time-range scan."""

from __future__ import annotations

from pyspark.sql import functions as F

from harmony_energy_data_pipeline_spark.io import load_table, scan_ts_range
from harmony_energy_data_pipeline_spark.operators.joins import salted_join
from harmony_energy_data_pipeline_spark.plans.inspect import (
    has_pushed_filter,
    physical_plan,
)
from harmony_energy_data_pipeline_spark.sinks.partitioned import (
    overwrite_partitions_dynamic,
    with_date_partition,
    write_partitioned,
)


def _key(r, cols):
    return tuple(r[c] for c in cols)


def test_salted_join_matches_plain_inner(spark, sf_dir):
    li = load_table(spark, "lineitem", sf_dir).select(
        "l_orderkey", "l_partkey", "l_quantity"
    )
    pt = load_table(spark, "part", sf_dir).select("p_partkey", "p_brand")
    plain = li.join(pt.withColumnRenamed("p_partkey", "l_partkey"), "l_partkey")
    salted = salted_join(
        li, pt.withColumnRenamed("p_partkey", "l_partkey"), "l_partkey", n_salts=8
    )
    cols = sorted(plain.columns)
    assert sorted(salted.columns) == cols
    got = sorted(_key(r, cols) for r in salted.collect())
    want = sorted(_key(r, cols) for r in plain.collect())
    assert got == want


def test_salted_join_left_keeps_unmatched(spark):
    big = spark.createDataFrame([(1, "a"), (2, "b"), (3, "c")], "k long, v string")
    small = spark.createDataFrame([(1, "x")], "k long, w string")
    out = salted_join(big, small, "k", n_salts=4, how="left")
    rows = {(r["k"], r["w"]) for r in out.collect()}
    assert rows == {(1, "x"), (2, None), (3, None)}


def test_scan_ts_range_pushes_down_and_matches(spark, sf_dir):
    lo, hi = "2024-01-10 00:00:00", "2024-01-20 00:00:00"
    pruned = scan_ts_range(spark, "events", sf_dir, "ts", lo, hi)
    # the range predicate must reach the parquet scan (raw nano column)
    assert has_pushed_filter(pruned, "ts")
    naive = load_table(spark, "events", sf_dir).filter(
        F.col("ts").between(F.lit(lo).cast("timestamp"), F.lit(hi).cast("timestamp"))
    )
    assert pruned.count() == naive.count()
    assert pruned.count() > 0


def test_partitioned_write_prunes(spark, sf_dir, tmp_path):
    ev = with_date_partition(load_table(spark, "events", sf_dir), "ts")
    path = str(tmp_path / "events_by_day")
    write_partitioned(ev, path, ["dt"], mode="overwrite")
    back = spark.read.parquet(path).filter(F.col("dt") == "2024-01-05")
    plan = physical_plan(back)
    assert "PartitionFilters" in plan and "dt" in plan
    want = ev.filter(F.col("dt") == "2024-01-05").count()
    assert back.count() == want and want > 0


def test_dynamic_partition_overwrite_is_partition_local(spark, sf_dir, tmp_path):
    ev = with_date_partition(load_table(spark, "events", sf_dir), "ts")
    path = str(tmp_path / "events_dyn")
    write_partitioned(ev, path, ["dt"], mode="overwrite")
    n_before = spark.read.parquet(path).count()
    # re-write ONE day with doubled value; all other days must survive
    one_day = ev.filter(F.col("dt") == "2024-01-05").withColumn(
        "value", F.col("value") * 2
    )
    overwrite_partitions_dynamic(spark, one_day, path, ["dt"])
    after = spark.read.parquet(path)
    assert after.count() == n_before
    day = after.filter(F.col("dt") == "2024-01-05")
    orig = load_table(spark, "events", sf_dir).filter(
        F.to_date("ts") == "2024-01-05"
    )
    assert abs(
        day.agg(F.sum("value")).first()[0] - 2 * orig.agg(F.sum("value")).first()[0]
    ) < 1e-6


def test_upsert_partitioned_touches_only_affected_days(spark, sf_dir, tmp_path):
    import os
    from harmony_energy_data_pipeline_spark.sinks.upsert import upsert_partitioned

    ev = load_table(spark, "events", sf_dir).select(
        F.col("event_id").alias("_id"), F.col("ts").alias("DATETIME"), "value"
    )
    path = str(tmp_path / "events_upsert")
    upsert_partitioned(spark, ev, path, key="_id", ts_col="DATETIME")
    n = spark.read.parquet(path).count()
    assert n == ev.count()

    # note the mtime of an untouched partition, then merge a one-day batch
    parts = sorted(p for p in os.listdir(path) if p.startswith("dt="))
    untouched = os.path.join(path, parts[0], "")
    before = max(
        os.path.getmtime(os.path.join(untouched, f)) for f in os.listdir(untouched)
    )
    batch = (
        ev.filter(F.to_date("DATETIME") == "2024-01-05")
        .withColumn("value", F.col("value") * 10)
    )
    assert batch.count() > 0
    upsert_partitioned(spark, batch, path, key="_id", ts_col="DATETIME")

    after_df = spark.read.parquet(path)
    assert after_df.count() == n  # updates, not appends
    got = after_df.filter(F.col("dt") == "2024-01-05").agg(F.sum("value")).first()[0]
    want = 10 * ev.filter(F.to_date("DATETIME") == "2024-01-05").agg(
        F.sum("value")
    ).first()[0]
    assert abs(got - want) < 1e-6
    after = max(
        os.path.getmtime(os.path.join(untouched, f)) for f in os.listdir(untouched)
    )
    assert after == before  # untouched partition files were not rewritten


def test_compact_partitions_reduces_files(spark, sf_dir, tmp_path):
    import os
    from harmony_energy_data_pipeline_spark.sinks.partitioned import compact_partitions

    ev = with_date_partition(load_table(spark, "events", sf_dir), "ts")
    path = str(tmp_path / "fragmented")
    # simulate many incremental merges: 8 small appends
    for i in range(8):
        ev.filter(F.col("event_id") % 8 == i).write.mode("append").partitionBy(
            "dt"
        ).parquet(path)

    def n_files():
        return sum(
            1 for dp, _d, fs in os.walk(path) for f in fs if f.endswith(".parquet")
        )

    before, n_rows = n_files(), spark.read.parquet(path).count()
    compact_partitions(spark, path, ["dt"], target_file_mb=128)
    assert n_files() < before
    assert spark.read.parquet(path).count() == n_rows


def test_bucketed_join_has_no_shuffle(spark, sf_dir, tmp_path):
    from harmony_energy_data_pipeline_spark.plans.inspect import shuffle_count
    from harmony_energy_data_pipeline_spark.sinks.bucketed import (
        bucketed_join,
        write_bucketed_table,
    )

    li = load_table(spark, "lineitem", sf_dir).select("l_orderkey", "l_quantity")
    od = load_table(spark, "orders", sf_dir).select(
        F.col("o_orderkey").alias("l_orderkey"), "o_totalprice"
    )
    write_bucketed_table(li, "li_b", "l_orderkey", 8, path=str(tmp_path / "li"))
    write_bucketed_table(od, "od_b", "l_orderkey", 8, path=str(tmp_path / "od"))
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force SMJ
    try:
        joined = bucketed_join(spark, "li_b", "od_b", "l_orderkey")
        assert shuffle_count(joined) == 0, "co-bucketed join must not exchange"
        plain = li.join(od, "l_orderkey")
        assert shuffle_count(plain) >= 1  # the layout is what removed them
        assert joined.count() == plain.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS li_b")
        spark.sql("DROP TABLE IF EXISTS od_b")


def test_upsert_partitioned_atomic_under_kill(spark, sf_dir, tmp_path):
    """Kill the writer BETWEEN partition swaps: the table is torn on
    disk, but the intent marker survives, committed readers roll the
    commit forward, and the next writer run recovers first — readers
    through read_partitioned_committed never observe a half-applied
    batch."""
    import os

    import pytest

    from harmony_energy_data_pipeline_spark.sinks import partitioned as P
    from harmony_energy_data_pipeline_spark.sinks.upsert import upsert_partitioned

    ev = load_table(spark, "events", sf_dir).select(
        F.col("event_id").alias("_id"), F.col("ts").alias("DATETIME"), "value"
    )
    path = str(tmp_path / "events_atomic")
    upsert_partitioned(spark, ev, path, key="_id", ts_col="DATETIME")
    n = spark.read.parquet(path).count()
    base_sum = spark.read.parquet(path).agg(F.sum("value")).first()[0]

    # a batch touching EVERY day, all values x10
    batch = ev.withColumn("value", F.col("value") * 10)
    n_days = spark.read.parquet(path).select("dt").distinct().count()
    assert n_days > 1

    # crash after exactly one partition swap -> torn window on disk
    P._CRASH_AFTER_SWAPS = 1
    try:
        with pytest.raises(RuntimeError, match="simulated crash"):
            upsert_partitioned(spark, batch, path, key="_id", ts_col="DATETIME")
    finally:
        P._CRASH_AFTER_SWAPS = None

    # the torn state is real: marker present, staging partitions remain
    assert any(f.startswith("_commit-") for f in os.listdir(path))

    # a committed reader recovers and sees the batch FULLY applied
    # (roll-forward), never the mix
    got = P.read_partitioned_committed(spark, path)
    assert got.count() == n
    got_sum = got.agg(F.sum("value")).first()[0]
    assert abs(got_sum - 10 * base_sum) < 1e-6
    # recovery cleaned the protocol droppings
    leftovers = [
        f for f in os.listdir(path)
        if f.startswith(("_commit-", ".staging-", ".backup-"))
    ]
    assert leftovers == []

    # idempotence: the next writer run applies cleanly on top
    upsert_partitioned(spark, batch, path, key="_id", ts_col="DATETIME")
    assert spark.read.parquet(path).count() == n


def test_recover_partitions_rolls_forward_mid_rename(spark, sf_dir, tmp_path):
    """Crash in the worst spot INSIDE one swap (old moved to backup,
    staged not yet moved live): the partition is missing from the
    table; recovery must still converge to the fully-new state."""
    import os

    from harmony_energy_data_pipeline_spark.sinks import partitioned as P

    ev = with_date_partition(
        load_table(spark, "events", sf_dir).select("event_id", "ts", "value"), "ts"
    )
    path = str(tmp_path / "events_midrename")
    ev.write.mode("overwrite").partitionBy("dt").parquet(path)
    want = spark.read.parquet(path).count()

    # stage a same-content batch, then simulate: marker written, first
    # partition's old dir moved to backup, then crash
    txid = "deadbeef0123"
    staging = os.path.join(path, f".staging-{txid}")
    ev.write.mode("overwrite").partitionBy("dt").parquet(staging)
    parts = sorted(d for d in os.listdir(staging) if d.startswith("dt="))
    P._write_marker_durable(
        os.path.join(path, f"_commit-{txid}.json"),
        {"txid": txid, "partitions": parts},
    )
    backup = os.path.join(path, f".backup-{txid}")
    os.makedirs(backup)
    os.rename(os.path.join(path, parts[0]), os.path.join(backup, parts[0]))

    assert P.recover_partitions(path)
    assert spark.read.parquet(path).count() == want
    assert not any(
        f.startswith(("_commit-", ".staging-", ".backup-"))
        for f in os.listdir(path)
    )


def test_overwrite_partitions_atomic_nested_layout(spark, tmp_path):
    """Multi-level partitioning swaps at leaf col=value dirs: replace
    one (dt, bucket) leaf, leave every other leaf untouched."""
    import os

    from harmony_energy_data_pipeline_spark.sinks import partitioned as P

    df = spark.createDataFrame(
        [(d, b, i, float(i)) for d in ("a", "b") for b in (0, 1) for i in range(5)],
        "dt string, bkt int, k int, v double",
    )
    path = str(tmp_path / "nested")
    df.write.mode("overwrite").partitionBy("dt", "bkt").parquet(path)
    before = spark.read.parquet(path)
    assert before.count() == 20

    patch = spark.createDataFrame(
        [("a", 1, i, float(i) * 100) for i in range(5)],
        "dt string, bkt int, k int, v double",
    )
    P.overwrite_partitions_atomic(patch, path, ["dt", "bkt"])
    after = spark.read.parquet(path)
    assert after.count() == 20
    got = after.filter((F.col("dt") == "a") & (F.col("bkt") == 1)).agg(
        F.sum("v")
    ).first()[0]
    assert got == sum(i * 100 for i in range(5))
    untouched = after.filter(~((F.col("dt") == "a") & (F.col("bkt") == 1))).agg(
        F.sum("v")
    ).first()[0]
    assert untouched == 3 * sum(range(5))
    assert not any(
        f.startswith(("_commit-", ".staging-", ".backup-"))
        for f in os.listdir(path)
    )


def test_skew_aware_join_routes_unsupported_how_plain(spark, sf_dir):
    """right/full/semi joins must route to the plain branch (salting
    can't express them) instead of crashing when the data skews."""
    from harmony_energy_data_pipeline_spark.operators.joins import skew_aware_join

    ev = load_table(spark, "events", sf_dir)
    small = ev.select("user_id").distinct()
    out = skew_aware_join(
        ev, small, "user_id", how="full",
        broadcast_max_rows=0,          # force past the broadcast branch
        salt_share_ppm=0,              # everything counts as skewed
    )
    assert out.count() == ev.count()


def test_skew_aware_join_empty_big_side(spark, sf_dir):
    from harmony_energy_data_pipeline_spark.operators.joins import skew_aware_join

    ev = load_table(spark, "events", sf_dir)
    empty = ev.filter(F.lit(False))
    out = skew_aware_join(empty, ev.select("user_id").distinct(), "user_id",
                          broadcast_max_rows=0)
    assert out.count() == 0


def test_reader_recovery_leaves_inflight_staging_alone(spark, sf_dir, tmp_path):
    """A reader's recover_partitions must NOT delete an unmarked
    .staging dir (it may be a concurrent writer's in-flight commit);
    a writer's (gc_unmarked=True) sweeps it."""
    import os

    from harmony_energy_data_pipeline_spark.sinks import partitioned as P

    path = str(tmp_path / "tbl")
    ev = load_table(spark, "events", sf_dir).limit(100)
    P.write_partitioned(
        P.with_date_partition(ev, "ts"), path, ["dt"], mode="overwrite"
    )
    staging = os.path.join(path, ".staging-inflight1")
    os.makedirs(os.path.join(staging, "dt=2024-01-01"))
    # reader path: staging survives
    P.read_partitioned_committed(spark, path)
    assert os.path.exists(staging)
    # writer path: staging swept
    P.recover_partitions(path, gc_unmarked=True)
    assert not os.path.exists(staging)


def test_skew_aware_join_broadcast_cancels_concurrent_profile(spark, sf_dir):
    """The small-side count short-circuits to broadcast; the profile
    probe launched concurrently must be cancelled without surfacing
    its error, and later jobs on the session must be unaffected."""
    from harmony_energy_data_pipeline_spark.operators.joins import skew_aware_join

    ev = load_table(spark, "events", sf_dir)
    small = ev.select("user_id").distinct()
    out = skew_aware_join(ev, small, "user_id")  # default budget: fits
    assert out.count() == ev.count()
    # the cancelled probe's job group must not poison the session
    assert ev.limit(5).count() == 5


def test_skew_aware_join_salted_concurrent_probe_same_result(spark, sf_dir):
    from harmony_energy_data_pipeline_spark.operators.joins import skew_aware_join

    ev = load_table(spark, "events", sf_dir)
    big = ev.select(
        F.when((F.col("user_id") % 10) < 7, F.lit(0))
        .otherwise(F.col("user_id")).cast("long").alias("k"),
        F.col("value"),
    )
    dim = big.groupBy("k").agg(F.count("*").alias("n"))
    out = skew_aware_join(big, dim, "k", broadcast_max_rows=0,
                          salt_share_ppm=100_000).select("k", "value", "n")
    plain = big.join(dim, "k").select("k", "value", "n")
    assert sorted(map(tuple, out.collect())) == sorted(
        map(tuple, plain.collect())
    )
