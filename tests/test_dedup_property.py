"""Property-based check of the two-phase keep-last dedup: for random
small frames, the Spark window implementation must agree with a direct
Python model of the reference semantics
(/root/reference/src/transform/transform.py:206-220 with the engine's
deterministic tiebreak, SURVEY.md §7.3 item 1)."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from harmony_energy_data_pipeline_spark.operators.cleaning import dedup_two_phase

rows_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=5),    # _id: few values -> collisions
        st.integers(min_value=0, max_value=5),    # ts (encoded as int)
        st.integers(min_value=0, max_value=3),    # value (tiebreak column)
    ),
    min_size=1,
    max_size=25,
)


def _model(rows):
    """Pure-Python reference: phase 1 keep max (ts, value) per id;
    phase 2 keep max (id, value) per ts — desc tiebreak on remaining
    columns, matching dedup_keep_last's ordering."""
    by_id: dict = {}
    for _id, ts, val in rows:
        cur = by_id.get(_id)
        if cur is None or (ts, val) > (cur[1], cur[2]):
            by_id[_id] = (_id, ts, val)
    by_ts: dict = {}
    for _id, ts, val in by_id.values():
        cur = by_ts.get(ts)
        if cur is None or (_id, val) > (cur[0], cur[2]):
            by_ts[ts] = (_id, ts, val)
    return sorted(by_ts.values())


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(rows_strategy)
def test_two_phase_dedup_matches_model(spark, rows):
    df = spark.createDataFrame(rows, "_id long, ts long, value long")
    got = sorted(
        (r["_id"], r["ts"], r["value"])
        for r in dedup_two_phase(df, id_col="_id", time_col="ts").collect()
    )
    assert got == _model(rows)


asof_left = st.lists(
    st.tuples(st.integers(0, 3), st.integers(0, 10)),  # (key, ts)
    min_size=1, max_size=15,
)
asof_right = st.dictionaries(
    st.tuples(st.integers(0, 3), st.integers(0, 10)),  # (key, ts) unique
    st.integers(0, 100),                               # payload
    min_size=0, max_size=15,
)


@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(asof_left, asof_right)
def test_asof_join_matches_model(spark, left_rows, right_map):
    from harmony_energy_data_pipeline_spark.operators.temporal import asof_join

    left = spark.createDataFrame(
        [(k, t, i) for i, (k, t) in enumerate(left_rows)], "k long, ts long, lid long"
    )
    right_rows = [(k, t, v) for (k, t), v in right_map.items()]
    right = spark.createDataFrame(right_rows or [(99, 99, 0)], "k long, ts long, v long")
    if not right_rows:
        right = right.filter("k < 0")

    got = {
        r["lid"]: r["v"]
        for r in asof_join(left, right, on="k", how="left").collect()
    }
    want = {}
    for i, (k, t) in enumerate(left_rows):
        cands = [(rt, v) for (rk, rt), v in right_map.items() if rk == k and rt <= t]
        want[i] = max(cands)[1] if cands else None
    assert got == want


@pytest.mark.parametrize("max_local_edges", [1_000_000, 0])
def test_connected_components_matches_union_find(spark, max_local_edges):
    # max_local_edges=1M exercises the driver union-find route,
    # 0 forces the distributed min-label loop — identical output
    import random as _random

    from harmony_energy_data_pipeline_spark.operators.dedup import (
        connected_components,
        dedup_by_clusters,
    )

    rng = _random.Random(7)
    # several graph shapes in one: chain, clique, stars, singleton pairs
    edges = (
        [(i, i + 1) for i in range(0, 8)]                   # 9-node chain
        + [(a, b) for a in range(20, 25) for b in range(a + 1, 25)]  # clique
        + [(30, t) for t in (31, 32, 33)]                   # star
        + [(rng.randrange(40, 70), rng.randrange(40, 70)) for _ in range(25)]
    )
    edges = [(a, b) for a, b in edges if a != b]

    # reference: union-find
    parent: dict = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    for a, b in edges:
        union(a, b)
    want = {n: find(n) for n in parent}

    pairs = spark.createDataFrame(edges, "id_a long, id_b long")
    got = {
        r["node"]: r["component"]
        for r in connected_components(
            pairs, max_local_edges=max_local_edges
        ).collect()
    }
    # canonicalize the union-find roots to min-of-component to compare
    comp_members: dict = {}
    for n, root in want.items():
        comp_members.setdefault(root, []).append(n)
    want_min = {
        n: min(members)
        for members in comp_members.values()
        for n in members
    }
    assert got == want_min

    # representatives: one survivor per cluster + all untouched rows
    ids = list(range(0, 75))
    df = spark.createDataFrame([(i,) for i in ids], "id long")
    kept = {r["id"] for r in dedup_by_clusters(df, pairs, "id").collect()}
    expected_losers = {n for n, c in want_min.items() if n != c}
    assert kept == set(ids) - expected_losers


def test_dedup_by_clusters_best_keeps_highest_score(spark):
    from harmony_energy_data_pipeline_spark.operators.dedup import (
        dedup_by_clusters,
        dedup_by_clusters_best,
    )

    # cluster {1,2,3} (chain), cluster {10,11}, singleton 20
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], "id_a long, id_b long"
    )
    df = spark.createDataFrame(
        [(1, 5.0), (2, 9.0), (3, 7.0), (10, 1.0), (11, 1.0), (20, 0.0)],
        "doc_id long, score double",
    )
    best = {r["doc_id"] for r in dedup_by_clusters_best(df, pairs, "doc_id", "score").collect()}
    assert best == {2, 10, 20}  # argmax per cluster; tie -> smallest id
    smallest = {r["doc_id"] for r in dedup_by_clusters(df, pairs, "doc_id").collect()}
    assert smallest == {1, 10, 20}
