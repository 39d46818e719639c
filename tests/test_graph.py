"""Fixed-point PageRank (operators/graph.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from spanner_data_validator_spark.operators.graph import pagerank_fixed_point


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


def test_hand_computed_two_node_cycle(spark):
    # a <-> b: symmetric, deg 1 each. r0 = S = 1e6.
    # iter: contrib = floor(1e6/1) = 1e6; r' = 150000 + floor(.85e6) = 1e6
    # — the fixpoint, stable across all iterations.
    r = {x["node"]: x["rank"] for x in pagerank_fixed_point(
        _edges(spark, [(1, 2), (2, 1)]), iterations=3).collect()}
    assert r == {1: 1_000_000, 2: 1_000_000}


def test_star_hub_dominates(spark):
    # leaves 2..5 <-> hub 1: hub collects 4 contributions
    pairs = [(1, i) for i in range(2, 6)] + [(i, 1) for i in range(2, 6)]
    rows = pagerank_fixed_point(_edges(spark, pairs), iterations=3).collect()
    r = {x["node"]: x["rank"] for x in rows}
    assert r[1] > r[2] and len({r[i] for i in range(2, 6)}) == 1


def test_partitioning_invariant_bit_exact(spark):
    import random
    random.seed(3)
    pairs = [(random.randint(0, 40), random.randint(0, 40))
             for _ in range(300)]
    e = _edges(spark, pairs)
    a = sorted(map(tuple, pagerank_fixed_point(
        e.coalesce(1), iterations=3).collect()))
    b = sorted(map(tuple, pagerank_fixed_point(
        e.repartition(16), iterations=3).collect()))
    assert a == b


def test_rank_mass_bounded(spark):
    # floor() only ever discards mass, so total rank never exceeds N*S
    pairs = [(i, (i + 1) % 7) for i in range(7)]
    rows = pagerank_fixed_point(_edges(spark, pairs), iterations=4).collect()
    assert sum(r["rank"] for r in rows) <= 7 * 1_000_000


def test_triangle_k4_counts(spark):
    from spanner_data_validator_spark.operators.graph import (
        triangle_participation,
    )

    # K4: 4 triangles, each node in exactly 3; loops/parallels ignored
    k4 = [(a, b) for a in range(1, 5) for b in range(1, 5) if a < b]
    noise = [(1, 1), (2, 1), (3, 2)]  # loop + reversed duplicates
    e = _edges(spark, k4 + noise)
    out = [(r["node"], r["n_tri"], r["rank"])
           for r in triangle_participation(e, k=10).collect()]
    assert out == [(1, 3, 1), (2, 3, 2), (3, 3, 3), (4, 3, 4)]


def test_triangle_square_has_none(spark):
    from spanner_data_validator_spark.operators.graph import (
        triangle_participation,
    )

    e = _edges(spark, [(1, 2), (2, 3), (3, 4), (4, 1)])
    assert triangle_participation(e).count() == 0


def test_triangle_hub_with_one_closing_edge(spark):
    from spanner_data_validator_spark.operators.graph import (
        triangle_participation,
    )

    # star hub 1 -- leaves 2..6, plus one leaf-leaf edge (2,3):
    # exactly one triangle {1,2,3}
    pairs = [(1, i) for i in range(2, 7)] + [(2, 3)]
    out = {r["node"]: r["n_tri"]
           for r in triangle_participation(_edges(spark, pairs)).collect()}
    assert out == {1: 1, 2: 1, 3: 1}


# ------------------------------------------------------------------ BFS


def test_hop_distance_levels_and_cycles(spark):
    from spanner_data_validator_spark.operators.graph import hop_distance
    # 0-1-2-3 chain with a 1-2-4 triangle (cycle), 5-6 disconnected,
    # 7 isolated seedless node
    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (1, 4), (4, 2), (5, 6)],
        "src long, dst long")
    seeds = spark.createDataFrame([(0,)], "node long")
    got = {r.node: r.hops
           for r in hop_distance(edges, seeds, max_hops=10).collect()}
    assert got == {0: 0, 1: 1, 2: 2, 4: 2, 3: 3}


def test_hop_distance_max_hops_truncates(spark):
    from spanner_data_validator_spark.operators.graph import hop_distance
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(6)], "src long, dst long")
    seeds = spark.createDataFrame([(0,)], "node long")
    got = {r.node: r.hops
           for r in hop_distance(edges, seeds, max_hops=2).collect()}
    assert got == {0: 0, 1: 1, 2: 2}


def test_hop_distance_multi_seed_directed(spark):
    from spanner_data_validator_spark.operators.graph import hop_distance
    # directed: 3->2 must NOT make 2 reachable from 2's side reversed
    edges = spark.createDataFrame(
        [(0, 1), (3, 2)], "src long, dst long")
    seeds = spark.createDataFrame([(0,), (2,)], "node long")
    got = {r.node: r.hops
           for r in hop_distance(edges, seeds, max_hops=3,
                                 undirected=False).collect()}
    assert got == {0: 0, 2: 0, 1: 1}
