"""Round-4 session-5 operators: skyline, BOM rollup, Bellman-Ford."""

from __future__ import annotations

import itertools
import random

from pyspark.sql import functions as F

from spanner_data_validator_spark.operators.graph import bellman_ford
from spanner_data_validator_spark.operators.hierarchy import (
    bom_rollup,
    resolve_roots,
)
from spanner_data_validator_spark.operators.skyline import pareto_frontier


# --- skyline -----------------------------------------------------------

def _brute_skyline(pts):
    out = []
    for p in pts:
        dominated = any(
            q[0] <= p[0] and q[1] <= p[1] and (q[0] < p[0] or q[1] < p[1])
            for q in pts)
        if not dominated:
            out.append(p)
    agg = {}
    for p in out:
        agg[p] = agg.get(p, 0) + 1
    return {(x, y, n) for (x, y), n in agg.items()}


def _run_skyline(spark, pts):
    df = spark.createDataFrame([(x, y) for x, y in pts], "x long, y long")
    got = {(r["x"], r["y"], r["n_points"])
           for r in pareto_frontier(df, F.col("x"), F.col("y")).collect()}
    assert got == _brute_skyline(pts)


def test_skyline_hand_case(spark):
    # frontier: (1,5), (2,3), (4,1); (2,4) dominated by (2,3); dup (2,3)x2
    _run_skyline(spark, [(1, 5), (2, 3), (2, 3), (2, 4), (4, 1), (5, 2),
                         (4, 7), (9, 9)])


def test_skyline_equal_points_survive(spark):
    _run_skyline(spark, [(3, 3), (3, 3), (3, 3)])


def test_skyline_line_and_antichain(spark):
    # strictly increasing y along increasing x -> only the first survives
    _run_skyline(spark, [(i, i) for i in range(10)])
    # strict antichain -> everything survives
    _run_skyline(spark, [(i, 10 - i) for i in range(10)])


def test_skyline_random_vs_brute(spark):
    rng = random.Random(20260820)
    for trial in range(3):
        pts = [(rng.randrange(8), rng.randrange(8)) for _ in range(60)]
        _run_skyline(spark, pts)


# --- BOM rollup --------------------------------------------------------

def _forest_df(spark, rows):
    return spark.createDataFrame(rows, "node long, parent long, qty long")


def test_resolve_roots_two_level_products(spark):
    #   1 -(2)-> 10 -(3)-> 100 ; 1 -(5)-> 11 ; 2 lone root
    rows = [(1, None, None), (2, None, None),
            (10, 1, 2), (11, 1, 5), (100, 10, 3)]
    got = {r["node"]: (r["root"], r["prod"])
           for r in resolve_roots(_forest_df(spark, rows),
                                  max_depth=4).collect()}
    assert got == {1: (1, 1), 2: (2, 1), 10: (1, 2), 11: (1, 5),
                   100: (1, 6)}


def test_bom_rollup_hand_case(spark):
    rows = [(1, None, None), (2, None, None),
            (10, 1, 2), (11, 1, 5), (100, 10, 3)]
    got = {r["root"]: (r["n_nodes"], r["n_leaves"], r["leaf_qty_sum"])
           for r in bom_rollup(_forest_df(spark, rows),
                               max_depth=4).collect()}
    # root 1: nodes {1,10,11,100}, leaves {11 (prod 5), 100 (prod 6)}
    assert got == {1: (4, 2, 11), 2: (1, 1, 1)}


def test_bom_rollup_deep_chain_exceeding_one_doubling(spark):
    # depth-9 chain, qty 2 each: leaf prod = 2^9; needs >3 doubling rounds
    rows = [(0, None, None)] + [(i, i - 1, 2) for i in range(1, 10)]
    got = {r["root"]: (r["n_nodes"], r["n_leaves"], r["leaf_qty_sum"])
           for r in bom_rollup(_forest_df(spark, rows),
                               max_depth=9).collect()}
    assert got == {0: (10, 1, 512)}


def test_bom_rollup_random_vs_brute(spark):
    rng = random.Random(42)
    n = 80
    rows = [(0, None, None)]
    for i in range(1, n):
        rows.append((i, rng.randrange(0, i), rng.randrange(1, 4)))
    # brute force
    parent = {r[0]: r[1] for r in rows}
    qty = {r[0]: r[2] for r in rows}
    children = set(r[1] for r in rows if r[1] is not None)

    def prod(i):
        p = 1
        while parent[i] is not None:
            p *= qty[i]
            i = parent[i]
        return p

    leaves = [i for i in range(n) if i not in children]
    expect = {0: (n, len(leaves), sum(prod(i) for i in leaves))}
    got = {r["root"]: (r["n_nodes"], r["n_leaves"], r["leaf_qty_sum"])
           for r in bom_rollup(_forest_df(spark, rows),
                               max_depth=n).collect()}
    assert got == expect


# --- Bellman-Ford ------------------------------------------------------

def _wedges(spark, triples):
    return spark.createDataFrame(triples, "src long, dst long, w long")


def _seeds(spark, nodes):
    return spark.createDataFrame([(n,) for n in nodes], "node long")


def test_bf_later_round_improves_distance(spark):
    # direct hop 0->2 costs 10; two-hop via 1 costs 3: min wins
    e = _wedges(spark, [(0, 2, 10), (0, 1, 1), (1, 2, 2)])
    got = {r["node"]: r["dist"]
           for r in bellman_ford(e, _seeds(spark, [0]), rounds=3,
                                 undirected=False).collect()}
    assert got == {0: 0, 1: 1, 2: 3}


def test_bf_round_bound_limits_path_length(spark):
    e = _wedges(spark, [(0, 1, 1), (1, 2, 1), (2, 3, 1)])
    got = {r["node"]: r["dist"]
           for r in bellman_ford(e, _seeds(spark, [0]), rounds=2,
                                 undirected=False).collect()}
    assert got == {0: 0, 1: 1, 2: 2}  # node 3 is 3 hops away


def test_bf_undirected_and_parallel_edge_min(spark):
    e = _wedges(spark, [(0, 1, 7), (0, 1, 4), (1, 2, 1)])
    got = {r["node"]: r["dist"]
           for r in bellman_ford(e, _seeds(spark, [2]), rounds=4,
                                 undirected=True).collect()}
    assert got == {2: 0, 1: 1, 0: 5}


def test_bf_random_vs_floyd_warshall(spark):
    rng = random.Random(7)
    n, m, rounds = 12, 30, 11
    triples = [(rng.randrange(n), rng.randrange(n), rng.randrange(1, 9))
               for _ in range(m)]
    inf = float("inf")
    d = [[inf] * n for _ in range(n)]
    for i in range(n):
        d[i][i] = 0
    for s, t, w in triples:
        d[s][t] = min(d[s][t], w)
        d[t][s] = min(d[t][s], w)
    for k, i, j in itertools.product(range(n), repeat=3):
        if d[i][k] + d[k][j] < d[i][j]:
            d[i][j] = d[i][k] + d[k][j]
    seeds = [0, 5]
    expect = {v: int(min(d[s][v] for s in seeds)) for v in range(n)
              if min(d[s][v] for s in seeds) < inf}
    got = {r["node"]: r["dist"]
           for r in bellman_ford(_wedges(spark, triples),
                                 _seeds(spark, seeds), rounds=rounds,
                                 undirected=True).collect()}
    assert got == expect


# --- product quantization -----------------------------------------------

def test_pq_assign_exact_and_tiebreak(spark):
    from spanner_data_validator_spark.operators.quantize import pq_assign

    # 4-dim vectors, 2 subspaces of 2; codebook: code0=[0,0,0,0],
    # code1=[10,10,10,10], code2 duplicates code1 (tie -> smaller id)
    cb = spark.createDataFrame(
        [(0, [0, 0, 0, 0]), (1, [10, 10, 10, 10]), (2, [10, 10, 10, 10])],
        "code int, ci array<long>")
    vecs = spark.createDataFrame(
        [(100, [0, 0, 10, 10]),   # sub0 -> code0 err 0; sub1 -> code1 err 0
         (101, [7, 7, 1, 1])],    # sub0 -> code1 (18 vs 98); sub1 -> code0 (2)
        "vec_id long, vi array<long>")
    got = {(r["vec_id"], r["subspace"]): (r["code"], r["err"])
           for r in pq_assign(vecs, cb, m=2, sub_dim=2).collect()}
    assert got == {(100, 0): (0, 0), (100, 1): (1, 0),
                   (101, 0): (1, 18), (101, 1): (0, 2)}


def test_skyline_null_objectives_excluded(spark):
    df = spark.createDataFrame(
        [(1, 5), (None, 0), (2, None), (2, 3)], "x long, y long")
    from pyspark.sql import functions as FF
    got = {(r["x"], r["y"], r["n_points"])
           for r in pareto_frontier(df, FF.col("x"), FF.col("y")).collect()}
    assert got == {(1, 5, 1), (2, 3, 1)}


def test_wide_skyline_matches_narrow_on_random_partitions(spark):
    from spanner_data_validator_spark.operators.skyline import (
        pareto_frontier_wide,
    )

    rng = random.Random(99)
    pts = [(rng.randrange(1000), rng.randrange(1000)) for _ in range(500)]
    pts += [pts[0], pts[1]]  # planted duplicates
    df = spark.createDataFrame(pts, "x long, y long").repartition(7)
    wide = {(r["x"], r["y"], r["n_points"])
            for r in pareto_frontier_wide(
                df, F.col("x"), F.col("y")).collect()}
    assert wide == _brute_skyline(pts)
