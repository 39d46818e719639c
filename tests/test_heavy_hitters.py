"""operators/sketch.py Misra-Gries heavy hitters: guarantee + exactness."""
from __future__ import annotations

from collections import Counter

from pyspark.sql import functions as F

from spanner_data_validator_spark.operators.sketch import (
    heavy_hitters_exact,
    misra_gries_candidates,
)


def _zipfish(n: int) -> list[int]:
    # deterministic skew: item j appears ~n/(j+1) times over a wide domain
    out = []
    j = 0
    while len(out) < n:
        out.extend([j] * max(1, n // (8 * (j + 1))))
        j += 1
    return out[:n]


def test_mg_candidates_superset_guarantee(spark):
    vals = _zipfish(4000)
    truth = Counter(vals)
    k = 10
    df = spark.createDataFrame([(v,) for v in vals], "it long") \
        .repartition(7)  # multiple partitions: union-of-summaries path
    cands = {r["it"] for r in
             misra_gries_candidates(df, "it", k).distinct().collect()}
    n = len(vals)
    must_have = {v for v, c in truth.items() if c * (k + 1) > n}
    assert must_have, "fixture must plant at least one heavy hitter"
    assert must_have <= cands
    # real pruning: the domain exceeds the candidate budget
    assert len(truth) > k


def test_heavy_hitters_exact_matches_brute_force(spark):
    vals = _zipfish(4000)
    truth = Counter(vals)
    k = 10
    n = len(vals)
    df = spark.createDataFrame([(v,) for v in vals], "it long") \
        .repartition(7)
    got = {r["item"]: (r["cnt"], r["n_total"]) for r in
           heavy_hitters_exact(df, F.col("it"), k).collect()}
    expect = {v: c for v, c in truth.items() if c * (k + 1) > n}
    assert {v: c for v, (c, _) in got.items()} == expect
    assert all(t == n for _, t in got.values())


def test_heavy_hitters_uniform_is_empty(spark):
    df = spark.createDataFrame([(i % 100,) for i in range(5000)], "it long")
    assert heavy_hitters_exact(df, F.col("it"), 10).count() == 0


def test_weighted_heavy_hitters_matches_brute_force(spark):
    from spanner_data_validator_spark.operators.sketch import (
        weighted_heavy_hitters_exact,
    )
    vals = _zipfish(3000)
    # positive integer weights, with item 0 carrying 10x weight so the
    # weighted heavy-hitter set is non-trivially different from the
    # count-based one
    rows = [(v, 10 if v == 0 else 1) for v in vals]
    df = spark.createDataFrame(rows, "it long, w long").repartition(6)
    k = 10
    wtot = sum(w for _, w in rows)
    truth = Counter()
    for v, w in rows:
        truth[v] += w
    got = {r["item"]: (r["w_sum"], r["w_total"]) for r in
           weighted_heavy_hitters_exact(
               df, F.col("it"), F.col("w"), k).collect()}
    expect = {v: s for v, s in truth.items() if s * (k + 1) > wtot}
    assert expect and {v: s for v, (s, _) in got.items()} == expect
    assert all(t == wtot for _, t in got.values())
