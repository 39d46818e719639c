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
