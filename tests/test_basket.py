"""Market-basket pair_lift vs a Python brute force (cap, ties, lift)."""
from __future__ import annotations

from itertools import combinations

from spanner_data_validator_spark.operators.basket import (
    basket_arrays,
    dropped_basket_count,
    pair_lift,
)


def _brute(rows, max_basket, min_pair, k):
    baskets: dict[int, set[int]] = {}
    for g, it in rows:
        baskets.setdefault(g, set()).add(it)
    kept = {g: sorted(s) for g, s in baskets.items()
            if len(s) <= max_basket}
    n_groups = len(kept)
    pc: dict[tuple[int, int], int] = {}
    ic: dict[int, int] = {}
    for s in kept.values():
        for it in s:
            ic[it] = ic.get(it, 0) + 1
        for a, b in combinations(s, 2):
            pc[(a, b)] = pc.get((a, b), 0) + 1
    out = []
    for (a, b), n in pc.items():
        if n < min_pair:
            continue
        lift = (n * n_groups) / (ic[a] * ic[b])
        out.append((a, b, n, ic[a], ic[b], n_groups, lift))
    out.sort(key=lambda r: (-r[2], -r[6], r[0], r[1]))
    return out[:k]


def _rows():
    # baskets with repeats, singletons, ties, and one over-cap basket
    rows = []
    for g, items in enumerate([
        [1, 2, 3], [1, 2], [2, 3, 4], [1, 2, 3, 4], [5],
        [1, 5, 2, 2], [3, 4], [1, 2], [6, 7], [6, 7, 1],
    ]):
        rows += [(g, it) for it in items]
    rows += [(99, it) for it in range(40)]  # dropped by max_basket=8
    return rows


def test_pair_lift_matches_brute_force(spark):
    rows = _rows()
    df = spark.createDataFrame(rows, "grp long, it long")
    got = [(r.item_a, r.item_b, r.n_pair, r.n_a, r.n_b, r.n_groups, r.lift)
           for r in pair_lift(df, "grp", "it", max_basket=8,
                              min_pair_count=1, k=100).collect()]
    assert got == _brute(rows, 8, 1, 100)


def test_pair_lift_min_count_and_k(spark):
    rows = _rows()
    df = spark.createDataFrame(rows, "grp long, it long")
    got = [(r.item_a, r.item_b, r.n_pair)
           for r in pair_lift(df, "grp", "it", max_basket=8,
                              min_pair_count=2, k=3).collect()]
    want = [(a, b, n) for a, b, n, *_ in _brute(rows, 8, 2, 3)]
    assert got == want


def test_basket_cap_and_drop_probe(spark):
    rows = _rows()
    df = spark.createDataFrame(rows, "grp long, it long")
    assert dropped_basket_count(df, "grp", "it", max_basket=8) == 1
    arrs = {r.grp: r.items
            for r in basket_arrays(df, "grp", "it", max_basket=8).collect()}
    assert 99 not in arrs
    assert arrs[5] == [1, 2, 5]  # dedup + sort inside the basket
