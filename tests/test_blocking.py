"""global_row_number, PPJoin prefix filtering, sorted-neighborhood."""
from __future__ import annotations

from pyspark.sql import functions as F

from spanner_data_validator_spark.operators.dedup import (
    jaccard_pairs,
    prefix_filter_jaccard_pairs,
)
from spanner_data_validator_spark.operators.layout import global_row_number
from spanner_data_validator_spark.operators.linkage import (
    sorted_neighborhood_pairs,
)


def test_global_row_number_matches_global_sort(spark):
    rows = [((i * 37) % 101, f"s{i}") for i in range(300)]
    df = spark.createDataFrame(rows, "v long, tag string").repartition(8)
    # bucket by value bit-length: monotone in v, order-aligned
    out = global_row_number(
        df, [F.col("v"), F.col("tag")],
        F.length(F.bin(F.greatest(F.col("v"), F.lit(1))))).collect()
    got = [(r["rn"], r["v"], r["tag"]) for r in out]
    expect_order = sorted(rows)
    assert sorted(got) == [(i + 1, v, t)
                           for i, (v, t) in enumerate(expect_order)]


def test_prefix_filter_equals_inverted_index(spark):
    texts = [
        (1, "a b c d e f g h"),
        (2, "a b c d e f g x"),       # near-dup of 1
        (3, "p q r s t u v w"),
        (4, "p q r s t u v w"),       # exact dup of 3
        (5, "m n o zz yy xx ww vv"),
    ]
    df = spark.createDataFrame(texts, "doc_id long, text string")
    base = {(r["a"], r["b"]): r["jaccard"] for r in
            jaccard_pairs(df, "doc_id", "text", n=3,
                          threshold=0.5).collect()}
    pp = {(r["a"], r["b"]): r["jaccard"] for r in
          prefix_filter_jaccard_pairs(df, "doc_id", "text", n=3,
                                      threshold=0.5).collect()}
    assert base and pp == base  # same exact answer, different plan


def test_sorted_neighborhood_finds_adjacent_drift(spark):
    rows = [
        (1, "alpha#100"), (2, "alpha#10"),      # late-position edit: found
        (3, "beta#200"), (4, "zeta#200"),       # early edit: sort-distant
        (5, "gamma#1"), (6, "gamma#1"),         # exact dup: dist 0
    ]
    df = spark.createDataFrame(rows, "id long, key string")
    pairs = {(r["id_a"], r["id_b"]): r["dist"] for r in
             sorted_neighborhood_pairs(df, "key", "id", window=3,
                                       max_distance=1).collect()}
    assert pairs[(2, 1)] == 1          # 'alpha#10' sorts before 'alpha#100'
    assert pairs[(5, 6)] == 0
    # the documented blind spot: beta/zeta differ by 1 edit but sort apart
    assert (3, 4) not in pairs and (4, 3) not in pairs


def test_sorted_neighborhood_matches_bruteforce_within_window(spark):
    keys = [f"key{(i * 13) % 47:03d}#{i}" for i in range(60)]
    df = spark.createDataFrame(list(enumerate(keys)), "id long, key string")
    w = 5
    got = {(r["id_a"], r["id_b"]) for r in sorted_neighborhood_pairs(
        df, "key", "id", window=w, max_distance=2).collect()}

    def lev(a: str, b: str) -> int:
        la, lb = len(a), len(b)
        prev = list(range(lb + 1))
        for i in range(1, la + 1):
            cur = [i] + [0] * lb
            for j in range(1, lb + 1):
                cur[j] = min(prev[j] + 1, cur[j - 1] + 1,
                             prev[j - 1] + (a[i - 1] != b[j - 1]))
            prev = cur
        return prev[lb]

    order = sorted(zip(keys, range(60)))
    expect = set()
    for x in range(len(order)):
        for y in range(x + 1, min(x + w, len(order))):
            if lev(order[x][0], order[y][0]) <= 2:
                expect.add((order[x][1], order[y][1]))
    assert got == expect
