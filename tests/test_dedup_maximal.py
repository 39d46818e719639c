"""maximal_duplicate_spans vs brute-force maximal common substrings.

The brute force is a classic O(n*m) common-suffix DP per document pair: a
maximal common substring occurrence pair is a cell with run length L >=
min_len that cannot be extended right (left-maximality is inherent to the
suffix DP). The operator must reproduce that set EXACTLY — extents, pair
attribution, window counts — for min_len >= width (shorter spans carry no
full window by construction).
"""
from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from spanner_data_validator_spark.operators.dedup import (
    maximal_duplicate_spans)


def _brute_maximal(docs: dict[int, list[str]], width: int,
                   min_len: int) -> set[tuple]:
    out = set()
    ids = sorted(docs)
    for ia in ids:
        for ib in ids:
            if ib < ia:
                continue
            a, b = docs[ia], docs[ib]
            n, m = len(a), len(b)
            dp = [[0] * (m + 1) for _ in range(n + 1)]
            for i in range(1, n + 1):
                for j in range(1, m + 1):
                    if a[i - 1] == b[j - 1]:
                        dp[i][j] = dp[i - 1][j - 1] + 1
            for i in range(1, n + 1):
                for j in range(1, m + 1):
                    ln = dp[i][j]
                    if ln < min_len:
                        continue
                    if i < n and j < m and a[i] == b[j]:
                        continue  # extendable right -> not maximal
                    a_start, b_start = i - ln + 1, j - ln + 1
                    if ia == ib and not a_start < b_start:
                        continue  # self-pair canonical orientation
                    out.add((ia, a_start, ib, b_start, ln, ln - width + 1))
    return out


def _run_operator(spark, docs: dict[int, list[str]], width: int,
                  min_len: int) -> set[tuple]:
    df = spark.createDataFrame(
        [(i, " ".join(t)) for i, t in docs.items()], "doc_id long, text string")
    out = maximal_duplicate_spans(df, "doc_id", "text", width=width,
                                  min_len=min_len, max_occurrences=10 ** 6)
    return {tuple(r) for r in out.collect()}


def test_planted_spans_exact(spark):
    w = 4
    shared = "alpha beta gamma delta epsilon zeta eta theta".split()  # 8 toks
    docs = {
        # cross-doc: shared span mid-doc vs head-of-doc
        1: "x1 x2 x3".split() + shared + "y1 y2".split(),
        2: shared + "z1 z2 z3 z4".split(),
        # internal repeat: same 5-token phrase twice, 1-token spacer
        3: "p q r s t GAP p q r s t".split(),
        # no duplication at all
        4: "u1 u2 u3 u4 u5 u6 u7 u8 u9".split(),
    }
    got = _run_operator(spark, docs, w, w)
    want = _brute_maximal(docs, w, w)
    assert got == want
    # the planted facts themselves, spelled out:
    assert (1, 4, 2, 1, 8, 5) in got          # 8-token shared span
    assert (3, 1, 3, 7, 5, 2) in got          # internal repeat (diag 6)


def test_three_way_share_and_gap_split(spark):
    w = 3
    s = "m1 m2 m3 m4 m5".split()
    docs = {
        10: s + ["a"],
        11: ["b"] + s,
        12: s + ["c", "d"],
        # same diagonal, two runs split by one mismatching token
        13: s + ["STOP"] + s,
        14: s + ["HALT"] + s,
    }
    got = _run_operator(spark, docs, w, w)
    want = _brute_maximal(docs, w, w)
    assert got == want
    # all three cross-pairs of the 3-way share are attributed
    for ia, ib, sa, sb in [(10, 11, 1, 2), (10, 12, 1, 1), (11, 12, 2, 1)]:
        assert any(r[0] == ia and r[2] == ib and r[1] == sa and r[3] == sb
                   and r[4] == 5 for r in got)


@pytest.mark.parametrize("seed", [7, 19, 101])
def test_random_corpus_matches_brute_force(spark, seed):
    rng = random.Random(seed)
    vocab = [f"t{k}" for k in range(6)]
    docs = {i: [rng.choice(vocab) for _ in range(rng.randint(20, 60))]
            for i in range(1, 7)}
    w = 4
    got = _run_operator(spark, docs, w, w)
    want = _brute_maximal(docs, w, w)
    assert got == want


def test_min_len_filter_and_hot_cap(spark):
    w = 3
    s = "k1 k2 k3 k4 k5 k6".split()
    docs = {1: s + ["x"], 2: ["y"] + s, 3: "k1 k2 k3 z1 z2 z3".split()}
    # min_len=6 keeps only the full 6-token span, not the 3-token prefix
    # match of doc 3 (len 3 < 6)
    got = _run_operator(spark, docs, w, 6)
    assert got == {(1, 1, 2, 2, 6, 4)}
    # a cap of 2 drops every window of the 3-way-shared prefix (k1 k2 k3
    # occurs 3 times corpus-wide) but keeps the 2-occurrence tail windows:
    # the surviving maximal run is the tail, truncated where the hot
    # window was dropped
    df = spark.createDataFrame(
        [(i, " ".join(t)) for i, t in docs.items()], "doc_id long, text string")
    capped = maximal_duplicate_spans(df, "doc_id", "text", width=w,
                                     min_len=w, max_occurrences=2)
    rows = {tuple(r) for r in capped.collect()}
    assert all(r[4] < 6 for r in rows)  # full span broken by the hot drop
    assert (1, 2, 2, 3, 5, 3) in rows   # k2..k6 windows occur only twice
