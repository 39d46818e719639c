"""Tests for scd2_build, salted_join, and bigram_collocations."""

from pyspark.sql import functions as F

from spanner_data_validator_spark.operators.scd import scd2_build
from spanner_data_validator_spark.operators.skew import salted_join
from spanner_data_validator_spark.operators.terms import bigram_collocations


def _log(spark, rows):
    return spark.createDataFrame(rows, "k string, ts long, p string, tb long")


def test_scd2_versions_and_ranges(spark):
    log = _log(spark, [("u", 10, "a", 0), ("u", 20, "a", 1),  # no-op update
                       ("u", 30, "b", 2), ("u", 40, "a", 3)])
    out = {r.version: r for r in
           scd2_build(log, ["k"], F.col("ts"), F.col("p"), F.col("tb"))
           .collect()}
    assert len(out) == 3  # the ts=20 no-op collapsed
    assert (out[1].payload, out[1].effective_from_ms, out[1].effective_to_ms,
            out[1].is_current) == ("a", 10, 30, False)
    assert (out[2].payload, out[2].effective_to_ms) == ("b", 40)
    assert (out[3].payload, out[3].effective_to_ms, out[3].is_current) == \
        ("a", None, True)


def test_scd2_null_payload_is_a_version(spark):
    log = _log(spark, [("u", 10, None, 0), ("u", 20, None, 1),
                       ("u", 30, "x", 2)])
    out = scd2_build(log, ["k"], F.col("ts"), F.col("p"), F.col("tb")) \
        .orderBy("version").collect()
    assert [r.payload for r in out] == [None, "x"]
    assert out[0].effective_from_ms == 10 and out[0].effective_to_ms == 30


def test_scd2_tiebreak_last_writer_wins_instant(spark):
    # two writes at the same ts: the higher tiebreak is the later version
    log = _log(spark, [("u", 10, "first", 0), ("u", 10, "second", 1)])
    out = scd2_build(log, ["k"], F.col("ts"), F.col("p"), F.col("tb")) \
        .orderBy("version").collect()
    assert [r.payload for r in out] == ["first", "second"]
    assert out[1].is_current


def test_salted_join_matches_plain_join(spark):
    # planted skew: 90% of big rows share one key
    big = spark.range(0, 5000).select(
        F.when(F.col("id") % 10 < 9, F.lit("hot")).otherwise(
            F.concat(F.lit("k"), (F.col("id") % 37).cast("string"))).alias("k"),
        F.col("id"))
    small = spark.createDataFrame(
        [("hot", 1), ("k3", 2), ("missing", 3)], "k string, v long")
    plain = big.join(small, "k").select("id", "v")
    salted = salted_join(big, small, ["k"], 8,
                         big_salt_source=F.col("id")).select("id", "v")
    assert sorted(map(tuple, plain.collect())) == \
        sorted(map(tuple, salted.collect()))


def test_salted_join_spreads_hot_key(spark):
    big = spark.range(0, 1000).select(F.lit("hot").alias("k"), F.col("id"))
    small = spark.createDataFrame([("hot", 1)], "k string, v long")
    out = salted_join(big, small, ["k"], 8, big_salt_source=F.col("id"))
    # pre-drop the salt is gone from output; verify the scatter actually
    # split the key by recomputing the salt distribution
    n_salts = big.select(
        F.pmod(F.xxhash64(F.col("id")), F.lit(8)).alias("s")) \
        .distinct().count()
    assert n_salts == 8
    assert out.count() == 1000


def test_salted_join_left_outer_keeps_unmatched(spark):
    big = spark.createDataFrame([("a", 1), ("b", 2)], "k string, id long")
    small = spark.createDataFrame([("a", 10)], "k string, v long")
    out = salted_join(big, small, ["k"], 4, big_salt_source=F.col("id"),
                      how="left").collect()
    got = {(r.k): r.v for r in out}
    assert got == {"a": 10, "b": None}


def test_bigram_collocations_counts_and_lift(spark):
    docs = spark.createDataFrame(
        [(1, "big data big data big time"), (2, "big data")],
        "doc_id long, text string")
    out = {(r.w1, r.w2): r for r in
           bigram_collocations(docs, "doc_id", "text", min_count=1).collect()}
    # bigrams doc1: (big,data)x2 (data,big)x2 (big,time); doc2: (big,data)
    bd = out[("big", "data")]
    assert bd.pair_n == 3
    assert bd.w1_n == 4 and bd.w2_n == 3  # unigrams: big=4, data=3, time=1
    n_bigrams = 6
    assert bd.lift == (n_bigrams * 3) / (4 * 3)
    assert out[("big", "time")].pair_n == 1


def test_bigram_collocations_single_token_docs_no_pairs(spark):
    docs = spark.createDataFrame([(1, "solo"), (2, "")],
                                 "doc_id long, text string")
    assert bigram_collocations(docs, "doc_id", "text", min_count=1) \
        .count() == 0


def test_salted_join_rejects_right_and_full(spark):
    import pytest as _pytest
    big = spark.createDataFrame([("a", 1)], "k string, id long")
    small = spark.createDataFrame([("a", 10)], "k string, v long")
    for how in ("right", "full", "outer"):
        with _pytest.raises(ValueError):
            salted_join(big, small, ["k"], 4, big_salt_source=F.col("id"),
                        how=how)


def test_bigram_collocations_is_lazy_and_single_agg_branch(spark):
    docs = spark.createDataFrame(
        [(1, "a b a b"), (2, "a b")], "doc_id long, text string")
    out = bigram_collocations(docs, "doc_id", "text", min_count=1)
    got = {(r.w1, r.w2): r.lift for r in out.collect()}
    # 4 bigrams total: (a,b)x3, (b,a)x1; unigrams a=3,b=3 in doc1+doc2? a:3 b:3
    assert got[("a", "b")] == (4.0 * 3) / (3 * 3)
    assert got[("b", "a")] == (4.0 * 1) / (3 * 3)
