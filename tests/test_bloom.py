"""Bloom-filter semi-join pre-filter (operators/bloom.py).

Covers: parameter sizing, zero false negatives, fp-rate sanity, mergeability
(shard OR-rollup == whole-build), NULL-key semantics, exact semi-join
equivalence through the bloom path, JVM-only probe plan (no Python in the
hot path), and UDF-probe parity.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from spanner_data_validator_spark.operators.bloom import (
    BloomFilter,
    bloom_member,
    bloom_parameters,
    bloom_semi_join,
    build_bloom,
)


def test_bloom_parameters_standard_points():
    m, k = bloom_parameters(1000, 0.01)
    # textbook: ~9.585 bits/key, k ~= 7
    assert abs(m - 1000 * 9.585) < 128 and m % 64 == 0
    assert k == 7
    assert bloom_parameters(0, 0.01) == (64, 1)
    with pytest.raises(ValueError):
        bloom_parameters(10, 1.5)


@pytest.fixture(scope="module")
def keys_df(spark):
    return spark.range(0, 2000).select(
        F.concat(F.lit("user-"), F.col("id")).alias("k"))


def _bloom(spark, keys_df, family="portable"):
    m, k = bloom_parameters(2000, 0.01)
    return build_bloom(keys_df, "k", m, k, family)


def test_no_false_negatives_and_fp_rate(spark, keys_df):
    bloom = _bloom(spark, keys_df)
    assert bloom.n_build_rows == 2000
    # every built key passes
    misses = keys_df.where(~bloom_member("k", bloom)).count()
    assert misses == 0
    # disjoint probe keys: fp rate near target (generous 4x bound)
    probe = spark.range(10_000, 30_000).select(
        F.concat(F.lit("user-"), F.col("id")).alias("k"))
    fps = probe.where(bloom_member("k", bloom)).count()
    assert fps / 20_000 < 0.04
    assert 0.0 < bloom.fill_fraction() < 0.6


def test_merge_equals_whole_build(spark, keys_df):
    m, k = bloom_parameters(2000, 0.01)
    whole = build_bloom(keys_df, "k", m, k)
    a = build_bloom(keys_df.where(F.col("k") < "user-5"), "k", m, k)
    b = build_bloom(keys_df.where(F.col("k") >= "user-5"), "k", m, k)
    merged = a.union(b)
    assert (merged.words == whole.words).all()
    assert merged.n_build_rows == 2000
    with pytest.raises(ValueError):
        a.union(BloomFilter(m, k + 1, "portable", a.words, 0))


def test_null_keys_never_match(spark):
    df = spark.createDataFrame([("a",), (None,), ("b",)], "k string")
    bloom = build_bloom(df, "k", 640, 3)
    assert bloom.n_build_rows == 2  # NULL dropped from build
    got = df.select("k", bloom_member("k", bloom).alias("m")).collect()
    assert {r["k"]: r["m"] for r in got} == {"a": True, "b": True, None: False}


def test_semi_join_equivalence(spark):
    probe = spark.range(0, 5000).select(
        (F.col("id") % 700).alias("uid"), F.col("id").alias("rid"))
    build = spark.range(0, 5000).select((F.col("id") * 13 % 900).alias("uid")) \
        .where(F.col("uid") % 3 == 0)
    expected = sorted(r["rid"] for r in
                      probe.join(build.distinct(), "uid", "left_semi").collect())
    got = sorted(r["rid"] for r in
                 bloom_semi_join(probe, build, "uid", fpp=0.02).collect())
    assert got == expected


def test_probe_plan_is_jvm_only(spark, keys_df):
    """Default membership probe must stay out of Python: no BatchEvalPython /
    ArrowEvalPython in the filtered plan."""
    bloom = _bloom(spark, keys_df)
    plan = keys_df.where(bloom_member("k", bloom))._jdf.queryExecution() \
        .executedPlan().toString()
    assert "EvalPython" not in plan


def test_udf_probe_parity(spark, keys_df):
    bloom = _bloom(spark, keys_df)
    probe = spark.range(0, 4000).select(
        F.concat(F.lit("user-"), (F.col("id") * 7 % 4000)).alias("k"))
    jvm = probe.select("k", bloom_member("k", bloom).alias("m"))
    udf = probe.select("k", bloom_member("k", bloom, probe_via_udf=True)
                       .alias("m"))
    assert sorted(map(tuple, jvm.collect())) == sorted(map(tuple, udf.collect()))


def test_xxhash_family_roundtrip(spark, keys_df):
    bloom = _bloom(spark, keys_df, family="xxhash64")
    assert keys_df.where(~bloom_member("k", bloom)).count() == 0


def test_bits_per_key_scale_accounting():
    """The broadcast-size story the module docstring tells: 10^8 keys at 1%
    fpp is ~114 MB of bitmap — small enough to ship, vs GBs of raw keys."""
    m, _ = bloom_parameters(100_000_000, 0.01)
    assert m / 8 / 1024 / 1024 < 120
    assert m / 100_000_000 == pytest.approx(9.585, abs=0.01)
