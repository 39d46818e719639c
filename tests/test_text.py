"""Text-analysis functions."""

from __future__ import annotations

from pyspark.sql import functions as F

from spanner_data_validator_spark.functions.text import (
    lang_id_heuristic,
    rolling_fingerprint_udf,
    shingles,
    substr_hits,
    token_count_regex,
    token_count_ws,
)


def test_token_counts(spark):
    df = spark.createDataFrame([("a bb ccc",), ("",), ("one",)], "t STRING")
    out = df.select(token_count_ws("t").alias("ws"),
                    token_count_regex("t").alias("rx")).collect()
    assert [r["ws"] for r in out] == [3, 0, 1]
    assert [r["rx"] for r in out] == [3, 0, 1]


def test_substr_hits(spark):
    df = spark.createDataFrame([("row in a rowboat row",)], "t STRING")
    assert df.select(substr_hits("t", "row").alias("h")).collect()[0]["h"] == 3


def test_shingles(spark):
    df = spark.createDataFrame([("a b c d",), ("a b",)], "t STRING")
    out = df.select(shingles("t", 3).alias("s")).collect()
    assert out[0]["s"] == ["a b c", "b c d"]
    assert out[1]["s"] == []


def test_lang_id(spark):
    df = spark.createDataFrame(
        [("data goes into the table",), ("nothing relevant here",)], "t STRING")
    out = [r["l"] for r in df.select(lang_id_heuristic("t").alias("l")).collect()]
    assert out == ["en", "und"]


def test_rolling_fingerprint_matches_python(spark):
    texts = ["hello world", "hello worle", ""]
    df = spark.createDataFrame([(t,) for t in texts], "t STRING")
    got = [r["f"] for r in df.select(rolling_fingerprint_udf(F.col("t")).alias("f")).collect()]
    want = [int.from_bytes(t.encode(), "big") % ((1 << 61) - 1) for t in texts]
    assert got == want
    assert got[0] != got[1]  # single-char change flips the fingerprint
