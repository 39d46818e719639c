"""Unit tests for normalization + fingerprint rules (SURVEY.md §1.2 parity)."""

from __future__ import annotations

import datetime
from decimal import Decimal

from pyspark.sql import functions as F
from pyspark.sql import types as T

from spanner_data_validator_spark.functions.fingerprint import (
    FIELD_SEP,
    fingerprint_turns,
    normalize_json_string,
    normalized_payload,
)
from spanner_data_validator_spark.functions.normalize import normalize_column


def _one(spark, dtype, value):
    df = spark.createDataFrame([(value,)], T.StructType([T.StructField("c", dtype, True)]))
    return df.select(normalize_column("c", dtype).alias("n")).collect()[0]["n"]


def test_string_null_is_empty(spark):
    assert _one(spark, T.StringType(), None) == ""
    assert _one(spark, T.StringType(), "abc") == "abc"


def test_binary_base64(spark):
    assert _one(spark, T.BinaryType(), bytearray(b"\x00\x01\xff")) == "AAH/"


def test_bool_lowercase(spark):
    assert _one(spark, T.BooleanType(), True) == "true"
    assert _one(spark, T.BooleanType(), False) == "false"


def test_decimal_strips_trailing_zeros(spark):
    # dto/HashResult.java:260-267 stripTrailingZeros().toPlainString()
    t = T.DecimalType(38, 9)
    assert _one(spark, t, Decimal("1.230000000")) == "1.23"
    assert _one(spark, t, Decimal("5.000000000")) == "5"
    assert _one(spark, t, Decimal("0.000000001")) == "0.000000001"


def test_timestamp_epoch_seconds(spark):
    # adjustTimestampPrecision (default): millis / 1000 → seconds
    ts = datetime.datetime(2024, 1, 1, 0, 0, 1, 500000, tzinfo=datetime.timezone.utc)
    assert _one(spark, T.TimestampType(), ts) == "1704067201"


def test_date_unpadded(spark):
    # dto/HashResult.java:131-138: "%d%d%d" year, month, day — no zero padding
    assert _one(spark, T.DateType(), datetime.date(2024, 3, 7)) == "202437"


def test_array_concats_elements(spark):
    t = T.ArrayType(T.StringType())
    assert _one(spark, t, ["a", "bc", None, "d"]) == "abcd"


def test_long_and_double(spark):
    assert _one(spark, T.LongType(), 42) == "42"
    assert _one(spark, T.DoubleType(), 1.5) == "1.5"


# -- JSON normalization (common/JSONNormalizer.java:29-91) --------------------

def test_json_key_order_insensitive():
    a = '{"name": "t1", "args": {"a": 1, "b": true}}'
    b = '{"args": {"b": true, "a": 1}, "name": "t1"}'
    assert normalize_json_string(a) == normalize_json_string(b)
    assert normalize_json_string(a) == "a1btruenamet1"


def test_json_null_leaf_is_bare_key():
    assert normalize_json_string('{"k": null}') == "k"


def test_json_array_scalars_bare_values():
    assert normalize_json_string('[3, 1, "x", null]') == "13x"


def test_json_unparseable_verbatim():
    assert normalize_json_string("not json {") == "not json {"
    assert normalize_json_string(None) is None


def test_json_treeset_dedup_lossy():
    # documented reference quirk: duplicate leaves collapse (TreeSet)
    assert normalize_json_string('{"a": 1, "b": {"a": 1}}') == "a1"


# -- payload / fingerprint -----------------------------------------------------

def test_payload_field_separator_prevents_shift_collision(spark):
    df = spark.createDataFrame([("ab", ""), ("a", "b")], "x STRING, y STRING")
    out = df.select(normalized_payload(df, ["x", "y"]).alias("p")).collect()
    assert out[0]["p"] != out[1]["p"]
    assert out[0]["p"] == "ab" + FIELD_SEP
    assert out[1]["p"] == "a" + FIELD_SEP + "b"


def test_fingerprint_turns_schema_and_equality(spark):
    rows = [("c1", 0, "user", "hi", None),
            ("c1", 1, "tool", "x", '{"a": 1, "b": 2}'),
            ("c1", 2, "tool", "x", '{"b": 2, "a": 1}')]
    df = spark.createDataFrame(rows, "conv_id STRING, turn_idx INT, role STRING, "
                                     "text STRING, tool STRING")
    fp = fingerprint_turns(df, ["conv_id", "turn_idx"], ["role", "text", "tool"],
                           json_cols={"tool"})
    got = {r["turn_idx"]: r["fingerprint"] for r in fp.collect()}
    assert set(fp.columns) == {"conv_id", "turn_idx", "fingerprint"}
    assert got[1] == got[2]  # key order in tool JSON must not matter
    assert got[0] != got[1]


def test_sha256_algo(spark):
    df = spark.createDataFrame([("a",)], "x STRING")
    fp = fingerprint_turns(df, [], ["x"], algo="sha256")
    val = fp.collect()[0]["fingerprint"]
    assert len(val) == 64 and int(val, 16) >= 0
