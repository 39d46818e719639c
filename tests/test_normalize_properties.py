"""Property-based + oracle tests for the normalization/fingerprint core.

The JSON normalizer properties mirror what JSONNormalizer.java guarantees
(key-order and nesting insensitivity, sorted-set dedup, verbatim fallback);
the per-type column rules are checked against an independent pure-Python
oracle over a deliberately nasty fixed dataset.
"""

from __future__ import annotations

import base64
import json
from datetime import date, datetime, timezone
from decimal import Decimal

from hypothesis import given, settings
from hypothesis import strategies as st

from spanner_data_validator_spark.functions.fingerprint import normalize_json_string

# ---------------------------------------------------------------------------
# hypothesis strategies for JSON documents
# ---------------------------------------------------------------------------

json_scalars = st.one_of(
    st.none(),
    st.booleans(),
    st.integers(min_value=-(10**12), max_value=10**12),
    st.text(max_size=12),
)
json_docs = st.recursive(
    st.dictionaries(st.text(max_size=8), json_scalars, max_size=4),
    lambda children: st.one_of(
        st.dictionaries(st.text(max_size=8), children | json_scalars, max_size=4),
        st.lists(children | json_scalars, max_size=4),
    ),
    max_leaves=12,
)


@st.composite
def dict_docs(draw):
    d = draw(json_docs)
    return d if isinstance(d, (dict, list)) else {"k": d}


@given(dict_docs())
@settings(max_examples=200, deadline=None)
def test_json_normalization_key_order_invariant(doc):
    a = json.dumps(doc, sort_keys=True)
    b = json.dumps(doc, sort_keys=False)
    # also a differently-spaced rendering
    c = json.dumps(doc, separators=(", ", ": "))
    assert normalize_json_string(a) == normalize_json_string(b) == normalize_json_string(c)


@given(dict_docs())
@settings(max_examples=200, deadline=None)
def test_json_normalization_output_is_sorted_concat(doc):
    out = normalize_json_string(json.dumps(doc))
    assert out is not None
    # idempotent-ish: renormalizing the (non-JSON) output returns it verbatim
    assert normalize_json_string(out) == out


@given(st.text(max_size=30).filter(lambda s: not s.strip().startswith(("{", "["))))
@settings(max_examples=100, deadline=None)
def test_json_normalization_non_json_verbatim(s):
    assert normalize_json_string(s) == s


def test_json_normalization_known_vectors():
    # key order + nesting insensitivity (JsonTest.java exploration)
    assert (normalize_json_string('{"a": 1, "b": {"c": true}}')
            == normalize_json_string('{"b": {"c": true}, "a": 1}'))
    # null object value contributes bare key; array nulls skipped
    assert normalize_json_string('{"k": null}') == "k"
    assert normalize_json_string('[null, 1, "x"]') == "1x"
    # sorted-set DEDUP lossiness is deliberate reference behavior
    assert normalize_json_string('["a", "a"]') == "a"


# ---------------------------------------------------------------------------
# per-type normalization vs an independent Python oracle (one Spark job)
# ---------------------------------------------------------------------------

def test_normalize_column_rules_match_python_oracle(spark):
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from spanner_data_validator_spark.functions.normalize import normalize_column

    rows = [
        ("plain", b"\x00\xff", True, Decimal("1.2300"), 42, 3.5,
         datetime(2024, 1, 5, 12, 30, 45, 123000, tzinfo=timezone.utc),
         date(2024, 3, 7), ["x", None, "y"]),
        (None, None, None, None, None, None, None, None, None),
        ("", b"", False, Decimal("5.000"), -7, -0.25,
         datetime(1970, 1, 1, 0, 0, 0, 999000, tzinfo=timezone.utc),
         date(1999, 12, 31), []),
    ]
    schema = T.StructType([
        T.StructField("s", T.StringType()),
        T.StructField("b", T.BinaryType()),
        T.StructField("bo", T.BooleanType()),
        T.StructField("d", T.DecimalType(10, 4)),
        T.StructField("i", T.IntegerType()),
        T.StructField("f", T.DoubleType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("dt", T.DateType()),
        T.StructField("arr", T.ArrayType(T.StringType())),
    ])
    df = spark.createDataFrame(rows, schema)
    out = df.select(
        *[normalize_column(f.name, f.dataType).alias(f.name) for f in schema.fields]
    ).collect()

    def oracle(r):
        s, b, bo, d, i, f, ts, dt, arr = r
        return (
            s or "",
            base64.b64encode(b).decode() if b is not None else "",
            ("true" if bo else "false") if bo is not None else "",
            (format(d.normalize(), "f") if d is not None else ""),
            str(i) if i is not None else "",
            str(f) if f is not None else "",
            str(int(ts.timestamp())) if ts is not None else "",  # seconds (adjusted)
            f"{dt.year}{dt.month}{dt.day}" if dt is not None else "",
            "".join(x or "" for x in arr) if arr is not None else "",
        )

    for got, want_row in zip(out, rows):
        want = oracle(want_row)
        assert tuple(got) == want, (tuple(got), want)


# ---------------------------------------------------------------------------
# decimal / double serialization at the type edges (VERDICT r2 item 10)
# ---------------------------------------------------------------------------

def _spark_normalize(spark, values, dtype):
    from pyspark.sql import types as T

    from spanner_data_validator_spark.functions.normalize import normalize_column

    df = spark.createDataFrame([(v,) for v in values],
                               T.StructType([T.StructField("v", dtype)]))
    return [r[0] for r in df.select(normalize_column("v", dtype)).collect()]


def _duckdb_strip(values):
    """The oracle-side rendering of the reference's
    stripTrailingZeros().toPlainString() (dto/HashResult.java:260-267)."""
    import duckdb

    vals = ",".join(f"('{v}')" for v in values)
    q = (r"SELECT regexp_replace(regexp_replace("
         r"CAST(CAST(v AS DECIMAL(38,10)) AS VARCHAR),"
         r" '(\.\d*?)0+$', '\1'), '\.$', '') FROM (VALUES " + vals + ") t(v)")
    return [r[0] for r in duckdb.sql(q).fetchall()]


@given(st.lists(st.decimals(min_value=Decimal("-1e18"), max_value=Decimal("1e18"),
                            allow_nan=False, allow_infinity=False, places=10),
                min_size=1, max_size=50))
@settings(max_examples=12, deadline=None)
def test_decimal_normalization_matches_duckdb(spark, values):
    """Spark's DECIMAL serialization must equal the DuckDB oracle rendering
    for arbitrary (38,10) decimals — this is the exact string the fingerprint
    hashes, so any divergence is a silent MISMATCH misclassification."""
    got = _spark_normalize(spark, values, __import__(
        "pyspark.sql.types", fromlist=["DecimalType"]).DecimalType(38, 10))
    want = _duckdb_strip(values)
    assert got == want


def test_decimal_double_edge_vectors(spark):
    """The reference's corner cases (stripTrailingZeros().toPlainString() and
    Double.toString, dto/HashResult.java:260-267 / :106-113), pinned exactly."""
    from pyspark.sql import types as T

    decs = [Decimal("5.000"), Decimal("0.10"), Decimal("-0.000"), Decimal("0"),
            Decimal("10000000000000000"), Decimal("-12.3400000001"),
            Decimal("0.0000000001"), None]
    assert _spark_normalize(spark, decs, T.DecimalType(38, 10)) == \
        ["5", "0.1", "0", "0", "10000000000000000", "-12.3400000001",
         "0.0000000001", ""]
    assert _duckdb_strip([d for d in decs if d is not None]) == \
        ["5", "0.1", "0", "0", "10000000000000000", "-12.3400000001",
         "0.0000000001"]

    dbls = [5.0, 0.1, 1e16, -0.0, 1e7, 9999999.0, 0.001, 0.0001,
            float("nan"), float("inf"), float("-inf"), 5e-324,
            1.7976931348623157e308, None]
    # Java Double.toString grammar: plain decimal in [1e-3, 1e7), otherwise
    # computerized scientific; negative zero keeps its sign; NULL -> ''
    assert _spark_normalize(spark, dbls, T.DoubleType()) == \
        ["5.0", "0.1", "1.0E16", "-0.0", "1.0E7", "9999999.0", "0.001",
         "1.0E-4", "NaN", "Infinity", "-Infinity", "4.9E-324",
         "1.7976931348623157E308", ""]


@given(st.lists(st.floats(allow_nan=False, allow_infinity=False, width=64),
                min_size=1, max_size=50))
@settings(max_examples=12, deadline=None)
def test_double_serialization_roundtrips_exactly(spark, values):
    """The double serialization must be LOSSLESS (shortest-roundtrip digits):
    parsing the fingerprinted string recovers the exact bits, so two doubles
    hash equal iff they are equal — the injectivity the classifier needs."""
    import math
    import struct

    from pyspark.sql import types as T

    out = _spark_normalize(spark, values, T.DoubleType())
    for v, s in zip(values, out):
        back = float(s)
        assert struct.pack("d", back) == struct.pack("d", v), (v, s)
        if v != 0:
            assert math.copysign(1, back) == math.copysign(1, v)


def test_nfc_normalize_udf_collapses_decomposed_forms(spark):
    from spanner_data_validator_spark.functions.normalize import (
        nfc_normalize_udf,
    )

    df = spark.createDataFrame(
        [("café",), ("café",), ("cafe",), (None,)], "s string")
    out = [r["n"] for r in
           df.select(nfc_normalize_udf("s").alias("n")).collect()]
    assert out[0] == out[1] == "café"  # composed == decomposed after NFC
    assert out[2] == "cafe" and out[3] is None
