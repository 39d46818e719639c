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
