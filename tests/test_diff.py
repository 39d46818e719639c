"""Column-level drift attribution (operators/diff.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from spanner_data_validator_spark.operators.diff import (
    column_diff,
    column_drift_summary,
)

SCHEMA = "k long, a string, b long"


def _pair(spark):
    src = spark.createDataFrame([
        (1, "x", 10),      # unchanged
        (2, "x", 10),      # b changes
        (3, None, 10),     # a NULL -> value (changed)
        (4, "x", None),    # b NULL -> NULL (not drift) but a changes
        (5, "x", 10),      # removed
    ], SCHEMA)
    tgt = spark.createDataFrame([
        (1, "x", 10),
        (2, "x", 11),
        (3, "y", 10),
        (4, "z", None),
        (6, "n", 1),       # added
    ], SCHEMA)
    return src, tgt


def test_change_classification_and_diff_cols(spark):
    src, tgt = _pair(spark)
    got = {r.k: (r.change, list(r.diff_cols))
           for r in column_diff(src, tgt, ["k"], ["a", "b"]).collect()}
    assert got == {
        2: ("CHANGED", ["b"]),
        3: ("CHANGED", ["a"]),
        4: ("CHANGED", ["a"]),   # NULL<=>NULL on b is NOT drift
        5: ("REMOVED", []),
        6: ("ADDED", []),
    }


def test_include_unchanged(spark):
    src, tgt = _pair(spark)
    got = column_diff(src, tgt, ["k"], ["a", "b"], include_unchanged=True)
    assert {r.k: r.change for r in got.collect()}[1] == "UNCHANGED"


def test_diff_cols_follow_cols_order(spark):
    src = spark.createDataFrame([(1, "x", 10)], SCHEMA)
    tgt = spark.createDataFrame([(1, "y", 11)], SCHEMA)
    both = column_diff(src, tgt, ["k"], ["b", "a"]).first()
    assert list(both.diff_cols) == ["b", "a"]


def test_summary_counts(spark):
    src, tgt = _pair(spark)
    diff = column_diff(src, tgt, ["k"], ["a", "b"])
    got = {r.column: r.n_changed
           for r in column_drift_summary(diff).collect()}
    assert got == {"a": 2, "b": 1}


def test_empty_cols_rejected(spark):
    src, tgt = _pair(spark)
    with pytest.raises(ValueError):
        column_diff(src, tgt, ["k"], [])


def test_composite_key(spark):
    src = spark.createDataFrame([(1, "p", "x", 1)], "k1 long, k2 string, a string, b long")
    tgt = spark.createDataFrame([(1, "p", "x", 2)], "k1 long, k2 string, a string, b long")
    row = column_diff(src, tgt, ["k1", "k2"], ["a", "b"]).first()
    assert (row.k1, row.k2, row.change, list(row.diff_cols)) == (1, "p", "CHANGED", ["b"])
