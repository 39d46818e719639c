"""Incremental view maintenance (operators/ivm.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from spanner_data_validator_spark.operators.ivm import (
    apply_changes,
    base_agg,
)


def _base(spark):
    rows = [("a", 10), ("a", 20), ("b", 5), ("c", 7), ("c", None)]
    return spark.createDataFrame(rows, "k string, v int")


def _changes(spark, rows):
    return spark.createDataFrame(rows, "k string, v int, op string")


def test_refresh_equals_recompute(spark):
    base = _base(spark)
    view = base_agg(base, ["k"], F.col("v"))
    # delete (a,10), insert (a,100) and a NEW key (d,1), delete all of c
    ch = _changes(spark, [("a", 10, "D"), ("a", 100, "I"), ("d", 1, "I"),
                          ("c", 7, "D"), ("c", None, "D")])
    got = {r["k"]: (r["n_rows"], r["m_sum"])
           for r in apply_changes(view, ch, ["k"], F.col("v")).collect()}
    # c vanished (count 0); NULL-measure delete subtracts nothing from the
    # sum (the base SUM never included it) but does decrement the count
    assert got == {"a": (2, 120), "b": (1, 5), "d": (1, 1)}


def test_update_as_delete_insert_pair(spark):
    view = base_agg(_base(spark), ["k"], F.col("v"))
    ch = _changes(spark, [("b", 5, "D"), ("b", 50, "I")])
    got = {r["k"]: (r["n_rows"], r["m_sum"])
           for r in apply_changes(view, ch, ["k"], F.col("v")).collect()}
    assert got["b"] == (1, 50)


def test_overdelete_raises(spark):
    view = base_agg(_base(spark), ["k"], F.col("v"))
    ch = _changes(spark, [("b", 5, "D"), ("b", 5, "D")])
    with pytest.raises(Exception, match="deletes unknown rows"):
        apply_changes(view, ch, ["k"], F.col("v")).collect()


def test_unknown_op_raises(spark):
    view = base_agg(_base(spark), ["k"], F.col("v"))
    ch = _changes(spark, [("b", 5, "U")])
    with pytest.raises(Exception, match="unknown op"):
        apply_changes(view, ch, ["k"], F.col("v")).collect()


def test_view_sink_replay_is_noop_and_chain_survives(spark, tmp_path):
    from spanner_data_validator_spark.streaming.ivm_sink import (
        ViewMaintenanceSink,
    )

    sink = ViewMaintenanceSink(spark, str(tmp_path / "v"), ["k"], "v",
                               "k string")
    b0 = spark.createDataFrame([("a", 1, "I"), ("a", 2, "I"), ("b", 3, "I")],
                               "k string, v int, op string")
    b1 = spark.createDataFrame([("a", 1, "D"), ("c", 9, "I")],
                               "k string, v int, op string")
    sink(b0, 0)
    sink(b1, 1)
    want = {("a", 1, 2), ("b", 1, 3), ("c", 1, 9)}
    got = {tuple(r) for r in sink.latest().collect()}
    assert got == want
    # crash-replay of batch 1 (same id): recomputed from the same committed
    # predecessor, overwrites the same target — state unchanged
    sink(b1, 1)
    assert {tuple(r) for r in sink.latest().collect()} == want
    # a NEW batch folds from the latest committed view
    sink(spark.createDataFrame([("b", 3, "D")], "k string, v int, op string"), 2)
    assert {tuple(r) for r in sink.latest().collect()} == {
        ("a", 1, 2), ("c", 1, 9)}


def test_view_sink_empty_before_first_commit(spark, tmp_path):
    from spanner_data_validator_spark.streaming.ivm_sink import (
        ViewMaintenanceSink,
    )

    sink = ViewMaintenanceSink(spark, str(tmp_path / "v"), ["k"], "v",
                               "k string")
    assert sink.latest().count() == 0
