"""As-of join / point-in-time validation (operators/asof.py)."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from spanner_data_validator_spark.operators.asof import asof_join, asof_validate


def _ts(minute):
    return datetime(2026, 1, 1, 12, minute)


def test_asof_join_backward_inclusive(spark):
    versions = spark.createDataFrame(
        [("k1", _ts(1), 10.0), ("k1", _ts(5), 50.0), ("k1", _ts(10), 100.0),
         ("k2", _ts(3), 30.0)],
        "key string, ts timestamp, value double")
    reads = spark.createDataFrame(
        [("k1", _ts(0)),   # before any version -> null
         ("k1", _ts(5)),   # equal ts -> INCLUSIVE, matches the 5-min version
         ("k1", _ts(7)),   # between versions -> 5-min version
         ("k1", _ts(59)),  # after the last -> 10-min version
         ("k2", _ts(4)),   # other key's versions invisible
         ("k3", _ts(9))],  # key with no versions -> null
        "key string, ts timestamp")
    out = asof_join(reads, versions, ["key"], value_cols=["value"])
    got = {(r.key, r.ts.minute): r.asof_value for r in out.collect()}
    assert got == {("k1", 0): None, ("k1", 5): 50.0, ("k1", 7): 50.0,
                   ("k1", 59): 100.0, ("k2", 4): 30.0, ("k3", 9): None}


def test_asof_validate_statuses(spark):
    versions = spark.createDataFrame(
        [("k1", _ts(1), 10.0), ("k1", _ts(5), 50.0)],
        "key string, ts timestamp, value double")
    reads = spark.createDataFrame(
        [("k1", _ts(2), 10.0),   # MATCH: still version@1
         ("k1", _ts(6), 10.0),   # MISMATCH: version@5 superseded it
         ("k1", _ts(0), 10.0)],  # NO_SOURCE: nothing precedes
        "key string, ts timestamp, observed double")
    out = asof_validate(reads, versions, ["key"],
                        observed_col="observed", value_col="value")
    got = {r.ts.minute: r.status for r in out.collect()}
    assert got == {2: "MATCH", 6: "MISMATCH", 0: "NO_SOURCE"}


def test_asof_join_single_exchange(spark):
    """The whole as-of join is ONE hash exchange by key (union both sides,
    sort within partitions) — no range-join explosion, no second shuffle."""
    versions = spark.createDataFrame(
        [("k1", _ts(1), 1.0)], "key string, ts timestamp, value double")
    reads = spark.createDataFrame(
        [("k1", _ts(2))], "key string, ts timestamp")
    out = asof_join(reads, versions, ["key"], value_cols=["value"])
    out.collect()  # AQE: finalize the physical plan before reading it
    plan = out._jdf.queryExecution().executedPlan().toString()
    plan = plan.split("== Initial Plan ==")[0]  # AQE prints the plan twice
    assert plan.count("Exchange hashpartitioning") == 1
    assert "CartesianProduct" not in plan and "NestedLoop" not in plan
