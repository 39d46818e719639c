"""Funnel / retention / EWMA tests."""
from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from spanner_data_validator_spark.operators.funnel import (
    funnel_stages,
    retention_cohorts,
)
from spanner_data_validator_spark.operators.timeseries import ewma_by_group


def _ts(day, hour=0):
    return dt.datetime(2024, 1, day, hour)


def test_funnel_strict_ordering(spark):
    rows = [
        # u1: full ordered funnel
        (1, _ts(1), "view"), (1, _ts(2), "click"), (1, _ts(3), "purchase"),
        # u2: click BEFORE first view -> stops at view
        (2, _ts(2), "view"), (2, _ts(1), "click"),
        # u3: view+click, purchase same instant as click (not strictly after)
        (3, _ts(1), "view"), (3, _ts(2), "click"), (3, _ts(2), "purchase"),
        # u4: never viewed
        (4, _ts(1), "click"), (4, _ts(2), "purchase"),
    ]
    ev = spark.createDataFrame(rows, "user_id long, ts timestamp, et string")
    out = {r.stage: r.n_users for r in funnel_stages(
        ev, user="user_id", ts="ts", stage_col="et",
        stages=["view", "click", "purchase"]).collect()}
    assert out == {"view": 3, "click": 2, "purchase": 1}


def test_funnel_rejects_empty_stages(spark):
    ev = spark.createDataFrame([(1, _ts(1), "a")],
                               "user_id long, ts timestamp, et string")
    with pytest.raises(ValueError, match="non-empty"):
        funnel_stages(ev, user="user_id", ts="ts", stage_col="et", stages=[])


def test_retention_cohorts_offsets(spark):
    rows = [
        (1, _ts(1)), (1, _ts(2)), (1, _ts(4)),   # cohort d1: offsets 0,1,3
        (2, _ts(1)), (2, _ts(1, 5)),             # cohort d1: offset 0 only
        (3, _ts(2)), (3, _ts(12)),               # cohort d2: offset 10 > 7
    ]
    ev = spark.createDataFrame(rows, "user_id long, ts timestamp")
    out = {(str(r.cohort_day), r.day_offset): r.n_users
           for r in retention_cohorts(ev, user="user_id", ts="ts",
                                      max_offset_days=7).collect()}
    assert out[("2024-01-01", 0)] == 2
    assert out[("2024-01-01", 1)] == 1
    assert out[("2024-01-01", 3)] == 1
    assert out[("2024-01-02", 0)] == 1
    assert ("2024-01-02", 10) not in out


def test_ewma_fold_matches_hand_computation(spark):
    # day counts: d1=4, d2=2, d3=8 -> seed 4, then 3, then 5.5
    rows = ([("a", _ts(1))] * 4 + [("a", _ts(2))] * 2 + [("a", _ts(3))] * 8
            + [("b", _ts(1))] * 3)
    ev = spark.createDataFrame(rows, "g string, ts timestamp")
    out = {r.g: r for r in ewma_by_group(ev, "g", "ts", alpha=0.5).collect()}
    assert out["a"].ewma == 5.5 and out["a"].n_days == 3
    assert out["a"].last_day == "2024-01-03"
    assert out["b"].ewma == 3.0 and out["b"].n_days == 1


def test_funnel_input_scanned_once_per_stage(spark, tmp_path):
    path = str(tmp_path / "ev")
    rows = [(i % 7, dt.datetime(2024, 1, 1 + i % 5), t)
            for i in range(50) for t in ("view", "click")]
    spark.createDataFrame(rows, "user_id long, ts timestamp, et string") \
        .write.parquet(path)
    ev = spark.read.parquet(path)
    out = funnel_stages(ev, user="user_id", ts="ts", stage_col="et",
                        stages=["view", "click"])
    n = out.count()
    assert n == 2
    # stage tables are checkpointed: the final union plan reads checkpoints,
    # not k^2 re-scans of the raw input (11 scans for 3 stages pre-fix)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("FileScan parquet") == 0


def test_resample_ffill_fills_gaps_and_carries_value(spark):
    from datetime import datetime

    from spanner_data_validator_spark.operators.timeseries import (
        resample_ffill,
    )

    rows = [
        (1, datetime(2024, 1, 1, 0, 10), 5.0),
        (1, datetime(2024, 1, 1, 0, 40), 7.0),   # hour 0: max 7
        (1, datetime(2024, 1, 1, 3, 5), 2.0),    # hours 1,2 are gaps
        (2, datetime(2024, 1, 1, 2, 0), 9.0),    # key 2: nothing before h2
    ]
    df = spark.createDataFrame(rows, "k int, ts timestamp, v double")
    out = {(r["k"], r["bucket"].hour): (r["n_events"], r["value_ffill"])
           for r in resample_ffill(df, "k", "ts", "v").collect()}
    assert len(out) == 8  # 2 keys x hours 0..3
    assert out[(1, 0)] == (2, 7.0)
    assert out[(1, 1)] == (0, 7.0) and out[(1, 2)] == (0, 7.0)  # ffill
    assert out[(1, 3)] == (1, 2.0)
    assert out[(2, 0)] == (0, None) and out[(2, 1)] == (0, None)
    assert out[(2, 2)] == (1, 9.0) and out[(2, 3)] == (0, 9.0)
