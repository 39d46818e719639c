"""Tests for operators/sessionize.py (gap sessions, bucketed interval join)."""

from pyspark.sql import functions as F

from spanner_data_validator_spark.operators.sessionize import (
    interval_join_bucketed,
    session_stats,
    sessionize,
)


def _events(spark, rows):
    return spark.createDataFrame(rows, "k string, ts long, eid long")


def test_sessionize_breaks_on_gap(spark):
    # gaps: 10, 10, 200(new), 10 -> sessions [1,1,1,2,2]
    df = _events(spark, [("u", t, i) for i, t in
                         enumerate([0, 10, 20, 220, 230])])
    out = sessionize(df, "k", F.col("ts"), gap_ms=100, tiebreak=F.col("eid"))
    got = [(r.ts, r.session_idx) for r in out.orderBy("ts").collect()]
    assert got == [(0, 1), (10, 1), (20, 1), (220, 2), (230, 2)]


def test_sessionize_gap_boundary_inclusive(spark):
    # gap exactly == gap_ms does NOT break (strict > rule)
    df = _events(spark, [("u", 0, 0), ("u", 100, 1), ("u", 201, 2)])
    out = sessionize(df, "k", F.col("ts"), gap_ms=100, tiebreak=F.col("eid"))
    assert [r.session_idx for r in out.orderBy("ts").collect()] == [1, 1, 2]


def test_session_stats_rollup(spark):
    df = _events(spark, [("u", 0, 0), ("u", 50, 1), ("u", 500, 2),
                         ("v", 7, 3)])
    out = {(r.k, r.session_idx): r for r in
           session_stats(df, "k", F.col("ts"), gap_ms=100,
                         tiebreak=F.col("eid")).collect()}
    assert out[("u", 1)].n_events == 2
    assert (out[("u", 1)].start_ms, out[("u", 1)].end_ms,
            out[("u", 1)].duration_ms) == (0, 50, 50)
    assert out[("u", 2)].n_events == 1
    assert out[("v", 1)].n_events == 1


def test_sessionize_partition_invariant(spark):
    rows = [("u%d" % (i % 7), (i * 37) % 10_000, i) for i in range(500)]
    df = _events(spark, rows)
    a = sessionize(df, "k", F.col("ts"), 300, F.col("eid"))
    b = sessionize(df.repartition(13), "k", F.col("ts"), 300, F.col("eid"))
    key = lambda r: (r.k, r.eid)
    assert sorted(map(tuple, a.select("k", "eid", "session_idx").collect())) == \
           sorted(map(tuple, b.select("k", "eid", "session_idx").collect()))


def _ivl_inputs(spark):
    pts = spark.createDataFrame(
        [("g", 5, 100), ("g", 999, 101), ("g", 1000, 102), ("g", 2500, 103),
         ("h", 5, 104)],
        "grp string, ts long, pid long")
    ivl = spark.createDataFrame(
        [("g", 0, 1000, 1),        # covers ts 5, 999 (1000 exclusive)
         ("g", 900, 2600, 2),      # covers 999, 1000, 2500
         ("h", 2000, 3000, 3)],    # no h points in range
        "grp string, s long, e long, iid long")
    return pts, ivl


def test_interval_join_matches_brute_force(spark):
    pts, ivl = _ivl_inputs(spark)
    for bucket in (100, 1000, 4096):
        out = interval_join_bucketed(pts, ivl, ["grp"], "ts", "s", "e",
                                     bucket_ms=bucket)
        got = sorted((r.pid, r.iid) for r in out.collect())
        assert got == [(100, 1), (101, 1), (101, 2), (102, 2), (103, 2)], bucket


def test_interval_join_end_exclusive_start_inclusive(spark):
    pts = spark.createDataFrame([("g", 0, 1), ("g", 10, 2)], "grp string, ts long, pid long")
    ivl = spark.createDataFrame([("g", 0, 10, 7)], "grp string, s long, e long, iid long")
    out = interval_join_bucketed(pts, ivl, ["grp"], "ts", "s", "e", bucket_ms=4)
    assert [r.pid for r in out.collect()] == [1]


def test_interval_join_no_bnlj_in_plan(spark):
    pts, ivl = _ivl_inputs(spark)
    out = interval_join_bucketed(pts, ivl, ["grp"], "ts", "s", "e", bucket_ms=500)
    out.collect()
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_sessionize_does_not_leak_helper_columns(spark):
    df = _events(spark, [("u", 0, 0), ("u", 500, 1)])
    out = sessionize(df, "k", F.col("ts"), gap_ms=100, tiebreak=F.col("eid"))
    assert out.columns == ["k", "ts", "eid", "session_idx"]


def test_interval_join_left_keeps_unmatched_points(spark):
    pts, ivl = _ivl_inputs(spark)
    out = interval_join_bucketed(pts, ivl, ["grp"], "ts", "s", "e",
                                 bucket_ms=500, how="left")
    rows = {(r.pid, r.iid) for r in out.collect()}
    # h's point at ts=5 matches nothing -> kept with NULL interval cols
    assert (104, None) in rows
    assert (100, 1) in rows and (103, 2) in rows
    # inner pairs unchanged, plus exactly the one unmatched point
    assert len(rows) == 6


def test_interval_join_rejects_right_and_full(spark):
    import pytest as _pytest
    pts, ivl = _ivl_inputs(spark)
    for how in ("right", "full", "outer"):
        with _pytest.raises(ValueError):
            interval_join_bucketed(pts, ivl, ["grp"], "ts", "s", "e",
                                   bucket_ms=500, how=how)


def test_merge_intervals_containment_and_touching(spark):
    from spanner_data_validator_spark.operators.sessionize import (
        merge_intervals,
    )
    from pyspark.sql import functions as F
    rows = [
        # containment: [0,100] swallows [10,20]; [30,40] inside too;
        # then [100,110] touches (start == running max) -> same island
        ("u", 0, 100), ("u", 10, 20), ("u", 30, 40), ("u", 100, 110),
        ("u", 200, 250),              # gap -> new island
        ("v", 5, 6),                  # other key untouched
    ]
    df = spark.createDataFrame(rows, "k string, s long, e long")
    got = {(r.k, r.island_id): (r.island_start, r.island_end,
                                r.n_intervals)
           for r in merge_intervals(df, "k", F.col("s"),
                                    F.col("e")).collect()}
    assert got == {
        ("u", 1): (0, 110, 4),
        ("u", 2): (200, 250, 1),
        ("v", 1): (5, 6, 1),
    }
