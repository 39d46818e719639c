"""Partition-range parity tests — mirrors reference PartitionRangeTest.java."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from spanner_data_validator_spark.operators.ranges import (
    assign_range_hash,
    assign_range_long,
    fetch_ranges,
    long_ranges,
    long_ranges_df,
    long_ranges_with_filter,
    sample_coverage,
    string_ranges,
    timestamp_ranges,
    uuid_ranges,
)


def test_long_ranges_full_coverage_adjacency():
    rs = long_ranges(0, 100, 4)
    assert len(rs) == 4
    assert (rs[0].start, rs[0].end) == ("0", "24")
    assert (rs[1].start, rs[1].end) == ("25", "49")
    assert (rs[2].start, rs[2].end) == ("50", "74")
    # reference quirk: last range starts at the previous full-step end, closes at end
    assert (rs[3].start, rs[3].end) == ("74", "100")
    for a, b in zip(rs, rs[1:-1]):
        assert int(a.end) + 1 == int(b.start)


def test_long_ranges_single_partition():
    rs = long_ranges(5, 99, 1)
    assert len(rs) == 1 and (rs[0].start, rs[0].end) == ("5", "99")


def test_long_ranges_half_coverage():
    rs = long_ranges(0, 100, 4, coverage=0.5)
    # step=25, constrained=12: ranges cover only half of each step
    assert (rs[0].start, rs[0].end) == ("0", "11")
    assert (rs[1].start, rs[1].end) == ("25", "36")
    assert (rs[3].start, rs[3].end) == ("74", "86")


def test_long_ranges_no_overflow_at_long_max():
    lo, hi = -(2**63), 2**63 - 1
    rs = long_ranges(lo, hi, 10)
    assert int(rs[0].start) == lo and int(rs[-1].end) == hi


def test_partition_filter_ratio():
    rs = long_ranges_with_filter(0, 1000, 10, 5)
    # seed [start,start], interior i%5==0, closing range
    assert (rs[0].start, rs[0].end) == ("0", "0")
    assert all(int(b.start) >= int(a.start) for a, b in zip(rs, rs[1:]))
    assert rs[-1].end == "1000"
    assert len(rs) == 2 + 2  # i in {0,5} of 9 interior


def test_uuid_ranges_roundtrip():
    lo = "00000000-0000-0000-0000-000000000000"
    hi = "ffffffff-ffff-ffff-ffff-ffffffffffff"
    rs = uuid_ranges(lo, hi, 4)
    assert len(rs) == 4
    assert rs[0].start == lo and rs[-1].end == hi
    # starts strictly increasing in the 128-bit space
    import uuid
    starts = [uuid.UUID(r.start).int for r in rs]
    assert starts == sorted(starts)


def test_timestamp_ranges():
    rs = timestamp_ranges("2024-01-01 00:00:00", "2024-01-02 00:00:00", 4)
    assert len(rs) == 4
    assert rs[0].start == "2024-01-01 00:00:00"
    assert rs[-1].end == "2024-01-02 00:00:00"


def test_string_ranges_single_only():
    assert string_ranges("a", "z", 1)[0].start == "a"
    with pytest.raises(NotImplementedError):
        string_ranges("a", "z", 2)


def test_fetch_ranges_factory_dispatch():
    assert len(fetch_ranges("LONG", "0", "100", 2)) == 2
    with pytest.raises(ValueError):
        fetch_ranges("GEO", "0", "1", 1)


def test_long_ranges_df_matches_driver_side(spark):
    rs = long_ranges(0, 10_000, 16)
    df = long_ranges_df(spark, 0, 10_000, 16).orderBy("partition_id").collect()
    assert [(str(r["start_long"]), str(r["end_long"])) for r in df] == [
        (r.start, r.end) for r in rs]


def test_assign_range_long_buckets(spark):
    # MapWithRangeFnTest analogue: starts, start+1, end-1 land in the right bucket
    df = spark.createDataFrame([(0,), (24,), (25,), (26,), (99,), (100,), (-5,), (10**9,)],
                               "k LONG")
    out = df.select("k", assign_range_long(F.col("k"), 0, 100, 4).alias("b")).collect()
    got = {r["k"]: r["b"] for r in out}
    assert got[0] == 0 and got[24] == 0 and got[25] == 1 and got[26] == 1
    assert got[99] == 3 and got[100] == 3
    assert got[-5] == 0 and got[10**9] == 3  # clamp (floor-bucket miss semantics)


def test_assign_range_hash_stable_and_bounded(spark):
    df = spark.createDataFrame([("c1", 0), ("c1", 1), ("c2", 0)], "conv_id STRING, t INT")
    out = df.select(assign_range_hash(["conv_id"], 16).alias("b")).collect()
    assert all(0 <= r["b"] < 16 for r in out)
    out2 = df.select(assign_range_hash(["conv_id"], 16).alias("b")).collect()
    assert [r["b"] for r in out] == [r["b"] for r in out2]


def test_sample_coverage_fraction(spark):
    df = spark.range(20_000).select(F.col("id"))
    kept = df.where(sample_coverage(df, "id", 0.25)).count()
    assert abs(kept / 20_000 - 0.25) < 0.02


def test_assign_range_generic_long_parity(spark):
    """MapWithRangeFnTest.mapWithRangeForLongTest analogue: key 0 and 1 land
    in the first range; MAX-1 does not land in range index 1; signed domain
    start/start+1/end-1 behave identically (…Test.java:64-135)."""
    from spanner_data_validator_spark.operators.ranges import assign_range_generic

    ranges = long_ranges(0, 2**63 - 1, 100)
    df = spark.createDataFrame([(0,), (1,), (2**63 - 2,)], "k LONG")
    got = {r["k"]: r["b"] for r in df.select(
        "k", assign_range_generic(F.col("k"), ranges, "LONG").alias("b")).collect()}
    assert got[0] == 0 and got[1] == 0 and got[2**63 - 2] == 99

    sranges = long_ranges(-99_999_999, 99_999_998, 1000)
    df2 = spark.createDataFrame(
        [(-99_999_999,), (-99_999_998,), (99_999_997,)], "k LONG")
    got2 = {r["k"]: r["b"] for r in df2.select(
        "k", assign_range_generic(F.col("k"), sranges, "LONG").alias("b")).collect()}
    assert got2[-99_999_999] == 0 and got2[-99_999_998] == 0
    assert got2[99_999_997] == 999


def test_assign_range_generic_uuid_parity(spark):
    """mapWithRangeForUUIDTest analogue: the zero UUID and the one-UUID land
    in the first range; assignment agrees with driver-side 128-bit floor."""
    import uuid as _u

    from spanner_data_validator_spark.operators.ranges import assign_range_generic

    ranges = uuid_ranges("00000000-0000-0000-0000-000000000000",
                         "ffffffff-ffff-ffff-ffff-ffffffffffff", 100)
    zero, one = str(_u.UUID(int=0)), str(_u.UUID(int=1))
    mid = str(_u.UUID(int=(2**128 - 1) // 2))
    df = spark.createDataFrame([(zero,), (one,), (mid.upper(),)], "k STRING")
    got = {r["k"]: r["b"] for r in df.select(
        "k", assign_range_generic(F.col("k"), ranges, "UUID").alias("b")).collect()}
    assert got[zero] == 0 and got[one] == 0
    # driver-side expectation: #(starts <= mid) - 1, via 128-bit ints
    starts = sorted(_u.UUID(r.start).int for r in ranges)
    want = sum(1 for s in starts if s <= _u.UUID(mid).int) - 1
    assert got[mid.upper()] == want  # case-insensitive (normalized to lower)


def test_assign_range_generic_timestamp_string_compare(spark):
    """TIMESTAMP ranges assign by RAW STRING comparison — the reference's
    comparator quirk (MapWithRangeFn.java:53-57, 138-142)."""
    from spanner_data_validator_spark.operators.ranges import assign_range_generic

    ranges = timestamp_ranges("2024-01-01 00:00:00", "2024-01-05 00:00:00", 4)
    df = spark.createDataFrame(
        [("2024-01-01 00:00:00",), ("2024-01-02 12:00:00",), ("2024-01-04 23:59:59",)],
        "k STRING")
    got = [r["b"] for r in df.select(
        "k", assign_range_generic(F.col("k"), ranges, "TIMESTAMP").alias("b"))
        .orderBy("k").collect()]
    assert got[0] == 0 and got[1] in (1, 2) and got[2] == 3


def test_assign_range_via_join_matches_expression(spark):
    from spanner_data_validator_spark.operators.ranges import (
        assign_range_generic,
        assign_range_via_join,
    )

    ranges = long_ranges(0, 100_000, 64)
    df = spark.range(0, 100_000, 997).select(F.col("id").alias("k"))
    expr = df.select("k", assign_range_generic(F.col("k"), ranges, "LONG").alias("b"))
    join = assign_range_via_join(df, ranges, "LONG", "k", out_col="b")
    assert ({(r["k"], r["b"]) for r in expr.collect()}
            == {(r["k"], r["b"]) for r in join.collect()})
    # broadcast plan: no shuffle of the fact side
    plan = join._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan


def test_map_with_range_key_modes(spark):
    from spanner_data_validator_spark.operators.ranges import map_with_range_key

    ranges = long_ranges(0, 100, 4)
    df = spark.createDataFrame([(10, "h10"), (60, "h60")], "k LONG, h STRING")
    jr = map_with_range_key(df, ranges, "LONG", "k").collect()
    assert {r["range_key"] for r in jr} == {"0|24", "50|74"}
    rph = map_with_range_key(df, ranges, "LONG", "k",
                             mapping_type="RANGE_PLUS_HASH", hash_col="h").collect()
    assert {r["range_key"] for r in rph} == {"0|24|h10", "50|74|h60"}
    rpkh = map_with_range_key(df, ranges, "LONG", "k",
                              mapping_type="RANGE_PLUS_KEY_PLUS_HASH",
                              hash_col="h").collect()
    assert {r["range_key"] for r in rpkh} == {"0|24|10|h10", "50|74|60|h60"}


def test_assign_range_via_join_clamps_below_first_start(spark):
    """Keys below every range start clamp to bucket 0 — swap-compatible with
    assign_range_generic (round-2 review regression)."""
    from spanner_data_validator_spark.operators.ranges import (
        assign_range_via_join,
    )

    ranges = long_ranges(0, 100, 4)
    df = spark.createDataFrame([(-5,), (0,), (1000,)], "k LONG")
    got = {r["k"]: r["partition_id"]
           for r in assign_range_via_join(df, ranges, "LONG", "k").collect()}
    assert got == {-5: 0, 0: 0, 1000: 3}
