"""Integrity + constraint-suite tests."""
from __future__ import annotations

from pyspark.sql import functions as F

from spanner_data_validator_spark.operators import constraints as C
from spanner_data_validator_spark.operators.integrity import (
    duplicate_examples,
    orphan_check,
    uniqueness_check,
)


def test_orphan_check_counts_rows_and_keys(spark):
    child = spark.createDataFrame(
        [(1, "a"), (1, "b"), (2, "c"), (3, "d"), (3, "e"), (3, "f")],
        "fk long, payload string").withColumnRenamed("fk", "k")
    parent = spark.createDataFrame([(1,), (9,)], "k long")
    r = orphan_check(child, parent, ["k"]).first()
    assert r.n_orphan_rows == 4          # keys 2 (1 row) + 3 (3 rows)
    assert r.n_orphan_keys == 2
    assert (r.min_orphan_key, r.max_orphan_key) == ("2", "3")


def test_orphan_check_clean_parentage(spark):
    child = spark.createDataFrame([(1,), (2,)], "k long")
    parent = spark.createDataFrame([(1,), (2,), (3,)], "k long")
    r = orphan_check(child, parent, ["k"]).first()
    assert (r.n_orphan_rows, r.n_orphan_keys) == (0, 0)
    assert r.min_orphan_key is None


def test_uniqueness_check_profile(spark):
    df = spark.createDataFrame([(1,), (1,), (1,), (2,), (3,), (3,)],
                               "k long")
    r = uniqueness_check(df, ["k"]).first()
    assert (r.n_rows, r.n_keys, r.n_dup_keys, r.n_dup_rows,
            r.max_multiplicity) == (6, 3, 2, 3, 3)


def test_duplicate_examples_deterministic_order(spark):
    df = spark.createDataFrame(
        [(k,) for k in [5, 5, 5, 2, 2, 9, 9, 1]], "k long")
    ex = duplicate_examples(df, ["k"], top_n=10).collect()
    # 5 (x3) first; 2 and 9 tie on count -> ascending key
    assert [(e.key, e.multiplicity) for e in ex] == [
        ("5", 3), ("2", 2), ("9", 2)]


def test_constraints_null_semantics_and_counts(spark):
    df = spark.createDataFrame(
        [(1, 5.0, "ok"), (2, None, "ok"), (None, 50.0, "bad"),
         (4, -1.0, None), (4, 7.0, "ok")],
        "id long, v double, s string")
    rules = [C.not_null("id"), C.in_range("v", 0, 10),
             C.accepted_values("s", ["ok"]), C.unique("id"),
             C.matches_regex("s", "^o")]
    out = {r.rule: r for r in C.check_constraints(df, rules).collect()}
    assert out["not_null(id)"].n_violations == 1
    # NULL v and 50.0 and -1.0 all violate in_range
    assert out["in_range(v,0,10)"].n_violations == 3
    assert out["accepted_values(s)"].n_violations == 2  # 'bad' + NULL
    assert out["unique(id)"].n_violations == 1          # id=4 twice
    assert out["matches_regex(s)"].n_violations == 2    # 'bad' + NULL
    assert all(r.n_rows == 5 for r in out.values())
    assert not out["not_null(id)"].passed


def test_constraints_single_scan_plan(spark):
    df = spark.range(0, 100).select(F.col("id"), (F.col("id") % 7).alias("m"))
    plan = C.check_constraints(
        df, [C.not_null("m"), C.in_range("id", 0, 50)])._jdf \
        .queryExecution().executedPlan().toString()
    # the whole suite is one aggregate over one scan — no join, no union
    assert plan.count("Range (0, 100") == 1
    assert "Join" not in plan and "Union" not in plan


def test_constraints_all_pass_flag(spark):
    df = spark.createDataFrame([(1,), (2,)], "k long")
    out = C.check_constraints(df, [C.not_null("k"), C.unique("k")]).collect()
    assert all(r.passed and r.n_violations == 0 for r in out)


def test_reconcile_header_detail_exact_and_drift(spark):
    from spanner_data_validator_spark.operators.integrity import (
        reconcile_header_detail,
    )
    header = spark.createDataFrame(
        [(1, 300), (2, 500), (3, 42)], "k long, total long")
    detail = spark.createDataFrame(
        [(1, 100), (1, 200),          # exact
         (2, 450)],                   # drift 50
        "k long, amt long")
    r = reconcile_header_detail(
        header, detail, ["k"],
        header_total=F.col("total"), detail_amount=F.col("amt"),
        tolerance=10).first()
    assert (r.n_headers, r.n_matched, r.n_drifted, r.n_missing_detail,
            r.max_abs_drift) == (3, 1, 1, 1, 50)
    # identity: every header lands in exactly one bucket
    assert r.n_matched + r.n_drifted + r.n_missing_detail == r.n_headers


def test_dynamic_partition_pruning_kicks_in(spark, tmp_path):
    # fact partitioned by dim key; filtered dim join must prune partitions
    # at runtime (DPP) instead of scanning all of them — the 100 TB pattern
    # for validating one shard/day out of a partitioned lake table.
    fact_path = str(tmp_path / "fact")
    (spark.range(0, 10000)
     .selectExpr("id", "id % 20 AS part_key")
     .write.partitionBy("part_key").parquet(fact_path))
    fact = spark.read.parquet(fact_path)
    dim = spark.createDataFrame(
        [(3, "keep"), (7, "keep"), (11, "drop"), (15, "drop")],
        "part_key long, tag string")
    # DPP fires off a SELECTIVE dim predicate (the rule looks for a filter)
    joined = fact.join(dim.where(F.col("tag") == "keep"), "part_key")
    assert joined.count() == 1000
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower(), plan[:2000]


def test_join_cardinality_exact(spark):
    from spanner_data_validator_spark.operators.skew import join_cardinality
    left = spark.createDataFrame([(1,), (1,), (1,), (2,), (9,)], "k long")
    right = spark.createDataFrame([(1,), (1,), (2,), (3,)], "k long")
    r = join_cardinality(left, right, ["k"]).first()
    # key 1: 3*2=6, key 2: 1*1=1; keys 9 and 3 unshared
    assert (r.est_rows, r.n_shared_keys, r.max_key_rows) == (7, 2, 6)
    # ground truth: the actual join row count
    assert left.join(right, "k").count() == 7


def test_join_cardinality_disjoint_keys(spark):
    from spanner_data_validator_spark.operators.skew import join_cardinality
    a = spark.createDataFrame([(1,)], "k long")
    b = spark.createDataFrame([(2,)], "k long")
    r = join_cardinality(a, b, ["k"]).first()
    assert (r.est_rows, r.n_shared_keys, r.max_key_rows) == (0, 0, 0)


def test_partition_completeness_gap_detection(spark):
    from spanner_data_validator_spark.operators.integrity import (
        partition_completeness,
    )
    df = spark.createDataFrame(
        [("2024-01-01",), ("2024-01-02",), ("2024-01-02",),
         ("2024-01-05",)], "d string")
    r = partition_completeness(df, F.col("d")).first()
    assert (r.n_expected_days, r.n_actual_days, r.n_missing_days) == (5, 3, 2)
    assert (r.min_missing_day, r.max_missing_day) == \
        ("2024-01-03", "2024-01-04")


def test_partition_completeness_no_gaps(spark):
    from spanner_data_validator_spark.operators.integrity import (
        partition_completeness,
    )
    df = spark.createDataFrame([("2024-02-01",), ("2024-02-02",)],
                               "d string")
    r = partition_completeness(df, F.col("d")).first()
    assert r.n_missing_days == 0 and r.min_missing_day is None


def test_type_fit_rules(spark):
    df = spark.createDataFrame(
        [("abcdef", 1), ("ab", 2**40), (None, -2**40)],
        "s string, n long")
    out = {r.rule: r.n_violations for r in C.check_constraints(
        df, [C.max_length("s", 3), C.fits_int32("n")]).collect()}
    assert out["max_length(s,3)"] == 1      # NULL fits any width
    assert out["fits_int32(n)"] == 2


def test_constraint_monitor_exactly_once_on_replay(spark, tmp_path):
    from spanner_data_validator_spark.streaming.constraint_monitor import (
        ConstraintMonitor,
    )
    mon = ConstraintMonitor(str(tmp_path / "out"),
                            [C.not_null("v"), C.in_range("v", 0, 5)])
    b0 = spark.createDataFrame([(1,), (None,), (9,)], "v long")
    b1 = spark.createDataFrame([(2,), (3,)], "v long")
    mon(b0, 0)
    mon(b0, 0)   # sink crash-replay of the same batch: must be a no-op
    mon(b1, 1)
    out = {r.rule: r for r in mon.totals(spark).collect()}
    assert out["not_null(v)"].n_rows == 5
    assert out["not_null(v)"].n_violations == 1
    assert out["in_range(v,0,5)"].n_violations == 2   # NULL + 9
    assert out["in_range(v,0,5)"].passed is False


def test_constraint_monitor_rejects_non_additive(spark, tmp_path):
    import pytest as _pytest

    from spanner_data_validator_spark.streaming.constraint_monitor import (
        ConstraintMonitor,
    )
    with _pytest.raises(ValueError, match="non-additive"):
        ConstraintMonitor(str(tmp_path / "o"), [C.unique("v")])


def test_sequence_contiguity_classifies_defects(spark):
    from spanner_data_validator_spark.operators.integrity import (
        sequence_contiguity,
    )
    rows = [
        (1, 1), (1, 2), (1, 3),          # clean
        (2, 1), (2, 3),                  # gap
        (3, 1), (3, 1), (3, 2),          # dup
        (4, 2), (4, 3),                  # bad start (contiguous otherwise)
        (5, 2), (5, 2), (5, 5),          # dup + gap + bad start
    ]
    df = spark.createDataFrame(rows, "g long, s long")
    r = sequence_contiguity(df, "g", "s").first()
    assert (r.n_groups, r.n_clean) == (5, 1)
    assert (r.n_with_dups, r.n_with_gaps, r.n_bad_start) == (2, 2, 2)


def test_quantize_int8_values_and_barrier(spark):
    from spanner_data_validator_spark.operators.quantize import (
        quantize_int8,
        quantize_stats,
    )
    df = spark.createDataFrame(
        [(1, [1.0, -2.0, 0.5], "a"),
         (2, [0.0, 0.0], "a"),           # zero vector -> scale 0, all-zero q
         (3, [4.0], "b")],
        "id long, v array<double>, g string")
    got = {r.id: r for r in quantize_int8(df, "v").collect()}
    assert got[1].q == [64, -127, 32]    # scale 63.5; round(31.75) -> 32
    assert got[1].scale == 63.5
    assert got[2].q == [0, 0] and got[2].scale == 0.0
    assert got[3].q == [127]
    stats = {r.g: r for r in quantize_stats(df, "v", "g").collect()}
    assert stats["a"].checksum == 64 - 127 + 32
    assert stats["a"].n_saturated == 1 and stats["b"].n_saturated == 1
    # every quantized value in int8 range
    flat = [x for r in got.values() for x in r.q]
    assert all(-127 <= x <= 127 for x in flat)


def test_constraints_empty_input_passes_with_zero(spark):
    df = spark.createDataFrame([], "v long")
    out = C.check_constraints(df, [C.not_null("v"), C.in_range("v", 0, 5),
                                   C.unique("v")]).collect()
    assert all(r.n_violations == 0 and r.passed for r in out)
    assert all(r.n_rows == 0 for r in out)


def test_partition_completeness_single_input_scan(spark, tmp_path):
    path = str(tmp_path / "ev")
    spark.createDataFrame([("2024-01-01",), ("2024-01-03",)],
                          "d string").write.parquet(path)
    from spanner_data_validator_spark.operators.integrity import (
        partition_completeness,
    )
    df = spark.read.parquet(path)
    out = partition_completeness(df, F.col("d"))
    assert out.first().n_missing_days == 1
    plan = out._jdf.queryExecution().executedPlan().toString()
    # the raw input is scanned exactly once (days is checkpointed)
    assert plan.count("FileScan parquet") == 0  # no raw scans post-checkpoint


def test_key_skew_profile_single_input_scan(spark, tmp_path):
    path = str(tmp_path / "ev")
    spark.range(0, 100).selectExpr("id % 5 AS k").write.parquet(path)
    from spanner_data_validator_spark.operators.skew import key_skew_profile
    out = key_skew_profile(spark.read.parquet(path), "k", top_n=3)
    assert out.count() == 3
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("FileScan parquet") == 0
