"""Custom transformation (P6), JDBC range predicates (S3), TableSpec runner (O2)."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from spanner_data_validator_spark.operators.transform import (
    apply_custom_transformation,
)
from spanner_data_validator_spark.sources.jdbc_source import (
    range_predicates,
    ranged_predicates_for,
)
from spanner_data_validator_spark.operators.ranges import long_ranges
from spanner_data_validator_spark.jobs.spec_runner import (
    TableSpec,
    load_specs,
    run_specs,
)


# ---------------------------------------------------------------------------
# P6 custom transformation
# ---------------------------------------------------------------------------

def test_custom_transformation_rewrites_and_filters(spark):
    df = spark.range(100).select(
        F.col("id"), F.concat(F.lit("v"), F.col("id")).alias("val"))

    def fn(pdf):
        out = pdf[pdf["id"] % 2 == 0].copy()
        out["val"] = out["val"].str.upper()
        return out

    got = apply_custom_transformation(df, fn).collect()
    assert len(got) == 50
    assert all(r["val"].startswith("V") and r["id"] % 2 == 0 for r in got)


def test_custom_transformation_schema_change_and_drop_all(spark):
    df = spark.range(10)

    def add_col(pdf):
        pdf = pdf.copy()
        pdf["doubled"] = pdf["id"] * 2
        return pdf

    got = apply_custom_transformation(
        df, add_col, schema="id long, doubled long").collect()
    assert {r["doubled"] for r in got} == {2 * i for i in range(10)}

    assert apply_custom_transformation(df, lambda pdf: None).count() == 0


# ---------------------------------------------------------------------------
# S3 predicate-per-range JDBC plumbing
# ---------------------------------------------------------------------------

def test_range_predicates_cover_key_space_exactly_once():
    ranges = long_ranges(0, 1000, 4)
    preds = range_predicates(ranges, "k", "LONG")
    assert len(preds) == 4
    assert preds[-1].endswith("k <= 1000")
    # every key in [0, 1000] satisfies exactly one predicate (no seam gaps,
    # no double-reads — see range_predicates docstring on the reference's
    # inconsistent boundary handling)
    import re

    def hits(k):
        n = 0
        for p in preds:
            lo, hi = map(int, re.findall(r"-?\d+", p))
            closed = "<=" in p
            if k >= lo and (k <= hi if closed else k < hi):
                n += 1
        return n

    assert all(hits(k) == 1 for k in range(0, 1001))


def test_range_predicates_quote_string_types():
    preds = ranged_predicates_for(
        "UUID", "u",
        "00000000-0000-0000-0000-000000000000",
        "ffffffff-ffff-ffff-ffff-ffffffffffff", 2)
    assert len(preds) == 2
    assert preds[0].startswith("u >= '00000000-")


def test_ranged_predicates_partition_filter_ratio():
    all_preds = ranged_predicates_for("LONG", "k", "0", "100000", 100)
    kept = ranged_predicates_for("LONG", "k", "0", "100000", 100,
                                 partition_filter_ratio=10)
    assert len(kept) < len(all_preds)


# ---------------------------------------------------------------------------
# O2 TableSpec-driven multi-table run
# ---------------------------------------------------------------------------

@pytest.fixture()
def two_table_specs(spark, tmp_path):
    """Two small tables with planted diffs: t1 has 1 mismatch, t2 1 source-only."""
    a = spark.range(20).select(F.col("id"), F.concat(F.lit("a"), F.col("id")).alias("v"))
    a.write.parquet(f"{tmp_path}/t1_src")
    a.withColumn("v", F.when(F.col("id") == 3, F.lit("CHANGED")).otherwise(F.col("v"))) \
        .write.parquet(f"{tmp_path}/t1_tgt")
    b = spark.range(30).select(F.col("id"), F.concat(F.lit("b"), F.col("id")).alias("v"))
    b.write.parquet(f"{tmp_path}/t2_src")
    b.where(F.col("id") != 7).write.parquet(f"{tmp_path}/t2_tgt")

    specs = [
        dict(table_name="t1", source_path=f"{tmp_path}/t1_src",
             target_path=f"{tmp_path}/t1_tgt", key_cols=["id"],
             payload_cols=["v"], num_ranges=4),
        dict(table_name="t2", source_path=f"{tmp_path}/t2_src",
             target_path=f"{tmp_path}/t2_tgt", key_cols=["id"],
             payload_cols=["v"], num_ranges=4),
    ]
    spec_file = tmp_path / "specs.json"
    spec_file.write_text(json.dumps(specs))
    return str(spec_file)


def test_run_specs_multi_table_report(spark, two_table_specs):
    specs = load_specs(two_table_specs)
    assert all(isinstance(s, TableSpec) for s in specs)
    report = run_specs(spark, specs, run_name="r1")
    rows = report.collect()
    assert {r["table_or_query"] for r in rows} == {"t1", "t2"}

    def totals(table):
        sub = [r for r in rows if r["table_or_query"] == table]
        return {k: sum(r[k] for r in sub) for k in
                ("match_count", "source_conflict_count", "target_conflict_count")}

    assert totals("t1") == {"match_count": 19, "source_conflict_count": 1,
                            "target_conflict_count": 1}  # MISMATCH counts both sides
    assert totals("t2") == {"match_count": 29, "source_conflict_count": 1,
                            "target_conflict_count": 0}  # SOURCE_ONLY


def test_run_specs_throttles_concurrent_table_actions(spark, tmp_path):
    """Wait.on parity (PipelineTracker.java:41-65): with max_concurrent=2,
    never more than 2 tables' materializing actions run at once."""
    import threading
    import time

    a = spark.range(50).select(F.col("id"), F.col("id").cast("string").alias("v"))
    specs = []
    for i in range(6):
        a.write.mode("overwrite").parquet(f"{tmp_path}/s{i}")
        a.write.mode("overwrite").parquet(f"{tmp_path}/g{i}")
        specs.append(TableSpec(
            table_name=f"tab{i}", source_path=f"{tmp_path}/s{i}",
            target_path=f"{tmp_path}/g{i}", key_cols=["id"],
            payload_cols=["v"], num_ranges=2))

    lock = threading.Lock()
    active = {"n": 0, "max": 0, "tables": []}

    def action(report, spec):
        with lock:
            active["n"] += 1
            active["max"] = max(active["max"], active["n"])
        try:
            report.count()  # a real Spark action per table
            time.sleep(0.15)  # hold the slot so overlap is observable
        finally:
            with lock:
                active["n"] -= 1
                active["tables"].append(spec.table_name)

    run_specs(spark, specs, run_name="r2", max_concurrent=2,
              per_table_action=action)
    assert sorted(active["tables"]) == [f"tab{i}" for i in range(6)]
    assert active["max"] <= 2


def test_spec_driven_transformation_loading(spark, tmp_path):
    """A spec names its transform by module path (jarPath/classPath analogue):
    the loaded callable rewrites source rows before fingerprinting, and a
    factory receives the opaque parameter string."""
    from spanner_data_validator_spark.operators.transform import (
        load_custom_transformation,
    )

    a = spark.range(20).select(F.col("id"), F.concat(F.lit("x"), F.col("id")).alias("v"))
    a.write.parquet(f"{tmp_path}/src")
    a.selectExpr("id", "upper(v) AS v").write.parquet(f"{tmp_path}/tgt")

    spec = TableSpec(
        table_name="t", source_path=f"{tmp_path}/src",
        target_path=f"{tmp_path}/tgt", key_cols=["id"], payload_cols=["v"],
        num_ranges=2, transformation="tests.helper_transforms:uppercase_v")
    report = run_specs(spark, [spec], run_name="r3").collect()
    # transform uppercases the source -> everything matches the target
    assert sum(r["match_count"] for r in report) == 20
    assert sum(r["source_conflict_count"] for r in report) == 0

    # factory form: parameters string configures the transform
    fn = load_custom_transformation("tests.helper_transforms:drop_mod_factory", "5")
    import pandas as pd
    out = fn(pd.DataFrame({"id": range(10), "v": list("abcdefghij")}))
    assert list(out["id"]) == [i for i in range(10) if i % 5 != 0]

    import pytest as _pytest
    with _pytest.raises(ValueError, match="module:function"):
        load_custom_transformation("no_colon_here")


def test_partition_filter_ratio_disabled_sentinel_uses_normal_path():
    """-1 (the documented 'off' value) must take the exactly-once contiguous
    path, not filter mode (round-2 review regression)."""
    on = ranged_predicates_for("LONG", "id", "0", "99", 4)
    off = ranged_predicates_for("LONG", "id", "0", "99", 4,
                                partition_filter_ratio=-1)
    assert off == on


def test_filtered_predicates_never_overlap():
    """Adjacent kept ranges (ratio=2 hits the closing-range adjacency) must
    not double-read the seam key (round-2 review regression)."""
    import re

    for ratio in (1, 2, 3, 4):
        preds = ranged_predicates_for("LONG", "id", "0", "99", 8,
                                      partition_filter_ratio=ratio)
        spans = []
        for p in preds:
            lo = int(re.search(r">= (-?\d+)", p).group(1))
            m_closed = re.search(r"<= (-?\d+)", p)
            m_open = re.search(r"< (-?\d+)", p)
            hi = int(m_closed.group(1)) if m_closed else int(m_open.group(1)) - 1
            spans.append((lo, hi))
        covered = set()
        for lo, hi in spans:
            for k in range(lo, hi + 1):
                assert k not in covered, (ratio, k, preds)
                covered.add(k)
