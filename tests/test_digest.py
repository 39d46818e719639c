"""Per-range digest / incremental revalidation (operators/digest.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from spanner_data_validator_spark.operators.comparator import classify_pair
from spanner_data_validator_spark.operators.digest import (
    RANGE_CHANGED,
    RANGE_SOURCE_ONLY,
    RANGE_TARGET_ONLY,
    digest_drift,
    incremental_validate,
    range_digest,
)


def _fp_table(spark, rows):
    """rows: list of (key, fingerprint)."""
    return spark.createDataFrame(rows, "key LONG, fingerprint LONG")


def RID():
    return F.pmod(F.col("key"), F.lit(10))


def _drift(spark, src_rows, tgt_rows):
    sd = range_digest(_fp_table(spark, src_rows), RID(), F.col("fingerprint"))
    td = range_digest(_fp_table(spark, tgt_rows), RID(), F.col("fingerprint"))
    return digest_drift(sd, td)


def test_identical_tables_no_drift(spark):
    rows = [(k, k * 7919 - 3) for k in range(200)]
    assert _drift(spark, rows, rows).count() == 0


def test_single_mutation_flags_exactly_its_range(spark):
    rows = [(k, k * 7919) for k in range(200)]
    mutated = [(k, fp + 1 if k == 57 else fp) for k, fp in rows]
    got = _drift(spark, rows, mutated).collect()
    assert [(r["range_id"], r["status"]) for r in got] == [(7, RANGE_CHANGED)]
    assert got[0]["src_n"] == got[0]["tgt_n"] == 20


def test_duplicate_pair_insertion_not_cancelled_by_xor(spark):
    """Two EQUAL extra rows xor to zero — the split sums and count must still
    flag the range (the reason the digest is more than an xor fold)."""
    rows = [(k, k * 104729) for k in range(100)]
    dup_rows = rows + [(3, 3 * 104729), (13, 13 * 104729)]  # both in range 3
    got = _drift(spark, rows, dup_rows).collect()
    assert [(r["range_id"], r["status"]) for r in got] == [(3, RANGE_CHANGED)]


def test_side_only_ranges(spark):
    src = [(k, k) for k in range(30)]            # ranges 0..9
    tgt = [(k, k) for k in range(20)] + [(105, 105)]  # drops some, adds key 105
    got = {r["range_id"]: r["status"]
           for r in _drift(spark, src, tgt).collect()}
    # ranges 0..9 all lose a row except range 5 which gains one instead
    assert got[5] == RANGE_CHANGED
    assert all(s == RANGE_CHANGED for s in got.values())
    tgt_only = _drift(spark, [(1, 1)], [(1, 1), (22, 5)]).collect()
    assert {r["status"] for r in tgt_only} == {RANGE_TARGET_ONLY}
    src_only = _drift(spark, [(1, 1), (22, 5)], [(1, 1)]).collect()
    assert {r["status"] for r in src_only} == {RANGE_SOURCE_ONLY}


def test_incremental_validate_equals_full_on_drifted_ranges(spark):
    src_rows = [(k, k * 31) for k in range(500)]
    # churn confined to ranges 2 and 7: mutate keys ≡2 (mod 10) under 100,
    # delete keys ≡7 (mod 10) under 50
    tgt_rows = [
        (k, fp + 999 if (k % 10 == 2 and k < 100) else fp)
        for k, fp in src_rows
        if not (k % 10 == 7 and k < 50)
    ]
    src, tgt = _fp_table(spark, src_rows), _fp_table(spark, tgt_rows)
    drift, classified = incremental_validate(src, tgt, ["key"], RID())

    assert {r["range_id"] for r in drift.collect()} == {2, 7}
    got = {r["status"]: r["n"] for r in
           classified.groupBy("status").agg(F.count("*").alias("n")).collect()}
    # full classification restricted to the drifted ranges must agree
    full = classify_pair(src, tgt, ["key"]).where(F.pmod(F.col("key"), F.lit(10)).isin(2, 7))
    want = {r["status"]: r["n"] for r in
            full.groupBy("status").agg(F.count("*").alias("n")).collect()}
    assert got == want
    assert got["MISMATCH"] == 10 and got["SOURCE_ONLY"] == 5
    # every divergence lives in a drifted range: non-MATCH totals equal the
    # full-corpus validation's non-MATCH totals (MATCHes elsewhere are proven
    # by digest equality without being re-read)
    full_all = {r["status"]: r["n"] for r in
                classify_pair(src, tgt, ["key"]).groupBy("status")
                .agg(F.count("*").alias("n")).collect()}
    assert {k: v for k, v in got.items() if k != "MATCH"} == \
           {k: v for k, v in full_all.items() if k != "MATCH"}


def test_no_drift_short_circuits_row_work(spark):
    rows = [(k, k * 13) for k in range(100)]
    drift, classified = incremental_validate(
        _fp_table(spark, rows), _fp_table(spark, rows), ["key"], RID())
    assert drift.count() == 0
    assert classified.count() == 0
