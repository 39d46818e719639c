"""Driver-contract smoke: entry(), queries()/oracle_sql() registry shape."""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

import __spark_entry__ as e  # noqa: E402


def test_entry_runs(spark):
    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert {"range", "match_count", "source_count", "target_count",
            "source_conflict_count", "target_conflict_count"} <= set(df.columns)


def test_registry_consistency():
    qs, oracles = e.queries(), e.oracle_sql()
    assert len(qs) >= 15
    assert set(oracles) <= set(qs)  # every oracle has a query
    # the headline validator ops are oracle-checked
    for name in ["validate_classify", "validate_totals", "validate_report",
                 "ngram_jaccard_pairs", "ann_cosine_topk"]:
        assert name in oracles


def test_flagship_tally_identity(spark):
    from pyspark.sql import functions as F

    df = e.entry(spark)
    tot = df.agg(F.sum("match_count").alias("m"),
                 F.sum("source_conflict_count").alias("sc"),
                 F.sum("target_conflict_count").alias("tc"),
                 F.sum("source_count").alias("s"),
                 F.sum("target_count").alias("t")).collect()[0]
    # identity: source_count = match + source_conflict; target likewise
    assert tot["s"] == tot["m"] + tot["sc"]
    assert tot["t"] == tot["m"] + tot["tc"]
