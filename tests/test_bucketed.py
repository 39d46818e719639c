"""Pre-bucketed validation: the join runs with ZERO exchanges.

The 10^12-turn scale claim made concrete: once both sides are stored
bucketed by conv_id with equal bucket counts, the validation join's physical
plan contains no ShuffleExchange on either side — the shuffle was paid once
at write time (sources/bucketed.py).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from spanner_data_validator_spark.datagen.transcripts import gen_transcript_pair
from spanner_data_validator_spark.sources.bucketed import (
    validate_bucketed,
    write_bucketed,
)
from spanner_data_validator_spark.sources.transcript_source import TRANSCRIPT_SCHEMA


@pytest.fixture(scope="module")
def bucketed_pair(spark):
    pair = gen_transcript_pair(60, seed=23, dup_rows=0, hot_convs=1, hot_size=80)
    src = spark.createDataFrame(pair.source, schema=TRANSCRIPT_SCHEMA)
    tgt = spark.createDataFrame(pair.target, schema=TRANSCRIPT_SCHEMA)
    write_bucketed(src, "bkt_src", buckets=8)
    write_bucketed(tgt, "bkt_tgt", buckets=8)
    yield pair
    spark.sql("DROP TABLE IF EXISTS bkt_src")
    spark.sql("DROP TABLE IF EXISTS bkt_tgt")


def test_bucketed_join_has_no_exchange(spark, bucketed_pair):
    classified = validate_bucketed(spark, "bkt_src", "bkt_tgt")
    classified.count()  # run under AQE, then read the final plan
    plan = classified._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
    assert "SortMergeJoin" in plan


def test_bucketed_counts_match_expected(spark, bucketed_pair):
    classified = validate_bucketed(spark, "bkt_src", "bkt_tgt")
    got = {r["status"]: r["n"] for r in
           classified.groupBy("status").agg(F.count("*").alias("n")).collect()}
    assert got == bucketed_pair.expected
