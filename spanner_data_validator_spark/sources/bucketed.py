"""Shuffle-free validation over pre-bucketed tables (the 10^12-turn path).

At full scale the ONE unavoidable cost in the validation plan is the join
shuffle: both sides exchange (key, fingerprint, ts) hash-partitioned on the
key. When the same corpus is validated repeatedly (daily reconciliation, the
reference's recurring-run mode), that shuffle can be paid ONCE at write time:
store both sides as tables bucketed by the full join key
``(conv_id, turn_idx)`` with the same bucket count, and every subsequent
validation join is bucket-local — EnsureRequirements inserts NO Exchange on
either side.

This is Spark's equivalent of co-located tables; on a 1000-executor cluster
it removes the all-to-all network phase entirely (reads are node-local after
the first run with consistent bucketing).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

# NOTE: streaming.validate_stream imports sources.transcript_source, and this
# module is re-exported from sources/__init__ — importing validate_stream at
# module level would make the package graph circular (it breaks exactly when
# a foreachBatch callback thread re-imports the package mid-initialization),
# so the validation imports live inside validate_bucketed.


def write_bucketed(
    df: DataFrame,
    table: str,
    *,
    buckets: int = 32,
    bucket_cols: tuple[str, ...] = ("conv_id", "turn_idx"),
    sort_cols: tuple[str, ...] = ("conv_id", "turn_idx"),
    json_cols: frozenset[str] = frozenset({"tool"}),
) -> None:
    """Persist one side as a parquet table bucketed (and sorted) by key.

    Two rules make the later join exchange-free:

    * bucket on the FULL join key — since Spark 3.3,
      ``spark.sql.requireAllClusterKeysForCoPartition`` defaults true, so a
      join only skips the exchange when both sides' bucketing covers every
      join key (bucketing by conv_id alone still shuffles);
    * JSON columns are normalized HERE, once, at write time — an
      ArrowEvalPython node does not propagate the scan's bucketed output
      partitioning, so a read-time normalizer UDF would reintroduce both
      exchanges. Normalization output is not valid JSON, so re-normalizing
      at read time would be a no-op anyway; validate_bucketed fingerprints
      the stored columns verbatim.
    """
    from spanner_data_validator_spark.functions.fingerprint import (
        normalize_json_udf,
    )
    from pyspark.sql import functions as F

    for c in json_cols:
        if c in df.columns:
            df = df.withColumn(c, normalize_json_udf(F.col(c)))
    (df.write.mode("overwrite").format("parquet")
       .bucketBy(buckets, *bucket_cols)
       .sortBy(*sort_cols)
       .saveAsTable(table))


def validate_bucketed(
    spark: SparkSession,
    source_table: str,
    target_table: str,
    *,
    algo: str = "xxhash64",
    band: str = "2 hours",
) -> DataFrame:
    """The standard fingerprint → full-outer classify plan over two bucketed
    tables. JSON columns were normalized at write time, so the whole plan is
    JVM expressions over the bucketed scans and contains no Exchange
    (asserted in tests/test_bucketed.py)."""
    from spanner_data_validator_spark.streaming.validate_stream import (
        classify_stream,
        fingerprint_stream,
    )

    src = fingerprint_stream(spark.table(source_table), algo=algo,
                             json_cols=frozenset())
    tgt = fingerprint_stream(spark.table(target_table), algo=algo,
                             json_cols=frozenset())
    return classify_stream(src, tgt, band=band)
