"""Continuous data-quality monitoring: the constraint suite per micro-batch.

Runs ``operators/constraints.check_constraints`` inside ``foreachBatch`` and
lands one row per (batch, rule) in the batch-fenced exactly-once parquet
sink — a replayed micro-batch (sink crash between write and checkpoint
commit) is skipped, so totals never double-count. ``totals`` then folds the
committed per-batch results into the whole-stream answer.

Only ADDITIVE rules are accepted (``Rule.additive``): a row-predicate
violation count sums across batches to the global count; ``unique()`` does
not (duplicates span batches — cross-batch dedup is a stateful operator,
use ``dropDuplicatesWithinWatermark`` upstream instead). Rejecting loudly
beats silently under-counting.

State: none. The monitor is stateless streaming — each batch costs one
aggregate scan, the sink holds batches × rules tiny rows, and watermarks
are unnecessary (no event-time grouping).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spanner_data_validator_spark.operators.constraints import (
    Rule,
    check_constraints,
)
from spanner_data_validator_spark.streaming.sink import ExactlyOnceParquetSink


class ConstraintMonitor:
    """``foreachBatch`` callable: per-batch constraint evaluation into an
    exactly-once sink, with whole-stream ``totals``."""

    def __init__(self, out_dir: str, rules: Sequence[Rule]):
        bad = [r.name for r in rules if not r.additive]
        if bad:
            raise ValueError(
                f"non-additive rules cannot be monitored per-batch: {bad}; "
                "their per-batch counts do not sum to the stream answer")
        self.rules = list(rules)
        self.sink = ExactlyOnceParquetSink(out_dir)

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        res = check_constraints(batch_df, self.rules) \
            .withColumn("batch_id", F.lit(batch_id).cast("long"))
        self.sink(res, batch_id)

    def totals(self, spark: SparkSession) -> DataFrame | None:
        """Whole-stream rollup of the committed batches: one row per rule
        (ord, rule, n_rows, n_violations, passed)."""
        per_batch = self.sink.read_committed(spark)
        if per_batch is None:
            return None
        return (per_batch.groupBy("ord", "rule")
                .agg(F.sum("n_rows").cast("long").alias("n_rows"),
                     F.sum("n_violations").cast("long")
                      .alias("n_violations"))
                .withColumn("passed", F.col("n_violations") == 0))
