"""Batch gap-based sessionization and a bucketed (distributed) interval join.

Complements the *streaming* session windows (`F.session_window`, query
`session_windows`) with the batch path a backfill over historical data runs:

* ``sessionize`` — classic gap sessionization: a new session starts when the
  gap to the previous event of the same key exceeds ``gap_ms``. One exchange
  keyed by ``key``; the lag window and the running-sum window share that
  exchange (same partitioning + ordering), so the whole thing is
  shuffle-once + in-partition sort.
* ``interval_join_bucketed`` — the range join Spark has no native operator
  for, for the case where the interval table is TOO LARGE to broadcast
  (a broadcast range probe already exists for small range lists:
  `operators/ranges.assign_range_via_join`). Intervals explode to the
  fixed-width time buckets they cover; points map to exactly one bucket;
  the join becomes an equi-join on (key, bucket) + residual range filter —
  a shuffled hash/sort-merge join, never a BroadcastNestedLoopJoin, and
  each (point, interval) pair meets exactly once (the point's bucket is
  covered by the interval exactly once), so no dedup pass is needed.

Scale notes: sessionization state is one sort per key-partition (Spark
spills sorts; no driver state). The interval explode factor is
``len/bucket_ms + 1`` per interval — pick ``bucket_ms`` near the typical
interval length so the blow-up is ~2x; hot buckets split under AQE skew
handling.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def sessionize(df: DataFrame, key: str, ts_ms: Column, gap_ms: int,
               tiebreak: Column) -> DataFrame:
    """Add ``session_idx`` (1-based per key) to each row.

    ``tiebreak`` totalizes the ordering for equal timestamps so the
    assignment is deterministic and engine-portable. Timestamps are integer
    milliseconds — the gap comparison never touches floats.
    """
    w = Window.partitionBy(key).orderBy(F.col("__ts_ms").asc(),
                                        F.col("__tb").asc())
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    out = (df.withColumn("__ts_ms", ts_ms.cast("long"))
             .withColumn("__tb", tiebreak))
    prev = F.lag("__ts_ms").over(w)
    brk = (prev.isNull() | (F.col("__ts_ms") - prev > F.lit(gap_ms))).cast("long")
    return (out.withColumn("session_idx", F.sum(brk).over(run))
               .drop("__tb"))


def session_stats(df: DataFrame, key: str, ts_ms: Column, gap_ms: int,
                  tiebreak: Column) -> DataFrame:
    """Per-session rollup: (key, session_idx, n_events, start_ms, end_ms,
    duration_ms). The groupBy reuses the sessionize partitioning (same key
    prefix) — Catalyst plans it without a second exchange."""
    s = sessionize(df, key, ts_ms, gap_ms, tiebreak)
    return (s.groupBy(key, "session_idx")
             .agg(F.count(F.lit(1)).alias("n_events"),
                  F.min("__ts_ms").alias("start_ms"),
                  F.max("__ts_ms").alias("end_ms"))
             .withColumn("duration_ms", F.col("end_ms") - F.col("start_ms")))


def interval_join_bucketed(points: DataFrame, intervals: DataFrame,
                           on: Sequence[str], point_ts: str,
                           start: str, end: str, bucket_ms: int,
                           how: str = "inner") -> DataFrame:
    """Equi-join-shaped range join: ``points`` rows matched to ``intervals``
    rows sharing ``on`` keys with ``start <= point_ts < end`` (end
    exclusive).

    Both inputs must carry integer-millisecond columns. The interval side
    fans out to ``(end - 1 - start) // bucket_ms + 1`` rows; the residual
    filter runs post-join. Overlapping intervals are fine (a point matches
    each covering interval once).
    """
    b = F.lit(bucket_ms)
    ivl = intervals.withColumn(
        "__bucket",
        F.explode(F.sequence(F.floor(F.col(start) / b),
                             F.floor((F.col(end) - 1) / b))))
    pts = points.withColumn("__bucket", F.floor(F.col(point_ts) / b))
    joined = pts.join(ivl, on=[*on, "__bucket"], how=how)
    return (joined.where((F.col(point_ts) >= F.col(start)) &
                         (F.col(point_ts) < F.col(end)))
                  .drop("__bucket"))
