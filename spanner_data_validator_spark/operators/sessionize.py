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
    """Add ``session_idx`` (1-based per key) to each row; the input schema
    is otherwise untouched (the windows order by expressions directly — no
    helper columns leak or get clobbered).

    ``tiebreak`` totalizes the ordering for equal timestamps so the
    assignment is deterministic and engine-portable. Timestamps are integer
    milliseconds — the gap comparison never touches floats.
    """
    ts = ts_ms.cast("long")
    w = Window.partitionBy(key).orderBy(ts.asc(), tiebreak.asc())
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    prev = F.lag(ts).over(w)
    brk = (prev.isNull() | (ts - prev > F.lit(gap_ms))).cast("long")
    return df.withColumn("session_idx", F.sum(brk).over(run))


def session_stats(df: DataFrame, key: str, ts_ms: Column, gap_ms: int,
                  tiebreak: Column) -> DataFrame:
    """Per-session rollup: (key, session_idx, n_events, start_ms, end_ms,
    duration_ms). The groupBy reuses the sessionize partitioning (same key
    prefix) — Catalyst plans it without a second exchange."""
    ts = ts_ms.cast("long")
    s = sessionize(df, key, ts_ms, gap_ms, tiebreak)
    return (s.groupBy(key, "session_idx")
             .agg(F.count(F.lit(1)).alias("n_events"),
                  F.min(ts).alias("start_ms"),
                  F.max(ts).alias("end_ms"))
             .withColumn("duration_ms", F.col("end_ms") - F.col("start_ms")))


def interval_join_bucketed(points: DataFrame, intervals: DataFrame,
                           on: Sequence[str], point_ts: str,
                           start: str, end: str, bucket_ms: int,
                           how: str = "inner") -> DataFrame:
    """Equi-join-shaped range join: ``points`` rows matched to ``intervals``
    rows sharing ``on`` keys with ``start <= point_ts < end`` (end
    exclusive).

    Both inputs must carry integer-millisecond columns. The interval side
    fans out to ``(end - 1 - start) // bucket_ms + 1`` rows. Overlapping
    intervals are fine (a point matches each covering interval once).

    ``how`` may be ``inner`` or ``left`` (unmatched points kept with NULL
    interval columns — the range predicate lives INSIDE the join condition,
    so a left join does not silently degenerate to inner). ``right``/``full``
    are rejected: the exploded interval side would emit one null-extended
    row per UNMATCHED BUCKET instead of per interval.
    """
    if how not in ("inner", "left"):
        raise ValueError(
            f"how={how!r} unsupported: the bucket-exploded interval side "
            "would duplicate unmatched intervals; use 'inner' or 'left'")
    b = F.lit(bucket_ms)
    ivl = intervals.withColumn(
        "__bucket",
        F.explode(F.sequence(F.floor(F.col(start) / b),
                             F.floor((F.col(end) - 1) / b)))).alias("__ivl")
    pts = points.withColumn(
        "__bucket", F.floor(F.col(point_ts) / b)).alias("__pts")
    cond = F.col(f"__pts.__bucket") == F.col("__ivl.__bucket")
    for k in on:
        cond = cond & (F.col(f"__pts.{k}") == F.col(f"__ivl.{k}"))
    cond = cond & (F.col(f"__pts.{point_ts}") >= F.col(f"__ivl.{start}")) \
                & (F.col(f"__pts.{point_ts}") < F.col(f"__ivl.{end}"))
    ivl_cols = [c for c in intervals.columns if c not in on]
    joined = pts.join(ivl, cond, how)
    return joined.select(
        *[F.col(f"__pts.{c}") for c in points.columns],
        *[F.col(f"__ivl.{c}") for c in ivl_cols])


def merge_intervals(df: DataFrame, key: str, start: Column,
                    end: Column) -> DataFrame:
    """Gaps-and-islands: merge overlapping/touching [start, end] intervals
    per key into maximal covered islands — the dual of ``sessionize``
    (which SPLITS points on gaps; this MERGES ranges on overlap). The
    canonical uses: total covered machine-time from job intervals,
    effective validity union of SCD rows, dedup of replayed spans.

    Plan: one key-partitioned sort window. An interval starts a new
    island iff its start exceeds the running max(end) of every earlier
    interval (window max over the preceding frame — handles the
    containment case a lag(end) formulation gets wrong); the island id
    is then a running count of those flags, and each island aggregates
    once. All arithmetic integer.

    Output: (key, island_id, island_start, island_end, n_intervals).
    """
    base = df.select(F.col(key), start.alias("__s"), end.alias("__e"))
    wo = (Window.partitionBy(key)
          .orderBy(F.col("__s").asc(), F.col("__e").asc()))
    prev_max = (F.max("__e").over(
        wo.rowsBetween(Window.unboundedPreceding, -1)))
    flag = F.when(prev_max.isNull() | (F.col("__s") > prev_max),
                  F.lit(1)).otherwise(F.lit(0))
    c = (base.withColumn("__new", flag)
         .withColumn("__isl", F.sum("__new").over(
             wo.rowsBetween(Window.unboundedPreceding, 0))))
    return (c.groupBy(key, F.col("__isl").alias("island_id"))
            .agg(F.min("__s").alias("island_start"),
                 F.max("__e").alias("island_end"),
                 F.count(F.lit(1)).alias("n_intervals")))
