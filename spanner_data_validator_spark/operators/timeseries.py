"""Deterministic time-series smoothing over grouped daily aggregates.

``ewma_by_group`` computes an exponentially-weighted moving average of a
per-day metric, per group, as a SORTED FOLD: the day series is assembled
with sort_array(collect_list(...)) and folded with the ``aggregate`` HOF,
so the floating-point operations run in exactly one order — the result is
bit-reproducible across runs, partitionings, AND engines (a windowed
sum-of-weights formulation would depend on reduction order). With
alpha = 0.5 every multiply is exact in IEEE double, so cross-engine
equality is exact, not approximate.

Scale: the fold runs over the POST-AGGREGATION series (days per group,
thousands at most), not raw rows; the heavy input collapses in the daily
count aggregation. State per group = the day array — bounded by the
calendar, not the data.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def ewma_by_group(df: DataFrame, group: str, ts: str,
                  *, alpha: float = 0.5) -> DataFrame:
    """Per-group EWMA of the DAILY ROW COUNT: returns (group, n_days,
    last_day, ewma) where ewma folds the day-ordered counts with
    ``acc = acc*(1-alpha) + cnt*alpha`` seeded from the first day's count.
    """
    daily = (df.groupBy(F.col(group), F.col(ts).cast("date").alias("__d"))
             .agg(F.count(F.lit(1)).cast("double").alias("__cnt")))
    series = (daily.groupBy(group)
              .agg(F.sort_array(F.collect_list(
                  F.struct(F.col("__d"), F.col("__cnt")))).alias("__s")))
    a = F.lit(float(alpha))
    folded = F.aggregate(
        F.slice(F.col("__s"), 2, F.size(F.col("__s"))),
        F.element_at(F.col("__s"), 1)["__cnt"],
        lambda acc, x: acc * (F.lit(1.0) - a) + x["__cnt"] * a)
    return series.select(
        F.col(group),
        F.size(F.col("__s")).alias("n_days"),
        F.element_at(F.col("__s"), -1)["__d"].cast("string")
         .alias("last_day"),
        folded.alias("ewma"))


def resample_ffill(df: DataFrame, key: str, ts: str, value_col: str,
                   *, unit: str = "hour") -> DataFrame:
    """Regularize an event stream onto a dense per-``unit`` grid with
    forward-fill — the gap-filling step before any rolling/EWMA analytics
    (a rolling window over a gappy series silently skips empty buckets).

    Returns (key, bucket, n_events, value_ffill): one row per key per
    ``unit`` between the observed min/max, ``n_events`` = 0 on gaps, and
    ``value_ffill`` = the last observed per-bucket MAX of ``value_col`` at
    or before the bucket (max, not "latest", so the carried value is
    aggregation-order-free and engine-exact; NULL until the key's first
    observation). Floats are carried verbatim — no arithmetic, so results
    hash-match any engine.

    Plan shape at 100 TB: one bucket aggregation (the only corpus-sized
    shuffle), a broadcast of the bucket spine (bounded: hours of a year =
    8.8k rows) against the distinct-key table, and ONE keyed exchange for
    the forward-fill window — the sort is per key over its buckets, never
    global.
    """
    b = F.date_trunc(unit, F.col(ts))
    # ONE corpus scan: keys and grid bounds derive from the bucket table
    # (min/max bucket == truncated min/max ts), which is pinned for its
    # three consumers (multi-branch rescan trap)
    hourly = (df.groupBy(F.col(key), b.alias("bucket"))
              .agg(F.count(F.lit(1)).alias("__c"),
                   F.max(value_col).alias("__hv"))
              .localCheckpoint(eager=False))
    bounds = hourly.agg(F.min("bucket").alias("__lo"),
                        F.max("bucket").alias("__hi"))
    spine = bounds.select(F.explode(F.sequence(
        "__lo", "__hi", F.expr(f"INTERVAL 1 {unit}"))).alias("bucket"))
    keys = hourly.select(key).distinct()
    grid = keys.crossJoin(F.broadcast(spine))
    w = (Window.partitionBy(key).orderBy("bucket")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return (grid.join(hourly, [key, "bucket"], "left")
            .select(F.col(key), F.col("bucket"),
                    F.coalesce(F.col("__c"), F.lit(0)).cast("bigint")
                     .alias("n_events"),
                    F.last("__hv", ignorenulls=True).over(w)
                     .alias("value_ffill")))
