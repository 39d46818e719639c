"""Behavioral analytics: ordered funnels and retention cohorts.

Classic event-stream OLAP the reference has no surface for (its engine is
row reconciliation; SURVEY §2) but any analytics engine over an events
table needs. Both operators are pure keyed aggregations + key joins —
no windows over raw rows, no per-user state.

* ``funnel_stages`` — strictly-ordered funnel: a user reaches stage i when
  an event of stage-i type occurs STRICTLY AFTER their stage-(i-1) entry
  time. Stage i is one conditional min aggregation joined back on user_id,
  so k stages cost k keyed aggs + (k-1) key joins — every exchange carries
  one row per user, never per event. Each stage's per-user table is
  localCheckpoint-ed: it feeds both its count and the next stage, and an
  un-materialized branch would re-run the whole upstream chain (O(k^2)
  input scans).
* ``retention_cohorts`` — users bucketed by first-seen day (cohort), then
  distinct-user counts per (cohort_day, day_offset). The cohort table is
  one aggregation; the offset join is on user_id.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def funnel_stages(events: DataFrame, *, user: str, ts: str, stage_col: str,
                  stages: Sequence[str]) -> DataFrame:
    """Strictly-ordered funnel over ``stages``: returns one row per stage
    (stage_idx, stage, n_users) where n_users counts users whose stage-i
    event happened strictly after their stage-(i-1) entry event."""
    if not stages:
        raise ValueError("stages must be non-empty")
    reached: list[DataFrame] = []
    prev: DataFrame | None = None
    for i, s in enumerate(stages):
        ev_s = events.where(F.col(stage_col) == s)
        if prev is None:
            cur = ev_s.groupBy(user).agg(F.min(ts).alias("__t"))
        else:
            cur = (ev_s.join(prev.select(user, F.col("__t").alias("__pt")),
                             on=user)
                   .where(F.col(ts) > F.col("__pt"))
                   .groupBy(user).agg(F.min(ts).alias("__t")))
        # checkpoint the per-user stage table (one row per user): it feeds
        # BOTH the count branch and the next stage, and Catalyst re-computes
        # the whole upstream chain per branch otherwise (O(k^2) input scans
        # measured — the CLAUDE.md aliased-branch gotcha)
        cur = cur.localCheckpoint()
        reached.append(cur.agg(
            F.lit(i).alias("stage_idx"), F.lit(s).alias("stage"),
            F.count(F.lit(1)).cast("long").alias("n_users")))
        prev = cur
    out = reached[0]
    for r in reached[1:]:
        out = out.unionByName(r)
    return out


def retention_cohorts(events: DataFrame, *, user: str, ts: str,
                      max_offset_days: int = 7) -> DataFrame:
    """Cohort retention: (cohort_day, day_offset, n_users) for offsets in
    [0, max_offset_days]. cohort_day is the user's first-seen date; a user
    counts in offset d when they have any event exactly d days after it."""
    day = F.col(ts).cast("date")
    first = events.groupBy(user).agg(F.min(day).alias("cohort_day"))
    return (events.select(user, day.alias("__d"))
            .join(first, on=user)
            .select(F.col("cohort_day"),
                    F.datediff(F.col("__d"), F.col("cohort_day"))
                     .alias("day_offset"),
                    F.col(user))
            .where(F.col("day_offset") <= max_offset_days)
            .groupBy("cohort_day", "day_offset")
            .agg(F.countDistinct(user).cast("long").alias("n_users")))


def last_touch_attribution(events: DataFrame, *, user: str, ts: str,
                           tiebreak: str, etype: str,
                           conversion: str) -> DataFrame:
    """Last-touch conversion attribution: each ``conversion`` event is
    credited to the nearest PRECEDING non-conversion event of the same
    user (marketing's last-touch model; 'direct' when no touch precedes).
    Returns one row per crediting type:
    ``(attributed_type, n_conversions, n_users)``.

    One user-keyed exchange: the carry-forward is
    ``last(non-conversion type, ignorenulls)`` over rows UNBOUNDED
    PRECEDING .. 1 PRECEDING under the (ts, tiebreak) total order — no
    self-join against prior events (the naive time-band join is
    quadratic in hot users). The tiebreak column must be unique within
    user or engines pair rows differently.
    """
    w = (Window.partitionBy(user).orderBy(F.col(ts), F.col(tiebreak))
         .rowsBetween(Window.unboundedPreceding, -1))
    touch = F.last(
        F.when(F.col(etype) != conversion, F.col(etype)),
        ignorenulls=True).over(w)
    conv = (events.withColumn("__touch", touch)
            .where(F.col(etype) == conversion))
    return (conv.groupBy(F.coalesce(F.col("__touch"), F.lit("direct"))
                         .alias("attributed_type"))
            .agg(F.count(F.lit(1)).alias("n_conversions"),
                 F.countDistinct(user).alias("n_users")))
