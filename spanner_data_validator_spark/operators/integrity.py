"""Structural integrity checks: referential integrity and key uniqueness.

The reference validates row CONTENT between two copies of the same table
(SURVEY §2 C1/J1); a migration validator also needs the structural tier —
do the tables still reference each other, are the primary keys still keys.
All checks here are one-aggregation-pass designs:

* ``orphan_check`` — child rows whose FK has no parent. The child is first
  reduced to (key, row_count) so the anti-join shuffles DISTINCT keys, not
  rows: at 10^12 child rows / 10^9 keys that is a 1000× smaller exchange,
  and the orphan ROW count is recovered exactly by summing the carried
  counts. Parent side is reduced to distinct keys too (anti-join needs
  existence only).
* ``uniqueness_check`` — multiplicity profile of a candidate key: total
  rows, distinct keys, duplicated keys/rows, max multiplicity. One groupBy
  + one 1-row aggregate.
* ``duplicate_examples`` — the worst offending keys for triage, via
  TakeOrderedAndProject (per-partition top-N reduce, no global sort),
  deterministic under (count desc, key asc).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _key_repr(keys: Sequence[str]):
    return F.concat_ws("|", *[F.col(k).cast("string") for k in keys])


def orphan_check(child: DataFrame, parent: DataFrame,
                 on: Sequence[str]) -> DataFrame:
    """Rows-with-no-parent summary: one row with ``n_orphan_rows``,
    ``n_orphan_keys``, and min/max orphan key (rendered as string) for
    triage. ``on`` columns must exist on both sides with the same names."""
    keys = list(on)
    child_keys = child.groupBy(*keys).agg(F.count(F.lit(1)).alias("__rows"))
    parent_keys = parent.select(*keys).dropDuplicates(keys)
    orphans = child_keys.join(parent_keys, on=keys, how="left_anti")
    return orphans.agg(
        F.coalesce(F.sum("__rows"), F.lit(0)).cast("long")
         .alias("n_orphan_rows"),
        F.count(F.lit(1)).cast("long").alias("n_orphan_keys"),
        F.min(_key_repr(keys)).alias("min_orphan_key"),
        F.max(_key_repr(keys)).alias("max_orphan_key"))


def uniqueness_check(df: DataFrame, keys: Sequence[str]) -> DataFrame:
    """Candidate-key multiplicity profile: one row with ``n_rows``,
    ``n_keys``, ``n_dup_keys`` (keys seen more than once), ``n_dup_rows``
    (rows beyond the first per key), and ``max_multiplicity``."""
    per_key = df.groupBy(*list(keys)).agg(F.count(F.lit(1)).alias("__cnt"))
    return per_key.agg(
        F.sum("__cnt").cast("long").alias("n_rows"),
        F.count(F.lit(1)).cast("long").alias("n_keys"),
        F.sum(F.when(F.col("__cnt") > 1, 1).otherwise(0)).cast("long")
         .alias("n_dup_keys"),
        (F.sum("__cnt") - F.count(F.lit(1))).cast("long")
         .alias("n_dup_rows"),
        F.max("__cnt").cast("long").alias("max_multiplicity"))


def reconcile_header_detail(header: DataFrame, detail: DataFrame,
                            on: Sequence[str], *, header_total: Column,
                            detail_amount: Column,
                            tolerance: int = 0) -> DataFrame:
    """Header-vs-detail monetary reconciliation: does each parent row's
    stored total equal the sum of its child rows, within ``tolerance``?

    Amount columns must be INTEGER-VALUED expressions (e.g. cents via
    ``F.round(price * 100).cast("long")``) — integer sums are exact and
    engine-order-independent, where a double sum's result depends on
    partition reduction order. One aggregation on the child + one equi-join
    on the key + one scalar rollup; returns a single row:
    (n_headers, n_matched, n_drifted, n_missing_detail, max_abs_drift).

    Headers with NO child rows count as ``n_missing_detail`` (never
    silently treated as drift-0 matches).
    """
    keys = list(on)
    d = detail.groupBy(*keys).agg(
        F.sum(detail_amount).cast("long").alias("__detail_total"))
    h = header.select(*keys, header_total.cast("long").alias("__head_total"))
    joined = h.join(d, on=keys, how="left")
    drift = F.abs(F.col("__head_total") - F.col("__detail_total"))
    return joined.agg(
        F.count(F.lit(1)).cast("long").alias("n_headers"),
        F.sum(F.when(drift <= tolerance, 1).otherwise(0)).cast("long")
         .alias("n_matched"),
        F.sum(F.when(drift > tolerance, 1).otherwise(0)).cast("long")
         .alias("n_drifted"),
        F.sum(F.when(F.col("__detail_total").isNull(), 1).otherwise(0))
         .cast("long").alias("n_missing_detail"),
        F.coalesce(F.max(drift), F.lit(0)).cast("long")
         .alias("max_abs_drift"))


def sequence_contiguity(df: DataFrame, group: str, seq_col: str,
                        *, start_at: int = 1) -> DataFrame:
    """Per-group sequence-number audit: within each ``group``, ``seq_col``
    must be exactly ``start_at .. start_at+n-1`` (line numbers, turn
    indexes, page sequences). One keyed aggregation classifies every group
    from four scalars (count, distinct, min, max); a second 1-row rollup
    summarizes: (n_groups, n_clean, n_with_dups, n_with_gaps,
    n_bad_start). A group can appear in several defect columns (dup AND
    gap); ``n_clean`` counts groups with none.

    Never sorts: gaps fall out of ``max - min + 1 != n_distinct``,
    duplicates out of ``count != n_distinct`` — the check costs one
    exchange of (group, 4 longs).
    """
    per = (df.groupBy(group)
           .agg(F.count(F.lit(1)).alias("__n"),
                F.count_distinct(F.col(seq_col)).alias("__nd"),
                F.min(seq_col).cast("long").alias("__mn"),
                F.max(seq_col).cast("long").alias("__mx")))
    dup = F.col("__n") != F.col("__nd")
    gap = (F.col("__mx") - F.col("__mn") + 1) != F.col("__nd")
    bad0 = F.col("__mn") != start_at
    return per.agg(
        F.count(F.lit(1)).cast("long").alias("n_groups"),
        F.sum(F.when(~dup & ~gap & ~bad0, 1).otherwise(0)).cast("long")
         .alias("n_clean"),
        F.sum(F.when(dup, 1).otherwise(0)).cast("long").alias("n_with_dups"),
        F.sum(F.when(gap, 1).otherwise(0)).cast("long").alias("n_with_gaps"),
        F.sum(F.when(bad0, 1).otherwise(0)).cast("long")
         .alias("n_bad_start"))


def partition_completeness(df: DataFrame, date_col: Column) -> DataFrame:
    """Calendar-gap detection for a date-partitioned feed: which days
    between the observed min and max have NO rows at all. A per-day count
    validator misses days that are absent from BOTH sides; this one
    generates the expected calendar with ``sequence()`` (driver-free — the
    1-row bounds aggregate explodes JVM-side) and anti-joins the observed
    distinct days. Returns one row: (n_expected_days, n_actual_days,
    n_missing_days, min/max missing day as 'YYYY-MM-DD' strings).

    Scale: the heavy input collapses to distinct days immediately (map-side
    partial distinct), so every join/agg here runs over ~days rows.
    """
    # checkpoint the tiny distinct-days table: it feeds the bounds, the
    # anti-join, and the count branches — without materialization each
    # branch re-scans the RAW input (7 scans measured)
    days = (df.select(date_col.cast("date").alias("d")).distinct()
            .localCheckpoint())
    bounds = days.agg(F.min("d").alias("lo"), F.max("d").alias("hi"))
    expected = bounds.select(
        F.explode(F.expr("sequence(lo, hi, interval 1 day)")).alias("d"))
    missing = expected.join(days, "d", "left_anti")
    return (expected.agg(F.count(F.lit(1)).cast("long")
                         .alias("n_expected_days"))
            .crossJoin(days.agg(F.count(F.lit(1)).cast("long")
                                .alias("n_actual_days")))
            .crossJoin(missing.agg(
                F.count(F.lit(1)).cast("long").alias("n_missing_days"),
                F.min(F.col("d").cast("string")).alias("min_missing_day"),
                F.max(F.col("d").cast("string")).alias("max_missing_day"))))


def duplicate_examples(df: DataFrame, keys: Sequence[str],
                       top_n: int = 10) -> DataFrame:
    """The ``top_n`` most-duplicated key values as (key, multiplicity),
    multiplicity > 1 only; deterministic order (count desc, key asc)."""
    ks = list(keys)
    return (df.groupBy(*ks)
            .agg(F.count(F.lit(1)).alias("multiplicity"))
            .where(F.col("multiplicity") > 1)
            .select(_key_repr(ks).alias("key"), "multiplicity")
            .orderBy(F.col("multiplicity").desc(), F.col("key").asc())
            .limit(top_n))
