"""Incremental view maintenance: apply a CDC changelog to a materialized
aggregate without recomputing it from the base table.

The maintenance identity for distributive aggregates (COUNT, SUM):

    agg'(key) = agg(key) + delta(key)
    delta     = changelog aggregated with signed contributions
                (+1/+x for inserts, -1/-x for deletes; an update is a
                delete + insert pair)

so refreshing a 100 TB-table's aggregate costs one pass over the (tiny)
changelog plus a keyed outer join against the aggregate — never a base
scan. This is the validator's cheapest recurring-revalidation tier: after
the first full run, per-window re-checks fold the day's changes into the
stored tallies (the same idea as ``operators/digest.incremental_validate``,
at aggregate rather than range granularity).

Measures must be integers (or exact decimals) for the identity to be exact:
float SUMs are aggregation-order-dependent, so a float view maintained
incrementally drifts from its recomputation even on one engine. Callers
pass e.g. ``floor(value)`` or cents.

Consistency is checked, not assumed: a delete for a key the aggregate does
not hold (or more deletes than rows) drives a count negative and raises
mid-plan rather than silently corrupting the view.

Reference parity: no analogue (the reference always revalidates ranges from
scratch; SURVEY.md §2.10).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["base_agg", "delta_agg", "apply_changes"]

def base_agg(df: DataFrame, keys: list[str], measure) -> DataFrame:
    """(keys..., n_rows, m_sum): the materialized view this module maintains.
    ``measure`` must be an integer-typed Column (see module docstring)."""
    return df.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(measure).cast("bigint").alias("m_sum"))


def delta_agg(changes: DataFrame, keys: list[str], measure) -> DataFrame:
    """Signed per-key deltas from a changelog with an ``op`` column
    ('I' insert / 'D' delete; anything else raises at execution)."""
    sign = (F.when(F.col("op") == "I", F.lit(1))
            .when(F.col("op") == "D", F.lit(-1))
            .otherwise(F.raise_error(
                F.concat(F.lit("ivm: unknown op "), F.col("op")))))
    return changes.groupBy(*keys).agg(
        F.sum(sign).cast("bigint").alias("d_rows"),
        F.sum(sign * measure).cast("bigint").alias("d_sum"))


def apply_changes(view: DataFrame, changes: DataFrame, keys: list[str],
                  measure) -> DataFrame:
    """Maintained view: ``view`` (from :func:`base_agg`) + ``changes``.

    Keys whose count reaches zero drop out (their sum is zero too by the
    identity); a negative count means the changelog deletes rows the view
    never held — raised loudly. NULL measures are consistent on both paths:
    COUNT counts the row, SUM skips the NULL, on base and delta alike.
    """
    d = delta_agg(changes, keys, measure)
    merged = view.join(d, keys, "full_outer")
    n = (F.coalesce(F.col("n_rows"), F.lit(0))
         + F.coalesce(F.col("d_rows"), F.lit(0)))
    m = (F.coalesce(F.col("m_sum"), F.lit(0))
         + F.coalesce(F.col("d_sum"), F.lit(0)))
    checked = F.when(
        n < 0, F.raise_error(F.lit("ivm: changelog deletes unknown rows"))
    ).otherwise(n)
    return (merged.select(*keys, checked.alias("n_rows"),
                          m.cast("bigint").alias("m_sum"))
            .where(F.col("n_rows") > 0))
