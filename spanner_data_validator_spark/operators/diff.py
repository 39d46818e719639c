"""Column-level drift attribution: for keys the validator classifies as
MISMATCH, *which columns* diverge — the debugging step after the
reference's row-level tallies.

The reference pipeline stops at MATCH/MISMATCH/SOURCE_ONLY/TARGET_ONLY
counts plus a conflicting-record feed of whole rows
(`JDBCToSpannerDVTWithHash.java`'s mismatch writers); the first question a
migration engineer then asks is "what actually differs — one timestamp
column everywhere, or everything?". ``column_diff`` answers it Spark-first:

* ONE keyed full-outer join of the projected payload columns (the same
  exchange shape as the classify join — at 10^12 rows this piggybacks on
  the validator's partitioning);
* per-column null-safe equality evaluated as pure codegen expressions into
  a compact ``diff_cols array<string>`` per changed key (no per-column
  shuffles, no unpivot of the wide table);
* ``column_drift_summary`` then explodes ONLY the changed keys' arrays —
  the exchange after the join carries one short array per drifted key, so
  a 0.1% drift rate means 0.1% of keys ever leave the join stage.

NULL semantics: a column counts as drifted when the two sides are not
null-safe-equal (``<=>``), so NULL→value and value→NULL transitions are
drift, NULL→NULL is not — matching the fingerprint normalization's
treatment of NULLs as a distinct serialized token
(functions/normalize.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

ADDED, REMOVED, CHANGED, UNCHANGED = "ADDED", "REMOVED", "CHANGED", "UNCHANGED"


def column_diff(src: DataFrame, tgt: DataFrame, key_cols: list[str],
                cols: list[str], *, include_unchanged: bool = False
                ) -> DataFrame:
    """Keyed snapshot delta with per-column attribution.

    Output: ``key_cols..., change, diff_cols array<string>`` where change is
    ADDED (key only in target), REMOVED (key only in source), CHANGED (both
    sides, >=1 column not null-safe-equal) or UNCHANGED (suppressed unless
    ``include_unchanged``). ``diff_cols`` lists the drifted column names in
    ``cols`` order (empty for ADDED/REMOVED — the whole row is the diff).

    Both sides must be key-unique (run the validator's ``dedup_first``
    upstream otherwise — duplicate keys would fabricate CHANGED rows).
    """
    if not cols:
        raise ValueError("cols must name at least one payload column")
    s = src.select(*key_cols,
                   F.lit(True).alias("__in_src"),
                   *[F.col(c).alias(f"__s_{c}") for c in cols])
    t = tgt.select(*key_cols,
                   F.lit(True).alias("__in_tgt"),
                   *[F.col(c).alias(f"__t_{c}") for c in cols])
    j = s.join(t, key_cols, "full_outer")

    drifted = [
        F.when(~F.col(f"__s_{c}").eqNullSafe(F.col(f"__t_{c}")), F.lit(c))
        for c in cols
    ]
    diff_cols = F.filter(F.array(*drifted), lambda x: x.isNotNull())
    change = (
        F.when(F.col("__in_src").isNull(), F.lit(ADDED))
         .when(F.col("__in_tgt").isNull(), F.lit(REMOVED))
         .when(F.size(diff_cols) > 0, F.lit(CHANGED))
         .otherwise(F.lit(UNCHANGED)))
    out = j.select(
        *key_cols, change.alias("change"),
        F.when(change == CHANGED, diff_cols)
         .otherwise(F.array().cast("array<string>")).alias("diff_cols"))
    if not include_unchanged:
        out = out.where(F.col("change") != UNCHANGED)
    return out


def column_drift_summary(diff: DataFrame) -> DataFrame:
    """Per-column drift counts from a :func:`column_diff` result:
    ``(column, n_changed)`` — only CHANGED keys' short arrays are exploded,
    so the exchange is proportional to drifted keys, not table size."""
    return (diff.where(F.col("change") == CHANGED)
            .select(F.explode("diff_cols").alias("column"))
            .groupBy("column")
            .agg(F.count(F.lit(1)).alias("n_changed")))


def first_running_divergence(src: DataFrame, tgt: DataFrame, *, key: str,
                             order: list[str],
                             amount: Column) -> DataFrame:
    """Running-balance reconciliation: per key, the EARLIEST position at
    which the two sides' cumulative sums diverge (a ledger whose totals
    reconcile can still hide a dropped+compensating pair — the running
    sum pinpoints the first bad row). Returns one row per diverged key:
    ``(key, first_rn, src_cum, tgt_cum, n_diverged)`` with NULL cum on a
    side that ran out of rows.

    Each side is one key-partitioned ordered window (row_number +
    running sum); the comparison is an equi-join on (key, rn). Cumulative
    sums must be INTEGER (pass cents, not doubles) — float running sums
    diverge across engines per accumulation order. The join output is
    unique per (key, rn), so min(struct(rn, ...)) picks the earliest
    divergence deterministically without a second pass.
    """
    def side(df: DataFrame, cum_name: str) -> DataFrame:
        w = Window.partitionBy(key).orderBy(*order)
        return (df.select(F.col(key), *[F.col(c) for c in order],
                          amount.alias("__a"))
                .select(F.col(key),
                        F.row_number().over(w).cast("long").alias("rn"),
                        F.sum("__a").over(w).alias(cum_name)))

    j = side(src, "src_cum").join(side(tgt, "tgt_cum"), [key, "rn"],
                                  "full_outer")
    div = j.where(~F.col("src_cum").eqNullSafe(F.col("tgt_cum")))
    picked = (div.groupBy(key)
              .agg(F.min(F.struct(F.col("rn"),
                                  F.col("src_cum"),
                                  F.col("tgt_cum"))).alias("m"),
                   F.count(F.lit(1)).alias("n_diverged")))
    return picked.select(key, F.col("m.rn").alias("first_rn"),
                         F.col("m.src_cum").alias("src_cum"),
                         F.col("m.tgt_cum").alias("tgt_cum"),
                         "n_diverged")
