"""As-of (point-in-time) join — the temporal operator Spark lacks natively.

``asof_join`` attaches to each left row the most recent right row (by
timestamp, backward-inclusive) with the same key: the primitive behind
point-in-time validation — checking a replica read / CDC-materialized row
against the version the source table held AT that row's timestamp, rather
than against the latest state (the reference validates only current state;
this extends its classify semantics along the time axis).

Spark-first plan (no per-row Python, no range join, no cross product):

1. Union the two sides into one tagged frame — right rows carry their
   payload in a nullable struct, left rows carry theirs.
2. One hash exchange by key, one in-partition sort by (ts, tag) — right
   rows sort BEFORE left rows at equal timestamps, making the match
   backward-INCLUSIVE.
3. ``last(payload, ignorenulls=True)`` over rows UNBOUNDED PRECEDING..CURRENT
   carries the latest right version forward; left rows then project it.

Cost: exactly ONE shuffle of |L| + |R| rows keyed by the join key, then a
linear scan — the same shape as a sort-merge join, with no explosion on
version-dense keys (a naive range join would emit |reads| x |versions| per
key before ranking). Hot keys concentrate in one partition like any keyed
window; at 10^12-row scale split the timeline by coarse time-bucket first
(validate each bucket independently, carrying only the last version of the
previous bucket across the boundary).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def asof_join(left: DataFrame, right: DataFrame, key_cols: list[str],
              *, left_ts: str = "ts", right_ts: str = "ts",
              value_cols: list[str] | None = None,
              prefix: str = "asof_") -> DataFrame:
    """For each left row, the latest right row with the same key and
    ``right_ts <= left_ts`` (backward-inclusive as-of match).

    Output: every left column, plus one ``prefix``-ed column per
    ``value_cols`` entry (null when no right version precedes the left row).

    Right rows must be unique per (key, right_ts) — pre-collapse versions
    that share a commit timestamp (e.g. keep the last writer) or the carried
    version among ties is sort-order-dependent.
    """
    value_cols = value_cols or [
        c for c in right.columns if c not in key_cols and c != right_ts]
    lpay = F.struct(*[F.col(c) for c in left.columns]).alias("__l")
    l = left.select(*key_cols, F.col(left_ts).alias("__ts"),
                    F.lit(1).alias("__tag"), lpay,
                    F.lit(None).cast(
                        "struct<" + ",".join(
                            f"`{c}`:{right.schema[c].dataType.simpleString()}"
                            for c in value_cols) + ">").alias("__v"))
    r = right.select(*key_cols, F.col(right_ts).alias("__ts"),
                     F.lit(0).alias("__tag"),
                     F.lit(None).cast(l.schema["__l"].dataType).alias("__l"),
                     F.struct(*[F.col(c) for c in value_cols]).alias("__v"))
    from pyspark.sql import Window

    w = (Window.partitionBy(*key_cols).orderBy("__ts", "__tag")
               .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    carried = l.unionByName(r).withColumn(
        "__asof", F.last("__v", ignorenulls=True).over(w))
    return (carried.where(F.col("__tag") == 1)
            .select(*[F.col(f"__l.`{c}`").alias(c) for c in left.columns],
                    *[F.col(f"__asof.`{c}`").alias(f"{prefix}{c}")
                      for c in value_cols]))


def asof_validate(reads: DataFrame, versions: DataFrame, key_cols: list[str],
                  *, read_ts: str = "ts", version_ts: str = "ts",
                  observed_col: str, value_col: str) -> DataFrame:
    """Point-in-time validation: classify each replica read against the
    source version as of the read's timestamp.

    MATCH     — read value equals the as-of source value
    MISMATCH  — a source version existed but the values differ
    NO_SOURCE — no source version precedes the read (phantom read)

    Output: reads columns + (``asof_value``, ``status``).
    """
    joined = asof_join(reads, versions, key_cols,
                       left_ts=read_ts, right_ts=version_ts,
                       value_cols=[value_col], prefix="asof_")
    av = F.col(f"asof_{value_col}")
    status = (F.when(av.isNull(), "NO_SOURCE")
               .when(av == F.col(observed_col), "MATCH")
               .otherwise("MISMATCH"))
    return joined.withColumnRenamed(f"asof_{value_col}", "asof_value") \
                 .withColumn("status", status)
