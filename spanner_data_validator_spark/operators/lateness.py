"""Out-of-orderness profiling and watermark recommendation.

The reference has no watermark concept (its Beam pipeline is a batch
run-loop; the closest device is the timestamp threshold filter,
``JDBCToSpannerDVTWithHash.java`` timestamp-cutoff handling re-expressed
in ``operators/comparator.apply_timestamp_threshold``). Our streaming
tier does, and the single most consequential deployment knob the north
rule leaves to the operator is the watermark delay: too small silently
drops late rows from the stream-stream join, too large inflates the
state store by ``rate x watermark`` keys (BENCH.md "State store choice"
does that arithmetic). This module turns the choice into a measurement:

* ``arrival_lag`` — per-row event-time lag behind the arrival-order
  high-water mark: ``lag_us = max(ts over arrival order so far) - ts``.
  A row can be dropped by a watermark of delay ``d`` only if its lag
  exceeds ``d`` (Spark advances the watermark from the max observed
  event time), so the lag distribution IS the drop-risk curve.
* ``watermark_recommendation`` — the smallest whole-second watermark
  that would have retained at least each requested percentile of the
  corpus, from an exact integer histogram of the lags.

Scale (10^12 rows): the running max over the global arrival order is the
same unshardable-Window shape as ``stats.ks_two_sample``'s cumsum, and
gets the same treatment — a distributed PREFIX MAX. Arrival-range
buckets (monotone along the arrival order) give per-bucket event-time
maxima (tiny); an exclusive scan over those maxima (tiny, single-task by
design — it sees ``n_buckets`` rows, never row-scale data) broadcasts a
carry-in per bucket; the within-bucket running max runs under
``Window.partitionBy(bucket)``. Every row-scale stage is parallel. The
histogram then reduces the corpus to at most ``max_lag_s`` rows before
the (tiny) cumulative scan that answers the percentile queries.

Determinism / oracle: max is associative and insensitive to bucket
boundaries, lags are exact integer microseconds, the percentile rank is
``ceil(pct * n / 100)`` in pure BIGINT arithmetic (``(pct*n + 99) div
100``) — no float percentile edges (the ``quantiles_by_rank``
representability trap), so a single-window DuckDB oracle matches
bit-for-bit.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_DEFAULT_BUCKETS = 1024


def arrival_lag(df: DataFrame, arrival: Column, ts: Column, *,
                n_buckets: int = _DEFAULT_BUCKETS,
                out_col: str = "lag_us",
                group: str | None = None) -> DataFrame:
    """Input columns + ``lag_us`` (BIGINT >= 0), distributed prefix-max.

    ``arrival`` must be a numeric column that is UNIQUE and increases
    along the physical arrival order (an ingest sequence number, a
    monotonically-assigned event id, a file drop index). ``ts`` is the
    event-time timestamp. ``lag_us = 0`` marks in-order rows; a positive
    lag is how far the row trailed the newest event time already seen
    when it arrived — i.e. the minimum watermark delay that keeps it.

    ``group`` scopes EVERYTHING per group — each group has its own
    arrival order, frontier and lag (a Kafka partition, a source shard:
    disorder within a stream, not across independent streams). The
    grouped form has no single-task stage at all: the bucket-maxima scan
    partitions by group.
    """
    # events.ts arrives TIMESTAMP_NTZ from this corpus; unix_micros REJECTS
    # NTZ (CLAUDE.md session-5 trap). The cast goes through the session tz,
    # which session.get_spark pins to UTC — equal to DuckDB epoch_us(naive).
    us = F.unix_micros(ts.cast("timestamp"))
    a = arrival.cast("double")
    if group is None:
        stats = df.agg(F.min(a).alias("__lo"), F.max(a).alias("__hi"))
        b = df.crossJoin(F.broadcast(stats))
    else:
        stats = df.groupBy(group).agg(F.min(a).alias("__lo"),
                                      F.max(a).alias("__hi"))
        b = df.join(stats, group)  # AQE broadcasts when groups are few
    span = F.col("__hi") - F.col("__lo")
    # linear arrival-range bin: monotone non-decreasing along the arrival
    # order, so each bucket owns a contiguous arrival span and a prefix
    # max over bucket maxima is a carry-in (same shape as
    # layout.global_row_number's offset scan).
    bin_ = F.when(span <= 0, F.lit(0)).otherwise(
        F.least(F.lit(n_buckets - 1),
                F.floor((a - F.col("__lo")) / span
                        * F.lit(float(n_buckets))))).cast("long")
    b = b.withColumn("__bk", bin_).withColumn("__us", us).drop("__lo", "__hi")

    gcols = [] if group is None else [group]
    per = b.groupBy(*gcols, "__bk").agg(F.max("__us").alias("__mx"))
    # exclusive scan over <= n_buckets subtotal rows per group — in the
    # global form the one single-task window, intentional (bucket maxima,
    # never rows); the grouped form partitions it away entirely.
    wx = (Window.partitionBy(*gcols).orderBy("__bk")
          .rowsBetween(Window.unboundedPreceding, -1))
    carry = per.select(*gcols, "__bk",
                       F.max("__mx").over(wx).alias("__carry"))

    w = (Window.partitionBy(*gcols, "__bk").orderBy(arrival)
         .rowsBetween(Window.unboundedPreceding, 0))
    run = F.greatest(F.max("__us").over(w),
                     F.coalesce(F.col("__carry"), F.col("__us")))
    joined = (b.join(F.broadcast(carry), [*gcols, "__bk"]) if group is None
              else b.join(carry, [*gcols, "__bk"]))
    return (joined
            .withColumn(out_col, (run - F.col("__us")).cast("long"))
            .drop("__bk", "__us", "__carry"))


def lag_histogram(lags: DataFrame, *, lag_col: str = "lag_us") -> DataFrame:
    """(lag_s BIGINT, n BIGINT): ceil-second lag histogram — the
    constant-size summary the percentile queries read. ``lag_s`` is the
    smallest whole-second watermark delay that RETAINS the row
    (``ceil(lag_us / 1e6)``; an exactly-in-order row needs 0). Pure
    BIGINT arithmetic on both engines — no CAST-rounding trap."""
    lag_s = F.expr(f"({lag_col} + 999999) div 1000000")
    return (lags.groupBy(lag_s.alias("lag_s"))
            .agg(F.count(F.lit(1)).alias("n")))


def watermark_recommendation(df: DataFrame, arrival: Column, ts: Column, *,
                             pcts: Sequence[int] = (50, 95, 99, 100),
                             n_buckets: int = _DEFAULT_BUCKETS) -> DataFrame:
    """(pct INT, watermark_s BIGINT, rows_within BIGINT) per requested
    percentile: the smallest whole-second watermark delay retaining at
    least ``ceil(pct*n/100)`` rows, and the exact row count it retains.

    ``pcts`` are integer percents (exact BIGINT rank arithmetic; float
    fractions are the cross-engine representability trap CLAUDE.md
    catalogs). 100 gives the lossless watermark (max lag, rounded up to
    the next whole second unless already exact).
    """
    for p in pcts:
        if not (isinstance(p, int) and 1 <= p <= 100):
            raise ValueError(f"pcts must be integers in [1,100], got {p!r}")
    lags = arrival_lag(df, arrival, ts, n_buckets=n_buckets)
    hist = lag_histogram(lags)
    n_total = hist.agg(F.sum("n").alias("__n"))
    cum = hist.select(
        "lag_s", "n").withColumn(
        "cum_n", F.sum("n").over(
            Window.orderBy("lag_s")
            .rowsBetween(Window.unboundedPreceding, 0)))
    p_df = lags.sparkSession.createDataFrame(
        [(int(p),) for p in sorted(set(pcts))], "pct int")
    j = (p_df.crossJoin(F.broadcast(n_total))
         .join(F.broadcast(cum),
               F.col("cum_n") >= F.expr("(pct * __n + 99) div 100"))
         .withColumn("__rk", F.row_number().over(
             Window.partitionBy("pct").orderBy("lag_s"))))
    return (j.where(F.col("__rk") == 1)
            .select("pct", F.col("lag_s").cast("long").alias("watermark_s"),
                    F.col("cum_n").cast("long").alias("rows_within"))
            .orderBy("pct"))


def watermark_recommendation_sql(table_sql: str, arrival_expr: str,
                                 ts_expr: str,
                                 pcts: Sequence[int] = (50, 95, 99, 100)) -> str:
    """The DuckDB oracle twin of :func:`watermark_recommendation`:
    a single running-max window over the arrival order (fine at oracle
    scale), then the identical integer histogram + ceil-rank selection.
    ``table_sql`` must yield the input relation; expressions are DuckDB
    SQL over it. Column names/types match the Spark side exactly.
    """
    values = ", ".join(f"({int(p)})" for p in sorted(set(pcts)))
    return f"""
WITH src AS ({table_sql}),
lag AS (
  SELECT epoch_us({ts_expr}) AS us,
         max(epoch_us({ts_expr})) OVER (
           ORDER BY {arrival_expr}
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run_us
  FROM src
),
h AS (
  SELECT (run_us - us + 999999) // 1000000 AS lag_s, count(*) AS n
  FROM lag GROUP BY 1
),
cum AS (
  SELECT lag_s, sum(n) OVER (ORDER BY lag_s
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_n
  FROM h
),
tot AS (SELECT sum(n) AS n_total FROM h),
p(pct) AS (VALUES {values}),
hit AS (
  SELECT p.pct, c.lag_s, c.cum_n,
         row_number() OVER (PARTITION BY p.pct ORDER BY c.lag_s) AS rk
  FROM p CROSS JOIN tot t JOIN cum c
    ON c.cum_n >= (p.pct * t.n_total + 99) // 100
)
SELECT CAST(pct AS INT) AS pct,
       CAST(lag_s AS BIGINT) AS watermark_s,
       CAST(cum_n AS BIGINT) AS rows_within
FROM hit WHERE rk = 1 ORDER BY pct
"""


def watermark_recommendation_by(df: DataFrame, group: str, arrival: Column,
                                ts: Column, *,
                                pcts: Sequence[int] = (50, 95, 99, 100),
                                n_buckets: int = _DEFAULT_BUCKETS
                                ) -> DataFrame:
    """Per-group :func:`watermark_recommendation` —
    ``(group, pct, watermark_s, rows_within)``.

    One watermark per SOURCE is how multi-tenant ingestion is actually
    tuned (a tidy shard shouldn't pay a laggard's state retention; Spark
    applies the max across a union, so per-group numbers tell you which
    source to fix rather than which global delay to swallow). Lags are
    per-group (own arrival order, own frontier); every stage partitions
    by group — no single-task window anywhere.
    """
    for p in pcts:
        if not (isinstance(p, int) and 1 <= p <= 100):
            raise ValueError(f"pcts must be integers in [1,100], got {p!r}")
    lags = arrival_lag(df, arrival, ts, n_buckets=n_buckets, group=group)
    lag_s = F.expr("(lag_us + 999999) div 1000000")
    hist = (lags.groupBy(group, lag_s.alias("lag_s"))
            .agg(F.count(F.lit(1)).alias("n")))
    totals = hist.groupBy(group).agg(F.sum("n").alias("__n"))
    cum = hist.withColumn(
        "cum_n", F.sum("n").over(
            Window.partitionBy(group).orderBy("lag_s")
            .rowsBetween(Window.unboundedPreceding, 0)))
    p_df = df.sparkSession.createDataFrame(
        df.sparkSession.sparkContext.parallelize(
            [(int(p),) for p in sorted(set(pcts))], 1), "pct int")
    j = (cum.join(totals, group)
         .crossJoin(F.broadcast(p_df))
         .where(F.col("cum_n") >= F.expr("(pct * __n + 99) div 100"))
         .withColumn("__rk", F.row_number().over(
             Window.partitionBy(group, "pct").orderBy("lag_s"))))
    return (j.where(F.col("__rk") == 1)
            .select(group, "pct",
                    F.col("lag_s").cast("long").alias("watermark_s"),
                    F.col("cum_n").cast("long").alias("rows_within"))
            .orderBy(group, "pct"))
