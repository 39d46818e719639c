"""Constant-size distinct-count sketching: K-minimum-values (KMV).

``COUNT(DISTINCT x)`` at 10^12 rows shuffles every distinct value; Spark's
``approx_count_distinct`` (HyperLogLog++) fixes the memory but its register
layout is engine-private, so its answer cannot be cross-checked against
another engine. KMV (Bar-Yossef et al. 2002) is the sketch that CAN: keep
the k smallest DISTINCT hash values of the column; the k-th smallest hash
``h_k`` estimates the distinct count as ``(k-1) * HASH_SPACE / h_k``.
Because "k smallest distinct hashes of a deterministic hash function" is a
pure function of the data — independent of partitioning, ordering, or
engine — a DuckDB oracle computes the IDENTICAL sketch and estimate, which
is why the demo pins the ``portable_hash60`` family.

Scale shape: phase 1 is a NARROW per-partition reduce (mapInPandas keeps a
running k-smallest-distinct frame per partition — O(k + batch) memory, no
shuffle), so the only exchange carries <= partitions * k longs into the
single-row final fold. That is the same bounded-exchange pattern as
``ann.topk_per_query``, specialized for distinctness. KMV sketches are also
mergeable (union the hash sets, re-take the k smallest), so per-partition /
per-day sketches can be rolled up without touching raw data.

Estimator arithmetic is done in IEEE double with values that are exact in
a 53-bit mantissa ((k-1) * 2^60 for k <= 2^8 is a small-mantissa multiple
of a power of two), so Spark and DuckDB produce the bit-identical double.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from spanner_data_validator_spark.functions.hashing import (
    PORTABLE_HASH_BITS,
    portable_hash60,
    portable_hash60_sql,
)

HASH_SPACE = float(2 ** PORTABLE_HASH_BITS)


def kmv_min_hashes(df: DataFrame, col: Column, k: int) -> DataFrame:
    """k smallest distinct ``portable_hash60`` values of ``col``.

    Output: single row ``(hs: array<long>)`` sorted ascending, length
    ``min(k, distinct_count)``. Phase 1 never shuffles: each input
    partition reduces to at most k hashes inside mapInPandas. Phase 2
    folds <= partitions * k rows into one ``slice(array_sort(collect_set))``
    on a single reducer.
    """
    hashed = df.select(portable_hash60(col).alias("h"))
    schema = hashed.schema

    def reduce_part(batches):
        import pandas as pd

        best = None
        for pdf in batches:
            if pdf.empty:
                continue
            cur = pdf if best is None else pd.concat((best, pdf))
            best = cur.drop_duplicates("h").nsmallest(k, "h")
        if best is not None:
            yield best

    partial = hashed.mapInPandas(reduce_part, schema)
    return partial.agg(
        F.slice(F.array_sort(F.collect_set("h")), 1, k).alias("hs"))


def kmv_distinct(df: DataFrame, col: Column, k: int) -> DataFrame:
    """One-row KMV distinct estimate: (k_used, kth_hash, est_distinct).

    If fewer than k distinct values exist the sketch IS the exact distinct
    set, and the estimate falls back to its size (the standard KMV small-set
    rule) — so the operator is exact below k and ~1/sqrt(k) relative error
    above it.
    """
    sk = kmv_min_hashes(df, col, k)
    n = F.size("hs")
    kth = F.element_at("hs", -1)
    est = F.when(
        n < F.lit(k), n.cast("double")
    ).otherwise(
        F.floor((F.lit(k - 1) * F.lit(HASH_SPACE)) / kth.cast("double"))
        .cast("double")
    )
    return sk.select(
        n.cast("int").alias("k_used"),
        kth.alias("kth_hash"),
        est.alias("est_distinct"),
    )


def kmv_distinct_sql(source_sql: str, expr: str, k: int) -> str:
    """DuckDB rendering of :func:`kmv_distinct` — identical hash family,
    identical small-set fallback, identical double arithmetic."""
    h = portable_hash60_sql(expr)
    return f"""
WITH hs AS (
  SELECT DISTINCT {h} AS h FROM ({source_sql}) ORDER BY h LIMIT {k}
),
agg AS (
  SELECT CAST(count(*) AS INT) AS k_used, max(h) AS kth_hash FROM hs
)
SELECT k_used, kth_hash,
       CASE WHEN k_used < {k} THEN CAST(k_used AS DOUBLE)
            ELSE CAST(floor(({k} - 1) * {HASH_SPACE!r} / CAST(kth_hash AS DOUBLE)) AS DOUBLE)
       END AS est_distinct
FROM agg
"""


def kmv_min_hashes_by_group(df: DataFrame, group: str, col: Column,
                            k: int) -> DataFrame:
    """Per-group k smallest distinct hashes: (g, hs: array<long>).

    Same bounded-exchange shape as the global sketch, per group: phase 1
    keeps a k-smallest-distinct frame PER (partition, group) inside
    mapInPandas, so the exchange carries <= partitions * groups * k longs —
    the right shape when groups << rows (per-source / per-day cardinality
    dashboards over 10^12 rows).
    """
    hashed = df.select(F.col(group).alias("g"), portable_hash60(col).alias("h"))
    schema = hashed.schema

    def reduce_part(batches):
        import pandas as pd

        best = None
        for pdf in batches:
            if pdf.empty:
                continue
            cur = pdf if best is None else pd.concat((best, pdf))
            # dropna=False: a NULL group key is still a group — pandas'
            # default would silently discard every NULL-keyed row while the
            # Spark-side final groupBy (and any SQL oracle) keeps the group
            best = (cur.drop_duplicates(["g", "h"])
                       .sort_values("h")
                       .groupby("g", sort=False, dropna=False).head(k))
        if best is not None:
            yield best

    partial = hashed.mapInPandas(reduce_part, schema)
    return partial.groupBy("g").agg(
        F.slice(F.array_sort(F.collect_set("h")), 1, k).alias("hs"))


def kmv_distinct_by_group(df: DataFrame, group: str, col: Column,
                          k: int) -> DataFrame:
    """Per-group KMV estimate: (g, k_used, kth_hash, est_distinct) with the
    same exact-below-k fallback and double arithmetic as the global form."""
    sk = kmv_min_hashes_by_group(df, group, col, k)
    n = F.size("hs")
    kth = F.element_at("hs", -1)
    est = F.when(
        n < F.lit(k), n.cast("double")
    ).otherwise(
        F.floor((F.lit(k - 1) * F.lit(HASH_SPACE)) / kth.cast("double"))
        .cast("double")
    )
    return sk.select(
        F.col("g"),
        n.cast("int").alias("k_used"),
        kth.alias("kth_hash"),
        est.alias("est_distinct"),
    )


# ---------------------------------------------------------------------------
# Count-Min Sketch: bounded-state frequency estimation
# ---------------------------------------------------------------------------
#
# Per-key exact counts over a 10^12-row stream hold state per DISTINCT key —
# unbounded for open key domains (users, terms, IPs). A Count-Min sketch
# (Cormode & Muthukrishnan 2005) caps the state at depth × width counters per
# window REGARDLESS of key cardinality: each row increments one bucket per
# depth (bucket_d = hash_d(key) mod width), and a key's estimate is the MIN
# of its buckets — always >= the true count, over by at most ~ N/width with
# probability 1 - 2^-depth. Like KMV, the sketch is a pure deterministic
# function of the multiset + hash family, so a DuckDB oracle rebuilds the
# identical table and identical estimates; and it is MERGEABLE (bucket-wise
# sum), so per-partition/per-window sketches roll up without raw data.
#
# Streaming shape: groupBy(window, d, bucket).count() — ONE windowed
# aggregation whose state is open_windows × depth × width rows of ~20 B,
# where the exact per-key count (stream_trending_terms) holds a row per
# (window, key). At width 2^16, depth 4 that is fixed ~4 MB per open window
# against potentially billions of keys.


def cms_bucket(key: Column, d: int, width: int, seed: int = 0) -> Column:
    """Row d's bucket for ``key``: portable_hash60(key, seed + d) mod width
    (the hash is nonnegative, so % is identical in Spark and DuckDB)."""
    return (portable_hash60(key, seed + d) % F.lit(width)).cast("int")


def cms_bucket_sql(expr: str, d: int, width: int, seed: int = 0) -> str:
    return f"({portable_hash60_sql(expr, seed + d)} % {width})"


def cms_build(df: DataFrame, key: Column, *, depth: int, width: int,
              seed: int = 0,
              extra_group_cols: list[str] | None = None) -> DataFrame:
    """Sketch table ``(d int, bucket int, n long)`` (+ extra group cols,
    e.g. the event-time window for streaming builds).

    The d-fan-out is one Generate (explode of a depth-length struct array);
    partial aggregation collapses it map-side, so the exchange carries at
    most partitions × groups × depth × width pre-aggregated rows.
    Zero-count buckets are simply absent (lookups coalesce to 0).
    """
    extra = extra_group_cols or []
    pairs = F.explode(F.array(*[
        F.struct(F.lit(d).alias("d"),
                 cms_bucket(key, d, width, seed).alias("bucket"))
        for d in range(depth)])).alias("p")
    return (df.select(*extra, pairs)
            .groupBy(*extra, F.col("p.d").alias("d"),
                     F.col("p.bucket").alias("bucket"))
            .agg(F.count(F.lit(1)).alias("n")))


def cms_lookup(cms: DataFrame, keys: DataFrame, key_col: str, *,
               depth: int, width: int, seed: int = 0,
               join_cols: list[str] | None = None) -> DataFrame:
    """Point estimates for ``keys``: (join_cols..., key, est) with
    est = min over d of the key's bucket count (0 when absent).

    ``join_cols`` aligns sketch slices (e.g. window_start_ms) present in
    BOTH the sketch and the key table. The join is broadcast-friendly: the
    sketch side is at most slices × depth × width rows by construction.
    """
    jc = join_cols or []
    probes = keys.select(
        *jc, F.col(key_col),
        F.explode(F.array(*[
            F.struct(F.lit(d).alias("d"),
                     cms_bucket(F.col(key_col), d, width, seed)
                     .alias("bucket"))
            for d in range(depth)])).alias("p")) \
        .select(*jc, key_col, F.col("p.d").alias("d"),
                F.col("p.bucket").alias("bucket"))
    joined = probes.join(cms, jc + ["d", "bucket"], "left") \
                   .withColumn("n", F.coalesce(F.col("n"), F.lit(0)))
    return (joined.groupBy(*jc, key_col)
            .agg(F.min("n").alias("est")))


def kmv_distinct_by_group_sql(source_sql: str, group_expr: str, expr: str,
                              k: int) -> str:
    """DuckDB rendering of :func:`kmv_distinct_by_group`."""
    h = portable_hash60_sql(expr)
    return f"""
WITH dh AS (
  SELECT DISTINCT {group_expr} AS g, {h} AS h FROM ({source_sql})
),
rk AS (
  SELECT g, h, row_number() OVER (PARTITION BY g ORDER BY h) AS rn FROM dh
),
agg AS (
  SELECT g, CAST(count(*) AS INT) AS k_used, max(h) AS kth_hash
  FROM rk WHERE rn <= {k} GROUP BY g
)
SELECT g, k_used, kth_hash,
       CASE WHEN k_used < {k} THEN CAST(k_used AS DOUBLE)
            ELSE CAST(floor(({k} - 1) * {HASH_SPACE!r} / CAST(kth_hash AS DOUBLE)) AS DOUBLE)
       END AS est_distinct
FROM agg
"""
