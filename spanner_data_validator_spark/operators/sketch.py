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


# ---------------------------------------------------------------------------
# HyperLogLog with an engine-portable register layout
# ---------------------------------------------------------------------------
#
# Spark's approx_count_distinct is HLL++ with a private register encoding, so
# its answer cannot be recomputed by another engine. This is the same
# Flajolet et al. 2007 estimator over a layout every ANSI-ish engine can
# derive: h = portable_hash60(v); register = h & (m-1); rank = leading-zero
# count of the next W=50 bits + 1, computed EXACTLY via length(bin(x)) (no
# float log2 — both engines agree on binary string length, while
# floor(log2(2^k - 1)) can round up in IEEE double).
#
# Determinism across engines (the oracle contract):
#   * register/rank math is pure integer ops (mask, shift, bin-length);
#   * the harmonic sum  S = sum_j 2^(-M_j)  is accumulated as the SCALED
#     INTEGER sum_j 2^(W+1 - M_j) (<= m * 2^51 < 2^63, exact in BIGINT,
#     order-independent) and divided by 2^51 once at the end — a float sum
#     of powers of two would round differently under Spark's vs DuckDB's
#     aggregation order;
#   * alpha * m^2 is computed ONCE in Python and injected as the same
#     literal into both plans;
#   * the only libm call is ln() in the small-range correction; the final
#     estimate is rounded to 2 decimals to absorb a last-ulp divergence.
#
# Scale shape: a sketch is m registers regardless of cardinality; groupBy
# (keys, register) max(rank) is a partial-aggregating shuffle of <= m rows
# per key, and sketches MERGE by per-register max — per-partition / per-day
# rollups combine without touching raw data (demonstrated by the __ALL__ row
# of the registered query, which merges the per-type sketches instead of
# rescanning the input).

HLL_W = 50
_HLL_SCALE = 1 << (HLL_W + 1)  # 2^51


def hll_alpha_mm(m: int) -> float:
    """alpha_m * m^2 (Flajolet et al. 2007, m >= 64) — computed once in
    Python and injected as an identical literal into Spark AND the oracle."""
    return (0.7213 / (1.0 + 1.079 / m)) * m * m


def hll_reg_rho(value: Column, *, m: int = 256,
                seed: int = 7) -> tuple[Column, Column]:
    """The (register index, rank) column pair — exposed separately so
    STREAMING pipelines can group them under a time window (the batch path
    wraps them in :func:`hll_registers`)."""
    if m & (m - 1) or m < 64:
        raise ValueError("m must be a power of two >= 64")
    b = m.bit_length() - 1
    h = portable_hash60(value, seed)
    reg = h.bitwiseAND(F.lit(m - 1))
    rest = F.shiftright(h, b).bitwiseAND(F.lit((1 << HLL_W) - 1))
    bitlen = F.when(rest > 0, F.length(F.bin(rest))).otherwise(F.lit(0))
    rho = F.lit(HLL_W + 1) - bitlen
    return reg, rho


def hll_registers(df: DataFrame, group_cols: list[str], value: Column,
                  *, m: int = 256, seed: int = 7) -> DataFrame:
    """(group_cols..., reg, mj): the HLL register table, <= m rows per group.

    ``m`` must be a power of two (register index = low bits of the hash).
    The groupBy is partial-agg friendly (max), i.e. the map side already
    collapses to <= m rows per group per partition — this IS sketch
    mergeability, executed by Spark's two-phase aggregate.
    """
    reg, rho = hll_reg_rho(value, m=m, seed=seed)
    return (df.select(*group_cols, reg.alias("reg"), rho.alias("rho"))
            .groupBy(*group_cols, "reg").agg(F.max("rho").alias("mj")))


def hll_estimate_expr(nonempty: Column, s_num: Column,
                      *, m: int = 256) -> Column:
    """The estimator over (nonempty register count, scaled-integer harmonic
    numerator) — shared by the batch and streaming paths."""
    amm = hll_alpha_mm(m)
    v = (F.lit(m) - nonempty).cast("long")
    s_int = s_num + v * F.lit(_HLL_SCALE)
    s = s_int.cast("double") / F.lit(float(_HLL_SCALE))
    raw = F.lit(amm) / s
    return F.round(
        F.when((raw <= F.lit(2.5 * m)) & (v > 0),
               F.lit(float(m)) * F.log(F.lit(float(m)) / v.cast("double"))
               ).otherwise(raw), 2)


def hll_merge(regs: DataFrame, group_cols: list[str]) -> DataFrame:
    """Merge register tables down to ``group_cols`` by per-register max —
    the raw-data-free rollup (union of HLL sketches)."""
    return (regs.groupBy(*group_cols, "reg")
            .agg(F.max("mj").alias("mj")))


def hll_estimate(regs: DataFrame, group_cols: list[str],
                 *, m: int = 256) -> DataFrame:
    """(group_cols..., nonempty, hll_estimate) from a register table.

    Small-range correction (linear counting m*ln(m/V)) applies below
    2.5*m with empty registers, exactly as published; no large-range
    correction is needed in a 60-bit hash space.
    """
    agg = regs.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("nonempty"),
        # coalesce: a GLOBAL aggregate over zero rows yields s_num NULL,
        # which would poison the estimate to NULL — with 0 it flows into
        # linear counting as m*ln(m/m) = 0, the right empty-set answer
        F.coalesce(
            F.sum(F.pow(F.lit(2.0),
                        (F.lit(HLL_W + 1) - F.col("mj")).cast("double"))
                  .cast("long")), F.lit(0).cast("long")).alias("s_num"))
    return agg.select(*group_cols,
                      F.col("nonempty").cast("long").alias("nonempty"),
                      hll_estimate_expr(F.col("nonempty"), F.col("s_num"),
                                        m=m).alias("hll_estimate"))


def hll_registers_sql(source_sql: str, group_exprs: str, expr: str,
                      *, m: int = 256, seed: int = 7) -> str:
    """DuckDB rendering of :func:`hll_registers` (identical integer math)."""
    b = m.bit_length() - 1
    h = portable_hash60_sql(expr, seed)
    mask = (1 << HLL_W) - 1
    g = f"{group_exprs}, " if group_exprs else ""
    gb = f" GROUP BY {group_exprs}, reg" if group_exprs else " GROUP BY reg"
    return f"""
SELECT {g}reg, max({HLL_W + 1} - CASE WHEN rest > 0 THEN length(bin(rest)) ELSE 0 END) AS mj
FROM (
  SELECT {g}h & {m - 1} AS reg, (h >> {b}) & {mask} AS rest
  FROM (SELECT {g}{h} AS h FROM ({source_sql}))
){gb}
"""


def hll_estimate_sql(regs_sql: str, group_exprs: str, *, m: int = 256) -> str:
    """DuckDB rendering of :func:`hll_estimate` over a register-table SQL."""
    amm = hll_alpha_mm(m)
    g = f"{group_exprs}, " if group_exprs else ""
    gb = f" GROUP BY {group_exprs}" if group_exprs else ""
    return f"""
SELECT {g}CAST(nonempty AS BIGINT) AS nonempty,
       round(CASE WHEN {amm!r} / (CAST(s_num + ({m} - nonempty) * {_HLL_SCALE} AS DOUBLE) / {float(_HLL_SCALE)!r}) <= {2.5 * m!r}
                   AND nonempty < {m}
             THEN {float(m)!r} * ln({float(m)!r} / CAST({m} - nonempty AS DOUBLE))
             ELSE {amm!r} / (CAST(s_num + ({m} - nonempty) * {_HLL_SCALE} AS DOUBLE) / {float(_HLL_SCALE)!r})
             END, 2) AS hll_estimate
FROM (
  SELECT {g}count(*) AS nonempty,
         coalesce(SUM(CAST(power(2.0, CAST({HLL_W + 1} - mj AS DOUBLE))
                           AS BIGINT)), 0) AS s_num
  FROM ({regs_sql}){gb}
)
"""


# ---------------------------------------------------------------------------
# KMV set operations: union / intersection / Jaccard estimates from two
# constant-size sketches (Beyer et al. 2007)
# ---------------------------------------------------------------------------
#
# The KMV union sketch of A and B is the k smallest hashes of
# K(A) ∪ K(B) — computable from the two sketches alone. With
# M = that union sketch:
#   union_est  = standard KMV estimate on M (exact below k),
#   jaccard    = |{h in M : h in K(A) and h in K(B)}| / |M|,
#   inter_est  = jaccard * union_est.
# Everything is a pure function of the deterministic hash values, so a
# DuckDB oracle reproduces all three numbers from the same data. At scale
# this answers "how many users overlap between these two 10^12-row
# streams" from two k-long arrays instead of a distinct-join.


def kmv_set_ops(a: DataFrame, a_col: Column, b: DataFrame, b_col: Column,
                k: int) -> DataFrame:
    """One-row union/intersection/Jaccard estimate from two KMV sketches.

    Output: (k_used, union_est, jaccard_est, inter_est). Exact when both
    sides' distinct counts are below k (the sketches are then the full hash
    sets). The only exchange is the two bounded sketch folds — the sides
    are never joined row-for-row.
    """
    ka = kmv_min_hashes(a, a_col, k).select(F.col("hs").alias("ha"))
    kb = kmv_min_hashes(b, b_col, k).select(F.col("hs").alias("hb"))
    both = ka.crossJoin(kb)  # 1 row x 1 row
    m = F.slice(F.array_sort(F.array_union("ha", "hb")), 1, k)
    with_m = both.select("ha", "hb", m.alias("m"))
    k_used = F.size("m")
    kth = F.element_at("m", -1)
    union_est = F.when(
        k_used < F.lit(k), k_used.cast("double")
    ).otherwise(
        F.floor((F.lit(k - 1) * F.lit(HASH_SPACE)) / kth.cast("double"))
        .cast("double"))
    inter_in_m = F.size(F.filter(
        "m", lambda h: F.array_contains("ha", h) & F.array_contains("hb", h)))
    # guard the empty-union edge (both sides empty): 0/0 would be NULL
    jac = F.when(k_used > 0,
                 inter_in_m.cast("double") / k_used.cast("double"))            .otherwise(F.lit(0.0))
    return with_m.select(
        k_used.cast("int").alias("k_used"),
        union_est.alias("union_est"),
        F.round(jac, 6).alias("jaccard_est"),
        F.round(jac * union_est, 2).alias("inter_est"))


def kmv_set_ops_sql(source_a: str, expr_a: str, source_b: str, expr_b: str,
                    k: int) -> str:
    """DuckDB rendering of :func:`kmv_set_ops` (relational form of the same
    sketch math — identical hashes, identical estimates)."""
    ha = portable_hash60_sql(expr_a)
    hb = portable_hash60_sql(expr_b)
    return f"""
WITH ka AS (SELECT DISTINCT {ha} AS h FROM ({source_a}) ORDER BY h LIMIT {k}),
kb AS (SELECT DISTINCT {hb} AS h FROM ({source_b}) ORDER BY h LIMIT {k}),
m AS (SELECT h FROM (SELECT h FROM ka UNION SELECT h FROM kb) ORDER BY h LIMIT {k}),
st AS (
  SELECT CAST(count(*) AS INT) AS k_used, max(h) AS kth,
         CAST(sum(CASE WHEN h IN (SELECT h FROM ka)
                        AND h IN (SELECT h FROM kb) THEN 1 ELSE 0 END) AS INT)
           AS inter_in_m
  FROM m
)
SELECT k_used,
       CASE WHEN k_used < {k} THEN CAST(k_used AS DOUBLE)
            ELSE CAST(floor(({k} - 1) * {HASH_SPACE!r} / CAST(kth AS DOUBLE)) AS DOUBLE)
       END AS union_est,
       round(CAST(inter_in_m AS DOUBLE) / CAST(k_used AS DOUBLE), 6) AS jaccard_est,
       round((CAST(inter_in_m AS DOUBLE) / CAST(k_used AS DOUBLE)) *
             CASE WHEN k_used < {k} THEN CAST(k_used AS DOUBLE)
                  ELSE CAST(floor(({k} - 1) * {HASH_SPACE!r} / CAST(kth AS DOUBLE)) AS DOUBLE)
             END, 2) AS inter_est
FROM st
"""


# ---------------------------------------------------------------------------
# Misra-Gries heavy hitters: sketch-pruned candidates, EXACT final counts
# ---------------------------------------------------------------------------

def misra_gries_candidates(df: DataFrame, item: str, k: int,
                           weight: str | None = None) -> DataFrame:
    """Per-partition Misra-Gries(k) summaries, unioned: a candidate set
    that PROVABLY contains every item with global count > n/(k+1) —
    or, with ``weight``, total weight > W/(k+1) (weights must be
    positive; the decrement argument is weight-oblivious).

    Proof sketch: partition p's MG(k) undercounts any item by at most
    n_p/(k+1) (mergeable-summaries bound — merging batch value_counts and
    subtracting the (k+1)-th largest preserves it), so an item absent
    from EVERY partition summary has total count <= sum_p n_p/(k+1)
    = n/(k+1). The output is order-dependent (which EXTRA low-count
    items survive varies with partitioning) — callers must re-count
    exactly (:func:`heavy_hitters_exact`); never report MG estimates.

    Vectorized: each Arrow batch collapses to ``value_counts`` (or a
    groupby weight sum — C speed) before touching the Python dict, so
    per-item work is per *distinct* item per batch, not per row. State
    is <= k counters per partition.
    """
    import pandas as pd

    cols = [item] if weight is None else [item, weight]

    def mg(batches):
        from collections import Counter
        import heapq

        counters: Counter = Counter()
        for pdf in batches:
            if weight is None:
                counters.update(pdf[item].value_counts().to_dict())
            else:
                counters.update(pdf.groupby(item)[weight].sum().to_dict())
            if len(counters) > k:
                kth = heapq.nlargest(k + 1, counters.values())[-1]
                counters = Counter({key: v - kth
                                    for key, v in counters.items()
                                    if v - kth > 0})
        yield pd.DataFrame({item: list(counters.keys())})

    return df.select(*cols).mapInPandas(
        mg, schema=df.select(item).schema)


def heavy_hitters_exact(df: DataFrame, item: Column, k: int) -> DataFrame:
    """All items with exact count > n/(k+1), found WITHOUT shuffling the
    full distinct-item domain: a Misra-Gries candidate pass prunes the
    domain to <= k*partitions items, then one semi-join + count verifies
    candidates exactly. Output ``(item, cnt, n_total)`` is deterministic
    (the exact-count filter kills the sketch's order-dependence: final =
    {items: cnt*(k+1) > n} regardless of which extras MG emitted).

    At 10^12 rows this is the standard two-pass shape: pass 1 is narrow
    (map-side sketches, tiny exchange of candidates), pass 2 shuffles
    only rows matching the broadcast candidate set. The exact groupBy
    over ALL items — the naive plan — shuffles the full domain instead.
    """
    items = df.select(item.alias("it"))
    # items feeds three branches (sketch, total count, verify join) — pin.
    items = items.localCheckpoint(eager=True)
    cand = misra_gries_candidates(items, "it", k).distinct()
    total = items.agg(F.count(F.lit(1)).alias("n_total"))
    counted = (items.join(F.broadcast(cand), "it")
               .groupBy("it").agg(F.count(F.lit(1)).alias("cnt"))
               .crossJoin(F.broadcast(total)))
    return (counted.where(F.col("cnt") * F.lit(k + 1) > F.col("n_total"))
            .select(F.col("it").alias("item"), "cnt", "n_total"))


def weighted_heavy_hitters_exact(df: DataFrame, item: Column,
                                 weight: Column, k: int) -> DataFrame:
    """All items whose exact total ``weight`` exceeds W/(k+1) (W = global
    weight sum) — the revenue/traffic-share twin of
    :func:`heavy_hitters_exact`, same two-pass shape: weighted MG
    candidates (provable superset), then one broadcast-gated exact
    re-aggregation. Weights must be positive integers (cents, bytes,
    rows) so sums are engine-exact. Output: (item, w_sum, w_total).
    """
    items = df.select(item.alias("it"), weight.alias("w"))
    items = items.localCheckpoint(eager=True)
    cand = misra_gries_candidates(items, "it", k, weight="w").distinct()
    total = items.agg(F.sum("w").alias("w_total"))
    counted = (items.join(F.broadcast(cand), "it")
               .groupBy("it").agg(F.sum("w").alias("w_sum"))
               .crossJoin(F.broadcast(total)))
    return (counted.where(F.col("w_sum") * F.lit(k + 1) > F.col("w_total"))
            .select(F.col("it").alias("item"), "w_sum", "w_total"))
