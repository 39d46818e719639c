"""Embedding quantization: symmetric int8 for ANN/storage compression.

The 4x shrink that makes a 10^9-vector index fit executor memory: each
vector is scaled by 127/max|x| and rounded to integers in [-127, 127]
(symmetric linear quantization — the scheme FAISS's scalar quantizer and
most vector stores use). Everything is pure codegen expressions: one
array_max pass for the scale, one transform for the quantized array.

Cross-engine determinism: the scale is one IEEE divide, each element one
multiply + half-away-from-zero round — bit-identical in Spark and DuckDB,
so integer checksums over the quantized arrays are exact oracle material.

Catalyst trap baked in: the per-row scale is materialized behind a
Generate barrier (``explode(array(..))``) — inlined into the ``transform``
lambda it would be re-evaluated once per ELEMENT (CollapseProject pushes
through a plain select; see ivf_assign / BENCH.md notes).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_INTMAT_CACHE: dict[tuple, Column] = {}
_INTMAT_CACHE_MAX = 16  # a handful of codebooks per session; bound the memo


def intmat_literal(mat: list[list[int]]) -> Column:
    """Memoized array<array<bigint>> literal — py4j conversion of a k x d
    matrix costs ~0.25 s per build (see ann._centroid_literal / BENCH.md),
    so repeated queries over the same codebook reuse one Column."""
    key = tuple(tuple(int(x) for x in r) for r in mat)
    col = _INTMAT_CACHE.get(key)
    if col is None:
        if len(_INTMAT_CACHE) >= _INTMAT_CACHE_MAX:
            _INTMAT_CACHE.pop(next(iter(_INTMAT_CACHE)))  # FIFO eviction
        col = _INTMAT_CACHE[key] = F.lit(
            [list(r) for r in key]).cast("array<array<bigint>>")
    return col


def subspace_dist2(v: Column, c: Column, s: Column | int,
                   sub_dim: int) -> Column:
    """Exact BIGINT squared L2 distance between subspace ``s`` slices of two
    fixed-point arrays (1-based slice [s*sub_dim+1, (s+1)*sub_dim])."""
    start = (s * sub_dim + 1) if isinstance(s, int) else s * sub_dim + F.lit(1)
    return F.aggregate(
        F.zip_with(F.slice(v, start, sub_dim), F.slice(c, start, sub_dim),
                   lambda a, b: (a - b) * (a - b)),
        F.lit(0).cast("long"), lambda acc, x: acc + x)


def pq_encode(df: DataFrame, codebook: list[list[int]], *, vec_col: str,
              m: int, sub_dim: int, out_col: str = "codes") -> DataFrame:
    """Expression-only PQ encoder: ZERO shuffle, ZERO joins.

    ``codebook`` is a k x (m*sub_dim) matrix of fixed-point ints (tiny —
    baked into the plan as a memoized literal, like ann.ivf_assign's
    centroids). Adds ``out_col``: array<int> of length ``m``, element s =
    the code whose subspace-s slice minimizes the EXACT BIGINT squared
    distance to the row's slice (tie -> smallest code — identical to
    ``pq_assign``'s ORDER BY (err, code), which shuffles n*m scored rows
    through a window; this encoder is the index-build scale path: the
    whole assignment is one scan-stage projection). The codes array is
    materialized behind a Generate barrier so downstream joins can't
    re-inline the k*m distance forest per matched row (module header)."""
    cb = intmat_literal(codebook)
    v = F.col(vec_col)
    subs = F.sequence(F.lit(0), F.lit(m - 1))
    codes = F.transform(subs, lambda s: F.array_min(
        F.transform(cb, lambda cvec, c: F.struct(
            subspace_dist2(v, cvec, s, sub_dim).alias("d"),
            c.cast("int").alias("code"))))["code"])
    return df.withColumn(out_col, F.explode(F.array(codes)))


def quantize_int8(df: DataFrame, vec_col: str) -> DataFrame:
    """Add ``scale`` (double) and ``q`` (array<long> of int8-ranged values)
    for ``vec_col``. Zero vectors get scale 0 and an all-zero ``q`` rather
    than a divide-by-zero. ``q`` values are guaranteed in [-127, 127]; cast
    to tinyint at storage time (kept wide here so downstream integer sums
    never overflow)."""
    mx = F.array_max(F.transform(
        F.col(vec_col), lambda x: F.abs(x.cast("double"))))
    scale = F.when(mx > 0, F.lit(127.0) / mx).otherwise(F.lit(0.0))
    # Generate barrier: ONE scale evaluation per row (not per element)
    out = df.withColumn("scale", F.explode(F.array(scale)))
    q = F.transform(
        F.col(vec_col),
        lambda x: F.round(x.cast("double") * F.col("scale")).cast("long"))
    return out.withColumn("q", q)


def quantize_stats(df: DataFrame, vec_col: str, group: str) -> DataFrame:
    """Per-group quantization audit: vector count, exact integer checksum of
    all quantized values (the cross-engine bit-equality witness), saturated
    element count (|q| = 127), and the scale range."""
    qdf = quantize_int8(df, vec_col)
    checksum = F.aggregate(F.col("q"), F.lit(0).cast("long"),
                           lambda acc, x: acc + x)
    n_sat = F.size(F.filter(F.col("q"), lambda x: F.abs(x) == 127))
    return (qdf.select(F.col(group), checksum.alias("__ck"),
                       n_sat.alias("__st"), F.col("scale"))
            .groupBy(group)
            .agg(F.count(F.lit(1)).cast("long").alias("n_vecs"),
                 F.sum("__ck").cast("long").alias("checksum"),
                 F.sum("__st").cast("long").alias("n_saturated"),
                 F.min("scale").alias("min_scale"),
                 F.max("scale").alias("max_scale")))


def pq_assign(vecs: DataFrame, codebook: DataFrame, *, m: int,
              sub_dim: int) -> DataFrame:
    """Product-quantization assignment in EXACT integer arithmetic.

    ``vecs``: (vec_id, vi) with ``vi`` an array<long> of fixed-point
    elements (pre-quantized — the repo's engine-portable discipline: all
    distance math in BIGINT, so argmin ties and error sums are
    bit-identical across engines and partitionings). ``codebook``:
    (code, ci) with ``ci`` array<long> of the same length. The vector is
    split into ``m`` subspaces of ``sub_dim``; each subvector is assigned
    to the code whose matching slice minimizes the exact squared L2
    distance (tie -> smallest code id).

    Returns (vec_id, subspace, code, err) — ``err`` the exact squared
    distance. PQ storage is m bytes/vector (here m codes), the classic
    1-2 orders of magnitude below scalar int8; at 10^9 vectors the
    codebook (m * k * sub_dim ints) broadcasts, the scan assigns, and the
    only shuffle is whatever the caller aggregates. The slice distance is
    computed with zip_with + aggregate over columns materialized behind a
    Generate barrier (the HOF-lambda re-evaluation trap in this module's
    header).
    """
    sub = F.explode(F.array(*[F.lit(s) for s in range(m)])).alias("subspace")
    v = vecs.select("vec_id", "vi", sub)
    v = v.select("vec_id", "subspace",
                 F.slice("vi", F.col("subspace") * sub_dim + 1,
                         sub_dim).alias("sv"))
    c = codebook.select("code", "ci", sub)
    c = c.select("code", "subspace",
                 F.slice("ci", F.col("subspace") * sub_dim + 1,
                         sub_dim).alias("sc"))
    # the codebook side is tiny (k codes x m subspaces) -> broadcast join
    pairs = v.join(F.broadcast(c), "subspace")
    dist = F.aggregate(
        F.zip_with("sv", "sc", lambda a, b: (a - b) * (a - b)),
        F.lit(0).cast("long"), lambda acc, x: acc + x)
    scored = pairs.select("vec_id", "subspace", "code",
                          dist.alias("err"))
    from pyspark.sql import Window
    w = (Window.partitionBy("vec_id", "subspace")
         .orderBy("err", "code"))
    return (scored.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") == 1).drop("_rn"))
