"""Similarity search over embedding columns (array<float>).

* ``cosine_topk`` — brute-force cosine top-k: broadcast the (small) query set
  against the item table; the dot product is a pure expression
  (zip_with + aggregate in double), so the scan stays JVM-side and
  embarrassingly parallel — the right baseline at any scale when the query
  set is small.
* ``rhp_lsh_topk`` — random-hyperplane LSH: sign-bit signatures bucket items,
  queries probe only their own bucket(s). The scale path when BOTH sides are
  large: turns n·m into a bucket-local join.
* ``embedding_near_dups`` — all-pairs near-duplicate detection above a cosine
  threshold via the same bucketing.

Everything here avoids Python in the scoring loop; at 10^9 vectors the
brute-force scan is bandwidth-bound and the LSH variant trades recall for a
bucket-partitioned shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(
        F.transform(a, lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0), lambda acc, x: acc + x))


def cosine_sim(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def cosine_topk(
    items: DataFrame, queries: DataFrame, k: int,
    *, id_col: str = "vec_id", vec_col: str = "embedding",
    query_id_col: str | None = None, exclude_self: bool = True,
) -> DataFrame:
    """Brute-force cosine top-k: (query_id, neighbor_id, rank, sim).

    Broadcast-joins the query set against items (no shuffle of the item
    table), pre-normalizes both sides once, then a window top-k per query.
    Deterministic tie-break by neighbor id.
    """
    from pyspark.sql import Window

    qid = query_id_col or id_col
    q = queries.select(
        F.col(qid).alias("query_id"),
        (F.col(vec_col).cast("array<double>")).alias("qv"),
        _norm(F.col(vec_col)).alias("qn"),
    )
    it = items.select(
        F.col(id_col).alias("neighbor_id"),
        (F.col(vec_col).cast("array<double>")).alias("iv"),
        _norm(F.col(vec_col)).alias("inorm"),
    )
    scored = (it.join(F.broadcast(q))
                .withColumn("sim", _dot(F.col("qv"), F.col("iv"))
                            / (F.col("qn") * F.col("inorm"))))
    if exclude_self:
        scored = scored.where(F.col("neighbor_id") != F.col("query_id"))
    w = Window.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col("neighbor_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
                  .where(F.col("rank") <= k)
                  .select("query_id", "neighbor_id", "rank", "sim"))


def rhp_signature(vec: Column, planes: list[list[float]]) -> Column:
    """Random-hyperplane sign signature as a LONG bit field (<= 63 planes).
    Planes are plain Python lists baked into the plan as literals (broadcast
    by closure; tiny)."""
    acc = F.lit(0).cast("long")
    for j, p in enumerate(planes):
        dot = F.aggregate(
            F.zip_with(vec, F.array(*[F.lit(float(x)) for x in p]),
                       lambda a, b: a.cast("double") * b),
            F.lit(0.0), lambda acc_, x: acc_ + x)
        acc = acc + F.when(dot > 0, F.lit(1 << j).cast("long")).otherwise(0)
    return acc


def make_planes(dim: int, n_planes: int = 16, seed: int = 42) -> list[list[float]]:
    import numpy as np

    rng = np.random.RandomState(seed)
    return rng.randn(n_planes, dim).tolist()


def rhp_lsh_topk(
    items: DataFrame, queries: DataFrame, k: int,
    *, id_col: str = "vec_id", vec_col: str = "embedding",
    dim: int, n_planes: int = 12, seed: int = 42,
) -> DataFrame:
    """LSH-bucketed ANN: items and queries hashed to sign buckets; scoring is
    bucket-local (equi-join on the signature), then per-query top-k. Probing
    only the exact bucket — recall grows with fewer planes; multi-probe is a
    follow-on (flip one bit per probe)."""
    from pyspark.sql import Window

    planes = make_planes(dim, n_planes, seed)
    it = items.withColumn("__bucket", rhp_signature(F.col(vec_col), planes))
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qv"),
        rhp_signature(F.col(vec_col), planes).alias("__bucket"),
    )
    scored = (it.join(q, "__bucket")
                .where(F.col(id_col) != F.col("query_id"))
                .withColumn("sim", cosine_sim(F.col("qv"), F.col(vec_col))))
    w = Window.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col(id_col))
    return (scored.withColumn("rank", F.row_number().over(w))
                  .where(F.col("rank") <= k)
                  .select("query_id", F.col(id_col).alias("neighbor_id"), "rank", "sim"))


def embedding_near_dups(
    df: DataFrame, *, id_col: str = "vec_id", vec_col: str = "embedding",
    threshold: float = 0.999, dim: int, n_planes: int = 10, seed: int = 42,
) -> DataFrame:
    """All-pairs cosine near-duplicates (a < b, sim >= threshold) via sign
    buckets: vectors this similar share the exact signature with high
    probability, so the candidate join is bucket-local."""
    planes = make_planes(dim, n_planes, seed)
    sig = df.select(F.col(id_col), F.col(vec_col),
                    rhp_signature(F.col(vec_col), planes).alias("__bucket"))
    a = sig.select(F.col(id_col).alias("a"), F.col(vec_col).alias("va"), "__bucket")
    b = sig.select(F.col(id_col).alias("b"), F.col(vec_col).alias("vb"), "__bucket")
    return (a.join(b, "__bucket").where(F.col("a") < F.col("b"))
             .withColumn("sim", cosine_sim(F.col("va"), F.col("vb")))
             .where(F.col("sim") >= threshold)
             .select("a", "b", "sim"))
