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


# ---------------------------------------------------------------------------
# IVF (inverted-file) ANN: k-means coarse quantizer + bucket-local scoring
# ---------------------------------------------------------------------------

def train_centroids(
    items: DataFrame, *, vec_col: str = "embedding", n_lists: int = 16,
    seed: int = 42, sample_fraction: float = 1.0, max_iter: int = 20,
) -> list[list[float]]:
    """Coarse quantizer: k-means centroids trained on (a sample of) the items.

    Training uses Spark ML once, driver-side model; inference below is pure
    expressions — no ML model on the scoring path.
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    train = items.select(
        array_to_vector(F.col(vec_col).cast("array<double>")).alias("features"))
    if sample_fraction < 1.0:
        train = train.sample(sample_fraction, seed)
    model = KMeans(k=n_lists, seed=seed, maxIter=max_iter).fit(train)
    return [list(map(float, c)) for c in model.clusterCenters()]


def _centroids_df(df: DataFrame, centroids: list[list[float]]) -> DataFrame:
    spark = df.sparkSession
    return spark.createDataFrame(
        [(i, c) for i, c in enumerate(centroids)],
        "list_id int, centroid array<double>")


def ivf_assign(
    df: DataFrame, centroids: list[list[float]],
    *, vec_col: str = "embedding", nprobe: int = 1,
) -> DataFrame:
    """Assign each vector to its ``nprobe`` nearest centroid lists.

    Broadcast-join against the tiny centroid table + window rank — one pass,
    n_lists× scoring work per row, no shuffle of the vector table beyond the
    final list_id partitioning the caller chooses.
    """
    from pyspark.sql import Window

    cent = _centroids_df(df, centroids)
    d2 = F.aggregate(
        F.zip_with(F.col(vec_col).cast("array<double>"), F.col("centroid"),
                   lambda a, b: (a - b) * (a - b)),
        F.lit(0.0), lambda acc, x: acc + x)
    scored = df.join(F.broadcast(cent)).withColumn("__d2", d2)
    w = Window.partitionBy(*df.columns).orderBy(F.col("__d2"), F.col("list_id"))
    return (scored.withColumn("__r", F.row_number().over(w))
                  .where(F.col("__r") <= nprobe)
                  .drop("__d2", "__r", "centroid"))


def ivf_topk(
    items: DataFrame, queries: DataFrame, k: int,
    *, id_col: str = "vec_id", vec_col: str = "embedding",
    n_lists: int = 16, nprobe: int = 2, seed: int = 42,
    centroids: list[list[float]] | None = None,
) -> DataFrame:
    """IVF ANN top-k: items live in their single nearest list; each query
    probes its ``nprobe`` nearest lists; scoring is list-local.

    At 10^9-vector scale the item assignment is computed once (and would be
    persisted/bucketed by list_id); queries shuffle only to their probed
    lists — n/n_lists of the data each, instead of a full scan.
    """
    from pyspark.sql import Window

    centroids = centroids or train_centroids(
        items, vec_col=vec_col, n_lists=n_lists, seed=seed)
    it = ivf_assign(items, centroids, vec_col=vec_col, nprobe=1).select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("iv"), "list_id")
    q = ivf_assign(queries, centroids, vec_col=vec_col, nprobe=nprobe).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"), "list_id")
    scored = (it.join(q, "list_id")
                .where(F.col("neighbor_id") != F.col("query_id"))
                .withColumn("sim", cosine_sim(F.col("qv"), F.col("iv"))))
    w = Window.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col("neighbor_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
                  .where(F.col("rank") <= k)
                  .select("query_id", "neighbor_id", "rank", "sim"))
