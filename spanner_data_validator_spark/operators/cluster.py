"""Distributed k-means (Lloyd's algorithm) as a DataFrame loop, in fixed point.

This is the trainable counterpart of the IVF coarse quantizer in
``operators/ann.py``: ``ann.centroids_from_items`` picks data-sampled seeds
precisely because *floating-point* k-means iterations are not reproducible
across engines (mean updates sum doubles, whose value depends on aggregation
order). Here the iterations themselves become engine-exact by the same
discipline as fixed-point PageRank (``operators/graph.py``):

* vectors are quantized once to integer units of 1/``scale``
  (``floor(x * scale)`` — float→double cast, one correctly-rounded multiply,
  exact floor: bit-identical in every engine);
* distances are exact BIGINT sums of squared integer differences, so the
  argmin assignment (ties broken by lowest cluster id) is deterministic;
* centroid updates are exact integer floor-divisions ``sum // count``
  (never a double mean), so round i+1's centroids are bit-identical across
  partitionings AND engines. A DuckDB oracle unrolls the same rounds.

Plan shape at 100 TB:

* the quantized vector table is materialized once (localCheckpoint here;
  a persisted table on a cluster) — each round rescans it, never the raw
  source, and the HOF distance expressions read a concrete column (Catalyst
  would otherwise re-evaluate the quantize ``transform`` per centroid per
  element — the CollapseProject re-evaluation trap, see CLAUDE.md);
* assignment is scan-local: centroids ride along as a k×dim literal
  (driver-held, tiny — the classic broadcast-centroids Lloyd), so the only
  per-round shuffle is the update's ``groupBy(cluster, pos)`` — map-side
  partial sums reduce it to k·dim rows on the wire regardless of corpus
  size;
* the driver holds k·dim integers between rounds — no lineage chain grows
  across iterations (the iterative-plan-doubling failure mode needs no
  checkpoint here because the loop state lives outside the DAG).

Reference parity: the reference has no clustering (SURVEY.md §2.10); this is
part of the LLM-pipeline tier (IVF/SemDeDup quantizer training,
``JDBCToSpannerDVTWithHash.java`` has no analogue).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["quantize_vectors", "kmeans_fixed_point", "kmeans_sql"]


def quantize_vectors(items: DataFrame, *, id_col: str = "vec_id",
                     vec_col: str = "embedding",
                     scale: int = 1000) -> DataFrame:
    """(id, qvec): vectors quantized to integer units of 1/``scale``.

    The result is materialized (localCheckpoint) — every k-means round and
    every HOF distance expression reads the concrete column instead of
    re-deriving the ``transform`` per centroid per element.
    """
    qvec = F.expr(
        f"transform(cast({vec_col} as array<double>), "
        f"x -> cast(floor(x * {scale}d) as bigint))")
    return (items.select(F.col(id_col).alias("id"), qvec.alias("qvec"))
            .localCheckpoint())


def _assign(q: DataFrame, centroids: list[list[int]]) -> DataFrame:
    """(id, qvec, cluster, dist): exact-integer argmin assignment.

    ``dist`` is the exact squared L2 distance to the winning centroid;
    ties go to the lowest cluster id (``array_position`` returns the first
    minimum). The distance array is computed once per row behind a Generate
    barrier — without it ``array_min`` + ``array_position`` would inline and
    re-evaluate all k aggregates twice.
    """
    dists = F.array(*[
        F.aggregate(
            F.zip_with(F.col("qvec"), F.lit(c),
                       lambda a, b: (a - b) * (a - b)),
            F.lit(0).cast("long"), lambda acc, x: acc + x)
        for c in centroids
    ])
    rows = q.select("id", "qvec", F.explode(F.array(dists)).alias("dists"))
    return rows.select(
        "id", "qvec",
        (F.array_position(F.col("dists"), F.array_min(F.col("dists"))) - 1
         ).alias("cluster"),
        F.array_min(F.col("dists")).alias("dist"))


def kmeans_fixed_point(items: DataFrame, *, id_col: str = "vec_id",
                       vec_col: str = "embedding", k: int = 4,
                       iterations: int = 2,
                       scale: int = 1000) -> DataFrame:
    """Run ``iterations`` Lloyd rounds; return per-cluster (cluster,
    n_points, inertia) of the LAST assignment.

    Seeds are the quantized vectors of the ``k`` smallest ids (a plain-SQL
    rule, so the oracle reproduces it). Round i assigns with centroids
    c_{i-1} and derives c_i as the per-dimension exact floor-mean
    ``sum // count``; clusters that lose every point keep their previous
    centroid. ``inertia`` is the exact BIGINT sum of squared distances.
    """
    if k < 1 or iterations < 1:
        raise ValueError("k and iterations must be >= 1")
    q = quantize_vectors(items, id_col=id_col, vec_col=vec_col, scale=scale)
    seed_rows = q.orderBy("id").limit(k).select("qvec").collect()
    if len(seed_rows) < k:
        raise ValueError(f"need >= {k} vectors to seed {k} clusters")
    centroids = [list(r[0]) for r in seed_rows]
    assigned = None
    for it in range(iterations):
        assigned = _assign(q, centroids)
        if it < iterations - 1:
            stats = (assigned
                     .select("cluster", F.posexplode("qvec").alias("pos", "qv"))
                     .groupBy("cluster", "pos")
                     .agg(F.sum("qv").alias("s"), F.count("*").alias("c"))
                     .collect())
            nxt = [list(c) for c in centroids]
            for r in stats:
                # exact floor division — matches the oracle's integer
                # floor-div rendering bit-for-bit (never a double mean)
                nxt[r["cluster"]][r["pos"]] = r["s"] // r["c"]
            centroids = nxt
    return (assigned.groupBy("cluster")
            .agg(F.count("*").alias("n_points"), F.sum("dist").alias("inertia"))
            .orderBy("cluster"))


def kmeans_sql(items_sql: str, *, id_col: str = "vec_id",
               vec_col: str = "embedding", k: int = 4, iterations: int = 2,
               scale: int = 1000, dim: int = 64) -> str:
    """DuckDB rendering of :func:`kmeans_fixed_point`: the same rounds
    unrolled as CTEs over ``items_sql`` (must yield ``id_col``/``vec_col``).

    Every arithmetic step mirrors the Spark path exactly: the quantize
    multiply is the one double op (correctly rounded on identical inputs),
    everything after is BIGINT — distances, argmin (ties by cluster id),
    and the centroid update's exact floor-division
    ``(s - ((s % c + c) % c)) / c`` (the divisible numerator makes the
    division exact; equals Python's ``//``).
    """
    parts = [f"""
km_items AS (SELECT {id_col} AS id, {vec_col} AS vec FROM ({items_sql})),
km_q AS (SELECT id, g.pos,
                CAST(floor(CAST(vec[g.pos] AS DOUBLE) * {scale}) AS BIGINT) AS qv
         FROM km_items
         CROSS JOIN (SELECT unnest(range(1, {dim} + 1)) AS pos) g),
km_seed AS (SELECT id, row_number() OVER (ORDER BY id) - 1 AS cluster
            FROM (SELECT id FROM km_items ORDER BY id LIMIT {k})),
km_c0 AS (SELECT s.cluster, q.pos, q.qv AS cv
          FROM km_seed s JOIN km_q q ON q.id = s.id)"""]
    for i in range(iterations):
        parts.append(f"""
km_d{i} AS (SELECT q.id, c.cluster,
                   CAST(sum((q.qv - c.cv) * (q.qv - c.cv)) AS BIGINT) AS dist
            FROM km_q q JOIN km_c{i} c ON q.pos = c.pos
            GROUP BY q.id, c.cluster),
km_a{i} AS (SELECT id, cluster, dist FROM (
              SELECT id, cluster, dist,
                     row_number() OVER (PARTITION BY id
                                        ORDER BY dist, cluster) AS rn
              FROM km_d{i}) WHERE rn = 1)""")
        if i < iterations - 1:
            parts.append(f"""
km_s{i} AS (SELECT a.cluster, q.pos, CAST(sum(q.qv) AS BIGINT) AS s,
                   CAST(count(*) AS BIGINT) AS c
            FROM km_a{i} a JOIN km_q q ON q.id = a.id
            GROUP BY a.cluster, q.pos),
km_c{i + 1} AS (SELECT p.cluster, p.pos,
                CAST(coalesce(
                  CAST((s.s - (((s.s % s.c) + s.c) % s.c)) / s.c AS BIGINT),
                  p.cv) AS BIGINT) AS cv
                FROM km_c{i} p LEFT JOIN km_s{i} s
                  ON s.cluster = p.cluster AND s.pos = p.pos)""")
    last = iterations - 1
    return ",".join(parts) + f"""
SELECT cluster, CAST(count(*) AS BIGINT) AS n_points,
       CAST(sum(dist) AS BIGINT) AS inertia
FROM km_a{last} GROUP BY cluster ORDER BY cluster"""
