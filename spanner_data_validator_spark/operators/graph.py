"""Iterative graph algorithms as DataFrame loops (no GraphX/GraphFrames).

PageRank here demonstrates the two disciplines iterative algorithms need
on Spark at scale:

* **Lineage truncation per iteration** — each round's rank table is
  localCheckpointed; without it the plan doubles every iteration and the
  optimizer recompiles an exponentially growing tree (the classic
  iterative-Spark failure mode). On a cluster the same role is played by
  reliable checkpoints / persisted tables.
* **Order-independent arithmetic** — naive PageRank sums doubles, whose
  value depends on aggregation order (partitioning, engine), so no two
  runs — let alone two engines — agree exactly. Ranks are kept in FIXED
  POINT (integer units of 1/SCALE): contributions are floor(r/deg),
  summed exactly as BIGINTs, damped via floor(d * s) where the float
  product of an exact-in-double integer with a shared literal is
  correctly rounded identically everywhere. The result is bit-identical
  across partitionings AND engines — a DuckDB oracle unrolls the same
  iterations.

Edge multiplicity is respected (parallel edges weight the walk), matching
a multigraph random surfer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank_fixed_point(edges: DataFrame, *, iterations: int = 3,
                         damping: float = 0.85,
                         scale: int = 1_000_000) -> DataFrame:
    """Fixed-point PageRank over directed ``edges(src, dst)``.

    Returns (node, rank) with rank in integer units of 1/``scale`` (the
    uniform start rank is ``scale``). Update rule per node v:

        r'(v) = floor((1-d) * scale) + floor(d * sum_{u->v} floor(r(u)/deg(u)))

    Dangling mass is dropped (nodes with no out-edges leak rank), the
    standard simplification when edges are symmetrized by construction.
    All sums are exact BIGINT sums; the per-node values stay far below
    2^53 so the two float products (with d and (1-d)) are exact-input,
    correctly-rounded, engine-identical operations.
    """
    nodes = (edges.select(F.col("src").alias("node"))
             .unionByName(edges.select(F.col("dst").alias("node")))
             .distinct().localCheckpoint())
    deg = edges.groupBy(F.col("src").alias("node")).agg(
        F.count(F.lit(1)).alias("deg"))
    # (src, dst, deg(src)) pinned once — reused every iteration
    ed = (edges.join(deg, edges.src == deg.node)
          .select("src", "dst", "deg").localCheckpoint())
    base = int((1.0 - damping) * scale)
    ranks = nodes.select("node", F.lit(scale).cast("long").alias("rank"))
    for _ in range(iterations):
        contrib = (ed.join(ranks, ed.src == ranks.node)
                   .select("dst",
                           F.floor(F.col("rank") / F.col("deg")).alias("c"))
                   .groupBy("dst").agg(F.sum("c").alias("s")))
        ranks = (nodes.join(contrib, nodes.node == contrib.dst, "left")
                 .select("node",
                         (F.lit(base)
                          + F.floor(F.lit(damping)
                                    * F.coalesce(F.col("s"), F.lit(0))))
                         .cast("long").alias("rank"))
                 .localCheckpoint())
    return ranks


def pagerank_sql(edges_sql: str, *, iterations: int = 3,
                 damping: float = 0.85, scale: int = 1_000_000) -> str:
    """DuckDB rendering of :func:`pagerank_fixed_point` — the same
    iterations unrolled as CTEs over ``edges_sql`` (must yield src, dst)."""
    base = int((1.0 - damping) * scale)
    parts = [f"""
pr_edges AS ({edges_sql}),
pr_nodes AS (SELECT src AS node FROM pr_edges
             UNION SELECT dst AS node FROM pr_edges),
pr_deg AS (SELECT src AS node, CAST(count(*) AS BIGINT) AS deg
           FROM pr_edges GROUP BY src),
pr_ed AS (SELECT e.src, e.dst, d.deg FROM pr_edges e
          JOIN pr_deg d ON e.src = d.node),
pr_r0 AS (SELECT node, CAST({scale} AS BIGINT) AS rank FROM pr_nodes)"""]
    for i in range(iterations):
        parts.append(f"""
pr_c{i} AS (SELECT dst, CAST(sum(CAST(floor(r.rank / e.deg) AS BIGINT))
                             AS BIGINT) AS s
            FROM pr_ed e JOIN pr_r{i} r ON e.src = r.node
            GROUP BY dst),
pr_r{i + 1} AS (SELECT n.node,
                CAST({base} + floor({damping!r} * coalesce(c.s, 0))
                     AS BIGINT) AS rank
                FROM pr_nodes n LEFT JOIN pr_c{i} c ON n.node = c.dst)""")
    return ",".join(parts) + f"\nSELECT node, rank FROM pr_r{iterations}"
