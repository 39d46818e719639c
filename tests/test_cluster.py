"""Fixed-point k-means (operators/cluster.py)."""

from __future__ import annotations

import duckdb
import pytest

from spanner_data_validator_spark.operators.cluster import (
    kmeans_fixed_point,
    kmeans_sql,
    quantize_vectors,
)


def _items(spark, vecs):
    rows = [(i, [float(x) for x in v]) for i, v in enumerate(vecs)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_planted_clusters_recovered(spark):
    # two tight 2-D blobs; k=2 seeds are the two smallest ids (one per blob)
    vecs = [[0.0, 0.0], [1.0, 1.0], [0.01, 0.02], [0.99, 1.01],
            [0.02, 0.01], [1.02, 0.98]]
    out = kmeans_fixed_point(_items(spark, vecs), k=2, iterations=2,
                             scale=1000).collect()
    assert [(r["cluster"], r["n_points"]) for r in out] == [(0, 3), (1, 3)]
    # inertia is the exact integer SSE: blob radii ~0.02*1000=20 units
    assert all(r["inertia"] < 4 * (30 ** 2) for r in out)


def test_iteration_moves_centroid(spark):
    # seeds are ids 0,1 (both in the left blob) — round 1 assigns everything
    # by the seed split, the update pulls centroid 1 into the right blob,
    # round 2 reassigns. A 1-iteration run must differ.
    vecs = [[0.0, 0.0], [0.1, 0.0], [0.05, 0.0],
            [5.0, 0.0], [5.1, 0.0], [5.05, 0.0]]
    one = {(r["cluster"], r["n_points"])
           for r in kmeans_fixed_point(_items(spark, vecs), k=2,
                                       iterations=1).collect()}
    two = {(r["cluster"], r["n_points"])
           for r in kmeans_fixed_point(_items(spark, vecs), k=2,
                                       iterations=2).collect()}
    assert two == {(0, 3), (1, 3)}
    assert one != two  # with seed split, cluster 1 = {0.1..} ∪ right blob


def test_empty_cluster_keeps_previous_centroid(spark):
    # identical duplicate seeds: cluster 1 never wins the round-1 tie-break,
    # gets zero points, and must keep its centroid (not crash / divide by
    # zero). Cluster 0's update moves to the global mean, so in round 2 the
    # carried [0,0] centroid wins the origin points back.
    vecs = [[0.0, 0.0], [0.0, 0.0], [1.0, 1.0], [1.0, 1.0]]
    out = kmeans_fixed_point(_items(spark, vecs), k=2, iterations=2).collect()
    assert [(r["cluster"], r["n_points"]) for r in out] == [(0, 2), (1, 2)]


def test_matches_unrolled_duckdb_oracle(spark):
    # the engine-exactness claim, end to end on an irregular corpus
    vecs = [[(i * 7919 % 101) / 101.0 - 0.5, (i * 104729 % 97) / 97.0 - 0.5]
            for i in range(40)]
    got = sorted(tuple(r) for r in kmeans_fixed_point(
        _items(spark, vecs), k=3, iterations=3).collect())
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE items AS SELECT * FROM (VALUES "
        + ",".join(f"({i}, [{v[0]!r}::FLOAT, {v[1]!r}::FLOAT])"
                   for i, v in enumerate(vecs))
        + ") t(vec_id, embedding)")
    sql = "WITH " + kmeans_sql("SELECT vec_id, embedding FROM items",
                               k=3, iterations=3, dim=2)
    want = sorted(tuple(r) for r in con.execute(sql).fetchall())
    assert got == want


def test_quantize_is_floor_scale(spark):
    q = quantize_vectors(_items(spark, [[0.1234, -0.1234]]),
                         scale=1000).collect()[0]
    assert list(q["qvec"]) == [123, -124]  # floor, not truncate


def test_validates_args(spark):
    items = _items(spark, [[0.0, 0.0]])
    with pytest.raises(ValueError):
        kmeans_fixed_point(items, k=0)
    with pytest.raises(ValueError):
        kmeans_fixed_point(items, k=2)  # not enough vectors to seed
