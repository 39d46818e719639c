"""grid_neighbor_pairs vs brute force: boundaries, caps, cross-cell."""
from __future__ import annotations

from itertools import combinations

from pyspark.sql import functions as F

from spanner_data_validator_spark.operators.spatial import (
    dropped_cell_count,
    grid_neighbor_pairs,
)


def _brute(pts, radius, max_cell):
    cells: dict[tuple[int, int], list] = {}
    for i, x, y in pts:
        cells.setdefault((x // radius, y // radius), []).append((i, x, y))
    kept = [p for c in cells.values() if len(c) <= max_cell for p in c]
    out = set()
    for (i, xi, yi), (j, xj, yj) in combinations(kept, 2):
        d2 = (xi - xj) ** 2 + (yi - yj) ** 2
        if d2 <= radius * radius:
            out.add((min(i, j), max(i, j), d2))
    return out


def _run(spark, pts, radius, max_cell=256):
    df = spark.createDataFrame(pts, "id long, x long, y long")
    got = {(r.id_a, r.id_b, r.d2)
           for r in grid_neighbor_pairs(df, "id", "x", "y", radius=radius,
                                        max_cell=max_cell).collect()}
    assert got == _brute(pts, radius, max_cell)


def test_grid_pairs_boundary_and_cross_cell(spark):
    # exact-radius boundary pair (d=5 with r=5), adjacent-cell pairs,
    # same-point duplicates, far-apart non-pairs
    pts = [(1, 0, 0), (2, 3, 4), (3, 5, 0), (4, 9, 9), (5, 10, 10),
           (6, 50, 50), (7, 50, 50), (8, 14, 10), (9, 100, 0)]
    _run(spark, pts, radius=5)


def test_grid_pairs_dense_grid(spark):
    pts = [(i, (i * 7) % 40, (i * 13) % 40) for i in range(120)]
    _run(spark, pts, radius=6)


def test_grid_hot_cell_cap(spark):
    pts = [(i, 2, 3) for i in range(10)] + [(100, 30, 30), (101, 31, 31)]
    _run(spark, pts, radius=8, max_cell=4)
    df = spark.createDataFrame(pts, "id long, x long, y long")
    assert dropped_cell_count(df, "x", "y", radius=8, max_cell=4) == 1
