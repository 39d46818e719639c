"""Streaming Pareto-frontier maintenance: a monotone accumulator sink.

The skyline is a *mergeable monotone summary*: skyline(A ∪ B) =
skyline(skyline(A) ∪ skyline(B)), and a point dominated once is dominated
forever. So a stream's running frontier needs no watermark, no eviction,
and no per-key state store — each micro-batch folds its points into the
tiny stored frontier (dimensions × frontier breadth, not corpus-sized).
Point multiplicities at surviving coordinates add exactly: a point that
survives in the union survived in each side, so summing per-(x, y)
``n_points`` before re-sweeping is exact.

Exactly-once via the same chain-of-immutable-versions fencing as
``ivm_sink.ViewMaintenanceSink``: a replayed batch id recomputes from the
same committed predecessor and lands in the same directory behind an
atomic marker, so double-apply is impossible (critical here — n_points
would double).

At 100 TB the per-batch work is one distributed local-prune over the
batch (operators/skyline.pareto_frontier stage 1) plus a merge against a
frontier that is orders of magnitude smaller than the data; the rewrite
cost is proportional to the FRONTIER, never the corpus.
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spanner_data_validator_spark.operators.skyline import (
    pareto_frontier,
    sweep_collapsed,
)

__all__ = ["FrontierMaintenanceSink"]


class FrontierMaintenanceSink:
    """``foreachBatch`` callable maintaining the running skyline of a
    stream with BIGINT objective columns ``x_col``/``y_col`` (minimized)."""

    def __init__(self, spark: SparkSession, out_dir: str,
                 x_col: str, y_col: str):
        self.spark = spark
        self.out_dir = out_dir
        self.x_col, self.y_col = x_col, y_col
        os.makedirs(os.path.join(out_dir, "_commits"), exist_ok=True)

    def _marker(self, batch_id: int) -> str:
        return os.path.join(self.out_dir, "_commits", str(batch_id))

    def is_committed(self, batch_id: int) -> bool:
        return os.path.exists(self._marker(batch_id))

    def _committed_ids(self) -> list[int]:
        d = os.path.join(self.out_dir, "_commits")
        return sorted(int(x) for x in os.listdir(d) if x.isdigit())

    def _path(self, batch_id: int) -> str:
        return os.path.join(self.out_dir, "frontier", f"batch={batch_id}")

    def _empty(self) -> DataFrame:
        return self.spark.createDataFrame(
            [], "x bigint, y bigint, n_points bigint")

    def latest(self) -> DataFrame:
        ids = self._committed_ids()
        return (self.spark.read.parquet(self._path(ids[-1]))
                if ids else self._empty())

    def _before(self, batch_id: int) -> DataFrame:
        ids = [i for i in self._committed_ids() if i < batch_id]
        return (self.spark.read.parquet(self._path(ids[-1]))
                if ids else self._empty())

    def __call__(self, batch_df: DataFrame | None, batch_id: int) -> None:
        if self.is_committed(batch_id):
            return  # replay of a committed batch: exactly-once no-op
        prev = self._before(batch_id)
        if batch_df is None or batch_df.isEmpty():
            new = prev
        else:
            batch_sky = pareto_frontier(
                batch_df, F.col(self.x_col).cast("long"),
                F.col(self.y_col).cast("long"))
            # weighted union: n_points rides through stage 1 of the
            # re-sweep by pre-summing per exact point.
            merged = (prev.unionByName(batch_sky)
                      .groupBy("x", "y")
                      .agg(F.sum("n_points").alias("n_points")))
            new = sweep_collapsed(merged)
        target = self._path(batch_id)
        shutil.rmtree(target, ignore_errors=True)  # failed-attempt debris
        new.coalesce(1).write.mode("overwrite").parquet(target)
        tmp = self._marker(batch_id) + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"batch_id": batch_id}, f)
        os.replace(tmp, self._marker(batch_id))  # atomic commit point
