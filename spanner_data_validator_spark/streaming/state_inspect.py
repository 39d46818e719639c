"""Checkpoint state-store inspection (Spark 4 `statestore` reader).

Operational debugging for stateful streams: read a running (or stopped)
query's checkpoint state AS A DATAFRAME — which keys an aggregation is
holding, which rows a stream-stream join has buffered per side, how much
state each operator/partition carries. This is the "per-partition
lineage" story of the north rule made queryable: state is data, so the
same engine that validates rows can validate its own state.

Readers are batch DataFrames over the checkpoint directory — they never
touch the running query, and at scale they parallelize per state-store
partition (one task per shuffle partition of the stateful operator).

Reference analogue: the Beam pipeline exposes nothing comparable — state
introspection is a Spark-native capability this engine gets for free by
building on structured streaming.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_state_metadata(spark: SparkSession, checkpoint: str) -> DataFrame:
    """Per-operator state metadata: operator id/name, store name,
    partition count, batch-id range held in the checkpoint."""
    return spark.read.format("state-metadata").load(checkpoint)


def read_state(spark: SparkSession, checkpoint: str, *,
               batch_id: int | None = None, operator_id: int = 0,
               store_name: str | None = None,
               join_side: str | None = None) -> DataFrame:
    """State rows of one stateful operator: (key struct, value struct,
    partition_id). ``join_side`` ('left'/'right') reads one side of a
    stream-stream join's buffer; ``batch_id`` time-travels to an older
    retained batch (default: latest committed)."""
    r = (spark.read.format("statestore")
         .option("operatorId", operator_id))
    if batch_id is not None:
        r = r.option("batchId", batch_id)
    if store_name is not None:
        r = r.option("storeName", store_name)
    if join_side is not None:
        r = r.option("joinSide", join_side)
    return r.load(checkpoint)


def state_partition_profile(spark: SparkSession, checkpoint: str, *,
                            operator_id: int = 0,
                            join_side: str | None = None) -> DataFrame:
    """Per-partition state-row counts — the skew view of the state store
    (a hot conv_id shows up here as one partition holding the bulk of the
    join buffer). Returns (partition_id, n_keys)."""
    st = read_state(spark, checkpoint, operator_id=operator_id,
                    join_side=join_side)
    return (st.groupBy("partition_id")
            .agg(F.count(F.lit(1)).alias("n_keys"))
            .orderBy("partition_id"))


def batch_lineage(spark: SparkSession, checkpoint: str) -> DataFrame:
    """Per-batch input lineage from the checkpoint's write-ahead logs:
    (batch_id, committed, watermark_ms, batch_ts_ms, source_id, files).

    ``offsets/N`` is the planned batch (line 2 carries the planned
    watermark + wall timestamp, later lines one offset per source),
    ``commits/N`` marks it durable, and for file sources
    ``sources/<i>/N`` manifests exactly which input files batch N
    admitted — the replay contract: a restarted query re-executes any
    planned-but-uncommitted batch from these same files. This is the
    per-partition lineage of the north rule as a queryable DataFrame
    (pure WAL parse; no running query needed).
    """
    import json
    import os

    rows = []
    odir = os.path.join(checkpoint, "offsets")
    batch_ids = sorted(int(f) for f in os.listdir(odir)
                       if not f.startswith(".")) if os.path.isdir(odir) else []
    for b in batch_ids:
        with open(os.path.join(odir, str(b))) as f:
            lines = [ln.strip() for ln in f if ln.strip()]
        meta = json.loads(lines[1]) if len(lines) > 1 else {}
        committed = os.path.exists(os.path.join(checkpoint, "commits", str(b)))
        n_sources = max(1, len(lines) - 2)
        for src in range(n_sources):
            manifest = os.path.join(checkpoint, "sources", str(src), str(b))
            files = []
            if os.path.exists(manifest):
                with open(manifest) as mf:
                    for ln in mf:
                        ln = ln.strip()
                        if ln.startswith("{"):
                            files.append(json.loads(ln)["path"])
            rows.append((b, committed,
                         int(meta.get("batchWatermarkMs", 0)),
                         int(meta.get("batchTimestampMs", 0)),
                         src, sorted(files)))
    return spark.createDataFrame(
        rows, "batch_id int, committed boolean, watermark_ms long, "
              "batch_ts_ms long, source_id int, files array<string>")
