"""Dual-stream transcript sources (batch + structured-streaming).

The production design reads two Iceberg incremental scans
(``spark.readStream.format("iceberg")`` — the Spark-native analogue of the
reference's JdbcIO/SpannerIO readAll pair,
JDBCToSpannerDVTWithHash.java:580-604 / :690-752). This sandbox has no
Iceberg runtime jar, so the default implementation is Spark's built-in
file-stream source over parquet directories — which exercises the identical
streaming machinery (offsets tracked per file in the checkpoint, exactly-once
replay of a batch on recovery). ``format="iceberg"`` switches to the real
connector when the runtime jar + catalog are configured.

Schema is fixed by the engine contract (BASELINE.json input_hint):
``(conv_id string, turn_idx int, role string, text string, tool string,
ts timestamp)``.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

TRANSCRIPT_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType()),
        T.StructField("turn_idx", T.IntegerType()),
        T.StructField("role", T.StringType()),
        T.StructField("text", T.StringType()),
        T.StructField("tool", T.StringType()),
        T.StructField("ts", T.TimestampType()),
    ]
)

KEY_COLS = ["conv_id", "turn_idx"]
PAYLOAD_COLS = ["role", "text", "tool"]  # ts is event time, NOT fingerprinted


def read_transcripts(
    spark: SparkSession, path: str, *, fmt: str = "parquet"
) -> DataFrame:
    """Batch read of one transcript table."""
    if fmt == "iceberg":
        df = spark.read.format("iceberg").load(path)
    else:
        df = spark.read.schema(TRANSCRIPT_SCHEMA).parquet(path)
    return df.withColumn("ts", F.col("ts").cast("timestamp"))


def stream_transcripts(
    spark: SparkSession,
    path: str,
    *,
    fmt: str = "parquet",
    watermark: str | None = "10 minutes",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Streaming read of one transcript table.

    * ``fmt="parquet"`` — file-stream source: new files under ``path`` are
      discovered per micro-batch; offsets (file names) live in the checkpoint,
      so restarts resume exactly where they left off.
    * ``fmt="iceberg"`` — incremental snapshot scan (requires the Iceberg
      runtime on the classpath; options like ``stream-from-timestamp`` can be
      passed by the caller via ``.option`` on the returned reader's plan —
      kept minimal here).
    """
    if fmt == "iceberg":
        reader = spark.readStream.format("iceberg")
        df = reader.load(path)
    else:
        reader = spark.readStream.schema(TRANSCRIPT_SCHEMA)
        if max_files_per_trigger:
            reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
        df = reader.parquet(path)
    df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    if watermark:
        df = df.withWatermark("ts", watermark)
    return df


def write_transcripts(
    df_or_pdf, spark: SparkSession, path: str, *, n_files: int = 4, subdir: str | None = None
) -> str:
    """Write a transcript table (pandas or Spark DF) as parquet files.

    Used by tests/bench to stage stream input; ``subdir`` appends an
    incremental drop of files to an existing stream directory (the file-stream
    source picks them up as a new micro-batch).
    """
    import pandas as pd

    if isinstance(df_or_pdf, pd.DataFrame):
        df = spark.createDataFrame(df_or_pdf, schema=TRANSCRIPT_SCHEMA)
    else:
        df = df_or_pdf
    os.makedirs(path, exist_ok=True)
    target = path
    if subdir is not None:
        # file-stream sources watch a flat glob; write to a temp dir and move
        # finished files in so readers never see partial files
        import shutil
        import uuid

        tmp = os.path.join(path, f"_stage_{uuid.uuid4().hex}")
        df.repartition(n_files).write.mode("overwrite").parquet(tmp)
        moved = 0
        for name in os.listdir(tmp):
            if name.endswith(".parquet"):
                shutil.move(
                    os.path.join(tmp, name), os.path.join(path, f"{subdir}_{name}")
                )
                moved += 1
        shutil.rmtree(tmp, ignore_errors=True)
        return path
    df.repartition(n_files).write.mode("overwrite").parquet(target)
    return target
