"""Closing the loop: operators/lateness's recommendation drives a REAL
watermarked streaming aggregation.

Law under test: a windowed streaming agg run with watermark >= the
recommended p100 delay retains EVERY row (planted 90-second stragglers
included); the same query with watermark 0 provably drops them (they
target windows the watermark closed batches earlier — beyond the
one-batch-lag absorption edge pinned in test_streaming.py).
"""

import os
import time

import pytest
from pyspark.sql import functions as F

from spanner_data_validator_spark.operators.lateness import (
    watermark_recommendation,
)

N_WAVES = 8
IN_ORDER_PER_WAVE = 90
LATE_PER_WAVE = 10          # waves 3+ carry rows ~90 s behind the frontier
BASE_US = 1_700_000_000_000_000
WAVE_SPACING_US = 30_000_000


def _rows():
    """(arrival, wave, us): 30 s wave cadence; waves >= 3 end with 10 rows
    whose event time sits three waves back (lag ~90 s)."""
    rows, arrival = [], 0
    for k in range(N_WAVES):
        for i in range(IN_ORDER_PER_WAVE):
            rows.append((arrival, k, BASE_US + k * WAVE_SPACING_US
                         + i * 100_000))
            arrival += 1
        if k >= 3:
            for i in range(LATE_PER_WAVE):
                rows.append((arrival, k, BASE_US + (k - 3) * WAVE_SPACING_US
                             + i * 100_000))
                arrival += 1
    return rows


def _stage(spark, tmp_path):
    in_dir = str(tmp_path / "in")
    os.makedirs(in_dir)
    base = time.time() - 3600
    for k in range(N_WAVES):
        wave_rows = [(a, u) for a, w, u in _rows() if w == k]
        df = spark.createDataFrame(
            spark.sparkContext.parallelize(wave_rows, 1),
            "arrival long, us long").select(
            "arrival", F.timestamp_micros(F.col("us")).alias("ts"))
        dst = f"{in_dir}/w{k:04d}"
        df.write.parquet(dst)
        for name in os.listdir(dst):
            os.utime(os.path.join(dst, name), (base + k, base + k))
    # far-future sentinel wave: pushes the watermark past every real window
    # so append mode emits them all; its own window can never close, so it
    # never reaches the sink (the flagship's sentinel discipline)
    sent = spark.createDataFrame(
        spark.sparkContext.parallelize([(10**9, BASE_US + 10**12)], 1),
        "arrival long, us long").select(
        "arrival", F.timestamp_micros(F.col("us")).alias("ts"))
    dst = f"{in_dir}/w9999"
    sent.write.parquet(dst)
    for name in os.listdir(dst):
        os.utime(os.path.join(dst, name), (base + N_WAVES, base + N_WAVES))
    return in_dir


def _run_windowed_count(spark, in_dir, tmp_path, watermark_s, tag):
    out = str(tmp_path / f"out_{tag}")
    stream = (spark.readStream.schema("arrival long, ts timestamp")
              .option("maxFilesPerTrigger", 1).parquet(f"{in_dir}/*"))
    agg = (stream.withWatermark("ts", f"{watermark_s} seconds")
           .groupBy(F.window("ts", "10 seconds").alias("w"))
           .agg(F.count(F.lit(1)).alias("n")))
    q = (agg.writeStream.format("parquet").option("path", out)
         .option("checkpointLocation", str(tmp_path / f"ckpt_{tag}"))
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination()
    got = spark.read.parquet(out).agg(F.sum("n")).first()[0]
    return got or 0


def test_recommended_watermark_retains_all_rows(spark, tmp_path):
    rows = _rows()
    df = spark.createDataFrame(
        [(a, u) for a, _, u in rows], "arrival long, us long").select(
        "arrival", F.timestamp_micros(F.col("us")).alias("ts"))
    rec = {r["pct"]: r["watermark_s"] for r in watermark_recommendation(
        df, F.col("arrival"), F.col("ts"), pcts=(100,)).collect()}
    w100 = rec[100]
    assert 90 <= w100 <= 120  # ~three waves behind plus intra-wave spread

    in_dir = _stage(spark, tmp_path)
    n_total = len(rows)
    n_late = (N_WAVES - 3) * LATE_PER_WAVE

    # sized by the profiler: every straggler's window is still open
    counted = _run_windowed_count(spark, in_dir, tmp_path, w100, "sized")
    assert counted == n_total

    # watermark 0: straggler windows closed ~2 waves before their arrival
    # (well beyond the one-batch-lag absorption edge) — all of them drop
    counted0 = _run_windowed_count(spark, in_dir, tmp_path, 0, "zero")
    assert counted0 == n_total - n_late
