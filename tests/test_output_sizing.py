"""Tests for sources/output.py (sized writes)."""

import glob

import pytest
from pyspark.sql import functions as F

from spanner_data_validator_spark.sources.output import (
    estimate_bytes,
    sized_partition_count,
    write_sized,
)


def test_sized_partition_count_clamps():
    assert sized_partition_count(0, 100) == 1
    assert sized_partition_count(99, 100) == 1
    assert sized_partition_count(101, 100) == 2
    assert sized_partition_count(10**12, 100, max_files=500) == 500
    with pytest.raises(ValueError):
        sized_partition_count(1, 0)


def test_estimate_bytes_scales_with_rows(spark):
    small = spark.range(0, 100).select(F.col("id"), F.lit("x" * 50).alias("s"))
    big = spark.range(0, 10_000).select(F.col("id"), F.lit("x" * 50).alias("s"))
    n1, b1 = estimate_bytes(small)
    n2, b2 = estimate_bytes(big)
    assert (n1, n2) == (100, 10_000)
    assert b2 > b1 * 50  # ~100x rows -> ~100x bytes

    n0, b0 = estimate_bytes(small.limit(0))
    assert (n0, b0) == (0, 0)


def test_write_sized_controls_file_count(spark, tmp_path):
    df = spark.range(0, 20_000).select(
        F.col("id"), F.lit("payload" * 8).alias("s")).repartition(32)
    # tiny target -> several files; huge target -> exactly one
    out1 = str(tmp_path / "many")
    n1 = write_sized(df, out1, target_bytes=50_000, compression_ratio=1.0)
    files1 = glob.glob(out1 + "/part-*")
    assert len(files1) == n1 > 3

    out2 = str(tmp_path / "one")
    n2 = write_sized(df, out2, target_bytes=1 << 30)
    assert n2 == 1 and len(glob.glob(out2 + "/part-*")) == 1
    # data intact either way
    assert spark.read.parquet(out1).count() == 20_000
    assert spark.read.parquet(out2).count() == 20_000


def test_write_sized_partition_cols_colocate(spark, tmp_path):
    df = spark.range(0, 5_000).select((F.col("id") % 4).alias("k"), "id")
    out = str(tmp_path / "keyed")
    write_sized(df, out, target_bytes=40_000, compression_ratio=1.0,
                partition_cols=["k"])
    back = spark.read.parquet(out)
    # each key lands wholly in one file
    per = (back.select("k", F.input_file_name().alias("f")).distinct()
               .groupBy("k").count().collect())
    assert all(r["count"] == 1 for r in per)
