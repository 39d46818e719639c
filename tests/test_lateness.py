"""operators/lateness: distributed prefix-max lag == single-window truth,
and the watermark recommendation's retention contract."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from spanner_data_validator_spark.operators.lateness import (
    arrival_lag,
    lag_histogram,
    watermark_recommendation,
)


def _corpus(seed: int, n: int) -> pd.DataFrame:
    """Deterministic scrambled-arrival corpus: unique arrival, ts with
    planted disorder (some rows carry old event times)."""
    import random

    rng = random.Random(seed)
    base = 1_700_000_000_000_000  # us
    rows = []
    frontier = base
    for i in range(n):
        frontier += rng.randrange(1, 5_000_000)
        ts = frontier - (rng.randrange(0, 60_000_000)
                         if rng.random() < 0.3 else 0)
        rows.append((i * 7 + 3, ts))  # arrival unique, gappy
    return pd.DataFrame(rows, columns=["arrival", "us"])


def _spark_lags(spark, pdf: pd.DataFrame, n_buckets: int) -> dict[int, int]:
    df = spark.createDataFrame(pdf).select(
        "arrival", F.timestamp_micros(F.col("us")).alias("ts"))
    out = arrival_lag(df, F.col("arrival"), F.col("ts"), n_buckets=n_buckets)
    return {r["arrival"]: r["lag_us"] for r in out.collect()}


def _truth_lags(pdf: pd.DataFrame) -> dict[int, int]:
    run, out = -1 << 62, {}
    for _, r in pdf.sort_values("arrival").iterrows():
        run = max(run, int(r.us))
        out[int(r.arrival)] = run - int(r.us)
    return out


@pytest.mark.parametrize("seed,n,buckets", [(1, 200, 8), (2, 500, 1024),
                                            (3, 64, 1), (4, 300, 7)])
def test_arrival_lag_matches_single_pass_truth(spark, seed, n, buckets):
    pdf = _corpus(seed, n)
    assert _spark_lags(spark, pdf, buckets) == _truth_lags(pdf)


def test_arrival_lag_bucket_boundaries_do_not_matter(spark):
    pdf = _corpus(9, 257)
    assert _spark_lags(spark, pdf, 2) == _spark_lags(spark, pdf, 251)


def test_watermark_recommendation_retention_contract(spark):
    """For every returned (pct, watermark_s, rows_within): rows_within rows
    have ceil-second lag <= watermark_s, rows_within >= ceil(pct*n/100),
    and watermark_s is minimal (watermark_s - 1 retains fewer than the
    rank)."""
    pdf = _corpus(11, 400)
    df = spark.createDataFrame(pdf).select(
        "arrival", F.timestamp_micros(F.col("us")).alias("ts"))
    rec = {r["pct"]: (r["watermark_s"], r["rows_within"])
           for r in watermark_recommendation(
               df, F.col("arrival"), F.col("ts"),
               pcts=(50, 90, 99, 100)).collect()}
    truth = _truth_lags(pdf)
    need_s = sorted((lag + 999_999) // 1_000_000 for lag in truth.values())
    n = len(need_s)
    for pct, (w, within) in rec.items():
        rank = -(-pct * n // 100)  # ceil
        assert within == sum(1 for s in need_s if s <= w)
        assert within >= rank
        if w > 0:
            assert sum(1 for s in need_s if s <= w - 1) < rank
    assert rec[100][0] == max(need_s)
    assert rec[100][1] == n


def test_in_order_stream_recommends_zero(spark):
    pdf = pd.DataFrame({"arrival": range(100),
                        "us": [1_700_000_000_000_000 + i * 1_000_000
                               for i in range(100)]})
    df = spark.createDataFrame(pdf).select(
        "arrival", F.timestamp_micros(F.col("us")).alias("ts"))
    rows = watermark_recommendation(
        df, F.col("arrival"), F.col("ts"), pcts=(50, 100)).collect()
    assert all(r["watermark_s"] == 0 for r in rows)
    assert all(r["rows_within"] == 100 for r in rows)


def test_lag_histogram_is_ceil_seconds(spark):
    df = spark.createDataFrame(
        pd.DataFrame({"lag_us": [0, 1, 999_999, 1_000_000, 1_000_001,
                                 2_500_000]}))
    got = {r["lag_s"]: r["n"] for r in lag_histogram(df).collect()}
    assert got == {0: 1, 1: 3, 2: 1, 3: 1}


def test_bad_pct_rejected(spark):
    df = spark.range(3).select(
        F.col("id").alias("arrival"),
        F.timestamp_micros(F.col("id") * 1_000_000).alias("ts"))
    with pytest.raises(ValueError):
        watermark_recommendation(df, F.col("arrival"), F.col("ts"),
                                 pcts=(0,))
    with pytest.raises(ValueError):
        watermark_recommendation(df, F.col("arrival"), F.col("ts"),
                                 pcts=(99.5,))


def test_recommend_watermark_cli(spark, tmp_path, capsys):
    """jobs/recommend_watermark end-to-end: parquet in, JSON out."""
    import json

    from spanner_data_validator_spark.jobs.recommend_watermark import main

    pdf = _corpus(21, 150)
    df = spark.createDataFrame(pdf).select(
        "arrival", F.timestamp_micros(F.col("us")).alias("ts"))
    df.write.parquet(str(tmp_path / "in"))
    out_json = tmp_path / "rec.json"
    main(["--input", str(tmp_path / "in"), "--arrival", "arrival",
          "--ts", "ts", "--pcts", "50,100", "--json", str(out_json)])
    rows = json.loads(out_json.read_text())
    assert [r["pct"] for r in rows] == [50, 100]
    truth = _truth_lags(pdf)
    max_need = max((l + 999_999) // 1_000_000 for l in truth.values())
    assert rows[1]["watermark_s"] == max_need
    assert rows[1]["rows_within"] == len(pdf)
    assert "RECOMMEND_RESULT" in capsys.readouterr().out


def test_grouped_arrival_lag_is_per_group(spark):
    """Each group has its own frontier: a row late vs ANOTHER group's
    frontier but in-order within its own must read lag 0."""
    rows = [
        # group a: frontier races ahead
        ("a", 1, 10_000_000), ("a", 2, 90_000_000),
        # group b: later arrivals, earlier event times, but in-order
        ("b", 3, 1_000_000), ("b", 4, 2_000_000),
        # group a: one straggler 80s behind its own frontier
        ("a", 5, 10_500_000),
    ]
    df = spark.createDataFrame(rows, "g string, arrival long, us long") \
        .select("g", "arrival",
                F.timestamp_micros(F.col("us")).alias("ts"))
    got = {(r["g"], r["arrival"]): r["lag_us"]
           for r in arrival_lag(df, F.col("arrival"), F.col("ts"),
                                group="g", n_buckets=4).collect()}
    assert got == {("a", 1): 0, ("a", 2): 0, ("b", 3): 0, ("b", 4): 0,
                   ("a", 5): 79_500_000}


def test_grouped_recommendation_matches_per_group_truth(spark):
    from spanner_data_validator_spark.operators.lateness import (
        watermark_recommendation_by,
    )

    pdfs = {g: _corpus(seed, 150) for g, seed in (("x", 5), ("y", 6))}
    rows = [(g, int(r.arrival), int(r.us))
            for g, pdf in pdfs.items() for _, r in pdf.iterrows()]
    df = spark.createDataFrame(rows, "g string, arrival long, us long") \
        .select("g", "arrival",
                F.timestamp_micros(F.col("us")).alias("ts"))
    rec = {(r["g"], r["pct"]): (r["watermark_s"], r["rows_within"])
           for r in watermark_recommendation_by(
               df, "g", F.col("arrival"), F.col("ts"),
               pcts=(50, 100)).collect()}
    for g, pdf in pdfs.items():
        need = sorted((l + 999_999) // 1_000_000
                      for l in _truth_lags(pdf).values())
        assert rec[(g, 100)] == (max(need), len(need))
        w50, within50 = rec[(g, 50)]
        assert within50 == sum(1 for s in need if s <= w50)
        assert within50 >= -(-50 * len(need) // 100)
