"""jobs/stats_report.py: the statistical reconciliation CLI end to end."""
from __future__ import annotations

from pyspark.sql import functions as F

from spanner_data_validator_spark.jobs.stats_report import (
    build_stats_report,
    main,
    summarize,
)


def _corpus(spark, mutate: bool):
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    if not mutate:
        return ev
    # planted degradation: a constant value on a key slice shifts the
    # distribution and creates MAD outliers
    return ev.withColumn(
        "value", F.when(F.col("event_id") % 9 == 0, F.lit(9999.99))
                  .otherwise(F.col("value")))


def test_build_stats_report_detects_planted_degradation(spark):
    src = _corpus(spark, mutate=False)
    tgt = _corpus(spark, mutate=True)
    tiers = build_stats_report(spark, src, tgt,
                               value_col="value", group_col="event_type")
    summary = dict((t, v) for t, _, v in summarize(tiers))
    assert summary["ks"] > 0.05          # distribution visibly shifted
    assert summary["mad"] > 0            # planted outliers flagged
    assert summary["profile"] > 0
    # identical inputs -> KS exactly 0, no signal
    clean = build_stats_report(spark, src, src,
                               value_col="value", group_col="event_type")
    assert dict((t, v) for t, _, v in summarize(clean))["ks"] == 0.0


def test_stats_report_cli_writes_all_tiers(spark, tmp_path):
    src_dir = str(tmp_path / "src")
    tgt_dir = str(tmp_path / "tgt")
    _corpus(spark, mutate=False).write.parquet(src_dir)
    _corpus(spark, mutate=True).write.parquet(tgt_dir)
    out = str(tmp_path / "report")
    main(["--source", src_dir, "--target", tgt_dir,
          "--value-col", "value", "--group-col", "event_type",
          "--out", out, "--master", "local[4]"])
    for tier in ("profile", "ks", "mad", "benford", "summary"):
        assert spark.read.parquet(f"{out}/{tier}").count() > 0
    s = {r["tier"]: r["value"]
         for r in spark.read.parquet(f"{out}/summary").collect()}
    assert s["ks"] > 0.05 and s["mad"] > 0
