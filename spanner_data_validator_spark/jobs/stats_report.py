"""Statistical reconciliation CLI: the distribution tier as one job.

``python -m spanner_data_validator_spark.jobs.stats_report
    --source <parquet> --target <parquet> --value-col value
    --group-col event_type --out <dir>``

runs the tiers a validator applies when row counts reconcile but the data
still smells wrong, and writes each as a parquet table under ``--out``:

* ``profile/``   — per-column profile of BOTH sides
  (operators/profile.column_profile, side column added)
* ``ks/``        — exact two-sample KS between source and target values
  (operators/stats.ks_two_sample — is the whole distribution intact?)
* ``mad/``       — per-group robust outlier profile of the target
  (operators/stats.robust_outlier_profile — did outliers appear?)
* ``benford/``   — first-digit conformance of the target
  (operators/stats.benford_profile — fabricated rows?)
* ``summary/``   — one row per tier with its headline number, the page a
  human reads first.

Everything engine-exact (see operators/stats.py); the per-tier parquet
outputs are what a scheduler diffs run-over-run. The two inputs load once
each and every tier is an independent aggregation — no tier ever joins
row-granular data across sides.
"""

from __future__ import annotations

import argparse

from pyspark.sql import DataFrame, SparkSession, functions as F


def build_stats_report(spark: SparkSession, source: DataFrame,
                       target: DataFrame, *, value_col: str,
                       group_col: str) -> dict[str, DataFrame]:
    """Assemble the tier DataFrames (pure; the CLI writes them)."""
    from spanner_data_validator_spark.operators.profile import column_profile
    from spanner_data_validator_spark.operators.stats import (
        benford_profile,
        ks_two_sample,
        robust_outlier_profile,
    )

    cols = [c for c in source.columns if c in set(target.columns)]
    prof = (column_profile(source, cols)
            .withColumn("side", F.lit("source"))
            .unionByName(column_profile(target, cols)
                         .withColumn("side", F.lit("target"))))

    both = (source.select(F.col(value_col).alias("v"),
                          F.lit(True).alias("is_src"))
            .unionByName(target.select(F.col(value_col).alias("v"),
                                       F.lit(False).alias("is_src"))))
    ks = ks_two_sample(both, F.col("v"), F.col("is_src"), ~F.col("is_src"))

    mad = robust_outlier_profile(target, group_col, F.col(value_col), k=5)
    benford = benford_profile(target, F.col(value_col))
    return {"profile": prof, "ks": ks, "mad": mad, "benford": benford}


def summarize(tiers: dict[str, DataFrame]) -> list[tuple[str, str, float]]:
    """Headline number per tier: (tier, metric, value). Driver-side over
    already-aggregated tables (every tier output is small by design)."""
    out: list[tuple[str, str, float]] = []
    ks_row = tiers["ks"].collect()[0]
    out.append(("ks", "ks_stat", float(ks_row["ks_stat"] or 0.0)))
    n_out = tiers["mad"].agg(F.sum("n_outliers")).collect()[0][0] or 0
    out.append(("mad", "total_outliers", float(n_out)))
    chi = tiers["benford"].agg(F.sum("chi_term")).collect()[0][0] or 0.0
    out.append(("benford", "chi2", float(chi)))
    n_cols = tiers["profile"].count()
    out.append(("profile", "columns_profiled", float(n_cols)))
    return out


def main(argv: list[str] | None = None) -> None:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--source", required=True)
    ap.add_argument("--target", required=True)
    ap.add_argument("--value-col", required=True)
    ap.add_argument("--group-col", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--master", default=None)
    args = ap.parse_args(argv)

    from spanner_data_validator_spark.session import get_spark

    spark = get_spark(app_name="sdv-stats-report", master=args.master)
    src = spark.read.parquet(args.source)
    tgt = spark.read.parquet(args.target)
    tiers = build_stats_report(spark, src, tgt,
                               value_col=args.value_col,
                               group_col=args.group_col)
    for name, df in tiers.items():
        df.write.mode("overwrite").parquet(f"{args.out}/{name}")
    rows = summarize(tiers)
    spark.createDataFrame(rows, "tier string, metric string, value double") \
        .coalesce(1).write.mode("overwrite").parquet(f"{args.out}/summary")
    for tier, metric, value in rows:
        print(f"{tier}.{metric} = {value}")


if __name__ == "__main__":
    main()
