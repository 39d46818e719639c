"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship validation pipeline on sf0.001;
``queries()`` / ``oracle_sql()`` expose every implemented operator with its
DuckDB oracle (see spanner_data_validator_spark/plans/demo_queries.py).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full dual-stream validation report (fingerprint → full-outer
    match → classify → per-range ComparerResult tally) on sf0.001."""
    from pyspark.sql import functions as F

    from spanner_data_validator_spark.operators.comparator import tally_report
    from spanner_data_validator_spark.plans.demo_queries import classified_events

    cls = classified_events(spark, "/root/testdata/sf0.001")
    return tally_report(cls, F.pmod(F.col("key"), F.lit(16)), run_name="flagship")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from spanner_data_validator_spark.plans.demo_queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from spanner_data_validator_spark.plans.demo_queries import ORACLES

    return dict(ORACLES)
