"""TableSpec-driven multi-table validation (reference O2 + S9 config surface).

The reference validates a list of tables per run, each described by a
``TableSpec`` JSON (dto/TableSpec.java:25-48, loader TableSpecList.java:159-267)
and throttled to ``maxTablesInEffectAtOneTime`` (default 10) concurrent
sub-pipelines via PipelineTracker/Wait.on (PipelineTracker.java:41-65,
common/DVTOptionsCore.java:278-282).

Spark-native form: a ``TableSpec`` dataclass (JSON-loadable), one declarative
validation plan per table, and a bounded thread pool submitting concurrent
Spark actions — the scheduler interleaves their stages, which IS the Wait.on
batching without the hack. Per-table reports union into one ComparerResult
table carrying ``table_or_query`` exactly like the reference's BQ schema
(JDBCToSpannerDVTWithHash.java:123-157).
"""

from __future__ import annotations

import json
from concurrent.futures import ThreadPoolExecutor
from dataclasses import dataclass, field
from functools import reduce

from pyspark.sql import DataFrame, SparkSession

DEFAULT_PARTITION_COUNT = 100  # common/DVTOptionsCore.java:176-180
DEFAULT_MAX_CONCURRENT = 10  # common/DVTOptionsCore.java:278-282


@dataclass
class TableSpec:
    """One table's validation config (dto/TableSpec.java:25-48 analogue)."""

    table_name: str
    source_path: str
    target_path: str
    key_cols: list[str]
    payload_cols: list[str]
    json_cols: list[str] = field(default_factory=list)
    algo: str = "xxhash64"
    num_ranges: int = DEFAULT_PARTITION_COUNT
    timestamp_threshold_millis: int = 0
    timestamp_delta_mins: int = 0
    ts_col: str | None = None
    fmt: str = "parquet"
    # config-driven source transform: "module:function" (+ opaque params),
    # the jarPath/classPath analogue (transform/CustomTransformation.java)
    transformation: str | None = None
    transformation_params: str | None = None

    @staticmethod
    def from_dict(d: dict) -> "TableSpec":
        # tolerate unknown JSON keys like the reference loader (which reads
        # only the fields it knows) — forward-compatible spec files
        from dataclasses import fields

        known = {f.name for f in fields(TableSpec)}
        return TableSpec(**{k: v for k, v in d.items() if k in known})


def load_specs(path: str) -> list[TableSpec]:
    """TableSpecList.getFromJsonFile analogue (TableSpecList.java:159-267)."""
    with open(path) as f:
        raw = json.load(f)
    return [TableSpec.from_dict(d) for d in raw]


def _validate_one(spark: SparkSession, spec: TableSpec, run_name: str):
    from pyspark.sql import functions as F

    from spanner_data_validator_spark.operators.comparator import (
        apply_timestamp_threshold,
        classify_pair,
        tally_report,
    )
    from spanner_data_validator_spark.functions.fingerprint import fingerprint_turns

    def read(p):
        df = spark.read.format(spec.fmt).load(p)
        return df

    kwargs = dict(algo=spec.algo, json_cols=frozenset(spec.json_cols))
    source_df = read(spec.source_path)
    if spec.transformation:
        from spanner_data_validator_spark.operators.transform import (
            apply_custom_transformation,
            load_custom_transformation,
        )

        fn = load_custom_transformation(spec.transformation,
                                        spec.transformation_params)
        source_df = apply_custom_transformation(source_df, fn)
    src = fingerprint_turns(source_df, spec.key_cols,
                            spec.payload_cols, ts_col=spec.ts_col, **kwargs)
    tgt = fingerprint_turns(read(spec.target_path), spec.key_cols,
                            spec.payload_cols, ts_col=spec.ts_col, **kwargs)
    carry = [spec.ts_col] if spec.ts_col else []
    classified = classify_pair(src, tgt, spec.key_cols, carry_cols=carry)
    if spec.timestamp_threshold_millis and spec.ts_col:
        classified = classified.withColumn(
            f"src_{spec.ts_col}_ms", F.unix_millis(F.col(f"src_{spec.ts_col}"))
        ).withColumn(
            f"tgt_{spec.ts_col}_ms", F.unix_millis(F.col(f"tgt_{spec.ts_col}"))
        )
        classified = apply_timestamp_threshold(
            classified,
            threshold_millis=spec.timestamp_threshold_millis,
            delta_mins=spec.timestamp_delta_mins,
            src_ts_col=f"src_{spec.ts_col}_ms",
            tgt_ts_col=f"tgt_{spec.ts_col}_ms",
        )
    range_expr = F.pmod(F.xxhash64(*[F.col(k) for k in spec.key_cols[:1]]),
                        F.lit(spec.num_ranges))
    report = tally_report(classified, range_expr, run_name=run_name)
    return report.select(
        "run_name",
        F.lit(spec.table_name).alias("table_or_query"),
        "range", "match_count", "source_count", "target_count",
        "source_conflict_count", "target_conflict_count",
    )


def run_specs(
    spark: SparkSession,
    specs: list[TableSpec],
    *,
    run_name: str = "run",
    max_concurrent: int = DEFAULT_MAX_CONCURRENT,
    per_table_action=None,
) -> DataFrame:
    """Validate every spec'd table; returns the combined ComparerResult DF.

    Without ``per_table_action`` the result is ONE lazy union plan — Spark
    schedules all tables' stages together when the caller acts on it, and no
    throttle is needed (plan construction is cheap; ``max_concurrent`` is
    irrelevant to a single job).

    With ``per_table_action(report_df, spec)`` each table's report is
    MATERIALIZED (written, counted, …) as its own Spark action, and the
    bounded pool keeps at most ``max_concurrent`` tables' jobs in flight —
    the reference's Wait.on batching (PipelineTracker.java:41-65,
    maxTablesInEffectAtOneTime common/DVTOptionsCore.java:278-282). Actions
    run on pool threads; failures propagate after all submitted work drains.
    """
    reports = [_validate_one(spark, s, run_name) for s in specs]
    if per_table_action is not None:
        workers = max(1, min(max_concurrent, len(specs)))
        with ThreadPoolExecutor(max_workers=workers) as ex:
            futures = [ex.submit(per_table_action, rep, spec)
                       for rep, spec in zip(reports, specs)]
            for f in futures:
                f.result()
    return reduce(DataFrame.unionByName, reports)
