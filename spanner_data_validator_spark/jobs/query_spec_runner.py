"""Execute a reference-shaped QueryTableSpec end-to-end over JDBC.

This is the bridge from the reference's config surface (dialect SQL with
range binds) to the Spark validation plan: for each partition range the
bind placeholders are substituted (``?``/``?`` on the source side,
``@p1``/``@p2`` on the destination side — TableSpecList.java:56-80,
dto/session/SourceTable.java:104-106 / SpannerTable.java:116-118), each bound
query becomes one single-partition JDBC subquery scan, the per-range scans
union into one side (the JdbcIO.readAll fan-out,
JDBCToSpannerDVTWithHash.java:580-604), and both sides flow through the
standard fingerprint → full-outer classify → tally plan.

Row hashing follows HashResult.fromJDBCResultSet (dto/HashResult.java:173-326):
EVERY selected column contributes its normalized serialization to the
concatenated preimage; the match key is the column at ``range_field_index``
in the SELECT list. Column NAMES may differ between dialects (source vs
Spanner names) — both sides are renamed positionally before the join, which
is exactly the reference's behavior (it never joins by name).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spanner_data_validator_spark.operators.comparator import (
    classify_pair,
    tally_report,
)
from spanner_data_validator_spark.functions.fingerprint import fingerprint_turns
from spanner_data_validator_spark.operators.ranges import (
    PartitionRange,
    fetch_ranges,
    long_ranges_with_filter,
)
from spanner_data_validator_spark.sources.tablespec import QueryTableSpec


def _quote(v: str, field_type: str) -> str:
    if field_type.upper() in ("UUID", "STRING", "TIMESTAMP"):
        return "'" + v.replace("'", "''") + "'"
    float(v)  # numeric domains: validate before interpolating
    return v


def bind_query(sql: str, lo: str, hi: str, *, dialect: str, field_type: str) -> str:
    """Substitute one range's bounds into a spec query.

    ``dialect='source'`` replaces the two positional ``?`` in order;
    ``dialect='dest'`` replaces ``@p1`` / ``@p2``.
    """
    lo_l, hi_l = _quote(lo, field_type), _quote(hi, field_type)
    if dialect == "source":
        out = sql.replace("?", lo_l, 1)
        if out == sql:
            raise ValueError(f"no positional bind found in source query: {sql}")
        return out.replace("?", hi_l, 1)
    if dialect == "dest":
        if "@p1" not in sql or "@p2" not in sql:
            raise ValueError(f"no @p1/@p2 binds found in dest query: {sql}")
        return sql.replace("@p1", lo_l).replace("@p2", hi_l)
    raise ValueError(f"unknown dialect {dialect}")


def spec_ranges(spec: QueryTableSpec) -> list[PartitionRange]:
    """The spec's partition ranges, with the loader's coverage-unit quirk
    normalized: the reference's JSON default is 100 while the fetchers treat
    1 as full coverage — values > 1 are interpreted as percent."""
    coverage = spec.range_coverage / 100 if spec.range_coverage > 1 else spec.range_coverage
    if spec.partition_filter_ratio > 0 and \
            spec.range_field_type.upper() in ("LONG", "INTEGER", "INT"):
        return long_ranges_with_filter(spec.range_start, spec.range_end,
                                       spec.partition_count,
                                       spec.partition_filter_ratio)
    return fetch_ranges(spec.range_field_type, spec.range_start, spec.range_end,
                        spec.partition_count, coverage)


def read_spec_side(
    spark: SparkSession,
    url: str,
    spec: QueryTableSpec,
    *,
    dialect: str,
    properties: dict[str, str] | None = None,
    ranges: list[PartitionRange] | None = None,
) -> DataFrame:
    """One single-partition JDBC scan per bound range query, unioned.

    Each range's SQL runs as a subquery scan on its own connection — Spark
    schedules all ranges' partitions concurrently, the readAll fan-out.
    """
    sql = spec.source_query if dialect == "source" else spec.dest_query
    ranges = ranges if ranges is not None else spec_ranges(spec)
    parts = []
    for i, r in enumerate(ranges):
        bound = bind_query(sql, r.start, r.end, dialect=dialect,
                           field_type=spec.range_field_type)
        parts.append(spark.read.jdbc(url, f"({bound}) AS r{i}",
                                     properties=properties or {}))
    return reduce(DataFrame.unionByName, parts)


def validate_query_spec(
    spark: SparkSession,
    spec: QueryTableSpec,
    source_url: str,
    target_url: str,
    *,
    source_properties: dict[str, str] | None = None,
    target_properties: dict[str, str] | None = None,
    algo: str = "xxhash64",
    run_name: str = "run",
) -> DataFrame:
    """Full spec-driven validation: ranged reads on both sides → positional
    column rename → fingerprint over ALL selected columns → full-outer
    classify on the range-field column → per-range ComparerResult tally."""
    ranges = spec_ranges(spec)
    src = read_spec_side(spark, source_url, spec, dialect="source",
                         properties=source_properties, ranges=ranges)
    tgt = read_spec_side(spark, target_url, spec, dialect="dest",
                         properties=target_properties, ranges=ranges)

    def positional(df: DataFrame) -> DataFrame:
        return df.toDF(*[f"c{i}" for i in range(len(df.columns))])

    src, tgt = positional(src), positional(tgt)
    n_cols = min(len(src.columns), len(tgt.columns))
    payload_cols = [f"c{i}" for i in range(n_cols)]
    key = f"c{spec.range_field_index}"
    fp = dict(algo=algo)
    s = fingerprint_turns(src.select(*payload_cols), [key], payload_cols, **fp)
    t = fingerprint_turns(tgt.select(*payload_cols), [key], payload_cols, **fp)
    classified = classify_pair(s, t, [key])
    report = tally_report(
        classified,
        F.pmod(F.xxhash64(F.col(key)), F.lit(max(1, spec.partition_count))),
        run_name=run_name,
    )
    return report.select(
        "run_name", F.lit(spec.table_name).alias("table_or_query"),
        "range", "match_count", "source_count", "target_count",
        "source_conflict_count", "target_conflict_count")
