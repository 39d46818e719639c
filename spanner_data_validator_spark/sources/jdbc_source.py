"""Predicate-per-range JDBC source (reference S3/S4 JdbcIO.readAll analogue).

The reference fans a driver-computed range list out to ``JdbcIO.readAll``,
executing ``SELECT ... WHERE key >= ? AND key < ?`` once per range
(JDBCToSpannerDVTWithHash.java:580-604, binding :559-562; pooled connections
common/HikariPoolableDataSourceProvider.java:8-63). Spark's exact analogue is
``spark.read.jdbc(url, table, predicates=[...])`` — one partition per
predicate, each executor issuing its own range query; connection pooling is
the JDBC driver/DataSource's concern, parallelism is the predicate list.

No database ships in this sandbox, so tests cover the predicate/plan
construction (the part with reference semantics); the reader call itself is a
thin pass-through to ``spark.read.jdbc``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from spanner_data_validator_spark.operators.ranges import (
    PartitionRange,
    fetch_ranges,
    long_ranges_with_filter,
)


def range_predicates(
    ranges: list[PartitionRange],
    key_col: str,
    field_type: str = "LONG",
    *,
    contiguous: bool = True,
) -> list[str]:
    """Render ranges as SQL predicates covering every key EXACTLY once.

    Predicate i is the half-open ``key >= r[i].start AND key < r[i+1].start``
    and the final predicate closes at the last range's end (``<=``).

    Deliberate divergence from the reference, which is internally
    inconsistent: its sample specs bind ``>= ? AND < ?`` over *closed*
    adjacent ranges (TableSpecList.java:58,71 — the seam key between two
    ranges is never read), while session-generated SQL binds
    ``>= @p1 AND <= @p2`` (dto/session/SpannerTable.java:117-118 — the
    final range's overlapping start, LongPartitionRangeListFetcher.java:92-107,
    is read twice). Deriving bounds from consecutive range STARTS gives
    complete, duplicate-free coverage under either fetcher quirk.
    """
    quote = field_type.upper() in ("UUID", "STRING", "TIMESTAMP")

    def lit(v: str) -> str:
        if quote:
            # escape embedded quotes — a boundary value containing ' would
            # otherwise render malformed (injectable) SQL on the remote DB
            return "'" + v.replace("'", "''") + "'"
        # numeric domains: validate the bound really is numeric before
        # interpolating it into SQL pushed to the remote database
        float(v)
        return v

    if contiguous:
        preds = []
        for i, r in enumerate(ranges):
            if i + 1 < len(ranges):
                preds.append(
                    f"{key_col} >= {lit(r.start)} AND {key_col} < {lit(ranges[i + 1].start)}"
                )
            else:
                preds.append(f"{key_col} >= {lit(r.start)} AND {key_col} <= {lit(r.end)}")
        return preds
    # non-contiguous lists (partition-filter sampling): deriving bounds from
    # consecutive starts would silently FILL the gaps the filter skipped —
    # render each range independently instead. Where a kept range touches or
    # overlaps the NEXT kept range (the generator's seed/closing ranges can
    # be adjacent), clip to a half-open bound so the seam key is read exactly
    # once; elsewhere the closed bound matches the reference's
    # session-generated SQL (>= @p1 AND <= @p2, SpannerTable.java:117-118).
    numeric = not quote
    preds = []
    for i, r in enumerate(ranges):
        nxt = ranges[i + 1].start if i + 1 < len(ranges) else None
        overlaps = nxt is not None and (
            (int(r.end) >= int(nxt)) if numeric else (r.end >= nxt))
        if overlaps:
            preds.append(f"{key_col} >= {lit(r.start)} AND {key_col} < {lit(nxt)}")
        else:
            preds.append(f"{key_col} >= {lit(r.start)} AND {key_col} <= {lit(r.end)}")
    return preds


def ranged_predicates_for(
    field_type: str,
    key_col: str,
    start: str,
    end: str,
    partitions: int,
    *,
    coverage: float = 1.0,
    partition_filter_ratio: int = 0,
) -> list[str]:
    """Driver-side scan planning: range fetcher (§2.7) → predicate list."""
    if partition_filter_ratio > 0 and field_type.upper() in ("LONG", "INTEGER", "INT"):
        ranges = long_ranges_with_filter(start, end, partitions, partition_filter_ratio)
        return range_predicates(ranges, key_col, field_type, contiguous=False)
    ranges = fetch_ranges(field_type, start, end, partitions, coverage)
    return range_predicates(ranges, key_col, field_type,
                            contiguous=coverage >= 1.0)


def read_jdbc_ranged(
    spark: SparkSession,
    url: str,
    table: str,
    key_col: str,
    field_type: str,
    start: str,
    end: str,
    partitions: int,
    *,
    coverage: float = 1.0,
    partition_filter_ratio: int = 0,
    properties: dict[str, str] | None = None,
) -> DataFrame:
    """One Spark partition per key range, each running its own bound query —
    the JdbcIO.readAll fan-out with Catalyst predicate pushdown."""
    preds = ranged_predicates_for(
        field_type, key_col, start, end, partitions,
        coverage=coverage, partition_filter_ratio=partition_filter_ratio,
    )
    return spark.read.jdbc(url, table, predicates=preds,
                           properties=properties or {})
