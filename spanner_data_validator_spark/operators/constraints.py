"""Declarative data-quality constraint suite — the Deequ-style rules tier.

A migration validator's cheapest signal is "does the target still satisfy
the table's invariants": no row join, no second table, ONE aggregate scan.
Each rule compiles to a violation-counting AGGREGATE expression; the whole
suite runs as a single ``agg()`` (one pass, map-side partials), then the
1×k result melts to one row per rule. Null semantics are explicit: for
row-predicate rules a NULL input is a violation unless the rule is
``not_null`` itself testing for it — the predicate builders bake that in.

Scale: k rules cost k expressions inside one WholeStageCodegen scan;
``unique`` adds a count-distinct which Spark plans via EXPAND in the same
aggregation (rows×2 map-side, no extra scan). At 10^12 rows with many
distinct keys swap ``unique`` for the KMV estimate in
``operators/sketch.py`` and a tolerance.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Rule:
    """A named constraint compiled to an aggregate violation count.

    ``additive`` marks rules whose per-partition/per-batch violation counts
    SUM to the global answer (all row-predicate rules). ``unique`` is the
    exception — duplicates can span batches — so streaming monitors must
    reject non-additive rules rather than silently under-count.
    """
    name: str
    violations: Column  # aggregate expression -> long count of violations
    additive: bool = True


def _count_where(cond: Column) -> Column:
    # coalesce: SUM over zero rows is NULL — an empty table/micro-batch must
    # report 0 violations / passed=true, not NULL/NULL
    return F.coalesce(F.sum(F.when(cond, 1).otherwise(0)), F.lit(0))


def not_null(col: str) -> Rule:
    return Rule(f"not_null({col})", _count_where(F.col(col).isNull()))


def in_range(col: str, lo, hi) -> Rule:
    """Violated when outside [lo, hi] or NULL."""
    c = F.col(col)
    return Rule(f"in_range({col},{lo},{hi})",
                _count_where(~c.between(F.lit(lo), F.lit(hi))
                             | c.isNull()))


def accepted_values(col: str, values: Sequence) -> Rule:
    c = F.col(col)
    vals = list(values)
    return Rule(f"accepted_values({col})",
                _count_where(~c.isin(vals) | c.isNull()))


def matches_regex(col: str, pattern: str) -> Rule:
    c = F.col(col)
    return Rule(f"matches_regex({col})",
                _count_where(~c.rlike(pattern) | c.isNull()))


def unique(*cols: str) -> Rule:
    """Violations = rows beyond the first per key. The distinct runs over a
    struct of the key columns so NULL fields group together like GROUP BY
    (a bare count_distinct would silently DROP null-keyed rows)."""
    return Rule(f"unique({','.join(cols)})",
                F.count(F.lit(1))
                - F.count_distinct(F.struct(*[F.col(c) for c in cols])),
                additive=False)


def max_length(col: str, n: int) -> Rule:
    """Pre-migration VARCHAR(n) fit: violated when the string is longer
    than ``n`` characters (NULL fits any width)."""
    return Rule(f"max_length({col},{n})",
                _count_where(F.length(F.col(col)) > n))


def fits_int32(col: str) -> Rule:
    """Target-type INT32 fit for a wider integer column (NULL fits)."""
    c = F.col(col)
    return Rule(f"fits_int32({col})",
                _count_where((c < -2147483648) | (c > 2147483647)))


def check_constraints(df: DataFrame, rules: Sequence[Rule]) -> DataFrame:
    """Run the suite in one aggregate pass.

    Returns one row per rule: (rule string, n_rows long, n_violations
    long, passed boolean), in the order given (an ``ord`` column is kept
    for deterministic downstream sorting).
    """
    aggs = [F.count(F.lit(1)).cast("long").alias("__n")]
    aggs += [r.violations.cast("long").alias(f"__v{i}")
             for i, r in enumerate(rules)]
    wide = df.agg(*aggs)
    per_rule = F.array(*[
        F.struct(F.lit(i).alias("ord"),
                 F.lit(r.name).alias("rule"),
                 F.col(f"__v{i}").alias("n_violations"))
        for i, r in enumerate(rules)])
    return (wide.select(F.col("__n").alias("n_rows"),
                        F.explode(per_rule).alias("r"))
            .select(F.col("r.ord").alias("ord"),
                    F.col("r.rule").alias("rule"),
                    F.col("n_rows"),
                    F.col("r.n_violations").alias("n_violations"),
                    (F.col("r.n_violations") == 0).alias("passed")))
