"""Complex-event-processing operators: MATCH_RECOGNIZE-style sequence
patterns and absence (timeout) detection over keyed event streams.

The reference validator (GoogleCloudPlatform/spanner-data-validator) compares
rows pairwise and has no sequence operators; CEP is part of THIS engine's
streaming tier per the north rule ("structured-streaming / CEP engine ...
over multi-turn conversation / agent transcripts"). The operators here give
the classic CEP trio — ordered-pattern match, quantified repetition, and
A-not-followed-by-B timeout — as pure DataFrame expressions.

Scale design (10^12 events, 1000 executors):

* ``match_recognize`` shuffles ``(key, order cols, 1-char symbol)`` only —
  payloads are dropped map-side by the symbolizer projection. Per-key state
  is the symbol string (one char per event), bounded by the key's own event
  count exactly like a session-window aggregation; there is no cross-key
  state and no join.
* Pattern evaluation is a single JVM ``regexp_count`` / ``regexp_instr``
  over that string — whole-stage codegen, no Python in the path.
* ``absence_alerts`` is join-free: one shuffle on the key, then a single
  window-function pass (conditional min over the following frame). The
  naive formulation is a time-band self-join (events × events); this one
  never materializes pairs.
* Streaming: the same symbol aggregation runs under a watermarked
  ``session_window`` (append mode) — state per open session, eviction at
  watermark, identical results to the batch expression on the same input.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["symbolize", "match_recognize", "absence_alerts"]


def symbolize(symbols: list[tuple[str, Column]], *, default: str = "-") -> Column:
    """Map each row to a 1-character pattern symbol via a when-chain.

    ``symbols`` is an ordered list of ``(char, condition)``; first hit wins
    (MATCH_RECOGNIZE DEFINE clauses are evaluated in order the same way).
    Rows matching nothing get ``default`` — keep it out of your pattern
    alphabet so it acts as a separator for strict-contiguity patterns.
    """
    if not symbols:
        raise ValueError("symbolize needs at least one (char, condition)")
    for ch, _ in symbols:
        if len(ch) != 1:
            raise ValueError(f"pattern symbols must be single chars, got {ch!r}")
    expr = None
    for ch, cond in symbols:
        expr = F.when(cond, ch) if expr is None else expr.when(cond, ch)
    return expr.otherwise(default)


def match_recognize(
    df: DataFrame,
    *,
    key: str | list[str],
    order: list[str],
    symbol: Column,
    pattern: str,
) -> DataFrame:
    """Per-key ordered sequence-pattern match (MATCH_RECOGNIZE core).

    Orders each key's events by ``order`` (must be a deterministic total
    order — include a tiebreaker column), folds them into a symbol string,
    and counts non-overlapping left-to-right ``pattern`` matches (Java regex
    on the Spark side; keep patterns to literal symbols + ``+ * ? | ()``
    quantifiers so any regex dialect agrees).

    Returns one row per key: ``<key...>, n_events, n_matches, first_match``
    (1-based position of the first match in event order, 0 = no match).

    Equivalent SQL (the oracle shape)::

        SELECT key, count(*) AS n_events,
               len(regexp_extract_all(string_agg(sym, '' ORDER BY o1, o2),
                                      pattern)) AS n_matches,
               regexp_instr(...) AS first_match
        FROM symbolized GROUP BY key
    """
    keys = [key] if isinstance(key, str) else list(key)
    sym_rows = df.select(
        *keys, *order, symbol.cast("string").alias("sym")
    )
    # array_sort on structs orders by fields left-to-right → (order..., sym)
    per_key = sym_rows.groupBy(*keys).agg(
        F.array_sort(
            F.collect_list(F.struct(*[F.col(c) for c in order], F.col("sym")))
        ).alias("evs")
    )
    syms = F.array_join(F.expr("transform(evs, e -> e.sym)"), "")
    # Generate barrier: evaluate the concatenated symbol string ONCE per key
    # (CollapseProject would otherwise inline `syms` into every downstream
    # expression — n_matches, first_match — re-running the array transform
    # per use; see CLAUDE.md Catalyst re-evaluation trap).
    with_syms = per_key.select(
        *keys,
        F.size("evs").cast("long").alias("n_events"),
        F.explode(F.array(syms)).alias("syms"),
    )
    return with_syms.select(
        *keys,
        "n_events",
        F.regexp_count(F.col("syms"), F.lit(pattern)).cast("long").alias("n_matches"),
        F.regexp_instr(F.col("syms"), F.lit(pattern)).cast("long").alias("first_match"),
    )


def absence_alerts(
    df: DataFrame,
    *,
    key: str | list[str],
    ts: str,
    order_tiebreak: str,
    start: Column,
    end: Column,
    timeout_ms: int,
) -> DataFrame:
    """Timeout CEP: rows matching ``start`` with NO ``end`` row for the same
    key within ``timeout_ms`` afterwards.

    Join-free formulation: one shuffle on the key, then a conditional
    ``min(end_ts)`` over the strictly-following window frame; a start row
    alerts when that minimum is null (no later end at all) or beyond the
    timeout. "Following" means after in ``(ts, order_tiebreak)`` order, so
    same-timestamp rows resolve deterministically in any engine.

    All time arithmetic runs on epoch MICROseconds (``unix_micros`` /
    DuckDB ``epoch_us``) — exact integer math, no sub-unit truncation to
    diverge on window boundaries across engines.

    Output: all original columns of the alerting start rows, plus
    ``deadline_us`` (start ts + timeout, epoch micros).
    """
    keys = [key] if isinstance(key, str) else list(key)
    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col(ts), F.col(order_tiebreak))
        .rowsBetween(1, Window.unboundedFollowing)
    )
    timeout_us = F.lit(int(timeout_ms) * 1000)
    ts_us = F.unix_micros(F.col(ts))
    next_end_us = F.min(F.when(end, ts_us)).over(w)
    out = df.withColumn("__next_end_us", next_end_us).where(
        start
        & (
            F.col("__next_end_us").isNull()
            | (F.col("__next_end_us") > ts_us + timeout_us)
        )
    )
    return out.select(*df.columns, (ts_us + timeout_us).alias("deadline_us"))
