"""Streaming deduplication: first-occurrence pass-through with bounded state.

Batch dedup (operators/dedup.exact_dedup) sees the whole corpus at once; a
stream cannot — exact dedup over an unbounded stream needs unbounded state.
The production contract is therefore *horizon-bounded* dedup: a record is a
duplicate iff an equal-keyed record was seen within the watermark horizon.
``dropDuplicatesWithinWatermark`` implements exactly that — first occurrence
is emitted immediately (append mode, no emission latency), state for a key is
evicted once the watermark passes its event time + delay, so state size is
``distinct keys per horizon`` instead of ``distinct keys ever``.

At 100 TB/day the sizing rule: state rows ≈ horizon_sec × key_rate ×
(8-byte fingerprint + key cols). Dedup on ``xxhash64(text)`` (or the sha256
fingerprint), never on the text itself — the state store then carries ~40 B
per distinct doc instead of the document. For whole-corpus exact dedup run
the batch operator over the accumulated table; this operator is the
ingest-time guard that keeps repeated crawls/retries from ever landing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def streaming_first_seen(stream: DataFrame, key_cols: list[str], *,
                         ts_col: str, delay: str) -> DataFrame:
    """Emit only the first record per ``key_cols`` within the watermark
    horizon ``delay`` (e.g. ``"1 hour"``). Append-mode safe; no shuffle
    beyond the one hash-exchange onto the dedup key that owns the state.
    """
    return (stream.withWatermark(ts_col, delay)
                  .dropDuplicatesWithinWatermark(key_cols))


def dedup_text_stream(stream: DataFrame, text_col: str, *, ts_col: str,
                      delay: str, fp_col: str = "text_fp",
                      scope_cols: list[str] | None = None) -> DataFrame:
    """Text-stream convenience: state keyed on the 8-byte xxhash64
    fingerprint of the text, not the text bytes (state stays ~40 B/doc).

    ``scope_cols`` extends the dedup key (e.g. ``["lang"]`` for per-language
    dedup). Without a scope the dedup is GLOBAL and the surviving row for a
    text duplicated across scopes is whichever ARRIVED first — an
    order-dependent outcome no batch oracle can replay; scope the key when
    downstream aggregates group by that column (hit at sf0.1: 7 texts
    appear under more than one lang, ORACLE_SWEEP_SF01 r5)."""
    with_fp = stream.withColumn(fp_col, F.xxhash64(F.col(text_col)))
    keys = list(scope_cols or []) + [fp_col]
    return streaming_first_seen(with_fp, keys, ts_col=ts_col, delay=delay)
