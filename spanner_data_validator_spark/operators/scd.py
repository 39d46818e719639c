"""Type-2 slowly-changing-dimension build from an upsert/CDC log.

The complement of `validate_upserts` (which collapses a CDC log to
last-writer-wins current state): ``scd2_build`` keeps the full history as
one row per (key, version) with ``effective_from`` / ``effective_to``
(exclusive) and an ``is_current`` flag — the standard warehouse shape for
point-in-time joins (see `operators/asof` for querying it).

Plan shape: ONE exchange keyed by ``key``; the change-collapse lag window,
the version lead window, and the row filter all share that partitioning +
ordering, so history build is shuffle-once + in-partition sort no matter
how long the log is. No state, no driver loops — a 10^12-row CDC log
builds in one pass.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def scd2_build(log: DataFrame, key: Sequence[str], ts_ms: Column,
               payload: Column, tiebreak: Column) -> DataFrame:
    """Build the type-2 dimension: (key..., payload, effective_from_ms,
    effective_to_ms, version, is_current).

    * Consecutive rows with an unchanged ``payload`` collapse (no-op updates
      produce no version — the reference semantics a MERGE-based SCD build
      has).
    * ``effective_to_ms`` is the next version's start (exclusive), NULL for
      the open (current) version.
    * ``tiebreak`` totalizes equal timestamps; the LAST writer at a given
      (ts, tiebreak) order wins that instant, matching last-writer-wins.
    """
    keys = list(key)
    w = Window.partitionBy(*keys).orderBy(F.col("__ts").asc(),
                                          F.col("__tb").asc())
    rows = log.select(*keys, ts_ms.cast("long").alias("__ts"),
                      payload.alias("__p"), tiebreak.alias("__tb"))
    prev_p = F.lag("__p").over(w)
    # null-safe change test + explicit first-row rule: a NULL payload is a
    # legitimate version (lag()'s NULL on row 1 must not be read as "same")
    changed = (F.row_number().over(w) == 1) | ~prev_p.eqNullSafe(F.col("__p"))
    versions = rows.withColumn("__chg", changed).where(F.col("__chg"))
    w2 = Window.partitionBy(*keys).orderBy(F.col("__ts").asc(),
                                           F.col("__tb").asc())
    out = (versions
           .withColumn("effective_to_ms", F.lead("__ts").over(w2))
           .withColumn("version", F.row_number().over(w2)))
    return out.select(
        *keys,
        F.col("__p").alias("payload"),
        F.col("__ts").alias("effective_from_ms"),
        "effective_to_ms",
        "version",
        F.col("effective_to_ms").isNull().alias("is_current"))
