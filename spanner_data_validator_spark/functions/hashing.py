"""Seeded 64-bit-ish hash families used by sketching operators.

Two families with one protocol — ``hash_fn(col, seed) -> Column`` yielding a
LONG whose low ``bits`` are uniform:

* ``xxhash64_family`` (64 bits/word) — Spark's JVM xxhash64, the fast default
  for production sketches (SimHash/MinHash signatures).
* ``portable_hash60`` (60 bits/word) — the first 15 hex chars of
  md5(seed || ':' || value) parsed base-16. Slower (md5), but expressible
  verbatim in any ANSI-ish engine (DuckDB: ``('0x' || substr(md5(...),1,15))
  ::BIGINT``), which makes sketch pipelines built on it oracle-checkable
  end-to-end. Demo/correctness queries use this family; the operators default
  to xxhash64.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

PORTABLE_HASH_BITS = 60


def xxhash64_family(c: Column, seed: int = 0) -> Column:
    """Seeded xxhash64 word (all 64 bits significant, sign bit included)."""
    return F.xxhash64(c, F.lit(seed))


def portable_hash60(c: Column, seed: int = 0) -> Column:
    """60-bit engine-portable hash: md5 hex prefix parsed as base-16.

    Identical SQL exists in DuckDB/Postgres/etc. — see
    ``portable_hash60_sql`` for the oracle-side rendering.
    """
    preimage = F.concat_ws(":", F.lit(str(seed)), c)
    return F.conv(F.substring(F.md5(preimage), 1, 15), 16, 10).cast("long")


def portable_hash60_sql(expr: str, seed: int = 0) -> str:
    """DuckDB rendering of ``portable_hash60`` over SQL expression ``expr``."""
    return f"('0x' || substr(md5('{seed}:' || {expr}), 1, 15))::BIGINT"
