"""Row fingerprints over normalized column tuples.

The reference reduces every row to ``Base64(SHA-256(utf8(concat(values))))``
with NO delimiter between values (dto/HashResult.java:85-147 StringBuilder loop;
Helpers.java:348-360 digest). We keep the normalization rules but insert an
explicit 0x1F field separator so ``('ab', '')`` and ``('a', 'b')`` cannot
collide — allowed because the contract is reference-identical *tally
semantics*, not byte-identical hashes (SURVEY.md §1.2).

Two fingerprint algorithms:

* ``xxhash64`` — 64-bit, JVM whole-stage-codegen, the hot-path default.
* ``sha256``   — hex SHA-256 via ``F.sha2``, when 64 bits of collision
  resistance is not enough (10^12 rows → use sha256 in production runs;
  birthday bound on xxhash64 at 10^12 keys is ~2.7% — measurable).

JSON normalization (common/JSONNormalizer.java:29-91) is the one rule that
needs Python: parse, recursively collect every leaf as ``key+value`` (bare
``key`` for nulls, bare ``value`` for array scalars) into a *sorted,
deduplicated* set, concatenate. Unparseable input is returned verbatim.
Implemented as an Arrow-vectorized pandas UDF (no per-row Python fallback).
"""

from __future__ import annotations

import json

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

FIELD_SEP = "\x1f"  # unit separator: explicit field boundary inside the preimage


# ---------------------------------------------------------------------------
# JSON normalization (pandas UDF — Arrow batched)
# ---------------------------------------------------------------------------

def _collect_leaves(obj, out: set[str]) -> None:
    # mirrors JSONNormalizer.traverseJSONObject/traverseJSONArray semantics
    if isinstance(obj, dict):
        for k, v in obj.items():
            if isinstance(v, (dict, list)):
                _collect_leaves(v, out)
            elif v is None:
                out.add(k)
            else:
                out.add(k + _scalar_str(v))
    elif isinstance(obj, list):
        for v in obj:
            if v is None:
                continue  # JSONNormalizer skips null array slots
            if isinstance(v, (dict, list)):
                _collect_leaves(v, out)
            else:
                out.add(_scalar_str(v))


def _scalar_str(v) -> str:
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float) and v.is_integer() and abs(v) < 1e15:
        return f"{v:.1f}"  # Java Double.toString(1.0) == "1.0"
    return str(v)


def normalize_json_string(raw: str | None) -> str | None:
    """Pure-python core of the normalizer (unit-testable without Spark)."""
    if raw is None:
        return None
    try:
        parsed = json.loads(raw)
    except (ValueError, TypeError):
        return raw
    if not isinstance(parsed, (dict, list)):
        return raw  # org.json accepts only objects/arrays at top level
    leaves: set[str] = set()
    _collect_leaves(parsed, leaves)
    return "".join(sorted(leaves))


@F.pandas_udf(T.StringType())
def normalize_json_udf(s: pd.Series) -> pd.Series:
    # plain map, nulls skipped. A vectorized "doesn't start with {/[" prefilter
    # was tried and REVERTED: on transcript tool columns every non-null value
    # is JSON, so the regex pass + series copy was pure overhead on the
    # fingerprint hot path (measured as a batch-throughput regression in the
    # 16-core scaling run); the exception fallback only triggers for non-JSON
    # strings, which are rare by construction
    return s.map(normalize_json_string, na_action="ignore")


# ---------------------------------------------------------------------------
# Fingerprint expressions
# ---------------------------------------------------------------------------

def normalized_payload(
    df: DataFrame,
    cols: list[str],
    *,
    json_cols: set[str] | frozenset[str] = frozenset(),
    adjust_timestamp_precision: bool = True,
    sep: str = FIELD_SEP,
) -> Column:
    """Concatenate the canonical serialization of ``cols`` in SELECT order.

    Null contributes '' (reference rule); the explicit separator keeps field
    boundaries unambiguous. Stays entirely inside whole-stage codegen unless a
    column is listed in ``json_cols`` (then that one column goes through the
    Arrow-batched JSON-normalizer UDF).
    """
    from spanner_data_validator_spark.functions.normalize import normalize_column

    dtypes = dict(zip(df.schema.names, [f.dataType for f in df.schema.fields]))
    parts = [
        normalize_column(
            c,
            dtypes[c],
            adjust_timestamp_precision=adjust_timestamp_precision,
            json_normalize=c in json_cols,
        )
        for c in cols
    ]
    return F.concat_ws(sep, *parts)


def fingerprint_expr(payload: Column, algo: str = "xxhash64") -> Column:
    """Hash a normalized payload string.

    xxhash64 → LongType (codegen'd, zero-copy); sha256 → hex StringType
    (Helpers.java:348-360 analogue; we use hex not Base64 — same information).
    """
    if algo == "xxhash64":
        return F.xxhash64(payload)
    if algo == "sha256":
        return F.sha2(payload, 256)
    raise ValueError(f"unknown fingerprint algo: {algo}")


def fingerprint_turns(
    df: DataFrame,
    key_cols: list[str],
    payload_cols: list[str],
    *,
    algo: str = "xxhash64",
    json_cols: set[str] | frozenset[str] = frozenset(),
    keep_payload: bool = False,
    ts_col: str | None = None,
) -> DataFrame:
    """Project a row stream down to ``key_cols + [fingerprint (+ payload, ts)]``.

    This is the map-side reduction the reference performs in
    HashResult.fromSpannerStruct / fromJDBCResultSet (dto/HashResult.java:77-326):
    everything not needed for the match is dropped *before* the shuffle, so at
    100 TB the exchange carries only keys + 8-byte hashes.
    """
    payload = normalized_payload(df, payload_cols, json_cols=json_cols)
    out = [F.col(k) for k in key_cols] + [fingerprint_expr(payload, algo).alias("fingerprint")]
    if keep_payload:
        out.append(payload.alias("payload"))
    if ts_col is not None:
        out.append(F.col(ts_col))
    return df.select(*out)
