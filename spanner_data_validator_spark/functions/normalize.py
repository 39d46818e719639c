"""Canonical normalization-to-string of column values before fingerprinting.

Re-expresses (Spark-first, as Catalyst column expressions — zero Python in the
hot path) the reference's per-type serialization rules from
``dto/HashResult.java`` in GoogleCloudPlatform/spanner-data-validator:

=================  ===========================================  =======================
type               rule                                          reference (file:line)
=================  ===========================================  =======================
STRING             raw; NULL -> ''                               dto/HashResult.java:90-92
BYTES/BINARY       Base64                                        dto/HashResult.java:103-104
INT/LONG/FLOAT     decimal string                                dto/HashResult.java:106-113
DECIMAL            strip trailing zeros, plain string            dto/HashResult.java:260-267
TIMESTAMP          epoch millis; /1000 -> seconds when           dto/HashResult.java:115-129,
                   adjust_timestamp_precision (default True)     common/DVTOptionsCore.java:203-205
DATE               '%d%d%d' year/month/day, NO zero padding      dto/HashResult.java:131-138
BOOL               'true'/'false'                                dto/HashResult.java:140-142
ARRAY              element strings concatenated                  dto/HashResult.java:199-207
JSON (opt-in)      order/nesting-insensitive normalization       common/JSONNormalizer.java:29-91
=================  ===========================================  =======================

SQL NULL contributes the empty string everywhere (so ``('a', NULL)`` and
``(NULL, 'a')`` concatenate identically — a documented reference ambiguity;
our engine's fingerprint adds an explicit field separator, see
``functions/fingerprint.py``).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _strip_trailing_zeros(s: Column) -> Column:
    # "1.2300" -> "1.23", "5.000" -> "5" (BigDecimal.stripTrailingZeros().toPlainString())
    no_zeros = F.regexp_replace(s, r"(\.\d*?)0+$", r"$1")
    return F.regexp_replace(no_zeros, r"\.$", "")


def normalize_column(
    col: Column | str,
    dtype: T.DataType,
    *,
    adjust_timestamp_precision: bool = True,
    json_normalize: bool = False,
    java_json: bool = False,
) -> Column:
    """Return a STRING column holding the canonical serialization of ``col``.

    ``json_normalize=True`` (string columns only) applies the key-order- and
    nesting-insensitive JSON flattening of the reference's JSONNormalizer via a
    vectorized pandas UDF (the one place an expression can't express it);
    ``java_json=True`` selects the byte-compatible variant (Java scalar
    rendering + UTF-16 TreeSet order — reference-parity mode).
    """
    c = F.col(col) if isinstance(col, str) else col

    if isinstance(dtype, T.StringType):
        if json_normalize:
            from spanner_data_validator_spark.functions.fingerprint import (
                normalize_json_ref_udf,
                normalize_json_udf,
            )

            udf = normalize_json_ref_udf if java_json else normalize_json_udf
            return F.coalesce(udf(c), F.lit(""))
        return F.coalesce(c, F.lit(""))
    if isinstance(dtype, T.BinaryType):
        return F.coalesce(F.base64(c), F.lit(""))
    if isinstance(dtype, T.BooleanType):
        # NULL must contribute '' — a plain when/otherwise would fold NULL
        # into the otherwise('false') branch and hash NULL == false
        return F.when(c.isNull(), F.lit("")).when(c, "true").otherwise("false")
    if isinstance(dtype, T.DecimalType):
        return F.coalesce(_strip_trailing_zeros(c.cast("string")), F.lit(""))
    if isinstance(dtype, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)):
        return F.coalesce(c.cast("string"), F.lit(""))
    if isinstance(dtype, (T.FloatType, T.DoubleType)):
        return F.coalesce(c.cast("string"), F.lit(""))
    if isinstance(dtype, (T.TimestampType, T.TimestampNTZType)):
        # parquet timestamps surface as TIMESTAMP_NTZ in Spark 4; with the
        # session pinned to UTC both kinds normalize to the same epoch
        ts = c.cast("timestamp") if isinstance(dtype, T.TimestampNTZType) else c
        millis = (F.unix_micros(ts) / F.lit(1000)).cast("long")
        val = (millis / F.lit(1000)).cast("long") if adjust_timestamp_precision else millis
        return F.coalesce(val.cast("string"), F.lit(""))
    if isinstance(dtype, T.DateType):
        ymd = F.concat(
            F.year(c).cast("string"), F.month(c).cast("string"), F.dayofmonth(c).cast("string")
        )
        return F.coalesce(ymd, F.lit(""))
    if isinstance(dtype, T.ArrayType):
        # transform each element with the scalar rule, then concatenate with no
        # delimiter (dto/HashResult.java:199-207 appends element strings directly)
        mapped = F.transform(c, lambda x: _normalize_scalar_lambda(x, dtype.elementType))
        return F.coalesce(F.array_join(mapped, ""), F.lit(""))
    raise TypeError(f"Unsupported type for normalization: {dtype}")  # HashResult.java:144-145


def _normalize_scalar_lambda(x: Column, dtype: T.DataType) -> Column:
    """Element-wise rule usable inside F.transform (no F.col references)."""
    if isinstance(dtype, T.StringType):
        return F.coalesce(x, F.lit(""))
    if isinstance(dtype, T.BooleanType):
        return F.when(x.isNull(), F.lit("")).when(x, "true").otherwise("false")
    if isinstance(dtype, T.DecimalType):
        return F.coalesce(_strip_trailing_zeros(x.cast("string")), F.lit(""))
    return F.coalesce(x.cast("string"), F.lit(""))


@F.pandas_udf(T.StringType())
def nfc_normalize_udf(s):  # pragma: no cover - exercised via queries/tests
    """Unicode NFC normalization, Arrow-vectorized (no per-row Python UDF).

    Spark has no built-in Unicode-normalization expression, so this is the
    canonical "UDFs are the slow path, but when you must: pandas_udf"
    seam — one batched C-level ``unicodedata.normalize`` per Arrow batch.
    Composed and decomposed forms of the same text ("e\\u0301" vs
    "\\u00e9") otherwise fingerprint as different rows — a false MISMATCH
    the reference would also report (its Java path never normalizes;
    dto/HashResult.java:90-92 hashes the raw string). DuckDB's
    ``nfc_normalize`` is the oracle twin.
    """
    import unicodedata

    return s.map(lambda x: unicodedata.normalize("NFC", x)
                 if x is not None else None)
