"""Strict file ingestion: schema-enforced CSV / JSON-lines readers with a
corrupt-record quarantine split.

The reference reads databases (JDBC/Spanner, SURVEY §2 S3/S5); file drops
are the other half of real migration feeds, and their failure mode is rows
that don't parse. Spark's default PERMISSIVE mode silently nulls the bad
columns — at 100 TB "silently" is the problem. These readers make the
split explicit:

* the declared schema is REQUIRED (never inferSchema — inference is a
  second full scan AND a schema that drifts with the data);
* each line is read as text and parsed with ``from_json`` / ``from_csv``
  carrying a corrupt-record field, so the RAW line and the parsed fields
  are ordinary columns of one scan. This deliberately avoids the
  DataFrameReader ``_corrupt_record`` pseudo-column, whose internal-column
  restriction (Spark disallows plans referencing only it — SPARK-21610)
  makes "count the bad rows" throw AnalysisException unless you cache;
* ``split_quarantine`` separates (good, quarantine): good rows drop the
  carrier columns, quarantined rows keep the verbatim line for
  replay/forensics. Both halves are filters over the same scan.

Parsing stays JVM-side (from_json/from_csv are codegen'd Catalyst
expressions) — one text scan, zero Python in the row path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

CORRUPT_COL = "_corrupt_record"
_RAW_COL = "_raw_line"


def _with_corrupt_carrier(schema: StructType) -> StructType:
    if CORRUPT_COL in schema.fieldNames():
        raise ValueError(f"schema already defines {CORRUPT_COL!r}")
    # never schema.add(): StructType.add MUTATES the caller's schema object
    return StructType(list(schema.fields)
                      + [StructField(CORRUPT_COL, StringType(), True)])


def _parse_lines(lines: DataFrame, parsed) -> DataFrame:
    out = lines.select(parsed.alias("__r"),
                       F.col("value").alias(_RAW_COL))
    return out.select("__r.*", _RAW_COL)


def read_jsonl_strict(spark: SparkSession, path: str,
                      schema: StructType) -> DataFrame:
    """JSON-lines with declared schema. Unparseable / type-mismatched lines
    get ``_corrupt_record`` set; every row keeps its verbatim ``_raw_line``."""
    opts = {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": CORRUPT_COL}
    lines = spark.read.text(path)
    return _parse_lines(
        lines, F.from_json(F.col("value"), _with_corrupt_carrier(schema),
                           opts))


def read_csv_strict(spark: SparkSession, path: str, schema: StructType,
                    *, header: bool = True, sep: str = ",") -> DataFrame:
    """CSV with declared schema; malformed lines (wrong column count,
    uncastable values) get ``_corrupt_record`` set.

    With ``header=True`` the exact rendered header line (schema field names
    joined by ``sep``) is dropped wherever it appears — per-FILE headers in
    a multi-file directory are all removed, which the line-oriented text
    scan could not otherwise attribute to file starts.
    """
    opts = {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": CORRUPT_COL,
            "sep": sep}
    lines = spark.read.text(path)
    if header:
        header_line = sep.join(schema.fieldNames())
        lines = lines.where(F.col("value") != F.lit(header_line))
    return _parse_lines(
        lines, F.from_csv(F.col("value"),
                          _with_corrupt_carrier(schema).simpleString(),
                          opts))


def split_quarantine(raw: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Split a strict-read frame into (good, quarantine).

    good: parsed rows, carrier columns dropped. quarantine: one column
    ``_corrupt_record`` holding the verbatim rejected line. Writing the
    quarantine next to the ingest output gives every batch an exact,
    replayable record of what was rejected.
    """
    if CORRUPT_COL not in raw.columns or _RAW_COL not in raw.columns:
        raise ValueError("frame was not produced by a strict reader "
                         f"({CORRUPT_COL!r}/{_RAW_COL!r} columns missing)")
    good = (raw.where(F.col(CORRUPT_COL).isNull())
            .drop(CORRUPT_COL, _RAW_COL))
    bad = (raw.where(F.col(CORRUPT_COL).isNotNull())
           .select(F.col(_RAW_COL).alias(CORRUPT_COL)))
    return good, bad
