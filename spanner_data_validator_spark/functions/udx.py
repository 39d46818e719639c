"""User-defined aggregate (UDAF) and table (UDTF) surface.

The reference's only UDF surface is the custom-transformation JAR (SURVEY
§2 P6 / §2.10); Spark adds two more extension points this module covers
with honest, Arrow-era implementations:

* ``grouped_median`` / ``grouped_mad`` — pandas GROUPED_AGG UDAFs (whole
  group arrives as one Arrow batch; the result is one scalar). Median /
  median-absolute-deviation are the classic aggregates Spark has no exact
  built-in for (percentile_approx is a sketch). Deterministic: pandas sorts
  internally, so partition order can't change the answer.
* ``CharChunks`` — a Python UDTF (one input row → N output rows) emitting
  fixed-width character chunks with exact integer geometry.

Both are THE SLOW PATH by design — per-group/per-row Python with Arrow
transfer. They exist to cover the extension surface; hot paths use the
pure-codegen equivalents (``profile.quantiles_by_rank`` for exact
distributed quantiles, ``packing.chunk_tokens`` for chunking). Scale
caveat for GROUPED_AGG: the whole group must fit one Arrow batch — fine
for per-category aggregates (groups = categories), wrong for
per-user groups with 10^6 rows.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import functions as F
from pyspark.sql import types as T


@F.pandas_udf(T.LongType())
def grouped_count(v: pd.Series) -> int:
    """Group size as a GROUPED_AGG UDF — Spark refuses to mix pandas and
    non-pandas aggregates in one agg() (INVALID_PANDAS_UDF_PLACEMENT), so a
    UDAF query needs its count from the same family."""
    return int(len(v))


@F.pandas_udf(T.DoubleType())
def grouped_median(v: pd.Series) -> float | None:
    """Exact median (mean-of-middle-two on even counts — the same rule
    DuckDB's ``median`` applies to DOUBLE, so results are oracle-exact).
    An all-NULL group yields SQL NULL, matching the oracle (pandas would
    hand back NaN, which is a different double)."""
    m = v.median()
    return None if pd.isna(m) else float(m)


@F.pandas_udf(T.DoubleType())
def grouped_mad(v: pd.Series) -> float | None:
    """Median absolute deviation: median(|x - median(x)|) — the robust
    dispersion measure a drift monitor wants where stddev would chase one
    outlier."""
    med = v.median()
    mad = (v - med).abs().median()
    return None if pd.isna(mad) else float(mad)


class CharChunks:
    """UDTF: split ``text`` into fixed-``width`` character chunks, emitting
    (chunk_idx, chunk_len). Register and use laterally::

        spark.udtf.register("char_chunks", char_chunks_udtf())
        spark.sql("SELECT d.lang, c.* FROM docs d, "
                  "LATERAL char_chunks(d.text, 40) c")

    Empty/NULL text emits no rows. Geometry is exact integers:
    sum(chunk_len) = length(text), count = ceil(length/width).
    """

    def eval(self, text, width: int):  # noqa: ANN001 — UDTF protocol
        if text is None or width is None or width <= 0:
            return
        n = len(text)
        idx = 0
        for start in range(0, n, width):
            yield idx, min(width, n - start)
            idx += 1


def char_chunks_udtf():
    """The CharChunks class wrapped as a Spark UDTF (deferred so importing
    this module never requires an active session)."""
    return F.udtf(CharChunks, returnType="chunk_idx int, chunk_len int")


def arrow_substr_stats(df, key_col: str, text_col: str, needle: str):
    """Arrow-native per-row text stats via ``mapInArrow`` — the third UDX
    surface next to the pandas UDAFs and the UDTF above: batches stay
    pyarrow RecordBatches end to end (no pandas materialization, no per-row
    Python), and the kernel work (`count_substring`, `utf8_length`) runs in
    Arrow's C++ compute layer. This is the seam for vectorized logic the
    SQL expression language can't reach but pandas would slow down —
    at 100 TB it rides the scan stage, zero exchanges.

    Output: (key_col, hits, chars) — non-overlapping ``needle`` occurrence
    count and character length, NULL text propagating NULLs.
    """
    import pyarrow as pa

    out_schema = f"{key_col} long, hits long, chars long"

    def fn(batches):
        import pyarrow.compute as pc

        for b in batches:
            yield pa.RecordBatch.from_arrays(
                [b.column(key_col),
                 pc.cast(pc.count_substring(b.column(text_col), needle),
                         pa.int64()),
                 pc.cast(pc.utf8_length(b.column(text_col)), pa.int64())],
                names=[key_col, "hits", "chars"])

    return df.select(key_col, text_col).mapInArrow(fn, out_schema)
