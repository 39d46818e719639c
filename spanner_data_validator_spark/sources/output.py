"""Output sizing: the small-files / giant-files control for the write path.

At 10^12 rows the sink's file layout matters as much as the plan: a
32k-task job writing 32k tiny parquet files per day destroys the NEXT
job's scan (listing + footer overhead dominate), while one 500 GB file
serializes a downstream scan's parallelism. ``write_sized`` picks the
partition count from the data itself:

1. estimate on-disk bytes from a bounded sample of rows (serialized with
   the same compression assumptions, scaled by the sampled-row share), or
   take the caller's estimate;
2. ``n_files = clamp(ceil(bytes / target_bytes), 1, max_files)``;
3. ``repartition(n_files)`` (round-robin — even file sizes) or
   ``repartition(n_files, *cols)`` when downstream wants co-location, then
   write.

Cost honesty: the estimate needs a row count (one full execution of the
plan, cheap for a scan but NOT for a computed DataFrame) plus a bounded
``limit(sample_rows)`` width probe, and the write executes the plan again.
For an expensive upstream plan either pass ``est_bytes`` (skips estimation
entirely), or set ``persist=True`` (persist → size → write → unpersist —
one upstream execution). Parquet's columnar encoding compresses 2-5x
better than the row-wise width estimate — ``compression_ratio`` defaults
to 3 and is worth calibrating per table; sizing is a heuristic, being
within 2x of target is the win versus being off by 1000x.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def estimate_bytes(df: DataFrame, *, sample_rows: int = 10_000,
                   compression_ratio: float = 3.0) -> tuple[int, int]:
    """Return (row_count, estimated_on_disk_bytes) from one bounded pass.

    Width is measured as the UTF-8/byte length of every column rendered to
    its natural binary/string form, averaged over the first ``sample_rows``
    rows, then divided by ``compression_ratio``.
    """
    width_cols = []
    for f in df.schema.fields:
        c = F.col(f.name)
        if f.dataType.typeName() == "binary":
            width_cols.append(F.coalesce(F.length(c), F.lit(0)))
        elif f.dataType.typeName() in ("array", "map", "struct"):
            width_cols.append(F.coalesce(F.length(F.to_json(c)), F.lit(0)))
        else:
            width_cols.append(F.coalesce(F.length(c.cast("string")), F.lit(0)))
    width = sum(width_cols[1:], width_cols[0]) if width_cols else F.lit(8)

    n = df.count()
    if n == 0:
        return 0, 0
    sampled = df.limit(sample_rows).agg(
        F.avg(width).alias("w")).collect()[0].w or 8.0
    return n, int(n * float(sampled) / compression_ratio)


def sized_partition_count(est_bytes: int, target_bytes: int,
                          *, max_files: int = 100_000) -> int:
    """ceil(bytes/target) clamped to [1, max_files]."""
    if target_bytes <= 0:
        raise ValueError("target_bytes must be positive")
    return max(1, min(max_files, math.ceil(est_bytes / target_bytes)))


def write_sized(df: DataFrame, path: str, *, target_bytes: int = 512 << 20,
                partition_cols: list[str] | None = None,
                mode: str = "error", fmt: str = "parquet",
                compression_ratio: float = 3.0,
                max_files: int = 100_000,
                est_bytes: int | None = None,
                persist: bool = False) -> int:
    """Write ``df`` to ``path`` in ~``target_bytes`` files; returns the
    file count used. Round-robin repartition by default (uniform file
    sizes); pass ``partition_cols`` to keep key co-location (file sizes
    then follow the key distribution — combine with salting for skew).

    ``est_bytes`` skips the estimation pass (use when the size is known);
    ``persist=True`` materializes ``df`` once so a computed upstream plan
    is not executed separately for the count and the write."""
    if persist:
        df = df.persist()
    try:
        if est_bytes is None:
            _, est_bytes = estimate_bytes(
                df, compression_ratio=compression_ratio)
        n_files = sized_partition_count(est_bytes, target_bytes,
                                        max_files=max_files)
        out = (df.repartition(n_files, *partition_cols) if partition_cols
               else df.repartition(n_files))
        out.write.mode(mode).format(fmt).save(path)
    finally:
        if persist:
            df.unpersist()
    return n_files
