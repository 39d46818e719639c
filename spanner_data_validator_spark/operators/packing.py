"""Sequence packing for training-batch assembly at 100 TB scale.

``pack_greedy`` assigns documents to fixed-token-budget bins (training
sequences) with the standard greedy sequential fill: walk the docs of a shard
in a deterministic order, start a new bin whenever the next doc would
overflow the budget. Packing is inherently order-sequential, so the scale
design is *shard-parallel*: documents are hash-sharded (deterministically),
each shard packs independently inside ONE `applyInPandas` group, and bins
are namespaced by shard. At 10^9 docs with ~10^5-doc shards that is 10^4
independent groups — the grouping shuffle is the only exchange, and the
per-group work is a vectorized cumsum + one tight loop over bin breaks.

A doc larger than the budget gets a bin of its own (callers chunk oversized
docs upstream); fill never exceeds the budget otherwise.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from spanner_data_validator_spark.functions.hashing import xxhash64_family


def shard_assign(key: Column, n_shards: int, *, hash_fn=None, seed: int = 0) -> Column:
    """Deterministic shard id in [0, n_shards): pmod(hash(key, seed))."""
    hash_fn = hash_fn or xxhash64_family
    return F.pmod(hash_fn(key, seed), F.lit(n_shards)).cast("int")


def _pack_shard(pdf: pd.DataFrame, capacity: int, order_cols: list[str]) -> pd.DataFrame:
    pdf = pdf.sort_values(order_cols, kind="mergesort").reset_index(drop=True)
    toks = pdf["__tokens"].to_numpy()
    bins = []
    offsets = []
    bin_id, fill = 0, 0
    for t in toks:  # sequential by definition; ~10^5 iterations per shard
        if fill > 0 and fill + t > capacity:
            bin_id += 1
            fill = 0
        offsets.append(fill)
        bins.append(bin_id)
        fill += t
    pdf["bin_id"] = pd.Series(bins, dtype="int64")
    pdf["bin_offset"] = pd.Series(offsets, dtype="int64")
    return pdf.drop(columns=["__tokens"])


def pack_concat_chunks(df: DataFrame, id_col: str, tokens: Column, *,
                       context_len: int, n_shards: int,
                       shard_col: str = "shard", hash_fn=None,
                       order_col: str | None = None) -> DataFrame:
    """Concat-and-chunk packing (the other standard mode): treat each shard's
    docs, in deterministic order, as ONE concatenated token stream split into
    fixed ``context_len`` chunks; a doc may straddle a chunk boundary.

    Output: df columns + (shard, tok_start, first_chunk, last_chunk,
    n_chunks) — ``tok_start`` is the doc's offset in the shard stream,
    ``n_chunks`` how many training sequences the doc touches.

    Unlike ``pack_greedy`` this needs no Python at all: one running-sum
    window per shard (sort happens inside the per-shard exchange partition)
    and pure arithmetic. Prefer it when the tokenizer-side loader can split
    documents across sequence boundaries.
    """
    from pyspark.sql import Window

    order = order_col or id_col
    with_keys = df.withColumn(shard_col,
                              shard_assign(F.col(id_col), n_shards,
                                           hash_fn=hash_fn)) \
                  .withColumn("__tokens", tokens.cast("long"))
    w = (Window.partitionBy(shard_col).orderBy(order)
               .rowsBetween(Window.unboundedPreceding, -1))
    start = F.coalesce(F.sum("__tokens").over(w), F.lit(0))
    out = (with_keys
           .withColumn("tok_start", start)
           .withColumn("first_chunk",
                       F.floor(F.col("tok_start") / context_len))
           .withColumn(
               "last_chunk",
               F.floor((F.col("tok_start")
                        + F.greatest(F.col("__tokens"), F.lit(1)) - 1)
                       / context_len))
           .withColumn("n_chunks",
                       F.col("last_chunk") - F.col("first_chunk") + 1))
    return out.drop("__tokens")


def pack_greedy(df: DataFrame, id_col: str, tokens: Column, *,
                capacity: int, n_shards: int,
                shard_col: str = "shard", hash_fn=None,
                order_col: str | None = None) -> DataFrame:
    """Greedy sequential packing: df columns + (shard, bin_id, bin_offset).

    ``tokens`` is the per-doc token-count expression (stays JVM-side; the
    Python boundary carries only (id, shard, token_count) + pass-through
    columns). Docs are ordered by ``order_col`` (default ``id_col``) within
    their shard, so the assignment is deterministic and reproducible across
    runs — a requirement for resumable training-data builds.
    """
    order = order_col or id_col
    capacity = int(capacity)
    with_keys = df.withColumn(shard_col,
                              shard_assign(F.col(id_col), n_shards,
                                           hash_fn=hash_fn)) \
                  .withColumn("__tokens", tokens.cast("long"))
    out_schema = with_keys.drop("__tokens").schema \
        .add("bin_id", "long").add("bin_offset", "long")
    return (with_keys
            .groupBy(shard_col)
            .applyInPandas(
                lambda pdf: _pack_shard(pdf, capacity, [order]),
                schema=out_schema))


def chunk_tokens(df: DataFrame, id_col: str, text_col: str, *,
                 chunk_size: int, stride: int | None = None) -> DataFrame:
    """Split each document's token sequence into fixed-size chunks with
    optional overlap — the context-length splitter upstream of the packers
    (``pack_greedy`` gives oversized docs a bin of their own and expects
    callers to chunk them first; this is that step).

    Output: ``(id, chunk_idx, start, n_tokens, chunk_text)`` with chunk c
    covering tokens ``[c*stride, c*stride + chunk_size)``; the final chunk is
    shorter. ``stride < chunk_size`` gives overlapping chunks (the usual
    LM-pretraining window so no span is seen only truncated).

    Scale shape: the tokenization runs ONCE per document behind an
    ``explode(array(·))`` Generate barrier (CollapseProject would otherwise
    inline the split into every per-chunk slice — O(len·chunks) per doc, the
    CLAUDE.md re-evaluation trap), then ``posexplode(sequence(...))``
    fans out to chunks and ``slice`` reads the materialized array. Pure
    JVM expressions, no shuffle at all — chunking pipelines into whatever
    exchange the downstream packer needs.
    """
    if stride is None:
        stride = chunk_size
    if not (0 < stride and 0 < chunk_size):
        raise ValueError("chunk_size and stride must be positive")
    toks = F.filter(F.split(F.col(text_col), " "), lambda x: x != F.lit(""))
    base = df.select(F.col(id_col), F.explode(F.array(toks)).alias("__toks"))
    n = F.size("__toks")
    starts = F.sequence(F.lit(0), F.greatest(n - 1, F.lit(0)), F.lit(stride))
    fanned = base.select(
        F.col(id_col), F.col("__toks"),
        F.posexplode(starts).alias("chunk_idx", "start"))
    chunk = F.slice("__toks", F.col("start") + 1, chunk_size)
    return fanned.select(
        F.col(id_col),
        F.col("chunk_idx").cast("int"),
        F.col("start").cast("int"),
        F.size(chunk).alias("n_tokens"),
        F.array_join(chunk, " ").alias("chunk_text"))
