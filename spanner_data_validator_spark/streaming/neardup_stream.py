"""Streaming near-duplicate ingest guard: screen arriving documents against
a static MinHash-LSH index of the historical corpus — stateless, one
stream-static join per stage.

Batch near-dup dedup (operators/dedup.py) assumes the whole corpus is on
disk. The ingest-time question is different: "is this NEW document a
near-duplicate of anything we already hold?" — and it must be answerable
per micro-batch without rebuilding anything. The classic shape (same as
every production crawl pipeline):

1. OFFLINE, periodically: ``build_lsh_index`` sketches the historical
   corpus into two static tables — LSH band buckets ``(band, band_hash,
   id)`` and per-doc distinct shingle-hash sets ``(id, shs array<long>)``.
   Both are pure expressions per doc (shingle → hash → per-seed min →
   band hash): one Generate, no shuffle; write them bucketed/partitioned
   by their join keys and the streaming joins below never re-shard them.
2. ONLINE: each arriving doc computes the SAME sketch columns
   (per-row expressions — no aggregation, no watermark, no state),
   explodes its bands, and equi-joins the bucket table → candidate
   historical ids. A second stream-static join pulls the candidates'
   shingle sets, and exact Jaccard is evaluated inline with
   ``array_intersect``/set sizes — per candidate pair, zero shuffles of
   the historical corpus. Stream-static joins are STATELESS in Spark; the
   guard's only state is the watermark-bounded pair dedup (a pair matched
   through several bands must emit once), so state is O(matched pairs per
   horizon) and throughput scales with (arriving docs × bands) lookups.

Jaccard here is over 64-bit shingle hashes, not shingle strings — identical
up to hash collisions (~n²/2^64), the same contract as
``operators/dedup.minhash_lsh_pairs``. Recall follows the standard banded
bound 1-(1-j^r)^b; at (32 perms, 16 bands) a 0.7-Jaccard pair is missed
with p < 3e-5, and the pytest/oracle corpus has total recall (asserted).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from spanner_data_validator_spark.functions.hashing import xxhash64_family
from spanner_data_validator_spark.functions.text import shingles


def _rows_per_band(num_perm: int, bands: int) -> int:
    if num_perm % bands:
        raise ValueError("bands must divide num_perm")
    return num_perm // bands


def _shs_expr(text_col: str, n: int, hash_fn) -> Column:
    """Distinct shingle-hash set of a text column (the Jaccard support)."""
    return F.array_distinct(
        F.transform(shingles(F.col(text_col), n), lambda s: hash_fn(s, 0)))


def _sig_exprs(shs: Column, num_perm: int, hash_fn) -> list[Column]:
    """MinHash signature elements: per-seed min over the hashed set."""
    return [F.array_min(F.transform(shs, lambda x: hash_fn(x, i + 1)))
            for i in range(num_perm)]


def _band_hashes(sig: list[Column], bands: int, rows: int,
                 hash_fn) -> Column:
    """Banded LSH bucket keys: hash of each band's signature slice."""
    return F.array(*[
        hash_fn(F.concat_ws(",", *[sig[b * rows + r].cast("string")
                                   for r in range(rows)]), 1_000 + b)
        for b in range(bands)])


def sketch_cols(text_col: str, *, n: int = 3, num_perm: int = 32,
                bands: int = 16, hash_fn=None) -> tuple[Column, Column]:
    """Per-row (shingle-hash set, band-hash array) — raw EXPRESSIONS over
    the same formula :func:`with_sketch` materializes (single source of
    truth: the private _shs/_sig/_band builders).

    WARNING: selecting both outputs directly re-evaluates the shingle+hash
    pipeline once per signature element (CollapseProject inlines the shared
    ``shs`` subexpression into every ``array_min(transform(...))`` — the
    CLAUDE.md re-evaluation trap; measured ~30x on this operator). Use
    :func:`with_sketch` unless you only need ONE of the outputs.
    """
    hash_fn = hash_fn or xxhash64_family
    rows = _rows_per_band(num_perm, bands)
    shs = _shs_expr(text_col, n, hash_fn)
    sig = _sig_exprs(shs, num_perm, hash_fn)
    return shs, _band_hashes(sig, bands, rows, hash_fn)


def with_sketch(df, text_col: str, *, n: int = 3, num_perm: int = 32,
                bands: int = 16, hash_fn=None,
                keep: list[str] | None = None):
    """df → (keep cols..., shs array<long>, bhs array<long>), each sketch
    stage evaluated exactly once per row.

    Two Generate barriers: ``shs`` (shingle-hash set) materializes before
    the 32 per-seed min-folds read it, and the signature array materializes
    before the band hashes slice it — without them Catalyst inlines the
    upstream expression into every consumer (num_perm× the shingle work).
    Works identically on batch and streaming DataFrames (explode of a
    one-element array is supported in streaming plans).
    """
    hash_fn = hash_fn or xxhash64_family
    rows = _rows_per_band(num_perm, bands)
    keep = keep if keep is not None else [c for c in df.columns
                                          if c != text_col]
    stage1 = df.select(*keep, F.explode(F.array(
        _shs_expr(text_col, n, hash_fn))).alias("shs"))
    sig_array = F.array(*_sig_exprs(F.col("shs"), num_perm, hash_fn))
    stage2 = stage1.select(*keep, "shs",
                           F.explode(F.array(sig_array)).alias("__sig"))
    sig_elems = [F.col("__sig")[i] for i in range(num_perm)]
    bhs = _band_hashes(sig_elems, bands, rows, hash_fn)
    return stage2.select(*keep, "shs", bhs.alias("bhs"))


def build_lsh_index(docs: DataFrame, id_col: str, text_col: str, *,
                    n: int = 3, num_perm: int = 32, bands: int = 16,
                    hash_fn=None, materialize: bool = False
                    ) -> tuple[DataFrame, DataFrame]:
    """Static index pair: (buckets ``(band, band_hash, id)``, shingle sets
    ``(id, shs)``). Empty-shingle docs (fewer than n words) are excluded —
    they cannot near-dup-match anything under n-gram Jaccard.

    ``materialize=True`` localCheckpoints the sketch once: the two outputs
    are separate plan branches AND the static side of a stream-static join
    re-evaluates per micro-batch — without it the per-doc sketch work runs
    2 x n_batches times (the CLAUDE.md multi-branch rescan trap). Production
    builds write both tables to storage instead."""
    base = (with_sketch(docs.select(F.col(id_col).alias("id"), text_col),
                        text_col, n=n, num_perm=num_perm, bands=bands,
                        hash_fn=hash_fn, keep=["id"])
            .where(F.size("shs") > 0))
    if materialize:
        base = base.localCheckpoint()
    buckets = base.select(
        "id", F.posexplode("bhs").alias("band", "band_hash")) \
        .select("band", "band_hash", "id")
    sets = base.select("id", "shs")
    return buckets, sets


def neardup_guard(stream: DataFrame, buckets: DataFrame, sets: DataFrame,
                  id_col: str, text_col: str, *, ts_col: str,
                  dedup_delay: str = "10 minutes", n: int = 3,
                  num_perm: int = 32, bands: int = 16,
                  threshold: float = 0.7, hash_fn=None) -> DataFrame:
    """Flag arriving docs near-duplicating the indexed corpus.

    Returns a STREAMING DataFrame ``(in_id, hist_id, jaccard)`` — one row
    per (arriving doc, matched historical doc) with exact hashed-shingle
    Jaccard >= threshold. The two stream-static equi-joins and the set
    arithmetic are stateless; the ONLY state is the
    ``dropDuplicatesWithinWatermark`` that collapses a pair matched through
    several LSH bands (first occurrence emits immediately — no flush
    sentinel needed for output; state holds just the matched pairs inside
    the ``dedup_delay`` horizon, evicted by the ``ts_col`` watermark).
    """
    sketched = with_sketch(
        stream.withWatermark(ts_col, dedup_delay)
              .select(F.col(id_col).alias("in_id"), F.col(ts_col), text_col),
        text_col, n=n, num_perm=num_perm, bands=bands, hash_fn=hash_fn,
        keep=["in_id", ts_col])
    probe = (sketched.withColumnRenamed("shs", "in_shs")
             .where(F.size("in_shs") > 0)
             .select("in_id", ts_col, "in_shs",
                     F.posexplode("bhs").alias("band", "band_hash")))
    cands = (probe.join(buckets, ["band", "band_hash"])
             .select("in_id", ts_col, "in_shs", F.col("id").alias("hist_id")))
    paired = cands.join(sets.withColumnRenamed("id", "hist_id"), "hist_id")
    k = F.size(F.array_intersect("in_shs", "shs"))
    jac = k.cast("double") / (F.size("in_shs") + F.size("shs") - k)
    return (paired.select("in_id", "hist_id", jac.alias("jaccard"),
                          F.col(ts_col))
            .where(F.col("jaccard") >= threshold)
            .dropDuplicatesWithinWatermark(["in_id", "hist_id"])
            .drop(ts_col))
