"""Fuzzy key linkage: match drifted identifiers across the two sides
without an all-pairs comparison (SymSpell / FastSS deletion blocking).

Why the validator needs it: a migration that "mostly" preserved keys — a
trimmed space, a dropped character, a re-encoded diacritic — produces
SOURCE_ONLY/TARGET_ONLY pairs that a human immediately recognizes as the
same record. The reference has no answer for this (its join is strictly
equality on the partition key); this operator closes that gap Spark-first.

Algorithm (exact for edit distance <= 1, the overwhelmingly common drift):
every key expands to its *deletion neighborhood* — the key itself plus each
single-character-deletion variant. Two strings within Levenshtein distance 1
ALWAYS share a variant (substitution: delete the differing position on both
sides; insert/delete: the shorter string is itself a variant of the longer;
equality: identity variant), so an equi-join on variants finds every true
pair, and ``levenshtein() <= 1`` prunes the false ones. Generalizes to
distance d with d-fold deletions (variant count ~ C(len, d) — practical for
d <= 2; see SymSpell).

Scale shape: the expansion is pure codegen (transform + explode — one
Generate per side), the candidate join is a shuffled equi-join on an 8-byte
variant hash carrying only (hash, id, key), and verification runs once per
candidate pair. No similarity scan ever sees the cross product. Skew guard:
``max_block_size`` drops degenerate variant buckets (e.g. every key sharing
a template) before pair expansion, the same discipline as
``dedup.minhash_lsh_pairs``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from spanner_data_validator_spark.functions.hashing import portable_hash60


def _deletion_variants(key: Column) -> Column:
    """Array of the string plus every single-character deletion.

    j in [0, length]: keep the first j chars, skip char j+1 — j = length
    yields the identity variant. Empty/one-char strings still produce the
    identity (and '' for one-char keys), so distance-1 pairs among short
    keys are covered too.
    """
    return F.transform(
        F.sequence(F.lit(0), F.length(key)),
        lambda j: F.concat(
            key.substr(F.lit(1), j),
            key.substr(j + F.lit(2), F.length(key))))


def deletion_variants_sql(expr: str) -> str:
    """DuckDB rendering of the same deletion neighborhood (for oracles)."""
    return (f"list_transform(range(0, length({expr}) + 1), "
            f"j -> substr({expr}, 1, j) || substr({expr}, j + 2))")


def _exploded(df: DataFrame, key_col: str, id_col: str, side: str,
              hash_seed: int) -> DataFrame:
    """(variant hash, id, key) — one Generate, nothing else on the wire.

    The explode is also the evaluation barrier that keeps the variant
    expression from being re-evaluated per downstream consumer (CLAUDE.md
    CollapseProject gotcha).
    """
    return (df.select(F.col(id_col).alias(f"{side}_id"),
                      F.col(key_col).alias(f"{side}_key"),
                      F.explode(_deletion_variants(F.col(key_col)))
                       .alias("variant"))
            .select(f"{side}_id", f"{side}_key",
                    portable_hash60(F.col("variant"), hash_seed)
                    .alias("vh")))


def fuzzy_candidates(src: DataFrame, tgt: DataFrame, key_col: str,
                     id_col: str, *, hash_seed: int = 11,
                     max_block_size: int | None = None) -> DataFrame:
    """Distinct candidate pairs (src_id, src_key, tgt_id, tgt_key) sharing
    a deletion variant. Complete for levenshtein <= 1 by the pigeonhole
    argument in the module docstring."""
    s = _exploded(src, key_col, id_col, "src", hash_seed)
    t = _exploded(tgt, key_col, id_col, "tgt", hash_seed)
    if max_block_size is not None:
        # each side feeds TWO branches (the hot-bucket count and the
        # anti-join) — Catalyst recomputes the explode+hash per branch
        # (measured 6 Generates instead of 2; the CLAUDE.md multi-branch
        # rescan trap), so pin the exploded tables once before deriving
        # the hot set
        s, t = s.localCheckpoint(), t.localCheckpoint()
        # drop degenerate variant buckets BEFORE the pair expansion; counts
        # come from the union so a bucket hot on either side is dropped
        hot = (s.select("vh").unionAll(t.select("vh"))
               .groupBy("vh").agg(F.count(F.lit(1)).alias("n"))
               .where(F.col("n") > max_block_size)
               .select("vh"))
        s = s.join(F.broadcast(hot), "vh", "left_anti")
        t = t.join(F.broadcast(hot), "vh", "left_anti")
    return (s.join(t, "vh")
            .select("src_id", "src_key", "tgt_id", "tgt_key")
            .distinct())


def fuzzy_match_keys(src: DataFrame, tgt: DataFrame, key_col: str,
                     id_col: str, *, max_dist: int = 1,
                     hash_seed: int = 11,
                     max_block_size: int | None = None) -> DataFrame:
    """Best fuzzy match per source key: the candidate with the smallest
    edit distance, ties broken by target key then target id (deterministic).

    Returns (src_id, src_key, tgt_id, tgt_key, dist). ``max_dist`` must be
    1 for the deletion blocking to be provably complete; larger values
    verify more leniently but candidates are still distance-1-blocked.
    """
    cand = fuzzy_candidates(src, tgt, key_col, id_col, hash_seed=hash_seed,
                            max_block_size=max_block_size)
    verified = (cand
                .withColumn("dist", F.levenshtein("src_key", "tgt_key"))
                .where(F.col("dist") <= max_dist))
    # two-phase per-key top-1: min_by over a struct orders (dist, key, id)
    best = F.struct("dist", "tgt_key", "tgt_id")
    return (verified
            .groupBy("src_id", "src_key")
            .agg(F.min(best).alias("b"))
            .select("src_id", "src_key",
                    F.col("b.tgt_id").alias("tgt_id"),
                    F.col("b.tgt_key").alias("tgt_key"),
                    F.col("b.dist").alias("dist")))
