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
variant hash carrying ONLY (hash, id) — two strings within distance d share
MANY variants (an identical pair shares its whole ~C(len,d) neighborhood),
so the pair-dedup shuffle must move 16-byte id pairs, not key strings; keys
re-attach by id join after the distinct. Verification runs once per
candidate pair, and ``fuzzy_match_keys`` short-circuits exact matches
through a plain key equi-join so only the unmatched residue pays for
deletion blocking at all. No similarity scan ever sees the cross product.
Skew guard: ``max_block_size`` drops degenerate variant buckets (e.g. every
key sharing a template) before pair expansion, the same discipline as
``dedup.minhash_lsh_pairs``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from spanner_data_validator_spark.functions.hashing import portable_hash60


def _del1(s: Column) -> Column:
    """Array of the string plus every single-character deletion.

    j in [0, length]: keep the first j chars, skip char j+1 — j = length
    yields the identity variant. Empty/one-char strings still produce the
    identity (and '' for one-char keys), so distance-1 pairs among short
    keys are covered too. Works on lambda variables, so it nests.
    """
    return F.transform(
        F.sequence(F.lit(0), F.length(s)),
        lambda j: F.concat(
            s.substr(F.lit(1), j),
            s.substr(j + F.lit(2), F.length(s))))


def _deletion_variants(key: Column, d: int = 1) -> Column:
    """The ≤d-fold deletion neighborhood (identity included).

    d=2 applies the single-deletion map to every d=1 variant (each of which
    contains its own identity, so the union covers 0, 1, and 2 deletions)
    and dedups — ~C(len,2) variants per key, the documented SymSpell cost.
    """
    if d not in (1, 2):
        raise ValueError("deletion blocking supports d in {1, 2}")
    vs = _del1(key)
    if d == 2:
        vs = F.array_distinct(F.flatten(F.transform(vs, _del1)))
    return vs


def deletion_variants_sql(expr: str, d: int = 1) -> str:
    """DuckDB rendering of the same deletion neighborhood (for oracles)."""
    def del1(e: str, var: str) -> str:
        return (f"list_transform(range(0, length({e}) + 1), "
                f"{var} -> substr({e}, 1, {var}) || substr({e}, {var} + 2))")

    if d == 2:
        return (f"list_distinct(flatten(list_transform({del1(expr, 'j')}, "
                f"v -> {del1('v', 'i')})))")
    return del1(expr, "j")


def _exploded(df: DataFrame, key_col: str, id_col: str, side: str,
              hash_seed: int, d: int = 1) -> DataFrame:
    """(variant hash, id) — one Generate, nothing else on the wire.

    The explode is also the evaluation barrier that keeps the variant
    expression from being re-evaluated per downstream consumer (CLAUDE.md
    CollapseProject gotcha). Keys deliberately stay OFF the wire: the
    variant join fans out to every shared variant, so its shuffle must
    carry the 8-byte id, not the key string.
    """
    # the ~C(len,d) neighborhood expansion happens in THIS stage — a
    # few-file input would pin it to that many cores (CLAUDE.md gotcha);
    # a real large table arrives in thousands of splits and skips this.
    # NOTE: `.rdd.getNumPartitions()` is only cheap on scans and
    # checkpointed frames — on a join output it compiles (and on reuse
    # re-executes) the whole upstream plan, which is why fuzzy_match_keys
    # checkpoints the residue before it reaches this guard (measured 8.1 s
    # -> ~1 s for the residue explode at sf0.1 d=2).
    par = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < par:
        df = df.repartition(par)
    # vh is INTERNAL blocking state: oracles replay the join on the variant
    # *strings* and the levenshtein verify prunes any hash collision, so the
    # fast JVM xxhash64 is safe here (portable_hash60's md5 measured 12x
    # slower on the sf0.1 d=2 expansion for zero oracle benefit)
    return (df.select(F.col(id_col).alias(f"{side}_id"),
                      F.explode(_deletion_variants(F.col(key_col), d))
                       .alias("variant"))
            .select(f"{side}_id",
                    F.xxhash64(F.col("variant"), F.lit(hash_seed))
                    .alias("vh")))


def fuzzy_candidates(src: DataFrame, tgt: DataFrame, key_col: str,
                     id_col: str, *, hash_seed: int = 11,
                     max_block_size: int | None = None,
                     d: int = 1, broadcast_src: bool = False) -> DataFrame:
    """Distinct candidate pairs (src_id, src_key, tgt_id, tgt_key) sharing
    a ≤d-fold deletion variant. Complete for levenshtein <= d (d in {1, 2}):
    each edit operation between u and v maps to at most one deletion on each
    side toward a common string, so lev(u,v) <= d implies the d-deletion
    neighborhoods intersect (the SymSpell/FastSS invariant).

    ``id_col`` must uniquely identify a row on its side — the pair-dedup
    runs on (src_id, tgt_id) and keys re-attach by id afterwards (a
    duplicated id would fan that join out).

    ``broadcast_src=True`` ships the src-side exploded (vh, id) table to
    every executor so the (much larger) target expansion streams through a
    broadcast-hash join with no shuffle or sort — the right plan when src
    is the small residue of an exact-match short-circuit (Catalyst cannot
    see through the explode to estimate this itself). The exploded wire
    rows are 16 bytes, so even a million-key residue broadcasts in ~10s of
    MB; ``fuzzy_match_keys`` decides from measured residue stats.
    """
    s = _exploded(src, key_col, id_col, "src", hash_seed, d)
    t = _exploded(tgt, key_col, id_col, "tgt", hash_seed, d)
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
    pairs = ((F.broadcast(s) if broadcast_src else s).join(t, "vh")
             .select("src_id", "tgt_id")
             .distinct())
    return (pairs
            .join(src.select(F.col(id_col).alias("src_id"),
                             F.col(key_col).alias("src_key")), "src_id")
            .join(tgt.select(F.col(id_col).alias("tgt_id"),
                             F.col(key_col).alias("tgt_key")), "tgt_id")
            .select("src_id", "src_key", "tgt_id", "tgt_key"))


def fuzzy_match_keys(src: DataFrame, tgt: DataFrame, key_col: str,
                     id_col: str, *, max_dist: int = 1,
                     hash_seed: int = 11,
                     max_block_size: int | None = None,
                     algo: str = "deletion") -> DataFrame:
    """Best fuzzy match per source key: the candidate with the smallest
    edit distance, ties broken by target key then target id (deterministic).

    Returns (src_id, src_key, tgt_id, tgt_key, dist). Deletion blocking is
    provably complete for ``max_dist`` in {1, 2} (the neighborhood depth
    follows max_dist); larger values verify more leniently but candidates
    are still distance-2-blocked.

    Exact matches short-circuit: a source key with an identical target key
    always wins at dist 0 (every dist-0 candidate has tgt_key == src_key,
    so the struct-min reduces to the smallest tgt_id), so those keys
    resolve through a plain equi-join and only the unmatched residue pays
    for the deletion-neighborhood expansion — in a mostly-preserved
    migration that is the overwhelming majority of rows skipping the
    expensive path (5.7x on the sf0.1 d=2 bench query).
    """
    s = src.select(F.col(id_col).alias("src_id"),
                   F.col(key_col).alias("src_key"))
    t = tgt.select(F.col(id_col).alias("tgt_id"),
                   F.col(key_col).alias("tgt_key"))
    exact = (s.join(t, F.col("src_key") == F.col("tgt_key"))
             .groupBy("src_id", "src_key")
             .agg(F.min(F.struct(F.lit(0).alias("dist"),
                                 F.col("tgt_key"), F.col("tgt_id")))
                  .alias("b")))
    # Residue = the drifted minority (sources with no exact target). It
    # feeds FOUR downstream branches inside fuzzy_candidates (repartition
    # guard, explode, key re-attach) and Catalyst re-executes the anti-join
    # per branch (CLAUDE.md multi-branch rescan trap) — and `.rdd` on the
    # un-checkpointed join plan alone costs a full plan compile. Trim to
    # (id, key) and pin it once; by construction it is the small unmatched
    # slice, so the checkpoint is bounded even when the inputs are not.
    residue = (src.select(F.col(id_col).alias(id_col),
                          F.col(key_col).alias(key_col))
               .join(tgt.select(F.col(key_col).alias("__tgt_key")).distinct(),
                     F.col(key_col) == F.col("__tgt_key"), "left_anti")
               .localCheckpoint())
    # the checkpoint makes residue stats one cheap local scan; estimate the
    # exploded wire size (~C(len+1, d) 16-byte rows per key) and broadcast
    # the residue expansion under ~128 MB so the full-target expansion
    # streams through a shuffle-free broadcast-hash join
    d = min(max_dist, 2)
    n_res, avg_len = residue.agg(
        F.count(F.lit(1)), F.coalesce(F.avg(F.length(key_col)), F.lit(0.0))
    ).first()
    variants_per_key = 1 + avg_len + (avg_len * (avg_len - 1) / 2 if d == 2
                                      else 0)
    bcast = n_res * variants_per_key * 16 < 128 * 1024 * 1024
    if algo == "passjoin":
        cand = passjoin_candidates(residue, tgt, key_col, id_col,
                                   d=d, broadcast_src=bcast)
    elif algo == "deletion":
        cand = fuzzy_candidates(residue, tgt, key_col, id_col,
                                hash_seed=hash_seed,
                                max_block_size=max_block_size,
                                d=d, broadcast_src=bcast)
    else:
        raise ValueError(f"unknown candidate algo {algo!r}")
    verified = (cand
                .withColumn("dist", F.levenshtein("src_key", "tgt_key"))
                .where(F.col("dist") <= max_dist)
                .where(F.col("dist") > 0))  # dist 0 handled by `exact`
    # two-phase per-key top-1: min over a struct orders (dist, key, id)
    fuzzy = (verified
             .groupBy("src_id", "src_key")
             .agg(F.min(F.struct("dist", "tgt_key", "tgt_id")).alias("b")))
    return (exact.unionByName(fuzzy)
            .select("src_id", "src_key",
                    F.col("b.tgt_id").alias("tgt_id"),
                    F.col("b.tgt_key").alias("tgt_key"),
                    F.col("b.dist").alias("dist")))


# ---------------------------------------------------------------------------
# PassJoin: partition-based blocking for edit-distance joins
# ---------------------------------------------------------------------------
#
# Second exact candidate generator (Li, Deng, Feng, ICDE 2012 "PassJoin"),
# complementary to deletion blocking: instead of exploding ~C(len, d)
# deletion variants per key on BOTH sides, the indexed side partitions each
# key into q = d+1 segments (pigeonhole: d edits cannot touch all q
# segments, so some segment of v survives VERBATIM in any u within distance
# d, displaced by at most d positions). The probe side enumerates, for each
# candidate target length n within ±d and each segment of the length-n
# scheme, the <= 2d+1 aligned substrings of u — ~q*(2d+1)^2 short probes
# per key versus ~C(len,d) variants, and only q rows per key on the index
# side. Everything is flat post-explode column arithmetic (explode a
# literal id sequence, then pure codegen decode — no nested lambdas, which
# fall off the codegen path; measured on the deletion expansion).
#
# Completeness holds when the INDEXED key has length >= q (every segment
# nonempty); shorter target keys are exploded into their (tiny) deletion
# neighborhoods instead, so the candidate set stays complete for
# levenshtein <= d over arbitrary inputs (property-tested vs brute force).
#
# WHICH ALGORITHM WHEN (measured, sf0.1 drifted part-name corpus): the
# blocking key here is a length-~len/q SUBSTRING, so its selectivity is the
# key's local entropy. On vocabulary-built keys (TPC-H p_name: 5 words from
# a 92-word list) segments collide catastrophically — 20k keys produced
# hot blocks of ~900 members and 88M candidate pairs where deletion
# blocking (near-full-length variants, selective by construction) produced
# 190k. On high-entropy identifiers (UUIDs, hashes, serials) the segment
# blocks are near-unique and PassJoin's ~q*(2d+1)^2 probes beat the
# ~C(len,d) variant explosion badly. The engine ships both as
# ``fuzzy_match_keys(algo=...)``; ``deletion`` is the default because
# drifted business keys are usually vocabulary-like.


def _passjoin_index(tgt: DataFrame, key_col: str, id_col: str,
                    d: int) -> DataFrame:
    """(bh, tgt_id): one row per segment of each target key (q = d+1)."""
    q = d + 1
    df = (tgt.select(F.col(id_col).alias("tgt_id"), F.col(key_col).alias("k"))
          .where(F.length("k") >= q)
          .select("tgt_id", "k", F.explode(F.sequence(F.lit(0), F.lit(q - 1)))
                  .alias("i")))
    n = F.length("k")
    m = (n / q).cast("int")
    r = n - m * q
    length = m + F.when(F.col("i") >= q - r, F.lit(1)).otherwise(F.lit(0))
    start = F.lit(1) + F.col("i") * m + F.greatest(F.lit(0),
                                                   F.col("i") - (q - r))
    seg = F.substring(F.col("k"), start, length)
    bh = F.xxhash64(F.concat_ws("\x1f", n.cast("string"),
                                F.col("i").cast("string"), seg))
    return df.select("tgt_id", bh.alias("bh"))


def _passjoin_probes(src: DataFrame, key_col: str, id_col: str,
                     d: int) -> DataFrame:
    """(bh, src_id): the aligned-substring probes of each source key — for
    each target length n in [l-d, l+d] (n >= q), each segment i of the
    length-n scheme, each start shift in [-d, d]."""
    q = d + 1
    w = 2 * d + 1
    total = w * q * w  # (n offsets) x (segments) x (shifts)
    df = (src.select(F.col(id_col).alias("src_id"),
                     F.col(key_col).alias("k"),
                     F.explode(F.sequence(F.lit(0), F.lit(total - 1)))
                     .alias("pid")))
    l = F.length("k")
    n = l + (F.col("pid") / (q * w)).cast("int") - F.lit(d)
    i = ((F.col("pid") / w).cast("int") % q)
    shift = F.col("pid") % w - F.lit(d)
    m = (n / q).cast("int")
    r = n - m * q
    length = m + F.when(i >= q - r, F.lit(1)).otherwise(F.lit(0))
    p = F.lit(1) + i * m + F.greatest(F.lit(0), i - (q - r))
    start = p + shift
    valid = ((n >= q) & (length >= 1) & (start >= 1)
             & (start + length - 1 <= l))
    sub = F.substring(F.col("k"), start, length)
    bh = F.xxhash64(F.concat_ws("\x1f", n.cast("string"),
                                i.cast("string"), sub))
    return df.where(valid).select("src_id", bh.alias("bh"))


def passjoin_candidates(src: DataFrame, tgt: DataFrame, key_col: str,
                        id_col: str, *, d: int = 2,
                        broadcast_src: bool = False) -> DataFrame:
    """Distinct candidate pairs (src_id, src_key, tgt_id, tgt_key) whose
    keys can be within levenshtein ``d`` — PassJoin segment blocking.

    Complete for lev <= d over arbitrary inputs: targets shorter than
    q = d+1 (where a segment would be empty and pigeonhole fails) fall
    back to deletion blocking, which is cheap exactly there (C(len, d) is
    tiny for len < q). Like ``fuzzy_candidates``, the wire carries only
    (hash, id); keys re-attach by id after pair dedup.
    """
    q = d + 1
    s = _passjoin_probes(src, key_col, id_col, d)
    t = _passjoin_index(tgt, key_col, id_col, d)
    pairs = ((F.broadcast(s) if broadcast_src else s).join(t, "bh")
             .select("src_id", "tgt_id").distinct())
    short_tgt = tgt.where(F.length(key_col) < q)
    # the fallback would explode src's full deletion neighborhood even for
    # ZERO short targets — gate it on a cheap count of the (tiny) short set
    if short_tgt.limit(1).count() > 0:
        short_pairs = (fuzzy_candidates(src, short_tgt, key_col, id_col, d=d,
                                        broadcast_src=broadcast_src)
                       .select("src_id", "tgt_id"))
        pairs = pairs.unionByName(short_pairs).distinct()
    return (pairs
            .join(src.select(F.col(id_col).alias("src_id"),
                             F.col(key_col).alias("src_key")), "src_id")
            .join(tgt.select(F.col(id_col).alias("tgt_id"),
                             F.col(key_col).alias("tgt_key")), "tgt_id")
            .select("src_id", "src_key", "tgt_id", "tgt_key"))


def sorted_neighborhood_pairs(records: DataFrame, key_col: str,
                              id_col: str, *, window: int = 4,
                              max_distance: int = 1) -> DataFrame:
    """Sorted-neighborhood record-linkage blocking: sort all keys
    globally, compare each record only with its next ``window - 1``
    neighbors in sort order, keep pairs within ``max_distance`` edits.
    Output: ``(id_a, id_b, key_a, key_b, dist)``.

    The third blocking scheme next to SymSpell deletions and PassJoin
    segments — O(n·w) comparisons with a totally different blind spot
    (an edit EARLY in the string moves the key far away in sort order;
    the deletion schemes are position-blind but length-bounded). Classic
    ER stacks run several blockers and union candidates.

    Scale shape: the global sort position comes from
    ``operators.layout.global_row_number`` (first-character buckets —
    monotone under lexicographic order), and the w-1 neighbor pairing is
    an EXPLODE of offsets + equi-join on rn (never a range join). The
    ranked table feeds both join sides, so it is pinned.
    """
    base = records.select(F.col(key_col).alias("k"),
                          F.col(id_col).alias("i"))
    from spanner_data_validator_spark.operators.layout import (
        global_row_number,
    )
    ranked = global_row_number(
        base, [F.col("k"), F.col("i")],
        F.substring(F.col("k"), 1, 1)).localCheckpoint(eager=True)
    left = (ranked.select(F.col("i").alias("id_a"),
                          F.col("k").alias("key_a"), "rn")
            .withColumn("__off", F.explode(
                F.sequence(F.lit(1), F.lit(window - 1))))
            .withColumn("rn_b", F.col("rn") + F.col("__off")))
    right = ranked.select(F.col("rn").alias("rn_b"),
                          F.col("i").alias("id_b"),
                          F.col("k").alias("key_b"))
    dist = F.levenshtein(F.col("key_a"), F.col("key_b"))
    return (left.join(right, "rn_b")
            .select("id_a", "id_b", "key_a", "key_b",
                    dist.alias("dist"))
            .where(F.col("dist") <= max_distance))
