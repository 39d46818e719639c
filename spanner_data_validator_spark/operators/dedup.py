"""Deduplication operators for training-data pipelines at 100 TB scale.

Five strategies, all shuffle-aware:

* ``exact_dedup``        — hash-groupBy on the text (or its fingerprint)
* ``jaccard_pairs``      — exact word-n-gram Jaccard via shingle inverted index
                           (self-join on shingle, NOT an O(n²) cross join)
* ``minhash_lsh_pairs``  — MinHash signatures + banded LSH candidate
                           generation, then exact-Jaccard verification
* ``simhash64``          — 64-bit SimHash per doc + Hamming-band candidates
* embedding cosine near-dup lives in ``operators/ann.py``

Scale notes: every strategy reduces docs to (id, small-token) BEFORE any
shuffle; candidate generation joins on banded hash buckets so the shuffle key
cardinality stays ~n·bands, never n². Hot shingles (very common n-grams) are
the skew risk — ``jaccard_pairs`` drops shingles with document frequency above
``max_shingle_df`` (stopword-gram pruning), the standard trick to bound the
inverted-index blowup.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from spanner_data_validator_spark.functions.text import shingles


def exact_dedup(df: DataFrame, id_col: str, text_col: str,
                *, by_fingerprint: bool = True) -> DataFrame:
    """One row per distinct text: (canonical id = min id, n_copies).

    ``by_fingerprint`` groups on xxhash64(text) instead of the full text —
    at scale the shuffle then carries 8 bytes/doc instead of the document.
    """
    key = F.xxhash64(F.col(text_col)) if by_fingerprint else F.col(text_col)
    return (df.groupBy(key.alias("__k"))
              .agg(F.min(id_col).alias(id_col), F.count("*").alias("n_copies"))
              .drop("__k"))


def shingle_table(df: DataFrame, id_col: str, text_col: str, n: int = 3,
                  *, max_shingle_df: int | None = None) -> DataFrame:
    """Distinct (id, shingle) pairs; optionally prune ultra-common shingles.

    Requires unique ``id_col`` values (one row per doc). Within-doc dedup is
    ``array_distinct`` BEFORE the explode — per-row, shuffle-free — instead of
    a full .distinct() exchange over the exploded table. Pruning anti-joins
    against the HOT set (df > max_shingle_df), which is tiny by definition, so
    it broadcasts; the r01 inner-join against the huge keep-set shuffled the
    whole shingle table.
    """
    sh = df.select(F.col(id_col),
                   F.explode(F.array_distinct(shingles(text_col, n))).alias("shingle"))
    if max_shingle_df is not None:
        hot = (sh.groupBy("shingle").agg(F.count("*").alias("__df"))
                 .where(F.col("__df") > max_shingle_df).select("shingle"))
        sh = sh.join(F.broadcast(hot), "shingle", "left_anti")
    return sh


def jaccard_pairs(df: DataFrame, id_col: str, text_col: str,
                  *, n: int = 3, threshold: float = 0.7,
                  max_shingle_df: int | None = None) -> DataFrame:
    """Exact n-gram Jaccard near-duplicate pairs (a < b, jaccard >= threshold).

    inverted-index plan: explode shingles → self-join on shingle (equi-join,
    hash-partitioned by shingle) → per-pair intersection counts → join two
    broadcastable size tables → filter. Output: (a, b, jaccard).
    """
    sh = shingle_table(df, id_col, text_col, n, max_shingle_df=max_shingle_df)
    sizes = sh.groupBy(id_col).agg(F.count("*").alias("n_sh"))
    a = sh.select(F.col(id_col).alias("a"), "shingle")
    b = sh.select(F.col(id_col).alias("b"), "shingle")
    inter = (a.join(b, "shingle")
              .where(F.col("a") < F.col("b"))
              .groupBy("a", "b").agg(F.count("*").alias("k")))
    sa = sizes.select(F.col(id_col).alias("a"), F.col("n_sh").alias("na"))
    sb = sizes.select(F.col(id_col).alias("b"), F.col("n_sh").alias("nb"))
    jac = (F.col("k").cast("double")
           / (F.col("na") + F.col("nb") - F.col("k")))
    return (inter.join(sa, "a").join(sb, "b")
                 .select("a", "b", jac.alias("jaccard"))
                 .where(F.col("jaccard") >= threshold))


def _signatures_from_shingles(sh: DataFrame, id_col: str, num_perm: int) -> DataFrame:
    """MinHash signatures from a prebuilt (id, shingle) table — lets the
    pipeline share ONE shingle scan between signatures and verification."""
    hashes = F.array(*[F.xxhash64(F.col("shingle"), F.lit(i)) for i in range(num_perm)])
    per = sh.select(id_col, hashes.alias("h"))
    mins = per.groupBy(id_col).agg(
        *[F.min(F.col("h")[i]).alias(f"mh{i}") for i in range(num_perm)])
    return mins.select(id_col, F.array(*[f"mh{i}" for i in range(num_perm)]).alias("signature"))


def minhash_signatures(df: DataFrame, id_col: str, text_col: str,
                       *, n: int = 3, num_perm: int = 32,
                       max_shingle_df: int | None = None) -> DataFrame:
    """MinHash signature per doc: for each of ``num_perm`` seeded hash
    functions, the min over the doc's shingles of xxhash64(shingle, seed).

    One explode + ONE groupBy produces all permutations (min of an array
    column aggregated element-wise via reduce of F.array min) — not num_perm
    passes over the data.
    """
    sh = shingle_table(df, id_col, text_col, n, max_shingle_df=max_shingle_df)
    return _signatures_from_shingles(sh, id_col, num_perm)


def lsh_candidates(signatures: DataFrame, id_col: str, num_perm: int,
                   *, bands: int = 8) -> DataFrame:
    """Banded LSH: split the signature into ``bands`` rows, hash each band,
    equi-join docs sharing any (band_id, band_hash) bucket → candidate pairs.

    The join key is (band, hash-of-rows) so bucket sizes stay tiny; this is
    the n·bands shuffle that replaces the n² comparison at 10^9-doc scale.
    """
    sig = signatures.select(id_col, "signature")
    rows_per_band = max(1, num_perm // bands)
    banded = sig.select(
        id_col,
        F.posexplode(
            F.array(*[
                F.xxhash64(F.concat_ws(
                    ",", *[F.col("signature")[bi * rows_per_band + r].cast("string")
                           for r in range(rows_per_band)]))
                for bi in range(bands)])
        ).alias("band", "band_hash"),
    )
    l = banded.select(F.col(id_col).alias("a"), "band", "band_hash")
    r = banded.select(F.col(id_col).alias("b"), "band", "band_hash")
    return (l.join(r, ["band", "band_hash"])
             .where(F.col("a") < F.col("b"))
             .select("a", "b").distinct())


def verify_candidate_pairs(cands: DataFrame, sh: DataFrame, id_col: str,
                           *, threshold: float = 0.7) -> DataFrame:
    """Exact-Jaccard verification restricted to candidate pairs.

    ``cands`` must hold DISTINCT (a, b) rows (``lsh_candidates`` guarantees
    this) — a duplicated pair would double its intersection count.

    The shingle self-join is GATED by the candidate list — the only shuffles
    are linear in |shingle table| (keyed by doc id, then (b, shingle)) plus
    O(candidate pairs × shingles-per-doc) intersection rows. The full
    all-pairs inverted-index self-join (O(pairs-sharing-a-shingle)) is never
    built, which is the entire point of LSH at 10^9-doc scale.
    """
    sizes = sh.groupBy(id_col).agg(F.count("*").alias("n_sh"))
    sha = sh.select(F.col(id_col).alias("a"), "shingle")
    shb = sh.select(F.col(id_col).alias("b"), "shingle")
    inter = (cands.join(sha, "a")              # expand pairs by a's shingles...
                  .join(shb, ["b", "shingle"])  # ...keep those also in b
                  .groupBy("a", "b").agg(F.count("*").alias("k")))
    sa = sizes.select(F.col(id_col).alias("a"), F.col("n_sh").alias("na"))
    sb = sizes.select(F.col(id_col).alias("b"), F.col("n_sh").alias("nb"))
    jac = (F.col("k").cast("double")
           / (F.col("na") + F.col("nb") - F.col("k")))
    return (inter.join(sa, "a").join(sb, "b")
                 .select("a", "b", jac.alias("jaccard"))
                 .where(F.col("jaccard") >= threshold))


def minhash_lsh_pairs(df: DataFrame, id_col: str, text_col: str,
                      *, n: int = 3, num_perm: int = 32, bands: int = 8,
                      threshold: float = 0.7,
                      max_shingle_df: int | None = None) -> DataFrame:
    """MinHash+LSH near-dup pipeline: candidates from banded signatures, then
    exact-Jaccard verification of ONLY the candidates.

    One shingle scan feeds both the signatures and the verification; the
    expensive per-pair groupBy runs over candidate pairs only (see
    ``verify_candidate_pairs``), never the whole corpus.
    """
    sh = shingle_table(df, id_col, text_col, n, max_shingle_df=max_shingle_df)
    cands = lsh_candidates(_signatures_from_shingles(sh, id_col, num_perm),
                           id_col, num_perm, bands=bands)
    return verify_candidate_pairs(cands, sh, id_col, threshold=threshold)


def simhash64(df: DataFrame, id_col: str, text_col: str, *, n: int = 3) -> DataFrame:
    """64-bit SimHash per doc: sign of the per-bit sum of shingle hashes.

    Pure expressions: explode shingles → 64 conditional sums (one hash
    aggregate, combiner-lifted) → reassemble bits. No UDF.
    """
    sh = shingle_table(df, id_col, text_col, n).select(
        id_col, F.xxhash64("shingle").alias("h"))
    bit_sums = [
        F.sum(F.when(F.shiftright(F.col("h"), j).bitwiseAND(F.lit(1)) == 1, 1)
               .otherwise(-1)).alias(f"b{j}")
        for j in range(64)
    ]
    agg = sh.groupBy(id_col).agg(*bit_sums)
    acc = F.lit(0).cast("long")
    for j in range(64):
        bit = (1 << j) if j < 63 else -(1 << 63)  # bit 63 = long sign bit
        acc = acc + F.when(F.col(f"b{j}") > 0, F.lit(bit).cast("long")).otherwise(0)
    return agg.select(id_col, acc.alias("simhash"))


def simhash_near_dups(df: DataFrame, id_col: str, text_col: str,
                      *, n: int = 3, max_hamming: int = 3) -> DataFrame:
    """SimHash near-dup pairs: block on 16-bit quarters (any equal quarter →
    candidate; pigeonhole guarantees recall for hamming <= 3), verify with
    bit_count of xor."""
    sig = simhash64(df, id_col, text_col, n=n)
    quarters = sig.select(
        id_col, "simhash",
        F.posexplode(F.array(*[
            (F.shiftrightunsigned(F.col("simhash"), 16 * q).bitwiseAND(F.lit(0xFFFF)))
            for q in range(4)])).alias("q", "qv"))
    l = quarters.select(F.col(id_col).alias("a"), F.col("simhash").alias("ha"), "q", "qv")
    r = quarters.select(F.col(id_col).alias("b"), F.col("simhash").alias("hb"), "q", "qv")
    cand = (l.join(r, ["q", "qv"]).where(F.col("a") < F.col("b"))
             .select("a", "b", "ha", "hb").distinct())
    ham = F.bit_count(F.col("ha").bitwiseXOR(F.col("hb")))
    return cand.select("a", "b", ham.alias("hamming")).where(ham <= max_hamming)
