"""Document-quality operators for training-data curation at 100 TB scale.

* ``repetition_metrics`` — Gopher-style repetition statistics (duplicate-word
  fraction, top-word fraction, duplicate-n-gram fraction) per document.
* ``contamination_overlap`` — benchmark-contamination screen: the share of a
  document's n-gram shingles that appear in a (small) benchmark/eval set.

Shapes chosen for scale, not per-row convenience: repetition counting uses
the explode → (doc, token) groupBy path — one shuffle whose rows carry an
8-byte doc id plus the token — rather than per-row O(distinct·n) array
expressions that blow up on long documents; the contamination join
broadcasts the benchmark gram set (eval suites are tiny by definition) so
the corpus is never shuffled.

These extend the reference's capability surface (SURVEY.md §2.10 — the
reference validates rows, it has no curation ops); they follow its core
shape: reduce rows to small tokens before any shuffle.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from spanner_data_validator_spark.functions.text import shingles


def repetition_metrics(df: DataFrame, id_col: str = "doc_id",
                       text_col: str = "text", *, n: int = 3) -> DataFrame:
    """Per-document repetition statistics:

    ``n_words``            whitespace token count
    ``dup_word_frac``      1 - distinct_words / n_words (0 when empty)
    ``top_word_frac``      occurrences of the most frequent word / n_words
    ``dup_ngram_frac``     1 - distinct_ngrams / n_ngrams (0 when < n words)

    High duplicate fractions flag boilerplate/spam (the Gopher quality-filter
    family). One explode per granularity; each groupBy carries (doc, token)
    and reduces map-side, so the exchanged bytes are bounded by the distinct
    tokens per doc, not the text.
    """
    words = df.select(F.col(id_col), F.explode(
        F.split(F.col(text_col), " ")).alias("w")).where(F.col("w") != "")
    wstats = (words.groupBy(id_col, "w").agg(F.count("*").alias("c"))
              .groupBy(id_col)
              .agg(F.sum("c").alias("n_words"),
                   F.count("*").alias("n_distinct"),
                   F.max("c").alias("top_c")))
    grams = df.select(F.col(id_col),
                      F.explode(shingles(text_col, n)).alias("g"))
    gstats = (grams.groupBy(id_col, "g").agg(F.count("*").alias("c"))
              .groupBy(id_col)
              .agg(F.sum("c").alias("n_grams"),
                   F.count("*").alias("n_distinct_grams")))
    base = df.select(id_col)
    out = (base.join(wstats, id_col, "left").join(gstats, id_col, "left"))
    nw = F.coalesce(F.col("n_words"), F.lit(0))
    ng = F.coalesce(F.col("n_grams"), F.lit(0))
    return out.select(
        F.col(id_col),
        nw.cast("long").alias("n_words"),
        F.when(nw > 0, F.lit(1.0) - F.col("n_distinct") / nw)
         .otherwise(0.0).alias("dup_word_frac"),
        F.when(nw > 0, F.col("top_c") / nw).otherwise(0.0).alias("top_word_frac"),
        F.when(ng > 0, F.lit(1.0) - F.col("n_distinct_grams") / ng)
         .otherwise(0.0).alias("dup_ngram_frac"),
    )


def line_dedup(docs: DataFrame, id_col: str = "doc_id",
               text_col: str = "text", *, min_df: int = 30,
               delim: str = "\n", hash_fn=None,
               broadcast_hot: bool = True) -> DataFrame:
    """Boilerplate-line removal (the C4/RefinedWeb line-dedup rule): drop
    every line that occurs in >= ``min_df`` DISTINCT documents (nav bars,
    cookie banners, footers), keep everything else in original order.

    Output: ``(id_col, clean_text, n_lines, n_removed)``.

    Scale shape: lines are hashed to 8 bytes before any shuffle, so the
    document-frequency count exchanges (hash, doc_id) pairs, never text; the
    hot set (lines above min_df) is small and broadcast, and the hot-line
    mark is a broadcast LEFT join + flag folded into the SAME per-doc
    aggregate that reassembles the text — one shuffle for the DF count, one
    for the reassembly, zero anti-join passes. Set ``broadcast_hot=False``
    when the hot set is too large to broadcast (AQE then picks the join).
    """
    from spanner_data_validator_spark.functions.hashing import xxhash64_family

    hash_fn = hash_fn or xxhash64_family
    lines = docs.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), delim)).alias("line_no", "line"),
    ).withColumn("__h", hash_fn(F.col("line"), 0))

    hot = (lines.select("__h", id_col).distinct()
           .groupBy("__h").agg(F.count("*").alias("df"))
           .where(F.col("df") >= min_df)
           .select("__h", F.lit(True).alias("__hot")))
    if broadcast_hot:
        hot = F.broadcast(hot)

    marked = lines.join(hot, on="__h", how="left")
    kept_line = F.when(F.col("__hot").isNull(), F.struct("line_no", "line"))
    return (marked.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(kept_line)),
                lambda x: x["line"]),
            delim).alias("clean_text"),
        F.count("*").alias("n_lines"),
        F.sum(F.when(F.col("__hot").isNotNull(), 1).otherwise(0))
         .cast("long").alias("n_removed"),
    ))


def contamination_overlap(docs: DataFrame, benchmark: DataFrame,
                          *, id_col: str = "doc_id", text_col: str = "text",
                          bench_text_col: str = "text", n: int = 8,
                          threshold: float = 0.0) -> DataFrame:
    """Benchmark-contamination screen: per doc, the fraction of its DISTINCT
    word ``n``-gram shingles that occur anywhere in ``benchmark``.

    Output: (id_col, n_shingles, n_hits, overlap_frac), docs with
    ``overlap_frac >= threshold`` (pass 0.0 to keep all docs with >= n
    words). Eval suites are small, so the benchmark gram set broadcasts and
    the corpus-side plan is scan → explode → broadcast semi-ish join →
    per-doc count: the corpus is never shuffled by gram, only the per-doc
    tallies move (8-byte id + two longs).
    """
    bench = (benchmark.select(F.explode(F.array_distinct(
        shingles(bench_text_col, n))).alias("g")).distinct())
    dg = docs.select(F.col(id_col), F.explode(F.array_distinct(
        shingles(text_col, n))).alias("g"))
    hits = (dg.join(F.broadcast(bench), "g")
              .groupBy(id_col).agg(F.count("*").alias("n_hits")))
    sizes = dg.groupBy(id_col).agg(F.count("*").alias("n_shingles"))
    out = (sizes.join(hits, id_col, "left")
           .select(F.col(id_col), "n_shingles",
                   F.coalesce(F.col("n_hits"), F.lit(0)).cast("long").alias("n_hits"))
           .withColumn("overlap_frac", F.col("n_hits") / F.col("n_shingles")))
    return out.where(F.col("overlap_frac") >= threshold)


def pseudonymize(df: DataFrame, cols: Sequence[str], secret: str,
                 *, token_len: int = 16) -> DataFrame:
    """Deterministic keyed pseudonymization for identifier columns: each
    value is replaced by the first ``token_len`` hex chars of
    SHA-256(secret || '|' || value). Same value -> same token within a
    secret, so joins/groupings survive the migration; rotating the secret
    unlinks past exports. NULLs stay NULL (a NULL identifier carries no
    identity to protect).

    Pure codegen (sha2 is a JVM expression — no UDF); works identically in
    any engine with SHA-256, so pseudonymized exports remain
    oracle-comparable. This is reversible ONLY by brute force over the
    value domain — for low-entropy identifiers (sequential ints) treat the
    secret like a key, not a salt. Complements redact_pii (free-text
    scrubbing) for the structured-identifier side.
    """
    out = df
    for c in cols:
        tok = F.substring(
            F.sha2(F.concat_ws("|", F.lit(secret), F.col(c).cast("string")),
                   256), 1, token_len)
        out = out.withColumn(c, F.when(F.col(c).isNotNull(), tok))
    return out


def char_diversity(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Per-doc character diversity as the Simpson index
    ``1 - sum(c_i^2) / n^2`` over lowercase letter counts — the
    gibberish/repetition signal an entropy scorer gives, in EXACT
    arithmetic: counts are integers, so the only float work is one
    division and one subtract on exact-in-double inputs, bit-identical
    across engines (Shannon entropy needs per-term logs, which libms
    round differently — the same reason PageRank here is fixed-point).
    Low diversity = few distinct characters dominate ("aaaa...", keyboard
    mash, padding); natural text sits high.

    Output: (id, n_letters, ssq, simpson). Two exchanges, both keyed by
    doc id; the letter histogram reduces map-side first.
    """
    letters = F.regexp_replace(F.lower(F.col(text_col)), "[^a-z]", "")
    chars = df.select(
        F.col(id_col).alias("id"),
        F.explode(F.split(letters, "(?!^)")).alias("ch")).where(
        F.col("ch") != "")
    per_char = chars.groupBy("id", "ch").agg(F.count(F.lit(1)).alias("c"))
    per_doc = per_char.groupBy("id").agg(
        F.sum("c").cast("bigint").alias("n_letters"),
        F.sum(F.col("c") * F.col("c")).cast("bigint").alias("ssq"))
    simpson = (F.lit(1.0)
               - (F.col("ssq").cast("double")
                  / (F.col("n_letters").cast("double")
                     * F.col("n_letters").cast("double"))))
    return per_doc.select("id", "n_letters", "ssq", simpson.alias("simpson"))
