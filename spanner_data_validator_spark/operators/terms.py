"""Term statistics — TF-IDF keyword extraction over a document corpus.

The per-doc top-k characteristic terms are the classic topic/quality signal
for corpus curation (domain filtering, cluster labeling, mixture design).

Plan shape at 100 TB:

* one tokenize explode (scan-stage, no shuffle) → ONE hash agg keyed by
  (doc, term) for tf — the only shuffle that carries per-document rows;
* document frequency reduces from the tf table (map-side combined, keyed by
  term — vocabulary-sized, orders of magnitude smaller than the corpus);
* the tf⋈df join is keyed by term; ``max_df_frac`` drops stopword-ish terms
  FIRST (the same hot-key guard as shingle pruning — a term in half the
  corpus contributes nothing to "characteristic" and dominates the join);
* the final per-doc top-k reuses ``ann.topk_per_query`` — a narrow
  per-partition partial reduce BEFORE the rank window, so the exchange
  carries ≤ partitions·docs·k skinny rows.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def doc_term_freqs(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, term, tf): whitespace-token term frequencies, lowercased."""
    toks = F.explode(F.split(F.lower(F.col(text_col)), " ")).alias("term")
    return (df.select(F.col(id_col), toks)
              .where(F.col("term") != "")
              .groupBy(id_col, "term").agg(F.count("*").alias("tf")))


def rational_idf(n_docs: int) -> "callable":
    """idf(df) = n_docs / df as ONE double division of exact integers — IEEE
    correctly-rounded in every engine, so scores are bit-identical across
    Spark and a SQL oracle (a log-based idf is only ~1-ulp reproducible).
    Rankings differ from log idf only in how hard rare terms are boosted."""
    def f(df_col: Column) -> Column:
        return F.lit(float(n_docs)) / df_col.cast("double")
    return f


def log_idf(n_docs: int) -> "callable":
    """Smoothed log idf (the textbook form): ln((1 + n) / (1 + df)) + 1."""
    def f(df_col: Column) -> Column:
        return F.log((1.0 + n_docs) / (1.0 + df_col.cast("double"))) + 1.0
    return f


def tfidf_top_terms(df: DataFrame, id_col: str, text_col: str,
                    *, k: int = 5, max_df_frac: float | None = 0.5,
                    idf_fn=None, n_docs: int | None = None) -> DataFrame:
    """Per-doc top-``k`` terms by tf·idf (ties broken by term asc).

    ``idf_fn`` maps the document-frequency column to an idf column; defaults
    to ``log_idf``. Pass ``rational_idf`` for bit-exact cross-engine scores.
    ``n_docs`` overrides the corpus-size count (one tiny job) when known.

    Output: (id_col, term, tf, df, score, rank).
    """
    from spanner_data_validator_spark.operators.ann import topk_per_query

    if n_docs is None:
        n_docs = df.count()
    idf_fn = idf_fn or log_idf(n_docs)
    tf = doc_term_freqs(df, id_col, text_col)
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df"))
    if max_df_frac is not None:
        dfreq = dfreq.where(F.col("df") <= int(max_df_frac * n_docs))
    scored = (tf.join(dfreq, "term")
                .withColumn("score", F.col("tf") * idf_fn(F.col("df"))))
    top = topk_per_query(scored, k, key_col=id_col, order_col="score",
                         tie_col="term")
    return top.select(id_col, "term", "tf", "df", "score", "rank")


def bigram_collocations(df: DataFrame, id_col: str, text_col: str,
                        *, min_count: int = 2) -> DataFrame:
    """Corpus bigram collocations with exact-rational PMI lift.

    Output: (w1, w2, pair_n, w1_n, w2_n, lift) where
    ``lift = n_bigrams * pair_n / (w1_n * w2_n)`` — the PMI argument before
    the log. Each factor is an exact integer cast to double before ONE
    multiply and ONE divide, so the score is bit-identical across engines
    (a log-PMI is only ~1-ulp reproducible; rank by lift, log it for
    display).

    Plan shape: the token array materializes once per pass behind a
    Generate barrier (`explode(array(tokens))`) so the bigram lambda reads a
    physical column — without the barrier Catalyst inlines the split() into
    the HOF lambda and re-tokenizes per element (CLAUDE.md trap). TWO corpus
    passes total (bigram agg + unigram agg — different explode keys), each
    reducing map-side before its shuffle; the bigram total is derived
    lazily from the already-aggregated vocabulary-sized pair table (no
    eager count job at call time), and both count joins are keyed by
    vocabulary-sized tables.
    """
    toks_expr = F.filter(F.split(F.lower(F.col(text_col)), " "),
                         lambda x: x != F.lit(""))
    docs = df.select(F.col(id_col),
                     F.explode(F.array(toks_expr)).alias("toks"))
    n_tok = F.size("toks")
    bigrams = F.transform(
        F.slice(F.col("toks"), 1, F.greatest(n_tok - 1, F.lit(0))),
        lambda x, i: F.struct(x.alias("w1"),
                              F.element_at(F.col("toks"), i + 2).alias("w2")))
    pairs = (docs.select(F.explode(bigrams).alias("bg"))
                 .select("bg.w1", "bg.w2"))
    pair_counts = pairs.groupBy("w1", "w2").agg(
        F.count(F.lit(1)).alias("pair_n"))
    # unigram counts: every token is the w1 of one bigram except each doc's
    # last — count unigrams from the token arrays directly instead.
    unigrams = (docs.select(F.explode("toks").alias("w"))
                    .groupBy("w").agg(F.count(F.lit(1)).alias("w_n")))
    # the w1 and w2 lookups are aliased branches of the same subplan —
    # Catalyst does NOT reuse exchanges across aliased self-join branches
    # (CLAUDE.md), so without this the corpus unigram pass runs twice; a
    # lazy localCheckpoint materializes the vocabulary-sized table once
    unigrams = unigrams.localCheckpoint(eager=False)
    # the bigram total folds from the vocabulary-sized pair table (pre
    # min_count filter) via a broadcast 1-row cross join — lazy, and the
    # pair_counts exchange is canonically identical on both branches so
    # AQE reuses it instead of re-running the corpus explode
    total = pair_counts.agg(
        F.sum("pair_n").cast("double").alias("__n_bigrams"))
    u1 = unigrams.select(F.col("w").alias("w1"), F.col("w_n").alias("w1_n"))
    u2 = unigrams.select(F.col("w").alias("w2"), F.col("w_n").alias("w2_n"))
    scored = (pair_counts.where(F.col("pair_n") >= min_count)
              .join(u1, "w1").join(u2, "w2")
              .crossJoin(F.broadcast(total))
              .withColumn(
                  "lift",
                  (F.col("__n_bigrams") * F.col("pair_n").cast("double"))
                  / (F.col("w1_n").cast("double") * F.col("w2_n").cast("double"))))
    return scored.select("w1", "w2", "pair_n", "w1_n", "w2_n", "lift")
