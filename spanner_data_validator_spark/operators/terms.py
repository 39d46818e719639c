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

from pyspark.sql import Column, DataFrame, Window
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


def bm25_topk(df: DataFrame, id_col: str, text_col: str,
              query_terms: list[str], *, k1: float = 1.25, b: float = 0.75,
              k: int = 10) -> DataFrame:
    """Top-``k`` documents by BM25 for a fixed term query — ranked keyword
    search, the retrieval half of corpus curation / eval-set mining.

    Scoring is the Robertson/Okapi form with the log dropped from the idf:
    ``idf(t) = (N - df + 0.5) / (df + 0.5)`` — one double division of
    exact-in-double integers, so (like ``rational_idf``) every score is
    bit-identical across engines; rankings match log-BM25 whenever df
    ordering does. ``k1``/``b`` default to exact binary fractions (5/4,
    3/4) so the literals round-trip exactly too. Per-doc scores sum the
    per-term contributions in the FIXED order of ``query_terms`` via a
    pivot — never a float sum across rows (aggregation order differs per
    engine/partitioning; CLAUDE.md).

    Plan shape at 100 TB: one tokenize explode -> tf hash agg (the only
    corpus-sized shuffle, shared with dl); the tf table is materialized
    once (it feeds dl, df, and contributions — the multi-branch rescan
    trap); df and corpus stats are vocabulary-/1-row-sized broadcasts; the
    final top-k is a sort of the docs-matching-any-term subset only.

    Output: (doc_id, score, rank), rank 1..k by (score desc, doc_id).
    """
    if not query_terms or len(set(query_terms)) != len(query_terms):
        raise ValueError("query_terms must be non-empty and distinct")
    tf = doc_term_freqs(df, id_col, text_col).localCheckpoint(eager=False)
    # dl feeds the stats aggregate AND the contribution join — pin the
    # doc-sized table so the tf re-aggregation runs once (multi-branch
    # rescan trap)
    dl = (tf.groupBy(id_col).agg(F.sum("tf").alias("dl"))
          .localCheckpoint(eager=False))
    stats = dl.agg(F.count(F.lit(1)).alias("n_docs"),
                   F.sum("dl").alias("total_tokens"))
    dfreq = (tf.where(F.col("term").isin(list(query_terms)))
               .groupBy("term").agg(F.count(F.lit(1)).alias("dft")))
    avgdl = (F.col("total_tokens").cast("double")
             / F.col("n_docs").cast("double"))
    idf = (((F.col("n_docs") - F.col("dft")).cast("double") + F.lit(0.5))
           / (F.col("dft").cast("double") + F.lit(0.5)))
    ratio = F.col("dl").cast("double") / avgdl
    den = (F.col("tf").cast("double")
           + (F.lit(float(k1)) * (F.lit(float(1 - b))
                                  + (F.lit(float(b)) * ratio))))
    num = F.col("tf").cast("double") * F.lit(float(k1 + 1))
    contrib = (tf.where(F.col("term").isin(list(query_terms)))
                 .join(dl, id_col)
                 .crossJoin(F.broadcast(stats))
                 .join(F.broadcast(dfreq), "term")
                 .select(F.col(id_col), F.col("term"),
                         (idf * (num / den)).alias("c")))
    pivot = contrib.groupBy(id_col).agg(*[
        F.max(F.when(F.col("term") == t, F.col("c"))).alias(f"__c{i}")
        for i, t in enumerate(query_terms)])
    score = F.coalesce(F.col("__c0"), F.lit(0.0))
    for i in range(1, len(query_terms)):
        score = score + F.coalesce(F.col(f"__c{i}"), F.lit(0.0))
    ranked = (pivot.select(F.col(id_col).alias("doc_id"),
                           score.alias("score"))
              .orderBy(F.desc("score"), F.asc("doc_id")).limit(k))
    w = Window.orderBy(F.desc("score"), F.asc("doc_id"))
    return ranked.withColumn("rank", F.row_number().over(w).cast("int"))


def bm25_sql(docs_sql: str, id_col: str, text_col: str,
             query_terms: list[str], *, k1: float = 1.25, b: float = 0.75,
             k: int = 10) -> str:
    """DuckDB rendering of :func:`bm25_topk` — the identical expression
    tree (same literals, same parenthesization, same fixed-order pivot
    sum), so scores hash-match bit-for-bit."""
    terms_in = ", ".join(f"'{t}'" for t in query_terms)
    cases = " + ".join(
        f"coalesce(max(CASE WHEN term = '{t}' THEN c END), "
        f"CAST(0 AS DOUBLE))" for t in query_terms)
    return f"""
bm_tok AS (SELECT {id_col} AS id,
                  unnest(string_split(lower({text_col}), ' ')) AS term
           FROM ({docs_sql})),
bm_tf AS (SELECT id, term, CAST(count(*) AS BIGINT) AS tf
          FROM bm_tok WHERE term <> '' GROUP BY id, term),
bm_dl AS (SELECT id, CAST(sum(tf) AS BIGINT) AS dl FROM bm_tf GROUP BY id),
bm_stats AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
                    CAST(sum(dl) AS BIGINT) AS total_tokens FROM bm_dl),
bm_df AS (SELECT term, CAST(count(*) AS BIGINT) AS dft FROM bm_tf
          WHERE term IN ({terms_in}) GROUP BY term),
bm_contrib AS (
  SELECT f.id, f.term,
         ((CAST(s.n_docs - d.dft AS DOUBLE) + CAST(0.5 AS DOUBLE))
          / (CAST(d.dft AS DOUBLE) + CAST(0.5 AS DOUBLE)))
         * ((CAST(f.tf AS DOUBLE) * CAST({float(k1 + 1)!r} AS DOUBLE))
            / (CAST(f.tf AS DOUBLE)
               + (CAST({float(k1)!r} AS DOUBLE)
                  * (CAST({float(1 - b)!r} AS DOUBLE)
                     + (CAST({float(b)!r} AS DOUBLE)
                        * (CAST(l.dl AS DOUBLE)
                           / (CAST(s.total_tokens AS DOUBLE)
                              / CAST(s.n_docs AS DOUBLE)))))))) AS c
  FROM bm_tf f
  JOIN bm_dl l ON f.id = l.id
  CROSS JOIN bm_stats s
  JOIN bm_df d ON f.term = d.term
  WHERE f.term IN ({terms_in})),
bm_scores AS (SELECT id AS doc_id, {cases} AS score
              FROM bm_contrib GROUP BY id)
SELECT doc_id, score,
       CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS INT) AS rank
FROM bm_scores ORDER BY score DESC, doc_id LIMIT {k}"""
