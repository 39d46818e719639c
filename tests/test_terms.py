"""TF-IDF keyword extraction (operators/terms.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from spanner_data_validator_spark.operators.terms import (
    doc_term_freqs,
    log_idf,
    rational_idf,
    tfidf_top_terms,
)


def _corpus(spark):
    return spark.createDataFrame(
        [(1, "the cat sat on the mat"),
         (2, "the dog sat on the log"),
         (3, "the cat and the dog"),
         (4, "quantum flux capacitor the")],
        "doc_id long, text string")


def test_doc_term_freqs_counts(spark):
    tf = {(r.doc_id, r.term): r.tf
          for r in doc_term_freqs(_corpus(spark), "doc_id", "text").collect()}
    assert tf[(1, "the")] == 2 and tf[(1, "cat")] == 1
    assert tf[(4, "quantum")] == 1


def test_tfidf_rational_exact_scores(spark):
    """Hand-check: 'the' (df=4 of 4) is pruned at max_df_frac=0.5; unique
    terms score tf * 4/1 = 4.0; shared ones tf * 4/2 = 2.0."""
    out = tfidf_top_terms(_corpus(spark), "doc_id", "text", k=2,
                          max_df_frac=0.5, idf_fn=rational_idf(4), n_docs=4)
    rows = {(r.doc_id, r.rank): (r.term, r.score) for r in out.collect()}
    assert rows[(4, 1)] == ("capacitor", 4.0)  # ties broken by term asc
    assert rows[(4, 2)] == ("flux", 4.0)
    assert rows[(1, 1)] == ("mat", 4.0)
    assert all(not t.startswith("the") for t, _ in rows.values())


def test_tfidf_log_idf_ranks_rare_first(spark):
    out = tfidf_top_terms(_corpus(spark), "doc_id", "text", k=3,
                          max_df_frac=None, idf_fn=log_idf(4), n_docs=4)
    top1 = {r.doc_id: r.term for r in out.where("rank = 1").collect()}
    # doc 4: rare 'capacitor' (tf=1, idf≈1.92) beats 'the' (tf=1, idf=1)
    assert top1[4] == "capacitor"
    # doc 1: 'the' at tf=2 (score 2.0) still outranks 'mat' (1.92) without
    # pruning — exactly why max_df_frac exists
    assert top1[1] == "the"


def test_tfidf_top_terms_on_testdata(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    n = docs.count()
    out = tfidf_top_terms(docs, "doc_id", "text", k=3,
                          idf_fn=rational_idf(n), n_docs=n)
    assert out.where("rank > 3").count() == 0
    per_doc = out.groupBy("doc_id").agg(F.count("*").alias("c"))
    assert per_doc.where("c > 3").count() == 0
    assert out.count() > 0


def test_bm25_ranks_matching_docs(spark):
    import pytest

    from spanner_data_validator_spark.operators.terms import bm25_topk

    docs = spark.createDataFrame(
        [(1, "cat cat cat"), (2, "cat dog"), (3, "dog dog"),
         (4, "fish"), (5, "cat")],
        "doc_id long, text string")
    out = bm25_topk(docs, "doc_id", "text", ["cat"], k=10).collect()
    ids = [r["doc_id"] for r in out]
    # only cat-matching docs appear; tf saturation still ranks 1 first;
    # doc 5 (dl=1) beats doc 2 (dl=2, same tf) on length normalization
    assert ids == [1, 5, 2]
    assert [r["rank"] for r in out] == [1, 2, 3]
    assert out[0]["score"] > out[1]["score"] > out[2]["score"]
    with pytest.raises(ValueError):
        bm25_topk(docs, "doc_id", "text", [])
    with pytest.raises(ValueError):
        bm25_topk(docs, "doc_id", "text", ["a", "a"])
