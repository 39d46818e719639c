"""Dedup operators: exact, Jaccard, MinHash+LSH consistency, SimHash."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from spanner_data_validator_spark.operators.dedup import (
    exact_dedup,
    jaccard_pairs,
    lsh_candidates,
    minhash_lsh_pairs,
    minhash_signatures,
    simhash64,
    simhash_near_dups,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "text")


def test_exact_dedup_counts(spark, docs):
    corpus = docs.unionByName(docs.withColumn("doc_id", F.col("doc_id") + 10_000))
    out = exact_dedup(corpus, "doc_id", "text")
    assert out.count() == docs.count()
    assert out.agg(F.sum("n_copies")).collect()[0][0] == 2 * docs.count()
    assert out.where(F.col("n_copies") != 2).count() == 0


def test_jaccard_finds_planted_near_dups(spark, docs):
    planted = docs.where(F.col("doc_id") % 5 == 0).select(
        (F.col("doc_id") + 10_000).alias("doc_id"),
        F.concat(F.lit("ZZ "), F.col("text")).alias("text"))
    corpus = docs.unionByName(planted)
    pairs = jaccard_pairs(corpus, "doc_id", "text", n=3, threshold=0.8)
    got = {(r["a"], r["b"]) for r in pairs.collect()}
    want = {(r["doc_id"], r["doc_id"] + 10_000) for r in
            docs.where(F.col("doc_id") % 5 == 0).collect()}
    assert want <= got


def test_minhash_lsh_reproduces_exact_jaccard(spark, docs):
    planted = docs.where(F.col("doc_id") % 5 == 0).select(
        (F.col("doc_id") + 10_000).alias("doc_id"),
        F.concat(F.lit("ZZ "), F.col("text")).alias("text"))
    corpus = docs.unionByName(planted)
    exact = {(r["a"], r["b"]) for r in
             jaccard_pairs(corpus, "doc_id", "text", n=3, threshold=0.8).collect()}
    lsh = {(r["a"], r["b"]) for r in
           minhash_lsh_pairs(corpus, "doc_id", "text", n=3, num_perm=32, bands=16,
                             threshold=0.8).collect()}
    # LSH output is exact-verified, so it's a subset; with 16 bands of 2 rows
    # recall on >=0.8-jaccard pairs should be total on this corpus
    assert lsh == exact and len(exact) > 0


def test_identical_docs_share_signature_and_bucket(spark):
    df = spark.createDataFrame(
        [(1, "a b c d e f g"), (2, "a b c d e f g"), (3, "h i j k l m n")],
        "doc_id LONG, text STRING")
    sig = {r["doc_id"]: r["signature"] for r in
           minhash_signatures(df, "doc_id", "text", num_perm=16).collect()}
    assert sig[1] == sig[2] and sig[1] != sig[3]
    cands = {(r["a"], r["b"]) for r in
             lsh_candidates(minhash_signatures(df, "doc_id", "text", num_perm=16),
                            "doc_id", 16, bands=4).collect()}
    assert (1, 2) in cands


def test_simhash_identical_zero_hamming(spark):
    df = spark.createDataFrame(
        [(1, "a b c d e f g h"), (2, "a b c d e f g h"), (3, "q r s t u v w x")],
        "doc_id LONG, text STRING")
    sh = {r["doc_id"]: r["simhash"] for r in simhash64(df, "doc_id", "text").collect()}
    assert sh[1] == sh[2]
    nd = {(r["a"], r["b"]): r["hamming"] for r in
          simhash_near_dups(df, "doc_id", "text", max_hamming=3).collect()}
    assert nd.get((1, 2)) == 0 and (1, 3) not in nd
