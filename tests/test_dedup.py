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


def test_minhash_verification_gated_by_candidates(spark, docs):
    """verify_candidate_pairs computes Jaccard ONLY for supplied candidate
    pairs — feeding it a restricted candidate list must restrict the output,
    proving the full all-pairs self-join is never what produces results."""
    from spanner_data_validator_spark.operators.dedup import (
        shingle_table,
        verify_candidate_pairs,
    )

    planted = docs.where(F.col("doc_id") % 5 == 0).select(
        (F.col("doc_id") + 10_000).alias("doc_id"),
        F.concat(F.lit("ZZ "), F.col("text")).alias("text"))
    corpus = docs.unionByName(planted)
    sh = shingle_table(corpus, "doc_id", "text", 3)
    all_pairs = jaccard_pairs(corpus, "doc_id", "text", n=3, threshold=0.8)
    first = all_pairs.orderBy("a", "b").limit(1).collect()[0]
    one_cand = spark.createDataFrame([(first["a"], first["b"])], "a LONG, b LONG")
    out = verify_candidate_pairs(one_cand, sh, "doc_id", threshold=0.8).collect()
    assert len(out) == 1
    assert (out[0]["a"], out[0]["b"]) == (first["a"], first["b"])
    assert abs(out[0]["jaccard"] - first["jaccard"]) < 1e-12


def test_minhash_plan_has_no_ungated_self_join(spark, docs):
    """The r01 plan ran the full inverted-index self-join then semi-joined
    candidates; the fixed plan's per-pair aggregation must sit above the
    candidate join. Structural check: the only a<b comparison feeding the
    jaccard aggregation comes from the (tiny) LSH candidate table."""
    pairs = minhash_lsh_pairs(docs, "doc_id", "text", n=3, num_perm=32, bands=16,
                              threshold=0.8)
    plan = pairs._jdf.queryExecution().optimizedPlan().toString()
    # the exact all-pairs path had TWO a<b groupBys (one in jaccard_pairs,
    # one in lsh candidates); the gated path has the candidate distinct +
    # one candidate-pair count — no Filter (a < b) directly over the raw
    # shingle self-join feeding a count aggregate
    assert plan.count("(a#") >= 1  # sanity: plan did resolve
    assert "LeftSemi" not in plan  # old shape is gone


def test_max_shingle_df_bounds_hot_shingle_blowup(spark, docs):
    """Plant one ultra-common shingle across every doc: without pruning the
    inverted index gains O(n²) join rows on that shingle; with max_shingle_df
    the hot shingle is dropped and the candidate-pair count stays bounded."""
    from spanner_data_validator_spark.operators.dedup import shingle_table

    hot = docs.select("doc_id", F.concat(F.lit("the hot gram "), F.col("text")).alias("text"))
    n_docs = hot.count()
    sh_pruned = shingle_table(hot, "doc_id", "text", 3, max_shingle_df=8)
    assert sh_pruned.where(F.col("shingle") == "the hot gram").count() == 0
    # pruning keeps pair generation bounded: the hot shingle alone would have
    # produced n*(n-1)/2 pairs
    pairs = jaccard_pairs(hot, "doc_id", "text", n=3, threshold=0.0,
                          max_shingle_df=8)
    assert pairs.count() < n_docs * (n_docs - 1) / 2


def _synthetic_corpus(spark, n_docs, *, vocab=5000, words=40, planted_every=25):
    """Deterministic word-salad corpus + planted near-dups: doc i+10^6 copies
    doc i (i % planted_every == 0) with its first two words replaced."""
    import hashlib

    def word(d, p):
        h = hashlib.md5(f"{d}:{p}".encode()).digest()
        return f"w{int.from_bytes(h[:4], 'big') % vocab}"

    rows = []
    for d in range(n_docs):
        ws = [word(d, p) for p in range(words)]
        rows.append((d, " ".join(ws)))
        if d % planted_every == 0:
            rows.append((d + 1_000_000, " ".join(["zz1", "zz2"] + ws[2:])))
    return spark.createDataFrame(rows, "doc_id LONG, text STRING")


def test_simhash_candidate_bound_two_corpus_sizes(spark):
    """The scale-config candidate count stays ~planted-only at BOTH corpus
    sizes (kept-key width 80 bits >> 2·log2 n), while a deliberately narrow
    key (one 4-bit block kept) grows ~C(n,2) — the C(b,h)·C(n,2)/2^(w·(b-h))
    bound from simhash_candidates' docstring, demonstrated empirically."""
    from math import comb

    from spanner_data_validator_spark.operators.dedup import (
        simhash_candidates,
        simhash_sig,
    )

    sizes = [250, 1000]
    narrow_counts = []
    for n_docs in sizes:
        corpus = _synthetic_corpus(spark, n_docs)
        n_total = corpus.count()
        n_planted = n_docs // 25 + (1 if n_docs % 25 else 0)

        # scale config: 128-bit signature, 8 blocks, h=3 -> kept keys 80 bits
        sig = simhash_sig(corpus, "doc_id", "text", bits=128)
        cand = simhash_candidates(sig, id_col="doc_id", bits=128, n_blocks=8,
                                  max_hamming=3)
        bound = comb(8, 3) * comb(n_total, 2) / 2 ** 80  # ~1e-18: zero random
        assert cand.count() <= n_planted + 3 * bound + 2

        # narrow config: 16-bit signature, 4 blocks, h=3 -> kept keys 4 bits;
        # random pairs ~ C(4,3)·C(n,2)/2^4 — the r2 quarter-scheme failure
        # mode, reproduced in miniature
        sig16 = simhash_sig(corpus, "doc_id", "text", bits=16)
        narrow = simhash_candidates(sig16, id_col="doc_id", bits=16,
                                    n_blocks=4, max_hamming=3)
        narrow_counts.append(narrow.count())

    # quadratic blowup across the two corpus sizes: 4x docs -> ~16x candidates
    ratio = narrow_counts[1] / max(narrow_counts[0], 1)
    assert 8 <= ratio <= 32, (narrow_counts, ratio)


def test_simhash_block_layout_validation():
    import pytest as _pytest

    from spanner_data_validator_spark.operators.dedup import simhash_block_layout

    assert simhash_block_layout(128, 8) == [(i // 4, (i % 4) * 16, 16)
                                            for i in range(8)]
    with _pytest.raises(ValueError, match="divide"):
        simhash_block_layout(128, 7)
    with _pytest.raises(ValueError, match="spans"):
        simhash_block_layout(96, 2)  # 48-bit blocks would straddle word 0/1


def test_simhash_portable_hash_matches_duckdb(spark):
    """portable_hash60 (Spark md5-conv) == the documented DuckDB rendering."""
    import duckdb

    from spanner_data_validator_spark.functions.hashing import (
        portable_hash60,
        portable_hash60_sql,
    )

    vals = ["", "a", "hello world", "naïve ünïcode", "x" * 100]
    df = spark.createDataFrame([(v,) for v in vals], "s STRING")
    got = {r["s"]: r["h"] for r in
           df.select("s", portable_hash60(F.col("s"), 7).alias("h")).collect()}
    con = duckdb.connect()
    for v in vals:
        lit = "'" + v.replace("'", "''") + "'"
        want = con.sql("SELECT " + portable_hash60_sql(lit, 7)).fetchone()[0]
        assert got[v] == want, v


def test_simhash_identical_zero_hamming(spark):
    df = spark.createDataFrame(
        [(1, "a b c d e f g h"), (2, "a b c d e f g h"), (3, "q r s t u v w x")],
        "doc_id LONG, text STRING")
    sh = {r["doc_id"]: r["simhash"] for r in simhash64(df, "doc_id", "text").collect()}
    assert sh[1] == sh[2]
    nd = {(r["a"], r["b"]): r["hamming"] for r in
          simhash_near_dups(df, "doc_id", "text", max_hamming=3).collect()}
    assert nd.get((1, 2)) == 0 and (1, 3) not in nd


def test_hot_bucket_guard_drops_mega_cluster(spark):
    """max_bucket_size: 60 identical docs form one LSH bucket per band
    (C(60,2)=1770 pairs); with the guard at 10 the mega-cluster emits no
    candidates while a small planted near-dup pair elsewhere survives."""
    from spanner_data_validator_spark.operators.dedup import (
        lsh_candidates,
        minhash_signatures,
        simhash_candidates,
        simhash_near_dups,
        simhash_sig,
    )

    boiler = "cookie policy terms of service all rights reserved contact us"
    rows = [(i, boiler) for i in range(60)]
    rows += [(100, "alpha beta gamma delta epsilon zeta eta theta"),
             (101, "alpha beta gamma delta epsilon zeta eta iota")]
    df = spark.createDataFrame(rows, "doc_id LONG, text STRING")

    sigs = minhash_signatures(df, "doc_id", "text", n=3, num_perm=16)
    open_pairs = lsh_candidates(sigs, "doc_id", 16, bands=8).count()
    guarded = lsh_candidates(sigs, "doc_id", 16, bands=8, max_bucket_size=10)
    gp = {(r["a"], r["b"]) for r in guarded.collect()}
    assert open_pairs >= 1770            # the blowup is real
    assert all(a >= 100 for a, _ in gp)  # mega-cluster fully suppressed
    assert (100, 101) in gp              # small near-dups still found

    sig = simhash_sig(df, "doc_id", "text", n=3, bits=128)
    unguarded = {(r["a"], r["b"]) for r in simhash_candidates(
        sig, id_col="doc_id", bits=128, n_blocks=8, max_hamming=3).collect()}
    spp = {(r["a"], r["b"]) for r in simhash_candidates(
        sig, id_col="doc_id", bits=128, n_blocks=8, max_hamming=3,
        max_bucket_size=10).collect()}
    assert len(unguarded) >= 1770
    # the guard removes exactly the mega-cluster's pairs, nothing else
    assert spp == {(a, b) for a, b in unguarded if a >= 100}
    # end-to-end variant honors the guard too
    nd = simhash_near_dups(df, "doc_id", "text", max_bucket_size=10)
    assert all(r["a"] >= 100 for r in nd.collect())


def test_connected_components_planted(spark):
    """Chain, triangle+tail, singleton-free edge list -> min-labeled groups."""
    from spanner_data_validator_spark.operators.dedup import connected_components

    edges = spark.createDataFrame(
        [(5, 3), (3, 9), (9, 7),          # chain {3,5,7,9} -> 3
         (20, 21), (21, 22), (20, 22), (22, 30),  # triangle+tail -> 20
         (41, 40)],                        # pair -> 40
        "a LONG, b LONG")
    got = {(r["node"], r["component"])
           for r in connected_components(edges).collect()}
    want = {(n, 3) for n in (3, 5, 7, 9)} | \
           {(n, 20) for n in (20, 21, 22, 30)} | {(40, 40), (41, 40)}
    assert got == want


def test_connected_components_empty_and_selfloop(spark):
    from spanner_data_validator_spark.operators.dedup import connected_components

    empty = spark.createDataFrame([], "a LONG, b LONG")
    assert connected_components(empty).count() == 0
    loops = spark.createDataFrame([(4, 4), (4, 2)], "a LONG, b LONG")
    got = {(r["node"], r["component"]) for r in connected_components(loops).collect()}
    assert got == {(2, 2), (4, 2)}


def test_assign_components_and_canonical(spark):
    from spanner_data_validator_spark.operators.dedup import (
        assign_components,
        canonical_docs,
    )

    docs = spark.createDataFrame(
        [(i, f"doc {i}") for i in (1, 2, 3, 4, 5)], "doc_id LONG, text STRING")
    pairs = spark.createDataFrame([(2, 4), (4, 5)], "a LONG, b LONG")
    labeled = {(r["doc_id"], r["component"])
               for r in assign_components(docs, pairs, "doc_id").collect()}
    assert labeled == {(1, 1), (2, 2), (3, 3), (4, 2), (5, 2)}
    kept = sorted(r["doc_id"] for r in canonical_docs(docs, pairs, "doc_id").collect())
    assert kept == [1, 2, 3]


def test_duplicate_spans_planted_boilerplate(spark):
    """Two docs share an 8-word boilerplate tail; one doc repeats a 6-word
    run internally. Spans are exact 1-based inclusive token intervals."""
    from spanner_data_validator_spark.operators.dedup import duplicate_spans

    boiler = "terms of service apply to all mirrored content"  # 8 words
    rows = [
        # doc 1: 4 unique words + boilerplate at tokens 5..12
        (1, "alpha beta gamma delta " + boiler),
        # doc 2: 2 unique words + boilerplate at tokens 3..10
        (2, "epsilon zeta " + boiler),
        # doc 3: internal repeat of a 6-word run (tokens 1..6 and 9..14)
        (3, "one two three four five six x y one two three four five six"),
        # doc 4: nothing duplicated
        (4, "nothing here repeats with anything else in the corpus at all"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = duplicate_spans(df, "doc_id", "text", width=6)
    got = {(r.doc_id, r.span_start, r.span_end, r.n_windows)
           for r in out.collect()}
    # 8-word boilerplate = 3 overlapping 6-windows, merged into one span
    assert (1, 5, 12, 3) in got
    assert (2, 3, 10, 3) in got
    # internal repeat: both 6-word occurrences marked; gap 9-1=8 > 6 so they
    # stay separate spans
    assert (3, 1, 6, 1) in got and (3, 9, 14, 1) in got
    assert not any(r[0] == 4 for r in got)
    assert len(got) == 4


def test_duplicate_spans_merges_adjacent_windows(spark):
    """Repeated windows whose starts differ by exactly `width` adjoin
    (contiguous duplicated tokens) and merge into one span."""
    from spanner_data_validator_spark.operators.dedup import duplicate_spans

    # docs 1 and 2 share tokens: a 12-word run = 10 overlapping 3-windows
    shared = "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 w11 w12"
    df = spark.createDataFrame(
        [(1, shared + " unique1 tail1"), (2, "lead2 " + shared)],
        "doc_id long, text string")
    out = duplicate_spans(df, "doc_id", "text", width=3)
    got = {(r.doc_id, r.span_start, r.span_end, r.n_windows)
           for r in out.collect()}
    assert got == {(1, 1, 12, 10), (2, 2, 13, 10)}
