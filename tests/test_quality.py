"""Quality-curation operators: repetition metrics, PII redaction,
benchmark-contamination overlap."""

from __future__ import annotations

from pyspark.sql import functions as F

from spanner_data_validator_spark.functions.text import redact_pii
from spanner_data_validator_spark.operators.quality import (
    contamination_overlap,
    repetition_metrics,
)


def test_repetition_metrics_planted(spark):
    rows = [
        (1, "a a a b"),          # 4 words, 2 distinct, top 3; grams: "a a a","a a b"
        (2, "x y"),              # too short for 3-grams
        (3, ""),                 # empty
        (4, "p q p q p q p q"),  # heavy 3-gram repetition
    ]
    df = spark.createDataFrame(rows, "doc_id LONG, text STRING")
    out = {r["doc_id"]: r for r in
           repetition_metrics(df, "doc_id", "text", n=3).collect()}
    assert out[1]["n_words"] == 4
    assert out[1]["dup_word_frac"] == 1 - 2 / 4
    assert out[1]["top_word_frac"] == 3 / 4
    assert out[1]["dup_ngram_frac"] == 0.0
    assert out[2]["n_words"] == 2 and out[2]["dup_ngram_frac"] == 0.0
    assert out[3]["n_words"] == 0 and out[3]["dup_word_frac"] == 0.0
    # "p q p q p q p q": 6 grams, 2 distinct ("p q p", "q p q")
    assert out[4]["dup_ngram_frac"] == 1 - 2 / 6


def test_redact_pii_vectors(spark):
    rows = [
        (1, "mail me at alice.smith+x@corp.example.org please"),
        (2, "server at 192.168.001.42 down"),
        (3, "call +1 555-123-4567 now"),
        (4, "v1.2 released, section 3.4"),   # version strings stay
        (5, "no pii here at all"),
    ]
    df = spark.createDataFrame(rows, "doc_id LONG, text STRING")
    got = {r["doc_id"]: r["red"] for r in
           df.select("doc_id", redact_pii("text").alias("red")).collect()}
    assert got[1] == "mail me at <EMAIL> please"
    assert got[2] == "server at <IP> down"
    assert got[3] == "call <PHONE> now"
    assert got[4] == "v1.2 released, section 3.4"
    assert got[5] == "no pii here at all"


def test_contamination_overlap_planted(spark):
    bench = spark.createDataFrame(
        [(100, "the quick brown fox jumps over the lazy dog tonight")],
        "doc_id LONG, text STRING")
    docs = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog tonight"),  # verbatim copy
         (2, "alpha beta gamma delta epsilon zeta eta theta iota"),   # clean
         (3, "intro words then the quick brown fox jumps over the lazy dog tonight")],
        "doc_id LONG, text STRING")
    out = {r["doc_id"]: r for r in
           contamination_overlap(docs, bench, n=8, threshold=0.0).collect()}
    assert out[1]["overlap_frac"] == 1.0
    assert out[2]["overlap_frac"] == 0.0
    # partial copy: suffix 8-grams hit, prefix ones don't
    assert 0.0 < out[3]["overlap_frac"] < 1.0
    # threshold filters the clean doc
    kept = {r["doc_id"] for r in
            contamination_overlap(docs, bench, n=8, threshold=0.5).collect()}
    assert kept == {1, 3} or kept == {1}


def test_contamination_plan_broadcasts_benchmark(spark):
    bench = spark.createDataFrame([(0, "a b c d e f g h i")],
                                  "doc_id LONG, text STRING")
    docs = spark.createDataFrame([(1, "a b c d e f g h i j")],
                                 "doc_id LONG, text STRING")
    plan = contamination_overlap(docs, bench)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_line_dedup_removes_boilerplate_keeps_order(spark):
    from spanner_data_validator_spark.operators.quality import line_dedup

    boiler = "subscribe now"
    rows = [(i, f"unique {i} alpha\n{boiler}\nunique {i} beta") for i in range(10)]
    rows.append((100, boiler))                       # all-boilerplate doc
    rows.append((101, "lonely line\nanother lonely"))  # nothing removed
    df = spark.createDataFrame(rows, "doc_id LONG, text STRING")
    out = {r["doc_id"]: (r["clean_text"], r["n_lines"], r["n_removed"])
           for r in line_dedup(df, min_df=5).collect()}

    for i in range(10):   # boilerplate gone, content order preserved
        assert out[i] == (f"unique {i} alpha\nunique {i} beta", 3, 1)
    assert out[100] == ("", 1, 1)                    # fully-boilerplate doc
    assert out[101] == ("lonely line\nanother lonely", 2, 0)


def test_pseudonymize_consistent_null_safe_and_rotatable(spark):
    from spanner_data_validator_spark.operators.quality import pseudonymize
    df = spark.createDataFrame(
        [(1, "a"), (1, "b"), (2, "c"), (None, "d")], "uid long, x string")
    p1 = pseudonymize(df, ["uid"], "s1").collect()
    toks = {r.x: r.uid for r in p1}
    assert toks["a"] == toks["b"]                  # same value, same token
    assert toks["a"] != toks["c"]                  # different values differ
    assert toks["d"] is None                       # NULL stays NULL
    assert len(toks["a"]) == 16
    p2 = {r.x: r.uid for r in pseudonymize(df, ["uid"], "s2").collect()}
    assert p2["a"] != toks["a"]                    # secret rotation unlinks
