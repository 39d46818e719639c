"""BPE merge round (operators/bpe.py)."""

from __future__ import annotations

from spanner_data_validator_spark.operators.bpe import (
    bpe_one_merge,
    pair_counts,
    word_symbol_table,
)


def _docs(spark):
    return spark.createDataFrame(
        [(1, "hello hello low"), (2, "lower lower")],
        "doc_id long, text string")


def test_pair_counts_weighted_by_word_frequency(spark):
    # hello x2, low x1, lower x2 — 'l o' appears in all three words
    table = word_symbol_table(_docs(spark), "doc_id", "text")
    cnt = {r["pair"]: r["cnt"] for r in pair_counts(table).collect()}
    assert cnt["l o"] == 5  # 2 (hello) + 1 (low) + 2 (lower)
    assert cnt["o w"] == 3 and cnt["h e"] == 2 and cnt["e r"] == 2


def test_one_merge_recounts_with_new_symbol(spark):
    # winner is 'l o' (count 5) -> symbol 'lo'; hand-derived post-merge
    # table: 'lo w' 3 (low + 2x lower), then count-2 pairs lexically
    out = [(r["pair"], r["cnt"], r["rank"])
           for r in bpe_one_merge(_docs(spark), "doc_id", "text", k=10).collect()]
    assert out == [("lo w", 3, 1), ("e l", 2, 2), ("e r", 2, 3),
                   ("h e", 2, 4), ("l lo", 2, 5), ("w e", 2, 6)]


def test_single_char_words_produce_no_pairs(spark):
    docs = spark.createDataFrame([(1, "a b c a")], "doc_id long, text string")
    table = word_symbol_table(docs, "doc_id", "text")
    assert pair_counts(table).count() == 0
