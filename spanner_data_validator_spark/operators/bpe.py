"""Byte-pair-encoding merge statistics — the tokenizer-training primitive.

One BPE training round = count adjacent symbol pairs across the corpus
(weighted by word frequency), pick the most frequent pair, merge it into a
new symbol everywhere. This module runs that round as DataFrames with pure
integer counts — trivially engine-exact — and renders the identical round
as DuckDB SQL.

The corpus collapses to its **vocabulary** first (word -> corpus count):
after that every pair count, merge, and recount runs over the
vocabulary-sized table, never the corpus — exactly how production BPE
trainers work, and why this survives 100 TB: the only corpus-sized shuffle
is the word-count aggregation (map-side combined); everything downstream is
vocabulary x word-length work.

Symbols are space-joined inside the word string ("h e l l o"), so a merge
is a plain leftmost non-overlapping ``replace("l l" -> "ll")`` — identical
semantics in Spark and DuckDB. With single-round merges every symbol is one
char, so the needle always aligns to symbol boundaries; multi-round training
needs boundary-padded needles (``' a b ' -> ' ab '`` on a padded string) —
documented, not implemented here.

Reference parity: no analogue (tokenizer training is LLM-pipeline tier,
SURVEY.md §2.10).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["word_symbol_table", "pair_counts", "bpe_one_merge", "bpe_sql"]


def word_symbol_table(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(word, wcnt, syms): corpus word frequencies with the word split into
    single-char symbols. Materialized — it feeds pair counting twice (before
    and after the merge) plus the top-pair selection."""
    toks = F.explode(F.split(F.lower(F.col(text_col)), " ")).alias("word")
    words = (df.select(toks).where(F.col("word") != "")
               .groupBy("word").agg(F.count(F.lit(1)).alias("wcnt")))
    sym = F.trim(F.regexp_replace(F.col("word"), "(.)", "$1 "))
    return (words.select("word", "wcnt", F.split(sym, " ").alias("syms"))
            .localCheckpoint(eager=False))


def pair_counts(syms: DataFrame) -> DataFrame:
    """(pair, cnt): adjacent-symbol pair counts weighted by word frequency.
    ``syms`` must be materialized (the slice/zip lambdas read the column
    twice — on a computed column Catalyst would re-evaluate it per use)."""
    n = F.size("syms")
    pairs = F.zip_with(
        F.slice(F.col("syms"), 1, F.greatest(n - 1, F.lit(0))),
        F.slice(F.col("syms"), 2, F.greatest(n - 1, F.lit(0))),
        lambda a, b: F.concat(a, F.lit(" "), b))
    return (syms.select("wcnt", F.explode(pairs).alias("pair"))
            .groupBy("pair").agg(F.sum("wcnt").alias("cnt")))


def bpe_one_merge(df: DataFrame, id_col: str, text_col: str,
                  *, k: int = 10) -> DataFrame:
    """Run one BPE merge round; return the top-``k`` pairs AFTER the merge.

    The winning pair (highest count, ties to the lexically smallest) is
    merged into one symbol across the vocabulary, then pairs are recounted —
    so the output reflects the new symbol's adjacencies (the input to the
    next round). Output: (pair, cnt, rank).
    """
    table = word_symbol_table(df, id_col, text_col)
    top = (pair_counts(table)
           .orderBy(F.desc("cnt"), F.asc("pair")).limit(1)
           .select(F.col("pair").alias("__mp"),
                   F.regexp_replace("pair", " ", "").alias("__ms")))
    merged = (table.crossJoin(F.broadcast(top))
              .select("wcnt",
                      F.split(F.replace(F.concat_ws(" ", "syms"),
                                        F.col("__mp"), F.col("__ms")),
                              " ").alias("syms"))
              .localCheckpoint(eager=False))
    out = (pair_counts(merged)
           .orderBy(F.desc("cnt"), F.asc("pair")).limit(k))
    w = Window.orderBy(F.desc("cnt"), F.asc("pair"))
    return out.select("pair", "cnt",
                      F.row_number().over(w).cast("int").alias("rank"))


def bpe_sql(docs_sql: str, id_col: str, text_col: str, *, k: int = 10) -> str:
    """DuckDB rendering of :func:`bpe_one_merge` — same tokenization, same
    tie-break, same leftmost non-overlapping replace."""
    return f"""
bp_words AS (SELECT word, CAST(count(*) AS BIGINT) AS wcnt FROM (
               SELECT unnest(string_split(lower({text_col}), ' ')) AS word
               FROM ({docs_sql})) WHERE word <> '' GROUP BY word),
bp_syms AS (SELECT wcnt,
                   string_split(trim(regexp_replace(word, '(.)', '\\1 ', 'g')),
                                ' ') AS syms
            FROM bp_words),
bp_cnt0 AS (SELECT pair, CAST(sum(wcnt) AS BIGINT) AS cnt FROM (
              SELECT wcnt,
                     unnest([syms[i] || ' ' || syms[i + 1]
                             for i in range(1, array_length(syms))]) AS pair
              FROM bp_syms) GROUP BY pair),
bp_top AS (SELECT pair AS mp, replace(pair, ' ', '') AS ms
           FROM bp_cnt0 ORDER BY cnt DESC, pair LIMIT 1),
bp_merged AS (SELECT s.wcnt,
                     string_split(replace(array_to_string(s.syms, ' '),
                                          t.mp, t.ms), ' ') AS syms
              FROM bp_syms s CROSS JOIN bp_top t),
bp_cnt1 AS (SELECT pair, CAST(sum(wcnt) AS BIGINT) AS cnt FROM (
              SELECT wcnt,
                     unnest([syms[i] || ' ' || syms[i + 1]
                             for i in range(1, array_length(syms))]) AS pair
              FROM bp_merged) GROUP BY pair)
SELECT pair, cnt,
       CAST(row_number() OVER (ORDER BY cnt DESC, pair) AS INT) AS rank
FROM bp_cnt1 ORDER BY cnt DESC, pair LIMIT {k}"""
