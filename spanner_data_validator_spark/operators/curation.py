"""End-to-end corpus-curation funnel — the operators composed as one pipeline.

``curation_funnel`` chains the curation stages every large-scale training-data
pipeline runs, in their canonical order, and reports the survivor count after
each stage:

1. ``raw``            — the incoming corpus
2. ``exact_dedup``    — one doc per identical text (min-id canonical)
3. ``neardup_prune``  — n-gram-Jaccard pairs → connected components → one
                        canonical doc per near-dup group
4. ``quality_gate``   — Gopher-style repetition gate, integer-exact:
                        ``n_words >= min_words`` and
                        ``top_c * top_word_den <= n_words`` (i.e. the most
                        frequent word is at most 1/den of the doc)
5. ``decontaminated`` — drop every doc sharing ANY ``contamination_n``-gram
                        with the benchmark/eval set (broadcast anti-join)

Each stage materializes its survivor set (``localCheckpoint``) before the
next — at 100 TB every stage is a table write anyway, and without the barrier
Spark would re-run the whole upstream funnel once per stage-count branch
(aliased subplans do not share exchanges). The stage thresholds are integer
comparisons, never float ratios, so the funnel is bit-reproducible across
engines.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from spanner_data_validator_spark.functions.text import shingles
from spanner_data_validator_spark.operators.dedup import (
    canonical_docs,
    exact_dedup,
    jaccard_pairs,
)

STAGES = ["raw", "exact_dedup", "neardup_prune", "quality_gate",
          "decontaminated"]


def curation_funnel(corpus: DataFrame, benchmark: DataFrame,
                    *, id_col: str = "doc_id", text_col: str = "text",
                    jaccard_n: int = 3, jaccard_threshold: float = 0.7,
                    max_shingle_df: int | None = None,
                    min_words: int = 20, top_word_den: int = 4,
                    contamination_n: int = 8) -> DataFrame:
    """Run the 5-stage funnel; output one row per stage:
    (stage_idx, stage, n_docs)."""
    stages: list[DataFrame] = [corpus]

    canon = exact_dedup(corpus, id_col, text_col).select(id_col)
    c1 = corpus.join(canon, id_col, "semi").localCheckpoint(eager=True)
    stages.append(c1)

    pairs = jaccard_pairs(c1, id_col, text_col, n=jaccard_n,
                          threshold=jaccard_threshold,
                          max_shingle_df=max_shingle_df)
    c2 = canonical_docs(c1, pairs, id_col).localCheckpoint(eager=True)
    stages.append(c2)

    words = (c2.select(F.col(id_col),
                       F.explode(F.split(F.col(text_col), " ")).alias("w"))
               .where(F.col("w") != ""))
    wstat = (words.groupBy(id_col, "w").agg(F.count("*").alias("c"))
                  .groupBy(id_col)
                  .agg(F.sum("c").alias("n_words"), F.max("c").alias("top_c")))
    keep = (wstat.where((F.col("n_words") >= min_words)
                        & (F.col("top_c") * top_word_den <= F.col("n_words")))
                 .select(id_col))
    c3 = c2.join(keep, id_col, "semi").localCheckpoint(eager=True)
    stages.append(c3)

    bench = (benchmark.select(F.explode(F.array_distinct(
        shingles(text_col, contamination_n))).alias("g")).distinct())
    dg = c3.select(F.col(id_col), F.explode(F.array_distinct(
        shingles(text_col, contamination_n))).alias("g"))
    contaminated = dg.join(F.broadcast(bench), "g").select(id_col).distinct()
    c4 = c3.join(contaminated, id_col, "anti")
    stages.append(c4)

    counts = [
        s.agg(F.count("*").alias("n_docs"))
         .select(F.lit(i + 1).alias("stage_idx"),
                 F.lit(name).alias("stage"), "n_docs")
        for i, (name, s) in enumerate(zip(STAGES, stages))
    ]
    return reduce(DataFrame.unionByName, counts)
