"""End-to-end curation funnel (operators/curation.py)."""

from __future__ import annotations

from spanner_data_validator_spark.operators.curation import curation_funnel

GOOD = ("alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu "
        "nu xi omicron pi rho sigma tau upsilon phi chi psi omega")  # 24 words
LEAKED = ("one two three four five six seven eight nine ten eleven twelve "
          "thirteen fourteen fifteen sixteen seventeen eighteen nineteen "
          "twenty cat dog bird fish")  # 24 words; leads with the eval 8-gram


def test_curation_funnel_stage_counts(spark):
    corpus = spark.createDataFrame(
        [(1, GOOD),
         (2, GOOD),                         # exact copy -> stage 2
         (3, "XX " + GOOD),                 # near-dup   -> stage 3
         (4, "spam " * 18 + "ham ham"),     # top word 18/20 -> stage 4
         (5, "just a few words here"),      # 5 words < 20   -> stage 4
         (6, LEAKED)],                      # shares the eval 8-gram -> stage 5
        "doc_id long, text string")
    bench = spark.createDataFrame(
        [(100, "one two three four five six seven eight")],
        "doc_id long, text string")
    out = curation_funnel(corpus, bench, min_words=20, top_word_den=4,
                          contamination_n=8)
    got = {r.stage: r.n_docs for r in out.collect()}
    assert got == {"raw": 6, "exact_dedup": 5, "neardup_prune": 4,
                   "quality_gate": 2, "decontaminated": 1}
    idx = {r.stage: r.stage_idx for r in out.collect()}
    assert idx == {"raw": 1, "exact_dedup": 2, "neardup_prune": 3,
                   "quality_gate": 4, "decontaminated": 5}
