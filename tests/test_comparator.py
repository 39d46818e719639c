"""Batch comparator: classification, tally identity, dedup, timestamp threshold."""

from __future__ import annotations

from pyspark.sql import functions as F

from spanner_data_validator_spark.datagen.transcripts import TRANSCRIPT_SCHEMA, gen_transcript_pair
from spanner_data_validator_spark.operators.comparator import (
    MATCH, MISMATCH, SOURCE_ONLY, TARGET_ONLY,
    apply_timestamp_threshold, classify_pair, dedup_first, tally_report, validate_batch,
)

KEY = ["conv_id", "turn_idx"]
PAYLOAD = ["role", "text", "tool"]


def _pair_dfs(spark, **kw):
    pair = gen_transcript_pair(**kw)
    src = spark.createDataFrame(pair.source, schema=TRANSCRIPT_SCHEMA)
    tgt = spark.createDataFrame(pair.target, schema=TRANSCRIPT_SCHEMA)
    return pair, src, tgt


def test_classification_counts_match_planted(spark):
    pair, src, tgt = _pair_dfs(spark, n_convs=60, seed=7)
    classified, report, mism = validate_batch(src, tgt, KEY, PAYLOAD,
                                              json_cols={"tool"}, keep_values=True)
    got = {r["status"]: r["n"] for r in
           classified.groupBy("status").agg(F.count("*").alias("n")).collect()}
    assert got == pair.expected


def test_tally_identity(spark):
    """Reference identity (SURVEY.md §2.4): match=MATCH,
    source_conflict=MISMATCH+SOURCE_ONLY, target_conflict=MISMATCH+TARGET_ONLY."""
    pair, src, tgt = _pair_dfs(spark, n_convs=60, seed=7)
    _, report, _ = validate_batch(src, tgt, KEY, PAYLOAD, json_cols={"tool"})
    tot = report.agg(
        F.sum("match_count").alias("m"), F.sum("source_count").alias("s"),
        F.sum("target_count").alias("t"), F.sum("source_conflict_count").alias("sc"),
        F.sum("target_conflict_count").alias("tc")).collect()[0]
    e = pair.expected
    assert tot["m"] == e["MATCH"]
    assert tot["sc"] == e["MISMATCH"] + e["SOURCE_ONLY"]
    assert tot["tc"] == e["MISMATCH"] + e["TARGET_ONLY"]
    assert tot["s"] == e["MATCH"] + e["MISMATCH"] + e["SOURCE_ONLY"]
    assert tot["t"] == e["MATCH"] + e["MISMATCH"] + e["TARGET_ONLY"]


def test_per_turn_text_equality_under_stable_ordering(spark):
    """input_hint invariant: per-turn text equality under stable (conv_id, turn_idx)
    ordering — every MATCH-classified key has identical text on both sides."""
    pair, src, tgt = _pair_dfs(spark, n_convs=40, seed=11)
    s = src.select("conv_id", "turn_idx", F.col("text").alias("src_text")).dropDuplicates(KEY)
    t = tgt.select("conv_id", "turn_idx", F.col("text").alias("tgt_text")).dropDuplicates(KEY)
    classified, _, _ = validate_batch(src, tgt, KEY, PAYLOAD, json_cols={"tool"})
    joined = (classified.join(s, KEY, "left").join(t, KEY, "left")
              .orderBy("conv_id", "turn_idx"))
    bad = joined.where(
        (F.col("status") == MATCH)
        & ~(F.col("src_text").eqNullSafe(F.col("tgt_text")))).count()
    assert bad == 0
    # and every MISMATCH differs in text (our generator only mutates text)
    bad2 = joined.where((F.col("status") == MISMATCH)
                        & F.col("src_text").eqNullSafe(F.col("tgt_text"))).count()
    assert bad2 == 0


def test_dedup_first_collapses_duplicates(spark):
    df = spark.createDataFrame(
        [("k1", 0, 10), ("k1", 0, 10), ("k1", 0, 5), ("k2", 1, 7)],
        "conv_id STRING, turn_idx INT, fingerprint LONG")
    out = dedup_first(df, KEY)
    rows = {(r["conv_id"], r["turn_idx"]): r["fingerprint"] for r in out.collect()}
    assert rows == {("k1", 0): 5, ("k2", 1): 7}


def test_classify_pair_mismatch_double_sided(spark):
    src = spark.createDataFrame([("a", 0, 1), ("b", 0, 2)], "conv_id STRING, turn_idx INT, fingerprint LONG")
    tgt = spark.createDataFrame([("a", 0, 99), ("c", 0, 3)], "conv_id STRING, turn_idx INT, fingerprint LONG")
    got = {(r["conv_id"]): r["status"] for r in classify_pair(src, tgt, KEY).collect()}
    assert got == {"a": MISMATCH, "b": SOURCE_ONLY, "c": TARGET_ONLY}


def test_timestamp_threshold_window(spark):
    # CountMatchesDoFn.java:47-65: delta != 0 → [min(th+Δ,th), max(th+Δ,th)]
    rows = [("a", 0, 1, 1, 1_000_000), ("b", 0, 1, 1, 4_000_000), ("c", 0, 1, 1, 9_000_000)]
    df = spark.createDataFrame(rows, "conv_id STRING, turn_idx INT, src_fp LONG, "
                                     "tgt_fp LONG, tgt_ts_millis LONG")
    df = df.withColumn("src_ts_millis", F.col("tgt_ts_millis")).withColumn("status", F.lit(MATCH))
    th = 5_000_000
    out = apply_timestamp_threshold(df, threshold_millis=th, delta_mins=-50)  # [2e6, 5e6]
    assert {r["conv_id"] for r in out.collect()} == {"b"}
    # delta == 0 → [th, th+10000d]
    out2 = apply_timestamp_threshold(df, threshold_millis=th, delta_mins=0)
    assert {r["conv_id"] for r in out2.collect()} == {"c"}
    # threshold <= 0 → no-op
    assert apply_timestamp_threshold(df, threshold_millis=0).count() == 3


def test_salted_tally_equals_plain(spark):
    _, src, tgt = _pair_dfs(spark, n_convs=50, seed=3)
    classified, _, _ = validate_batch(src, tgt, KEY, PAYLOAD, json_cols={"tool"})
    rng = F.pmod(F.xxhash64("conv_id"), F.lit(8))
    plain = {r["range"]: r for r in tally_report(classified, rng).collect()}
    salted = {r["range"]: r for r in tally_report(classified, rng, salt_buckets=16).collect()}
    assert plain.keys() == salted.keys()
    for k in plain:
        for c in ["match_count", "source_count", "target_count",
                  "source_conflict_count", "target_conflict_count"]:
            assert plain[k][c] == salted[k][c]


def test_mismatch_rows_sink_shape(spark):
    pair, src, tgt = _pair_dfs(spark, n_convs=40, seed=5)
    _, _, mism = validate_batch(src, tgt, KEY, PAYLOAD, json_cols={"tool"},
                                keep_values=True, run_name="r1")
    e = pair.expected
    by = {(r["side"], r["status"]) for r in mism.select("side", "status").distinct().collect()}
    assert ("source", MATCH) not in by and ("target", MATCH) not in by
    n = mism.count()
    # each MISMATCH contributes 2 rows (both sides), each *_ONLY contributes 1
    assert n == 2 * e["MISMATCH"] + e["SOURCE_ONLY"] + e["TARGET_ONLY"]


def test_latest_per_key_last_writer_wins(spark):
    from spanner_data_validator_spark.operators.comparator import latest_per_key

    rows = [
        (1, "v1", 100, 0), (1, "v2", 200, 0),          # later ts wins
        (2, "only", 50, 0),                              # single version
        (3, "a", 300, 1), (3, "b", 300, 2),              # ts tie -> tiebreak col
    ]
    df = spark.createDataFrame(rows, "key LONG, payload STRING, ts LONG, seq LONG")
    out = {r["key"]: (r["payload"], r["ts"]) for r in
           latest_per_key(df, ["key"], "ts", ["payload"],
                          tiebreak_cols=["seq"]).collect()}
    assert out == {1: ("v2", 200), 2: ("only", 50), 3: ("b", 300)}
    # without a tiebreak column, ties resolve by max value tuple (deterministic)
    out2 = {r["key"]: r["payload"] for r in
            latest_per_key(df, ["key"], "ts", ["payload"]).collect()}
    assert out2[3] == "b"


def test_classify_three_way_all_statuses_and_votes(spark):
    from spanner_data_validator_spark.operators.comparator import (
        classify_three_way,
    )

    def side(rows):
        return spark.createDataFrame(rows, "k long, fingerprint string")

    src = side([(1, "a"), (2, "a"), (3, "a"), (4, "a"), (5, "a"),
                (6, "a"), (7, "a")])
    tgt = side([(1, "a"), (2, "b"), (3, "a"), (4, "b"),
                (6, "x"), (8, "z"), (2, "dup-ignored")])
    bak = side([(1, "a"), (2, "c"), (3, "a"), (4, "b"), (5, "a"),
                (7, "y")])
    got = {r.k: (r.status, r.n_present, r.vote_fp)
           for r in classify_three_way(src, tgt, bak, ["k"]).collect()}
    assert got == {
        1: ("ALL_MATCH", 3, "a"),      # all agree
        2: ("ALL_DIFFER", 3, None),    # a/b/c (dup in tgt collapsed)
        3: ("ALL_MATCH", 3, "a"),
        4: ("MAJORITY", 3, "b"),       # tgt+bak outvote src
        5: ("PAIR_MATCH", 2, "a"),     # tgt missing, src==bak
        6: ("PAIR_DIFFER", 2, None),   # bak missing, src!=tgt
        7: ("PAIR_DIFFER", 2, None),   # tgt missing, src!=bak
        8: ("SINGLETON", 1, None),     # tgt only
    }
