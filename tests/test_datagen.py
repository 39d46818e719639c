"""Generator invariants: determinism, planted counts, schema shape."""

from __future__ import annotations

import pandas as pd

from spanner_data_validator_spark.datagen.transcripts import gen_transcript_pair


def test_deterministic():
    a = gen_transcript_pair(n_convs=30, seed=123)
    b = gen_transcript_pair(n_convs=30, seed=123)
    pd.testing.assert_frame_equal(a.source, b.source)
    pd.testing.assert_frame_equal(a.target, b.target)
    assert a.expected == b.expected


def test_keys_unique_modulo_planted_dups():
    pair = gen_transcript_pair(n_convs=30, seed=1, dup_rows=4)
    src = pair.source
    n_dup = len(src) - len(src.drop_duplicates(subset=["conv_id", "turn_idx"]))
    assert n_dup == 4


def test_expected_counts_consistent():
    pair = gen_transcript_pair(n_convs=50, seed=2, dup_rows=0)
    e = pair.expected
    src_keys = set(map(tuple, pair.source[["conv_id", "turn_idx"]].itertuples(index=False)))
    tgt_keys = set(map(tuple, pair.target[["conv_id", "turn_idx"]].itertuples(index=False)))
    assert len(src_keys - tgt_keys) == e["SOURCE_ONLY"]
    assert len(tgt_keys - src_keys) == e["TARGET_ONLY"]
    assert len(src_keys & tgt_keys) == e["MATCH"] + e["MISMATCH"]


def test_event_time_monotone_per_conversation():
    pair = gen_transcript_pair(n_convs=20, seed=3, dup_rows=0, late_fraction=0.0)
    g = pair.source.sort_values(["conv_id", "turn_idx"]).groupby("conv_id")["ts"]
    assert (g.diff().dropna() >= pd.Timedelta(0)).all()


def test_skewed_conversations_present():
    pair = gen_transcript_pair(n_convs=30, seed=4, hot_convs=2, hot_size=300)
    sizes = pair.source.groupby("conv_id").size()
    assert (sizes >= 300).sum() == 2
