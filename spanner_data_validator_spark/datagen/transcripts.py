"""Deterministic dual-stream transcript generator (FIXTURES.md §1).

Produces a (source, target) pair of conversation-transcript tables with the
exact input shape from BASELINE.json's input_hint —
``(conv_id string, turn_idx int32, role string, text string, tool string,
ts timestamp)`` — where the target is a copy of the source with planted,
counted divergences:

* MATCH        — row copied verbatim (incl. tool-JSON with shuffled key order,
                 which must still fingerprint equal under JSON normalization)
* MISMATCH     — same key, mutated text
* SOURCE_ONLY  — row deleted from target
* TARGET_ONLY  — extra row inserted into target (new turn_idx / new conv_id)
* duplicate keys — exact-duplicate rows on both sides (dedup-before-join,
                 reference first-element rule CountMatchesDoFn.java:73-80)

The generator returns the expected per-status counts, so tests assert exact
classification numbers and the reference tally identity. Fully vectorized
numpy — ~10M turns/s generation, usable for the bench corpus.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import pandas as pd

TRANSCRIPT_SCHEMA = (
    "conv_id STRING, turn_idx INT, role STRING, text STRING, tool STRING, ts TIMESTAMP"
)

_ROLES = np.array(["user", "assistant", "tool"])


@dataclass
class TranscriptPair:
    source: pd.DataFrame
    target: pd.DataFrame
    expected: dict[str, int] = field(default_factory=dict)


def _cum_within(vals: np.ndarray, sizes: np.ndarray) -> np.ndarray:
    """Cumulative sum restarting at each conversation boundary."""
    cum = np.cumsum(vals)
    starts = np.concatenate(([0], np.cumsum(sizes)[:-1]))
    offset = np.repeat(cum[starts] - vals[starts], sizes)
    return cum - offset


def gen_transcript_pair(
    n_convs: int = 100,
    *,
    seed: int = 42,
    hot_convs: int = 2,
    hot_size: int = 400,
    mismatch_rate: float = 0.02,
    source_only_rate: float = 0.02,
    target_only_rate: float = 0.02,
    dup_rows: int = 5,
    late_fraction: float = 0.01,
    late_shift_s: int = 3600,
    null_text_rate: float = 0.005,
    base_ts: str = "2025-01-01T00:00:00",
) -> TranscriptPair:
    rng = np.random.RandomState(seed)

    sizes = rng.randint(2, 21, n_convs).astype(np.int64)
    if hot_convs:
        sizes[:hot_convs] = hot_size  # skew: a few hot conversations
    total = int(sizes.sum())
    conv_ord = np.repeat(np.arange(n_convs), sizes)
    turn_idx = (np.arange(total) - np.repeat(np.concatenate(([0], np.cumsum(sizes)[:-1])), sizes)
                ).astype(np.int32)

    conv_id = np.char.add("conv-", np.char.zfill(conv_ord.astype(str), 8))
    role = _ROLES[turn_idx % 3]
    role = np.where((turn_idx == 0) & (conv_ord % 7 == 0), "system", role)

    # seeded pseudo-text: word-salad keyed by (conv, turn); some NULL / empty
    words = np.array(["alpha", "beta", "gamma", "delta", "tok", "plan", "query",
                      "merge", "scan", "row", "turn", "agent", "tool", "call"])
    wsel = rng.randint(0, len(words), (total, 6))
    text = np.array([" ".join(words[r]) for r in wsel], dtype=object)
    text = np.char.add(np.char.add(conv_id.astype(str), ":"), text.astype(str)).astype(object)
    u_null = rng.rand(total)
    text[u_null < null_text_rate] = None
    text[(u_null >= null_text_rate) & (u_null < 2 * null_text_rate)] = ""

    # tool payload for role='tool' — JSON whose key ORDER differs between sides
    is_tool = role == "tool"
    tool_src = np.full(total, None, dtype=object)
    tool_tgt = np.full(total, None, dtype=object)
    tn = rng.randint(0, 5, total)
    a = rng.randint(0, 100, total)
    for i in np.flatnonzero(is_tool):
        tool_src[i] = '{"name": "t%d", "args": {"a": %d, "b": true}}' % (tn[i], a[i])
        tool_tgt[i] = '{"args": {"b": true, "a": %d}, "name": "t%d"}' % (a[i], tn[i])

    # event time: monotone per conversation; planted gaps > session gap
    gaps = rng.randint(1, 120, total).astype(np.int64)
    gaps[(turn_idx > 0) & (turn_idx % 13 == 0)] = 3600 + 60  # session split
    gaps[turn_idx == 0] = 0
    within = _cum_within(gaps, sizes)
    # conversations staggered 2h apart, wrapping every 16384 so arbitrarily
    # many conversations overlap in time (and ns epochs stay < int64 max)
    base = (conv_ord % 16384) * 7200
    ts = pd.Timestamp(base_ts).to_datetime64() + ((base + within) * 1_000_000_000).astype(
        "timedelta64[ns]")

    src = pd.DataFrame({
        "conv_id": conv_id, "turn_idx": turn_idx, "role": role,
        "text": text, "tool": tool_src, "ts": ts,
    })

    # ----- plant divergences in the target ---------------------------------
    u = rng.rand(total)
    mut = u < mismatch_rate
    deleted = (u >= mismatch_rate) & (u < mismatch_rate + source_only_rate)

    tgt = src.copy()
    tgt["tool"] = tool_tgt
    tgt_text = tgt["text"].to_numpy(dtype=object, copy=True)
    for i in np.flatnonzero(mut):
        t = tgt_text[i]
        tgt_text[i] = (t + "~MUT") if t else "~MUT"  # covers NULL/empty originals
    tgt["text"] = tgt_text
    tgt = tgt[~deleted].reset_index(drop=True)

    # TARGET_ONLY inserts: fresh turn_idx past each sampled conversation's end
    n_ins = int(total * target_only_rate)
    ins_conv = rng.randint(0, n_convs, n_ins)
    ins = pd.DataFrame({
        "conv_id": np.char.add("conv-", np.char.zfill(ins_conv.astype(str), 8)),
        "turn_idx": (sizes[ins_conv] + np.arange(n_ins) % 7).astype(np.int32),
        "role": np.full(n_ins, "assistant", dtype=object),
        "text": np.array([f"inserted-{i}" for i in range(n_ins)], dtype=object),
        "tool": np.full(n_ins, None, dtype=object),
        "ts": pd.Timestamp(base_ts).to_datetime64()
        + (((ins_conv % 16384) * 7200 + 90_000) * 1_000_000_000).astype("timedelta64[ns]"),
    })
    # collisions with existing keys would reclassify — keep keys unique
    ins = ins.drop_duplicates(subset=["conv_id", "turn_idx"])
    n_ins = len(ins)
    tgt = pd.concat([tgt, ins], ignore_index=True)

    # late rows: shift a fraction of target timestamps (exercises watermark;
    # ts is NOT part of the fingerprint payload so classification is unchanged)
    if late_fraction:
        late = rng.rand(len(tgt)) < late_fraction
        tgt.loc[late, "ts"] = tgt.loc[late, "ts"] + pd.Timedelta(seconds=late_shift_s)

    # exact-duplicate keys on both sides (must collapse to one tally each)
    if dup_rows:
        keep = src[~mut & ~deleted]
        dup_idx = rng.choice(len(keep), size=min(dup_rows, len(keep)), replace=False)
        dups = keep.iloc[dup_idx]
        src = pd.concat([src, dups], ignore_index=True)
        tgt = pd.concat([tgt, dups], ignore_index=True)

    expected = {
        "MATCH": int(total - mut.sum() - deleted.sum()),
        "MISMATCH": int(mut.sum()),
        "SOURCE_ONLY": int(deleted.sum()),
        "TARGET_ONLY": n_ins,
    }
    return TranscriptPair(source=src, target=tgt, expected=expected)
