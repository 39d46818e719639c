"""ConversationDigestProcessor (streaming/tws.py) semantics against a fake
StatefulProcessorHandle, plus convergence to the Spark batch ground truth.

The TWS runtime needs protobuf (absent in this sandbox — see module
docstring), but the processor is plain Python: drive it directly the way
the engine would (per-key input batches, then expired timers once the
watermark passes), and require exact equality with `batch_equivalent`.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from spanner_data_validator_spark.functions.hashing import portable_hash60
from spanner_data_validator_spark.streaming.tws import (
    ConversationDigestProcessor,
    batch_equivalent,
    conversation_digest_stream,
    tws_available,
)


class FakeValueState:
    def __init__(self):
        self._v = None

    def exists(self):
        return self._v is not None

    def get(self):
        return self._v

    def update(self, v):
        self._v = tuple(v)

    def clear(self):
        self._v = None


class FakeHandle:
    def __init__(self):
        self.states = {}
        self.timers = set()

    def getValueState(self, name, schema):
        return self.states.setdefault(name, FakeValueState())

    def registerTimer(self, ms):
        self.timers.add(int(ms))

    def deleteTimer(self, ms):
        self.timers.discard(int(ms))

    def listTimers(self):
        return list(self.timers)


class Harness:
    """Drives one processor instance per key like the engine would."""

    def __init__(self, gap_ms):
        self.gap_ms = gap_ms
        self.procs: dict[str, tuple] = {}

    def _proc(self, key):
        if key not in self.procs:
            p = ConversationDigestProcessor(gap_ms=self.gap_ms)
            h = FakeHandle()
            p.init(h)
            self.procs[key] = (p, h)
        return self.procs[key]

    def feed(self, key, fps, mss):
        p, _ = self._proc(key)
        pdf = pd.DataFrame({"fp": np.array(fps, np.int64),
                            "ms": np.array(mss, np.int64)})
        return list(p.handleInputRows((key,), iter([pdf]), None))

    def advance_watermark(self, wm_ms):
        out = []
        for key, (p, h) in self.procs.items():
            for t in sorted(h.timers):
                if t <= wm_ms:
                    h.deleteTimer(t)
                    out.extend(p.handleExpiredTimer((key,), None, None))
        return out


GAP = 1_800_000


def test_digest_fold_and_gap_close():
    h = Harness(GAP)
    assert h.feed("c1", [10, 7], [1000, 2000]) == []
    assert h.feed("c1", [4], [3000]) == []
    # single live timer at last_ms + gap
    _, fh = h.procs["c1"]
    assert fh.timers == {3000 + GAP}
    out = h.advance_watermark(3000 + GAP - 1)
    assert out == []  # not yet closed
    out = h.advance_watermark(3000 + GAP)
    assert len(out) == 1
    row = out[0].iloc[0]
    assert (row.conv_id, row.n_turns, row.fp_xor, row.first_ms, row.last_ms) \
        == ("c1", 3, 10 ^ 7 ^ 4, 1000, 3000)
    # state cleared: a later timer fire emits nothing
    assert h.advance_watermark(10 * GAP) == []


def test_new_turn_reschedules_timer():
    h = Harness(GAP)
    h.feed("c1", [1], [1000])
    h.feed("c1", [2], [500_000])  # newer turn pushes the deadline out
    _, fh = h.procs["c1"]
    assert fh.timers == {500_000 + GAP}  # old timer deleted, exactly one live


def test_microbatch_split_invariance():
    """Any split of a conversation's turns across input calls yields the
    same digest (the folds are order-free and associative)."""
    fps = [977, -13, 55, 3, 888, 55]
    mss = [5000, 1000, 9000, 3000, 2000, 7000]

    def run(splits):
        h = Harness(GAP)
        at = 0
        for k in splits:
            h.feed("c", fps[at:at + k], mss[at:at + k])
            at += k
        return h.advance_watermark(10**12)[0].iloc[0].tolist()

    assert run([6]) == run([1] * 6) == run([2, 3, 1]) == run([5, 1])


def test_empty_input_batch_is_noop():
    h = Harness(GAP)
    p, fh = h._proc("c")
    out = list(p.handleInputRows(("c",), iter([pd.DataFrame(
        {"fp": pd.Series([], dtype=np.int64),
         "ms": pd.Series([], dtype=np.int64)})]), None))
    assert out == [] and fh.timers == set() and not fh.states["digest"].exists()


def test_converges_to_spark_batch_ground_truth(spark):
    """Replaying a multi-conversation corpus through the processor in
    event-time order with micro-batch boundaries equals batch_equivalent."""
    from spanner_data_validator_spark.sources import pyds
    pyds.register(spark)
    corpus = (spark.read.format(pyds.SOURCE_NAME)
              .option("convs", 12).option("turns", 8).option("parts", 2)
              .load())
    fp = portable_hash60(F.col("i").cast("string"), 3)
    want = {r.conv_id: (r.n_turns, r.fp_xor, r.first_ms, r.last_ms)
            for r in batch_equivalent(corpus, fp=fp).collect()}

    rows = (corpus.withColumn("fp", fp)
            .withColumn("ms", F.unix_millis("ts"))
            .select("conv_id", "fp", "ms").collect())
    rows.sort(key=lambda r: (r.ms, r.conv_id))
    h = Harness(GAP)
    emitted = []
    for at in range(0, len(rows), 17):  # arbitrary micro-batch size
        batch = rows[at:at + 17]
        for r in batch:
            h.feed(r.conv_id, [r.fp], [r.ms])
        emitted.extend(h.advance_watermark(max(r.ms for r in batch) - 600_000))
    emitted.extend(h.advance_watermark(10**13))  # sentinel flush

    got = {d.iloc[0].conv_id: (d.iloc[0].n_turns, d.iloc[0].fp_xor,
                               d.iloc[0].first_ms, d.iloc[0].last_ms)
           for d in emitted}
    assert got == want


def test_wiring_gated_on_protobuf(spark):
    if tws_available():
        pytest.skip("protobuf present — gate not exercisable")
    from spanner_data_validator_spark.sources import pyds
    pyds.register(spark)
    stream = (spark.readStream.format(pyds.SOURCE_NAME)
              .option("convs", 2).option("turns", 2).load())
    with pytest.raises(ImportError, match="protobuf"):
        conversation_digest_stream(
            stream, fp=portable_hash60(F.col("i").cast("string"), 3))
