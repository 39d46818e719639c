"""North-star resumability: the snapshot-table dual-stream validator stops
mid-ingest and resumes from its checkpoint — join state, source offsets, and
sink exactly-once all survive, and the final totals equal the batch run.

The restart is only meaningful if run 1's UNMATCHED rows (held in the
stream-stream join's state store at stop) emit after the resume — they were
seen only before the stop, so a correct SOURCE_ONLY tally proves the state
store was recovered, not rebuilt.
"""

from __future__ import annotations

import ast
import tempfile
import time

from pyspark.sql import functions as F

from spanner_data_validator_spark.datagen.transcripts import (
    TRANSCRIPT_SCHEMA,
    gen_transcript_pair,
)
from spanner_data_validator_spark.jobs.validate_transcripts import (
    SENTINEL_CONV,
    sentinel_filter,
)
from spanner_data_validator_spark.sources import snapshot_stream as st
from spanner_data_validator_spark.sources import snapshots as snap
from spanner_data_validator_spark.streaming.validate_stream import (
    classify_stream,
    fingerprint_stream,
)

_DDL = ("conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp")


def _drain_two(q, target_v, timeout_s=300.0):
    """Stop once BOTH sources reached target_v and a no-data trigger ran
    (drain_to_version checks sources[0] only)."""
    deadline = time.time() + timeout_s
    while time.time() < deadline:
        if q.exception():
            raise q.exception()
        p = q.lastProgress
        if p is not None and (p["numInputRows"] or 0) == 0:
            ends = []
            for s in p["sources"]:
                e = s.get("endOffset")
                if isinstance(e, str):
                    e = ast.literal_eval(e)
                ends.append(int(e["v"]) if e else 0)
            if ends and min(ends) >= target_v:
                q.stop()
                return
        time.sleep(0.25)
    q.stop()
    raise TimeoutError(f"streams did not reach v{target_v}")


def _start(spark, src_t, tgt_t, work):
    st.register(spark)

    def tail(table):
        return (spark.readStream.format(st.SOURCE_NAME)
                .option("table_dir", table).option("schema", _DDL)
                .option("cursor_file", f"{table}.cursor").load()
                .withWatermark("ts", "10 minutes"))

    out = (classify_stream(fingerprint_stream(tail(src_t)),
                           fingerprint_stream(tail(tgt_t)),
                           band="2 hours")
           .where(sentinel_filter()))
    return (out.select("status")
            .writeStream.format("parquet").option("path", f"{work}/out")
            .option("checkpointLocation", f"{work}/ckpt")
            .outputMode("append")
            .trigger(processingTime="200 milliseconds").start())


def test_validator_resumes_from_checkpoint_with_held_state(spark):
    pair = gen_transcript_pair(n_convs=60, seed=11, hot_convs=0,
                               dup_rows=0, late_fraction=0.0,
                               mismatch_rate=0.05, source_only_rate=0.05,
                               target_only_rate=0.05)
    src = spark.createDataFrame(pair.source, schema=TRANSCRIPT_SCHEMA)
    tgt = spark.createDataFrame(pair.target, schema=TRANSCRIPT_SCHEMA)
    cut = F.lit("2025-01-02 16:00:00").cast("timestamp")

    work = tempfile.mkdtemp(prefix="sdv_t_snapval_restart_")
    src_t, tgt_t = f"{work}/src_t", f"{work}/tgt_t"
    # wave 1 (event-time-ordered commits: everything before the cut)
    snap.commit(src.where(F.col("ts") < cut), src_t)
    snap.commit(tgt.where(F.col("ts") < cut), tgt_t)

    q = _start(spark, src_t, tgt_t, work)
    _drain_two(q, 1)

    # run 1 must have emitted only prompt matches — outer results for
    # wave-1 singles are still held in the recovered state store
    mid = spark.read.parquet(f"{work}/out")
    mid_n = mid.count()
    assert mid.where(F.col("status").isin("SOURCE_ONLY", "TARGET_ONLY",
                                          "MATCH", "MISMATCH")).count() == mid_n

    # wave 2 + far-future sentinel arrive AFTER the stop
    snap.commit(src.where(F.col("ts") >= cut), src_t)
    snap.commit(tgt.where(F.col("ts") >= cut), tgt_t)
    sent = spark.range(1).select(
        F.lit(SENTINEL_CONV).alias("conv_id"),
        F.lit(0).cast("int").alias("turn_idx"),
        F.lit("system").alias("role"), F.lit("sentinel").alias("text"),
        F.lit(None).cast("string").alias("tool"),
        F.lit("2100-01-01").cast("timestamp").alias("ts"))
    snap.commit(sent, src_t)
    snap.commit(sent, tgt_t)

    q = _start(spark, src_t, tgt_t, work)
    _drain_two(q, 3)

    got = {r["status"]: r["n"] for r in
           spark.read.parquet(f"{work}/out")
           .groupBy("status").agg(F.count(F.lit(1)).alias("n")).collect()}

    # batch ground truth: the same classify on the same (static) frames
    want = {r["status"]: r["n"] for r in
            classify_stream(fingerprint_stream(src),
                            fingerprint_stream(tgt), band="2 hours")
            .groupBy("status").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert got == want
    assert got.get("SOURCE_ONLY", 0) > 0 and got.get("MISMATCH", 0) > 0
    # the restart added rows (wave-2 + flushed wave-1 state)
    assert sum(got.values()) > mid_n
