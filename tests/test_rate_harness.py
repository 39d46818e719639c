"""Rate harness: feeder delivers chunks at a target rate; query keeps up."""

from __future__ import annotations

import os

from spanner_data_validator_spark.datagen.transcripts import gen_transcript_pair
from spanner_data_validator_spark.sources.transcript_source import write_transcripts
from spanner_data_validator_spark.streaming.rate_harness import run_rate_test


def _warm_streaming_join(spark, tmp_path):
    """One tiny availableNow run so the rate measurement below starts with the
    stream-stream join path JIT-compiled — same warm-up rule as the bench
    protocol (BENCH.md "Cold-start noise"); without it the FIRST batch pays
    ~10 s of compilation, which under a loaded test machine alone can exceed
    the keep-up tail allowance and flake the assertion."""
    from spanner_data_validator_spark.jobs.validate_transcripts import (
        append_sentinel,
        run_streaming_validation,
    )

    pair = gen_transcript_pair(5, seed=1, dup_rows=0, hot_convs=0)
    sdir, tdir = str(tmp_path / "warm_src"), str(tmp_path / "warm_tgt")
    write_transcripts(pair.source, spark, sdir, n_files=1)
    write_transcripts(pair.target, spark, tdir, n_files=1)
    append_sentinel(spark, sdir, tdir)
    run_streaming_validation(
        spark, sdir, tdir, str(tmp_path / "warm_out"), str(tmp_path / "warm_ckpt"),
        watermark="10 minutes", band="2 hours", engine="join")


def test_rate_feed_keeps_up_and_counts_all_rows(spark, tmp_path):
    _warm_streaming_join(spark, tmp_path)
    pair = gen_transcript_pair(60, seed=23, dup_rows=0)
    src = pair.source.sort_values("ts", kind="stable").reset_index(drop=True)
    tgt = pair.target.sort_values("ts", kind="stable").reset_index(drop=True)
    n_chunks = 4
    for j in range(n_chunks):
        a, b = len(src) * j // n_chunks, len(src) * (j + 1) // n_chunks
        write_transcripts(src.iloc[a:b], spark,
                          str(tmp_path / "chunks_src" / f"t{j:04d}"), n_files=2)
        a, b = len(tgt) * j // n_chunks, len(tgt) * (j + 1) // n_chunks
        write_transcripts(tgt.iloc[a:b], spark,
                          str(tmp_path / "chunks_tgt" / f"t{j:04d}"), n_files=2)

    res = run_rate_test(
        spark, str(tmp_path / "chunks_src"), str(tmp_path / "chunks_tgt"),
        str(tmp_path / "work"),
        turns_per_chunk=len(src) // n_chunks,
        target_rate=2000.0,  # total turns/s — trivially sustainable
        trigger_interval="2 seconds")
    assert res["kept_up"], res
    # every fed row was consumed by the stream (source offsets drained)
    assert res["fed_turns"] >= 2 * (len(src) // n_chunks) * n_chunks - 4
    assert res["n_batches"] >= 2
    assert res["achieved_rate"] > 0
