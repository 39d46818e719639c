"""Sustained-input-rate harness: can a cluster size sustain a target rate?

The production question behind the two-cluster-size rule is *rate* scaling:
4N executors must sustain 4x the input rate with bounded latency/backlog.
This harness demonstrates it directly: a feeder thread delivers pre-staged,
time-ordered file chunks into the watched source/target directories at a
fixed turns/sec rate while a processingTime-triggered validation stream
drains them; listener progress then shows whether the engine kept up
(per-batch processing rate >= arrival rate; no batch backlog growth).

Usage: ``bench.py --rate`` stages chunks and runs one CPU-pinned child per
cluster size, feeding each size a rate proportional to its cores.
"""

from __future__ import annotations

import json
import os
import shutil
import threading
import time

from pyspark.sql import SparkSession
from pyspark.sql.streaming import StreamingQueryListener


class _Progress(StreamingQueryListener):
    def __init__(self):
        self.progress: list[dict] = []

    def onQueryStarted(self, event):
        pass

    def onQueryIdle(self, event):
        pass

    def onQueryTerminated(self, event):
        pass

    def onQueryProgress(self, event):
        self.progress.append(json.loads(event.progress.json))


def _chunk_dirs(staged: str) -> list[str]:
    return sorted(
        d for d in os.listdir(staged) if os.path.isdir(os.path.join(staged, d))
    )


def _deliver(staged: str, watch: str, chunk: str) -> None:
    src = os.path.join(staged, chunk)
    for f in os.listdir(src):
        if f.endswith(".parquet"):
            os.link(os.path.join(src, f), os.path.join(watch, f"{chunk}_{f}"))


def run_rate_test(
    spark: SparkSession,
    staged_src: str,
    staged_tgt: str,
    work_dir: str,
    *,
    turns_per_chunk: int,
    target_rate: float,
    watermark: str = "10 minutes",
    band: str = "2 hours",
    trigger_interval: str = "5 seconds",
    max_chunks: int | None = None,
) -> dict:
    """Feed chunks at ``target_rate`` turns/sec; return keep-up metrics."""
    from spanner_data_validator_spark.jobs.validate_transcripts import (
        run_streaming_validation,
    )

    watch_src = os.path.join(work_dir, "watch_src")
    watch_tgt = os.path.join(work_dir, "watch_tgt")
    for d in (watch_src, watch_tgt):
        shutil.rmtree(d, ignore_errors=True)
        os.makedirs(d)

    chunks = _chunk_dirs(staged_src)
    if max_chunks:
        chunks = chunks[:max_chunks]
    # target_rate counts TOTAL validated turns/sec (source + target sides);
    # each drop delivers one chunk per side
    interval = 2 * turns_per_chunk / target_rate  # seconds between drops

    listener = _Progress()
    spark.streams.addListener(listener)

    # first chunk before start so the query has data immediately
    _deliver(staged_src, watch_src, chunks[0])
    _deliver(staged_tgt, watch_tgt, chunks[0])

    run_streaming_validation(
        spark, watch_src, watch_tgt,
        os.path.join(work_dir, "out"), os.path.join(work_dir, "ckpt"),
        watermark=watermark, band=band, engine="join",
        available_now=False, trigger_interval=trigger_interval)
    q = spark.streams.active[-1]

    t0 = time.time()
    fed = turns_per_chunk

    def feeder():
        nonlocal fed
        for j, c in enumerate(chunks[1:], start=1):
            target_t = t0 + j * interval
            delay = target_t - time.time()
            if delay > 0:
                time.sleep(delay)
            _deliver(staged_src, watch_src, c)
            _deliver(staged_tgt, watch_tgt, c)
            fed += turns_per_chunk

    th = threading.Thread(target=feeder, daemon=True)
    th.start()
    th.join(timeout=3600)
    feed_wall = time.time() - t0

    # drain: the feeder is done — wait until the stream goes quiet (input
    # counter stops moving for a few trigger cycles). Chunk row counts differ
    # slightly per side (planted deletes/inserts), so an exact row target
    # can't be the stop condition.
    trig_quiet = 3 * float(trigger_interval.split()[0]) + 3
    deadline = time.time() + 600

    def processed():
        return sum(p.get("numInputRows") or 0 for p in listener.progress)

    last_n, last_change = processed(), time.time()
    while time.time() < deadline:
        time.sleep(1)
        n = processed()
        if n != last_n:
            last_n, last_change = n, time.time()
        elif n >= 2 * fed * 0.95 and time.time() - last_change > trig_quiet:
            break
    drain_wall = last_change - t0  # work ended at the last progress change
    q.stop()
    spark.streams.removeListener(listener)

    batches = [p for p in listener.progress if (p.get("numInputRows") or 0) > 0]
    durs = sorted((p["durationMs"]["triggerExecution"] / 1000) for p in batches)
    trig_s = float(trigger_interval.split()[0])
    achieved = 2 * fed / drain_wall
    # kept up = the tail after the final drop drained within a few trigger
    # cycles (i.e. the query never accumulated backlog during the feed)
    tail = drain_wall - feed_wall
    return {
        "target_rate": target_rate,
        "fed_turns": 2 * fed,
        "feed_wall_s": round(feed_wall, 1),
        "drain_wall_s": round(drain_wall, 1),
        "tail_s": round(tail, 1),
        "achieved_rate": round(achieved, 1),
        "kept_up": tail <= 5 * trig_s + 10,
        "n_batches": len(batches),
        "p50_batch_s": round(durs[len(durs) // 2], 2) if durs else None,
        "p95_batch_s": round(durs[int(len(durs) * 0.95)], 2) if durs else None,
    }
