"""End-to-end transcript validation job (batch + streaming), spark-submit-able.

Streaming dataflow (the north-star pipeline):

    source stream ─ fingerprint ─┐
                                 ├─ watermarked full-outer join ─ classify ─┐
    target stream ─ fingerprint ─┘                (or applyInPandasWithState)│
                                                                            ▼
                     exactly-once foreachBatch sink (classified rows,
                     per-window tallies, mismatch rows — batch-id fenced)

Batch mode runs the identical classify expression on static DataFrames —
used by tests to prove stream/batch count equality on the same input.

Usage (cluster):
    spark-submit --py-files sdv.zip -m spanner_data_validator_spark.jobs.validate_transcripts \
        --source /path/src --target /path/tgt --out /path/out \
        --checkpoint /path/ckpt --watermark "10 minutes" --band "2 hours"

Watermark note: an idle file stream never advances its watermark past
``max(ts) - delay``, so the final keys' outer/timeout results stay in state
until more data arrives — correct streaming semantics, not a bug. Finite
test/bench runs append a far-future **sentinel** row to both streams
(``append_sentinel``) to push the watermark past all real data; sentinel keys
are filtered out of the classified output by ``SENTINEL_FILTER``.
"""

from __future__ import annotations

import argparse
import os
import time

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spanner_data_validator_spark.sources.transcript_source import (
    read_transcripts,
    stream_transcripts,
    write_transcripts,
)
from spanner_data_validator_spark.streaming.sink import TallyForeachBatch
from spanner_data_validator_spark.streaming.stateful import classify_stateful
from spanner_data_validator_spark.streaming.validate_stream import (
    classify_stream,
    fingerprint_stream,
)

SENTINEL_CONV = "__sentinel__"


def sentinel_filter():
    return F.col("conv_id") != SENTINEL_CONV


def append_sentinel(spark: SparkSession, *dirs: str, ts: str = "2100-01-01") -> None:
    """Append one far-future matching row to each stream dir (watermark punctuation)."""
    pdf = pd.DataFrame(
        {
            "conv_id": [SENTINEL_CONV],
            "turn_idx": pd.array([0], dtype="int32"),
            "role": ["system"],
            "text": ["sentinel"],
            "tool": [None],
            "ts": [pd.Timestamp(ts)],
        }
    )
    for d in dirs:
        write_transcripts(pdf, spark, d, n_files=1, subdir=f"sentinel_{int(time.time()*1000)}")


def run_batch_validation(
    spark: SparkSession,
    src_path: str,
    tgt_path: str,
    *,
    algo: str = "xxhash64",
    band: str = "2 hours",
    dedup_keys: bool = True,
) -> DataFrame:
    """Batch classification through the SAME join expression as streaming.

    ``dedup_keys`` (default on — the reference inspects only the first element
    per key, CountMatchesDoFn.java:73-80) collapses duplicate (conv_id,
    turn_idx) rows per side to the deterministic min-(fingerprint, ts) row
    before the join; without it each dup key would fan out k_src×k_tgt joined
    rows and inflate the tallies. The dedup aggregate hashes on the same keys
    as the join, so Catalyst reuses the exchange — still one shuffle per side.
    """
    from spanner_data_validator_spark.operators.comparator import dedup_first

    src = fingerprint_stream(read_transcripts(spark, src_path), algo=algo)
    tgt = fingerprint_stream(read_transcripts(spark, tgt_path), algo=algo)
    if dedup_keys:
        src = dedup_first(src, ["conv_id", "turn_idx"], carry_cols=["ts"])
        tgt = dedup_first(tgt, ["conv_id", "turn_idx"], carry_cols=["ts"])
    return classify_stream(src, tgt, band=band).where(sentinel_filter())


def run_streaming_validation(
    spark: SparkSession,
    src_path: str,
    tgt_path: str,
    out_dir: str,
    checkpoint_dir: str,
    *,
    algo: str = "xxhash64",
    watermark: str = "10 minutes",
    band: str = "2 hours",
    engine: str = "join",
    available_now: bool = True,
    trigger_interval: str = "10 seconds",
    window_duration: str = "1 hour",
    max_files_per_trigger: int | None = None,
    timeout_s: float = 300.0,
    dedup_keys: bool = False,
    state_store: str | None = None,
    projected_state_keys: int | None = None,
    atomic_sink: bool = False,
) -> TallyForeachBatch:
    """Run the streaming pipeline; returns the sink for result readback.

    ``engine='join'`` → built-in StreamingSymmetricHashJoin full-outer;
    ``engine='stateful'`` → applyInPandasWithState classifier (lower MATCH
    latency, reference-exact emission control).

    ``dedup_keys`` gives the JOIN engine the reference's duplicate-key
    collapse (first element per key, CoGBK-iterable semantics the stateful
    engine has natively): a ``dropDuplicatesWithinWatermark`` per side before
    the join. Costs one extra stateful stage whose state is watermark-bounded
    (key + ts per in-flight key); leave off when upstream keys are unique.

    ``state_store``: ``'rocksdb'`` / ``'hdfs'`` pin the provider for this
    query; ``'auto'`` picks via :func:`session.select_state_store` from
    ``projected_state_keys`` (worst-case in-flight keys ≈ rate × (watermark +
    band), or total turns for a finite sentinel-punctuated drain, since the
    watermark only advances at the end). ``None`` keeps the session default.
    The chosen provider is recorded on the returned sink (``.state_store``)
    so benches can report it. Only valid for a FRESH checkpoint — Spark pins
    the provider in checkpoint metadata on first start.
    """
    from spanner_data_validator_spark.session import (
        STATE_STORE_CLASSES,
        select_state_store,
    )

    provider_key = "spark.sql.streaming.stateStore.providerClass"
    chosen = state_store
    if chosen == "auto":
        chosen = select_state_store(projected_state_keys)
    prev_provider = spark.conf.get(provider_key, None)
    if chosen is not None:
        spark.conf.set(provider_key, STATE_STORE_CLASSES[chosen])
    src = stream_transcripts(
        spark, src_path, watermark=watermark, max_files_per_trigger=max_files_per_trigger
    )
    tgt = stream_transcripts(
        spark, tgt_path, watermark=watermark, max_files_per_trigger=max_files_per_trigger
    )

    if engine == "stateful":
        s = fingerprint_stream(src, algo=algo, side="source")
        t = fingerprint_stream(tgt, algo=algo, side="target")
        classified = classify_stateful(
            s.unionByName(t), band_ms=_interval_ms(band)
        )
    else:
        s = fingerprint_stream(src, algo=algo)
        t = fingerprint_stream(tgt, algo=algo)
        if dedup_keys:
            s = s.dropDuplicatesWithinWatermark(["conv_id", "turn_idx"])
            t = t.dropDuplicatesWithinWatermark(["conv_id", "turn_idx"])
        classified = classify_stream(s, t, band=band)
    classified = classified.where(sentinel_filter())

    # atomic_sink: ONE commit marker covers classified/tallies/mismatches
    # (both-or-neither publication, streaming/sink.AtomicTallySink); the
    # default TallyForeachBatch fences per table and heals torn batches on
    # replay instead
    if atomic_sink:
        from spanner_data_validator_spark.streaming.sink import AtomicTallySink
        sink = AtomicTallySink(out_dir, window_duration=window_duration)
    else:
        sink = TallyForeachBatch(out_dir, window_duration=window_duration)
    sink.state_store = next(
        (name for name, cls in STATE_STORE_CLASSES.items()
         if cls == spark.conf.get(provider_key, "")), None)
    sink.projected_state_keys = projected_state_keys
    writer = (
        classified.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .foreachBatch(sink)
    )
    if available_now:
        q = writer.trigger(availableNow=True).start()
        try:
            q.awaitTermination(timeout_s)
            if q.isActive:
                # an availableNow query still running at the deadline means
                # the sink holds PARTIAL commits — surface it instead of
                # returning silently-incomplete totals (callers would report
                # undercounts)
                q.stop()
                raise TimeoutError(
                    f"availableNow streaming validation did not drain within "
                    f"{timeout_s}s; sink at {out_dir} holds partial commits")
        finally:
            # the provider is captured in the query's checkpoint metadata at
            # first-batch start, so it is safe to restore the session default
            # once the query has terminated
            if chosen is not None and prev_provider is not None:
                spark.conf.set(provider_key, prev_provider)
    else:
        writer.trigger(processingTime=trigger_interval).start()
        # continuous path: the conf must stay set until the first batch plans
        # its state stores — the caller owns the session default from here
    return sink


def _interval_ms(band: str) -> int:
    qty, unit = band.split()
    mult = {
        "second": 1_000, "seconds": 1_000,
        "minute": 60_000, "minutes": 60_000,
        "hour": 3_600_000, "hours": 3_600_000,
        "day": 86_400_000, "days": 86_400_000,
    }[unit.lower()]
    return int(qty) * mult


def main(argv: list[str] | None = None) -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--source", required=True)
    ap.add_argument("--target", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--mode", choices=["batch", "streaming"], default="streaming")
    ap.add_argument("--engine", choices=["join", "stateful"], default="join")
    ap.add_argument("--algo", choices=["xxhash64", "sha256"], default="xxhash64")
    ap.add_argument("--watermark", default="10 minutes")
    ap.add_argument("--band", default="2 hours")
    ap.add_argument("--window", default="1 hour")
    ap.add_argument("--available-now", action=argparse.BooleanOptionalAction,
                    default=True,
                    help="drain all available input then stop (default); "
                    "--no-available-now runs a continuous processing-time "
                    "trigger instead")
    ap.add_argument("--dedup-keys", action=argparse.BooleanOptionalAction,
                    default=True,
                    help="collapse duplicate (conv_id, turn_idx) rows per "
                    "side before the join (the reference's first-element "
                    "rule, CountMatchesDoFn.java:73-80); --no-dedup-keys "
                    "skips the extra stage when upstream keys are unique")
    args = ap.parse_args(argv)

    from spanner_data_validator_spark.session import get_spark
    from spanner_data_validator_spark.streaming.listener import (
        ValidationMetricsListener,
    )

    spark = get_spark(app_name="sdv-validate-transcripts")
    listener = ValidationMetricsListener()
    spark.streams.addListener(listener)

    if args.mode == "batch":
        classified = run_batch_validation(
            spark, args.source, args.target, algo=args.algo, band=args.band,
            dedup_keys=args.dedup_keys,
        )
        classified.write.mode("overwrite").parquet(os.path.join(args.out, "classified"))
    else:
        sink = run_streaming_validation(
            spark,
            args.source,
            args.target,
            args.out,
            args.checkpoint,
            algo=args.algo,
            watermark=args.watermark,
            band=args.band,
            engine=args.engine,
            window_duration=args.window,
            available_now=args.available_now,
            dedup_keys=args.dedup_keys and args.engine == "join",
        )
        if args.available_now:
            report = sink.report(spark)
            if report is not None:
                report.show(50, truncate=False)
        else:
            # continuous trigger: the query runs until externally stopped;
            # block here so spark-submit keeps the driver alive
            spark.streams.awaitAnyTermination()
    listener.dump(os.path.join(args.out, "lineage", "progress.jsonl"))


if __name__ == "__main__":
    main()
