"""streaming/state_inspect: checkpoint state as a queryable DataFrame."""

from __future__ import annotations

from pyspark.sql import functions as F

from spanner_data_validator_spark.jobs.validate_transcripts import (
    SENTINEL_CONV,
    append_sentinel,
    run_streaming_validation,
    write_transcripts,
)
from spanner_data_validator_spark.datagen import gen_transcript_pair
from spanner_data_validator_spark.streaming.state_inspect import (
    read_state,
    read_state_metadata,
    state_partition_profile,
)


def _run_dedup(spark, tmp_path, rows):
    work = str(tmp_path / "dedup")
    df = spark.createDataFrame(rows, "k string, v long")
    df.repartition(2).write.parquet(f"{work}/in")
    stream = (spark.readStream.schema(df.schema)
              .option("maxFilesPerTrigger", 1).parquet(f"{work}/in"))
    q = (stream.dropDuplicates(["k"])
         .writeStream.format("parquet").option("path", f"{work}/out")
         .option("checkpointLocation", f"{work}/ckpt")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination()
    return f"{work}/ckpt"


def test_metadata_names_operator_and_partitions(spark, tmp_path):
    ckpt = _run_dedup(spark, tmp_path, [("a", 1), ("a", 2), ("b", 3)])
    meta = read_state_metadata(spark, ckpt).collect()
    assert len(meta) == 1
    row = meta[0]
    assert row["operatorName"] == "dedupe"
    assert row["numPartitions"] == int(
        spark.conf.get("spark.sql.shuffle.partitions"))
    assert row["maxBatchId"] >= row["minBatchId"] >= 0


def test_dedup_state_is_distinct_keys(spark, tmp_path):
    rows = [(f"k{i % 5}", i) for i in range(40)]
    ckpt = _run_dedup(spark, tmp_path, rows)
    st = read_state(spark, ckpt)
    keys = sorted(r["key"]["k"] for r in st.collect())
    assert keys == [f"k{i}" for i in range(5)]
    prof = state_partition_profile(spark, ckpt).collect()
    assert sum(r["n_keys"] for r in prof) == 5


def test_join_state_holds_only_sentinel_after_flush(spark, tmp_path):
    """Ops law: after the far-future sentinel flushes a finite run, the
    symmetric-hash-join buffers retain ONLY the sentinel rows — a resident
    real conv_id in post-run join state marks an eviction bug / unclosed
    window. (The sentinel itself can never be evicted: nothing advances
    the watermark past it.)"""
    pair = gen_transcript_pair(12, seed=11)
    src_dir, tgt_dir = str(tmp_path / "src"), str(tmp_path / "tgt")
    write_transcripts(pair.source, spark, src_dir, n_files=2)
    write_transcripts(pair.target, spark, tgt_dir, n_files=2)
    append_sentinel(spark, src_dir, tgt_dir)
    run_streaming_validation(
        spark, src_dir, tgt_dir, str(tmp_path / "out"),
        str(tmp_path / "ckpt"), watermark="10 minutes", band="2 hours",
        engine="join")
    for side in ("left", "right"):
        st = read_state(spark, str(tmp_path / "ckpt"), join_side=side)
        # join-state keys surface positionally (field0=conv_id, field1=turn)
        convs = [r["key"]["field0"] for r in st.select("key").collect()]
        assert convs == [SENTINEL_CONV], (side, convs)


def test_windowed_agg_state_eviction_boundary(spark, tmp_path):
    """Tumbling-window agg state after an event-time-ordered two-wave run:
    windows whose end <= final watermark were emitted AND evicted; later
    windows are still resident. Wave 2's max ts (10:59) - 30 min delay
    puts the watermark at 10:29 -> the 09:00 and 10:00 windows of wave 1
    close only up to 10:00... the 10:00 window (end 11:00) stays."""
    work = str(tmp_path / "winagg")
    rows_w1 = [("2024-01-01 09:%02d:00" % m, "a") for m in range(0, 50, 10)]
    rows_w2 = [("2024-01-01 10:%02d:00" % m, "b") for m in range(0, 60, 10)]
    df1 = spark.createDataFrame(rows_w1, "ts_s string, k string")
    df2 = spark.createDataFrame(rows_w2, "ts_s string, k string")
    # event-time-ordered waves (CLAUDE gotcha): wave files must be in ts order
    df1.coalesce(1).write.parquet(f"{work}/in/w=1")
    df2.coalesce(1).write.parquet(f"{work}/in/w=2")
    stream = (spark.readStream.schema("ts_s string, k string")
              .option("maxFilesPerTrigger", 1).parquet(f"{work}/in/*")
              .withColumn("ts", F.col("ts_s").cast("timestamp"))
              .withWatermark("ts", "30 minutes")
              .groupBy(F.window("ts", "1 hour")).count())
    q = (stream.writeStream.format("parquet").option("path", f"{work}/out")
         .option("checkpointLocation", f"{work}/ckpt")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination()
    emitted = {r["window"]["start"].hour
               for r in spark.read.parquet(f"{work}/out").collect()}
    st = read_state(spark, f"{work}/ckpt")
    resident = {r["key"]["window"]["start"].hour for r in st.collect()}
    # watermark 10:29 closes the 09:00-10:00 window; 10:00-11:00 resident
    assert emitted == {9}
    assert resident == {10}


def test_batch_lineage_manifests_cover_input_exactly_once(spark, tmp_path):
    """Every input file appears in exactly one batch's manifest; every
    planned batch is committed after a clean availableNow drain; the
    planned watermark is monotone."""
    import os

    work = str(tmp_path / "lin")
    df = spark.createDataFrame(
        [(i, f"2024-01-01 0{i % 6}:00:00") for i in range(24)],
        "v long, ts_s string")
    df.repartition(3).write.parquet(f"{work}/in")
    stream = (spark.readStream.schema(df.schema)
              .option("maxFilesPerTrigger", 1).parquet(f"{work}/in")
              .withColumn("ts", F.col("ts_s").cast("timestamp"))
              .withWatermark("ts", "1 hour")
              .groupBy(F.window("ts", "1 hour")).count())
    q = (stream.writeStream.format("parquet")
         .option("path", f"{work}/out")
         .option("checkpointLocation", f"{work}/ckpt")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination()

    from spanner_data_validator_spark.streaming.state_inspect import (
        batch_lineage,
    )
    lin = batch_lineage(spark, f"{work}/ckpt").collect()
    assert len(lin) == 3 and all(r["committed"] for r in lin)
    seen = [os.path.basename(p) for r in lin for p in r["files"]]
    on_disk = sorted(f for f in os.listdir(f"{work}/in")
                     if f.endswith(".parquet"))
    assert sorted(seen) == on_disk          # exactly-once admission
    wms = [r["watermark_ms"] for r in sorted(lin, key=lambda r: r["batch_id"])]
    assert wms == sorted(wms)               # planned watermark monotone


def test_batch_lineage_flags_uncommitted_batch(spark, tmp_path):
    """A planned-but-uncommitted batch (offsets written, commit marker
    missing — the crash window) must surface committed=False: that batch
    is exactly what a restart will replay."""
    import os
    import shutil

    ckpt = _run_dedup(spark, tmp_path, [("a", 1), ("b", 2)])
    broken = str(tmp_path / "broken_ck")
    shutil.copytree(ckpt, broken)
    commits = sorted(int(f) for f in os.listdir(f"{broken}/commits")
                     if not f.startswith("."))
    last = commits[-1]
    os.remove(f"{broken}/commits/{last}")
    from spanner_data_validator_spark.streaming.state_inspect import (
        batch_lineage,
    )
    lin = {r["batch_id"]: r["committed"]
           for r in batch_lineage(spark, broken).collect()}
    assert lin[last] is False
    assert all(v for b, v in lin.items() if b != last)
