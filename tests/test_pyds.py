"""Python DataSource API (sources/pyds.py): batch scan, incremental-scan
streaming, offset recovery, and the engine-portable row law."""

from __future__ import annotations

import tempfile

import pytest
from pyspark.sql import functions as F

from spanner_data_validator_spark.sources import pyds


@pytest.fixture()
def registered(spark):
    pyds.register(spark)
    return spark


def _batch(spark, convs=30, turns=10, parts=4):
    return (spark.read.format(pyds.SOURCE_NAME)
            .option("convs", convs).option("turns", turns)
            .option("parts", parts).load())


def test_batch_shape_and_partitions(registered):
    df = _batch(registered, convs=30, turns=10, parts=4)
    assert df.count() == 300
    assert df.rdd.getNumPartitions() == 4
    assert [f.name for f in df.schema.fields] == [
        "i", "conv_id", "turn_idx", "role", "ts"]
    # no sentinel rows in batch mode
    assert df.where(F.col("role") == "sentinel").count() == 0


def test_batch_row_law(registered):
    row = (_batch(registered).where(F.col("i") == 147)
           .select("conv_id", "turn_idx", "role",
                   F.unix_millis("ts").alias("ms")).first())
    conv, turn = 147 // 10, 147 % 10
    assert row.conv_id == f"conv-{conv:08d}"
    assert row.turn_idx == turn
    assert row.role == ["user", "assistant", "tool"][turn % 3]
    assert row.ms == (pyds.BASE_EPOCH_S + (conv % 16384) * 7200 + turn * 60) * 1000
    # system override on turn 0 of conv % 7 == 0
    r0 = _batch(registered).where(F.col("i") == 70).first()  # conv 7, turn 0
    assert r0.role == "system"


def test_batch_deterministic(registered):
    a = sorted(tuple(r) for r in _batch(registered, parts=2).collect())
    b = sorted(tuple(r) for r in _batch(registered, parts=5).collect())
    assert a == b


def test_stream_incremental_exact_and_multibatch(registered, tmp_path):
    convs, turns, batch_rows = 40, 10, 120
    stream = (registered.readStream.format(pyds.SOURCE_NAME)
              .option("convs", convs).option("turns", turns)
              .option("batch_rows", batch_rows).option("parts", 3)
              .option("sentinel", "true").load())
    agg = (stream.withWatermark("ts", "0 seconds")
           .groupBy(F.window("ts", "1 hour").alias("w"), "role")
           .agg(F.count(F.lit(1)).alias("n"))
           .select(F.unix_millis(F.col("w.start")).alias("ws"), "role", "n"))
    q = (agg.writeStream.format("parquet")
         .option("path", str(tmp_path / "out"))
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .outputMode("append").trigger(processingTime="0 seconds").start())
    pyds.drain_stream(q, convs * turns + 1)

    sink = registered.read.parquet(str(tmp_path / "out"))
    # every data row landed in exactly one closed window (sentinel excluded)
    assert sink.agg(F.sum("n")).first()[0] == convs * turns
    # the run was genuinely incremental: ceil(401/120) = 4 data batches
    batches = {pyds.source_offset(p) for p in q.recentProgress}
    assert len([b for b in batches if b]) >= 3

    # equals the batch computation over the same source
    expect = (_batch(registered, convs, turns)
              .groupBy(F.window("ts", "1 hour").alias("w"), "role")
              .agg(F.count(F.lit(1)).alias("n"))
              .select(F.unix_millis(F.col("w.start")).alias("ws"), "role", "n"))
    assert (sorted(tuple(r) for r in sink.collect())
            == sorted(tuple(r) for r in expect.collect()))


def test_stream_restart_from_checkpoint_no_duplicates(registered, tmp_path):
    """Kill the query mid-stream and restart on the same checkpoint: the
    admission cursor restarts at 0 but partitions() fast-forwards past the
    committed offset, so committed rows are never re-emitted."""
    convs, turns = 40, 10
    total = convs * turns  # no sentinel: plain pass-through sink

    def build():
        stream = (registered.readStream.format(pyds.SOURCE_NAME)
                  .option("convs", convs).option("turns", turns)
                  .option("batch_rows", 90).option("parts", 2)
                  .option("hw_file", str(tmp_path / "hw"))
                  .option("sentinel", "false").load())
        return (stream.writeStream.format("parquet")
                .option("path", str(tmp_path / "rows"))
                .option("checkpointLocation", str(tmp_path / "ck"))
                .outputMode("append").trigger(processingTime="0 seconds"))

    import time
    q1 = build().start()
    deadline = time.time() + 120
    while time.time() < deadline:
        if q1.exception():
            raise q1.exception()
        off = pyds.source_offset(q1.lastProgress)
        if off and off >= 180:  # at least two committed batches
            break
        time.sleep(0.1)
    q1.stop()

    q2 = build().start()
    pyds.drain_stream(q2, total)
    rows = registered.read.parquet(str(tmp_path / "rows"))
    assert rows.count() == total
    assert rows.select("i").distinct().count() == total


def test_drain_stream_timeout(registered, tmp_path):
    stream = (registered.readStream.format(pyds.SOURCE_NAME)
              .option("convs", 5).option("turns", 4)
              .option("batch_rows", 100).load())
    q = (stream.writeStream.format("noop")
         .option("checkpointLocation", str(tmp_path / "ck"))
         .trigger(processingTime="0 seconds").start())
    with pytest.raises(TimeoutError):
        # target offset is past the source's total — can never be reached
        pyds.drain_stream(q, 10_000, timeout_s=5)
    assert not q.isActive


def test_oracle_sql_is_the_same_law(registered):
    """DuckDB recomputes the corpus from the row law and agrees row-for-row."""
    import duckdb

    df = _batch(registered, convs=21, turns=6).select(
        "i", "conv_id", "turn_idx", "role",
        F.unix_millis("ts").alias("ms"))
    got = sorted(tuple(r) for r in df.collect())
    want = sorted(tuple(r) for r in duckdb.sql(f"""
        WITH {pyds.rows_oracle_sql(21, 6)}
        SELECT i, conv_id, turn_idx, role,
               CAST(({pyds.BASE_EPOCH_S} + off_s) * 1000 AS BIGINT) AS ms
        FROM pyds_rows
    """).fetchall())
    assert got == want


def test_reader_offset_regression_after_committed_restart():
    """Drive the exact engine call sequence around a fully-committed-boundary
    restart: the fresh reader's first latestOffset() is BEHIND the committed
    offset and the engine logs that backward batch — the high-water clamp
    must keep already-delivered ids from ever being regenerated."""
    from spanner_data_validator_spark.sources.pyds import _StreamReader

    opts = {"convs": "30", "turns": "10", "batch_rows": "90",
            "parts": "2", "sentinel": "false"}  # total = 300

    def ids(parts):
        return [i for p in parts for i in range(p.start, p.end)]

    # run 1: two batches planned, committed, then the process dies
    r1 = _StreamReader(opts)
    assert r1.latestOffset() == {"i": 90}
    assert ids(r1.partitions({"i": 0}, {"i": 90})) == list(range(0, 90))
    r1.commit({"i": 90})
    assert r1.latestOffset() == {"i": 180}
    assert ids(r1.partitions({"i": 90}, {"i": 180})) == list(range(90, 180))
    r1.commit({"i": 180})

    # restart: fresh reader, engine checkpoint says committed = 180
    r2 = _StreamReader(opts)
    stale = r2.latestOffset()            # {"i": 90} — behind the checkpoint
    assert stale == {"i": 90}
    # engine logs the backward batch (180 -> 90): must emit nothing
    assert ids(r2.partitions({"i": 180}, stale)) == []
    # next trigger catches up; its logged range dips below 180 but the
    # already-delivered ids 90..179 must NOT be regenerated
    nxt = r2.latestOffset()
    assert nxt["i"] >= 180
    regen = ids(r2.partitions({"i": 90}, nxt))
    assert regen == list(range(180, nxt["i"]))
    # and from there the run proceeds normally to the end
    fin = r2.latestOffset()
    assert ids(r2.partitions(nxt, fin)) == list(range(nxt["i"], fin["i"]))


def test_reader_uncommitted_replay_regenerates_in_full():
    """A logged-but-uncommitted batch is replayed by a fresh reader via
    partitions(committed, logged_end) BEFORE any latestOffset call — it must
    regenerate the whole range (the file sink dedups whole-batch replays)."""
    from spanner_data_validator_spark.sources.pyds import _StreamReader

    opts = {"convs": "30", "turns": "10", "batch_rows": "90",
            "parts": "2", "sentinel": "false"}
    r = _StreamReader(opts)
    got = [i for p in r.partitions({"i": 90}, {"i": 180})
           for i in range(p.start, p.end)]
    assert got == list(range(90, 180))
    # and admission continues from the replayed range, never behind it
    assert r.latestOffset()["i"] >= 180
    assert r.latestOffset()["i"] > 180


def test_reader_restart_probe_then_replay_regenerates():
    """The measured restart sequence that originally LOST a batch: the
    engine probes the zero-width (logged_end, logged_end) range BEFORE
    replaying the uncommitted batch (committed, logged_end). The probe must
    not advance the high water, or the replay comes back empty."""
    from spanner_data_validator_spark.sources.pyds import _StreamReader

    opts = {"convs": "40", "turns": "10", "batch_rows": "90",
            "parts": "2", "sentinel": "false"}  # total = 400
    r = _StreamReader(opts)
    assert r.partitions({"i": 270}, {"i": 270}) == []          # probe
    replay = [i for p in r.partitions({"i": 180}, {"i": 270})  # replay
              for i in range(p.start, p.end)]
    assert replay == list(range(180, 270))
    nxt = r.latestOffset()
    assert nxt["i"] >= 270
    if nxt["i"] == 270:  # zero-width probe would make the check vacuous
        nxt = r.latestOffset()
    assert nxt["i"] > 270
    cont = [i for p in r.partitions({"i": 270}, nxt)
            for i in range(p.start, p.end)]
    assert cont == list(range(270, nxt["i"])) and cont


def test_batch_filter_pushdown_narrows_generation(registered):
    """Range predicates on i reach the source: the reader narrows its
    generated id range before partition planning, and unsupported filters
    are handed back to Spark (still applied — results exact)."""
    from pyspark.sql.datasource import (
        EqualTo, GreaterThanOrEqual, IsNotNull, LessThan,
    )
    from spanner_data_validator_spark.sources.pyds import _Reader

    r = _Reader({"convs": "30", "turns": "10", "parts": "4"})
    rest = list(r.pushFilters([GreaterThanOrEqual(("i",), 50),
                               LessThan(("i",), 120),
                               IsNotNull(("role",))]))
    assert [type(f).__name__ for f in rest] == ["IsNotNull"]
    assert (r.lo, r.hi) == (50, 120)
    covered = [i for p in r.partitions() for i in range(p.start, p.end)]
    assert covered == list(range(50, 120))

    # point lookup collapses to a single-row range
    r2 = _Reader({"convs": "30", "turns": "10", "parts": "4"})
    assert list(r2.pushFilters([EqualTo(("i",), 7)])) == []
    assert (r2.lo, r2.hi) == (7, 8)

    # contradictory range -> empty scan, not a crash
    r3 = _Reader({"convs": "30", "turns": "10", "parts": "4"})
    list(r3.pushFilters([GreaterThanOrEqual(("i",), 200), LessThan(("i",), 100)]))
    assert r3.partitions() == []

    # end-to-end: pushed + residual filters agree with the unpushed result
    df = (_batch(registered, convs=30, turns=10)
          .where((F.col("i") >= 50) & (F.col("i") < 120)
                 & (F.col("role") != "tool")))
    rows = df.collect()
    assert len(rows) == 49 and all(50 <= r.i < 120 and r.role != "tool"
                                   for r in rows)


def test_reader_double_restart_with_hw_file_no_duplicates(tmp_path):
    """The review-found double-restart hole: the stale backward batch
    rewinds the engine's offset log, so a SECOND restart replays from the
    rewound offset with a fresh in-memory high water. With hw_file the
    high water survives restarts and the committed rows stay suppressed."""
    from spanner_data_validator_spark.sources.pyds import _StreamReader

    opts = {"convs": "40", "turns": "10", "batch_rows": "90", "parts": "2",
            "sentinel": "false", "hw_file": str(tmp_path / "hw")}

    def ids(parts):
        return [i for p in parts for i in range(p.start, p.end)]

    # run 1: commit through 270
    r1 = _StreamReader(opts)
    for s, e in ((0, 90), (90, 180), (180, 270)):
        assert ids(r1.partitions({"i": s}, {"i": e})) == list(range(s, e))
        r1.commit({"i": e})

    # restart 1: the persisted high water makes the fresh reader's first
    # latestOffset resume AT/PAST the committed offset — the stale backward
    # batch (the root of the offset-log rewind) never happens at all
    r2 = _StreamReader(opts)
    assert r2.latestOffset()["i"] >= 270

    # and even against an offset log REWOUND by a pre-hw run: a fresh
    # reader replaying (90, 360) regenerates only the undelivered tail —
    # without the persisted high water this re-emitted 90..269
    r3 = _StreamReader(opts)
    replay = ids(r3.partitions({"i": 90}, {"i": 360}))
    assert replay == list(range(270, 360))

    # and without hw_file the hole is real (documents the default limit)
    bare = dict(opts)
    bare.pop("hw_file")
    r4 = _StreamReader(bare)
    assert ids(r4.partitions({"i": 90}, {"i": 360})) == list(range(90, 360))
