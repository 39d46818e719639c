"""Streaming near-duplicate ingest guard (streaming/neardup_stream.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from spanner_data_validator_spark.streaming.neardup_stream import (
    build_lsh_index,
    neardup_guard,
    sketch_cols,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _run_guard(spark, tmp_path, hist, incoming, **kw):
    buckets, sets = build_lsh_index(hist, "doc_id", "text",
                                    materialize=True,
                                    **{k: kw[k] for k in ("num_perm", "bands")
                                       if k in kw})
    inc = incoming.withColumn("ts", F.lit("2025-01-01").cast("timestamp"))
    inc.repartition(2).write.parquet(str(tmp_path / "in"))
    stream = (spark.readStream.schema(inc.schema)
              .option("maxFilesPerTrigger", 1).parquet(str(tmp_path / "in")))
    flagged = neardup_guard(stream, buckets, sets, "doc_id", "text",
                            ts_col="ts", **kw)
    q = (flagged.writeStream.format("parquet")
         .option("path", str(tmp_path / "out"))
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination()
    return spark.read.parquet(str(tmp_path / "out"))


def test_index_shapes_and_short_doc_exclusion(spark):
    hist = _docs(spark, [(1, "one two three four"), (2, "too short")])
    buckets, sets = build_lsh_index(hist, "doc_id", "text",
                                    num_perm=8, bands=4)
    assert sets.count() == 1  # doc 2 has < 3 words -> no shingles
    got = buckets.groupBy("id").agg(F.count("*").alias("n")).collect()
    assert [(r.id, r.n) for r in got] == [(1, 4)]  # one row per band


def test_exact_copy_flagged_once_with_jaccard_one(spark, tmp_path):
    """An exact copy matches in EVERY band — the watermark dedup must still
    emit exactly one (in_id, hist_id) row, with jaccard exactly 1.0."""
    text = "alpha beta gamma delta epsilon zeta eta theta"
    hist = _docs(spark, [(1, text), (2, "completely different words here ok")])
    inc = _docs(spark, [(100, text)])
    out = _run_guard(spark, tmp_path, hist, inc,
                     num_perm=16, bands=8, threshold=0.7)
    rows = out.collect()
    assert len(rows) == 1
    assert (rows[0].in_id, rows[0].hist_id, rows[0].jaccard) == (100, 1, 1.0)


def test_jaccard_value_exact(spark, tmp_path):
    # shingle sets {abc,bcd,cde} vs {abc,bcd,cdx}: k=2, union=4 -> 0.5
    hist = _docs(spark, [(1, "a b c d e")])
    inc = _docs(spark, [(100, "a b c d x")])
    out = _run_guard(spark, tmp_path, hist, inc,
                     num_perm=16, bands=16, threshold=0.4)
    rows = out.collect()
    assert [(r.in_id, r.hist_id, r.jaccard) for r in rows] == [(100, 1, 0.5)]


def test_unrelated_docs_not_flagged(spark, tmp_path):
    hist = _docs(spark, [(1, "the quick brown fox jumps over it")])
    inc = _docs(spark, [(100, "entirely unrelated content with zero overlap")])
    out = _run_guard(spark, tmp_path, hist, inc,
                     num_perm=16, bands=8, threshold=0.3)
    assert out.count() == 0


def test_stream_matches_batch_screening(spark, tmp_path):
    """The streaming guard equals the batch cross-side exact-Jaccard join on
    a corpus where banding recall is total (copies + heavy overlaps)."""
    base = ["w%d" % i for i in range(30)]
    hist_rows = [(i, " ".join(base[i:i + 12])) for i in range(0, 12)]
    # incoming: near-copies (one word appended) + disjoint noise
    inc_rows = [(100 + i, hist_rows[i][1] + " extra") for i in range(0, 12, 2)]
    inc_rows += [(900 + i, f"noise{i} junk{i} filler{i} pad{i}") for i in range(4)]
    hist, inc = _docs(spark, hist_rows), _docs(spark, inc_rows)

    out = _run_guard(spark, tmp_path, hist, inc,
                     num_perm=32, bands=16, threshold=0.5)
    got = {(r.in_id, r.hist_id): r.jaccard for r in out.collect()}

    sh_h, _ = sketch_cols("text")
    sh_i, _ = sketch_cols("text")
    h = hist.select(F.col("doc_id").alias("hist_id"), sh_h.alias("hs"))
    i = inc.select(F.col("doc_id").alias("in_id"), sh_i.alias("ishs"))
    k = F.size(F.array_intersect("ishs", "hs"))
    jac = k.cast("double") / (F.size("ishs") + F.size("hs") - k)
    want = {(r.in_id, r.hist_id): r.j
            for r in (i.crossJoin(h)
                      .select("in_id", "hist_id", jac.alias("j"))
                      .where(F.col("j") >= 0.5)).collect()}
    assert got == want and len(want) >= 6
