"""Sequence packing + deterministic sampling operators."""
from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F


def test_pack_greedy_planted(spark):
    from spanner_data_validator_spark.operators.packing import pack_greedy

    # one shard (n_shards=1) -> fully deterministic walk ordered by doc_id
    rows = [(1, 100), (2, 100), (3, 60),   # 100+100 fits 256; +60 fits
            (4, 90),                        # 260+90 > 256 -> wait: fill=260?
            (5, 300),                       # oversized doc -> own bin
            (6, 10)]
    df = spark.createDataFrame(rows, "doc_id LONG, n_tokens LONG")
    out = {r["doc_id"]: (r["bin_id"], r["bin_offset"])
           for r in pack_greedy(df, "doc_id", F.col("n_tokens"),
                                capacity=256, n_shards=1).collect()}
    # walk: 100(fill 100) 100(200) 60 -> 260 > 256 => new bin; 60(60) 90(150)
    # 300 -> 150+300 > 256 => new bin, oversized alone; 10 -> 300+10 > 256 => new bin
    assert out == {1: (0, 0), 2: (0, 100), 3: (1, 0), 4: (1, 60),
                   5: (2, 0), 6: (3, 0)}


def test_pack_greedy_shard_invariants(spark):
    from spanner_data_validator_spark.operators.packing import pack_greedy

    df = spark.range(0, 400).select(F.col("id").alias("doc_id"),
                                    (F.col("id") % 97 + 1).alias("n_tokens"))
    out = pack_greedy(df, "doc_id", F.col("n_tokens"),
                      capacity=128, n_shards=4)
    # no bin exceeds capacity unless it holds a single oversized doc (none here)
    fills = out.groupBy("shard", "bin_id").agg(
        F.sum("n_tokens").alias("fill"), F.count("*").alias("n"))
    assert fills.where(F.col("fill") > 128).count() == 0
    # offsets are the within-bin prefix sums
    w = (Window.partitionBy("shard", "bin_id").orderBy("doc_id")
               .rowsBetween(Window.unboundedPreceding, -1))
    bad = out.withColumn(
        "expected_off", F.coalesce(F.sum("n_tokens").over(w), F.lit(0))) \
        .where(F.col("expected_off") != F.col("bin_offset"))
    assert bad.count() == 0
    # deterministic: second run identical
    again = pack_greedy(df, "doc_id", F.col("n_tokens"),
                        capacity=128, n_shards=4)
    assert out.exceptAll(again).count() == 0 and again.exceptAll(out).count() == 0


def test_hash_sample_nested_and_deterministic(spark):
    from spanner_data_validator_spark.operators.sampling import hash_sample

    df = spark.range(0, 10000).select(F.col("id").alias("k"))
    s10 = {r["k"] for r in hash_sample(df, "k", 0.10, seed=3).collect()}
    s20 = {r["k"] for r in hash_sample(df, "k", 0.20, seed=3).collect()}
    assert s10 <= s20                       # nested at the same seed
    assert 800 <= len(s10) <= 1200          # ~rate
    assert s10 == {r["k"] for r in hash_sample(df, "k", 0.10, seed=3).collect()}
    other = {r["k"] for r in hash_sample(df, "k", 0.10, seed=4).collect()}
    assert other != s10                     # independent draw per seed


def test_stratified_sample_rates(spark):
    from spanner_data_validator_spark.operators.sampling import stratified_sample

    df = spark.range(0, 6000).select(
        F.col("id").alias("k"),
        F.element_at(F.array(F.lit("a"), F.lit("b"), F.lit("c")),
                     (F.col("id") % 3 + 1).cast("int")).alias("s"))
    out = stratified_sample(df, "k", "s", {"a": 1.0, "b": 0.25},
                            default_rate=0.0)
    counts = {r["s"]: r["n"] for r in
              out.groupBy("s").agg(F.count("*").alias("n")).collect()}
    assert counts.get("a") == 2000          # rate 1.0 keeps everything
    assert 350 <= counts.get("b", 0) <= 650  # ~0.25 of 2000
    assert "c" not in counts                # default 0.0 drops the stratum

    import pytest
    with pytest.raises(ValueError):
        stratified_sample(df, "k", "s", {})


def test_pack_concat_chunks_planted(spark):
    from spanner_data_validator_spark.operators.packing import pack_concat_chunks

    df = spark.createDataFrame(
        [(1, 100), (2, 400), (3, 30), (4, 600)], "doc_id LONG, n_tokens LONG")
    out = {r["doc_id"]: (r["tok_start"], r["first_chunk"],
                         r["last_chunk"], r["n_chunks"])
           for r in pack_concat_chunks(df, "doc_id", F.col("n_tokens"),
                                       context_len=256, n_shards=1).collect()}
    # stream offsets 0, 100, 500, 530; chunks of 256 tokens
    assert out == {1: (0, 0, 0, 1),      # [0,100) inside chunk 0
                   2: (100, 0, 1, 2),    # [100,500) straddles 0->1
                   3: (500, 1, 2, 2),    # [500,530) straddles 1->2 (512)
                   4: (530, 2, 4, 3)}    # [530,1130) spans 2..4


def test_epoch_shuffle_is_deterministic_seeded_permutation(spark):
    from spanner_data_validator_spark.operators.sampling import epoch_shuffle

    df = spark.range(2000).select(F.col("id").alias("doc_id"))
    a = epoch_shuffle(df, "doc_id", seed=1, n_shards=16)
    b = epoch_shuffle(df, "doc_id", seed=1, n_shards=16)

    rows_a = {(r["doc_id"], r["shard"], r["pos"]) for r in a.collect()}
    rows_b = {(r["doc_id"], r["shard"], r["pos"]) for r in b.collect()}
    assert rows_a == rows_b                      # rerun-identical
    assert len(rows_a) == 2000                   # a permutation: every doc once
    # (shard, pos) is a dense unique ordering within each shard
    per_shard: dict[int, list[int]] = {}
    for _d, s, p in rows_a:
        per_shard.setdefault(s, []).append(p)
    for poss in per_shard.values():
        assert sorted(poss) == list(range(len(poss)))

    # a different seed yields a genuinely different order
    c = {(r["doc_id"], r["shard"], r["pos"])
         for r in epoch_shuffle(df, "doc_id", seed=2, n_shards=16).collect()}
    assert c != rows_a
    # ...but still a full permutation of the same docs
    assert {d for d, _s, _p in c} == {d for d, _s, _p in rows_a}


def test_group_sample_exact_counts_and_determinism(spark):
    from spanner_data_validator_spark.operators.sampling import (
        group_sample_exact,
    )

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet").select("doc_id", "lang")
    group_sizes = {r.lang: r.c for r in
                   docs.groupBy("lang").agg(F.count("*").alias("c")).collect()}
    out = group_sample_exact(docs, "doc_id", "lang", 5, seed=1)
    got = {r.lang: r.c for r in
           out.groupBy("lang").agg(F.count("*").alias("c")).collect()}
    # exactly k per group, capped by the group size
    assert got == {g: min(5, n) for g, n in group_sizes.items()}
    # deterministic: the same call returns the identical id set
    again = group_sample_exact(docs, "doc_id", "lang", 5, seed=1)
    ids = lambda df: {r.doc_id for r in df.select("doc_id").collect()}
    assert ids(out) == ids(again)
    # a different seed draws a different sample (overwhelmingly likely)
    other = group_sample_exact(docs, "doc_id", "lang", 5, seed=2)
    assert ids(other) != ids(out)
    # sampled rows are real corpus rows
    assert ids(out) <= ids(docs)


class TestChunkTokens:
    def test_chunk_coverage_and_overlap(self, spark):
        from spanner_data_validator_spark.operators.packing import chunk_tokens

        text = " ".join(f"t{i}" for i in range(10))
        df = spark.createDataFrame([(1, text)], "doc_id long, text string")
        rows = sorted(chunk_tokens(df, "doc_id", "text", chunk_size=4, stride=3)
                      .collect(), key=lambda r: r["chunk_idx"])
        # starts 0,3,6,9; last chunk short
        assert [r["start"] for r in rows] == [0, 3, 6, 9]
        assert [r["n_tokens"] for r in rows] == [4, 4, 4, 1]
        assert rows[0]["chunk_text"] == "t0 t1 t2 t3"
        assert rows[1]["chunk_text"] == "t3 t4 t5 t6"
        assert rows[3]["chunk_text"] == "t9"
        # overlap: every token appears in some chunk, boundary tokens twice
        all_toks = [t for r in rows for t in r["chunk_text"].split()]
        assert set(all_toks) == {f"t{i}" for i in range(10)}

    def test_empty_doc_single_empty_chunk(self, spark):
        from spanner_data_validator_spark.operators.packing import chunk_tokens

        df = spark.createDataFrame([(1, "")], "doc_id long, text string")
        rows = chunk_tokens(df, "doc_id", "text", chunk_size=4).collect()
        assert len(rows) == 1 and rows[0]["n_tokens"] == 0

    def test_no_overlap_default_partitions_tokens(self, spark):
        from spanner_data_validator_spark.operators.packing import chunk_tokens

        text = " ".join(str(i) for i in range(100))
        df = spark.createDataFrame([(1, text)], "doc_id long, text string")
        rows = chunk_tokens(df, "doc_id", "text", chunk_size=7).collect()
        assert sum(r["n_tokens"] for r in rows) == 100
        joined = " ".join(r["chunk_text"] for r in
                          sorted(rows, key=lambda r: r["chunk_idx"]))
        assert joined == text


class TestHashSplit:
    def test_fractions_and_determinism(self, spark):
        from spanner_data_validator_spark.operators.sampling import hash_split

        df = spark.range(20_000).select(F.col("id").cast("string").alias("k"))
        split = hash_split(F.col("k"), {"train": 0.8, "val": 0.1, "test": 0.1})
        counts = {r["split"]: r["n"] for r in
                  df.select(split.alias("split")).groupBy("split")
                    .agg(F.count("*").alias("n")).collect()}
        assert abs(counts["train"] / 20_000 - 0.8) < 0.02
        assert abs(counts["val"] / 20_000 - 0.1) < 0.01
        # same key -> same split under repartitioning
        a = df.select("k", split.alias("s")).collect()
        b = df.repartition(17).select("k", split.alias("s")).collect()
        assert dict((r["k"], r["s"]) for r in a) == dict((r["k"], r["s"]) for r in b)

    def test_bad_fractions_raise(self, spark):
        import pytest

        from spanner_data_validator_spark.operators.sampling import hash_split
        with pytest.raises(ValueError):
            hash_split(F.lit("x"), {"train": 0.5, "val": 0.1})


class TestPrioritySample:
    def _docs(self, spark, n=200):
        rows = [(i, 1 + (i % 10) * 10) for i in range(n)]  # weights 1..91
        return spark.createDataFrame(rows, "id long, w long")

    def test_deterministic_and_partition_invariant(self, spark):
        from spanner_data_validator_spark.operators.sampling import (
            priority_sample,
        )
        df = self._docs(spark)
        a = priority_sample(df.repartition(1), "id", F.col("w"), 15)
        b = priority_sample(df.repartition(7), "id", F.col("w"), 15)
        assert (sorted(map(tuple, a.collect()))
                == sorted(map(tuple, b.collect()))) and a.count() == 15

    def test_weight_bias(self, spark):
        """Inclusion probability must grow with weight: across seeds, the
        heavy stratum (w=91) is sampled far more often than w=1."""
        from spanner_data_validator_spark.operators.sampling import (
            priority_sample,
        )
        df = self._docs(spark)
        heavy = light = 0
        for seed in range(8):
            got = priority_sample(df, "id", F.col("w"), 20, seed=seed)
            ws = [r.w for r in got.collect()]
            heavy += sum(1 for w in ws if w == 91)
            light += sum(1 for w in ws if w == 1)
        assert heavy > 5 * max(light, 1)

    def test_nonpositive_and_null_weights_excluded(self, spark):
        from spanner_data_validator_spark.operators.sampling import (
            priority_sample,
        )
        rows = [(1, 5), (2, 0), (3, -4), (4, None), (5, 7)]
        df = spark.createDataFrame(rows, "id long, w long")
        got = priority_sample(df, "id", F.col("w"), 10)
        assert sorted(r.id for r in got.collect()) == [1, 5]

    def test_rank_is_priority_order(self, spark):
        from spanner_data_validator_spark.operators.sampling import (
            priority_sample,
            priority_score,
        )
        df = self._docs(spark, 50)
        got = priority_sample(df, "id", F.col("w"), 10).collect()
        pr = {r.id: r.pr for r in df.select(
            "id", priority_score(F.col("id"), F.col("w")).alias("pr")).collect()}
        ranked = sorted(got, key=lambda r: r.rank)
        prs = [pr[r.id] for r in ranked]
        assert prs == sorted(prs, reverse=True)
