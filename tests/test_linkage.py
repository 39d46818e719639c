"""SymSpell deletion-blocked fuzzy key linkage (operators/linkage.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from spanner_data_validator_spark.operators.linkage import (
    _deletion_variants,
    fuzzy_candidates,
    fuzzy_match_keys,
)


def _df(spark, side, rows):
    return spark.createDataFrame(rows, "id long, key string")


def test_deletion_variants_law(spark):
    got = (spark.createDataFrame([("abc",)], "s string")
           .select(_deletion_variants(F.col("s")).alias("v")).first().v)
    assert got == ["bc", "ac", "ab", "abc"]
    one = (spark.createDataFrame([("x",)], "s string")
           .select(_deletion_variants(F.col("s")).alias("v")).first().v)
    assert one == ["", "x"]


def test_completeness_vs_bruteforce(spark):
    """Candidates contain EVERY levenshtein<=1 pair (the SymSpell pigeonhole
    guarantee) — checked against an exhaustive cross join."""
    keys = ["alpha", "alpa", "alphax", "blpha", "beta", "betta", "bet",
            "x", "y", "xy", "", "gamma", "gamm", "gamme", "delta"]
    src = _df(spark, "src", [(i, k) for i, k in enumerate(keys)])
    tgt = _df(spark, "tgt", [(100 + i, k) for i, k in enumerate(keys)])

    brute = (src.alias("s").crossJoin(tgt.alias("t"))
             .withColumn("dist", F.levenshtein(F.col("s.key"), F.col("t.key")))
             .where(F.col("dist") <= 1)
             .select(F.col("s.id").alias("src_id"),
                     F.col("t.id").alias("tgt_id")))
    cand = fuzzy_candidates(src, tgt, "key", "id")
    want = {(r.src_id, r.tgt_id) for r in brute.collect()}
    got = {(r.src_id, r.tgt_id) for r in cand.collect()}
    assert want <= got  # complete (candidates may add dist-2 extras)

    # and after verification, exactly the true pair set
    best_pairs = (cand.withColumn("dist", F.levenshtein("src_key", "tgt_key"))
                  .where(F.col("dist") <= 1)
                  .select("src_id", "tgt_id"))
    assert {(r.src_id, r.tgt_id) for r in best_pairs.collect()} == want


def test_best_match_deterministic_tiebreak(spark):
    src = _df(spark, "src", [(1, "abc")])
    # two candidates at dist 1: tie broken by (tgt_key, tgt_id)
    tgt = _df(spark, "tgt", [(7, "abd"), (3, "abe"), (9, "abd")])
    row = fuzzy_match_keys(src, tgt, "key", "id").first()
    assert (row.tgt_key, row.tgt_id, row.dist) == ("abd", 7, 1)


def test_no_match_rows_absent(spark):
    src = _df(spark, "src", [(1, "abcdef")])
    tgt = _df(spark, "tgt", [(2, "zzzzzz")])
    assert fuzzy_match_keys(src, tgt, "key", "id").count() == 0


def test_max_block_size_drops_hot_variant(spark):
    """A degenerate template shared by many keys floods one variant bucket;
    max_block_size removes it before pair expansion."""
    hot = [(i, f"k{i % 10}") for i in range(60)]  # 10 keys x 6 dups
    src = _df(spark, "src", hot)
    tgt = _df(spark, "tgt", hot)
    unlimited = fuzzy_candidates(src, tgt, "key", "id").count()
    capped = fuzzy_candidates(src, tgt, "key", "id",
                              max_block_size=5).count()
    assert capped == 0 < unlimited


def test_capped_candidates_no_explode_rescans(spark):
    """With max_block_size the exploded variant tables feed two branches;
    they must be pinned so the final plan re-reads the checkpoint, never
    re-running the explode+hash (no Generate downstream)."""
    rows = [(i, f"key{i}") for i in range(20)]
    src = _df(spark, "src", rows)
    tgt = _df(spark, "tgt", rows)
    cand = fuzzy_candidates(src, tgt, "key", "id", max_block_size=50)
    cand.collect()  # AQE finalizes the plan only after an action
    plan = cand._jdf.queryExecution().executedPlan().toString()
    assert "Generate" not in plan


def test_deletion_variants_d2_law(spark):
    got = (spark.createDataFrame([("abcd",)], "s string")
           .select(_deletion_variants(F.col("s"), 2).alias("v")).first().v)
    # all 0-, 1-, and 2-deletion results, deduplicated
    want = {"abcd",
            "bcd", "acd", "abd", "abc",
            "cd", "bd", "bc", "ad", "ac", "ab"}
    assert set(got) == want


def test_d2_completeness_vs_bruteforce(spark):
    """d=2 blocking finds EVERY levenshtein<=2 pair — exhaustive check over
    a corpus of planted 1- and 2-edit mutations (substitute / insert /
    delete / transpose-as-two-subs, including combinations and short keys).
    """
    import itertools
    import random

    rng = random.Random(7)
    alphabet = "abcdefg"
    bases = ["alpha", "bravoo", "charlie", "dx", "e", "", "golfing",
             "hotelier", "indiaa", "julietx"]

    def mutate(s: str) -> str:
        ops = rng.sample(["sub", "ins", "del"], k=rng.randint(1, 2))
        for op in ops:
            if op == "sub" and s:
                i = rng.randrange(len(s))
                s = s[:i] + rng.choice(alphabet) + s[i + 1:]
            elif op == "ins":
                i = rng.randrange(len(s) + 1)
                s = s[:i] + rng.choice(alphabet) + s[i:]
            elif op == "del" and s:
                i = rng.randrange(len(s))
                s = s[:i] + s[i + 1:]
        return s

    keys = list(dict.fromkeys(
        bases + [mutate(b) for b in bases for _ in range(4)]))
    src = _df(spark, "src", [(i, k) for i, k in enumerate(keys)])
    tgt = _df(spark, "tgt", [(100 + i, k) for i, k in enumerate(keys)])

    brute = (src.alias("s").crossJoin(tgt.alias("t"))
             .withColumn("dist", F.levenshtein(F.col("s.key"), F.col("t.key")))
             .where(F.col("dist") <= 2)
             .select(F.col("s.id").alias("src_id"),
                     F.col("t.id").alias("tgt_id")))
    cand = fuzzy_candidates(src, tgt, "key", "id", d=2)
    want = {(r.src_id, r.tgt_id) for r in brute.collect()}
    got = {(r.src_id, r.tgt_id) for r in cand.collect()}
    assert want <= got

    verified = (cand.withColumn("dist", F.levenshtein("src_key", "tgt_key"))
                .where(F.col("dist") <= 2).select("src_id", "tgt_id"))
    assert {(r.src_id, r.tgt_id) for r in verified.collect()} == want


def test_fuzzy_match_keys_d2_end_to_end(spark):
    src = _df(spark, "src", [(1, "abcdef")])
    tgt = _df(spark, "tgt", [(2, "abef"), (3, "abcdef"), (4, "zzzzzz")])
    rows = {r.tgt_id: r for r in
            fuzzy_match_keys(src, tgt, "key", "id", max_dist=2).collect()}
    # best match is the exact twin at dist 0; the dist-2 candidate exists
    # in the candidate set but loses the min
    assert list(rows) == [3] and rows[3].dist == 0
    # remove the twin: the two-deletion key must now be found (d=2 blocking)
    tgt2 = _df(spark, "tgt", [(2, "abef"), (4, "zzzzzz")])
    row = fuzzy_match_keys(src, tgt2, "key", "id", max_dist=2).first()
    assert (row.tgt_id, row.dist) == (2, 2)


class TestPassJoin:
    """PassJoin segment blocking (linkage.passjoin_candidates)."""

    def test_complete_vs_brute_force_d2(self, spark):
        # adversarial: tiny alphabet, lengths 1..9 (exercises the short-key
        # deletion fallback and every segment-scheme boundary)
        import random

        from spanner_data_validator_spark.operators.linkage import (
            passjoin_candidates)
        random.seed(11)
        src_keys = ["".join(random.choice("ab")
                            for _ in range(random.randint(1, 9)))
                    for _ in range(70)]
        tgt_keys = ["".join(random.choice("ab")
                            for _ in range(random.randint(1, 9)))
                    for _ in range(70)]
        src = spark.createDataFrame(list(enumerate(src_keys)),
                                    "id long, key string")
        tgt = spark.createDataFrame(list(enumerate(tgt_keys)),
                                    "id long, key string")
        got = {(r.src_id, r.tgt_id) for r in
               passjoin_candidates(src, tgt, "key", "id", d=2).collect()}

        def lev(a, b):
            if len(a) < len(b):
                a, b = b, a
            prev = list(range(len(b) + 1))
            for i, ca in enumerate(a, 1):
                cur = [i]
                for j, cb in enumerate(b, 1):
                    cur.append(min(prev[j] + 1, cur[-1] + 1,
                                   prev[j - 1] + (ca != cb)))
                prev = cur
            return prev[-1]

        want = {(i, j) for i, a in enumerate(src_keys)
                for j, b in enumerate(tgt_keys) if lev(a, b) <= 2}
        assert want <= got  # complete: every true pair is a candidate

    def test_agrees_with_deletion_blocking(self, spark):
        from spanner_data_validator_spark.operators.linkage import (
            fuzzy_match_keys)
        src = spark.createDataFrame(
            [(1, "alpha-key-17"), (2, "beta-key-23"), (3, "gamma-key-99")],
            "id long, key string")
        tgt = spark.createDataFrame(
            [(1, "alpha-ky-17"), (2, "beta-key-23"), (3, "gmma-ke-99"),
             (4, "unrelated-zz")],
            "id long, key string")
        a = sorted(map(tuple, fuzzy_match_keys(
            src, tgt, "key", "id", max_dist=2, algo="deletion").collect()))
        b = sorted(map(tuple, fuzzy_match_keys(
            src, tgt, "key", "id", max_dist=2, algo="passjoin").collect()))
        assert a == b
        assert [r[4] for r in a] == [1, 0, 2]  # dists per src id 1,2,3

    def test_unknown_algo_raises(self, spark):
        import pytest

        from spanner_data_validator_spark.operators.linkage import (
            fuzzy_match_keys)
        df = spark.createDataFrame([(1, "x")], "id long, key string")
        with pytest.raises(ValueError):
            fuzzy_match_keys(df, df, "key", "id", algo="nope")
