"""Tests for operators/profile.py (column profile, histogram drift, quantiles)."""

from pyspark.sql import functions as F

from spanner_data_validator_spark.operators.profile import (
    bin_expr,
    column_profile,
    equiwidth_histogram,
    histogram_drift,
    quantiles_by_rank,
)


def test_column_profile_counts_and_minmax(spark):
    df = spark.createDataFrame(
        [(1, "a"), (2, None), (2, "b"), (None, "b")], "k long, s string")
    rows = {r.col_name: r for r in column_profile(df, ["k", "s"]).collect()}
    k, s = rows["k"], rows["s"]
    assert (k.n_nonnull, k.n_null, k.n_distinct) == (3, 1, 2)
    assert (k.min_repr, k.max_repr) == ("1", "2")
    assert (s.n_nonnull, s.n_null, s.n_distinct) == (3, 1, 2)
    assert (s.min_repr, s.max_repr) == ("a", "b")


def test_bin_expr_clamps_both_edges(spark):
    df = spark.createDataFrame([(-5,), (0,), (9,), (10,), (99,), (100,), (250,)],
                               "v long")
    out = df.select(bin_expr(F.col("v"), lo=0, hi=100, n_bins=10).alias("b")) \
            .collect()
    # -5 clamps to bin 0; 99 is the last in-range value (bin 9); >= hi clamps to 9
    assert [r.b for r in out] == [0, 0, 0, 1, 9, 9, 9]


def test_histogram_counts_match_groupby(spark):
    df = spark.range(0, 1000).select((F.col("id") % 97).alias("v"))
    hist = {r.bin: r.n for r in
            equiwidth_histogram(df, F.col("v"), 0, 100, 10).collect()}
    brute = {r.b: r.n for r in
             df.groupBy(F.floor(F.col("v") / 10).alias("b"))
               .agg(F.count(F.lit(1)).alias("n")).collect()}
    assert hist == brute


def test_histogram_drift_zero_when_identical(spark):
    df = spark.range(0, 500).select((F.col("id") % 50).alias("v"))
    out = histogram_drift(df, df, F.col("v"), 0, 50, 5).collect()
    assert all(r.abs_diff == 0 and r.src_n == r.tgt_n for r in out)


def test_histogram_drift_localizes_missing_rows(spark):
    src = spark.range(0, 100).select(F.col("id").alias("v"))
    tgt = src.where((F.col("v") < 20) | (F.col("v") >= 30))  # bin 2 emptied
    out = {r.bin: r for r in
           histogram_drift(src, tgt, F.col("v"), 0, 100, 10).collect()}
    assert out[2].abs_diff == 10 and out[2].tgt_n == 0
    assert all(r.abs_diff == 0 for b, r in out.items() if b != 2)


def test_quantiles_by_rank_exact_values(spark):
    # group 'a': values 1..10 -> p50 = 5th value = 5, p90 = 9, p99 = ceil(9.9) = 10
    rows = [("a", v, v) for v in range(1, 11)] + [("b", 7, 0)]
    df = spark.createDataFrame(rows, "g string, v long, tb long")
    out = {(r.g, r.p): r.q_value for r in
           quantiles_by_rank(df, "g", F.col("v"), [0.5, 0.9, 0.99],
                             tiebreak=F.col("tb")).collect()}
    assert out[("a", 0.5)] == 5
    assert out[("a", 0.9)] == 9
    assert out[("a", 0.99)] == 10
    # singleton group: every quantile is the one value
    assert out[("b", 0.5)] == out[("b", 0.99)] == 7


def test_quantiles_tiebreak_deterministic(spark):
    # equal values: the tiebreak column decides which row is the k-th
    df = spark.createDataFrame([("g", 5, i) for i in range(4)],
                               "g string, v long, tb long")
    out = quantiles_by_rank(df, "g", F.col("v"), [0.5], tiebreak=F.col("tb"))
    assert [r.q_value for r in out.collect()] == [5]
    # repartitioned input yields the identical result
    out2 = quantiles_by_rank(df.repartition(8), "g", F.col("v"), [0.5],
                             tiebreak=F.col("tb"))
    assert out.collect() == out2.collect()


def test_bin_expr_fractional_values_not_truncated(spark):
    from pyspark.sql import functions as F2
    df = spark.createDataFrame([(3.4,), (3.5,), (9.99,)], "v double")
    out = df.select(bin_expr(F2.col("v"), lo=0, hi=10, n_bins=20).alias("b")) \
            .collect()
    # bin width 0.5: 3.4 -> 6, 3.5 -> 7, 9.99 -> 19 (a long-cast would give 6, 6, 18)
    assert [r.b for r in out] == [6, 7, 19]


def test_quantiles_exclude_nulls(spark):
    rows = [("g", v, v) for v in [1, 2, 3, 4, 5]] + \
           [("g", None, 100 + i) for i in range(5)]
    df = spark.createDataFrame(rows, "g string, v long, tb long")
    out = {r.p: r.q_value for r in
           quantiles_by_rank(df, "g", F.col("v"), [0.5, 0.99],
                             tiebreak=F.col("tb")).collect()}
    # n counts only the 5 non-null values: p50 -> 3, p99 -> 5 (never NULL)
    assert out[0.5] == 3 and out[0.99] == 5


def test_schema_drift_detects_all_kinds(spark):
    from spanner_data_validator_spark.operators.profile import schema_drift
    src = spark.createDataFrame([(1, "a", 1.0)], "id long, s string, x double")
    tgt = spark.createDataFrame([("1", "a", True)],
                                "id string, s string, extra boolean")
    drift = {(d["column"], d["kind"]) for d in schema_drift(src, tgt)}
    assert ("id", "type_changed") in drift
    assert ("x", "missing_in_tgt") in drift
    assert ("extra", "missing_in_src") in drift
    assert ("s", "type_changed") not in drift
    assert schema_drift(src, src) == []


class TestPsiTerms:
    def _sides(self, spark, a, b):
        return (spark.createDataFrame([(float(x),) for x in a], "v double"),
                spark.createDataFrame([(float(x),) for x in b], "v double"))

    def test_identical_sides_zero_psi(self, spark):
        from spanner_data_validator_spark.operators.profile import psi_terms
        src, tgt = self._sides(spark, range(100), range(100))
        rows = psi_terms(src, tgt, F.col("v"), 0, 100, 10).collect()
        assert len(rows) == 10
        assert all(r.psi_term == 0.0 for r in rows)

    def test_shift_raises_psi_above_alert(self, spark):
        from spanner_data_validator_spark.operators.profile import psi_terms
        src, tgt = self._sides(spark, range(100),
                               [x * 1.5 for x in range(100)])
        rows = psi_terms(src, tgt, F.col("v"), 0, 150, 10).collect()
        total = sum(r.psi_term for r in rows)
        assert total > 0.25  # conventional "distribution shifted" threshold
        assert all(r.psi_term >= 0.0 for r in rows)  # terms are nonnegative

    def test_zero_cells_smoothed_finite(self, spark):
        from spanner_data_validator_spark.operators.profile import psi_terms
        import math
        # tgt occupies only the top half of the range: src-only bins must
        # yield finite terms through the 0.5-count smoothing
        src, tgt = self._sides(spark, range(100), range(50, 100))
        rows = psi_terms(src, tgt, F.col("v"), 0, 100, 10).collect()
        assert all(math.isfinite(r.psi_term) for r in rows)
        assert any(r.tgt_n == 0 and r.psi_term > 0 for r in rows)

    def test_no_rescans_downstream_of_histogram(self, spark, tmp_path):
        """The totals + term branches must read the checkpointed <=n_bins
        histogram, never re-scan the input corpora (multi-branch trap)."""
        from spanner_data_validator_spark.operators.profile import psi_terms
        src, tgt = self._sides(spark, range(50), range(50))
        p = str(tmp_path / "psi_src")
        src.write.parquet(p)
        src_pq = spark.read.parquet(p)
        out = psi_terms(src_pq, tgt, F.col("v"), 0, 100, 10)
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "Scan parquet" not in plan


class TestHistQuantiles:
    """profile.hist_quantiles: mergeable histogram quantile estimates."""

    def test_error_bounded_by_bin_width(self, spark):
        from spanner_data_validator_spark.operators.profile import (
            hist_quantiles, quantiles_by_rank)
        df = spark.range(2000).select(
            F.lit("g").alias("g"), (F.col("id") % 997).alias("v"),
            F.col("id").alias("tb"))
        a = {r["p"]: r["est_value"] for r in hist_quantiles(
            df, "g", F.col("v"), lo=0, hi=1000, n_bins=50,
            ps=[0.5, 0.9]).collect()}
        x = {r["p"]: r["q_value"] for r in quantiles_by_rank(
            df, "g", F.col("v"), ps=[0.5, 0.9],
            tiebreak=F.col("tb")).collect()}
        for p in (0.5, 0.9):
            assert abs(a[p] - x[p]) <= 20  # one bin width

    def test_merge_property(self, spark):
        # the histogram of a union equals the summed histograms, so the
        # quantile of the whole equals the quantile computed from merged
        # per-shard bin counts — demonstrated by partitioning invariance
        from spanner_data_validator_spark.operators.profile import (
            hist_quantiles)
        df = spark.range(5000).select(
            F.lit("g").alias("g"), (F.col("id") * 7 % 1511).alias("v"))
        a = hist_quantiles(df.coalesce(1), "g", F.col("v"),
                           lo=0, hi=1600, n_bins=64, ps=[0.5]).first()
        b = hist_quantiles(df.repartition(16), "g", F.col("v"),
                           lo=0, hi=1600, n_bins=64, ps=[0.5]).first()
        assert a == b

    def test_clamped_tail(self, spark):
        # values beyond hi land in the last bin; the estimate stays <= hi
        from spanner_data_validator_spark.operators.profile import (
            hist_quantiles)
        df = spark.range(100).select(
            F.lit("g").alias("g"), (F.col("id") * 100).alias("v"))
        r = {x["p"]: x["est_value"] for x in hist_quantiles(
            df, "g", F.col("v"), lo=0, hi=1000, n_bins=10,
            ps=[0.99]).collect()}
        assert r[0.99] <= 1000.0
