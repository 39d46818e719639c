

def test_temperature_mixture_flattens_and_caps(spark):
    import pytest

    from spanner_data_validator_spark.operators.sampling import (
        temperature_mixture,
    )

    rows = ([("big", i) for i in range(1600)]
            + [("small", 10_000 + i) for i in range(100)])
    df = spark.createDataFrame(rows, "src string, doc_id long")

    out = {r["src"]: r for r in temperature_mixture(
        df, "src", "doc_id", tau=0.5, k_total=500).collect()}
    # sqrt flattening: 1600 vs 100 docs -> weights 40 vs 10 -> mix 0.8/0.2
    assert out["big"]["mix_rate"] == 0.8 and out["small"]["mix_rate"] == 0.2
    # doc_rate: big 500*0.8/1600 = 0.25; small 500*0.2/100 = 1.0 (capped)
    assert out["big"]["doc_rate"] == 0.25
    assert out["small"]["doc_rate"] == 1.0
    assert out["small"]["sampled_n"] == 100  # rate 1 keeps everything
    # hash sampling at rate .25 lands near a quarter of 1600
    assert 320 <= out["big"]["sampled_n"] <= 480

    # tau=1 is plain proportional allocation
    out1 = {r["src"]: r for r in temperature_mixture(
        df, "src", "doc_id", tau=1.0, k_total=500).collect()}
    assert abs(out1["big"]["mix_rate"] - 1600 / 1700) < 1e-12

    with pytest.raises(ValueError, match="tau"):
        temperature_mixture(df, "src", "doc_id", tau=0.7)
