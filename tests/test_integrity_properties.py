"""Property-based tests for the integrity / quantize / layout operators.

Each property pits the distributed implementation against a brute-force
Python reference on small random inputs (hypothesis generates the corpus,
one Spark job evaluates a batch of cases at once where possible).
"""
from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from spanner_data_validator_spark.operators.layout import zorder_key  # noqa: F401  (spark fixture needed)


def _morton(vals: list[int], bits: int) -> int:
    z = 0
    for i, v in enumerate(vals):
        for b in range(bits):
            z |= ((v >> b) & 1) << (b * len(vals) + i)
    return z


# ---- sequence_contiguity vs brute force -----------------------------------

@st.composite
def seq_groups(draw):
    n_groups = draw(st.integers(1, 5))
    groups = {}
    for g in range(n_groups):
        groups[g] = draw(st.lists(st.integers(1, 8), min_size=1, max_size=8))
    return groups


@given(seq_groups())
@settings(max_examples=25, deadline=None)
def test_sequence_contiguity_matches_bruteforce(spark, groups):
    from spanner_data_validator_spark.operators.integrity import (
        sequence_contiguity,
    )
    rows = [(g, s) for g, seqs in groups.items() for s in seqs]
    df = spark.createDataFrame(rows, "g long, s long")
    r = sequence_contiguity(df, "g", "s").first()
    dups = gaps = bad0 = clean = 0
    for seqs in groups.values():
        d = len(seqs) != len(set(seqs))
        gp = max(seqs) - min(seqs) + 1 != len(set(seqs))
        b = min(seqs) != 1
        dups += d
        gaps += gp
        bad0 += b
        clean += not (d or gp or b)
    assert (r.n_groups, r.n_clean, r.n_with_dups, r.n_with_gaps,
            r.n_bad_start) == (len(groups), clean, dups, gaps, bad0)


# ---- quantize roundtrip bound ----------------------------------------------

@given(st.lists(st.lists(
    st.floats(-1e3, 1e3, allow_nan=False, allow_infinity=False, width=32),
    min_size=1, max_size=8), min_size=1, max_size=6))
@settings(max_examples=25, deadline=None)
def test_quantize_roundtrip_error_bound(spark, vecs):
    from spanner_data_validator_spark.operators.quantize import quantize_int8
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "id long, v array<double>")
    for row in quantize_int8(df, "v").collect():
        orig = vecs[row.id]
        assert all(-127 <= q <= 127 for q in row.q)
        m = max(abs(x) for x in orig)
        if m == 0:
            assert row.scale == 0.0 and all(q == 0 for q in row.q)
            continue
        # symmetric quantization: reconstruction error <= half a step
        step = m / 127.0
        for x, q in zip(orig, row.q):
            assert abs(x - q / row.scale) <= step / 2 + 1e-9 * m


# ---- zorder bijectivity + reference parity ---------------------------------

@given(st.lists(st.tuples(st.integers(0, 255), st.integers(0, 255)),
                min_size=1, max_size=40, unique=True))
@settings(max_examples=15, deadline=None)
def test_zorder_key_bijective_and_matches_reference(spark, pts):
    from pyspark.sql import functions as F
    df = spark.createDataFrame(pts, "x long, y long")
    got = [(r.x, r.y, r.z) for r in df.select(
        "x", "y", zorder_key([F.col("x"), F.col("y")], bits=8).alias("z"))
        .collect()]
    zs = [z for _, _, z in got]
    assert len(set(zs)) == len(pts)            # injective on the domain
    for x, y, z in got:
        assert z == _morton([x, y], 8)
