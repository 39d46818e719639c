"""Bloom-filter semi-join pre-filter for asymmetric validation.

The 100 TB problem this solves: revalidating a huge snapshot against a
*small* changed-keyset (CDC churn, one repaired shard, yesterday's delta).
A plain semi-join either shuffles the snapshot on the key or broadcasts the
raw keyset; at 10^7..10^8 changed keys the raw keys are gigabytes (too big
to broadcast) while the snapshot shuffle is the thing we must avoid. A Bloom
filter compresses the keyset to ``-n*ln(fpp)/ln(2)^2`` BITS (10^8 keys at 1%
fpp ~= 120 MB; at 3% ~= 90 MB) — broadcastable — so the snapshot side is
pruned by a NARROW map (no exchange) and only the bloom survivors (true
matches + ~fpp false positives) reach the exact verify join.

The reference pipeline has no analogue (it always reads both sides in full
per range — ``JDBCToSpannerDVTWithHash.java`` readAll); this is the operator
a recurring 100 TB validation needs, composing with the per-range digest
fast path (``operators/digest.py``) one level finer: digests prune *ranges*,
the bloom prunes *rows* inside surviving ranges.

Engineering shape:

* **Build** — per-partition numpy bitmaps OR-folded inside ``mapInPandas``;
  the only exchange is ``n_partitions x m/8`` bytes of bitmap to the driver
  (NOT n_keys rows). Bitmaps OR-merge associatively, so per-shard / per-day
  blooms roll up without touching raw keys.
* **Probe** — pure Column expressions: the bitmap ships as a memoized
  ``array<long>`` literal and each of the k bit tests is
  ``element_at(bm, word) & element_at(POW2, bit) != 0`` — the whole
  membership test stays inside WholeStageCodegen; zero Python in the hot
  path. (Literal-array probing is sane to ~2^22 bits / 512 KB plan payload;
  above that pass ``probe_via_udf=True`` to ship the bitmap in an Arrow UDF
  closure instead — one pickled broadcast per executor, vectorized numpy
  membership.)
* **Hash family** — ``portable_hash60`` (seeded md5 prefix) by default so a
  DuckDB oracle recomputes the IDENTICAL filter: a bitmap is exactly the set
  of set positions, so "member" == "all k positions of the probe key appear
  in the build side's position set" — expressible in ANSI SQL (see
  ``bloom_positions_sql``). Production can pass ``family='xxhash64'`` for
  JVM-speed hashing at the cost of oracle parity.

NULL keys never match (SQL semi-join convention): ``concat_ws`` would fold
NULL to the seed-only preimage, so both build and probe drop NULL keys up
front.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from spanner_data_validator_spark.functions.hashing import (
    portable_hash60,
    portable_hash60_sql,
    xxhash64_family,
)

_FAMILIES = {"portable": portable_hash60, "xxhash64": xxhash64_family}

# 2^0 .. 2^63 as signed longs (2^63 wraps negative; AND-test against != 0 is
# still correct). Literal is memoized per session via _pow2_col.
_POW2 = [(1 << i) if i < 63 else -(1 << 63) for i in range(64)]
_pow2_col_cache: dict[int, Column] = {}


def _pow2_col() -> Column:
    # keyed by a constant: one py4j literal per process (F.lit(list) costs
    # ~0.25 s of py4j round-trips — see CLAUDE.md / ann._centroid_literal).
    if 0 not in _pow2_col_cache:
        _pow2_col_cache[0] = F.lit(_POW2)
    return _pow2_col_cache[0]


def bloom_parameters(n_keys: int, fpp: float) -> tuple[int, int]:
    """Optimal (m_bits, k) for ``n_keys`` at target false-positive ``fpp``.

    ``m = ceil(-n ln p / ln(2)^2)`` rounded up to a multiple of 64 (whole
    words), ``k = round(m/n ln 2)`` clamped to >= 1.
    """
    if n_keys <= 0:
        return 64, 1
    if not 0.0 < fpp < 1.0:
        raise ValueError(f"fpp must be in (0,1), got {fpp}")
    m = math.ceil(-n_keys * math.log(fpp) / (math.log(2) ** 2))
    m = max(64, ((m + 63) // 64) * 64)
    k = max(1, round(m / n_keys * math.log(2)))
    return m, k


def bloom_position_cols(col: Column, m_bits: int, k: int,
                        family: str = "portable") -> list[Column]:
    """The k bit positions of a key: ``pmod(hash_family(key, seed), m)``
    for seed in 0..k-1."""
    h = _FAMILIES[family]
    return [F.pmod(h(col, seed), F.lit(m_bits)).cast("long").alias(f"p{seed}")
            for seed in range(k)]


def bloom_positions_sql(expr: str, m_bits: int, seed_expr: str) -> str:
    """DuckDB rendering of one position for SQL-valued seed ``seed_expr``
    (portable family only) — the oracle's twin of ``bloom_position_cols``."""
    h = f"('0x' || substr(md5(({seed_expr})::VARCHAR || ':' || ({expr})), 1, 15))::BIGINT"
    return f"(({h}) % {m_bits})"


@dataclass
class BloomFilter:
    """An immutable built filter: parameters + the bitmap words."""

    m_bits: int
    k: int
    family: str
    words: np.ndarray  # int64[m_bits/64]
    n_build_rows: int
    _bm_col: Column | None = field(default=None, repr=False, compare=False)

    def bitmap_column(self) -> Column:
        """The bitmap as a (memoized) array<long> literal Column."""
        if self._bm_col is None:
            object.__setattr__(self, "_bm_col", F.lit(self.words.tolist()))
        return self._bm_col

    def union(self, other: "BloomFilter") -> "BloomFilter":
        """OR-merge two filters built with identical parameters (per-shard /
        per-day rollup without re-reading keys)."""
        if (self.m_bits, self.k, self.family) != (other.m_bits, other.k,
                                                 other.family):
            raise ValueError("bloom parameter mismatch")
        return BloomFilter(self.m_bits, self.k, self.family,
                           self.words | other.words,
                           self.n_build_rows + other.n_build_rows)

    def fill_fraction(self) -> float:
        """Fraction of set bits (probe fpp ~= fill^k)."""
        ones = int(np.unpackbits(self.words.view(np.uint8)).sum())
        return ones / self.m_bits


def build_bloom(df: DataFrame, col: Column | str, m_bits: int, k: int,
                family: str = "portable") -> BloomFilter:
    """Build a Bloom filter over ``col`` distributedly.

    Each input partition reduces to ONE m/8-byte bitmap row inside
    mapInPandas (numpy scatter, no per-row Python); the driver ORs
    ``n_partitions`` bitmaps. NULL keys are dropped (never match).
    """
    if m_bits % 64 or m_bits <= 0:
        raise ValueError("m_bits must be a positive multiple of 64")
    c = F.col(col) if isinstance(col, str) else col
    pos = (df.where(c.isNotNull())
             .select(*bloom_position_cols(c, m_bits, k, family)))
    n_words = m_bits // 64

    def part_bitmap(batches):
        import pandas as pd

        bm = np.zeros(n_words, dtype=np.uint64)
        n = 0
        for pdf in batches:
            if pdf.empty:
                continue
            n += len(pdf)
            flat = pdf.to_numpy(dtype=np.int64).ravel().astype(np.uint64)
            np.bitwise_or.at(bm, (flat >> np.uint64(6)).astype(np.int64),
                             np.uint64(1) << (flat & np.uint64(63)))
        yield pd.DataFrame({"bm": [bm.view(np.int64).tobytes()],
                            "n": [n]})

    parts = pos.mapInPandas(part_bitmap, "bm binary, n long").collect()
    words = np.zeros(n_words, dtype=np.int64)
    total = 0
    for row in parts:
        words |= np.frombuffer(row["bm"], dtype=np.int64)
        total += row["n"]
    return BloomFilter(m_bits, k, family, words, total)


def bloom_member(col: Column | str, bloom: BloomFilter,
                 probe_via_udf: bool = False) -> Column:
    """Boolean membership Column for ``col`` against ``bloom``.

    Default path is pure JVM expressions (stays in codegen); the UDF path is
    for bitmaps too large to inline in the plan.
    """
    c = F.col(col) if isinstance(col, str) else col
    positions = bloom_position_cols(c, bloom.m_bits, bloom.k, bloom.family)
    if probe_via_udf:
        return _member_udf(bloom)(F.array(*positions)) & c.isNotNull()
    bm, pow2 = bloom.bitmap_column(), _pow2_col()
    tests = [
        F.element_at(bm, (p / 64).cast("int") + 1)
        .bitwiseAND(F.element_at(pow2, F.pmod(p, F.lit(64)).cast("int") + 1))
        != 0
        for p in positions
    ]
    out = tests[0]
    for t in tests[1:]:
        out = out & t
    return out & c.isNotNull()


def _member_udf(bloom: BloomFilter):
    words_bytes = bloom.words.tobytes()

    @F.pandas_udf("boolean")
    def member(pos: pd.Series) -> pd.Series:
        bm = np.frombuffer(words_bytes, dtype=np.uint64)
        mat = np.stack(pos.to_numpy()).astype(np.uint64)
        hit = (bm[(mat >> np.uint64(6)).astype(np.int64)]
               >> (mat & np.uint64(63))) & np.uint64(1)
        return pd.Series(hit.all(axis=1))

    return member


def bloom_semi_join(probe: DataFrame, build: DataFrame, probe_col: str,
                    build_col: str | None = None, *, fpp: float = 0.01,
                    n_build_keys: int | None = None,
                    family: str = "portable",
                    probe_via_udf: bool = False) -> DataFrame:
    """EXACT semi-join of ``probe`` against ``build`` keys, bloom-pruned.

    Plan shape: probe scan -> narrow bloom filter (no exchange) -> exact
    left-semi join of the survivors against the (distinct) build keys. The
    final join is exact, so false positives cost only the verify join's
    input size, never correctness. ``n_build_keys`` sizes the filter (pass
    it when known; otherwise one count() job runs).
    """
    build_col = build_col or probe_col
    keys = build.select(F.col(build_col).alias(probe_col)) \
                .where(F.col(probe_col).isNotNull()).distinct()
    if n_build_keys is None:
        keys = keys.localCheckpoint(eager=True)  # counted AND joined below
        n_build_keys = keys.count()
    m, k = bloom_parameters(n_build_keys, fpp)
    bloom = build_bloom(keys, probe_col, m, k, family)
    pruned = probe.where(bloom_member(probe_col, bloom, probe_via_udf))
    # Strategy left to AQE: it broadcasts `keys` when small; a worst-case
    # huge keyset (the 10^8-keys story above) must still run as a shuffle
    # join of the *survivors* — which the bloom already shrank.
    return pruned.join(keys, on=probe_col, how="left_semi")
