"""Deterministic hash sampling for training-mix construction.

At 100 TB the sampler must be (a) a pure per-row expression — no shuffle, no
RNG state, evaluated inside whole-stage codegen right after the scan — and
(b) reproducible: the same doc is kept or dropped in every run and on every
re-shard, so incremental rebuilds and A/B mix experiments agree. Both fall
out of keyed hashing: keep a row iff ``pmod(hash(key, seed), M) < rate*M``.
Changing ``seed`` draws an independent sample; nested rates are monotone
(rate 0.1 ⊂ rate 0.2 at the same seed), which is the property mix tuning
relies on.

``stratified_sample`` applies a per-stratum rate (e.g. per ``lang`` or per
``source`` domain weights in a data-mix recipe) via an inline literal map —
strata sets are small, so the rate lookup is a codegen expression, not a
join.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from spanner_data_validator_spark.functions.hashing import xxhash64_family

SAMPLE_MODULUS = 1 << 20


def sample_keep(key: Column, rate: Column, *, seed: int = 0, hash_fn=None) -> Column:
    """Boolean keep-expression: pmod(hash(key, seed), M) < rate * M."""
    hash_fn = hash_fn or xxhash64_family
    bucket = F.pmod(hash_fn(key, seed), F.lit(SAMPLE_MODULUS))
    return bucket < (rate.cast("double") * SAMPLE_MODULUS).cast("long")


def hash_sample(df: DataFrame, key_col: str, rate: float, *,
                seed: int = 0, hash_fn=None) -> DataFrame:
    """Uniform deterministic sample of ~``rate`` of the rows, keyed on
    ``key_col`` (same key → same decision, across runs and tables)."""
    return df.where(sample_keep(F.col(key_col), F.lit(float(rate)),
                                seed=seed, hash_fn=hash_fn))


def epoch_shuffle(df: DataFrame, key_col: str, *, seed: int = 0,
                  n_shards: int = 1024, hash_fn=None,
                  shard_col: str = "shard", pos_col: str = "pos") -> DataFrame:
    """Deterministic global training-order shuffle: df columns +
    ``(shard, pos)`` such that reading shards ``0..n_shards`` in order, rows
    ordered by ``pos`` within each shard, yields a seeded pseudo-random
    permutation of the corpus — the epoch-ordering primitive for training
    runs (new ``seed`` per epoch → independent order, same seed → identical
    order on every rerun and re-shard, so a resumed run replays exactly).

    Scale shape: NO global sort and no single-partition window — one hash
    exchange onto ``n_shards`` buckets, then a per-shard external sort for
    the rank. With 10^9 docs and 2^10 shards each shard sorts ~10^6
    (8-byte hash, key) pairs; the payload columns ride along untouched.
    Loaders that only need shard-local order (the common case — each data-
    parallel worker reads its own shards) skip any cross-shard coordination.
    """
    from pyspark.sql import Window

    hash_fn = hash_fn or xxhash64_family
    h = hash_fn(F.col(key_col), seed)
    w = Window.partitionBy(shard_col).orderBy("__h", key_col)
    return (df.withColumn("__h", h)
              .withColumn(shard_col,
                          F.pmod(F.col("__h"), F.lit(n_shards)).cast("int"))
              .withColumn(pos_col, (F.row_number().over(w) - 1).cast("long"))
              .drop("__h"))


def group_sample_exact(df: DataFrame, key_col: str, group_col: str, k: int,
                       *, seed: int = 0, hash_fn=None,
                       rank_col: str | None = None) -> DataFrame:
    """EXACTLY ``k`` rows per group (fewer when the group is smaller),
    deterministically: rank rows within each group by (hash(key, seed), key)
    and keep ranks 1..k — the eval-set / few-shot-pool constructor, where
    rate-based sampling can't promise exact per-group counts.

    Reproducible across runs and re-shards (the order is data-derived, not
    RNG-state-derived); a new seed draws an independent sample. One hash
    exchange keyed by group + a per-group sort; rows beyond rank k are
    dropped partition-locally, so the output exchange is ≤ groups·k.
    Optionally exposes the rank via ``rank_col``.
    """
    from pyspark.sql import Window

    hash_fn = hash_fn or xxhash64_family
    w = Window.partitionBy(group_col).orderBy("__h", key_col)
    out = (df.withColumn("__h", hash_fn(F.col(key_col), seed))
             .withColumn("__rk", F.row_number().over(w))
             .where(F.col("__rk") <= k))
    if rank_col is not None:
        out = out.withColumn(rank_col, F.col("__rk").cast("int"))
    return out.drop("__h", "__rk")


def stratified_sample(df: DataFrame, key_col: str, strata_col: str,
                      rates: dict[str, float], *, default_rate: float = 0.0,
                      seed: int = 0, hash_fn=None) -> DataFrame:
    """Per-stratum deterministic sampling — the data-mix primitive: keep
    stratum s at rates[s] (missing strata at ``default_rate``).

    The rates map becomes one inline literal lookup; the whole sampler is a
    single codegen filter over the scan — zero exchanges, zero Python.
    """
    if not rates:
        raise ValueError("rates must name at least one stratum")
    rate_map = F.create_map(
        *[F.lit(x) for kv in rates.items() for x in kv])
    rate = F.coalesce(rate_map[F.col(strata_col)],
                      F.lit(float(default_rate)))
    return df.where(sample_keep(F.col(key_col), rate,
                                seed=seed, hash_fn=hash_fn))


#: priority-sampling uniform granularity: 2^52 distinct values keep the
#: (0, 1] uniform EXACT in a double mantissa (the /2^52 is a power-of-two
#: division, so every u is representable and identical in any IEEE engine)
PRIORITY_SPACE = 2 ** 52


def priority_score(key: Column, weight: Column, *, seed: int = 0,
                   hash_fn=None) -> Column:
    """Weighted sampling priority ``ln(u)/w`` with ``u = hash-uniform(0,1]``.

    Taking the k LARGEST priorities implements Ohlsson/Rosén priority
    sampling — inclusion probability ≈ proportional to ``w`` for k << n —
    as a pure deterministic function of (key, seed): re-runs, backfills and
    other engines select the identical sample. ``ln(u)/w`` is the monotone
    log form of the textbook ``u^(1/w)`` (ln u < 0, so dividing by a larger
    weight moves the priority toward 0 = better), chosen because one ``ln``
    + one division leaves far less room for cross-engine ulp drift than
    ``pow``.
    """
    hash_fn = hash_fn or xxhash64_family
    u = (F.pmod(hash_fn(key, seed), F.lit(PRIORITY_SPACE)) + F.lit(1)) \
        .cast("double") / F.lit(float(PRIORITY_SPACE))
    return F.log(u) / weight.cast("double")


def priority_sample(df: DataFrame, key_col: str, weight: Column, k: int, *,
                    seed: int = 0, hash_fn=None,
                    rank_col: str = "rank") -> DataFrame:
    """Top-k weighted priority sample: df columns + ``rank`` (1 = best).

    The quality-weighted data-selection primitive (sample documents
    proportional to a quality/length score without a global sort): the
    priority is computed per row, phase 1 reduces each partition to its
    local top-k (ann.topk_per_query), and the only exchange carries
    <= partitions * k skinny rows. Rows with weight <= 0 or NULL are
    excluded (they cannot carry sampling mass).
    """
    from spanner_data_validator_spark.operators.ann import topk_per_query

    w = weight.cast("double")
    scored = (df.withColumn("__w", w)
              .where(F.col("__w") > 0)
              .withColumn("__pr", priority_score(F.col(key_col), F.col("__w"),
                                                 seed=seed, hash_fn=hash_fn))
              .withColumn("__g", F.lit(1)))
    top = topk_per_query(scored, k, key_col="__g", order_col="__pr",
                         tie_col=key_col)
    return (top.withColumnRenamed("rank", rank_col)
            if rank_col != "rank" else top).drop("__g", "__pr", "__w")


def hash_split(key: Column, fractions: dict[str, float], *, seed: int = 0,
               hash_fn=None) -> Column:
    """Deterministic dataset-split assignment (train/val/test) by hash bucket.

    Splits must be a pure function of the KEY — not of row order, partition
    count, or run — so a re-run, a backfill, or a different cluster assigns
    every document to the same split (no train/test leakage across runs).
    ``fractions`` maps split name -> fraction (must sum to ~1); buckets are
    carved from pmod(hash(key, seed), 10^6) in dict order, so boundaries are
    stable as long as the dict is.
    """
    hash_fn = hash_fn or xxhash64_family
    total = sum(fractions.values())
    if not 0.999 <= total <= 1.001:
        raise ValueError(f"fractions must sum to 1, got {total}")
    grain = 1_000_000
    b = F.pmod(hash_fn(key, seed), F.lit(grain))
    expr = None
    hi = 0
    names = list(fractions)
    for name in names[:-1]:
        hi += int(round(fractions[name] * grain))
        cond = b < F.lit(hi)
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    last = F.lit(names[-1])
    return last if expr is None else expr.otherwise(last)


def temperature_mixture(df: DataFrame, group_col: str, key_col: str, *,
                        tau: float = 0.5, k_total: int = 1000,
                        seed: int = 0, hash_fn=None) -> DataFrame:
    """Temperature-flattened domain mixture — the LLM data-mixing recipe:
    domain s contributes proportionally to ``n_s^tau`` (tau < 1 upweights
    small domains, the multilingual-sampling trick), realized as a
    deterministic per-doc hash sample.

    Engine-exactness constrains tau to {1.0, 0.5, 0.25}: n^0.5 is ONE
    correctly-rounded sqrt and n^0.25 two — bit-identical everywhere —
    whereas a general ``pow`` (exp·ln) is only ~1-ulp reproducible. The
    normalizer sums the (few) domain weights by an explicit sorted FOLD
    (group-name order), never a plain float aggregate (order varies per
    engine/partitioning); the oracle replays it with
    ``list_reduce(list(w ORDER BY g))``.

    Output per domain: (group, n_docs, weight, mix_rate, doc_rate,
    sampled_n) where ``doc_rate = min(1, k_total*mix_rate/n_docs)`` and
    ``sampled_n`` counts docs whose hash bucket clears
    ``floor(doc_rate * SAMPLE_MODULUS)`` (explicit floor — double->int
    CASTs truncate in Spark but round in DuckDB).

    Plan shape at 100 TB: one count aggregate + one pass with a broadcast
    per-domain threshold — the sample decision is a codegen filter on the
    scan, exactly like ``stratified_sample`` but with the rates DERIVED
    in-plan instead of user-supplied.
    """
    if tau not in (1.0, 0.5, 0.25):
        raise ValueError("tau must be 1.0, 0.5 or 0.25 (exact sqrt"
                         " compositions; pow() is not engine-exact)")
    hash_fn = hash_fn or xxhash64_family
    counts = df.groupBy(group_col).agg(F.count(F.lit(1)).alias("n_docs"))
    w = F.col("n_docs").cast("double")
    if tau <= 0.5:
        w = F.sqrt(w)
    if tau == 0.25:
        w = F.sqrt(w)
    # weights feeds the normalizer fold AND the rate table — pin the
    # domain-sized frame or the corpus count aggregate runs once per branch
    weights = (counts.select(group_col, "n_docs", w.alias("weight"))
               .localCheckpoint(eager=False))
    total = weights.agg(F.aggregate(
        F.sort_array(F.collect_list(F.struct(group_col, "weight"))),
        F.lit(0.0), lambda acc, x: acc + x["weight"]).alias("w_total"))
    rates = (weights.crossJoin(F.broadcast(total))
             .withColumn("mix_rate", F.col("weight") / F.col("w_total"))
             .withColumn("doc_rate", F.least(
                 F.lit(1.0),
                 (F.lit(float(k_total)) * F.col("mix_rate"))
                 / F.col("n_docs").cast("double")))
             .withColumn("__thr", F.floor(F.col("doc_rate")
                                          * SAMPLE_MODULUS).cast("long")))
    bucket = F.pmod(hash_fn(F.col(key_col), seed), F.lit(SAMPLE_MODULUS))
    sampled = (df.select(group_col, bucket.alias("__b"))
               .join(F.broadcast(rates.select(group_col, "__thr")), group_col)
               .where(F.col("__b") < F.col("__thr"))
               .groupBy(group_col)
               .agg(F.count(F.lit(1)).alias("__sn")))
    return (rates.join(sampled, group_col, "left")
            .select(group_col, "n_docs", "weight", "mix_rate", "doc_rate",
                    F.coalesce(F.col("__sn"), F.lit(0)).cast("bigint")
                     .alias("sampled_n")))
