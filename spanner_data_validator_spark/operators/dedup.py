"""Deduplication operators for training-data pipelines at 100 TB scale.

Five strategies, all shuffle-aware:

* ``exact_dedup``        — hash-groupBy on the text (or its fingerprint)
* ``jaccard_pairs``      — exact word-n-gram Jaccard via shingle inverted index
                           (self-join on shingle, NOT an O(n²) cross join)
* ``minhash_lsh_pairs``  — MinHash signatures + banded LSH candidate
                           generation, then exact-Jaccard verification
* ``simhash_near_dups``  — multi-word SimHash signatures + Manku-style
                           block-combination probing (corpus-scale blocking)
* embedding cosine near-dup lives in ``operators/ann.py``

Scale notes: every strategy reduces docs to (id, small-token) BEFORE any
shuffle; candidate generation joins on banded hash buckets so the shuffle key
cardinality stays ~n·bands, never n². Hot shingles (very common n-grams) are
the skew risk — ``jaccard_pairs`` drops shingles with document frequency above
``max_shingle_df`` (stopword-gram pruning), the standard trick to bound the
inverted-index blowup.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from spanner_data_validator_spark.functions.text import shingles


def exact_dedup(df: DataFrame, id_col: str, text_col: str,
                *, by_fingerprint: bool = True) -> DataFrame:
    """One row per distinct text: (canonical id = min id, n_copies).

    ``by_fingerprint`` groups on xxhash64(text) instead of the full text —
    at scale the shuffle then carries 8 bytes/doc instead of the document.
    """
    key = F.xxhash64(F.col(text_col)) if by_fingerprint else F.col(text_col)
    return (df.groupBy(key.alias("__k"))
              .agg(F.min(id_col).alias(id_col), F.count("*").alias("n_copies"))
              .drop("__k"))


def shingle_table(df: DataFrame, id_col: str, text_col: str, n: int = 3,
                  *, max_shingle_df: int | None = None,
                  materialize: bool = False) -> DataFrame:
    """Distinct (id, shingle) pairs; optionally prune ultra-common shingles.

    Requires unique ``id_col`` values (one row per doc). Within-doc dedup is
    ``array_distinct`` BEFORE the explode — per-row, shuffle-free — instead of
    a full .distinct() exchange over the exploded table. Pruning anti-joins
    against the HOT set (df > max_shingle_df), which is tiny by definition, so
    it broadcasts; the r01 inner-join against the huge keep-set shuffled the
    whole shingle table.

    ``materialize=True`` pins the (pruned) table with a localCheckpoint.
    Every downstream dedup pipeline consumes the shingle table through
    SEVERAL plan branches (sizes + both join sides + signatures), and
    Catalyst re-runs the whole scan→explode→prune per branch (the CLAUDE.md
    multi-branch rescan trap — measured 3x on the sf0.1 MinHash query).
    The table is the pipeline's shared working set: linear in corpus size,
    bounded by the hot-shingle prune, so materializing once is the right
    trade at any scale (on a cluster the same role is played by
    persist(MEMORY_AND_DISK) / a reliable checkpoint).
    """
    sh = df.select(F.col(id_col),
                   F.explode(F.array_distinct(shingles(text_col, n))).alias("shingle"))
    if max_shingle_df is not None:
        # the hot-set derivation + the anti-join are already two consumers
        # of the exploded table — pin it before branching
        if materialize:
            sh = sh.localCheckpoint()
        hot = (sh.groupBy("shingle").agg(F.count("*").alias("__df"))
                 .where(F.col("__df") > max_shingle_df).select("shingle"))
        sh = sh.join(F.broadcast(hot), "shingle", "left_anti")
    if materialize:
        sh = sh.localCheckpoint()
    return sh


def jaccard_pairs(df: DataFrame, id_col: str, text_col: str,
                  *, n: int = 3, threshold: float = 0.7,
                  max_shingle_df: int | None = None) -> DataFrame:
    """Exact n-gram Jaccard near-duplicate pairs (a < b, jaccard >= threshold).

    inverted-index plan: explode shingles → self-join on shingle (equi-join,
    hash-partitioned by shingle) → per-pair intersection counts → join two
    broadcastable size tables → filter. Output: (a, b, jaccard).

    The shingle table feeds three branches (sizes, both self-join sides) —
    materialized once, see ``shingle_table``.
    """
    sh = shingle_table(df, id_col, text_col, n, max_shingle_df=max_shingle_df,
                       materialize=True)
    sizes = sh.groupBy(id_col).agg(F.count("*").alias("n_sh"))
    a = sh.select(F.col(id_col).alias("a"), "shingle")
    b = sh.select(F.col(id_col).alias("b"), "shingle")
    inter = (a.join(b, "shingle")
              .where(F.col("a") < F.col("b"))
              .groupBy("a", "b").agg(F.count("*").alias("k")))
    sa = sizes.select(F.col(id_col).alias("a"), F.col("n_sh").alias("na"))
    sb = sizes.select(F.col(id_col).alias("b"), F.col("n_sh").alias("nb"))
    jac = (F.col("k").cast("double")
           / (F.col("na") + F.col("nb") - F.col("k")))
    return (inter.join(sa, "a").join(sb, "b")
                 .select("a", "b", jac.alias("jaccard"))
                 .where(F.col("jaccard") >= threshold))


def _signatures_from_shingles(sh: DataFrame, id_col: str, num_perm: int) -> DataFrame:
    """MinHash signatures from a prebuilt (id, shingle) table — lets the
    pipeline share ONE shingle scan between signatures and verification."""
    hashes = F.array(*[F.xxhash64(F.col("shingle"), F.lit(i)) for i in range(num_perm)])
    per = sh.select(id_col, hashes.alias("h"))
    mins = per.groupBy(id_col).agg(
        *[F.min(F.col("h")[i]).alias(f"mh{i}") for i in range(num_perm)])
    return mins.select(id_col, F.array(*[f"mh{i}" for i in range(num_perm)]).alias("signature"))


def minhash_signatures(df: DataFrame, id_col: str, text_col: str,
                       *, n: int = 3, num_perm: int = 32,
                       max_shingle_df: int | None = None) -> DataFrame:
    """MinHash signature per doc: for each of ``num_perm`` seeded hash
    functions, the min over the doc's shingles of xxhash64(shingle, seed).

    One explode + ONE groupBy produces all permutations (min of an array
    column aggregated element-wise via reduce of F.array min) — not num_perm
    passes over the data.
    """
    sh = shingle_table(df, id_col, text_col, n, max_shingle_df=max_shingle_df)
    return _signatures_from_shingles(sh, id_col, num_perm)


def lsh_candidates(signatures: DataFrame, id_col: str, num_perm: int,
                   *, bands: int = 8,
                   max_bucket_size: int | None = None) -> DataFrame:
    """Banded LSH: split the signature into ``bands`` rows, hash each band,
    equi-join docs sharing any (band_id, band_hash) bucket → candidate pairs.

    The join key is (band, hash-of-rows) so bucket sizes stay tiny; this is
    the n·bands shuffle that replaces the n² comparison at 10^9-doc scale.

    ``max_bucket_size`` is the hot-bucket skew guard for web-scale corpora:
    a boilerplate mega-cluster (10^5 near-identical docs) otherwise lands in
    one bucket and emits O(|bucket|²) pairs. Overfull buckets are DROPPED —
    the documented recall tradeoff of every production LSH dedup: run
    ``exact_dedup`` first so exact mass-duplicates never reach this stage,
    and members of a dropped mega-cluster still pair through their OTHER
    bands' (smaller) buckets when they differ at all.
    """
    sig = signatures.select(id_col, "signature")
    rows_per_band = max(1, num_perm // bands)
    banded = sig.select(
        id_col,
        F.posexplode(
            F.array(*[
                F.xxhash64(F.concat_ws(
                    ",", *[F.col("signature")[bi * rows_per_band + r].cast("string")
                           for r in range(rows_per_band)]))
                for bi in range(bands)])
        ).alias("band", "band_hash"),
    )
    if max_bucket_size is not None:
        hot = (banded.groupBy("band", "band_hash")
               .agg(F.count("*").alias("__n"))
               .where(F.col("__n") > max_bucket_size)
               .select("band", "band_hash"))
        banded = banded.join(F.broadcast(hot), ["band", "band_hash"],
                             "left_anti")
    l = banded.select(F.col(id_col).alias("a"), "band", "band_hash")
    r = banded.select(F.col(id_col).alias("b"), "band", "band_hash")
    return (l.join(r, ["band", "band_hash"])
             .where(F.col("a") < F.col("b"))
             .select("a", "b").distinct())


def verify_candidate_pairs(cands: DataFrame, sh: DataFrame, id_col: str,
                           *, threshold: float = 0.7) -> DataFrame:
    """Exact-Jaccard verification restricted to candidate pairs.

    ``cands`` must hold DISTINCT (a, b) rows (``lsh_candidates`` guarantees
    this) — a duplicated pair would double its intersection count.

    The shingle self-join is GATED by the candidate list — the only shuffles
    are linear in |shingle table| (keyed by doc id, then (b, shingle)) plus
    O(candidate pairs × shingles-per-doc) intersection rows. The full
    all-pairs inverted-index self-join (O(pairs-sharing-a-shingle)) is never
    built, which is the entire point of LSH at 10^9-doc scale.
    """
    sizes = sh.groupBy(id_col).agg(F.count("*").alias("n_sh"))
    sha = sh.select(F.col(id_col).alias("a"), "shingle")
    shb = sh.select(F.col(id_col).alias("b"), "shingle")
    inter = (cands.join(sha, "a")              # expand pairs by a's shingles...
                  .join(shb, ["b", "shingle"])  # ...keep those also in b
                  .groupBy("a", "b").agg(F.count("*").alias("k")))
    sa = sizes.select(F.col(id_col).alias("a"), F.col("n_sh").alias("na"))
    sb = sizes.select(F.col(id_col).alias("b"), F.col("n_sh").alias("nb"))
    jac = (F.col("k").cast("double")
           / (F.col("na") + F.col("nb") - F.col("k")))
    return (inter.join(sa, "a").join(sb, "b")
                 .select("a", "b", jac.alias("jaccard"))
                 .where(F.col("jaccard") >= threshold))


def minhash_lsh_pairs(df: DataFrame, id_col: str, text_col: str,
                      *, n: int = 3, num_perm: int = 32, bands: int = 8,
                      threshold: float = 0.7,
                      max_shingle_df: int | None = None,
                      max_bucket_size: int | None = None) -> DataFrame:
    """MinHash+LSH near-dup pipeline: candidates from banded signatures, then
    exact-Jaccard verification of ONLY the candidates.

    One MATERIALIZED shingle scan feeds both the signatures and the
    verification (four plan branches total — see ``shingle_table``); the
    expensive per-pair groupBy runs over candidate pairs only (see
    ``verify_candidate_pairs``), never the whole corpus.
    """
    sh = shingle_table(df, id_col, text_col, n, max_shingle_df=max_shingle_df,
                       materialize=True)
    cands = lsh_candidates(_signatures_from_shingles(sh, id_col, num_perm),
                           id_col, num_perm, bands=bands,
                           max_bucket_size=max_bucket_size)
    return verify_candidate_pairs(cands, sh, id_col, threshold=threshold)


def simhash64(df: DataFrame, id_col: str, text_col: str, *, n: int = 3) -> DataFrame:
    """64-bit SimHash per doc (single-word convenience over ``simhash_sig``)."""
    sig = simhash_sig(df, id_col, text_col, n=n, bits=64)
    return sig.select(id_col, F.col("sig")[0].alias("simhash"))


def simhash_sig(df: DataFrame, id_col: str, text_col: str,
                *, n: int = 3, bits: int = 128, word_bits: int = 64,
                hash_fn=None) -> DataFrame:
    """``bits``-wide SimHash signature per doc as ``sig: array<long>``.

    Word ``w`` (low-to-high) holds signature bits ``[w*word_bits,
    w*word_bits + wb)`` where ``wb = min(word_bits, bits - w*word_bits)``;
    its shingle hash is ``hash_fn(shingle, seed=w)`` (independent seeded
    words — two xxhash64 seeds give the 128-bit signature of Manku et al.'s
    construction). Bit j of a word is set iff the ±1 sum of that hash bit
    over the doc's shingles is positive.

    Pure expressions end-to-end: one shingle explode → ``bits`` conditional
    sums in ONE combiner-lifted hash aggregate → per-word bit reassembly.
    """
    from spanner_data_validator_spark.functions.hashing import xxhash64_family

    hash_fn = hash_fn or xxhash64_family
    n_words = -(-bits // word_bits)  # ceil
    sh = shingle_table(df, id_col, text_col, n)
    hcols = [hash_fn(F.col("shingle"), w).alias(f"h{w}") for w in range(n_words)]
    hashed = sh.select(id_col, *hcols)

    bit_sums = []
    for w in range(n_words):
        wb = min(word_bits, bits - w * word_bits)
        for j in range(wb):
            bit_sums.append(
                F.sum(F.when(F.shiftright(F.col(f"h{w}"), j).bitwiseAND(F.lit(1)) == 1, 1)
                       .otherwise(-1)).alias(f"b{w}_{j}"))
    agg = hashed.groupBy(id_col).agg(*bit_sums)

    words = []
    for w in range(n_words):
        wb = min(word_bits, bits - w * word_bits)
        acc = F.lit(0).cast("long")
        for j in range(wb):
            bit = (1 << j) if j < 63 else -(1 << 63)  # bit 63 = long sign bit
            acc = acc + F.when(F.col(f"b{w}_{j}") > 0, F.lit(bit).cast("long")).otherwise(0)
        words.append(acc)
    return agg.select(id_col, F.array(*words).alias("sig"))


def simhash_block_layout(bits: int, n_blocks: int, word_bits: int = 64
                         ) -> list[tuple[int, int, int]]:
    """Contiguous equal blocks over a multi-word signature:
    ``[(word_index, offset_in_word, width), ...]`` — each block must lie
    inside one word (choose ``n_blocks`` so the per-word bit count divides
    evenly; e.g. 128 bits / 8 blocks → 4 blocks of 16 per word)."""
    if bits % n_blocks:
        raise ValueError(f"n_blocks={n_blocks} must divide bits={bits}")
    width = bits // n_blocks
    layout = []
    for i in range(n_blocks):
        lo = i * width
        if lo // word_bits != (lo + width - 1) // word_bits:
            raise ValueError(
                f"block {i} ([{lo},{lo + width})) spans a {word_bits}-bit word "
                f"boundary; pick n_blocks so blocks nest in words")
        layout.append((lo // word_bits, lo % word_bits, width))
    return layout


def _block_value(sig_col: str, word: int, offset: int, width: int):
    v = F.shiftrightunsigned(F.col(sig_col)[word], offset)
    if width < 64:
        v = v.bitwiseAND(F.lit((1 << width) - 1))
    return v


def simhash_candidates(sig_df: DataFrame, *, id_col: str, bits: int,
                       n_blocks: int, max_hamming: int,
                       word_bits: int = 64, sig_col: str = "sig",
                       max_bucket_size: int | None = None) -> DataFrame:
    """Candidate pairs via block-combination probing (the Manku/Jain/Sarma
    permuted-table construction, expressed as a bucket equi-join).

    Split the signature into ``b = n_blocks`` equal blocks. A pair within
    Hamming distance ``h = max_hamming`` has differing bits in at most h
    blocks, so it agrees EXACTLY on some (b-h)-subset of blocks (pigeonhole)
    — emit one probe row per (b-h)-combination (``C(b, h)`` rows/doc), keyed
    by (combo_id, concatenated kept-block values), and equi-join.

    Expected RANDOM collisions ≈ ``C(b,h) · C(n,2) / 2^(width·(b-h))``:
    size the kept-key width to the corpus — ``width·(b-h) ≳ 2·log2(n) + 20``
    keeps random candidates ~0 at any n. The r2 fixed 4×16-bit quarters
    (kept key = ONE 16-bit block) collapse at ~10^8 docs (~n²/2^16 pairs);
    the 128-bit/8-block/h=3 default keys on 80 bits → ~2e-5 expected random
    pairs even at 10^9 docs, ~56 probe rows per doc.

    Output: distinct ``(a, b, sig_a, sig_b)`` with a < b.
    """
    from itertools import combinations

    layout = simhash_block_layout(bits, n_blocks, word_bits)
    keep = n_blocks - max_hamming
    if keep < 1:
        raise ValueError("max_hamming must be < n_blocks")
    combos = list(combinations(range(n_blocks), keep))
    # 8-byte bucket key: xxhash64 over the kept block values, not their
    # decimal-string concat — the probe shuffle carries C(b,h) rows/doc, so
    # key width dominates its bytes (~100 B string -> 8 B long). A hash
    # collision can only MERGE buckets (extra candidates, removed by the
    # hamming verify); it can never split one, so recall stays exact.
    keys = F.array(*[
        F.xxhash64(*[_block_value(sig_col, *layout[b]) for b in combo])
        for combo in combos])
    probes = sig_df.select(F.col(id_col), F.col(sig_col),
                           F.posexplode(keys).alias("combo", "key"))
    if max_bucket_size is not None:
        # hot-bucket guard (see lsh_candidates): drop overfull buckets BEFORE
        # collecting them — the count agg reduces map-side to (bucket, n), so
        # the mega-cluster's array is never materialized. Members of a
        # dropped bucket still meet through their other C(b,h)-1 probe combos
        # whenever any kept block differs.
        hot = (probes.groupBy("combo", "key").agg(F.count("*").alias("__n"))
               .where(F.col("__n") > max_bucket_size).select("combo", "key"))
        probes = probes.join(F.broadcast(hot), ["combo", "key"], "left_anti")
    # bucket-collect instead of a probe self-join: the join evaluated the
    # (expensive) signature subplan once per side — Catalyst does not reuse
    # the exchange across the aliased branches — and shuffled the probe table
    # twice. One groupBy computes signatures ONCE and shuffles once; pair
    # expansion is an in-bucket expression, O(|bucket|²) per bucket — exactly
    # the pairs the join would emit for that bucket. array_sort inside the
    # agg (an evaluation barrier) both orders ids for a < b and keeps the
    # sort from being re-inlined per element (CollapseProject).
    buckets = (probes.groupBy("combo", "key")
               .agg(F.array_sort(F.collect_list(
                    F.struct(F.col(id_col).alias("i"),
                             F.col(sig_col).alias("s")))).alias("ds"))
               .where(F.size("ds") > 1))
    ds = F.col("ds")
    pair_arrays = F.transform(
        ds, lambda x, i: F.transform(
            F.slice(ds, i + F.lit(2), F.size(ds)),
            lambda y: F.struct(x["i"].alias("a"), y["i"].alias("b"),
                               x["s"].alias("sig_a"), y["s"].alias("sig_b"))))
    return (buckets.select(F.explode(F.flatten(pair_arrays)).alias("p"))
                   .select("p.a", "p.b", "p.sig_a", "p.sig_b").distinct())


def window_hash_positions(df: DataFrame, id_col: str, text_col: str,
                          *, width: int = 8, hash_fn=None) -> DataFrame:
    """(id, pos, h): hash of every ``width``-word rolling window, with its
    1-based start-token position.

    The window strings are hashed INSIDE the transform over the shingle
    array, so the Generate (posexplode) emits 8-byte longs, never the window
    text — at 100 TB the exploded table is ~|tokens| skinny rows/doc of
    (id, int, long), not ~50 B strings.
    """
    from spanner_data_validator_spark.functions.hashing import xxhash64_family

    hash_fn = hash_fn or xxhash64_family
    hashes = F.transform(shingles(text_col, width), lambda s: hash_fn(s, 0))
    return (df.select(F.col(id_col), F.posexplode(hashes).alias("pos0", "h"))
              .select(id_col, (F.col("pos0") + 1).cast("long").alias("pos"), "h"))


def duplicate_spans(df: DataFrame, id_col: str, text_col: str,
                    *, width: int = 8, min_occurrences: int = 2,
                    hash_fn=None) -> DataFrame:
    """Duplicated-substring spans — the substring-level dedup pass of Lee et
    al. 2022 ("Deduplicating Training Data Makes Language Models Better"),
    re-expressed Spark-first: the suffix-array scan over the concatenated
    corpus becomes rolling ``width``-word window hashes + a global
    repeated-window count, which finds exactly the maximal duplicated
    substrings of >= ``width`` tokens (every such substring is a run of
    repeated windows; merging overlapping/adjacent repeated windows
    reconstructs the span).

    Plan: one window-hash explode (scan-stage, no shuffle) -> ONE exchange
    keyed by the 8-byte window hash (a count window marks hashes occurring
    >= ``min_occurrences`` times corpus-wide — no groupBy+join second pass)
    -> one exchange keyed by doc id for the gaps-and-islands merge (windows
    whose start positions differ by <= ``width`` overlap or adjoin). Both
    shuffles are linear in the token count; nothing is ever quadratic in
    docs or occurrences.

    Output: (id_col, span_start, span_end, n_windows) with 1-based inclusive
    token positions — feed it to a span-removal rewrite or a
    duplicated-token-fraction quality signal.
    """
    from pyspark.sql import Window

    wh = window_hash_positions(df, id_col, text_col, width=width,
                               hash_fn=hash_fn)
    cnt_w = Window.partitionBy("h")
    marked = (wh.withColumn("__c", F.count("*").over(cnt_w))
                .where(F.col("__c") >= min_occurrences)
                .select(id_col, "pos"))
    doc_w = Window.partitionBy(id_col).orderBy("pos")
    brk = F.when(F.col("pos") - F.lag("pos").over(doc_w) <= width,
                 F.lit(0)).otherwise(F.lit(1))
    grouped = (marked.withColumn("__brk", brk)
                     .withColumn("__island", F.sum("__brk").over(doc_w)))
    return (grouped.groupBy(id_col, "__island")
            .agg(F.min("pos").alias("span_start"),
                 (F.max("pos") + F.lit(width - 1)).cast("long").alias("span_end"),
                 F.count("*").alias("n_windows"))
            .drop("__island"))


def maximal_duplicate_spans(df: DataFrame, id_col: str, text_col: str,
                            *, width: int = 8, min_len: int | None = None,
                            max_occurrences: int = 64,
                            hash_fn=None) -> DataFrame:
    """Maximal duplicated token spans with PAIR attribution — the exact
    substring-dedup semantics of Lee et al. 2022 (suffix-array territory),
    re-expressed as seed-and-chain over rolling window hashes.

    ``duplicate_spans`` reports per-doc COVERAGE (the union of repeated
    windows, merged), which approximates long duplicated spans; this
    operator reports, for every ordered occurrence pair, the MAXIMAL run
    of token positions where the two occurrences carry the identical
    substring. A common substring of L >= ``width`` tokens between
    occurrence A at position p and occurrence B at position q is exactly a
    run of L - width + 1 consecutive matching windows on the diagonal
    q - p; runs are maximal because the windows just outside the run
    hash-differ (exact up to hash collisions — use a 60-bit+ family).

    Plan, all linear in token count except the capped in-bucket pair
    expansion: window-hash explode (scan stage) -> ONE exchange keyed by
    the window hash (bucket-collect; the aliased self-join would compute
    the window subplan twice — r3 lesson) -> in-bucket ordered pair
    expansion, O(c²) per hash capped by ``max_occurrences`` (overfull
    hashes are boilerplate; they are dropped here and belong to
    ``duplicate_spans``' coverage report — callers should log the cap) ->
    ONE exchange keyed by (id_a, id_b, diagonal) for the gaps-and-islands
    run merge. Nothing is ever quadratic in docs or corpus size.

    Output: (id_a, a_start, id_b, b_start, span_len, n_windows) with
    1-based token positions, (id_a, a_start) < (id_b, b_start)
    lexicographically, span_len in tokens; same-doc internal repeats
    appear as id_a == id_b rows with a_start < b_start. ``min_len``
    (default ``width``) filters short spans after the merge.
    """
    from pyspark.sql import Window

    min_len = width if min_len is None else min_len
    wh = window_hash_positions(df, id_col, text_col, width=width,
                               hash_fn=hash_fn)
    # Bucket-collect per hash; array_sort gives canonical (id, pos) order
    # so slice-expansion emits each unordered pair once, lexicographically
    # oriented. size(ds) bounds: >= 2 (a pair exists) and <= cap.
    buckets = (wh.groupBy("h")
               .agg(F.array_sort(F.collect_list(
                    F.struct(F.col(id_col).alias("i"),
                             F.col("pos").alias("p")))).alias("ds"))
               .where((F.size("ds") > 1)
                      & (F.size("ds") <= F.lit(max_occurrences))))
    ds = F.col("ds")
    pair_arrays = F.transform(
        ds, lambda x, i: F.transform(
            F.slice(ds, i + F.lit(2), F.size(ds)),
            lambda y: F.struct(x["i"].alias("id_a"), x["p"].alias("pos_a"),
                               y["i"].alias("id_b"), y["p"].alias("pos_b"))))
    pairs = (buckets.select(F.explode(F.flatten(pair_arrays)).alias("pr"))
                    .select("pr.id_a", "pr.pos_a", "pr.id_b", "pr.pos_b"))
    # Chain seeds along each diagonal: consecutive pos_a (step 1) on the
    # same (id_a, id_b, pos_b - pos_a) diagonal extend one common span.
    diag = (F.col("pos_b") - F.col("pos_a")).alias("diag")
    dw = Window.partitionBy("id_a", "id_b", "diag").orderBy("pos_a")
    brk = F.when(F.col("pos_a") - F.lag("pos_a").over(dw) == 1,
                 F.lit(0)).otherwise(F.lit(1))
    runs = (pairs.select("id_a", "pos_a", "id_b", "pos_b", diag)
            .withColumn("__brk", brk)
            .withColumn("__run", F.sum("__brk").over(dw)))
    out = (runs.groupBy("id_a", "id_b", "diag", "__run")
           .agg(F.min("pos_a").alias("a_start"),
                F.min("pos_b").alias("b_start"),
                (F.count("*") + F.lit(width - 1)).cast("long")
                .alias("span_len"),
                F.count("*").alias("n_windows"))
           .where(F.col("span_len") >= min_len)
           .select("id_a", "a_start", "id_b", "b_start",
                   "span_len", "n_windows"))
    return out


def _large_star(e: DataFrame) -> DataFrame:
    """One large-star round over an undirected edge list ``(a, b)``.

    Symmetrize, then for every node u connect each strictly-larger neighbor v
    to ``m = min(neighbors(u) + [u])``. Shuffles: one groupBy(u) + one
    equi-join on u — both keyed by node id, both linear in |E|.
    """
    sym = (e.select(F.col("a").alias("u"), F.col("b").alias("v"))
            .unionByName(e.select(F.col("b").alias("u"), F.col("a").alias("v"))))
    mins = (sym.groupBy("u").agg(F.min("v").alias("__mn"))
               .select("u", F.least("__mn", F.col("u")).alias("m")))
    return (sym.join(mins, "u")
               .where(F.col("v") > F.col("u"))
               .select(F.col("v").alias("a"), F.col("m").alias("b"))
               .distinct())


def _small_star(e: DataFrame) -> DataFrame:
    """One small-star round: orient each edge (u > v), connect all of u's
    (smaller) neighbors AND u itself to ``m = min(neighbors(u))``."""
    o = e.select(F.greatest("a", "b").alias("u"), F.least("a", "b").alias("v"))
    mins = o.groupBy("u").agg(F.min("v").alias("m"))
    stars = (o.join(mins, "u")
              .select(F.col("v").alias("a"), F.col("m").alias("b"))
              .unionByName(mins.select(F.col("u").alias("a"),
                                       F.col("m").alias("b"))))
    return stars.where(F.col("a") != F.col("b")).distinct()


def connected_components(edges: DataFrame, *, a_col: str = "a",
                         b_col: str = "b", max_iter: int = 25) -> DataFrame:
    """Connected components of an undirected edge list → ``(node, component)``
    where component = the minimum node id in the component.

    Alternating large-star/small-star (Kiveris et al., "Connected Components
    in MapReduce and Beyond") — the standard way to cluster near-duplicate
    PAIRS into dup groups so one canonical doc per group survives. Each round
    is two node-keyed shuffles; the edge set provably converges to min-rooted
    stars in O(log n) rounds, so ``max_iter=25`` covers any real corpus (the
    loop raises if the fixpoint is not reached — never returns silently-wrong
    partial labels).

    Per-round ``localCheckpoint`` truncates the iterative lineage (at 10^9
    edges the un-truncated plan tree, not the data, becomes the bottleneck);
    on a real cluster prefer ``spark.sparkContext.setCheckpointDir`` +
    ``checkpoint()`` for fault tolerance across executor loss.

    Only nodes that appear in ``edges`` are labeled — join the full corpus
    with ``assign_components`` to label singletons.
    """
    # materialize the input edges up front: each star round reads its edge set
    # twice (symmetrize / orient union branches), and Catalyst does not reuse
    # exchanges across aliased branches — without this the (often expensive)
    # pair-generation subplan would run twice in round 1.
    e = (edges.select(F.col(a_col).alias("a"), F.col(b_col).alias("b"))
              .where(F.col("a") != F.col("b")).distinct()
              .localCheckpoint(eager=True))
    prev = None
    for _ in range(max_iter):
        e = _small_star(_large_star(e)).localCheckpoint(eager=True)
        # xor-fold of the (distinct) edge hashes: an order-independent,
        # overflow-free set signature (ANSI mode forbids a sum here)
        chk = e.agg(
            F.count("*").alias("n"),
            F.coalesce(F.bit_xor(F.xxhash64("a", "b")), F.lit(0)).alias("s")).first()
        sig = (chk["n"], chk["s"])
        if sig == prev:
            break
        prev = sig
    else:
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds")
    # converged: e is a star forest (member -> component min)
    return (e.select(F.col("a").alias("node"), F.col("b").alias("component"))
             .unionByName(e.select(F.col("b").alias("node"),
                                   F.col("b").alias("component")))
             .distinct())


def assign_components(df: DataFrame, pairs: DataFrame, id_col: str,
                      *, a_col: str = "a", b_col: str = "b") -> DataFrame:
    """Label EVERY row of ``df`` with its near-dup component (docs in no pair
    are their own singleton component). Output: df columns + ``component``.

    The component map is one row per doc-in-a-dup-group — tiny relative to
    the corpus (dup groups are sparse after ``exact_dedup``), so the join
    broadcasts when it fits; Catalyst/AQE picks that automatically under the
    default autoBroadcastJoinThreshold at real-world dup densities.
    """
    cc = connected_components(pairs, a_col=a_col, b_col=b_col)
    return (df.join(cc, df[id_col] == cc["node"], "left")
              .drop("node")
              .withColumn("component",
                          F.coalesce(F.col("component"), F.col(id_col))))


def canonical_docs(df: DataFrame, pairs: DataFrame, id_col: str,
                   *, a_col: str = "a", b_col: str = "b") -> DataFrame:
    """The deduplicated corpus: keep one canonical doc (min id) per near-dup
    component, all singletons included. Same columns as ``df``."""
    labeled = assign_components(df, pairs, id_col, a_col=a_col, b_col=b_col)
    return labeled.where(F.col(id_col) == F.col("component")).drop("component")


def sig_hamming(sig_a, sig_b):
    """Hamming distance between two array<long> signatures (pure expression)."""
    return F.aggregate(
        F.zip_with(sig_a, sig_b, lambda x, y: F.bit_count(x.bitwiseXOR(y))),
        F.lit(0), lambda acc, x: acc + x)


def simhash_near_dups(df: DataFrame, id_col: str, text_col: str,
                      *, n: int = 3, max_hamming: int = 3,
                      bits: int = 128, n_blocks: int = 8,
                      word_bits: int = 64, hash_fn=None,
                      max_bucket_size: int | None = None) -> DataFrame:
    """SimHash near-dup pairs: blocked candidate generation (``C(n_blocks,
    max_hamming)`` combination probes — recall is exact by pigeonhole), then
    bit_count-of-xor verification. Defaults (128-bit signature, 8 blocks,
    h=3 → 80-bit bucket keys) are sized for 10^9-doc corpora; see
    ``simhash_candidates`` for the candidate-count bound and sizing rule.
    """
    sig = simhash_sig(df, id_col, text_col, n=n, bits=bits,
                      word_bits=word_bits, hash_fn=hash_fn)
    cand = simhash_candidates(sig, id_col=id_col, bits=bits, n_blocks=n_blocks,
                              max_hamming=max_hamming, word_bits=word_bits,
                              max_bucket_size=max_bucket_size)
    ham = sig_hamming(F.col("sig_a"), F.col("sig_b"))
    return cand.select("a", "b", ham.alias("hamming")).where(ham <= max_hamming)


def prefix_filter_jaccard_pairs(df: DataFrame, id_col: str, text_col: str,
                                *, n: int = 3, threshold: float = 0.7,
                                max_shingle_df: int | None = None
                                ) -> DataFrame:
    """Exact Jaccard pairs via PPJoin-style PREFIX FILTERING — the third
    candidate generator (vs the full inverted index in ``jaccard_pairs``
    and the banded LSH in ``minhash_lsh_pairs``), same exact answer.

    Principle: order every doc's shingles by global rarity (document
    frequency asc, then shingle). For Jaccard >= t, a pair's overlap is
    >= ceil(t*|x|), so if a partner shares NOTHING with x's first
    |x| - ceil(t*|x|) + 1 tokens (the "prefix"), the remaining tokens
    cannot reach the bound — probing ONLY prefixes against the full
    index is complete. Rarest-first ordering puts the probe mass on
    low-frequency tokens, so candidate volume ~ sum over prefix tokens
    of df(token): far below the full index self-join, with no LSH false
    negatives. Verification reuses :func:`verify_candidate_pairs`.

    The rarity rank uses :func:`operators.layout.global_row_number`
    with bit-length-of-df buckets (monotone in df, so order-aligned) —
    no single-partition window over the vocabulary.
    """
    from spanner_data_validator_spark.operators.layout import (
        global_row_number,
    )

    sh = shingle_table(df, id_col, text_col, n,
                       max_shingle_df=max_shingle_df, materialize=True)
    freq = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("__df"))
    ranked = global_row_number(
        freq, [F.col("__df"), F.col("shingle")],
        F.length(F.bin(F.col("__df"))), out_col="rk"
    ).select("shingle", "rk")
    shr = sh.join(ranked, "shingle")
    wd = Window.partitionBy(id_col)
    pref = (shr.withColumn("__pos",
                           F.row_number().over(wd.orderBy("rk")))
            .withColumn("__n", F.count(F.lit(1)).over(wd))
            .where(F.col("__pos")
                   <= F.col("__n")
                   - F.ceil(F.lit(float(threshold)) * F.col("__n")) + 1))
    probes = pref.select(F.col(id_col).alias("a"), "shingle")
    index = sh.select(F.col(id_col).alias("b"), "shingle")
    cand = (probes.join(index, "shingle")
            .where(F.col("a") != F.col("b"))
            .select(F.least("a", "b").alias("a"),
                    F.greatest("a", "b").alias("b"))
            .distinct())
    return verify_candidate_pairs(cand, sh, id_col, threshold=threshold)
