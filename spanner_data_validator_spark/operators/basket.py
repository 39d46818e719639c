"""Market-basket pair co-occurrence with lift — frequent-itemset mining's
first rung, over any (group, item) relation (orders×parts here; the same
shape mines co-edited files, co-clicked products, co-cited docs).

Plan shape at 100 TB:

* distinct (group, item) then ONE group-keyed aggregation collapses each
  basket to a sorted item array — the only row-scale shuffle;
* the in-basket pair expansion is two chained Generates over that array
  (posexplode × slice) — pure scan-stage work, NO self-join, so the input
  is read once (Catalyst does not reuse exchanges across self-join
  branches — the multi-branch rescan trap, CLAUDE.md);
* ``max_basket`` drops pathological mega-baskets BEFORE the quadratic
  expansion (the hot-key guard: one 10^5-item basket is 10^10 pairs) and
  the operator reports how many baskets that cap dropped — no silent caps;
* item supports reduce from the same capped array (explode + count,
  vocabulary-sized), and lift = n_pair·n_groups / (n_a·n_b) is computed as
  ONE double division of exact BIGINT products, so scores are bit-identical
  in any engine (the cross-engine float-sum trap never arises);
* top-k is a global orderBy+limit — Spark plans TakeOrderedAndProject
  (per-partition partial top-k, then a k-row merge), never a full sort.

The reference has no itemset surface at all (SURVEY §2.10 — north-rule
gap-fill alongside the text collocation twin in ``operators/terms``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def basket_arrays(df: DataFrame, group: str, item: str,
                  *, max_basket: int = 64) -> DataFrame:
    """(group, items) with ``items`` the sorted distinct item array of each
    basket, baskets larger than ``max_basket`` dropped. One shuffle."""
    return (df.select(F.col(group).alias("grp"), F.col(item).alias("it"))
            .groupBy("grp")
            .agg(F.sort_array(F.collect_set("it")).alias("items"))
            .where(F.size("items") <= max_basket))


def pair_lift(df: DataFrame, group: str, item: str, *,
              max_basket: int = 64, min_pair_count: int = 1,
              k: int = 50) -> DataFrame:
    """Top-``k`` co-occurring item pairs with support counts and lift.

    Output: (item_a, item_b, n_pair, n_a, n_b, n_groups, lift), ordered by
    (n_pair desc, lift desc, item_a, item_b) — a deterministic total order,
    ties included, because lift is a single IEEE division of exact integers.
    """
    b = basket_arrays(df, group, item, max_basket=max_basket)
    # b feeds three branches (pairs, item supports, the group count) —
    # pin it or each branch re-runs the basket aggregation.
    b = b.localCheckpoint(eager=True)
    n_groups = b.count()

    # in-basket pair expansion: items is sorted, so (items[i], later
    # element) enumerates exactly the a<b pairs. Two Generates, no join.
    pairs = (b.select(F.posexplode("items").alias("i", "ia"),
                      F.col("items"))
             .select("ia", F.explode(F.expr(
                 "slice(items, i + 2, size(items) - i - 1)")).alias("ib")))
    pc = (pairs.groupBy("ia", "ib").agg(F.count(F.lit(1)).alias("n_pair"))
          .where(F.col("n_pair") >= min_pair_count))

    # item supports feed both join sides below — pin the (small,
    # vocabulary-sized) table so the explode+agg runs once.
    ic = (b.select(F.explode("items").alias("it"))
          .groupBy("it").agg(F.count(F.lit(1)).alias("n_it"))
          .localCheckpoint(eager=True))

    na = ic.select(F.col("it").alias("ia"), F.col("n_it").alias("n_a"))
    nb = ic.select(F.col("it").alias("ib"), F.col("n_it").alias("n_b"))
    out = (pc.join(na, "ia").join(nb, "ib")
           .select(F.col("ia").alias("item_a"), F.col("ib").alias("item_b"),
                   "n_pair", "n_a", "n_b",
                   F.lit(n_groups).cast("long").alias("n_groups"),
                   ((F.col("n_pair") * F.lit(n_groups)).cast("double")
                    / (F.col("n_a") * F.col("n_b")).cast("double"))
                   .alias("lift")))
    return (out.orderBy(F.col("n_pair").desc(), F.col("lift").desc(),
                        F.col("item_a").asc(), F.col("item_b").asc())
            .limit(k))


def dropped_basket_count(df: DataFrame, group: str, item: str,
                         *, max_basket: int = 64) -> int:
    """How many baskets ``max_basket`` excluded (the no-silent-caps probe)."""
    return (df.select(F.col(group).alias("grp"), F.col(item).alias("it"))
            .groupBy("grp").agg(F.countDistinct("it").alias("sz"))
            .where(F.col("sz") > max_basket).count())
