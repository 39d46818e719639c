"""Repair planning: turn a validation classification into the changeset that
converges the target onto the source.

The reference pipeline stops at *reporting* — ComparerResult counts to
BigQuery plus the two conflicting-record sinks
(JDBCToSpannerDVTWithHash.java:191-246). The natural next step a migration
operator takes with that report is the anti-entropy repair: re-insert the
SOURCE_ONLY rows, delete the TARGET_ONLY rows, overwrite the MISMATCH rows.
This module derives that changeset from ``classify_pair`` output (one row per
divergent key with an action + the source payload), renders it as idempotent
MERGE / DELETE statements for a SQL target, and can apply it to a DataFrame
snapshot so convergence is provable in-engine (re-classifying the repaired
target must yield 100% MATCH).

Scale shape (10^12 rows):

* ``repair_actions`` is a filter + projection over the classify output — no
  exchange beyond the classify join that already ran; at typical divergence
  rates (<<1%) the changeset is a tiny fraction of the keyspace.
* ``apply_repairs`` joins the target with the changeset on the key. The
  changeset is usually small enough to broadcast; we leave the strategy to
  AQE (which picks broadcast from runtime size) rather than forcing a hint,
  because a worst-case full-divergence changeset must still work as a
  shuffle join.
* The SQL renderings are idempotent (MERGE upsert + keyed DELETE), so a
  retried repair batch converges to the same state — same fencing story as
  ``streaming/sink.py``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from spanner_data_validator_spark.operators.comparator import (
    MATCH,
    MISMATCH,
    SOURCE_ONLY,
    TARGET_ONLY,
)

INSERT = "INSERT"
UPDATE = "UPDATE"
DELETE = "DELETE"


def repair_actions(
    classified: DataFrame,
    key_cols: list[str],
    *,
    payload_col: str = "payload",
) -> DataFrame:
    """Changeset that converges target → source.

    ``classified`` is ``classify_pair(..., carry_cols=[payload_col])`` output
    (so it has ``status``, ``src_<payload_col>``, ``tgt_<payload_col>``).
    Output: ``key_cols..., action, new_<payload_col>`` with one row per
    non-MATCH key — SOURCE_ONLY→INSERT, MISMATCH→UPDATE (both carrying the
    source payload), TARGET_ONLY→DELETE (NULL payload).
    """
    src_payload = F.col(f"src_{payload_col}")
    action = (
        F.when(F.col("status") == SOURCE_ONLY, F.lit(INSERT))
        .when(F.col("status") == TARGET_ONLY, F.lit(DELETE))
        .when(F.col("status") == MISMATCH, F.lit(UPDATE))
    )
    return classified.where(F.col("status") != MATCH).select(
        *[F.col(k) for k in key_cols],
        action.alias("action"),
        F.when(F.col("status") != TARGET_ONLY, src_payload).alias(
            f"new_{payload_col}"
        ),
    )


def apply_repairs(
    target: DataFrame,
    actions: DataFrame,
    key_cols: list[str],
    *,
    payload_col: str = "payload",
) -> DataFrame:
    """Apply a changeset to a target snapshot DataFrame.

    Returns the repaired target with the same ``key_cols + [payload_col]``
    schema as ``target``: DELETE keys removed, UPDATE payloads replaced,
    INSERT rows appended. One outer join on the key (AQE broadcasts the
    changeset when it is small); the INSERT branch is a union of already-
    projected changeset rows, not a second scan of the target.
    """
    new_col = f"new_{payload_col}"
    acts = actions.select(
        *[F.col(k) for k in key_cols],
        F.col("action").alias("__action"),
        F.col(new_col).alias("__new"),
    )
    merged = target.join(acts, on=key_cols, how="left")
    kept = merged.where(
        F.col("__action").isNull() | (F.col("__action") != DELETE)
    ).select(
        *[F.col(k) for k in key_cols],
        F.when(F.col("__action") == UPDATE, F.col("__new"))
        .otherwise(F.col(payload_col))
        .alias(payload_col),
    )
    inserts = acts.where(F.col("__action") == INSERT).select(
        *[F.col(k) for k in key_cols], F.col("__new").alias(payload_col)
    )
    return kept.unionByName(inserts)


def _quoted(ident: str) -> str:
    return '"' + ident.replace('"', '""') + '"'


def repair_merge_sql(
    target_table: str,
    changeset_table: str,
    key_cols: list[str],
    payload_cols: list[str],
    *,
    payload_prefix: str = "new_",
) -> list[str]:
    """Idempotent SQL rendering of the changeset for a MERGE-capable target.

    Two statements: a keyed DELETE for the DELETE actions, then a MERGE
    upserting INSERT/UPDATE actions. Key equality uses
    ``IS NOT DISTINCT FROM`` so NULL key components behave like the engine's
    join (same convention as ``streaming/sink.build_merge_sql``). Running the
    pair twice is a no-op the second time — safe under retry.
    """
    t, c = _quoted(target_table), _quoted(changeset_table)
    on = " AND ".join(
        f"{t}.{_quoted(k)} IS NOT DISTINCT FROM {c}.{_quoted(k)}"
        for k in key_cols
    )
    set_clause = ", ".join(
        f"{_quoted(p)} = {c}.{_quoted(payload_prefix + p)}" for p in payload_cols
    )
    insert_cols = ", ".join(_quoted(k) for k in [*key_cols, *payload_cols])
    insert_vals = ", ".join(
        [f"{c}.{_quoted(k)}" for k in key_cols]
        + [f"{c}.{_quoted(payload_prefix + p)}" for p in payload_cols]
    )
    delete_sql = (
        f"DELETE FROM {t} USING {c} "
        f"WHERE {on} AND {c}.\"action\" = 'DELETE'"
    )
    merge_sql = (
        f"MERGE INTO {t} USING "
        f"(SELECT * FROM {c} WHERE \"action\" <> 'DELETE') AS {c} "
        f"ON {on} "
        f"WHEN MATCHED THEN UPDATE SET {set_clause} "
        f"WHEN NOT MATCHED THEN INSERT ({insert_cols}) VALUES ({insert_vals})"
    )
    return [delete_sql, merge_sql]


def repair_delete_insert_sql(
    target_table: str,
    changeset_table: str,
    key_cols: list[str],
    payload_cols: list[str],
    *,
    payload_prefix: str = "new_",
) -> list[str]:
    """MERGE-free expansion of the changeset (engines without MERGE INTO —
    same convention as ``streaming/sink.merge_as_delete_insert_sql``):
    delete EVERY changeset key from the target (covers DELETE actions and
    clears the old image of UPDATEs), then insert the INSERT/UPDATE images.
    The pair is idempotent: a second application deletes exactly the rows
    the first one inserted and re-inserts the same images.
    """
    t, c = _quoted(target_table), _quoted(changeset_table)
    on = " AND ".join(
        f"{t}.{_quoted(k)} IS NOT DISTINCT FROM {c}.{_quoted(k)}"
        for k in key_cols
    )
    insert_cols = ", ".join(_quoted(k) for k in [*key_cols, *payload_cols])
    select_vals = ", ".join(
        [f"{c}.{_quoted(k)}" for k in key_cols]
        + [f"{c}.{_quoted(payload_prefix + p)}" for p in payload_cols]
    )
    delete_sql = f"DELETE FROM {t} USING {c} WHERE {on}"
    insert_sql = (
        f"INSERT INTO {t} ({insert_cols}) "
        f"SELECT {select_vals} FROM {c} WHERE {c}.\"action\" <> 'DELETE'"
    )
    return [delete_sql, insert_sql]
