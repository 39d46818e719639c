"""Exactly-once idempotent sinks for the validation streams.

Production target: Iceberg ``MERGE INTO`` keyed ``(conv_id, turn_idx,
window_start)`` inside ``foreachBatch`` — replaying a micro-batch after a
crash re-merges the same keys and the table converges to the same state
(SURVEY.md §7.1 milestone 8; the Spark-native upgrade of the reference's
append-only BigQuery STORAGE_WRITE_API sink,
JDBCToSpannerDVTWithHash.java:191-246, which is NOT exactly-once).

Sandbox implementation (no Iceberg jar available): the same ``foreachBatch``
driver with two standard exactly-once techniques that need no table format:

* **batch-id fencing** — Structured Streaming replays a failed micro-batch
  with the SAME ``batch_id``. Each batch writes to ``<out>/data/batch=<id>/``
  with overwrite, then atomically creates a ``<out>/_commits/<id>`` marker.
  A replay overwrites the very same directory and re-creates the marker —
  idempotent. Readers (``read_committed``) only see marker-backed batches,
  so a crash between write and marker is invisible.
* the directory layout doubles as the MERGE key space: one row per
  (conv_id, turn_idx) ever reaches the sink in append mode (the outer join
  emits each key's final classification exactly once), so key-level merge
  reduces to batch-level idempotent append.

``merge_into_iceberg`` is the real-cluster path, exercised when an Iceberg
catalog is configured on the session.
"""

from __future__ import annotations

import json
import shutil
import os

from pyspark.sql import DataFrame, SparkSession


class ExactlyOnceParquetSink:
    """``foreachBatch`` callable writing batch-fenced parquet partitions."""

    def __init__(self, out_dir: str, *, coalesce: int | None = None):
        self.out_dir = out_dir
        self.coalesce = coalesce
        os.makedirs(os.path.join(out_dir, "_commits"), exist_ok=True)

    def _marker(self, batch_id: int) -> str:
        return os.path.join(self.out_dir, "_commits", str(batch_id))

    def is_committed(self, batch_id: int) -> bool:
        return os.path.exists(self._marker(batch_id))

    def committed_rows(self, batch_id: int) -> int | None:
        """Row count recorded at commit time, or None if not committed."""
        try:
            with open(self._marker(batch_id)) as f:
                return json.load(f)["rows"]
        except FileNotFoundError:
            return None

    def batch_paths(self, batch_id: int) -> list[str]:
        return [os.path.join(self.out_dir, "data", f"batch={batch_id}")]

    def __call__(self, batch_df: DataFrame | None, batch_id: int) -> int | None:
        """Write one micro-batch; returns rows written, or None on a
        replayed already-committed batch (skipped — exactly-once)."""
        if self.is_committed(batch_id):
            return None
        n = 0
        if batch_df is not None:
            # single pass: write, then count from the written parquet footers
            # (metadata-cheap) instead of a second pass through the plan
            df = batch_df.coalesce(self.coalesce) if self.coalesce else batch_df
            target = self.batch_paths(batch_id)[0]
            df.write.mode("overwrite").parquet(target)
            n = df.sparkSession.read.parquet(target).count()
            if n == 0:
                shutil.rmtree(target, ignore_errors=True)
        tmp = self._marker(batch_id) + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"batch_id": batch_id, "rows": n}, f)
        os.replace(tmp, self._marker(batch_id))  # atomic commit point
        return n

    def read_committed(self, spark: SparkSession) -> DataFrame | None:
        """Read exactly the committed batches (uncommitted dirs are ignored)."""
        commits_dir = os.path.join(self.out_dir, "_commits")
        paths = []
        for name in sorted(os.listdir(commits_dir)):
            if name.endswith(".tmp"):
                continue
            with open(os.path.join(commits_dir, name)) as f:
                meta = json.load(f)
            if meta["rows"] > 0:
                paths.append(os.path.join(self.out_dir, "data", f"batch={name}"))
        if not paths:
            return None
        return spark.read.parquet(*paths)


class AtomicMultiParquetSink:
    """Batch-fenced parquet sink where ONE commit marker covers N logical
    tables — the atomic-two-table upgrade (VERDICT r4 #5).

    ``ExactlyOnceParquetSink`` fences each table separately, so a crash
    between the report commit and the conflict-rows commit publishes a
    report whose conflict rows are missing until the batch replays
    (``TallyForeachBatch`` heals on replay, but a reader in the crash
    window sees the torn state). Here every table's batch directory is
    STAGED first and the single ``_commits/<id>`` marker — one atomic
    ``os.replace`` — is the only publication point: readers gate every
    table on that marker, so all tables of a batch become visible
    together or not at all. Replays overwrite the same staged dirs and
    re-create the same marker — idempotent. The reference writes its
    report + conflicting-rows as two independent sinks
    (JDBCToSpannerDVTWithHash.java:393-415, 468-469) with no such
    atomicity; on Iceberg the equivalent is a single multi-table
    transaction (or one table with a type column).
    """

    def __init__(self, out_dir: str, tables: list[str]):
        if not tables:
            raise ValueError("at least one table is required")
        self.out_dir = out_dir
        self.tables = list(tables)
        os.makedirs(os.path.join(out_dir, "_commits"), exist_ok=True)

    def _marker(self, batch_id: int) -> str:
        return os.path.join(self.out_dir, "_commits", str(batch_id))

    def is_committed(self, batch_id: int) -> bool:
        return os.path.exists(self._marker(batch_id))

    def data_path(self, table: str, batch_id: int) -> str:
        return os.path.join(self.out_dir, table, f"batch={batch_id}")

    def committed_rows(self, batch_id: int) -> dict[str, int] | None:
        try:
            with open(self._marker(batch_id)) as f:
                return json.load(f)["rows"]
        except FileNotFoundError:
            return None

    # write/commit split so tests can prove both-or-neither by crashing
    # between the two steps
    def _write_data(self, batch_id: int,
                    frames: dict[str, DataFrame | None]) -> dict[str, int]:
        unknown = set(frames) - set(self.tables)
        if unknown:
            raise ValueError(f"unknown tables: {sorted(unknown)}")
        rows: dict[str, int] = {}
        for table in self.tables:
            if table not in frames:
                continue  # absent tables are the CALLER's to count (or 0)
            df = frames[table]
            n = 0
            target = self.data_path(table, batch_id)
            if df is not None:
                df.write.mode("overwrite").parquet(target)
                n = df.sparkSession.read.parquet(target).count()
                if n == 0:
                    shutil.rmtree(target, ignore_errors=True)
            rows[table] = n
        return rows

    def _commit(self, batch_id: int, rows: dict[str, int]) -> None:
        tmp = self._marker(batch_id) + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"batch_id": batch_id, "rows": rows}, f)
        os.replace(tmp, self._marker(batch_id))  # the ONE atomic commit point

    def write_batch(self, batch_id: int,
                    frames: dict[str, DataFrame | None]) -> dict[str, int] | None:
        """Stage every table's batch, then commit once. Returns per-table
        rows written, or None for a replayed already-committed batch."""
        if self.is_committed(batch_id):
            return None
        rows = self._write_data(batch_id, frames)
        self._commit(batch_id, rows)
        return rows

    def read_committed(self, spark: SparkSession,
                       table: str) -> DataFrame | None:
        """Exactly the marker-backed batches of one table — a batch whose
        marker is missing is invisible for EVERY table."""
        if table not in self.tables:
            raise ValueError(f"unknown table: {table}")
        commits_dir = os.path.join(self.out_dir, "_commits")
        paths = []
        for name in sorted(os.listdir(commits_dir)):
            if not name.isdigit():
                continue
            with open(os.path.join(commits_dir, name)) as f:
                meta = json.load(f)
            if meta["rows"].get(table, 0) > 0:
                paths.append(self.data_path(table, int(name)))
        if not paths:
            return None
        return spark.read.parquet(*paths)


class AtomicTallySink:
    """``TallyForeachBatch`` under ONE fence: classified rows, per-window
    tallies, and mismatch rows of a micro-batch become visible together
    or not at all. Same derivation discipline — one pass over the
    streamed join output (write rows, then derive tallies/mismatches from
    the just-written columnar batch, which is readable pre-commit because
    staging is by directory, publication by marker)."""

    def __init__(self, out_dir: str, *, window_duration: str = "1 hour"):
        self.sink = AtomicMultiParquetSink(
            out_dir, ["classified", "tallies", "mismatches"])
        self.window_duration = window_duration

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        from pyspark.sql import functions as F

        if self.sink.is_committed(batch_id):
            return
        rows = self.sink._write_data(batch_id, {"classified": batch_df})
        if rows["classified"] == 0:
            self.sink._commit(batch_id, {**rows, "tallies": 0,
                                         "mismatches": 0})
            return
        spark = batch_df.sparkSession
        stored = spark.read.parquet(
            self.sink.data_path("classified", batch_id))
        tallies = (
            stored.groupBy(F.window("ts", self.window_duration).alias("w"),
                           "status")
            .agg(F.count("*").alias("n"))
            .select(F.col("w.start").alias("window_start"), "status", "n"))
        rows.update(self.sink._write_data(
            batch_id, {"tallies": tallies,
                       "mismatches": stored.where(F.col("status") != "MATCH")}))
        self.sink._commit(batch_id, rows)

    def read_rows(self, spark: SparkSession) -> DataFrame | None:
        return self.sink.read_committed(spark, "classified")

    def read_mismatches(self, spark: SparkSession) -> DataFrame | None:
        return self.sink.read_committed(spark, "mismatches")

    def report(self, spark: SparkSession) -> DataFrame | None:
        from pyspark.sql import functions as F

        partials = self.sink.read_committed(spark, "tallies")
        if partials is None:
            return None
        return partials.groupBy("window_start", "status").agg(
            F.sum("n").alias("n"))


def build_merge_sql(table: str, view: str, key_cols: list[str]) -> str:
    """The exactly-once upsert statement the Iceberg sink executes per batch.

    Null-safe key equality (``<=>``) so a NULL key component still matches
    its own row on replay; UPDATE+INSERT * makes a replayed batch converge to
    the same table state (same keys re-written with the same values) — the
    MERGE-level analogue of the parquet sink's batch-id fencing.
    """
    if not key_cols:
        raise ValueError("MERGE requires at least one key column")
    on = " AND ".join(f"t.{k} <=> s.{k}" for k in key_cols)
    return (
        f"MERGE INTO {table} t USING {view} s ON {on}\n"
        "WHEN MATCHED THEN UPDATE SET *\n"
        "WHEN NOT MATCHED THEN INSERT *"
    )


def merge_as_delete_insert_sql(table: str, view: str,
                               key_cols: list[str]) -> list[str]:
    """The MERGE's exact upsert semantics as two standard statements, for
    engines without MERGE INTO (the DuckDB equivalence test, plain-JDBC
    fallback sinks): UPDATE SET * on a matched key ≡ delete the matched row
    and insert the source row, so

        DELETE FROM t USING s WHERE <null-safe key equality>;
        INSERT INTO t SELECT * FROM s;

    converges to the same table state as :func:`build_merge_sql` whenever
    the batch has unique keys — which the validation stream guarantees (the
    append-mode outer join emits each key once). Replaying the pair is
    idempotent for the same reason the MERGE is: the second DELETE removes
    exactly what the first INSERT added. Proven against DuckDB in
    tests/test_streaming.py::test_merge_semantics_duckdb_convergence.
    """
    if not key_cols:
        raise ValueError("MERGE requires at least one key column")
    on = " AND ".join(f"{table}.{k} IS NOT DISTINCT FROM s.{k}"
                      for k in key_cols)
    return [
        f"DELETE FROM {table} USING {view} s WHERE {on}",
        f"INSERT INTO {table} SELECT * FROM {view}",
    ]


def merge_into_iceberg(
    batch_df: DataFrame,
    table: str,
    key_cols: list[str],
) -> None:
    """Iceberg ``MERGE INTO`` upsert for one micro-batch (real-cluster path).

    Requires an Iceberg catalog on the SparkSession — no Iceberg runtime jar
    ships in this sandbox, so the statement construction is contract-tested
    (tests/test_streaming.py) and the batch-fenced parquet sink above is the
    executed stand-in; see README "Iceberg surfaces". Keys
    ``(conv_id, turn_idx, window_start)`` per the target pipeline.
    """
    spark = batch_df.sparkSession
    view = f"__merge_src_{abs(hash(table)) % 10_000}"
    batch_df.createOrReplaceTempView(view)
    spark.sql(build_merge_sql(table, view, key_cols))


class TallyForeachBatch:
    """foreachBatch that writes classified rows AND per-window tallies, both
    batch-fenced.

    Because the append-mode outer join emits each (conv_id, turn_idx) exactly
    once across the query's lifetime, summing per-batch partial tallies over
    committed batches yields the global ComparerResult counts — a two-phase
    (per-batch partial → read-side final) aggregation that never holds global
    state on the driver.
    """

    def __init__(self, out_dir: str, *, window_duration: str = "1 hour"):
        self.rows_sink = ExactlyOnceParquetSink(os.path.join(out_dir, "classified"))
        self.tally_sink = ExactlyOnceParquetSink(os.path.join(out_dir, "tallies"))
        self.mismatch_sink = ExactlyOnceParquetSink(os.path.join(out_dir, "mismatches"))
        self.window_duration = window_duration

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        from pyspark.sql import functions as F

        # ONE pass over the (expensive) streamed join output: write it, then
        # derive tallies/mismatches by re-reading the just-written columnar
        # batch — far cheaper than persist() + three more passes through the
        # stateful plan, and the rows write doubles as the count
        written = self.rows_sink(batch_df, batch_id)
        if written is None:
            # rows were committed by a previous attempt — but a crash between
            # the rows commit and the tally/mismatch commits would otherwise
            # lose this batch's downstream outputs forever (report() would
            # silently undercount). Recompute them from the durable rows
            # parquet; if both are already committed this is a no-op return.
            if (self.tally_sink.is_committed(batch_id)
                    and self.mismatch_sink.is_committed(batch_id)):
                return
            written = self.rows_sink.committed_rows(batch_id) or 0
        if written == 0:
            self.tally_sink(None, batch_id)
            self.mismatch_sink(None, batch_id)
            return
        spark = batch_df.sparkSession
        stored = spark.read.parquet(
            *self.rows_sink.batch_paths(batch_id)
        )
        tallies = (
            stored.groupBy(F.window("ts", self.window_duration).alias("w"), "status")
            .agg(F.count("*").alias("n"))
            .select(F.col("w.start").alias("window_start"), "status", "n")
        )
        self.tally_sink(tallies, batch_id)
        self.mismatch_sink(stored.where(F.col("status") != "MATCH"), batch_id)

    def report(self, spark: SparkSession) -> DataFrame | None:
        """Final per-window tallies = sum of committed partials."""
        from pyspark.sql import functions as F

        partials = self.tally_sink.read_committed(spark)
        if partials is None:
            return None
        return partials.groupBy("window_start", "status").agg(F.sum("n").alias("n"))
