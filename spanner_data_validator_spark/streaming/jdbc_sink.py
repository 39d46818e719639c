"""Exactly-once JDBC sink: the conflicting-record feed into a live database.

The reference lands mismatch rows in BigQuery via STORAGE_WRITE_API writers
(`JDBCToSpannerDVTWithHash.java:191-246`, SURVEY §2 S7/S8); the portable
analogue is a JDBC table. Plain ``df.write.jdbc(mode="append")`` from
``foreachBatch`` is wrong twice over: a micro-batch replay (sink crash
before the checkpoint commit) double-writes the batch, and a TASK retry
inside one attempt double-writes its partition (each partition commits its
own JDBC transaction — there is no file-committer equivalent to make that
idempotent). This sink closes both holes:

1. executors append the batch to a per-batch STAGING table (task retries
   may duplicate rows there — staging is allowed to be dirty);
2. the driver then promotes staging in ONE transaction:
   ``DELETE`` any rows a previous torn attempt left in the target,
   ``INSERT INTO target SELECT DISTINCT * FROM staging``, and the fence-row
   insert — commit is the single atomic point, so data and fence land
   together and task-retry duplicates are collapsed by DISTINCT;
3. a replayed committed batch is detected via the fence table and skipped;
   its leftover staging table is dropped.

DISTINCT at promote means rows within one batch must be distinct as a set
(true for classify output keyed by row key; add a uid column upstream if
your feed has legitimate duplicate rows).

Executor appends go through Spark's parallel JDBC writer (one connection
per partition); only the tiny promote/fence statements run on the driver
over java.sql via the py4j gateway. Works against any JDBC database with
transactions + INSERT..SELECT; tested live on embedded Derby, including
torn-write and dirty-staging replay convergence.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_DERBY_TABLE_EXISTS = "X0Y32"


class JdbcExactlyOnceSink:
    """``foreachBatch`` callable writing batch-fenced rows to a JDBC table.

    ``table`` must exist with the DataFrame's columns plus
    ``batch_id BIGINT``; the fence table is created on first use.
    """

    def __init__(self, url: str, table: str, *,
                 fence_table: str | None = None):
        self.url = url
        self.table = table
        self.fence_table = fence_table or f"{table}_commits"
        self._fence_ready = False

    # -- tiny driver-side statements over java.sql ------------------------
    def _conn(self, spark: SparkSession):
        return spark.sparkContext._jvm.java.sql.DriverManager.getConnection(
            self.url)

    @staticmethod
    def _sql_state(exc: Exception) -> str | None:
        je = getattr(exc, "java_exception", None)
        try:
            return je.getSQLState() if je is not None else None
        except Exception:  # noqa: BLE001 — not a java.sql exception
            return None

    def _ensure_fence(self, spark: SparkSession) -> None:
        if self._fence_ready:
            return
        conn = self._conn(spark)
        try:
            st = conn.createStatement()
            try:
                st.execute(f"CREATE TABLE {self.fence_table} "
                           "(batch_id BIGINT PRIMARY KEY)")
            except Exception as e:  # noqa: BLE001
                # tolerate ONLY 'table already exists' — anything else
                # (privileges, bad URL) must surface here, not at the first
                # fence insert three steps later
                if self._sql_state(e) != _DERBY_TABLE_EXISTS:
                    raise
            st.close()
        finally:
            conn.close()
        self._fence_ready = True

    def is_committed(self, spark: SparkSession, batch_id: int) -> bool:
        self._ensure_fence(spark)
        conn = self._conn(spark)
        try:
            ps = conn.prepareStatement(
                f"SELECT 1 FROM {self.fence_table} WHERE batch_id = ?")
            ps.setLong(1, batch_id)
            rs = ps.executeQuery()
            hit = rs.next()
            rs.close()
            ps.close()
            return bool(hit)
        finally:
            conn.close()

    def _stage_name(self, batch_id: int) -> str:
        return f"{self.table}_stage_{batch_id}"

    def _drop_if_exists(self, conn, table: str) -> None:
        st = conn.createStatement()
        try:
            st.execute(f"DROP TABLE {table}")
        except Exception:  # noqa: BLE001 — didn't exist
            pass
        finally:
            st.close()

    # -- the foreachBatch protocol ----------------------------------------
    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        stage = self._stage_name(batch_id)
        if self.is_committed(spark, batch_id):
            # replay of a committed batch: clean any leftover staging table
            conn = self._conn(spark)
            try:
                self._drop_if_exists(conn, stage)
            finally:
                conn.close()
            return
        conn = self._conn(spark)
        try:
            self._drop_if_exists(conn, stage)  # dirty staging from a crash
            st = conn.createStatement()
            st.execute(f"CREATE TABLE {stage} AS SELECT * FROM {self.table} "
                       "WITH NO DATA")
            st.close()
        finally:
            conn.close()
        # executors: parallel append to STAGING (task retries may duplicate
        # rows here — promote collapses them)
        (batch_df.withColumn("batch_id", F.lit(batch_id).cast("long"))
         .write.mode("append")
         .format("jdbc").option("url", self.url)
         .option("dbtable", stage).save())
        # driver: atomic promote — cleanup + dedup-insert + fence, ONE commit
        conn = self._conn(spark)
        try:
            conn.setAutoCommit(False)
            ps = conn.prepareStatement(
                f"DELETE FROM {self.table} WHERE batch_id = ?")
            ps.setLong(1, batch_id)
            ps.executeUpdate()
            ps.close()
            st = conn.createStatement()
            st.execute(f"INSERT INTO {self.table} "
                       f"SELECT DISTINCT * FROM {stage}")
            st.close()
            ps = conn.prepareStatement(
                f"INSERT INTO {self.fence_table} VALUES (?)")
            ps.setLong(1, batch_id)
            ps.executeUpdate()
            ps.close()
            conn.commit()
            conn.setAutoCommit(True)
            self._drop_if_exists(conn, stage)
        finally:
            conn.close()

    def read_committed(self, spark: SparkSession) -> DataFrame:
        """Exactly the fenced rows: data semi-joined to the fence table
        (promote is atomic, but the semi-join also hides rows written by a
        foreign/legacy producer that never fenced)."""
        def rd(table: str) -> DataFrame:
            df = (spark.read.format("jdbc").option("url", self.url)
                  .option("dbtable", table).load())
            # databases that fold unquoted identifiers to upper case (Derby,
            # Oracle, DB2) would hand back K/STATUS/BATCH_ID — normalize so
            # readers see the columns they wrote
            return df.toDF(*[c.lower() for c in df.columns])
        self._ensure_fence(spark)
        return rd(self.table).join(
            rd(self.fence_table), on="batch_id", how="left_semi")


class JdbcAtomicMultiSink:
    """One fence row covers N JDBC tables — the single-transaction
    two-table upgrade of :class:`JdbcExactlyOnceSink` (VERDICT r4 #5).

    The reference writes its report and conflicting-rows feeds as two
    independent sinks (JDBCToSpannerDVTWithHash.java:393-415, 468-469);
    fencing each separately leaves a crash window where the report is
    visible but its conflict rows are not. Here each table's batch is
    staged by the executors (parallel JDBC append; task retries may dirty
    staging), then the driver promotes EVERY table + inserts the single
    fence row in ONE transaction — commit is the only publication point,
    so a crash anywhere before it publishes nothing to any table, and the
    replay re-stages and commits everything. ``tables`` must exist with
    their frames' columns plus ``batch_id BIGINT``.
    """

    def __init__(self, url: str, tables: list[str], *,
                 fence_table: str | None = None):
        if not tables:
            raise ValueError("at least one table is required")
        self.url = url
        self.tables = list(tables)
        # fences are per-SINK here, not per-table: one ledger, one truth
        self._fence = JdbcExactlyOnceSink(
            url, tables[0], fence_table=fence_table or f"{tables[0]}_commits")

    @property
    def fence_table(self) -> str:
        return self._fence.fence_table

    def is_committed(self, spark: SparkSession, batch_id: int) -> bool:
        return self._fence.is_committed(spark, batch_id)

    def _stage_name(self, table: str, batch_id: int) -> str:
        return f"{table}_stage_{batch_id}"

    def _stage(self, spark: SparkSession, batch_id: int,
               frames: dict[str, DataFrame]) -> None:
        conn = self._fence._conn(spark)
        try:
            for table in frames:
                stage = self._stage_name(table, batch_id)
                self._fence._drop_if_exists(conn, stage)  # crash leftovers
                st = conn.createStatement()
                st.execute(f"CREATE TABLE {stage} AS SELECT * FROM {table} "
                           "WITH NO DATA")
                st.close()
        finally:
            conn.close()
        for table, df in frames.items():
            (df.withColumn("batch_id", F.lit(batch_id).cast("long"))
             .write.mode("append")
             .format("jdbc").option("url", self.url)
             .option("dbtable", self._stage_name(table, batch_id)).save())

    def _promote(self, spark: SparkSession, batch_id: int,
                 tables: list[str]) -> None:
        """ALL tables' promotes + the fence insert under one commit."""
        conn = self._fence._conn(spark)
        try:
            conn.setAutoCommit(False)
            for table in tables:
                ps = conn.prepareStatement(
                    f"DELETE FROM {table} WHERE batch_id = ?")
                ps.setLong(1, batch_id)
                ps.executeUpdate()
                ps.close()
                st = conn.createStatement()
                st.execute(f"INSERT INTO {table} SELECT DISTINCT * FROM "
                           f"{self._stage_name(table, batch_id)}")
                st.close()
            ps = conn.prepareStatement(
                f"INSERT INTO {self.fence_table} VALUES (?)")
            ps.setLong(1, batch_id)
            ps.executeUpdate()
            ps.close()
            conn.commit()  # the ONE atomic publication point, all tables
            conn.setAutoCommit(True)
            for table in tables:
                self._fence._drop_if_exists(
                    conn, self._stage_name(table, batch_id))
        finally:
            conn.close()

    def write_batch(self, spark: SparkSession, batch_id: int,
                    frames: dict[str, DataFrame]) -> None:
        unknown = set(frames) - set(self.tables)
        if unknown:
            raise ValueError(f"unknown tables: {sorted(unknown)}")
        if self.is_committed(spark, batch_id):
            conn = self._fence._conn(spark)
            try:
                for table in self.tables:
                    self._fence._drop_if_exists(
                        conn, self._stage_name(table, batch_id))
            finally:
                conn.close()
            return
        self._stage(spark, batch_id, frames)
        self._promote(spark, batch_id, sorted(frames))

    def read_committed(self, spark: SparkSession, table: str) -> DataFrame:
        if table not in self.tables:
            raise ValueError(f"unknown table: {table}")
        reader = JdbcExactlyOnceSink(self.url, table,
                                     fence_table=self.fence_table)
        return reader.read_committed(spark)


def shutdown_embedded_derby(spark: SparkSession, url: str) -> None:
    """Shut down one embedded Derby database (``jdbc:derby:<path>``) so a
    long-lived driver JVM doesn't accumulate booted databases (page cache,
    file handles, background threads per DB). Derby signals a SUCCESSFUL
    single-DB shutdown with SQLState 08006 — that 'error' is expected."""
    base = url.split(";")[0]
    jvm = spark.sparkContext._jvm
    try:
        jvm.java.sql.DriverManager.getConnection(base + ";shutdown=true")
    except Exception:  # noqa: BLE001 — 08006 on success, by Derby contract
        pass
