"""Exactly-once JDBC upsert sink: the reference's *reporting table*
(/root/reference/main.tf:188-215 — BigQuery tables Dataflow MERGEs
into) served to any JDBC warehouse instead of parquet silver.

foreachBatch is at-least-once, so an external sink must make replays
invisible on its own. The standard transactional-sink recipe, done
properly here:

1. **Stage** the collapsed batch (latest image per key, same
   (ts, seq, delete-wins) order as the silver merge) into a per-batch
   staging table via Spark's parallel JDBC writer — executors move the
   data, the driver never holds rows.
2. **One driver-side transaction** applies it: DELETE the staged keys
   from the target, INSERT the staged non-delete images, and record
   (sink_table, batch_id) in a bookkeeping table — all committed
   atomically. A crash anywhere before COMMIT leaves the target and
   the bookkeeping row unwritten (replay redoes cleanly); after
   COMMIT, the replayed batch sees its bookkeeping row and NO-OPS.
   DELETE+INSERT rather than MERGE keeps the SQL portable across
   dialects (Derby here; MySQL/Postgres/BigQuery all accept it).
3. Staging tables drop after commit; a crash leaves an orphan stage —
   garbage, never corruption (the same contract as silver's staged
   bucket dirs).

The target carries (__key, __ts, __seq, op) alongside the payload and
keeps deletes as tombstone rows: a staged row only displaces a target
row it strictly supersedes by (ts, seq) — so LATE batches with stale
events cannot roll the warehouse backwards (B46 holds across batches,
not just within one), and a late old insert after a delete meets the
tombstone and loses.  read_target hides tombstones and bookkeeping
columns.  Tombstone GC is the same watermark compaction policy as
silver (out of band).

Scale shape: per batch, the target-side work is O(|batch keys|)
indexed deletes + inserts inside one transaction; the parallel stage
write is the only data movement. The driver connection carries only
DDL/DML statements, never rows.

Tested end-to-end against embedded Derby (the JDBC engine in this
container's classpath), including replay no-op, crash-before-commit
retry, and convergence vs the replay oracle."""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

BOOKKEEPING = "SPARK_SINK_BATCHES"


class JdbcUpsertSink:
    """Identity = the envelope's serialized ``key`` string (stored as
    ``__key`` in the target), exactly like the silver merge — so
    keyless tables work and a delete (whose ``after`` image is null)
    still knows what to delete.  String comparisons in the transaction
    go through CAST(... AS VARCHAR): Spark's Derby dialect maps
    StringType to CLOB, which Derby can store but not compare — the
    cast is Derby's own documented remedy and a no-op on engines that
    map strings to VARCHAR natively."""

    def __init__(
        self,
        spark: SparkSession,
        url: str,
        table: str,
        driver: str | None = None,
    ) -> None:
        self.spark = spark
        self.url = url
        # The sink's SQL interpolates the table name into DDL/DML
        # strings (staging CREATE, DELETE/INSERT, bookkeeping rows), so
        # the name must be a strict SQL identifier — anything else is a
        # broken-statement or injection hazard (ADVICE r6).
        if not re.fullmatch(r"[A-Za-z_][A-Za-z0-9_]*", table):
            raise ValueError(
                f"sink table name {table!r} is not a plain SQL identifier "
                "([A-Za-z_][A-Za-z0-9_]*); quoted/exotic names are not "
                "supported by this sink's portable-SQL transaction"
            )
        self.table = table.upper()  # unquoted DDL folds to upper (Derby)
        self.driver = driver
        self._ensure_bookkeeping()

    # -- plumbing ------------------------------------------------------

    def _connect(self):
        jvm = self.spark._sc._jvm  # noqa: SLF001
        if self.driver:
            jvm.java.lang.Class.forName(self.driver)
        return jvm.java.sql.DriverManager.getConnection(self.url)

    def _execute(self, conn, sql: str) -> None:
        st = conn.createStatement()
        try:
            st.execute(sql)
        finally:
            st.close()

    def _table_exists(self, conn, name: str) -> bool:
        rs = conn.getMetaData().getTables(None, None, name.upper(), None)
        try:
            return rs.next()
        finally:
            rs.close()

    def _ensure_bookkeeping(self) -> None:
        conn = self._connect()
        try:
            if not self._table_exists(conn, BOOKKEEPING):
                self._execute(
                    conn,
                    f"CREATE TABLE {BOOKKEEPING} ("
                    "sink_table VARCHAR(128) NOT NULL, "
                    "batch_id BIGINT NOT NULL, "
                    "PRIMARY KEY (sink_table, batch_id))",
                )
        finally:
            conn.close()

    def _applied(self, conn, batch_id: int) -> bool:
        st = conn.createStatement()
        try:
            rs = st.executeQuery(
                f"SELECT 1 FROM {BOOKKEEPING} WHERE sink_table = '{self.table}' "
                f"AND batch_id = {int(batch_id)}"
            )
            try:
                return rs.next()
            finally:
                rs.close()
        finally:
            st.close()

    # -- the sink ------------------------------------------------------

    def process_batch(self, batch: DataFrame, batch_id: int) -> None:
        """foreachBatch hook: envelope rows (op/ts/seq/key/after) for
        this sink's table -> exactly-once upsert into the target."""
        conn = self._connect()
        try:
            if self._applied(conn, batch_id):
                return  # replayed batch: already committed, no-op
        finally:
            conn.close()

        # collapse to the winning image per key — same total order as
        # the silver merge (delete wins exact ties)
        w = Window.partitionBy("key").orderBy(
            F.desc("ts"), F.desc("seq"), (F.col("op") == "d").desc()
        )
        latest = (
            batch.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .select(
                "op",
                F.col("key").alias("__key"),
                F.col("ts").alias("__ts"),
                F.col("seq").alias("__seq"),
                "after.*",
            )
        )
        if latest.isEmpty():
            # still record the batch: an empty replay must also no-op
            conn = self._connect()
            try:
                conn.setAutoCommit(False)
                self._execute(
                    conn,
                    f"INSERT INTO {BOOKKEEPING} VALUES ('{self.table}', {int(batch_id)})",
                )
                conn.commit()
            finally:
                conn.close()
            return

        stage = f"{self.table}_STAGE_{int(batch_id)}"  # folds to upper like the target
        # No createTableColumnTypes override: the writer binds NULL
        # strings with the DIALECT's type code (Derby: CLOB), and Derby
        # rejects a CLOB-typed null landing in a VARCHAR column — so the
        # stage keeps the dialect's own string mapping and the SQL below
        # CASTs for comparisons instead (Derby's documented remedy;
        # a no-op on engines that map strings to VARCHAR natively).
        writer = (
            latest.write.format("jdbc")
            .option("url", self.url)
            .option("dbtable", stage)
            .mode("overwrite")
        )
        if self.driver:
            writer = writer.option("driver", self.driver)
        writer.save()
        conn = self._connect()
        try:
            conn.setAutoCommit(False)
            if not self._table_exists(conn, self.table):
                self._execute(
                    conn,
                    f"CREATE TABLE {self.table} AS SELECT * FROM {stage} "
                    "WITH NO DATA",
                )
            t = self.table
            key_eq = (
                f'CAST(s."__key" AS VARCHAR(4096)) = '
                f'CAST({t}."__key" AS VARCHAR(4096))'
            )
            # B46 across batches: a staged row may only displace a
            # target row it genuinely SUPERSEDES — strictly newer
            # (ts, seq), or the exact tie when the staged row is the
            # delete (the same delete-wins rule as the silver merge).
            # Deletes are kept as TOMBSTONE ROWS (null payload) so a
            # later batch carrying an older stale insert meets the
            # tombstone and loses, exactly like silver state.
            newer = (
                f'(s."__ts" > {t}."__ts" OR '
                f'(s."__ts" = {t}."__ts" AND s."__seq" > {t}."__seq") OR '
                f'(s."__ts" = {t}."__ts" AND s."__seq" = {t}."__seq" '
                f"AND CAST(s.\"op\" AS VARCHAR(8)) = 'd'))"
            )
            self._execute(
                conn,
                f"DELETE FROM {t} WHERE EXISTS "
                f"(SELECT 1 FROM {stage} s WHERE {key_eq} AND {newer})",
            )
            # insert winners (tombstones included) only where no
            # surviving — i.e. newer-or-equal — target row remains
            self._execute(
                conn,
                f"INSERT INTO {t} SELECT * FROM {stage} s "
                f"WHERE NOT EXISTS (SELECT 1 FROM {t} WHERE {key_eq})",
            )
            self._execute(
                conn,
                f"INSERT INTO {BOOKKEEPING} VALUES ('{self.table}', {int(batch_id)})",
            )
            conn.commit()  # <- the atomic point: data + marker together
        except Exception:
            conn.rollback()
            raise
        finally:
            conn.close()
        # post-commit cleanup; a crash here leaves an orphan stage table
        conn = self._connect()
        try:
            self._execute(conn, f"DROP TABLE {stage}")
        except Exception:  # noqa: BLE001 — orphan stages are garbage, not corruption
            pass
        finally:
            conn.close()

    def read_target(self) -> DataFrame:
        """The served reporting table (payload columns only)."""
        reader = (
            self.spark.read.format("jdbc")
            .option("url", self.url)
            .option("dbtable", self.table)
            # the tombstone filter must run in Spark, not in the scan:
            # pushed down it becomes a CLOB = CHAR comparison Derby
            # rejects (same CLOB story as the transaction's casts)
            .option("pushDownPredicate", "false")
        )
        if self.driver:
            reader = reader.option("driver", self.driver)
        df = reader.load()
        return df.filter(F.col("op") != "d").drop("op", "__key", "__ts", "__seq")
