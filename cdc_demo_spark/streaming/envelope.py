"""CDC envelope construction & encoding (SURVEY.md §1.3).

The reference delegates the change-event format to Datastream
(/root/reference/README.md:168 Avro, :202 json); the envelope here is
our own Debezium/Datastream-style design: op, commit ts, monotonic seq,
table, serialized key, before/after row images.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from cdc_demo_spark.schemas import envelope_schema  # noqa: F401  (re-export)

OPS = ("c", "u", "d", "r")


def key_expr(key_cols: list[str] | None, payload_col: str = "after") -> F.Column:
    """Serialized key tuple. For keyless tables (the reference's pet/event
    have no PK, /root/reference/menagerie-db/cr_pet_tbl.sql:5-13) the key
    is the whole row image — updates become delete+insert, matching
    MySQL binlog row semantics."""
    src = F.coalesce(F.col(payload_col), F.col("before"))
    if key_cols:
        parts = [src[c].cast("string") for c in key_cols]
    else:
        parts = [F.to_json(src)]
    return F.concat_ws("\x1f", *[F.coalesce(p, F.lit("\x00")) for p in parts])


def snapshot_as_events(
    df: DataFrame,
    table: str,
    key_cols: list[str] | None,
    ts_col=None,
    start_seq: int = 0,
    seq_mode: str = "auto",
    sorted_max_partitions: int = 4,
) -> DataFrame:
    """A6 — emit a full table state as 'r' (read/snapshot) envelope rows,
    the Datastream "backfill" (/root/reference/README.md:126-168).

    seq is CONTIGUOUS: start_seq .. start_seq + count - 1, so the
    highest snapshot seq is provable and a caller can guarantee the
    whole snapshot orders below the binlog tail's first seq.  (The old
    monotonically_increasing_id scheme jumped by partition_id<<33 —
    billions — silently breaking that guarantee on multi-partition
    input.)  Two assignment strategies (VERDICT r14 #6):

    - ``seq_mode="sorted"``: start_seq + row_number over ONE global
      sort of the serialized row image — fully deterministic
      (partitioning-independent), but the window is single-task:
      right for small/dimension snapshots only.
    - ``seq_mode="distributed"``: per-partition local ordering.  One
      bounded job counts rows per input partition (collect = one row
      per partition), the cumulative offsets broadcast-join back, and
      row_number runs PARTITIONED by spark_partition_id — every task
      sorts only its own slice, no single-task stage anywhere.  seq is
      still contiguous (offsets + local ranks tile 0..n-1 exactly);
      determinism is modulo the INPUT PARTITIONING (stable for
      deterministic scans — parquet/JDBC — across runs; persist first
      or use "sorted" if the upstream partitioning is not).  Merge
      convergence never depends on which permutation the snapshot got:
      'r' rows of distinct keys commute, and keyless duplicate rows
      share identical images (equality pinned in
      tests/test_snapshot_replication.py).
    - ``seq_mode="auto"`` (default): "sorted" for snapshots of at most
      ``sorted_max_partitions`` partitions (the deterministic
      small-snapshot default), "distributed" above it — so a
      multi-partition initial snapshot never funnels through a
      single-task sort."""
    if seq_mode not in ("auto", "sorted", "distributed"):
        raise ValueError(f"unknown seq_mode {seq_mode!r}")
    if seq_mode == "auto":
        n_parts = df.rdd.getNumPartitions()
        seq_mode = "sorted" if n_parts <= sorted_max_partitions else "distributed"

    payload = F.struct(*[F.col(c) for c in df.columns])
    from pyspark.sql import Window

    if seq_mode == "sorted":
        w = Window.orderBy(F.to_json(payload))
        seq = (F.lit(start_seq) + F.row_number().over(w) - 1).cast("long")
        base = df
    else:
        base = df.withColumn("__pid", F.spark_partition_id())
        counts = sorted(
            (r["__pid"], r["c"])
            for r in base.groupBy("__pid").agg(F.count(F.lit(1)).alias("c")).collect()
        )
        offsets, acc = [], 0
        for pid, c in counts:
            offsets.append((pid, acc))
            acc += c
        off_df = base.sparkSession.createDataFrame(
            offsets or [(0, 0)], "__pid int, __offset long"
        )
        base = base.join(F.broadcast(off_df), "__pid")
        w = Window.partitionBy("__pid").orderBy(F.to_json(payload))
        seq = (
            F.lit(start_seq) + F.col("__offset") + F.row_number().over(w) - 1
        ).cast("long")

    out = base.select(
        F.lit("r").alias("op"),
        (ts_col if ts_col is not None else F.lit("1970-01-01 00:00:00").cast("timestamp")).alias("ts"),
        seq.alias("seq"),
        F.lit(table).alias("table"),
        F.lit(None).cast("string").alias("key"),
        F.lit(None).cast(payload_type(df.schema)).alias("before"),
        payload.alias("after"),
    )
    return out.withColumn("key", key_expr(key_cols))


def payload_type(schema: StructType) -> StructType:
    return schema


# --------------------------------------------------------------------------
# A7 as a CONSUMED CONTRACT: plugging a real binlog tail into the engine
# --------------------------------------------------------------------------

def debezium_value_schema(payload: StructType) -> StructType:
    """The Debezium MySQL connector's public message-value shape (the
    fields this adapter consumes; Debezium emits more — transaction
    block, schema block — which PERMISSIVE parsing ignores):

        {"payload": {
            "before": {...}|null, "after": {...}|null,
            "op": "c"|"u"|"d"|"r",
            "ts_ms": 1711111111111,
            "source": {"table": "pet",
                        "file": "mysql-bin.000003", "pos": 4711, ...}}}

    This is the published wire format of the standard open-source
    binlog reader for exactly the MySQL setup the reference provisions
    (binary_log_enabled + replication grants,
    /root/reference/main.tf:105, README.md:115-117). The driver
    contract (BASELINE.json) scopes live capture itself out of the
    engine; this schema + ``from_debezium`` close the gap as a
    consumed contract instead of a non-goal: anyone running Debezium
    (or Datastream, whose envelope is the same shape) against the
    reference's MySQL lands files our pipeline replicates."""
    from pyspark.sql.types import LongType, StringType, StructField

    source = StructType(
        [
            StructField("table", StringType(), True),
            StructField("file", StringType(), True),
            StructField("pos", LongType(), True),
        ]
    )
    inner = StructType(
        [
            StructField("before", payload, True),
            StructField("after", payload, True),
            StructField("op", StringType(), True),
            StructField("ts_ms", LongType(), True),
            StructField("source", source, True),
        ]
    )
    return StructType([StructField("payload", inner, True)])


def from_debezium(
    raw: DataFrame,
    payload: StructType,
    key_cols: list[str] | None,
    value_col: str = "value",
) -> DataFrame:
    """Debezium-shaped JSON strings -> this engine's envelope rows —
    the adapter that makes the reference's one out-of-engine stage
    (A7, the binlog tail) pluggable end-to-end.

    Field mapping (everything downstream — dedup, watermark, merge —
    is unchanged; the adapter is a pure projection):

    - ``op``: Debezium's c/u/d/r are ALREADY this envelope's op codes
      (SURVEY.md §1.3 chose them for this reason).
    - ``ts``: ``ts_ms`` (source commit millis) -> timestamp.
    - ``seq``: the binlog coordinate (file, pos) packed into one long:
      ``file_index * 2^40 + pos``.  A MySQL binlog file is capped at
      max_binlog_size = 1 GiB << 2^40, so the pack is collision-free
      and orders exactly as (file, pos) does — the server's total
      order that the merge's (ts, seq) winner rule needs; ts_ms alone
      is millisecond-coarse and ties under load.
    - ``key``: key_cols from the row image (whole-row for keyless
      tables), via the same ``key_expr`` every other source uses.

    **Nothing is silently dropped.** Every input row comes back with a
    ``_corrupt`` column — null for rows that mapped cleanly, the raw
    message string otherwise — exactly the contract the pipelines'
    JSON/Avro sources already speak, so callers route bad rows to the
    DLQ (A13) with the same ``filter(_corrupt.isNotNull())`` split.
    A row is corrupt when (a) ``from_json`` could not parse it, (b)
    ``op`` is outside c/u/d/r (e.g. Debezium's 't' truncate — a
    statement-level op this row-image envelope cannot represent; it
    must surface for an operator, not vanish), or (c) the binlog
    coordinate (source.file/pos) is missing or unparseable — a null
    ``seq`` would compare EQUAL under ``dropDuplicates([table, key,
    seq])`` and collapse distinct events, so it fails loudly per-row
    instead of guessing a ts-only order."""
    m = raw.select(
        F.col(value_col).cast("string").alias("_raw"),
        F.from_json(F.col(value_col), debezium_value_schema(payload)).alias("v"),
    ).select("_raw", "v.payload.*")
    # try_cast: a file name with no digits extracts "" — under ANSI
    # that cast must yield null (-> _corrupt), not kill the stream
    file_idx = F.regexp_extract(F.col("source.file"), r"(\d+)$", 1).try_cast("long")
    seq = (file_idx * F.lit(1 << 40) + F.col("source.pos")).cast("long")
    ok = F.col("op").isin(*OPS) & seq.isNotNull()
    out = m.select(
        F.col("op"),
        F.timestamp_millis(F.col("ts_ms")).alias("ts"),
        seq.alias("seq"),
        F.col("source.table").alias("table"),
        F.lit(None).cast("string").alias("key"),
        F.col("before"),
        F.col("after"),
        F.when(ok, F.lit(None).cast("string")).otherwise(F.col("_raw")).alias(
            "_corrupt"
        ),
    )
    return out.withColumn("key", key_expr(key_cols))
