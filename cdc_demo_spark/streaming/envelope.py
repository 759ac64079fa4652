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
    df: DataFrame, table: str, key_cols: list[str] | None, ts_col=None, start_seq: int = 0
) -> DataFrame:
    """A6 — emit a full table state as 'r' (read/snapshot) envelope rows,
    the Datastream "backfill" (/root/reference/README.md:126-168).

    seq is CONTIGUOUS: start_seq + row_number over a deterministic
    order (the serialized row image), so the highest snapshot seq is
    provably start_seq + count - 1 and a caller can guarantee the whole
    snapshot orders below the binlog tail's first seq. (The previous
    monotonically_increasing_id scheme jumped by partition_id<<33 —
    billions — silently breaking that guarantee on multi-partition
    input.) The global sort runs once at snapshot time; at very large
    scale swap in rdd.zipWithIndex, which is distributed and needs no
    sort, at the cost of partition-order determinism."""
    payload = F.struct(*[F.col(c) for c in df.columns])
    from pyspark.sql import Window

    w = Window.orderBy(F.to_json(payload))
    out = df.select(
        F.lit("r").alias("op"),
        (ts_col if ts_col is not None else F.lit("1970-01-01 00:00:00").cast("timestamp")).alias("ts"),
        (F.lit(start_seq) + F.row_number().over(w) - 1).cast("long").alias("seq"),
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
