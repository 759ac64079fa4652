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
