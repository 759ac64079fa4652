"""The CDC merge: latest-image materialization with (ts, seq) ordering,
delete handling, and late/out-of-order protection (A12, B45, B46).

This is the stage the reference's pipeline declares but never got
working (/root/reference/README.md:8 "the dataflow template fails";
:205 is the MERGE parameter).  Semantics implemented here:

- Winner per key = max (ts, seq) across existing silver state AND the
  incoming batch — so an *older* redelivered/late event can never
  overwrite newer state (B46), regardless of arrival order.
- Delete wins and persists as a tombstone hidden from readers (late
  older events can't resurrect the key); a later event with higher
  (ts,seq) legitimately re-inserts; tombstones GC at the watermark.
- Keyless tables: key = whole-row image (envelope.key_expr), so
  updates model as delete+insert — MySQL binlog row semantics.

Silver physical layout: payload columns + __op/__ts/__seq metadata,
Parquet. The merge is expressed as union + window-rank — the same
latest-per-key primitive as q_latest_order_per_customer (B27), which
Delta/Iceberg MERGE INTO would also compile to. At 100 TB you'd
partition silver by key-hash bucket and rewrite only buckets containing
batch keys (the helper computes touched buckets for that); micro-batch
cost is then proportional to the delta, not the table.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

META_COLS = ("__key", "__op", "__ts", "__seq")


def latest_image(envelopes: DataFrame) -> DataFrame:
    """Collapse an envelope batch to one winning event per (table, key):
    max (ts, seq); ties impossible because seq is a total order per
    source log position."""
    w = Window.partitionBy("table", "key").orderBy(F.desc("ts"), F.desc("seq"))
    return envelopes.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1).drop("_rn")


def _as_state(envelopes: DataFrame) -> DataFrame:
    """Envelope rows -> silver-state shape (payload.* + metadata)."""
    return envelopes.select(
        F.col("key").alias("__key"),
        F.col("op").alias("__op"),
        F.col("ts").alias("__ts"),
        F.col("seq").alias("__seq"),
        F.col("after").alias("__row"),
    )


def merge_into_silver(
    spark: SparkSession,
    batch: DataFrame,
    silver_path: str,
    table: str,
    num_buckets: int = 8,
) -> None:
    """Merge one micro-batch of envelope rows for `table` into the silver
    Parquet at `silver_path` — SELECTIVELY: only key-hash buckets that
    contain batch keys are read, merged, and rewritten.

    Plain-Parquet upsert strategy (no Delta in this environment). Merge
    cost is O(|touched buckets|), not O(|state|): with enough buckets a
    micro-batch touching k keys rewrites ~k buckets' worth of data while
    every other partition's files are left physically untouched (tested
    by inode comparison). This is the same idea as Delta/Iceberg MERGE
    file-skipping — bucket pruning via the partition column stands in
    for the manifest. The tmp-write + directory swap stands in for a
    metadata commit; on an object store you'd commit a manifest instead.
    """
    batch = batch.filter(F.col("table") == table)
    # No separate latest_image pass: the merge window below applies the
    # same (ts, seq) total order to state ∪ batch, so pre-collapsing the
    # batch would just be a second window over the same data. (ts, seq)
    # duplicates are redeliveries of the SAME event — identical rows —
    # so the row_number tie among them cannot change the result.
    incoming = _as_state(batch).withColumn(
        "__bucket", _bucket_of("__key", num_buckets)
    )
    incoming = incoming.cache()  # two consumers: touched-bucket list + merge
    touched = [r["__bucket"] for r in incoming.select("__bucket").distinct().collect()]
    if not touched:
        incoming.unpersist()
        return

    current = read_silver_state(spark, silver_path, buckets=touched)
    merged = incoming if current is None else current.unionByName(incoming)

    # Deletes stay in state as TOMBSTONES (__op='d', null row): dropping
    # them would let a late-arriving older insert in a LATER batch win
    # against nothing and resurrect the key (violates B46). Readers
    # filter tombstones; GC: compact ones older than the watermark.
    w = Window.partitionBy("__key").orderBy(F.desc("__ts"), F.desc("__seq"))
    new_state = (
        merged.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )

    # Can't overwrite partitions while reading them: stage touched
    # buckets to .tmp, then swap ONLY those bucket directories.
    tmp = silver_path + ".tmp"
    new_state.write.mode("overwrite").partitionBy("__bucket").parquet(tmp)
    incoming.unpersist()
    os.makedirs(silver_path, exist_ok=True)
    for b in touched:
        dst = os.path.join(silver_path, f"__bucket={b}")
        src = os.path.join(tmp, f"__bucket={b}")
        if os.path.exists(dst):
            shutil.rmtree(dst)
        if os.path.exists(src):  # bucket may have become empty (all GC'd)
            os.rename(src, dst)
    shutil.rmtree(tmp)
    # partition discovery needs a _SUCCESS-independent marker on first write
    open(os.path.join(silver_path, "_engine_state"), "a").close()


def _bucket_of(col: str, num_buckets: int) -> F.Column:
    return F.pmod(F.xxhash64(col), F.lit(num_buckets)).cast("int")


def read_silver_state(
    spark: SparkSession, silver_path: str, buckets: list[int] | None = None
) -> DataFrame | None:
    """Current state; with `buckets`, reads only those partitions
    (partition pruning — the scan never opens other buckets' files)."""
    if not os.path.exists(silver_path):
        return None
    try:
        df = spark.read.parquet(silver_path)
        if "__bucket" not in df.columns:  # empty/first-batch dir
            return None
    except Exception:  # noqa: BLE001  (empty dir on first batch)
        return None
    if buckets is not None:
        df = df.filter(F.col("__bucket").isin(*[int(b) for b in buckets]))
    return df


def read_silver(spark: SparkSession, silver_path: str) -> DataFrame:
    """The queryable replica: payload columns only, tombstones hidden."""
    state = read_silver_state(spark, silver_path)
    if state is None:
        raise FileNotFoundError(silver_path)
    return state.filter(F.col("__op") != "d").select("__row.*")


def compact_tombstones(
    spark: SparkSession, silver_path: str, watermark_ts, num_buckets: int = 8
) -> None:
    """GC tombstones older than the watermark: no event at-or-below the
    watermark can still arrive, so those deletes can be physically
    dropped (bounds state size, the same role watermarks play for
    streaming state stores)."""
    state = read_silver_state(spark, silver_path)
    if state is None:
        return
    kept = state.filter(~((F.col("__op") == "d") & (F.col("__ts") <= F.lit(watermark_ts)))).withColumn(
        "__bucket", _bucket_of("__key", num_buckets)
    )
    tmp = silver_path + ".tmp"
    kept.write.mode("overwrite").partitionBy("__bucket").parquet(tmp)
    shutil.rmtree(silver_path)
    os.rename(tmp, silver_path)
    open(os.path.join(silver_path, "_engine_state"), "a").close()


# --------------------------------------------------------------------------
# Test oracle: single-threaded dict replay (SURVEY.md §5)
# --------------------------------------------------------------------------


def replay_oracle(events: list[dict]) -> dict[str, dict]:
    """Sequentially apply envelope events in (ts, seq) order to a dict —
    the ground truth the distributed merge must converge to."""
    state: dict[str, dict] = {}
    for ev in sorted(events, key=lambda e: (e["ts"], e["seq"])):
        if ev["op"] == "d":
            state.pop(ev["key"], None)
        else:
            state[ev["key"]] = ev["after"]
    return state
