"""CDC-flavored batch queries: as-of join (B19), latest-image (A12/B27),
multimodal join (B54)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cdc_demo_spark.operators.asof import asof_join
from cdc_demo_spark.queries.registry import register
from cdc_demo_spark.sources.tables import load_table


@register(
    "q_asof_join",
    oracle="""
SELECT event_id, user_id, o_orderkey, o_totalprice FROM (
  SELECT e.event_id, e.user_id, o.o_orderkey, o.o_totalprice,
         row_number() OVER (PARTITION BY e.event_id
                            ORDER BY o.o_orderdate DESC, o.o_orderkey DESC) AS rn
  FROM events e
  LEFT JOIN orders o ON o.o_custkey = e.user_id AND o.o_orderdate <= e.ts
) t WHERE rn = 1
""",
)
def q_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Most recent order at-or-before each event, per user — CDC time
    travel. Implemented union+window (one shuffle of |L|+|R|, no pair
    materialization); the oracle is the naive join+rank formulation, so
    this doubles as a differential test of the two strategies."""
    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    orders = load_table(spark, sf_dir, "orders")
    return asof_join(
        ev,
        orders.select(F.col("o_custkey").alias("user_id"), "o_orderdate", "o_orderkey", "o_totalprice"),
        on="user_id",
        left_ts="ts",
        right_ts="o_orderdate",
        right_cols=["o_orderkey", "o_totalprice"],
        right_seq="o_orderkey",
    ).select("event_id", "user_id", "o_orderkey", "o_totalprice")


@register(
    "q_latest_event_per_user",
    oracle="""
SELECT user_id, event_id, event_type, value FROM (
  SELECT user_id, event_id, event_type, value,
         row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
) t WHERE rn = 1
""",
)
def q_latest_event_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Latest-image materialization, batch form — the exact dedup rule
    the streaming merge applies per micro-batch (streaming/merge.py)."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_id", "event_type", "value")
    )


@register(
    "q_multimodal_join",
    oracle="""
SELECT d.doc_id, d.lang, d.n_chars, len(e.embedding) AS dim, e.label
FROM documents d JOIN embeddings e ON e.vec_id = d.doc_id
WHERE d.n_chars > 200
""",
)
def q_multimodal_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B54 — text ⋈ embedding modality join on doc_id=vec_id. Both sides
    co-partition on the same key at scale (bucketed layout); here the
    filter pushes to the documents scan before the join."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("n_chars") > 200)
    emb = load_table(spark, sf_dir, "embeddings")
    return docs.join(emb, docs.doc_id == emb.vec_id).select(
        "doc_id", "lang", "n_chars", F.size("embedding").cast("long").alias("dim"), "label"
    )
