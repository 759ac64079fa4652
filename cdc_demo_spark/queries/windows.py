"""Window functions: ranking, lag/lead, frames (SURVEY.md §2 B27-B30).

B27 (latest-row-per-key) is the load-bearing one — it is the dedup
primitive the CDC merge uses (reference merge stage,
/root/reference/README.md:205; our ``streaming/merge.py``).

Scale: every window here partitions by a key (custkey/user_id/brand), so
execution is one hash shuffle + per-partition sort — no global sort, no
driver involvement. Skewed keys are the risk at 100 TB; AQE skew-join
handling does not apply to windows, so key choice matters (user_id and
custkey are high-cardinality, near-uniform here).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cdc_demo_spark.queries.registry import register
from cdc_demo_spark.sources.tables import load_table

DEC = "decimal(38,6)"


@register(
    "q_latest_order_per_customer",
    oracle="""
SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice FROM (
  SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
  FROM orders
) t WHERE rn = 1
""",
)
def q_latest_order_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B27 — latest row per key, the CDC merge primitive (A12). The
    (o_orderkey) tie-break mirrors the envelope's ``seq`` column: total
    order ⇒ deterministic survivor."""
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_orderdate"), F.desc("o_orderkey")
    )
    return (
        orders.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("o_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
    )


@register(
    "q_rank_parts",
    oracle="""
SELECT p_partkey, p_brand, p_size,
       rank() OVER (PARTITION BY p_brand ORDER BY p_size) AS size_rank,
       dense_rank() OVER (PARTITION BY p_brand ORDER BY p_size) AS size_dense_rank
FROM part
""",
)
def q_rank_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rank/dense_rank are tie-stable: equal sort keys get equal ranks,
    so the output is deterministic even with duplicate sizes."""
    part = load_table(spark, sf_dir, "part")
    w = Window.partitionBy("p_brand").orderBy("p_size")
    return part.select(
        "p_partkey",
        "p_brand",
        "p_size",
        F.rank().over(w).cast("long").alias("size_rank"),
        F.dense_rank().over(w).cast("long").alias("size_dense_rank"),
    )


@register(
    "q_lag_lead",
    oracle="""
SELECT user_id, event_id, value,
       value - lag(value) OVER w AS delta_prev,
       lead(event_type) OVER w AS next_type
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
""",
)
def q_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B28 — before/after image reconstruction pattern for the change log
    (SURVEY.md §1.3 envelope carries before/after; lag() recovers the
    same adjacency from a flat event stream)."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "user_id",
        "event_id",
        "value",
        (F.col("value") - F.lag("value").over(w)).alias("delta_prev"),
        F.lead("event_type").over(w).alias("next_type"),
    )


@register(
    "q_running_sum",
    oracle="""
SELECT o_custkey, o_orderkey,
       CAST(sum(CAST(o_totalprice AS DECIMAL(38,6)))
         OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_spend
FROM orders
""",
)
def q_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B29 — frame aggregate. Decimal accumulator keeps the prefix sums
    exact, so every row (not just the final total) hash-matches."""
    orders = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.sum(F.col("o_totalprice").cast(DEC)).over(w).cast("double").alias("running_spend"),
    )


@register(
    "q_ntile_percent_rank",
    oracle="""
SELECT c_custkey,
       ntile(4) OVER (ORDER BY c_acctbal, c_custkey) AS quartile,
       round(percent_rank() OVER (ORDER BY c_acctbal, c_custkey), 6) AS pct_rank
FROM customer
""",
)
def q_ntile_percent_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B30. Note: a global (unpartitioned) window serializes into one
    partition — fine for a 150/sf-row dimension, wrong for facts; at
    scale, bucket first (e.g. ntile within pre-computed value ranges)."""
    cust = load_table(spark, sf_dir, "customer")
    w = Window.orderBy("c_acctbal", "c_custkey")
    return cust.select(
        "c_custkey",
        F.ntile(4).over(w).cast("long").alias("quartile"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
    )


@register(
    "q_window_navigation",
    oracle="""
SELECT o_custkey, o_orderkey,
       first_value(o_orderkey) OVER w AS first_order,
       last_value(o_orderkey) OVER (PARTITION BY o_custkey
                                    ORDER BY o_orderdate, o_orderkey
                                    ROWS BETWEEN UNBOUNDED PRECEDING
                                         AND UNBOUNDED FOLLOWING) AS last_order,
       nth_value(o_orderkey, 2) OVER (PARTITION BY o_custkey
                                      ORDER BY o_orderdate, o_orderkey
                                      ROWS BETWEEN UNBOUNDED PRECEDING
                                           AND UNBOUNDED FOLLOWING) AS second_order,
       round(cume_dist() OVER w, 6) AS cd
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
ORDER BY o_custkey, o_orderkey
""",
)
def q_window_navigation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window navigation family (B27 breadth): first/last/nth value and
    cume_dist per customer order history. last/nth use the FULL frame
    (the default frame stops at CURRENT ROW — the classic last_value
    trap). The (orderdate, orderkey) ordering is unique per customer,
    so every output is deterministic."""
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    wfull = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.first("o_orderkey").over(w).alias("first_order"),
        F.last("o_orderkey").over(wfull).alias("last_order"),
        F.nth_value("o_orderkey", 2).over(wfull).alias("second_order"),
        F.round(F.cume_dist().over(w), 6).alias("cd"),
    ).orderBy("o_custkey", "o_orderkey")


@register(
    "q_range_frame_sum",
    oracle="""
SELECT event_id, user_id, epoch_s,
       CAST(sum(CAST(value AS DECIMAL(38,6)))
            OVER (PARTITION BY user_id ORDER BY epoch_s
                  RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW) AS DOUBLE)
         AS hour_sum
FROM (SELECT event_id, user_id, value,
             CAST(floor(epoch(ts)) AS BIGINT) AS epoch_s FROM events) e
ORDER BY event_id
""",
)
def q_range_frame_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame (value-based, not row-based): per-user trailing-hour
    sum over event time — the only frame type the suite didn't yet
    cover. RANGE semantics pull in ALL peers of the current ordering
    value, so second-resolution ties agg identically in both engines;
    the decimal cast makes the sliding sum order-independent (an
    engine may recompute the frame or subtract-on-evict — fp doubles
    would drift, decimals can't)."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "value", F.col("ts").cast("long").alias("epoch_s")
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("epoch_s")
        .rangeBetween(-3600, Window.currentRow)
    )
    return ev.select(
        "event_id",
        "user_id",
        "epoch_s",
        F.sum(F.col("value").cast(DEC)).over(w).cast("double").alias("hour_sum"),
    ).orderBy("event_id")
