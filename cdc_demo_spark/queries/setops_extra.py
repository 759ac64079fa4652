"""Multiset set ops, GROUPING SETS, exact percentiles — rounding out
B24/B34 plus distribution statistics."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cdc_demo_spark.queries.registry import register
from cdc_demo_spark.sources.tables import load_table


@register(
    "q_except_all",
    oracle="""
SELECT c_nationkey AS nationkey FROM customer
EXCEPT ALL
SELECT s_nationkey FROM supplier
""",
)
def q_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B34 multiset variant: per-value multiplicities subtract (a nation
    with 30 customers and 2 suppliers keeps 28 rows)."""
    cust = load_table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    supp = load_table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return cust.exceptAll(supp)


@register(
    "q_intersect_all",
    oracle="""
SELECT c_nationkey AS nationkey FROM customer
INTERSECT ALL
SELECT s_nationkey FROM supplier
""",
)
def q_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    supp = load_table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return cust.intersectAll(supp)


@register(
    "q_grouping_sets",
    oracle="""
SELECT o_orderstatus, o_orderpriority, count(*) AS n
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
""",
)
def q_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B24 — arbitrary grouping sets (not expressible as rollup/cube):
    status totals, priority totals, and the grand total in one pass."""
    orders = load_table(spark, sf_dir, "orders")
    orders.createOrReplaceTempView("_orders_gs")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority, count(*) AS n
        FROM _orders_gs
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        """
    )


@register(
    "q_percentiles",
    oracle="""
SELECT l_returnflag,
       quantile_cont(l_extendedprice, 0.5) AS p50,
       quantile_cont(l_extendedprice, 0.9) AS p90,
       quantile_cont(l_extendedprice, 0.99) AS p99
FROM lineitem GROUP BY l_returnflag
""",
)
def q_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles (Spark `percentile` == DuckDB
    `quantile_cont`; both sort exactly — the scale path is
    approx_percentile, same shape, sketch-mergeable)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.expr("percentile(l_extendedprice, 0.5)").alias("p50"),
        F.expr("percentile(l_extendedprice, 0.9)").alias("p90"),
        F.expr("percentile(l_extendedprice, 0.99)").alias("p99"),
    )


@register("q_approx_percentiles")  # no oracle: t-digest/GK sketches are engine-specific
def q_approx_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB percentile path: approx_percentile sketches are
    bounded-size and merge associatively, so the shuffle carries
    sketches, not sorted values (accuracy vs q_percentiles asserted in
    tests/test_queries.py)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.expr("approx_percentile(l_extendedprice, 0.5, 1000)").alias("p50"),
        F.expr("approx_percentile(l_extendedprice, 0.9, 1000)").alias("p90"),
        F.expr("approx_percentile(l_extendedprice, 0.99, 1000)").alias("p99"),
    )
