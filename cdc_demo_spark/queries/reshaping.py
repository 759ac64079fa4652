"""Pivot/unpivot and subquery shapes — rounding out the reporting
surface (the BigQuery-dataset role, /root/reference/main.tf:188-215)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cdc_demo_spark.queries.registry import register
from cdc_demo_spark.sources.tables import load_table

DEC = "decimal(38,6)"


@register(
    "q_pivot",
    oracle="""
SELECT o_orderpriority,
       count(*) FILTER (WHERE o_orderstatus = 'F') AS f_cnt,
       count(*) FILTER (WHERE o_orderstatus = 'O') AS o_cnt,
       count(*) FILTER (WHERE o_orderstatus = 'P') AS p_cnt
FROM orders GROUP BY o_orderpriority
""",
)
def q_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot = groupBy().pivot().agg() — Spark plans it as conditional
    aggregation (exactly the oracle's FILTER form), one pass, no extra
    shuffle vs a plain groupBy. Pivot values are pinned explicitly:
    leaving them to be discovered adds a whole extra job at scale."""
    orders = load_table(spark, sf_dir, "orders")
    out = (
        orders.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.count(F.lit(1)))
    )
    return out.select(
        "o_orderpriority",
        F.coalesce("F", F.lit(0)).alias("f_cnt"),
        F.coalesce("O", F.lit(0)).alias("o_cnt"),
        F.coalesce("P", F.lit(0)).alias("p_cnt"),
    )


@register(
    "q_unpivot",
    oracle="""
SELECT c_custkey, 'acctbal' AS metric, c_acctbal AS value FROM customer
UNION ALL
SELECT c_custkey, 'nationkey' AS metric, CAST(c_nationkey AS DOUBLE) AS value FROM customer
""",
)
def q_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot (melt): wide → long. Spark's unpivot is a zero-shuffle
    projection (each row expands locally), same as the UNION ALL the
    oracle spells out — but one scan instead of two."""
    cust = load_table(spark, sf_dir, "customer")
    return cust.select(
        "c_custkey",
        F.col("c_acctbal").alias("acctbal"),
        F.col("c_nationkey").cast("double").alias("nationkey"),
    ).unpivot("c_custkey", ["acctbal", "nationkey"], "metric", "value")


@register(
    "q_scalar_subquery",
    oracle="""
SELECT o_orderkey, o_totalprice
FROM orders
WHERE o_totalprice > (SELECT avg(o_totalprice) * 1.5 FROM orders)
""",
)
def q_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uncorrelated scalar subquery: Catalyst evaluates it once as a
    separate tiny job and injects the literal — no per-row recompute.
    avg is FP-order-sensitive, but the 1.5× threshold sits far from any
    data point so the engines' rounding difference can't flip a row."""
    orders = load_table(spark, sf_dir, "orders")
    orders.createOrReplaceTempView("_orders_ss")
    return spark.sql(
        """
        SELECT o_orderkey, o_totalprice FROM _orders_ss
        WHERE o_totalprice > (SELECT avg(o_totalprice) * 1.5 FROM _orders_ss)
        """
    )


@register(
    "q_correlated_exists",
    oracle="""
SELECT p_partkey, p_brand, p_retailprice
FROM part p
WHERE EXISTS (
  SELECT 1 FROM lineitem l
  WHERE l.l_partkey = p.p_partkey AND l.l_quantity > 45
)
""",
)
def q_correlated_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS — Catalyst decorrelates it into a left-semi
    join (same plan as q_semi_join's explicit form; this registers the
    subquery SYNTAX path through the SQL front end)."""
    load_table(spark, sf_dir, "part").createOrReplaceTempView("_part_ce")
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("_lineitem_ce")
    return spark.sql(
        """
        SELECT p_partkey, p_brand, p_retailprice
        FROM _part_ce p
        WHERE EXISTS (
          SELECT 1 FROM _lineitem_ce l
          WHERE l.l_partkey = p.p_partkey AND l.l_quantity > 45
        )
        """
    )
