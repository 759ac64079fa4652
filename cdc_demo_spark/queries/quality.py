"""Data-quality query surface (expectations over the driver tables)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from cdc_demo_spark.operators import quality as Q
from cdc_demo_spark.queries.registry import register
from cdc_demo_spark.sources.tables import load_table


@register(
    "q_data_quality",
    oracle="""
SELECT count(*) AS n_rows,
       count(CASE WHEN l_quantity IS NULL THEN 1 END) AS l_quantity_not_null,
       count(CASE WHEN NOT (l_discount BETWEEN 0 AND 0.1) OR l_discount IS NULL THEN 1 END)
         AS l_discount_in_range,
       count(CASE WHEN NOT (l_returnflag IN ('A','N','R')) OR l_returnflag IS NULL THEN 1 END)
         AS l_returnflag_one_of,
       count(CASE WHEN NOT regexp_matches(l_linestatus, '^[OF]$') OR l_linestatus IS NULL THEN 1 END)
         AS l_linestatus_matches
FROM lineitem
""",
)
def q_data_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N expectation rules in ONE scan (conditional-count aggregates,
    map-side combined). The rule set doubles as executable documentation
    of the lineitem contract."""
    li = load_table(spark, sf_dir, "lineitem")
    return Q.validate(
        li,
        [
            Q.not_null("l_quantity"),
            Q.in_range("l_discount", 0, 0.1),
            Q.one_of("l_returnflag", ["A", "N", "R"]),
            Q.matches("l_linestatus", "^[OF]$"),
        ],
    )


@register(
    "q_referential_integrity",
    oracle="""
SELECT count(*) AS n_orphans
FROM lineitem WHERE NOT EXISTS (
  SELECT 1 FROM orders WHERE o_orderkey = l_orderkey
)
""",
)
def q_referential_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The generalized 'Clyde' orphan check (reference README.md:100 vs
    :108): facts whose FK misses the dimension, counted via left-anti."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    return Q.referential_violations(li, "l_orderkey", orders, "o_orderkey")
