"""Scalar function surface: date/string/math/JSON/array/null (B35-B40).

All JVM-side builtins — no Python UDFs anywhere in this module, so every
expression stays inside whole-stage codegen and the columnar scan feeds
it directly.  The JSON and array functions are the ones the driver
tables actually need: ``events.props`` is JSON text, ``embeddings``
carries ``array<float>`` (FIXTURES.md §B).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cdc_demo_spark.queries.registry import register
from cdc_demo_spark.sources.tables import load_table


@register(
    "q_date_functions",
    oracle="""
SELECT o_orderkey,
       year(o_orderdate) AS o_year,
       month(o_orderdate) AS o_month,
       dayofmonth(o_orderdate) AS o_day,
       datediff('day', DATE '2024-01-01', CAST(o_orderdate AS DATE)) AS days_since_2024,
       CAST(o_orderdate AS DATE) + INTERVAL 30 DAY AS due_date
FROM orders
""",
)
def q_date_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B35. Spark datediff(end, start) == DuckDB datediff('day', start,
    end) — argument order differs between the engines; both count date
    boundary crossings."""
    orders = load_table(spark, sf_dir, "orders")
    d = F.col("o_orderdate").cast("date")
    return orders.select(
        "o_orderkey",
        F.year("o_orderdate").cast("long").alias("o_year"),
        F.month("o_orderdate").cast("long").alias("o_month"),
        F.dayofmonth("o_orderdate").cast("long").alias("o_day"),
        F.datediff(d, F.lit("2024-01-01").cast("date")).cast("long").alias("days_since_2024"),
        F.date_add(d, 30).cast("timestamp").alias("due_date"),
    )


@register(
    "q_string_functions",
    oracle="""
SELECT c_custkey,
       upper(c_name) AS name_uc,
       lower(c_mktsegment) AS seg_lc,
       substring(c_name, 1, 8) AS name_prefix,
       length(c_name) AS name_len,
       trim(c_name) AS name_trim,
       concat(c_name, ':', c_mktsegment) AS name_seg,
       CASE WHEN c_name LIKE '%1%' THEN 1 ELSE 0 END AS has_one,
       regexp_extract(c_name, '([0-9]+)', 1) AS digits
FROM customer
""",
)
def q_string_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    return cust.select(
        "c_custkey",
        F.upper("c_name").alias("name_uc"),
        F.lower("c_mktsegment").alias("seg_lc"),
        F.substring("c_name", 1, 8).alias("name_prefix"),
        F.length("c_name").cast("long").alias("name_len"),
        F.trim(F.col("c_name")).alias("name_trim"),
        F.concat(F.col("c_name"), F.lit(":"), F.col("c_mktsegment")).alias("name_seg"),
        F.when(F.col("c_name").like("%1%"), 1).otherwise(0).alias("has_one"),
        F.regexp_extract("c_name", r"([0-9]+)", 1).alias("digits"),
    )


@register(
    "q_math_functions",
    oracle="""
SELECT l_orderkey, l_linenumber,
       round(l_extendedprice * l_discount, 4) AS discount_amt,
       abs(l_discount - 0.05) AS disc_dev,
       CAST(floor(l_quantity) AS BIGINT) AS qty_floor,
       CAST(ceil(l_quantity / 7) AS BIGINT) AS qty_ceil7,
       l_linenumber % 3 AS ln_mod3
FROM lineitem
""",
)
def q_math_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        # round to 4 dp: the product of two 2-dp values has <=4 decimals, so
        # no rounding ties (Spark HALF_UP vs DuckDB's C rounding differ on ties)
        F.round(F.col("l_extendedprice") * F.col("l_discount"), 4).alias("discount_amt"),
        F.abs(F.col("l_discount") - 0.05).alias("disc_dev"),
        F.floor("l_quantity").alias("qty_floor"),
        F.ceil(F.col("l_quantity") / 7).alias("qty_ceil7"),
        (F.col("l_linenumber") % 3).alias("ln_mod3"),
    )


@register(
    "q_json_extract",
    oracle="""
SELECT event_type,
       count(*) AS n,
       CAST(sum(CAST(props->>'k' AS BIGINT)) AS BIGINT) AS sum_k,
       min(CAST(props->>'k' AS BIGINT)) AS min_k,
       max(CAST(props->>'k' AS BIGINT)) AS max_k
FROM events
GROUP BY event_type
""",
)
def q_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B38 — semi-structured payloads. get_json_object is a JVM builtin
    (Jackson under the hood); for repeated multi-field access, from_json
    into a struct column once (see schemas.EVENT_PROPS) beats N path
    extractions — that variant is exercised in streaming tests."""
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(k).alias("sum_k"),
        F.min(k).alias("min_k"),
        F.max(k).alias("max_k"),
    )


@register(
    "q_array_functions",
    oracle="""
SELECT vec_id,
       len(embedding) AS dim,
       round(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE))), 6) AS el_sum,
       round(CAST(embedding[1] AS DOUBLE), 6) AS first_el
FROM embeddings
""",
)
def q_array_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B39 — array ops on the embedding column, all JVM higher-order
    functions (no UDF). Element sum folds left-to-right in both engines,
    so doubles match bit-for-bit; round(…,6) guards display edges."""
    emb = load_table(spark, sf_dir, "embeddings")
    return emb.select(
        "vec_id",
        F.size("embedding").cast("long").alias("dim"),
        F.round(
            F.aggregate(
                F.col("embedding"), F.lit(0.0), lambda acc, x: acc + x.cast("double")
            ),
            6,
        ).alias("el_sum"),
        F.round(F.element_at("embedding", 1).cast("double"), 6).alias("first_el"),
    )


@register(
    "q_null_functions",
    oracle="""
SELECT o_orderkey,
       coalesce(nullif(o_orderstatus, 'O'), 'OPEN') AS status_decoded,
       CASE WHEN nullif(o_orderpriority, '1-URGENT') IS NULL THEN 1 ELSE 0 END AS is_urgent
FROM orders
""",
)
def q_null_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B40 — NULL algebra (everything in the reference's model is
    nullable, SURVEY.md §1.1)."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey",
        F.coalesce(F.nullif(F.col("o_orderstatus"), F.lit("O")), F.lit("OPEN")).alias(
            "status_decoded"
        ),
        F.when(F.nullif(F.col("o_orderpriority"), F.lit("1-URGENT")).isNull(), 1)
        .otherwise(0)
        .alias("is_urgent"),
    )
