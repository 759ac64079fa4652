"""Batch relational surface: scans, filters, joins, aggregates, set ops.

Covers SURVEY.md §2 B8-B26, B31-B34 — the query surface the reference
outsources to MySQL/BigQuery (it provisions both engines,
/root/reference/main.tf:79 and :188-215, but ships no query code of its
own; the menagerie dataset exists to teach exactly this surface,
/root/reference/menagerie-db/README.txt:1-3).

Every query here is declarative DataFrame code — Catalyst supplies
pushdown, pruning, join selection, partial aggregation; we only add
explicit ``broadcast()`` hints on dimension tables (at 100 TB the fact
tables shuffle on join keys; dims stay broadcast).

Determinism rules for the DuckDB differential check are in
``registry.py`` (decimal sums, shared aliases, unique sort keys).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cdc_demo_spark.queries.registry import register
from cdc_demo_spark.sources.tables import load_table

DEC = "decimal(38,6)"


def _dsum(col, alias):  # exact order-independent sum, surfaced as double
    return F.sum(col.cast(DEC)).cast("double").alias(alias)


# --------------------------------------------------------------------------
# B13/B16/B21 — the flagship: multi-way join + aggregate with broadcast dims
# --------------------------------------------------------------------------


@register(
    "q_revenue_by_nation",
    oracle="""
SELECT r_name, n_name,
       CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))) AS DOUBLE) AS revenue,
       count(*) AS n_items
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
GROUP BY r_name, n_name
""",
)
def q_revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue per region/nation. lineitem⋈orders shuffles on orderkey;
    customer joins on custkey; nation/region broadcast (B16). At 100 TB
    the two fact joins are the only shuffles — dims never move."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nation = F.broadcast(load_table(spark, sf_dir, "nation"))
    region = F.broadcast(load_table(spark, sf_dir, "region"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(nation, cust.c_nationkey == nation.n_nationkey)
        .join(region, nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            _dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


# --------------------------------------------------------------------------
# B21/B25 — TPC-H Q1-style pricing summary (grouped aggregate + HAVING)
# --------------------------------------------------------------------------


@register(
    "q_pricing_summary",
    oracle="""
SELECT l_returnflag, l_linestatus,
       CAST(sum(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS sum_qty,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(38,6))) AS DOUBLE) AS sum_base_price,
       CAST(sum(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(38,6))) AS DOUBLE) AS sum_charge,
       CAST(sum(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) / count(*) AS avg_qty,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-01 00:00:00'
GROUP BY l_returnflag, l_linestatus
""",
)
def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map-side partial aggregation handles the heavy lifting; the shuffle
    carries only (flag,status) groups — constant-size at any SF."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-01 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            _dsum(F.col("l_quantity"), "sum_qty"),
            _dsum(F.col("l_extendedprice"), "sum_base_price"),
            _dsum(
                F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax")),
                "sum_charge",
            ),
            (F.sum(F.col("l_quantity").cast(DEC)).cast("double") / F.count(F.lit(1))).alias(
                "avg_qty"
            ),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@register(
    "q_having",
    oracle="""
SELECT c_mktsegment, count(*) AS n_customers,
       CAST(sum(CAST(c_acctbal AS DECIMAL(38,6))) AS DOUBLE) AS total_bal
FROM customer
GROUP BY c_mktsegment
HAVING count(*) > 5
""",
)
def q_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    return (
        cust.groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            _dsum(F.col("c_acctbal"), "total_bal"),
        )
        .filter(F.col("n_customers") > 5)
    )


# --------------------------------------------------------------------------
# B9/B11/B12 — projection, computed columns, CAST, CASE WHEN
# --------------------------------------------------------------------------


@register(
    "q_project_compute",
    oracle="""
SELECT p_partkey,
       upper(p_brand) AS brand_uc,
       CAST(p_size AS BIGINT) AS size_l,
       round(p_retailprice * 1.1, 4) AS marked_up,
       p_name || '/' || p_type AS name_type
FROM part
""",
)
def q_project_compute(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.upper("p_brand").alias("brand_uc"),
        F.col("p_size").cast("long").alias("size_l"),
        F.round(F.col("p_retailprice") * 1.1, 4).alias("marked_up"),
        F.concat_ws("/", "p_name", "p_type").alias("name_type"),
    )


@register(
    "q_case_when",
    oracle="""
SELECT CASE WHEN c_acctbal < 0 THEN 'negative'
            WHEN c_acctbal < 5000 THEN 'mid'
            ELSE 'high' END AS bal_band,
       count(*) AS n,
       CAST(sum(CAST(c_acctbal AS DECIMAL(38,6))) AS DOUBLE) AS total
FROM customer
GROUP BY 1
""",
)
def q_case_when(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    band = (
        F.when(F.col("c_acctbal") < 0, "negative")
        .when(F.col("c_acctbal") < 5000, "mid")
        .otherwise("high")
        .alias("bal_band")
    )
    return cust.groupBy(band).agg(
        F.count(F.lit(1)).alias("n"), _dsum(F.col("c_acctbal"), "total")
    )


# --------------------------------------------------------------------------
# B10 — predicate zoo: BETWEEN, IN, LIKE, IS NULL, AND/OR/NOT
# --------------------------------------------------------------------------


@register(
    "q_filter_predicates",
    oracle="""
SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag, l_discount
FROM lineitem
WHERE l_quantity BETWEEN 10 AND 40
  AND l_returnflag IN ('A', 'R')
  AND l_linestatus IS NOT NULL
  AND (l_discount > 0.05 OR NOT (l_tax > 0.04))
  AND l_returnflag LIKE '_%'
""",
)
def q_filter_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All predicates are Catalyst-native → pushed to the parquet scan
    (PushedFilters in .explain); no Python evaluates per-row."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.filter(
        F.col("l_quantity").between(10, 40)
        & F.col("l_returnflag").isin("A", "R")
        & F.col("l_linestatus").isNotNull()
        & ((F.col("l_discount") > 0.05) | ~(F.col("l_tax") > 0.04))
        & F.col("l_returnflag").like("_%")
    ).select("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag", "l_discount")


# --------------------------------------------------------------------------
# B14/B15 — outer / semi / anti joins (the 'Clyde' dangling-row family,
# /root/reference/README.md:100 vs :108)
# --------------------------------------------------------------------------


@register(
    "q_outer_join",
    oracle="""
SELECT c_custkey, c_name, count(o_orderkey) AS n_orders,
       CAST(coalesce(sum(CAST(o_totalprice AS DECIMAL(38,6))), 0) AS DOUBLE) AS total_spent
FROM customer
LEFT JOIN orders ON o_custkey = c_custkey
GROUP BY c_custkey, c_name
""",
)
def q_outer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer keeps order-less customers (NULL-extended) — count()
    over the null key yields 0, as in the oracle."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return (
        cust.join(orders, orders.o_custkey == cust.c_custkey, "left")
        .groupBy("c_custkey", "c_name")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.coalesce(F.sum(F.col("o_totalprice").cast(DEC)), F.lit(0).cast(DEC))
            .cast("double")
            .alias("total_spent"),
        )
    )


@register(
    "q_semi_join",
    oracle="""
SELECT c_custkey, c_name, c_mktsegment FROM customer
WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 100000)
""",
)
def q_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 100000)
    return cust.join(
        orders, orders.o_custkey == cust.c_custkey, "left_semi"
    ).select("c_custkey", "c_name", "c_mktsegment")


@register(
    "q_anti_join",
    oracle="""
SELECT c_custkey, c_name FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_totalprice > 300000)
""",
)
def q_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orphan detection — the engine-level guarantee that dangling refs
    (keyless tables, SURVEY.md §1.1) stay queryable. The price filter
    keeps the result non-trivial at every SF (customers exist who never
    placed a large order)."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 300000)
    return cust.join(orders, orders.o_custkey == cust.c_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


@register(
    "q_full_outer_join",
    oracle="""
SELECT coalesce(c.c_nationkey, s.s_nationkey) AS nationkey,
       count(DISTINCT c.c_custkey) AS n_cust,
       count(DISTINCT s.s_suppkey) AS n_supp
FROM customer c
FULL OUTER JOIN supplier s ON c.c_nationkey = s.s_nationkey
GROUP BY 1
""",
)
def q_full_outer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    joined = cust.join(supp, cust.c_nationkey == supp.s_nationkey, "outer")
    return joined.groupBy(
        F.coalesce("c_nationkey", "s_nationkey").alias("nationkey")
    ).agg(
        F.countDistinct("c_custkey").alias("n_cust"),
        F.countDistinct("s_suppkey").alias("n_supp"),
    )


# --------------------------------------------------------------------------
# B17/B18/B20 + B8 — range join over a literal table, cross join, self-join
# --------------------------------------------------------------------------


@register(
    "q_range_join",
    oracle="""
SELECT band, count(*) AS n_parts,
       CAST(sum(CAST(p_retailprice AS DECIMAL(38,6))) AS DOUBLE) AS total_price
FROM part
JOIN (VALUES ('budget', 0.0, 500.0),
             ('standard', 500.0, 1200.0),
             ('premium', 1200.0, 100000.0)) bands(band, lo, hi)
  ON p_retailprice >= lo AND p_retailprice < hi
GROUP BY band
""",
)
def q_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Non-equi join against an in-memory literal table (B8). The bands
    side is 3 rows → Spark plans BroadcastNestedLoopJoin: each part row
    tests 3 predicates, no shuffle. Safe at any fact-side scale; the
    danger case (two big sides) is what B19's as-of pattern avoids."""
    part = load_table(spark, sf_dir, "part")
    bands = spark.createDataFrame(
        [("budget", 0.0, 500.0), ("standard", 500.0, 1200.0), ("premium", 1200.0, 100000.0)],
        "band string, lo double, hi double",
    )
    cond = (F.col("p_retailprice") >= F.col("lo")) & (F.col("p_retailprice") < F.col("hi"))
    return (
        part.join(F.broadcast(bands), cond)
        .groupBy("band")
        .agg(F.count(F.lit(1)).alias("n_parts"), _dsum(F.col("p_retailprice"), "total_price"))
    )


@register(
    "q_cross_join",
    oracle="""
SELECT r_name, o_orderstatus
FROM region CROSS JOIN (SELECT DISTINCT o_orderstatus FROM orders) s
""",
)
def q_cross_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    region = load_table(spark, sf_dir, "region")
    statuses = load_table(spark, sf_dir, "orders").select("o_orderstatus").distinct()
    return region.crossJoin(statuses).select("r_name", "o_orderstatus")


@register(
    "q_self_join",
    oracle="""
SELECT a.s_suppkey AS supp_a, b.s_suppkey AS supp_b, na.n_regionkey AS regionkey
FROM supplier a
JOIN nation na ON a.s_nationkey = na.n_nationkey
JOIN nation nb ON na.n_regionkey = nb.n_regionkey
JOIN supplier b ON b.s_nationkey = nb.n_nationkey AND a.s_suppkey < b.s_suppkey
""",
)
def q_self_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supplier pairs co-located in a region — self-join through the
    nation dimension (B20). Nation is broadcast twice; only the supplier
    self-pairing shuffles."""
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    a = supp.alias("a").join(
        F.broadcast(nation.alias("na")), F.col("a.s_nationkey") == F.col("na.n_nationkey")
    )
    b = supp.alias("b").join(
        F.broadcast(nation.alias("nb")), F.col("b.s_nationkey") == F.col("nb.n_nationkey")
    )
    return a.join(
        b,
        (F.col("na.n_regionkey") == F.col("nb.n_regionkey"))
        & (F.col("a.s_suppkey") < F.col("b.s_suppkey")),
    ).select(
        F.col("a.s_suppkey").alias("supp_a"),
        F.col("b.s_suppkey").alias("supp_b"),
        F.col("na.n_regionkey").alias("regionkey"),
    )


# --------------------------------------------------------------------------
# B22/B23 — distinct counts, exact and approximate
# --------------------------------------------------------------------------


@register(
    "q_count_distinct",
    oracle="""
SELECT event_type, count(DISTINCT user_id) AS n_users, count(*) AS n_events
FROM events GROUP BY event_type
""",
)
def q_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_users"),
        F.count(F.lit(1)).alias("n_events"),
    )


@register("q_approx_count_distinct")  # no oracle: HLL++ sketch values are engine-specific
def q_approx_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B23 — the 100 TB path for distinct counts: HyperLogLog++ sketches
    merge associatively, so the shuffle carries fixed-size sketches, not
    value sets. Accuracy asserted vs exact counts in tests."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", rsd=0.01).alias("approx_users")
    )


# --------------------------------------------------------------------------
# B24 — ROLLUP / CUBE / GROUPING SETS
# --------------------------------------------------------------------------


@register(
    "q_rollup",
    oracle="""
SELECT o_orderstatus, o_orderpriority, count(*) AS n,
       CAST(sum(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE) AS revenue
FROM orders
GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
""",
)
def q_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return orders.rollup("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"), _dsum(F.col("o_totalprice"), "revenue")
    )


@register(
    "q_cube",
    oracle="""
SELECT l_returnflag, l_linestatus, count(*) AS n
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
""",
)
def q_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(F.count(F.lit(1)).alias("n"))


# --------------------------------------------------------------------------
# B26 — collect_list / collect_set (deterministic: sorted, joined)
# --------------------------------------------------------------------------


@register(
    "q_collect_names",
    oracle="""
SELECT s_nationkey AS nationkey,
       string_agg(s_name, ',' ORDER BY s_name) AS supplier_names
FROM supplier GROUP BY s_nationkey
""",
)
def q_collect_names(spark: SparkSession, sf_dir: str) -> DataFrame:
    """collect_list is order-nondeterministic under parallelism; sorting
    the array before joining makes the result stable and oracle-safe."""
    supp = load_table(spark, sf_dir, "supplier")
    return supp.groupBy(F.col("s_nationkey").alias("nationkey")).agg(
        F.array_join(F.sort_array(F.collect_list("s_name")), ",").alias("supplier_names")
    )


# --------------------------------------------------------------------------
# B31/B32 — ORDER BY (nulls placement) + LIMIT / top-k
# --------------------------------------------------------------------------


@register(
    "q_top_orders",
    oracle="""
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders
ORDER BY o_totalprice DESC, o_orderkey ASC
LIMIT 25
""",
)
def q_top_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k: Spark plans TakeOrderedAndProject — per-partition heaps of
    size k, merged on the driver; no global sort at any scale. The
    orderkey tie-break makes the selected set unique."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .limit(25)
    )


# --------------------------------------------------------------------------
# B33/B34 — UNION [ALL] / INTERSECT / EXCEPT
# --------------------------------------------------------------------------


@register(
    "q_union_all",
    oracle="""
SELECT nationkey, count(*) AS n FROM (
  SELECT c_nationkey AS nationkey FROM customer
  UNION ALL
  SELECT s_nationkey AS nationkey FROM supplier
) u GROUP BY nationkey
""",
)
def q_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    supp = load_table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return cust.unionByName(supp).groupBy("nationkey").agg(F.count(F.lit(1)).alias("n"))


@register(
    "q_intersect",
    oracle="""
SELECT c_nationkey AS nationkey FROM customer
INTERSECT
SELECT s_nationkey FROM supplier
""",
)
def q_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    supp = load_table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return cust.intersect(supp)


@register(
    "q_except",
    oracle="""
SELECT c_nationkey AS nationkey FROM customer
EXCEPT
SELECT s_nationkey FROM supplier
""",
)
def q_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    supp = load_table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return cust.subtract(supp)  # subtract == EXCEPT DISTINCT semantics


@register(
    "q_salted_skew_join",
    oracle="""
SELECT c_mktsegment,
       count(*) AS n_orders,
       CAST(sum(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE) AS total
FROM orders
JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment
ORDER BY c_mktsegment
""",
)
def q_salted_skew_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The explicit skew-salted join (operators/skew.salted_join)
    driven through the driver gate: orders (probe, the side that
    skews when one customer is viral) salted across 8 sub-keys,
    customer replicated 8×.  The oracle is the PLAIN join — salting
    must be invisible in the result, which is exactly its contract.
    In production this path is reserved for keys AQE's skew splitting
    cannot fix (a single key too hot for one task); here it proves
    the rewrite preserves semantics on a real join."""
    from cdc_demo_spark.operators.skew import salted_join

    orders = load_table(spark, sf_dir, "orders").withColumnRenamed(
        "o_custkey", "custkey"
    )
    cust = load_table(spark, sf_dir, "customer").withColumnRenamed(
        "c_custkey", "custkey"
    )
    joined = salted_join(orders, cust, on="custkey", salt=8)
    return (
        joined.groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast(DEC)).cast("double").alias("total"),
        )
        .orderBy("c_mktsegment")
    )
