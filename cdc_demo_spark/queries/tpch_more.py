"""Remaining classic TPC-H plan shapes (Q2/Q4/Q5/Q9/Q11/Q12/Q16/Q20
analogues), completing the suite alongside tpch_like.py.

The driver schema has no ``partsupp`` table and lineitem carries no
commitdate/receiptdate/shipmode (FIXTURES.md §B), so five of these are
*adapted*: the part↔supplier relation is derived from lineitem's
(l_partkey, l_suppkey) pairs and date/mode predicates map onto the
columns that exist.  Every adaptation preserves the *plan shape* the
original query exists to exercise (correlated min subquery, EXISTS
semi-join, nested IN with correlated HAVING, …) — that shape, not the
constant values, is what the reference's outsourced engines (BigQuery
reporting dataset, /root/reference/main.tf:188-195) would run.

Oracle-parity conventions follow registry.py: decimal(38,6) for
revenue sums (order-independent), counts compared as BIGINT, year()
cast to long, doubles only at the final projection.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cdc_demo_spark.queries.registry import register
from cdc_demo_spark.sources.tables import load_table

DEC = "decimal(38,6)"


@register(
    "q_local_supplier_volume",
    oracle="""
SELECT n_name,
       CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))) AS DOUBLE) AS revenue
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
GROUP BY n_name
ORDER BY revenue DESC, n_name
""",
)
def q_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 (exact shape — needs no adaptation): revenue from
    *local* supply chains, i.e. the lineitem's supplier sits in the same
    nation as the ordering customer, restricted to one region and one
    order year.  The c_nationkey = s_nationkey equality is the
    interesting bit: it correlates two different dimension paths of the
    star, so Catalyst must carry both nationkeys through the fact
    joins before the final broadcast to nation/region.  Dims broadcast;
    the only big shuffles are the two fact-fact joins on their keys."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    nation = F.broadcast(load_table(spark, sf_dir, "nation"))
    region = F.broadcast(
        load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    )
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .join(li, li.l_orderkey == orders.o_orderkey)
        .join(
            supp,
            (li.l_suppkey == supp.s_suppkey)
            & (cust.c_nationkey == supp.s_nationkey),
        )
        .join(nation, supp.s_nationkey == nation.n_nationkey)
        .join(region, nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(
            F.sum((F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(DEC))
            .cast("double")
            .alias("revenue")
        )
        .orderBy(F.desc("revenue"), F.asc("n_name"))
    )


@register(
    "q_late_shipment_priority",
    oracle="""
SELECT o_orderpriority, count(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1996-07-01 00:00:00'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey
                AND l_shipdate > o_orderdate + INTERVAL 90 DAY)
GROUP BY o_orderpriority
ORDER BY o_orderpriority
""",
)
def q_late_shipment_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape (adapted: lineitem has no commit/receipt dates,
    FIXTURES.md §B, so "late" = shipped >90 days after the order date).
    The EXISTS decorrelates to a left-semi join whose condition mixes
    the equi key with a non-equi date comparison; Spark executes it as
    a semi hash-join on l_orderkey with the date predicate as a
    residual, so each order is emitted at most once no matter how many
    late lines it has."""
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-07-01 00:00:00").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    return (
        orders.join(
            li,
            (orders.o_orderkey == li.l_orderkey)
            & (li.l_shipdate > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")),
            "leftsemi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


@register(
    "q_min_cost_supplier",
    oracle="""
WITH offers AS (
  SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
         sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))) AS supplycost
  FROM lineitem
  GROUP BY l_partkey, l_suppkey
)
SELECT CAST(s_acctbal AS DOUBLE) AS acctbal, s_name, n_name, p_partkey, p_brand,
       CAST(supplycost AS DOUBLE) AS cost
FROM part
JOIN offers   ON p_partkey = ps_partkey
JOIN supplier ON ps_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE p_type = 'LARGE' AND r_name = 'EUROPE'
  AND supplycost = (SELECT min(o2.supplycost)
                    FROM offers o2
                    JOIN supplier s2 ON o2.ps_suppkey = s2.s_suppkey
                    JOIN nation n2   ON s2.s_nationkey = n2.n_nationkey
                    JOIN region r2   ON n2.n_regionkey = r2.r_regionkey
                    WHERE o2.ps_partkey = p_partkey AND r2.r_name = 'EUROPE')
ORDER BY acctbal DESC, s_name, p_partkey
""",
)
def q_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape (adapted: no partsupp table, so the part↔supplier
    offer relation — who can supply which part at what cost — is
    derived from observed lineitems).  The defining feature survives:
    a correlated MIN subquery over the same relation, correlated on
    partkey and filtered to one region.  Decorrelated Spark plan:
    aggregate offers once, broadcast-join the region-filtered supplier
    dim, compute per-part min in a second partial agg, then join back
    on (partkey, cost-equality).  Costs stay decimal until the final
    projection so the equality is exact, never an fp comparison."""
    li = load_table(spark, sf_dir, "lineitem")
    offers = li.groupBy(
        F.col("l_partkey").alias("ps_partkey"), F.col("l_suppkey").alias("ps_suppkey")
    ).agg(
        F.sum((F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(DEC)).alias(
            "supplycost"
        )
    )
    supp = load_table(spark, sf_dir, "supplier")
    nation = F.broadcast(load_table(spark, sf_dir, "nation"))
    region = F.broadcast(
        load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    )
    euro_supp = (
        supp.join(nation, supp.s_nationkey == nation.n_nationkey)
        .join(region, nation.n_regionkey == region.r_regionkey)
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    euro_offers = offers.join(
        F.broadcast(euro_supp), offers.ps_suppkey == F.col("s_suppkey")
    )
    min_cost = euro_offers.groupBy(
        F.col("ps_partkey").alias("min_partkey")
    ).agg(F.min("supplycost").alias("min_cost"))
    part = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "LARGE")
    return (
        euro_offers.join(part, F.col("ps_partkey") == part.p_partkey)
        .join(
            min_cost,
            (F.col("ps_partkey") == F.col("min_partkey"))
            & (F.col("supplycost") == F.col("min_cost")),
        )
        .select(
            F.col("s_acctbal").cast("double").alias("acctbal"),
            "s_name",
            "n_name",
            "p_partkey",
            "p_brand",
            F.col("supplycost").cast("double").alias("cost"),
        )
        .orderBy(F.desc("acctbal"), F.asc("s_name"), F.asc("p_partkey"))
    )


@register(
    "q_product_profit",
    oracle="""
SELECT n_name AS nation, o_year,
       CAST(sum(amount) AS DOUBLE) AS profit
FROM (
  SELECT n_name, CAST(year(o_orderdate) AS BIGINT) AS o_year,
         CAST(l_extendedprice * (1 - l_discount)
              - 0.1 * p_retailprice * l_quantity AS DECIMAL(38,6)) AS amount
  FROM lineitem
  JOIN part     ON p_partkey = l_partkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN nation   ON s_nationkey = n_nationkey
  WHERE p_name LIKE '%widget%'
) profit
GROUP BY n_name, o_year
ORDER BY nation, o_year DESC
""",
)
def q_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape (adapted: supply cost proxied by 10% of the
    part's retail price per unit — no partsupp.ps_supplycost exists).
    Profit on one product family by supplier nation and order year.
    The LIKE filter prunes part before the fact join; per-row profit
    is computed in doubles (pointwise-deterministic) then cast to
    decimal so the grouped sums are order-independent across engines
    and partitionings."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("%widget%"))
    supp = load_table(spark, sf_dir, "supplier")
    orders = load_table(spark, sf_dir, "orders")
    nation = F.broadcast(load_table(spark, sf_dir, "nation"))
    amount = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - F.lit(0.1) * F.col("p_retailprice") * F.col("l_quantity")
    ).cast(DEC)
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(nation, supp.s_nationkey == nation.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("o_year"),
        )
        .agg(F.sum(amount).cast("double").alias("profit"))
        .orderBy(F.asc("nation"), F.desc("o_year"))
    )


@register(
    "q_important_supplier_value",
    oracle="""
WITH vals AS (
  SELECT l_suppkey AS suppkey,
         sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))) AS value
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation   ON s_nationkey = n_nationkey
  JOIN region   ON n_regionkey = r_regionkey
  WHERE r_name = 'EUROPE'
  GROUP BY l_suppkey
)
SELECT suppkey, CAST(value AS DOUBLE) AS value
FROM vals
WHERE CAST(value AS DOUBLE) >
      (SELECT 0.05 * CAST(sum(value) AS DOUBLE) FROM vals)
ORDER BY value DESC, suppkey
""",
)
def q_important_supplier_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape (adapted: supplier "stock value" = lifetime
    shipped revenue, region-scoped instead of single-nation for enough
    rows at small SF).  The defining feature is the global scalar
    subquery in the HAVING: keep suppliers whose value exceeds a
    fraction of the WHOLE region's value.  Spark plan: one partial agg
    per supplier, a single-row total reduced from those per-supplier
    rows (not a second scan), broadcast back as a literal-like join.
    The threshold comparison happens in doubles on both engines, on
    identical decimal inputs, so it cannot drift."""
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    nation = F.broadcast(load_table(spark, sf_dir, "nation"))
    region = F.broadcast(
        load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    )
    euro_supp = F.broadcast(
        supp.join(nation, supp.s_nationkey == nation.n_nationkey)
        .join(region, nation.n_regionkey == region.r_regionkey)
        .select("s_suppkey")
    )
    vals = (
        li.join(euro_supp, li.l_suppkey == F.col("s_suppkey"))
        .groupBy(F.col("l_suppkey").alias("suppkey"))
        .agg(
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(DEC)
            ).alias("value")
        )
    )
    total = vals.agg(
        (F.lit(0.05) * F.sum("value").cast("double")).alias("threshold")
    )
    return (
        vals.join(F.broadcast(total))
        .filter(F.col("value").cast("double") > F.col("threshold"))
        .select("suppkey", F.col("value").cast("double").alias("value"))
        .orderBy(F.desc("value"), F.asc("suppkey"))
    )


@register(
    "q_line_status_priority",
    oracle="""
SELECT l_linestatus,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_count,
       CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_count
FROM orders
JOIN lineitem ON o_orderkey = l_orderkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
GROUP BY l_linestatus
ORDER BY l_linestatus
""",
)
def q_line_status_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape (adapted: lineitem carries no shipmode, so the
    grouping attribute is l_linestatus; the receipt-date window maps to
    shipdate).  The point of Q12 is the conditional two-way count in a
    single aggregate pass after a fact-fact join — no second scan, the
    CASE evaluates inside the partial agg."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    )
    is_high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(is_high, 1).otherwise(0)).alias("high_count"),
            F.sum(F.when(~is_high, 1).otherwise(0)).alias("low_count"),
        )
        .orderBy("l_linestatus")
    )


@register(
    "q_supplier_part_counts",
    oracle="""
SELECT p_brand, p_type, p_size,
       count(DISTINCT l_suppkey) AS supplier_cnt
FROM part
JOIN lineitem ON p_partkey = l_partkey
WHERE p_brand <> 'Brand#1'
  AND p_type <> 'PROMO'
  AND p_size IN (1, 4, 9, 16, 25, 36, 49)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_type, p_size
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
""",
)
def q_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape (adapted: the part↔supplier relation comes from
    lineitem; "complaint" suppliers are modeled as negative account
    balance since supplier has no comment column).  Exercises NOT IN →
    anti-join (safe here: s_suppkey is non-null so no three-valued-logic
    trap) composed with a count-distinct over three grouping keys.  The
    part filters prune before the join; the anti side broadcasts."""
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 4, 9, 16, 25, 36, 49)
    )
    li = load_table(spark, sf_dir, "lineitem")
    bad_supp = F.broadcast(
        load_table(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    return (
        li.join(bad_supp, li.l_suppkey == F.col("s_suppkey"), "left_anti")
        .join(part, li.l_partkey == part.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(
            F.desc("supplier_cnt"), F.asc("p_brand"), F.asc("p_type"), F.asc("p_size")
        )
    )


@register(
    "q_excess_part_suppliers",
    oracle="""
SELECT s_name, CAST(s_acctbal AS DOUBLE) AS acctbal
FROM supplier
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'AMERICA'
  AND s_suppkey IN (
    SELECT l_suppkey FROM lineitem
    WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'red%')
      AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY l_suppkey, l_partkey
    HAVING sum(l_quantity) > 50
  )
ORDER BY s_name
""",
)
def q_excess_part_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape (adapted: "has excess availability" becomes
    "shipped >50 units of one red part in the year" — availqty lives in
    the missing partsupp).  The nested structure survives intact: an IN
    over a name-filtered part set feeds a grouped HAVING whose
    surviving (supplier, part) pairs feed the outer supplier IN.
    Spark plan: semi-join lineitem→part (broadcast), partial-agg the
    pair sums, project distinct suppliers, semi-join into the
    region-filtered supplier dim.  Quantities are integral-valued
    doubles, so the HAVING sums are exact in fp on both engines."""
    part_red = F.broadcast(
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_name").like("red%"))
        .select("p_partkey")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    )
    shippers = (
        li.join(part_red, li.l_partkey == F.col("p_partkey"), "leftsemi")
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .filter(F.col("qty") > 50)
        .select("l_suppkey")
        .distinct()
    )
    supp = load_table(spark, sf_dir, "supplier")
    nation = F.broadcast(load_table(spark, sf_dir, "nation"))
    region = F.broadcast(
        load_table(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")
    )
    return (
        supp.join(nation, supp.s_nationkey == nation.n_nationkey)
        .join(region, nation.n_regionkey == region.r_regionkey)
        .join(shippers, supp.s_suppkey == F.col("l_suppkey"), "leftsemi")
        .select("s_name", F.col("s_acctbal").cast("double").alias("acctbal"))
        .orderBy("s_name")
    )
