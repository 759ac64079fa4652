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


def _logreg_oracle(iterations: int = 12, lr: float = 0.5, l2: float = 0.001) -> str:
    """Unrolled-SQL DuckDB twin of operators/quality_model.train_logreg
    (the q_bpe_train idiom for oracle-checking an iterative
    recurrence): per iteration, p{i} scores every document through the
    previous weights, g{i} is the per-bucket mean residual, w{i}/b{i}
    apply the simultaneous gradient update."""
    parts = [f"""
WITH feat AS MATERIALIZED (
  SELECT DISTINCT doc_id AS id,
         CAST('0x' || substr(md5(w), 1, 8) AS BIGINT) % 1024 AS bucket
  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents)
  WHERE w <> ''
),
lab AS MATERIALIZED (
  SELECT doc_id AS id,
         CASE WHEN list_contains(string_split(text, ' '), 'spark')
              THEN 1.0 ELSE 0.0 END AS y
  FROM documents
),
nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM lab),
w0 AS (SELECT CAST(NULL AS BIGINT) AS bucket, CAST(NULL AS DOUBLE) AS weight
       WHERE false),
b0 AS (SELECT 0.0 AS b)"""]
    for i in range(1, iterations + 1):
        p = i - 1
        parts.append(f""",
p{i} AS MATERIALIZED (
  SELECT l.id, l.y,
         1.0 / (1.0 + exp(-(coalesce(z.z0, 0.0) + (SELECT b FROM b{p})))) AS p
  FROM lab l LEFT JOIN (
    SELECT f.id, sum(coalesce(w.weight, 0.0)) AS z0
    FROM feat f LEFT JOIN w{p} w USING (bucket)
    GROUP BY f.id
  ) z USING (id)
),
g{i} AS MATERIALIZED (
  SELECT f.bucket, sum(p.p - p.y) / (SELECT n FROM nn) AS g
  FROM feat f JOIN p{i} p USING (id)
  GROUP BY f.bucket
),
w{i} AS MATERIALIZED (
  SELECT coalesce(w.bucket, g.bucket) AS bucket,
         coalesce(w.weight, 0.0)
           - {lr} * (coalesce(g.g, 0.0) + {l2} * coalesce(w.weight, 0.0)) AS weight
  FROM w{p} w FULL JOIN g{i} g ON w.bucket = g.bucket
),
b{i} AS MATERIALIZED (
  SELECT (SELECT b FROM b{p}) - {lr} * avg(p.p - p.y) AS b FROM p{i} p
)""")
    parts.append(f"""
SELECT bucket, ROUND(weight, 6) + 0.0 AS weight FROM w{iterations}
UNION ALL
SELECT CAST(-1 AS BIGINT) AS bucket, ROUND((SELECT b FROM b{iterations}), 6) + 0.0 AS weight
""")
    return "".join(parts)


@register("q_train_quality_classifier", oracle=_logreg_oracle())
def q_train_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TRAIN the fastText-shaped quality filter in-engine — the other
    half of q_linear_quality_score's scoring pass: full-batch logistic
    regression (12 gradient steps, lr 0.5, l2 1e-3) over hashed-token
    presence features, against a weak label (document mentions
    'spark' — the stand-in for a curated is-high-quality label set, as
    the md5 weights were the stand-in for a shipped model).  Output is
    the artifact a scoring pass broadcasts: the weight table plus the
    bias as bucket -1, rounded to 6 decimals (fp summation-order
    divergence through 12 iterations is ~1e-12; same tolerance
    argument as q_neardup_centrality).  The DuckDB oracle replays all
    12 iterations as unrolled CTE stages; training dynamics (monotone
    loss, below base-rate entropy) are pinned in
    tests/test_quality_model.py."""
    from pyspark.sql import functions as F

    from cdc_demo_spark.operators.quality_model import (
        hashed_presence_features,
        train_logreg,
    )

    docs = load_table(spark, sf_dir, "documents")
    feats = hashed_presence_features(docs)
    labels = docs.select(
        F.col("doc_id").alias("id"),
        F.array_contains(F.split("text", " "), "spark").cast("double").alias("y"),
    )
    model = train_logreg(feats, labels, lr=0.5, iterations=12, l2=0.001)
    weights = model.weights.select(
        "bucket", (F.round("weight", 6) + F.lit(0.0)).alias("weight")
    )
    # F.round (not Python round) so the bias gets the same HALF_UP
    # rule as the weight column and the DuckDB ROUND
    bias_row = spark.createDataFrame(
        [(-1, model.bias)], "bucket bigint, weight double"
    ).select("bucket", (F.round("weight", 6) + F.lit(0.0)).alias("weight"))
    return weights.unionByName(bias_row)
