"""Event-time windowing over the events table (B42/B43), batch form.

The same ``F.window``/``F.session_window`` expressions run unchanged
under ``readStream`` with a watermark (B41) — that streaming path is
exercised in tests/test_streaming_windows.py against these batch
results (streams and batch must agree on closed windows).  The oracles
give DuckDB equivalents: ``time_bucket`` for tumbling/sliding,
gaps-and-islands for sessions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cdc_demo_spark.queries.registry import register
from cdc_demo_spark.sources.tables import load_table

DEC = "decimal(38,6)"


@register(
    "q_tumbling_window",
    oracle="""
SELECT time_bucket(INTERVAL 1 HOUR, ts) AS window_start,
       event_type,
       count(*) AS n,
       CAST(sum(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS sum_value
FROM events
GROUP BY 1, 2
""",
)
def q_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B42 — tumbling 1h counts per event type. Partial aggregation
    collapses each scan partition to (bucket, type) rows before the
    shuffle; in streaming the same plan incrementalizes under a
    watermark."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast(DEC)).cast("double").alias("sum_value"),
        )
        .select(F.col("w.start").alias("window_start"), "event_type", "n", "sum_value")
    )


@register(
    "q_sliding_window",
    oracle="""
SELECT window_start, count(*) AS n,
       CAST(sum(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS sum_value
FROM (
  SELECT time_bucket(INTERVAL 30 MINUTE, ts) - k * INTERVAL 30 MINUTE AS window_start,
         value
  FROM events, (VALUES (0), (1)) offsets(k)
) t
GROUP BY window_start
""",
)
def q_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B42 — 1h windows sliding every 30min: each event lands in exactly
    size/slide = 2 windows (the oracle materializes the same two
    buckets explicitly)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast(DEC)).cast("double").alias("sum_value"),
        )
        .select(F.col("w.start").alias("window_start"), "n", "sum_value")
    )


@register(
    "q_session_window",
    oracle="""
WITH marked AS (
  SELECT user_id, ts, value,
         CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   > INTERVAL 30 MINUTE OR
                   lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
              THEN 1 ELSE 0 END AS new_session
  FROM events
), islands AS (
  SELECT user_id, ts, value,
         sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
  FROM marked
)
SELECT user_id, min(ts) AS session_start, count(*) AS n_events,
       epoch_us(max(ts) - min(ts)) AS span_us
FROM islands GROUP BY user_id, sid
""",
)
def q_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B43 — 30-minute-gap sessions per user. Spark's session_window is
    a first-class aggregation (merging windows stateful under
    streaming); the oracle derives identical islands with lag+cumsum."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id", F.session_window("ts", "30 minutes").alias("w"))
        .agg(
            F.min("ts").alias("session_start"),
            F.count(F.lit(1)).alias("n_events"),
            (F.unix_micros(F.max("ts")) - F.unix_micros(F.min("ts"))).alias("span_us"),
        )
        .select("user_id", "session_start", "n_events", "span_us")
    )


@register(
    "q_events_per_day_spine",
    oracle="""
WITH bounds AS (
  SELECT CAST(min(ts) AS DATE) AS lo, CAST(max(ts) AS DATE) AS hi FROM events
), spine AS (
  SELECT unnest(generate_series(lo, hi, INTERVAL 1 DAY))::DATE AS day FROM bounds
), per_day AS (
  SELECT CAST(ts AS DATE) AS day, count(*) AS n,
         CAST(sum(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS total_value
  FROM events GROUP BY 1
)
SELECT s.day::TIMESTAMP AS day, coalesce(p.n, 0) AS n, coalesce(p.total_value, 0.0) AS total_value
FROM spine s LEFT JOIN per_day p ON p.day = s.day
""",
)
def q_events_per_day_spine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-filled daily event counts: generate the full calendar spine
    with sequence() (distributed explode of one row — no driver loop)
    and left-join the per-day aggregate, zero-filling silent days. The
    reporting idiom every monitoring dashboard needs; broadcast-joins
    the tiny spine against the aggregate."""
    ev = load_table(spark, sf_dir, "events")
    per_day = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("value").cast(DEC)).cast("double").alias("total_value"),
    )
    bounds = ev.agg(
        F.to_date(F.min("ts")).alias("lo"), F.to_date(F.max("ts")).alias("hi")
    )
    spine = bounds.select(
        F.explode(F.sequence("lo", "hi", F.expr("INTERVAL 1 DAY"))).alias("day")
    )
    return (
        spine.join(per_day, "day", "left")
        .select(
            F.col("day").cast("timestamp").alias("day"),
            F.coalesce("n", F.lit(0)).alias("n"),
            F.coalesce("total_value", F.lit(0.0)).alias("total_value"),
        )
    )


@register(
    "q_value_histogram",
    oracle="""
SELECT CASE WHEN value < 0 THEN 0
            WHEN value >= 200 THEN 11
            ELSE CAST(floor(value / 20) AS BIGINT) + 1 END AS bucket,
       count(*) AS n,
       CAST(sum(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS bucket_sum
FROM events GROUP BY 1
""",
)
def q_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram, width_bucket semantics spelled out as
    arithmetic (DuckDB 1.0 has no width_bucket builtin): 10 buckets over
    [0,200), underflow -> 0, overflow -> 11 — the single-pass
    distribution sketch for dashboards."""
    ev = load_table(spark, sf_dir, "events")
    bucket = (
        F.when(F.col("value") < 0, 0)
        .when(F.col("value") >= 200, 11)
        .otherwise(F.floor(F.col("value") / 20).cast("long") + 1)
        .alias("bucket")
    )
    return ev.groupBy(bucket).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("value").cast(DEC)).cast("double").alias("bucket_sum"),
    )


@register(
    "q_weekly_retention",
    oracle="""
WITH weekly AS (
  SELECT DISTINCT CAST(date_trunc('week', ts) AS TIMESTAMP) AS week_start, user_id
  FROM events
)
SELECT a.week_start,
       count(*) AS active_users,
       CAST(count(b.user_id) AS BIGINT) AS retained_next_week
FROM weekly a
LEFT JOIN weekly b
  ON b.user_id = a.user_id AND b.week_start = a.week_start + INTERVAL 7 DAY
GROUP BY a.week_start
""",
)
def q_weekly_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention over the event stream: of the users
    active in week W, how many are also active in W+1. One dedup
    aggregate + a self-join on (user, week+7d) — both shuffles on the
    same user_id-dominated key, so at scale the second reuses the
    first's partitioning."""
    ev = load_table(spark, sf_dir, "events")
    weekly = ev.select(
        F.date_trunc("week", "ts").alias("week_start"), "user_id"
    ).distinct()
    a, b = weekly.alias("a"), weekly.alias("b")
    return (
        a.join(
            b,
            (F.col("b.user_id") == F.col("a.user_id"))
            & (F.col("b.week_start")
               == F.col("a.week_start") + F.expr("INTERVAL 7 DAYS")),
            "left",
        )
        .groupBy(F.col("a.week_start").alias("week_start"))
        .agg(
            F.count(F.lit(1)).alias("active_users"),
            F.count(F.col("b.user_id")).alias("retained_next_week"),
        )
    )
