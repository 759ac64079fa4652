"""Moment-based statistics (correlation, covariance, stddev) computed
engine-exactly.

Built-in ``corr``/``covar_samp``/``stddev`` stream doubles in partition
order, so two engines (or two cluster sizes) produce last-ulp-different
answers — fine for analysis, fatal for a value-hash differential check,
and a real reproducibility smell at 100 TB where partitioning changes
run-to-run.  The fix is the classic moment decomposition: accumulate
n, Σx, Σy, Σxy, Σx², Σy² exactly, then evaluate the closed-form
statistics in a fixed sequence of double operations (IEEE doubles make
each op deterministic; only reassociation is not, and exact sums remove
exactly that freedom).

Exactness trick: casting ``price²`` to DECIMAL(38,6) is NOT portable —
a double square can land exactly on a 6th-decimal rounding tie, where
Spark rounds half-up and DuckDB half-even (observed: one microstep in
Σy² at sf0.01).  So the moments are integer-scaled instead: quantity is
integral and price has exactly two decimals, so x and y·100 are exact
integers, every row-level product stays below 2⁵³ (exact in a double),
and the DECIMAL(38,0) sums are tie-free by construction.  Correlation
is scale-invariant; covariance just divides by 100 once at the end.
One partial-agg pass, same cost as the built-ins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cdc_demo_spark.operators import sketches as SK
from cdc_demo_spark.queries.registry import register
from cdc_demo_spark.sources.tables import load_table

DEC0 = "decimal(38,0)"


@register(
    "q_moment_stats",
    oracle="""
WITH scaled AS (
  SELECT l_returnflag,
         l_quantity AS x,
         round(l_extendedprice * 100) AS y
  FROM lineitem
),
moments AS (
  SELECT l_returnflag,
         count(*) AS n,
         CAST(sum(CAST(x AS DECIMAL(38,0))) AS DOUBLE) AS sx,
         CAST(sum(CAST(y AS DECIMAL(38,0))) AS DOUBLE) AS sy,
         CAST(sum(CAST(x * y AS DECIMAL(38,0))) AS DOUBLE) AS sxy,
         CAST(sum(CAST(x * x AS DECIMAL(38,0))) AS DOUBLE) AS sxx,
         CAST(sum(CAST(y * y AS DECIMAL(38,0))) AS DOUBLE) AS syy
  FROM scaled GROUP BY l_returnflag
)
SELECT l_returnflag, n,
       (CAST(n AS DOUBLE) * sxy - sx * sy)
         / sqrt((CAST(n AS DOUBLE) * sxx - sx * sx) * (CAST(n AS DOUBLE) * syy - sy * sy))
         AS corr_qty_price,
       (CAST(n AS DOUBLE) * sxy - sx * sy)
         / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0)) / 100.0 AS covar_qty_price,
       sqrt((CAST(n AS DOUBLE) * sxx - sx * sx)
         / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0))) AS stddev_qty
FROM moments
ORDER BY l_returnflag
""",
)
def q_moment_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson correlation, sample covariance and sample stddev of
    (quantity, price) per return flag, via exact integer-scaled moment
    sums (module docstring has the portability analysis).  The final
    expressions mirror the oracle token-for-token so every double op
    happens in the same order."""
    li = load_table(spark, sf_dir, "lineitem")
    x = F.col("l_quantity")
    y = F.round(F.col("l_extendedprice") * 100)
    m = (
        li.select("l_returnflag", x.alias("x"), y.alias("y"))
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("x").cast(DEC0)).cast("double").alias("sx"),
            F.sum(F.col("y").cast(DEC0)).cast("double").alias("sy"),
            F.sum((F.col("x") * F.col("y")).cast(DEC0)).cast("double").alias("sxy"),
            F.sum((F.col("x") * F.col("x")).cast(DEC0)).cast("double").alias("sxx"),
            F.sum((F.col("y") * F.col("y")).cast(DEC0)).cast("double").alias("syy"),
        )
    )
    nd = F.col("n").cast("double")
    vxy = nd * F.col("sxy") - F.col("sx") * F.col("sy")
    vxx = nd * F.col("sxx") - F.col("sx") * F.col("sx")
    vyy = nd * F.col("syy") - F.col("sy") * F.col("sy")
    return m.select(
        "l_returnflag",
        "n",
        (vxy / F.sqrt(vxx * vyy)).alias("corr_qty_price"),
        (vxy / (nd * (nd - F.lit(1.0))) / F.lit(100.0)).alias("covar_qty_price"),
        F.sqrt(vxx / (nd * (nd - F.lit(1.0)))).alias("stddev_qty"),
    ).orderBy("l_returnflag")


@register(
    "q_hll_mergeable_rollup",
    oracle=SK.hll_oracle_sql("events", "event_type", "user_id", p=10),
)
def q_hll_mergeable_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable distinct-count rollup (B23 extension): per-event-type
    HLL registers, re-aggregated to a global estimate by MERGING THE
    REGISTERS (``groupBy(bucket).max``) — no second scan of the fact
    table.  This is the pattern that makes 100 TB rollup cubes cheap:
    materialize sketch state at the finest grain once, and every
    coarser grain (daily→monthly, type→all) is a tiny sketch-merge,
    not a rescan.  approx_count_distinct can't do this — its HLL state
    is not exposed.

    r12: re-based from ``hll_sketch_agg`` (DataSketches — opaque bytes,
    rows-only forever) onto the engine's own register-table HLL
    (operators/sketches.hll_registers/hll_estimate, the house md5
    scheme), which DuckDB replays bit-for-bit — the whole rollup,
    DELIBERATE ESTIMATION ERROR INCLUDED, is now hash-gated.  The
    DataSketches variant stays pytest-covered as the accuracy
    cross-check (tests/test_queries.py asserts both land within 5% of
    exact and that register-merge == direct whole-table registers)."""
    ev = load_table(spark, sf_dir, "events")
    regs = SK.hll_registers(ev, ["event_type"], "user_id", p=10)
    per_type = SK.hll_estimate(
        regs.select(
            F.concat(F.lit("type:"), F.col("event_type")).alias("scope"),
            "bucket",
            "reg",
        ),
        ["scope"],
        p=10,
        est_col="est_users",
    )
    merged = regs.groupBy("bucket").agg(F.max("reg").alias("reg"))
    overall = SK.hll_estimate(
        merged.select(F.lit("ALL").alias("scope"), "bucket", "reg"),
        ["scope"],
        p=10,
        est_col="est_users",
    )
    return per_type.unionByName(overall).orderBy("scope")


@register(
    "q_winsorize",
    oracle="""
WITH bounds AS (
  SELECT event_type,
         quantile_cont(value, 0.01) AS lo,
         quantile_cont(value, 0.99) AS hi
  FROM events GROUP BY event_type
)
SELECT e.event_type,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CASE WHEN e.value < b.lo THEN 1 ELSE 0 END) AS BIGINT)
         AS n_clipped_low,
       CAST(SUM(CASE WHEN e.value > b.hi THEN 1 ELSE 0 END) AS BIGINT)
         AS n_clipped_high,
       round(AVG(LEAST(GREATEST(e.value, b.lo), b.hi)), 6) AS winsorized_mean,
       round(AVG(e.value), 6) AS raw_mean
FROM events e JOIN bounds b USING (event_type)
GROUP BY e.event_type
ORDER BY e.event_type
""",
)
def q_winsorize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorization — the outlier-clipping pass of a metrics/feature
    pipeline: per-group exact [p01, p99] bounds, values clamped into
    the band, clipped counts audited.  Two aggregates over one scan
    shape: the bounds aggregate is group-count-sized and BROADCASTS
    back onto the fact scan (at 100 TB this is the canonical
    small-agg-rejoin pattern; the sketch path swaps in
    approx_percentile with identical plumbing).  Exact interpolated
    percentiles match DuckDB's quantile_cont (the q_percentiles
    precedent); means rounded at 1e-6."""
    ev = load_table(spark, sf_dir, "events")
    bounds = ev.groupBy("event_type").agg(
        F.expr("percentile(value, 0.01)").alias("lo"),
        F.expr("percentile(value, 0.99)").alias("hi"),
    )
    clipped = F.least(F.greatest(F.col("value"), F.col("lo")), F.col("hi"))
    return (
        ev.join(F.broadcast(bounds), "event_type")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum((F.col("value") < F.col("lo")).cast("long")).alias("n_clipped_low"),
            F.sum((F.col("value") > F.col("hi")).cast("long")).alias("n_clipped_high"),
            F.round(F.avg(clipped), 6).alias("winsorized_mean"),
            F.round(F.avg("value"), 6).alias("raw_mean"),
        )
        .orderBy("event_type")
    )


@register(
    "q_mad_outliers",
    oracle="""
WITH med AS (
  SELECT event_type, quantile_cont(value, 0.5) AS m
  FROM events GROUP BY event_type
),
dev AS (
  SELECT e.event_type, e.value, ABS(e.value - med.m) AS ad, med.m
  FROM events e JOIN med USING (event_type)
),
mad AS (
  SELECT event_type, quantile_cont(ad, 0.5) AS mad FROM dev GROUP BY event_type
)
SELECT d.event_type,
       CAST(COUNT(*) AS BIGINT) AS n,
       round(MAX(d.m), 6) AS median,
       round(MAX(mad.mad), 6) AS mad,
       CAST(SUM(CASE WHEN ABS(d.value - d.m) > 3.5 * 1.4826 * mad.mad
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
FROM dev d JOIN mad USING (event_type)
GROUP BY d.event_type
ORDER BY d.event_type
""",
)
def q_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier detection via median absolute deviation (the
    modified z-score, |x - med| > 3.5 * 1.4826 * MAD): unlike the
    stddev z-score (q_rate_anomaly's trailing variant), MAD doesn't let
    the outliers inflate their own threshold.  Two exact-median passes
    (each the q_percentiles-proven quantile_cont parity), each a tiny
    per-group aggregate broadcast-rejoined onto the scan — the same
    small-agg-rejoin shape as q_winsorize, twice.  The sketch path
    swaps approx_percentile in both spots unchanged."""
    ev = load_table(spark, sf_dir, "events")
    med = ev.groupBy("event_type").agg(F.expr("percentile(value, 0.5)").alias("m"))
    dev = ev.join(F.broadcast(med), "event_type").withColumn(
        "ad", F.abs(F.col("value") - F.col("m"))
    )
    mad = dev.groupBy("event_type").agg(F.expr("percentile(ad, 0.5)").alias("mad"))
    flagged = (F.col("ad") > 3.5 * 1.4826 * F.col("mad")).cast("long")
    return (
        dev.join(F.broadcast(mad), "event_type")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.max("m"), 6).alias("median"),
            F.round(F.max("mad"), 6).alias("mad"),
            F.sum(flagged).alias("n_outliers"),
        )
        .orderBy("event_type")
    )
