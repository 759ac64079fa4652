"""Differential test: the scalable union+window as-of join must equal
the naive join+rank formulation (B19)."""

from __future__ import annotations

from cdc_demo_spark.operators.asof import asof_join, asof_join_via_range
from cdc_demo_spark.sources.tables import load_table
from pyspark.sql import functions as F


def test_asof_matches_naive(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("user_id"), "o_orderdate", "o_orderkey", "o_totalprice"
    )
    kw = dict(on="user_id", left_ts="ts", right_ts="o_orderdate",
              right_cols=["o_orderkey", "o_totalprice"])
    fast = asof_join(ev, orders, right_seq="o_orderkey", **kw)
    slow = asof_join_via_range(ev, orders, tie_break="o_orderkey", **kw)
    cols = ["event_id", "user_id", "o_orderkey", "o_totalprice"]
    a = sorted(map(tuple, fast.select(cols).collect()))
    b = sorted(map(tuple, slow.select(cols).collect()))
    assert a == b and len(a) == ev.count()


def test_asof_includes_equal_timestamp(spark):
    left = spark.createDataFrame([(1, 100)], "k int, t int")
    right = spark.createDataFrame([(1, 100, "exact"), (1, 99, "earlier")], "k int, t int, v string")
    out = asof_join(left, right, on="k", left_ts="t", right_ts="t", right_cols=["v"])
    assert out.collect()[0]["v"] == "exact"  # at-or-before includes t


def test_asof_no_match_is_null(spark):
    left = spark.createDataFrame([(1, 10), (2, 50)], "k int, t int")
    right = spark.createDataFrame([(1, 20, "late")], "k int, t int, v string")
    rows = {r["k"]: r["v"] for r in
            asof_join(left, right, on="k", left_ts="t", right_ts="t", right_cols=["v"]).collect()}
    assert rows == {1: None, 2: None}
