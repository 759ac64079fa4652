"""salted_join (operators/skew.py): result equality with the plain
join (the salting invariant) and the balance property it exists for —
the hot key's rows spread ~uniformly across n_salt sub-partitions.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cdc_demo_spark.operators.skew import salted_join
from cdc_demo_spark.sources.tables import load_table


@pytest.fixture(scope="module")
def skewed(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events").select(
        F.when(F.col("user_id") % 2 == 0, F.lit(1))
        .otherwise(F.col("user_id"))
        .cast("long")
        .alias("k"),
        "value",
        "event_id",
    )
    dim = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") < 2000)
        .select(F.col("c_custkey").alias("k"), F.col("c_name").alias("name"))
    )
    return ev.localCheckpoint(), dim.localCheckpoint()


def _multiset(df):
    from collections import Counter

    return Counter(tuple(r) for r in df.collect())


def test_salted_equals_plain_inner(spark, skewed):
    ev, dim = skewed
    plain = ev.join(dim, "k")
    salted = salted_join(ev, dim, on="k", salt=8, scatter_col="event_id")
    assert sorted(plain.columns) == sorted(salted.columns)
    assert _multiset(salted.select(*plain.columns)) == _multiset(plain)


def test_salted_equals_plain_left(spark, skewed):
    """Left join: unmatched BIG rows survive exactly once (their salt
    meets a replica that has no dim row — every replica has none)."""
    ev, dim = skewed
    small_dim = dim.filter(F.col("k") % 3 == 0)  # force unmatched big rows
    plain = ev.join(small_dim, "k", "left")
    salted = salted_join(
        ev, small_dim, on="k", salt=8, scatter_col="event_id", how="left"
    )
    assert _multiset(salted.select(*plain.columns)) == _multiset(plain)


def test_hot_key_scatters_balanced(spark, skewed):
    """The property salting buys: the hot key's rows split across all
    n_salt sub-partitions, none holding more than ~2x its fair share
    (xxhash64 scatter over a uniform id column)."""
    ev, _ = skewed
    n_salt = 8
    b = ev.withColumn(
        "__salt", F.pmod(F.xxhash64(F.col("event_id")), F.lit(n_salt)).cast("int")
    )
    sizes = (
        b.filter(F.col("k") == 1)
        .groupBy("__salt")
        .count()
        .collect()
    )
    hot_total = sum(r["count"] for r in sizes)
    assert len(sizes) == n_salt, "hot key must touch every sub-partition"
    assert max(r["count"] for r in sizes) < 2 * hot_total / n_salt


def test_right_and_full_rejected(spark, skewed):
    ev, dim = skewed
    with pytest.raises(ValueError, match="inner/left"):
        salted_join(ev, dim, on="k", how="right")
