"""Physical layout tests: partition pruning, shuffle-free bucketed
joins, compaction — the write-time decisions that make 100 TB queries
cheap, asserted via the physical plan."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from cdc_demo_spark.layout import compact, write_bucketed, write_partitioned_by_day
from cdc_demo_spark.plans import physical_plan, shuffle_count
from cdc_demo_spark.sources.tables import load_table


def test_partition_pruning(spark, sf_dir, tmp_path):
    ev = load_table(spark, sf_dir, "events")
    path = str(tmp_path / "events_by_day")
    write_partitioned_by_day(ev, path)

    q = spark.read.parquet(path).filter(F.col("_day") == "2024-01-02").select("event_id")
    plan = physical_plan(q)
    assert "PartitionFilters" in plan and "_day" in plan
    # pruned scan reads only the matching partition directory
    n_days = len([d for d in os.listdir(path) if d.startswith("_day=")])
    assert n_days > 1
    assert q.count() > 0


def test_bucketed_join_has_no_shuffle(spark, sf_dir):
    """Two tables bucketed on the join key join WITHOUT any Exchange —
    the co-located join that makes repeated fact⋈fact joins viable."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    write_bucketed(orders, "b_orders", "o_custkey", buckets=8)
    write_bucketed(
        cust.withColumnRenamed("c_custkey", "o_custkey"), "b_customer", "o_custkey", buckets=8
    )
    try:
        j = spark.table("b_orders").join(spark.table("b_customer"), "o_custkey")
        agg = j.groupBy("o_custkey").agg(F.count(F.lit(1)).alias("n"))
        assert shuffle_count(j) == 0
        # even the follow-up groupBy on the bucket key needs no exchange
        assert shuffle_count(agg) == 0
        assert j.count() > 0
    finally:
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_customer")


def test_compaction_reduces_files_preserves_rows(spark, tmp_path):
    path = str(tmp_path / "many_files")
    spark.range(10_000).repartition(64).write.parquet(path)
    n_before = len([f for f in os.listdir(path) if f.endswith(".parquet")])
    compact(spark, path, target_files=4)
    n_after = len([f for f in os.listdir(path) if f.endswith(".parquet")])
    assert n_before > 32 and n_after <= 4
    assert spark.read.parquet(path).count() == 10_000


def test_write_sorted_gives_disjoint_row_group_stats(spark, sf_dir, tmp_path):
    """Sorted writes must produce tight per-file min/max ranges on the
    sort key (what row-group skipping keys off)."""
    import pyarrow.parquet as pq

    from cdc_demo_spark.layout import write_sorted

    orders = load_table(spark, sf_dir, "orders").repartition(4)
    path = str(tmp_path / "orders_sorted")
    write_sorted(orders, path, ["o_orderkey"])

    for f in os.listdir(path):
        if not f.endswith(".parquet"):
            continue
        pf = pq.ParquetFile(os.path.join(path, f))
        col = [c.name for c in pf.schema_arrow].index("o_orderkey")
        prev_max = None
        for rg in range(pf.metadata.num_row_groups):
            st = pf.metadata.row_group(rg).column(col).statistics
            assert st.min <= st.max
            if prev_max is not None:
                assert st.min >= prev_max  # sorted => disjoint ranges
            prev_max = st.max


def test_zorder_skips_files_on_secondary_column(spark, tmp_path):
    """On a 2-D grid, a linear sort by x leaves y uncorrelated with file
    boundaries: a y-range predicate overlaps (almost) every file's
    min/max envelope. Z-order by (x, y) must shrink that to a strict
    subset — the whole point of multi-dimensional clustering."""
    from cdc_demo_spark.layout import write_zordered

    n_side = 256  # 65k points on a 256x256 grid
    df = (
        spark.range(n_side * n_side)
        .select(
            (F.col("id") % n_side).cast("long").alias("x"),
            (F.col("id") / n_side).cast("long").alias("y"),
        )
    )
    linear = str(tmp_path / "linear")
    zord = str(tmp_path / "zorder")
    (
        df.repartitionByRange(16, "x")
        .sortWithinPartitions("x")
        .write.mode("overwrite")
        .parquet(linear)
    )
    write_zordered(df, zord, ["x", "y"], target_files=16)

    def files_overlapping_y_range(path, lo, hi):
        per_file = (
            spark.read.parquet(path)
            .groupBy(F.input_file_name().alias("f"))
            .agg(F.min("y").alias("lo"), F.max("y").alias("hi"))
        )
        return per_file.filter((F.col("hi") >= lo) & (F.col("lo") <= hi)).count(), per_file.count()

    lin_hit, lin_total = files_overlapping_y_range(linear, 10, 41)
    z_hit, z_total = files_overlapping_y_range(zord, 10, 41)
    assert lin_total >= 8 and z_total >= 8
    assert lin_hit == lin_total  # linear layout can't skip on y
    assert z_hit <= z_total // 2  # z-order skips at least half

    # clustering must not change the data
    assert spark.read.parquet(zord).count() == n_side * n_side
    got = spark.read.parquet(zord).agg(F.sum("x"), F.sum("y")).collect()[0]
    want = df.agg(F.sum("x"), F.sum("y")).collect()[0]
    assert tuple(got) == tuple(want)


def test_dynamic_partition_pruning_on_partitioned_fact(spark, sf_dir, tmp_path):
    """DPP: joining a day-partitioned fact to a *filtered* dim must
    inject a runtime partition filter on the fact scan (the partition
    set is only known after the dim filter runs — static pruning can't
    do this).  This is the mechanism that keeps star joins from
    scanning all partitions at 100 TB."""
    from pyspark.sql import functions as F

    from cdc_demo_spark.layout import write_partitioned_by_day
    from cdc_demo_spark.sources.tables import load_table

    fact_path = str(tmp_path / "events_by_day")
    ev = load_table(spark, sf_dir, "events")
    write_partitioned_by_day(ev, fact_path, ts_col="ts")
    fact = spark.read.parquet(fact_path)
    # DPP's planner heuristic requires a *selective predicate* on the
    # build side (a limit/distinct alone doesn't qualify)
    dim = (
        ev.select(F.to_date("ts").alias("event_date"))
        .distinct()
        .filter(F.dayofmonth("event_date") <= 4)
    )
    joined = fact.join(
        F.broadcast(dim), fact["_day"] == dim["event_date"]
    ).groupBy("_day").count()
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower(), plan[:2000]
