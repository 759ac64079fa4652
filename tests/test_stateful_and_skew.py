"""Custom stateful streaming operator (B45 alt) + skew-salted join."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from cdc_demo_spark.operators.skew import salted_join
from cdc_demo_spark.streaming.stateful import running_user_totals
from tests.test_streaming_windows import SCHEMA, make_events, write_events


def test_stateful_running_totals_across_batches(spark, tmp_path):
    """State persists across micro-batches: totals after draining all
    files must equal the batch aggregate."""
    land = str(tmp_path / "events")
    events = make_events(200)
    write_events(land, events, files=5)

    stream = spark.readStream.schema(SCHEMA).json(land).select("user_id", "value")
    q = (
        running_user_totals(stream)
        .writeStream.format("memory")
        .queryName("running_totals")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    # update mode re-emits a key each time it changes: take the LAST row
    # per key (monotonic n makes max(n) the latest)
    got = (
        spark.sql("SELECT * FROM running_totals")
        .groupBy("user_id")
        .agg(F.max("n").alias("n"), F.max("total").alias("total"))
        .collect()
    )
    batch = (
        spark.read.schema(SCHEMA).json(land)
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("total"))
        .collect()
    )
    want = {r["user_id"]: (r["n"], round(r["total"], 6)) for r in batch}
    have = {r["user_id"]: (r["n"], round(r["total"], 6)) for r in got}
    assert have == want


def test_stateful_state_survives_restart(spark, tmp_path):
    """Second wave of files + same checkpoint: state carries over."""
    land = str(tmp_path / "events")
    events = make_events(120)
    write_events(land, events[:60], files=2, prefix="w1")

    out_dir = str(tmp_path / "out")

    def drain():
        stream = spark.readStream.schema(SCHEMA).json(land).select("user_id", "value")
        q = (
            running_user_totals(stream)
            .writeStream.foreachBatch(
                lambda batch, _id: batch.write.mode("append").parquet(out_dir)
            )
            .outputMode("update")
            .option("checkpointLocation", str(tmp_path / "ckpt2"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    drain()  # wave 1
    write_events(land, events[60:], files=2, prefix="w2")
    drain()  # wave 2: memory sink can't recover a checkpoint; foreachBatch can

    got = (
        spark.read.parquet(out_dir).groupBy("user_id").agg(F.max("n").alias("n")).collect()
    )
    batch = (
        spark.read.schema(SCHEMA).json(land)
        .groupBy("user_id").agg(F.count(F.lit(1)).alias("n")).collect()
    )
    assert {r["user_id"]: r["n"] for r in got} == {r["user_id"]: r["n"] for r in batch}


def test_salted_join_matches_plain_join(spark):
    """Salting must be invisible to results — only the partitioning
    changes. Probe: 10k rows, 80% on ONE hot key."""
    probe = spark.range(10_000).select(
        F.when(F.col("id") % 5 != 0, F.lit(1)).otherwise(F.col("id") % 97).alias("k"),
        F.col("id").alias("payload"),
    )
    build = spark.range(97).select(F.col("id").alias("k"), (F.col("id") * 10).alias("dim"))
    plain = probe.join(build, "k").select("k", "payload", "dim")
    salted = salted_join(probe, build, "k", salt=8).select("k", "payload", "dim")
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_salted_left_join_keeps_unmatched(spark):
    probe = spark.createDataFrame([(1, "a"), (2, "b"), (99, "c")], "k long, v string")
    build = spark.createDataFrame([(1, "x"), (2, "y")], "k long, w string")
    out = salted_join(probe, build, "k", salt=4, how="left").collect()
    by_k = {r["k"]: r["w"] for r in out}
    assert by_k == {1: "x", 2: "y", 99: None}


def test_transform_with_state_matches_batch(spark, tmp_path):
    """Same running totals on Spark 4's transformWithStateInPandas
    (typed ValueState, RocksDB-backed state store) — must equal the
    batch aggregate, like the applyInPandasWithState variant.

    Environment gate: the TWS python worker speaks protobuf to the JVM
    state server; without the protobuf package the worker crashes at
    init (verified: ImportError google.protobuf), so skip there — the
    applyInPandasWithState tests above cover stateful semantics."""
    import pytest

    pytest.importorskip("google.protobuf")
    from cdc_demo_spark.streaming.stateful import running_user_totals_tws

    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        land = str(tmp_path / "events")
        events = make_events(200)
        write_events(land, events, files=5)
        stream = spark.readStream.schema(SCHEMA).json(land).select("user_id", "value")
        q = (
            running_user_totals_tws(stream)
            .writeStream.format("memory")
            .queryName("tws_totals")
            .outputMode("update")
            .option("checkpointLocation", str(tmp_path / "ckpt_tws"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        got = (
            spark.sql("SELECT * FROM tws_totals")
            .groupBy("user_id")
            .agg(F.max("n").alias("n"), F.max("total").alias("total"))
            .collect()
        )
        batch = (
            spark.read.schema(SCHEMA).json(land)
            .groupBy("user_id")
            .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("total"))
            .collect()
        )
        want = {r["user_id"]: (r["n"], round(r["total"], 6)) for r in batch}
        have = {r["user_id"]: (r["n"], round(r["total"], 6)) for r in got}
        assert have == want
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)


def test_aqe_skew_join_split_fires(spark):
    """Pin AQE's skew-join handling so the session configs can't
    silently regress: on an 80%-hot-key sort-merge join with the skew
    thresholds scaled to test size, the executed adaptive plan must
    mark the join skew=true (AQE split the hot partition into parallel
    subtasks). salted_join stays the explicit escape hatch for the
    single-key-per-task case AQE cannot subdivide.

    Two pitfalls this test encodes (both hit in round 3):

    * The join output must NOT feed a hash-partitioned aggregation —
      OptimizeSkewedJoin duplicates build-side partitions, which breaks
      the join's output partitioning, so AQE skips the split whenever a
      downstream operator requires hash distribution on the join key
      (unless forceOptimizeSkewedJoin).  A bare join + collect keeps the
      join a stage-final operator that AQE may split.
    * Expected cardinality: probe keys are {0 for id%5!=0} ∪ {id for
      multiples of 5}; build keys are 0..1999.  Matches: key 0 carries
      320_000 + 1 rows, keys 5..1995 step 5 carry 1 row each (399) —
      320_400 join rows over 400 distinct keys.
    """
    assert spark.conf.get("spark.sql.adaptive.enabled") == "true"
    assert spark.conf.get("spark.sql.adaptive.skewJoin.enabled") == "true"

    tuned = {
        # scale the 256MB-grade defaults down to the test's data size
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "16KB",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        # force sort-merge (broadcast would hide the shuffle entirely)
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    saved = {k: spark.conf.get(k, None) for k in tuned}

    def run_join():
        probe = spark.range(400_000).select(
            F.when(F.col("id") % 5 != 0, F.lit(0)).otherwise(F.col("id")).alias("k"),
            F.col("id").alias("payload"),
        )
        build = spark.range(2_000).select(
            F.col("id").alias("k"),
            (F.col("id") * 7).alias("dim"),
        )
        # keep payload IN the join output: if it's pruned, the probe
        # shuffle is 320k rows of a constant key, which lz4 compresses
        # to ~the 64KB skew threshold — the pin then flips with JVM
        # state (observed in the r12 two-lane census: failed mid-lane,
        # passed in isolation, both masters).  payload is 320k distinct
        # longs → the hot partition is MBs compressed, 10x+ clear of
        # the threshold in either direction.
        slim = probe.join(build, "k").select(
            (F.col("payload") + F.col("dim")).alias("one")
        )
        n = len(slim.collect())
        plan = slim._jdf.queryExecution().executedPlan().toString()
        return n, plan

    try:
        for k, v in tuned.items():
            spark.conf.set(k, v)
        n, plan = run_join()
        assert n == 320_400
        assert "skew=true" in plan, plan[:2000]
        # negative control: the pin must discriminate — same join with
        # the skew optimizer off must NOT carry the marker
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
        n2, plan2 = run_join()
        assert n2 == 320_400
        assert "skew=true" not in plan2
    finally:
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
