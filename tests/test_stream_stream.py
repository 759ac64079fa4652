"""Stream-stream join + streaming session windows + empty-source
robustness — the remaining Structured Streaming surface."""

from __future__ import annotations

import os
from datetime import timedelta

from pyspark.sql import functions as F

from tests.test_streaming_windows import SCHEMA, make_events, write_events


def test_stream_stream_join_within_time_bound(spark, tmp_path):
    """Two event streams joined per user within a ±30min event-time
    bound; watermarks bound the join state. Streaming result must match
    the identical batch join."""
    land_a, land_b = str(tmp_path / "a"), str(tmp_path / "b")
    evs = make_events(160)
    a_evs = [e for e in evs if e["event_type"] == "a"]
    b_evs = [e for e in evs if e["event_type"] == "b"]
    write_events(land_a, a_evs, files=3)
    write_events(land_b, b_evs, files=3)

    sa = (
        spark.readStream.schema(SCHEMA).json(land_a)
        .select(F.col("user_id").alias("ua"), F.col("event_id").alias("id_a"),
                F.col("ts").alias("ts_a"))
        .withWatermark("ts_a", "1 hour")
    )
    sb = (
        spark.readStream.schema(SCHEMA).json(land_b)
        .select(F.col("user_id").alias("ub"), F.col("event_id").alias("id_b"),
                F.col("ts").alias("ts_b"))
        .withWatermark("ts_b", "1 hour")
    )
    cond = (
        (F.col("ua") == F.col("ub"))
        & (F.col("ts_b") >= F.col("ts_a") - F.expr("INTERVAL 30 MINUTES"))
        & (F.col("ts_b") <= F.col("ts_a") + F.expr("INTERVAL 30 MINUTES"))
    )
    q = (
        sa.join(sb, cond)
        .writeStream.format("memory").queryName("ss_join")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    got = {(r["id_a"], r["id_b"]) for r in spark.sql("SELECT id_a, id_b FROM ss_join").collect()}
    ba = spark.read.schema(SCHEMA).json(land_a).selectExpr("user_id ua", "event_id id_a", "ts ts_a")
    bb = spark.read.schema(SCHEMA).json(land_b).selectExpr("user_id ub", "event_id id_b", "ts ts_b")
    want = {(r["id_a"], r["id_b"]) for r in ba.join(bb, cond).collect()}
    assert got == want and len(got) > 0


def test_streaming_session_window_closed_sessions_match_batch(spark, tmp_path):
    """Session windows under readStream: append mode emits sessions the
    watermark has closed; each must match the batch session set."""
    land = str(tmp_path / "events")
    write_events(land, make_events(250))

    stream = (
        spark.readStream.schema(SCHEMA).json(land)
        .withWatermark("ts", "5 minutes")
        .groupBy("user_id", F.session_window("ts", "30 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select("user_id", F.col("w.start").alias("ws"), "n")
    )
    q = (
        stream.writeStream.format("memory").queryName("sessions")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    emitted = {(r["user_id"], r["ws"], r["n"])
               for r in spark.sql("SELECT * FROM sessions").collect()}

    batch = (
        spark.read.schema(SCHEMA).json(land)
        .groupBy("user_id", F.session_window("ts", "30 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select("user_id", F.col("w.start").alias("ws"), "n")
    )
    want = {(r["user_id"], r["ws"], r["n"]) for r in batch.collect()}
    assert emitted <= want and len(emitted) > 0  # closed subset, all correct


def test_pipeline_with_empty_landing_dir(spark, tmp_path):
    """AvailableNow over an empty source drains cleanly (no files ⇒ no
    batches ⇒ no silver), and a later drop still works."""
    from pyspark.sql.types import StringType, StructField, StructType

    from cdc_demo_spark.streaming.generator import generate_events, write_event_files
    from cdc_demo_spark.streaming.merge import read_silver, replay_oracle
    from cdc_demo_spark.streaming.pipeline import CdcPipeline

    payload = StructType([StructField(c, StringType(), True)
                          for c in ("name", "owner", "species", "sex", "birth", "death")])
    p = CdcPipeline(spark, str(tmp_path / "cdc"), {"pet": payload})
    os.makedirs(os.path.join(p.landing_dir, "pet"), exist_ok=True)
    p.run_available_now("pet")  # nothing to do; must not raise
    assert not os.path.exists(p.silver_dir("pet"))

    events = generate_events(n_keys=6, n_events=30, seed=77)
    write_event_files(events, os.path.join(p.landing_dir, "pet"), files=2)
    p.run_available_now("pet")
    got = {r["name"]: r.asDict() for r in read_silver(spark, p.silver_dir("pet")).collect()}
    assert got == replay_oracle(events)


def test_stream_stream_left_join_emits_nulls_after_watermark(spark, tmp_path):
    """LEFT OUTER stream-stream join: an unmatched left row must be held
    in state while it could still match, then emitted WITH NULLS once
    the watermark passes its join window (eviction). Driven by two
    drains: wave 2 carries much later timestamps, advancing the
    watermark far beyond wave-1's window."""
    land_a, land_b = str(tmp_path / "la"), str(tmp_path / "lb")
    evs = make_events(120)
    a_evs = [e for e in evs if e["event_type"] == "a"]
    b_evs = [e for e in evs if e["event_type"] == "b"]
    # left rows that CANNOT match: user_id outside b's population
    orphans = [
        {**a_evs[0], "event_id": 900001 + i, "user_id": 777 + i} for i in range(3)
    ]
    write_events(land_a, a_evs + orphans, files=3, prefix="w1")
    write_events(land_b, b_evs, files=3, prefix="w1")

    def drain(qname_suffix=""):
        sa = (
            spark.readStream.schema(SCHEMA).json(land_a)
            .select(F.col("user_id").alias("ua"), F.col("event_id").alias("id_a"),
                    F.col("ts").alias("ts_a"))
            .withWatermark("ts_a", "10 minutes")
        )
        sb = (
            spark.readStream.schema(SCHEMA).json(land_b)
            .select(F.col("user_id").alias("ub"), F.col("event_id").alias("id_b"),
                    F.col("ts").alias("ts_b"))
            .withWatermark("ts_b", "10 minutes")
        )
        cond = (
            (F.col("ua") == F.col("ub"))
            & (F.col("ts_b") >= F.col("ts_a") - F.expr("INTERVAL 30 MINUTES"))
            & (F.col("ts_b") <= F.col("ts_a") + F.expr("INTERVAL 30 MINUTES"))
        )
        out = str(tmp_path / "out")
        q = (
            sa.join(sb, cond, "left_outer")
            .writeStream.foreachBatch(
                lambda b, _id: b.write.mode("append").parquet(out)
            )
            .option("checkpointLocation", str(tmp_path / "ck"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return out

    out = drain()
    # wave 2: push the watermark far past wave 1 (+1 day on both sides)
    from datetime import datetime, timedelta

    def bump(e):
        ts = datetime.fromisoformat(e["ts"]) + timedelta(days=1)
        return {**e, "event_id": e["event_id"] + 500000, "ts": ts.isoformat(sep=" ")}

    write_events(land_a, [bump(e) for e in a_evs[:5]], files=1, prefix="w2")
    write_events(land_b, [bump(e) for e in b_evs[:5]], files=1, prefix="w2")
    drain()

    got = spark.read.parquet(out)
    orphan_rows = got.filter(F.col("id_a") >= 900000).collect()
    assert len(orphan_rows) == 3  # evicted exactly once, after watermark
    assert all(r["id_b"] is None and r["ub"] is None for r in orphan_rows)
    # matched pairs equal the batch join (restricted to wave 1)
    ba = spark.read.schema(SCHEMA).json(land_a).filter("event_id < 500000") \
        .selectExpr("user_id ua", "event_id id_a", "ts ts_a")
    bb = spark.read.schema(SCHEMA).json(land_b).filter("event_id < 500000") \
        .selectExpr("user_id ub", "event_id id_b", "ts ts_b")
    cond = (
        (F.col("ua") == F.col("ub"))
        & (F.col("ts_b") >= F.col("ts_a") - F.expr("INTERVAL 30 MINUTES"))
        & (F.col("ts_b") <= F.col("ts_a") + F.expr("INTERVAL 30 MINUTES"))
    )
    want = {(r["id_a"], r["id_b"]) for r in ba.join(bb, cond).collect()}
    have = {(r["id_a"], r["id_b"])
            for r in got.filter("id_a < 500000 AND id_b IS NOT NULL").collect()}
    assert have == want and len(want) > 0
