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
