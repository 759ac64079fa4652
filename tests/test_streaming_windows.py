"""Streaming analytics (B41-B44): watermarked event-time windows and
stateful dedup must agree with the batch computation of the same data."""

from __future__ import annotations

import json
import os
from datetime import datetime, timedelta

from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

SCHEMA = StructType(
    [
        StructField("event_id", LongType(), True),
        StructField("ts", TimestampType(), True),
        StructField("user_id", LongType(), True),
        StructField("event_type", StringType(), True),
        StructField("value", DoubleType(), True),
    ]
)


def write_events(dir_path: str, events: list[dict], files: int = 4, prefix: str = "ev") -> None:
    os.makedirs(dir_path, exist_ok=True)
    per = max(1, (len(events) + files - 1) // files)
    for i in range(0, len(events), per):
        with open(os.path.join(dir_path, f"{prefix}-{i:05d}.json"), "w") as f:
            for e in events[i : i + per]:
                f.write(json.dumps(e) + "\n")


def make_events(n=300):
    import random

    rng = random.Random(17)
    start = datetime(2024, 3, 1)
    out = []
    for i in range(n):
        ts = start + timedelta(minutes=rng.randrange(0, 600), seconds=rng.randrange(60))
        out.append(
            {"event_id": i, "ts": ts.isoformat(), "user_id": rng.randrange(5),
             "event_type": rng.choice(["a", "b"]), "value": round(rng.uniform(0, 10), 2)}
        )
    return out


def test_streaming_tumbling_window_matches_batch(spark, tmp_path):
    land = str(tmp_path / "events")
    write_events(land, make_events())

    stream = (
        spark.readStream.schema(SCHEMA).json(land)
        .withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("ws"), "event_type", "n")
    )
    q = (
        stream.writeStream.format("memory").queryName("tumbling")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    batch = (
        spark.read.schema(SCHEMA).json(land)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("ws"), "event_type", "n")
    )
    got = sorted(map(tuple, spark.sql("SELECT * FROM tumbling").collect()))
    want = sorted(map(tuple, batch.collect()))
    assert got == want and len(got) > 0


def test_streaming_append_mode_emits_only_closed_windows(spark, tmp_path):
    """B41: with append mode, a window emits only once the watermark
    passes its end — the final (still-open) windows stay unemitted."""
    land = str(tmp_path / "events")
    write_events(land, make_events())

    stream = (
        spark.readStream.schema(SCHEMA).json(land)
        .withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("ws"), F.col("w.end").alias("we"), "n")
    )
    q = (
        stream.writeStream.format("memory").queryName("appendw")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    emitted = spark.sql("SELECT * FROM appendw").collect()
    batch = (
        spark.read.schema(SCHEMA).json(land)
        .agg(F.max("ts").alias("mx")).collect()
    )
    watermark = batch[0]["mx"] - timedelta(minutes=10)
    assert len(emitted) > 0
    for r in emitted:
        assert r["we"] <= watermark  # only closed windows were emitted


def test_streaming_stateful_dedup(spark, tmp_path):
    """B44: dropDuplicates under a watermark collapses redeliveries
    across micro-batches."""
    land = str(tmp_path / "events")
    events = make_events(150)
    feed = events + events[:60] + events[30:90]  # heavy redelivery
    write_events(land, feed, files=6)

    stream = (
        spark.readStream.schema(SCHEMA).json(land)
        .withWatermark("ts", "2 hours")
        .dropDuplicates(["event_id"])
    )
    q = (
        stream.writeStream.format("memory").queryName("dedup")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt3"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    assert spark.sql("SELECT count(*) c FROM dedup").collect()[0]["c"] == len(events)


def test_windowed_aggregate_state_survives_restart(spark, tmp_path):
    """Append-mode window counts across two drains with one checkpoint:
    a window spanning both waves must be emitted once, with the TOTAL
    count (state store persisted the partial)."""
    land = str(tmp_path / "events")
    events = make_events(300)
    events.sort(key=lambda e: e["ts"])
    half = len(events) // 2
    write_events(land, events[:half], files=2, prefix="w1")

    def drain(qname):
        stream = (
            spark.readStream.schema(SCHEMA).json(land)
            .withWatermark("ts", "10 minutes")
            .groupBy(F.window("ts", "1 hour").alias("w"))
            .agg(F.count(F.lit(1)).alias("n"))
            .select(F.col("w.start").alias("ws"), "n")
        )
        q = (
            stream.writeStream.foreachBatch(
                lambda b, _i: b.write.mode("append").parquet(str(tmp_path / "out"))
            )
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    drain("w1")
    write_events(land, events[half:], files=2, prefix="w2")
    drain("w2")

    got = {r["ws"]: r["n"] for r in spark.read.parquet(str(tmp_path / "out")).collect()}
    assert len(got) == len(set(got))  # each window emitted exactly once
    batch = (
        spark.read.schema(SCHEMA).json(land)
        .groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("ws"), "n")
    )
    want = {r["ws"]: r["n"] for r in batch.collect()}
    # every emitted window matches the batch total (incl. boundary
    # windows whose rows arrived across BOTH waves)
    for ws, n in got.items():
        assert want[ws] == n
