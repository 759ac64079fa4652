"""Notification-driven ingest (A9 implemented): files enter the
pipeline because they were NOTIFIED, never because a landing-dir
listing found them — the reference's OBJECT_FINALIZE -> Pub/Sub chain
(/root/reference/main.tf:163-181) as a Spark-native notification log.

The discriminating assertion is the negative one: a file that exists
in the landing dir but was never notified must NOT be ingested — that
is exactly the observable difference between notification-driven and
listing-driven discovery.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql.types import StringType, StructField, StructType

from cdc_demo_spark.streaming.generator import (
    generate_events,
    scramble,
    write_event_files,
)
from cdc_demo_spark.streaming.merge import read_silver, replay_oracle
from cdc_demo_spark.streaming.pipeline import NotifiedCdcPipeline

PAYLOAD = StructType(
    [
        StructField(c, StringType(), True)
        for c in ("name", "owner", "species", "sex", "birth", "death")
    ]
)


def _pipe(spark, tmp_path) -> NotifiedCdcPipeline:
    return NotifiedCdcPipeline(spark, str(tmp_path / "cdc"), {"pet": PAYLOAD})


def _silver_names(spark, p):
    return {r["name"] for r in read_silver(spark, p.silver_dir("pet")).collect()}


def test_only_notified_files_are_ingested(spark, tmp_path):
    p = _pipe(spark, tmp_path)
    events = scramble(generate_events(n_keys=12, n_events=60))
    half = len(events) // 2
    land = os.path.join(p.landing_dir, "pet")
    wave1 = write_event_files(events[:half], land, files=3, prefix="w1")
    write_event_files(events[half:], land, files=3, prefix="w2")  # NOT notified

    p.notify("pet", wave1)
    p.run_notified_available_now("pet")

    expected_w1 = {
        row["name"] for row in replay_oracle(events[:half]).values()
    }
    assert _silver_names(spark, p) == expected_w1  # w2 landed but invisible


def test_late_notification_converges(spark, tmp_path):
    p = _pipe(spark, tmp_path)
    events = scramble(generate_events(n_keys=12, n_events=60))
    half = len(events) // 2
    land = os.path.join(p.landing_dir, "pet")
    wave1 = write_event_files(events[:half], land, files=3, prefix="w1")
    wave2 = write_event_files(events[half:], land, files=3, prefix="w2")

    p.notify("pet", wave1)
    p.run_notified_available_now("pet")
    p.notify("pet", wave2)
    p.run_notified_available_now("pet")  # resumes from the same checkpoint

    expected = {row["name"] for row in replay_oracle(events).values()}
    assert _silver_names(spark, p) == expected


def test_redelivered_notification_is_idempotent(spark, tmp_path):
    """Producer retry: the same object notified twice (in different
    notification files) must not duplicate its events downstream."""
    p = _pipe(spark, tmp_path)
    events = scramble(generate_events(n_keys=10, n_events=40))
    land = os.path.join(p.landing_dir, "pet")
    paths = write_event_files(events, land, files=2, prefix="w1")

    p.notify("pet", paths)
    p.notify("pet", [paths[0]])  # redelivery of the first object
    p.run_notified_available_now("pet")

    expected = {row["name"] for row in replay_oracle(events).values()}
    assert _silver_names(spark, p) == expected


def test_notification_before_data_raises(spark, tmp_path):
    p = _pipe(spark, tmp_path)
    p.notify("pet", [os.path.join(p.landing_dir, "pet", "never-written.json")])
    with pytest.raises(Exception, match="notified objects missing"):
        p.run_notified_available_now("pet")


def test_notified_avro_ingest(spark, tmp_path):
    """A9 × A8: notification-driven discovery of AVRO change files (the
    reference's preferred landing format) — listed objects decode
    through the same container codec as the streaming source and
    converge through the merge."""
    from cdc_demo_spark.schemas import envelope_schema
    from cdc_demo_spark.sources.formats import write_avro
    from cdc_demo_spark.streaming.envelope import payload_type  # noqa: F401

    p = NotifiedCdcPipeline(
        spark, str(tmp_path / "cdc"), {"pet": PAYLOAD}, fmt="avro"
    )
    events = scramble(generate_events(n_keys=10, n_events=50))
    env = spark.createDataFrame(
        [
            {**e, "ts": __import__("datetime").datetime.fromisoformat(e["ts"])}
            for e in events
        ],
        envelope_schema(PAYLOAD),
    ).repartition(3)
    land = os.path.join(p.landing_dir, "pet")
    write_avro(env, land)
    paths = [
        os.path.join(land, f) for f in os.listdir(land) if f.endswith(".avro")
    ]
    assert len(paths) >= 2
    p.notify("pet", paths)
    p.run_notified_available_now("pet")

    expected = {row["name"] for row in replay_oracle(events).values()}
    assert _silver_names(spark, p) == expected
