"""End-to-end streaming pipeline tests: file source -> DLQ/bronze ->
silver merge, with checkpoint restart (SURVEY.md §5 streaming units)."""

from __future__ import annotations

import os

from pyspark.sql.types import StringType, StructField, StructType

from cdc_demo_spark.streaming.generator import generate_events, scramble, write_event_files
from cdc_demo_spark.streaming.merge import read_silver, replay_oracle
from cdc_demo_spark.streaming.pipeline import CdcPipeline

PAYLOAD = StructType(
    [
        StructField(c, StringType(), True)
        for c in ("name", "owner", "species", "sex", "birth", "death")
    ]
)


def make_pipeline(spark, tmp_path) -> CdcPipeline:
    return CdcPipeline(spark, str(tmp_path / "cdc"), {"pet": PAYLOAD})


def test_stream_end_to_end(spark, tmp_path):
    p = make_pipeline(spark, tmp_path)
    events = generate_events(n_keys=12, n_events=150, seed=5)
    feed = scramble(events, seed=6)
    write_event_files(feed, os.path.join(p.landing_dir, "pet"), files=6)

    p.run_available_now("pet")

    expected = replay_oracle(events)
    got = {r["name"]: r.asDict() for r in read_silver(spark, p.silver_dir("pet")).collect()}
    assert got == expected
    # bronze kept the full (deduped-by-nothing) append log
    bronze = spark.read.parquet(os.path.join(p.bronze_dir, "pet"))
    assert bronze.count() == len(feed)


def test_stream_incremental_and_checkpoint_restart(spark, tmp_path):
    """Drop files in two waves with a fresh run each time: the checkpoint
    must skip wave-1 files on the second run (exactly-once listing, B47)."""
    p = make_pipeline(spark, tmp_path)
    events = generate_events(n_keys=10, n_events=100, seed=8)
    half = len(events) // 2
    write_event_files(events[:half], os.path.join(p.landing_dir, "pet"), files=3, prefix="w1")
    p.run_available_now("pet")
    state_1 = {r["name"]: r.asDict() for r in read_silver(spark, p.silver_dir("pet")).collect()}
    assert state_1 == replay_oracle(events[:half])

    write_event_files(events[half:], os.path.join(p.landing_dir, "pet"), files=3, prefix="w2")
    p.run_available_now("pet")  # new query, same checkpoint
    state_2 = {r["name"]: r.asDict() for r in read_silver(spark, p.silver_dir("pet")).collect()}
    assert state_2 == replay_oracle(events)

    # bronze row count proves wave-1 files were not re-ingested
    bronze = spark.read.parquet(os.path.join(p.bronze_dir, "pet"))
    assert bronze.count() == len(events)


def test_malformed_records_go_to_dlq(spark, tmp_path):
    """A13: unparseable records divert to the dead-letter queue; good
    records in the same file still flow."""
    p = make_pipeline(spark, tmp_path)
    events = generate_events(n_keys=5, n_events=20, seed=9)
    land = os.path.join(p.landing_dir, "pet")
    write_event_files(events, land, files=1)
    with open(os.path.join(land, "zz-badfile.json"), "w") as f:
        f.write('{"op": "c", "seq": broken!!!\n')
        f.write("utter garbage\n")

    p.run_available_now("pet")

    dlq = spark.read.parquet(os.path.join(p.dlq_dir, "pet"))
    assert dlq.count() == 2
    got = {r["name"]: r.asDict() for r in read_silver(spark, p.silver_dir("pet")).collect()}
    assert got == replay_oracle(events)
