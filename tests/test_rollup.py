"""Incremental rollup (streaming/rollup.py): the log-structured
aggregate view must equal the one-shot aggregate under batching,
replays, compaction, and crash orphans."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from cdc_demo_spark.sources.tables import load_table
from cdc_demo_spark.streaming.rollup import IncrementalRollup


def _expected(ev):
    return {
        (r["event_type"],): (r["cnt"], r["total"])
        for r in ev.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum(F.col("value").cast("decimal(38,6)")).alias("total"),
        )
        .collect()
    }


def _got(roll):
    return {
        (r["event_type"],): (r["cnt"], r["val_sum"]) for r in roll.read().collect()
    }


def test_incremental_equals_one_shot(spark, sf_dir, tmp_path):
    ev = load_table(spark, sf_dir, "events")
    roll = IncrementalRollup(spark, str(tmp_path), ["event_type"], "value")
    for i in range(4):
        roll.apply_batch(ev.filter(F.col("event_id") % 4 == i), batch_id=i)
    assert _got(roll) == _expected(ev)


def test_replayed_batch_is_idempotent(spark, sf_dir, tmp_path):
    ev = load_table(spark, sf_dir, "events")
    roll = IncrementalRollup(spark, str(tmp_path), ["event_type"], "value")
    for i in range(2):
        roll.apply_batch(ev.filter(F.col("event_id") % 2 == i), batch_id=i)
    before = _got(roll)
    # at-least-once foreachBatch redelivers batch 1 after a crash
    roll.apply_batch(ev.filter(F.col("event_id") % 2 == 1), batch_id=1)
    assert _got(roll) == before == _expected(ev)


def test_compaction_is_invisible_and_composes(spark, sf_dir, tmp_path):
    ev = load_table(spark, sf_dir, "events")
    roll = IncrementalRollup(spark, str(tmp_path), ["event_type"], "value")
    roll.apply_batch(ev.filter(F.col("event_id") % 3 == 0), batch_id=0)
    roll.apply_batch(ev.filter(F.col("event_id") % 3 == 1), batch_id=1)
    roll.compact()
    mid = _got(roll)
    assert mid == _expected(ev.filter(F.col("event_id") % 3 != 2))
    # a batch arriving after compaction lands as a fresh partial
    roll.apply_batch(ev.filter(F.col("event_id") % 3 == 2), batch_id=2)
    assert _got(roll) == _expected(ev)


def test_uncommitted_compaction_orphan_is_invisible(spark, sf_dir, tmp_path):
    ev = load_table(spark, sf_dir, "events")
    roll = IncrementalRollup(spark, str(tmp_path), ["event_type"], "value")
    roll.apply_batch(ev, batch_id=0)
    before = _got(roll)
    # simulate a compaction that crashed after writing its base dir but
    # before the manifest commit: write garbage into an orphan base
    ev.limit(5).groupBy("event_type").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.sum(F.col("value").cast("decimal(38,6)")).alias("val_sum"),
    ).write.parquet(os.path.join(str(tmp_path), "base-deadbeef"))
    assert _got(roll) == before


def test_empty_rollup_raises(spark, tmp_path):
    roll = IncrementalRollup(spark, str(tmp_path), ["event_type"], "value")
    with pytest.raises(FileNotFoundError):
        roll.read()


def test_rollup_sink_through_real_stream(spark, sf_dir, tmp_path):
    """Drive the rollup via an actual Structured Streaming query
    (file source → foreachBatch(rollup_sink), availableNow) in two
    waves under one checkpoint: the view must equal the batch
    aggregate of everything ingested, and the second wave must not
    re-fold wave-1 files (exactly-once listing feeds idempotent
    partials)."""
    import os

    from cdc_demo_spark.streaming.rollup import rollup_sink

    ev = load_table(spark, sf_dir, "events")
    land = str(tmp_path / "land")
    ckpt = str(tmp_path / "ckpt")
    roll = IncrementalRollup(spark, str(tmp_path / "roll"), ["event_type"], "value")

    def run_wave(pred, prefix):
        ev.filter(pred).coalesce(1).write.mode("overwrite").parquet(
            str(tmp_path / f"stage_{prefix}")
        )
        for i, name in enumerate(
            f for f in os.listdir(tmp_path / f"stage_{prefix}") if f.endswith(".parquet")
        ):
            os.rename(
                tmp_path / f"stage_{prefix}" / name, f"{land}/{prefix}-{i}.parquet"
            )
        (
            spark.readStream.schema(ev.schema)
            .parquet(land)
            .writeStream.foreachBatch(rollup_sink(roll))
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
            .awaitTermination(120)
        )

    os.makedirs(land)
    run_wave(F.col("event_id") % 2 == 0, "w1")
    assert _got(roll) == _expected(ev.filter(F.col("event_id") % 2 == 0))
    run_wave(F.col("event_id") % 2 == 1, "w2")
    assert _got(roll) == _expected(ev)


def test_concurrent_compaction_loses_loudly(spark, sf_dir, tmp_path):
    """Two compactions racing on the same manifest version: the second
    commit must raise ConcurrentCommitError (never silently discard the
    first), and the committed state must stay correct."""
    import pytest as _pytest

    from cdc_demo_spark.streaming.merge import ConcurrentCommitError

    ev = load_table(spark, sf_dir, "events")
    roll = IncrementalRollup(spark, str(tmp_path), ["event_type"], "value")
    roll.apply_batch(ev, batch_id=0)
    expected = _got(roll)

    # writer A computes its compaction but stalls before commit;
    # writer B compacts and commits first
    manifest_before = roll._manifest()
    roll.compact()  # writer B wins
    stale = {"version": (manifest_before or {"version": 0}).get("version", 0),
             "base": "base-stale", "merged_through": 0}
    with _pytest.raises(ConcurrentCommitError):
        roll._commit(stale)  # writer A's late commit must fail
    assert _got(roll) == expected
