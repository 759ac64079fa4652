"""Exactly-once JDBC upsert sink (streaming/jdbc_sink.py) against
embedded Derby: convergence vs the replay oracle, replayed-batch
no-op, and crash-before-commit atomicity — the three behaviors that
make an at-least-once foreachBatch exactly-once at the warehouse.
"""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from cdc_demo_spark.streaming.jdbc_sink import JdbcUpsertSink
from cdc_demo_spark.streaming.merge import replay_oracle

DERBY = "org.apache.derby.jdbc.EmbeddedDriver"


def _url(tmp_path) -> str:
    return f"jdbc:derby:{tmp_path}/sinkdb;create=true"


def _events(seq0, rows):
    out = []
    for i, (op, k, owner) in enumerate(rows):
        out.append(
            {
                "op": op,
                "ts": dt.datetime(2024, 1, 1) + dt.timedelta(seconds=seq0 + i),
                "seq": seq0 + i,
                "table": "pet",
                "key": k,
                "after": None
                if op == "d"
                else {"name": k, "owner": owner},
            }
        )
    return out


def _df(spark, events):
    return spark.createDataFrame(
        events,
        "op string, ts timestamp, seq long, table string, key string, "
        "after struct<name:string, owner:string>",
    )


def _served(spark, sink):
    return {
        (r["name"], r["owner"]) for r in sink.read_target().collect()
    }


def test_upsert_converges_across_batches(spark, tmp_path):
    sink = JdbcUpsertSink(spark, _url(tmp_path), "pet", driver=DERBY)
    b0 = _events(0, [("c", "a", "x"), ("c", "b", "x"), ("c", "c", "x")])
    b1 = _events(10, [("u", "a", "y"), ("d", "b", None), ("c", "d", "z")])
    sink.process_batch(_df(spark, b0), 0)
    sink.process_batch(_df(spark, b1), 1)
    expected = {
        (v["name"], v["owner"]) for v in replay_oracle(b0 + b1).values()
    }
    assert _served(spark, sink) == expected == {("a", "y"), ("c", "x"), ("d", "z")}


def test_replayed_batch_is_noop(spark, tmp_path):
    sink = JdbcUpsertSink(spark, _url(tmp_path), "pet", driver=DERBY)
    b0 = _events(0, [("c", "a", "x"), ("c", "b", "x")])
    sink.process_batch(_df(spark, b0), 0)
    before = _served(spark, sink)
    # at-least-once replay of the SAME batch id — even with different
    # (corrupted/reordered) content it must not touch the target
    sink.process_batch(_df(spark, _events(0, [("u", "a", "EVIL")])), 0)
    assert _served(spark, sink) == before
    assert sink.read_target().count() == 2  # no duplicate rows either


def test_crash_before_commit_applies_nothing(spark, tmp_path):
    sink = JdbcUpsertSink(spark, _url(tmp_path), "pet", driver=DERBY)
    sink.process_batch(_df(spark, _events(0, [("c", "a", "x")])), 0)

    # crash model: the transaction raises after the DELETE+INSERT but
    # before COMMIT (bookkeeping insert fails)
    real_execute = sink._execute

    def boom(conn, sql):
        if sql.startswith("INSERT INTO SPARK_SINK_BATCHES"):
            raise RuntimeError("crash before commit")
        real_execute(conn, sql)

    sink._execute = boom
    with pytest.raises(RuntimeError, match="crash before commit"):
        sink.process_batch(_df(spark, _events(10, [("u", "a", "y")])), 1)
    sink._execute = real_execute

    # nothing applied, marker absent -> retry applies cleanly
    assert _served(spark, sink) == {("a", "x")}
    sink.process_batch(_df(spark, _events(10, [("u", "a", "y")])), 1)
    assert _served(spark, sink) == {("a", "y")}


def test_within_batch_collapse_delete_wins_ties(spark, tmp_path):
    sink = JdbcUpsertSink(spark, _url(tmp_path), "pet", driver=DERBY)
    ev = _events(0, [("c", "a", "x")])
    tied_delete = {**ev[0], "op": "d", "after": None}  # same (ts, seq)
    sink.process_batch(_df(spark, [ev[0], tied_delete]), 0)
    assert _served(spark, sink) == set()


def test_streaming_foreachbatch_into_warehouse(spark, tmp_path):
    """The full reporting-table path: landing JSON files -> readStream
    -> foreachBatch(JdbcUpsertSink) with a checkpoint -> Derby target,
    across a stop/resume boundary (A12's MERGE hop, served to a real
    JDBC warehouse end-to-end)."""
    import os

    from cdc_demo_spark.schemas import envelope_schema
    from cdc_demo_spark.streaming.generator import generate_events, write_event_files
    from pyspark.sql.types import StringType, StructField, StructType

    payload = StructType(
        [
            StructField(c, StringType(), True)
            for c in ("name", "owner", "species", "sex", "birth", "death")
        ]
    )
    land = str(tmp_path / "landing")
    ckpt = str(tmp_path / "ckpt")
    events = generate_events(n_keys=10, n_events=60, seed=21)
    half = len(events) // 2
    write_event_files(events[:half], land, files=2, prefix="w1")

    sink = JdbcUpsertSink(spark, _url(tmp_path), "pet", driver=DERBY)

    def run():
        src = (
            spark.readStream.schema(envelope_schema(payload))
            .option("maxFilesPerTrigger", "1")
            .json(land)
        )
        q = (
            src.writeStream.foreachBatch(sink.process_batch)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    run()
    write_event_files(events[half:], land, files=2, prefix="w2")
    run()  # resume from the same checkpoint

    got = {
        (r["name"], r["owner"]) for r in sink.read_target().collect()
    }
    expected = {
        (v["name"], v["owner"]) for v in replay_oracle(events).values()
    }
    assert got == expected and got


def test_late_stale_batch_cannot_roll_back(spark, tmp_path):
    """B46 ACROSS batches: a late batch of older events must not
    displace newer warehouse rows, and an old insert arriving after a
    delete meets the tombstone and loses."""
    sink = JdbcUpsertSink(spark, _url(tmp_path), "pet", driver=DERBY)
    sink.process_batch(
        _df(spark, _events(100, [("u", "a", "new"), ("d", "b", None)])), 0
    )
    # late batch: strictly older events for both keys
    sink.process_batch(
        _df(spark, _events(0, [("c", "a", "stale"), ("c", "b", "zombie")])), 1
    )
    assert _served(spark, sink) == {("a", "new")}  # b stays deleted


def test_table_name_must_be_plain_identifier(spark, tmp_path):
    """ADVICE r6: the sink interpolates the table name into SQL — a
    name with quotes/metacharacters must be rejected at construction,
    before any statement is built."""
    import pytest

    for bad in ["pet'; DROP TABLE x--", 'pe"t', "pet table", "1pet", ""]:
        with pytest.raises(ValueError, match="identifier"):
            JdbcUpsertSink(spark, _url(tmp_path), bad, driver=DERBY)
