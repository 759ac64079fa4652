"""A7 consumed-contract: Debezium-shaped JSON (the public wire format
of the standard binlog reader for the MySQL the reference provisions)
flows through from_debezium -> merge and converges to the source
table's replay state.

The adapter's one nontrivial decision is the seq packing: binlog
coordinate (file, pos) -> file_index * 2^40 + pos.  The cross-file
ordering test pins that a low position in a later file outranks a high
position in an earlier file — ts_ms alone (millisecond-coarse) ties
under load, which is exactly when ordering matters.
"""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

from cdc_demo_spark.streaming.envelope import from_debezium
from cdc_demo_spark.streaming.merge import merge_into_silver, read_silver

PAYLOAD = StructType(
    [
        StructField("id", LongType(), True),
        StructField("name", StringType(), True),
        StructField("species", StringType(), True),
    ]
)


def _msg(op, before, after, ts_ms, file, pos, table="pet"):
    return json.dumps(
        {
            "payload": {
                "before": before,
                "after": after,
                "op": op,
                "ts_ms": ts_ms,
                "source": {"table": table, "file": f"mysql-bin.{file:06d}", "pos": pos},
            }
        }
    )


@pytest.fixture()
def raw(spark):
    rows = [
        # snapshot read, then the binlog tail mutates the table
        _msg("r", None, {"id": 1, "name": "Fluffy", "species": "cat"}, 1_700_000_000_000, 1, 100),
        _msg("r", None, {"id": 2, "name": "Claws", "species": "cat"}, 1_700_000_000_000, 1, 101),
        _msg("c", None, {"id": 3, "name": "Buffy", "species": "dog"}, 1_700_000_001_000, 1, 500),
        _msg(
            "u",
            {"id": 1, "name": "Fluffy", "species": "cat"},
            {"id": 1, "name": "Fluffy II", "species": "cat"},
            1_700_000_002_000,
            1,
            900,
        ),
        _msg("d", {"id": 2, "name": "Claws", "species": "cat"}, None, 1_700_000_003_000, 2, 50),
        # Debezium emits tombstone-less garbage sometimes; unknown op -> dropped
        _msg("x", None, None, 1_700_000_004_000, 2, 60),
    ]
    return spark.createDataFrame([(r,) for r in rows], "value string")


def _split(env):
    good = env.filter(F.col("_corrupt").isNull()).drop("_corrupt")
    bad = env.filter(F.col("_corrupt").isNotNull())
    return good, bad


def test_debezium_to_envelope_shape(spark, raw):
    env = from_debezium(raw, PAYLOAD, key_cols=["id"])
    assert [f.name for f in env.schema.fields] == [
        "op", "ts", "seq", "table", "key", "before", "after", "_corrupt",
    ]
    good, bad = _split(env)
    rows = {r["seq"]: r for r in good.collect()}
    assert len(rows) == 5  # unknown op routed to _corrupt, not kept
    assert bad.count() == 1
    ins = rows[(1 << 40) + 500]
    assert ins["op"] == "c" and ins["after"]["name"] == "Buffy"
    assert ins["key"] == "3"
    delete = rows[(2 << 40) + 50]
    assert delete["op"] == "d" and delete["after"] is None and delete["key"] == "2"


def test_debezium_corrupt_routing_not_silent(spark):
    """ADVICE r6: unparseable messages, unknown ops (Debezium 't'
    truncate), and missing/unparseable binlog coordinates must come
    back on _corrupt with the raw message — never vanish, and never
    yield a null seq that dropDuplicates would treat as equal."""
    rows = [
        "this is not json at all {{{",
        _msg("t", None, None, 1_700_000_000_000, 1, 10),  # truncate op
        # binlog file with no digits -> file_idx unparseable -> null seq
        json.dumps(
            {
                "payload": {
                    "before": None,
                    "after": {"id": 7, "name": "G", "species": "x"},
                    "op": "c",
                    "ts_ms": 1_700_000_000_000,
                    "source": {"table": "pet", "file": "garbage-name", "pos": 5},
                }
            }
        ),
        # missing source block entirely -> null seq
        json.dumps(
            {
                "payload": {
                    "before": None,
                    "after": {"id": 8, "name": "H", "species": "x"},
                    "op": "c",
                    "ts_ms": 1_700_000_000_000,
                }
            }
        ),
        _msg("c", None, {"id": 1, "name": "ok", "species": "x"}, 1_700_000_000_000, 1, 99),
    ]
    raw = spark.createDataFrame([(r,) for r in rows], "value string")
    good, bad = _split(from_debezium(raw, PAYLOAD, key_cols=["id"]))
    assert good.count() == 1 and good.collect()[0]["key"] == "1"
    bad_rows = bad.collect()
    assert len(bad_rows) == 4
    # the raw message is preserved verbatim for the DLQ
    assert any("not json at all" in r["_corrupt"] for r in bad_rows)
    # no good row may carry a null seq (dropDuplicates null-equality)
    assert good.filter(F.col("seq").isNull()).count() == 0
    # distinct events with unparseable coordinates must NOT collapse:
    # both null-seq rows survive on the corrupt side individually
    assert sum("garbage-name" in r["_corrupt"] for r in bad_rows) == 1


def test_cross_file_ordering(spark, raw):
    """pos 50 in file 2 must outrank pos 900 in file 1 — the packed seq
    preserves the server's (file, pos) total order."""
    env, _ = _split(from_debezium(raw, PAYLOAD, key_cols=["id"]))
    seqs = {(r["op"], r["key"]): r["seq"] for r in env.collect()}
    assert seqs[("d", "2")] > seqs[("u", "1")]


def test_debezium_stream_converges_through_merge(spark, raw, tmp_path):
    env, _ = _split(from_debezium(raw, PAYLOAD, key_cols=["id"]))
    silver = str(tmp_path / "silver")
    merge_into_silver(spark, env, silver, "pet", num_buckets=4)
    got = {(r["id"], r["name"]) for r in read_silver(spark, silver).collect()}
    assert got == {(1, "Fluffy II"), (3, "Buffy")}  # update applied, delete applied


def test_same_millisecond_ordering_resolved_by_binlog_pos(spark, tmp_path):
    """Two updates to one key in the SAME millisecond: ts ties, the
    binlog position decides — the exact case a ts-only seq would get
    wrong nondeterministically."""
    rows = [
        _msg("c", None, {"id": 9, "name": "A", "species": "x"}, 1_700_000_000_000, 3, 10),
        _msg(
            "u",
            {"id": 9, "name": "A", "species": "x"},
            {"id": 9, "name": "B", "species": "x"},
            1_700_000_000_500,
            3,
            20,
        ),
        _msg(
            "u",
            {"id": 9, "name": "B", "species": "x"},
            {"id": 9, "name": "C", "species": "x"},
            1_700_000_000_500,
            3,
            30,
        ),
    ]
    raw = spark.createDataFrame([(r,) for r in rows], "value string")
    env, _ = _split(from_debezium(raw, PAYLOAD, key_cols=["id"]))
    silver = str(tmp_path / "silver")
    # deliver in reverse order — the merge must still pick pos 30
    merge_into_silver(spark, env.orderBy(F.desc("seq")), silver, "pet", num_buckets=4)
    got = {(r["id"], r["name"]) for r in read_silver(spark, silver).collect()}
    assert got == {(9, "C")}
