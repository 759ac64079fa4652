"""The reference's complete story on its own data (A6+A7+A12): initial
snapshot as 'r' events + scripted binlog deltas -> merge -> the replica
equals the final table state. This is the pipeline the reference
documents but never got working (/root/reference/README.md:8)."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from cdc_demo_spark.sources.menagerie import PET_DELTAS, load_menagerie
from cdc_demo_spark.streaming.envelope import snapshot_as_events
from cdc_demo_spark.streaming.merge import merge_into_silver, read_silver


def _delta_events(spark, rows, start_seq):
    """Scripted INSERTs (README.md:99-110, :217-222) as 'c' envelopes."""
    evs = []
    for i, (name, owner, species, sex, birth, death) in enumerate(rows):
        evs.append(
            {
                "op": "c",
                "ts": datetime(2021, 8, 1, 12, 0, i),
                "seq": start_seq + i,
                "table": "pet",
                "key": name,
                "before": None,
                "after": {"name": name, "owner": owner, "species": species,
                          "sex": sex, "birth": birth, "death": death},
            }
        )
    from pyspark.sql.types import StringType, StructField, StructType

    from cdc_demo_spark.schemas import envelope_schema

    payload = StructType(
        [StructField(c, StringType(), True)
         for c in ("name", "owner", "species", "sex", "birth", "death")]
    )
    return spark.createDataFrame(evs, envelope_schema(payload))


def test_snapshot_plus_deltas_replicates_source(spark, tmp_path):
    silver = str(tmp_path / "silver" / "pet")

    # 1. initial snapshot: current table state as op='r' (A6 backfill)
    pet = load_menagerie(spark)["pet"]
    pet_str = pet.select(*[F.col(c).cast("string") for c in pet.columns])
    snap = snapshot_as_events(pet_str, "pet", key_cols=["name"], start_seq=0)
    merge_into_silver(spark, snap, silver, "pet")
    assert read_silver(spark, silver).count() == 8

    # 2. binlog tail: the scripted delta inserts (A7/A15)
    merge_into_silver(spark, _delta_events(spark, PET_DELTAS, start_seq=100), silver, "pet")

    # 3. replica == source-after-all-writes
    replica = read_silver(spark, silver)
    assert replica.count() == 8 + len(PET_DELTAS)
    names = {r["name"] for r in replica.collect()}
    assert {"Fluffy", "Puffball", "Cyde", "Alfred"} <= names
    # delete one key via 'd', assert it leaves the replica
    from tests.test_cdc_merge import envelope_df

    d = {"op": "d", "ts": "2021-09-01T00:00:00", "seq": 999, "table": "pet",
         "key": "Puffball", "before": None, "after": None}
    merge_into_silver(spark, envelope_df(spark, [d]), silver, "pet")
    assert "Puffball" not in {r["name"] for r in read_silver(spark, silver).collect()}


def test_snapshot_seq_orders_before_live_changes(spark):
    pet = load_menagerie(spark)["pet"]
    pet_str = pet.select(*[F.col(c).cast("string") for c in pet.columns])
    snap = snapshot_as_events(pet_str, "pet", key_cols=["name"], start_seq=0)
    rows = snap.collect()
    assert len(rows) == 8
    assert all(r["op"] == "r" for r in rows)
    assert all(r["key"] is not None for r in rows)
    # seq values CONTIGUOUS from start_seq: the snapshot's highest seq
    # is provably start_seq + n - 1, so a caller can place the whole
    # snapshot below the binlog tail's first seq (the old
    # monotonically_increasing_id scheme jumped by partition_id<<33)
    seqs = sorted(r["seq"] for r in rows)
    assert seqs == list(range(8))

    # contiguity must survive multi-partition input (5 partitions >
    # sorted_max_partitions=4, so auto routes this through the
    # DISTRIBUTED per-partition assignment — no single-task sort)
    snap_mp = snapshot_as_events(
        pet_str.repartition(5), "pet", key_cols=["name"], start_seq=100
    )
    seqs_mp = sorted(r["seq"] for r in snap_mp.collect())
    assert seqs_mp == list(range(100, 108))


def test_distributed_seq_no_global_window_and_converges(spark, tmp_path):
    """VERDICT r14 #6: multi-partition snapshots must not funnel
    through a single-task sort.  Pins (a) the auto gate routes >4
    partitions to the distributed path and its plan has NO
    unpartitioned window, (b) seq stays contiguous, (c) the envelope
    rows are the SAME SET as the sorted path's modulo seq permutation,
    and (d) merging either snapshot converges to the identical
    replica — seq order among 'r' rows can't change the outcome."""
    from cdc_demo_spark.plans import unpartitioned_window_specs
    from cdc_demo_spark.streaming.merge import merge_into_silver, read_silver

    pet = load_menagerie(spark)["pet"]
    pet_str = pet.select(*[F.col(c).cast("string") for c in pet.columns])

    snap_sorted = snapshot_as_events(
        pet_str, "pet", key_cols=["name"], start_seq=0, seq_mode="sorted"
    )
    snap_dist = snapshot_as_events(
        pet_str.repartition(5), "pet", key_cols=["name"], start_seq=0
    )
    # (a) the sorted path IS a global window (documented small-snapshot
    # default); the distributed path must have none
    assert unpartitioned_window_specs(snap_sorted)
    assert unpartitioned_window_specs(snap_dist) == []
    # (b) contiguity
    rows_d = snap_dist.collect()
    assert sorted(r["seq"] for r in rows_d) == list(range(len(rows_d)))
    # (c) identical envelope content modulo the seq permutation
    img = lambda rows: sorted((r["op"], r["key"], tuple(r["after"])) for r in rows)
    assert img(rows_d) == img(snap_sorted.collect())
    # (d) merge convergence equality
    replicas = []
    for tag, snap in (("s", snap_sorted), ("d", snap_dist)):
        silver = str(tmp_path / tag / "pet")
        merge_into_silver(spark, snap, silver, "pet")
        replicas.append(
            sorted(tuple(r) for r in read_silver(spark, silver).collect())
        )
    assert replicas[0] == replicas[1]
    # explicit-mode validation
    import pytest

    with pytest.raises(ValueError, match="seq_mode"):
        snapshot_as_events(pet_str, "pet", key_cols=["name"], seq_mode="bogus")


def test_keyless_table_whole_row_key(spark, tmp_path):
    """SURVEY §1.1: the reference's tables have NO primary key. key_expr
    with key_cols=None serializes the whole row image — identical rows
    collapse to one key (binlog delete+insert semantics), and a delete
    carrying the same image removes exactly that row-identity."""
    from cdc_demo_spark.streaming.envelope import key_expr
    from cdc_demo_spark.schemas import envelope_schema
    from cdc_demo_spark.streaming.merge import merge_into_silver, read_silver
    from pyspark.sql.types import StringType, StructField, StructType
    from datetime import datetime

    payload = StructType([StructField(c, StringType(), True) for c in ("name", "owner")])
    rows = [
        {"op": "c", "ts": datetime(2024, 1, 1), "seq": 1, "table": "pet", "key": None,
         "before": None, "after": {"name": "Fluffy", "owner": "Harold"}},
        # exact duplicate row inserted again (keyless tables allow it;
        # whole-row identity makes the merge idempotent on it)
        {"op": "c", "ts": datetime(2024, 1, 2), "seq": 2, "table": "pet", "key": None,
         "before": None, "after": {"name": "Fluffy", "owner": "Harold"}},
        {"op": "c", "ts": datetime(2024, 1, 3), "seq": 3, "table": "pet", "key": None,
         "before": None, "after": {"name": "Fluffy", "owner": "Gwen"}},
    ]
    env = spark.createDataFrame(rows, envelope_schema(payload))
    env = env.withColumn("key", key_expr(None))  # whole-row identity

    keys = [r["key"] for r in env.select("key").collect()]
    assert keys[0] == keys[1] and keys[0] != keys[2]

    silver = str(tmp_path / "silver")
    merge_into_silver(spark, env, silver, "pet")
    got = {(r["name"], r["owner"]) for r in read_silver(spark, silver).collect()}
    assert got == {("Fluffy", "Harold"), ("Fluffy", "Gwen")}

    # "update" on a keyless table = delete old image + insert new image
    delta = [
        {"op": "d", "ts": datetime(2024, 1, 4), "seq": 4, "table": "pet", "key": None,
         "before": {"name": "Fluffy", "owner": "Harold"},
         "after": None},
    ]
    denv = spark.createDataFrame(delta, envelope_schema(payload))
    # delete keys on the BEFORE image (after is null)
    denv = denv.withColumn("key", key_expr(None, payload_col="after"))
    merge_into_silver(spark, denv, silver, "pet")
    got = {(r["name"], r["owner"]) for r in read_silver(spark, silver).collect()}
    assert got == {("Fluffy", "Gwen")}
