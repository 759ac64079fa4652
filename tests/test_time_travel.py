"""Silver time travel + vacuum: historical reads are byte-identical to
the replay oracle AT that commit, the retained window is bounded, the
inline sweep never touches referenced (or fresh) dirs, and vacuum both
reclaims space and invalidates vacuumed versions loudly."""

from __future__ import annotations

import glob
import os
from datetime import datetime

import pytest
from pyspark.sql.types import StringType, StructField, StructType

from cdc_demo_spark.schemas import envelope_schema
from cdc_demo_spark.streaming.generator import generate_events
from cdc_demo_spark.streaming.merge import (
    SnapshotNotFound,
    merge_into_silver,
    read_silver,
    replay_oracle,
    silver_versions,
    vacuum_silver,
)

PAYLOAD = StructType(
    [
        StructField(c, StringType(), True)
        for c in ("name", "owner", "species", "sex", "birth", "death")
    ]
)


def envelope_df(spark, events):
    def conv(e):
        return {**e, "ts": datetime.fromisoformat(e["ts"])}

    return spark.createDataFrame([conv(e) for e in events], envelope_schema(PAYLOAD))


def _rows(spark, silver, version=None):
    df = read_silver(spark, silver, version=version)
    return {r["name"]: r.asDict() for r in df.collect()}


def _expected(events):
    return replay_oracle(events)


def test_time_travel_reads_each_commit_exactly(spark, tmp_path):
    events = generate_events(n_keys=12, n_events=150, seed=7)
    silver = str(tmp_path / "silver")
    n = len(events) // 3
    batches = [events[:n], events[n : 2 * n], events[2 * n :]]
    for b in batches:
        merge_into_silver(spark, envelope_df(spark, b), silver, "pet")
    assert silver_versions(silver) == [1, 2, 3]
    # each historical version equals the oracle replay of its prefix
    for v in (1, 2, 3):
        prefix = [e for b in batches[:v] for e in b]
        want = _expected(prefix)
        got = _rows(spark, silver, version=v)
        assert set(got) == set(want)
        for k, row in want.items():
            assert got[k] == row, f"v{v} mismatch for {k}"
    # default read == newest version
    assert _rows(spark, silver) == _rows(spark, silver, version=3)


def test_retention_window_bounds_versions(spark, tmp_path):
    events = generate_events(n_keys=6, n_events=140, seed=8)
    silver = str(tmp_path / "silver")
    n = len(events) // 7
    for i in range(0, len(events), n):
        merge_into_silver(spark, envelope_df(spark, events[i : i + n]), silver, "pet")
    vs = silver_versions(silver)
    assert len(vs) == 5 and vs[-1] >= 7  # trailing-5 retention
    with pytest.raises(SnapshotNotFound, match="readable versions"):
        read_silver(spark, silver, version=1)
    # every retained version still reads clean (its dirs were never swept
    # inside the grace TTL, and referenced dirs are sweep-immune anyway)
    for v in vs:
        read_silver(spark, silver, version=v).count()


def test_vacuum_reclaims_and_invalidates(spark, tmp_path):
    events = generate_events(n_keys=10, n_events=120, seed=9)
    silver = str(tmp_path / "silver")
    n = len(events) // 3
    for i in range(0, len(events), n):
        merge_into_silver(spark, envelope_df(spark, events[i : i + n]), silver, "pet")
    want_now = _rows(spark, silver)
    dirs_before = set(glob.glob(os.path.join(silver, "data", "b*", "v*")))
    removed = vacuum_silver(silver, retain_last=1, grace_seconds=0.0)
    assert removed and set(removed) <= dirs_before
    # window shrank to the newest version; older reads now refuse
    assert len(silver_versions(silver)) == 1
    with pytest.raises(SnapshotNotFound):
        read_silver(spark, silver, version=1)
    # the current snapshot is untouched, value-exact
    assert _rows(spark, silver) == want_now
    # idempotent: nothing left to reclaim
    assert vacuum_silver(silver, retain_last=1, grace_seconds=0.0) == []


def test_sweep_grace_protects_fresh_unreferenced_dirs(spark, tmp_path):
    # a staged-but-uncommitted rename looks exactly like an
    # unreferenced fresh dir: the default-grace sweep must leave it
    import cdc_demo_spark.streaming.merge as M

    events = generate_events(n_keys=5, n_events=60, seed=10)
    silver = str(tmp_path / "silver")
    merge_into_silver(spark, envelope_df(spark, events), silver, "pet")
    bdir = sorted(glob.glob(os.path.join(silver, "data", "b*")))[0]
    orphan = os.path.join(bdir, "v99-deadbeef")
    os.makedirs(orphan)
    assert M._sweep_unreferenced(silver, [int(os.path.basename(bdir)[1:])],
                                 M.DEFAULT_BACKEND) == []
    assert os.path.isdir(orphan)
    # past the grace TTL it is crash debris and goes
    removed = M._sweep_unreferenced(
        silver, [int(os.path.basename(bdir)[1:])], M.DEFAULT_BACKEND,
        grace_seconds=0.0,
    )
    assert removed == [orphan] and not os.path.isdir(orphan)
