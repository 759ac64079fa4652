"""Property test: distributed sessionization equals a single-threaded
dict-replay oracle on random event streams (ties, bursts, lone events,
multi-user interleaving — whatever Hypothesis throws)."""

from __future__ import annotations

import datetime as dt

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from cdc_demo_spark.queries import QUERIES

GAP = 30 * 60  # seconds, must match q_user_sessions

BASE = dt.datetime(2024, 1, 1)


def streams():
    event = st.tuples(
        st.integers(min_value=1, max_value=4),        # user_id
        st.integers(min_value=0, max_value=200_000),  # offset seconds
    )
    return st.lists(event, min_size=1, max_size=60, unique=True)


def oracle_sessions(events):
    """Single-threaded replay: sort per user by (ts, event_id), cut at
    >GAP gaps, emit (user, seq) -> (n, start, end)."""
    out = {}
    per_user = {}
    for eid, (uid, off) in enumerate(events):
        per_user.setdefault(uid, []).append((BASE + dt.timedelta(seconds=off), eid))
    for uid, evs in per_user.items():
        evs.sort()
        seq = 0
        prev = None
        for ts, _eid in evs:
            if prev is None or (ts - prev).total_seconds() > GAP:
                seq += 1
                out[(uid, seq)] = [0, ts, ts]
            cur = out[(uid, seq)]
            cur[0] += 1
            cur[2] = ts
            prev = ts
    return {
        k: (n, start, end, int((end - start).total_seconds()))
        for k, (n, start, end) in out.items()
    }


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(data=streams())
def test_sessions_equal_replay_oracle(spark, data, tmp_path_factory):
    sf = tmp_path_factory.mktemp("sess")
    rows = [
        (eid, BASE + dt.timedelta(seconds=off), uid, "click", 0.0, "{}")
        for eid, (uid, off) in enumerate(data)
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    df.write.mode("overwrite").parquet(str(sf / "events.parquet"))
    got = {
        (r["user_id"], r["session_seq"]): (
            r["n_events"], r["start_ts"], r["end_ts"], r["duration_sec"]
        )
        for r in QUERIES["q_user_sessions"](spark, str(sf)).collect()
    }
    assert got == oracle_sessions(data)
