"""Time travel over the bronze log: state_asof(t) must equal the replay
oracle truncated at t, for every probe instant."""

from __future__ import annotations

from datetime import datetime

from cdc_demo_spark.streaming.generator import generate_events
from cdc_demo_spark.streaming.merge import replay_oracle
from cdc_demo_spark.streaming.timetravel import state_asof
from tests.test_cdc_merge import envelope_df


def test_state_asof_matches_truncated_replay(spark):
    events = generate_events(n_keys=10, n_events=120, seed=31, p_delete=0.25)
    bronze = envelope_df(spark, events).cache()

    probes = [events[20]["ts"], events[60]["ts"], events[-1]["ts"]]
    for t in probes:
        upto = [e for e in events if e["ts"] <= t]
        expected = replay_oracle(upto)
        got = {r["name"]: r.asDict() for r in state_asof(bronze, datetime.fromisoformat(t), "pet").collect()}
        assert got == expected, f"divergence at {t}"


def test_state_asof_before_first_event_is_empty(spark):
    events = generate_events(n_keys=5, n_events=20, seed=32)
    bronze = envelope_df(spark, events)
    assert state_asof(bronze, datetime(2000, 1, 1), "pet").count() == 0
