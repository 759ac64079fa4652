"""Hypothesis-driven CDC convergence: arbitrary op sequences, arbitrary
batch splits, arbitrary interleavings — the merge must always equal the
sequential replay (SURVEY.md §5 property-based variant)."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from tests.test_cdc_merge import assert_matches_oracle, envelope_df
from cdc_demo_spark.streaming.merge import merge_into_silver

KEYS = ["k0", "k1", "k2", "k3"]


@st.composite
def logs(draw):
    n = draw(st.integers(min_value=1, max_value=30))
    events = []
    for seq in range(n):
        key = draw(st.sampled_from(KEYS))
        op = draw(st.sampled_from(["c", "u", "d"]))
        ts = f"2024-01-01T00:{seq:02d}:00"
        after = (
            None
            if op == "d"
            else {"name": key, "owner": draw(st.sampled_from(["a", "b", "c"])),
                  "species": "cat", "sex": None, "birth": None, "death": None}
        )
        events.append({"op": op, "ts": ts, "seq": seq, "table": "pet",
                       "key": key, "before": None, "after": after})
    order = draw(st.permutations(range(n)))
    cuts = sorted(draw(st.sets(st.integers(min_value=1, max_value=max(1, n - 1)),
                               max_size=3)))
    return events, [events[i] for i in order], cuts


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(data=logs())
def test_merge_always_converges(spark, tmp_path_factory, data):
    events, shuffled, cuts = data
    silver = str(tmp_path_factory.mktemp("hyp") / "silver")
    bounds = [0, *cuts, len(shuffled)]
    for lo, hi in zip(bounds, bounds[1:]):
        if lo < hi:
            merge_into_silver(spark, envelope_df(spark, shuffled[lo:hi]), silver, "pet")
    # oracle: replay in (ts, seq) order; keys whose winner is 'd' absent
    assert_matches_oracle(spark, silver, events)
