"""Registry-wide smoke: every registered query runs at sf0.001 with a
stable schema and sane output. Value correctness is covered by the
oracle-differential harness (tools/check_oracle.py / the driver)."""

from __future__ import annotations

import pytest

from cdc_demo_spark.queries import ORACLES, QUERIES

# queries allowed to return empty at the smallest SF
MAY_BE_EMPTY = {"q_embedding_near_dups"}


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_runs(spark, sf_dir, name):
    df = QUERIES[name](spark, sf_dir)
    rows = df.collect()
    assert df.columns, name
    if name not in MAY_BE_EMPTY:
        assert rows, f"{name} returned no rows at sf0.001"


def test_every_query_has_unique_columns(spark, sf_dir):
    for name, fn in QUERIES.items():
        cols = fn(spark, sf_dir).columns
        assert len(cols) == len(set(cols)), f"{name} has duplicate column names"


def test_oracles_reference_registered_queries():
    assert set(ORACLES) <= set(QUERIES)


def test_approx_count_distinct_accuracy(spark, sf_dir):
    """B23: HLL++ at rsd=0.01 must be within 5% of exact."""
    approx = {r["event_type"]: r["approx_users"]
              for r in QUERIES["q_approx_count_distinct"](spark, sf_dir).collect()}
    exact = {r["event_type"]: r["n_users"]
             for r in QUERIES["q_count_distinct"](spark, sf_dir).collect()}
    for k, v in exact.items():
        assert abs(approx[k] - v) <= max(1, 0.05 * v)


def test_approx_percentile_accuracy(spark, sf_dir):
    """Sketch percentiles within 2% relative error of exact."""
    exact = {r["l_returnflag"]: r for r in QUERIES["q_percentiles"](spark, sf_dir).collect()}
    approx = {r["l_returnflag"]: r for r in
              QUERIES["q_approx_percentiles"](spark, sf_dir).collect()}
    for k, e in exact.items():
        for p in ("p50", "p90", "p99"):
            assert abs(approx[k][p] - e[p]) <= 0.02 * abs(e[p]), (k, p)
