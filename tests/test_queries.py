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


def test_moment_stats_match_builtin_corr(spark, sf_dir):
    """The exact-moment corr/stddev must agree with Spark's streaming
    built-ins to ~1e-9 relative — same statistic, different summation."""
    from pyspark.sql import functions as F
    from cdc_demo_spark.sources.tables import load_table

    got = {r["l_returnflag"]: r for r in QUERIES["q_moment_stats"](spark, sf_dir).collect()}
    ref = {
        r["l_returnflag"]: r
        for r in load_table(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.corr("l_quantity", "l_extendedprice").alias("c"),
            F.covar_samp("l_quantity", "l_extendedprice").alias("cv"),
            F.stddev_samp("l_quantity").alias("sd"),
        )
        .collect()
    }
    for flag, r in ref.items():
        assert abs(got[flag]["corr_qty_price"] - r["c"]) <= 1e-9 * max(1.0, abs(r["c"]))
        assert abs(got[flag]["covar_qty_price"] - r["cv"]) <= 1e-6 * max(1.0, abs(r["cv"]))
        assert abs(got[flag]["stddev_qty"] - r["sd"]) <= 1e-9 * abs(r["sd"])


def test_sessions_respect_gap_invariant(spark, sf_dir):
    """No session may contain an internal gap > 30 min, and consecutive
    sessions of a user must be separated by > 30 min."""
    rows = QUERIES["q_user_sessions"](spark, sf_dir).collect()
    by_user = {}
    for r in rows:
        by_user.setdefault(r["user_id"], []).append(r)
    for user, sess in by_user.items():
        sess.sort(key=lambda r: r["session_seq"])
        for a, b in zip(sess, sess[1:]):
            gap = (b["start_ts"] - a["end_ts"]).total_seconds()
            assert gap > 30 * 60, (user, a["session_seq"], gap)
        for s in sess:
            # avg internal gap bound: duration / (n-1) can exceed 30 min
            # only if some pair does, but each adjacent pair is <= 30 min,
            # so duration <= (n-1) * 30 min
            if s["n_events"] > 1:
                assert s["duration_sec"] <= (s["n_events"] - 1) * 30 * 60


def test_funnel_counts_are_consistent(spark, sf_dir):
    row = QUERIES["q_signup_purchase_funnel"](spark, sf_dir).collect()[0]
    assert 0 < row["n_converted"] <= row["n_signup_users"]
    assert row["total_lag_sec"] >= 0


def test_training_shards_cover_corpus(spark, sf_dir):
    """Shards must partition the corpus exactly (no loss, no overlap)
    and be reasonably balanced (md5 uniformity)."""
    from cdc_demo_spark.sources.tables import load_table

    rows = QUERIES["q_training_shards"](spark, sf_dir).collect()
    n_docs = load_table(spark, sf_dir, "documents").count()
    assert sum(r["n_docs"] for r in rows) == n_docs
    assert len(rows) == 16
    mean = n_docs / 16
    for r in rows:
        assert 0.4 * mean <= r["n_docs"] <= 1.9 * mean


def test_hll_rollup_accuracy_and_merge_consistency(spark, sf_dir):
    """Register-table HLL estimates within 5% of exact; merging
    per-type registers must be LOSSLESS (identical to registers built
    directly over the whole table); the DataSketches built-in
    (hll_sketch_agg, the B23 production alternative) must agree with
    both the exact count and our estimator."""
    from pyspark.sql import functions as F
    from cdc_demo_spark.operators import sketches as SK
    from cdc_demo_spark.sources.tables import load_table

    got = {r["scope"]: r["est_users"]
           for r in QUERIES["q_hll_mergeable_rollup"](spark, sf_dir).collect()}
    ev = load_table(spark, sf_dir, "events")
    exact = {f"type:{r['event_type']}": r["n"]
             for r in ev.groupBy("event_type").agg(
                 F.countDistinct("user_id").alias("n")).collect()}
    exact["ALL"] = ev.agg(F.countDistinct("user_id").alias("n")).collect()[0]["n"]
    for scope, n in exact.items():
        assert abs(got[scope] - n) <= max(2, 0.05 * n), (scope, got[scope], n)
    # mergeability is exact at the register level: max-merge of per-type
    # registers == registers of the whole table (no union error term)
    per_type = SK.hll_registers(ev, ["event_type"], "user_id", p=10)
    merged = per_type.groupBy("bucket").agg(F.max("reg").alias("reg"))
    direct_regs = SK.hll_registers(ev.select(F.lit("x").alias("g"), "user_id"),
                                   ["g"], "user_id", p=10).select("bucket", "reg")
    assert merged.exceptAll(direct_regs).isEmpty()
    assert direct_regs.exceptAll(merged).isEmpty()
    # DataSketches cross-check (kept from the pre-r12 rows-only era)
    direct = ev.agg(F.hll_sketch_agg("user_id").alias("sk")).select(
        F.hll_sketch_estimate("sk").alias("e")).collect()[0]["e"]
    assert abs(direct - exact["ALL"]) <= max(2, 0.05 * exact["ALL"])
    assert abs(got["ALL"] - direct) <= max(2, 0.05 * exact["ALL"])
