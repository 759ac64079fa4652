"""MomentsIndex (operators/incremental_moments.py): fourth
AdditiveLedger member, the one exercising the base's MULTI-column SUM
merge (n, s1, s2) — integer-scaled DECIMAL sums make the moment state
exactly mergeable where raw double sums never could be.  Protocol
depth is pinned by the Count-Min suite; this file proves the moments
instantiation and the derived statistics.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from cdc_demo_spark.operators.incremental_moments import MomentsIndex
from cdc_demo_spark.storage import (
    DEFAULT_BACKEND,
    ConcurrentAppendError,
    InMemoryCommitBackend,
)

SCALE = 100


def _rows(spark, start, n):
    # two groups, deterministic values with a .01 grain the scale
    # captures exactly
    return spark.range(start, start + n).select(
        F.when(F.col("id") % 2 == 0, "even").otherwise("odd").alias("g"),
        (((F.col("id") * 73) % 1000) / 100.0).alias("v"),
    )


@pytest.fixture(params=["posix", "memory"])
def be(request):
    return DEFAULT_BACKEND if request.param == "posix" else InMemoryCommitBackend()


def _one_shot_state(spark, start, n):
    df = _rows(spark, start, n)
    y = F.round(F.col("v") * SCALE)
    return {
        (r["grp"], r["n"], r["s1"], r["s2"])
        for r in df.select(F.col("g").alias("grp"), y.alias("y"))
        .groupBy("grp")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("y").cast("decimal(38,0)")).alias("s1"),
            F.sum((F.col("y") * F.col("y")).cast("decimal(38,0)")).alias("s2"),
        )
        .collect()
    }


def test_incremental_equals_one_shot_exact(spark, tmp_path, be):
    idx = MomentsIndex(spark, str(tmp_path / "m"), SCALE, backend=be)
    idx.append_batch(_rows(spark, 0, 300), "g", "v")
    idx.append_batch(_rows(spark, 300, 200), "g", "v")
    got = {
        (r["grp"], r["n"], r["s1"], r["s2"]) for r in idx.moments().collect()
    }
    assert got == _one_shot_state(spark, 0, 500)


def test_stats_match_python_reference(spark, tmp_path, be):
    idx = MomentsIndex(spark, str(tmp_path / "m"), SCALE, backend=be)
    idx.append_batch(_rows(spark, 0, 250), "g", "v")
    idx.append_batch(_rows(spark, 250, 250), "g", "v")
    vals: dict[str, list[float]] = {"even": [], "odd": []}
    for i in range(500):
        vals["even" if i % 2 == 0 else "odd"].append(((i * 73) % 1000) / 100.0)
    got = {r["grp"]: r for r in idx.stats().collect()}
    for g, xs in vals.items():
        n = len(xs)
        mean = sum(round(x * SCALE) for x in xs) / n / SCALE
        var = (
            n * sum(round(x * SCALE) ** 2 for x in xs)
            - sum(round(x * SCALE) for x in xs) ** 2
        ) / (n * (n - 1))
        std = math.sqrt(var) / SCALE
        assert got[g]["n"] == n
        assert got[g]["mean"] == pytest.approx(mean, abs=1e-12)
        assert got[g]["stddev"] == pytest.approx(std, rel=1e-12)


def test_compact_supersedes_and_sums_stay_exact(spark, tmp_path, be):
    idx = MomentsIndex(spark, str(tmp_path / "m"), SCALE, backend=be)
    idx.append_batch(_rows(spark, 0, 200), "g", "v")
    idx.compact()
    idx.append_batch(_rows(spark, 200, 200), "g", "v")
    idx.compact()
    assert idx.gc() != []
    got = {
        (r["grp"], r["n"], r["s1"], r["s2"]) for r in idx.moments().collect()
    }
    assert got == _one_shot_state(spark, 0, 400)


def test_epoch_keyed_replay_not_double_counted(spark, tmp_path, be):
    idx = MomentsIndex(spark, str(tmp_path / "m"), SCALE, backend=be)
    assert idx.append_batch(_rows(spark, 0, 100), "g", "v", batch_id=0) is True
    assert idx.append_batch(_rows(spark, 0, 100), "g", "v", batch_id=0) is False
    assert idx.append_batch(_rows(spark, 100, 100), "g", "v", batch_id=1) is True
    got = {
        (r["grp"], r["n"], r["s1"], r["s2"]) for r in idx.moments().collect()
    }
    assert got == _one_shot_state(spark, 0, 200)


def test_null_nan_dropped_and_scale_frozen(spark, tmp_path, be):
    df = spark.createDataFrame(
        [("a", 1.0), ("a", None), ("a", float("nan")), ("a", 2.0)],
        "g string, v double",
    )
    idx = MomentsIndex(spark, str(tmp_path / "m"), SCALE, backend=be)
    idx.append_batch(df, "g", "v")
    (row,) = idx.moments().collect()
    assert row["n"] == 2 and int(row["s1"]) == 300
    with pytest.raises(ValueError, match="built with"):
        MomentsIndex(spark, str(tmp_path / "m"), 1000, backend=be)
    with pytest.raises(ValueError, match="positive integer"):
        MomentsIndex(spark, str(tmp_path / "m2"), 0, backend=be)


def test_single_value_group_null_stddev(spark, tmp_path, be):
    df = spark.createDataFrame([("solo", 5.0)], "g string, v double")
    idx = MomentsIndex(spark, str(tmp_path / "m"), SCALE, backend=be)
    idx.append_batch(df, "g", "v")
    (row,) = idx.stats().collect()
    assert row["n"] == 1 and row["mean"] == 5.0 and row["stddev"] is None


def test_moments_sink_through_real_stream(spark, tmp_path, be):
    """End-to-end: a file stream feeds the drift ledger via
    foreachBatch; merged sums equal a one-shot aggregation of all
    streamed rows (exactly-once under at-least-once delivery)."""
    import json
    import os

    from cdc_demo_spark.operators.incremental_moments import moments_sink

    src = tmp_path / "src"
    src.mkdir()
    for i, (a, b) in enumerate([(0, 200), (200, 100)]):
        rows = [
            json.dumps(
                {"g": "even" if x % 2 == 0 else "odd", "v": ((x * 73) % 1000) / 100.0}
            )
            for x in range(a, a + b)
        ]
        (src / f"f{i}.json").write_text("\n".join(rows))
    idx = MomentsIndex(spark, str(tmp_path / "m"), SCALE, backend=be)
    stream = (
        spark.readStream.schema("g string, v double")
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
    )
    q = (
        stream.writeStream.foreachBatch(moments_sink(idx, "g", "v"))
        .option("checkpointLocation", os.path.join(str(tmp_path), "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["grp"], r["n"], r["s1"], r["s2"]) for r in idx.moments().collect()
    }
    assert got == _one_shot_state(spark, 0, 300)


def test_infinity_dropped_like_nan(spark, tmp_path):
    """±Infinity is junk like NaN: dropped, NEVER counted.  The
    pre-fix behavior counted the row in n while its NULL decimal sum
    was skipped — n=3/s1=400 for {1, 3, inf} — silently skewing every
    derived mean/stddev."""
    idx = MomentsIndex(spark, str(tmp_path / "m"), scale=100)
    df = spark.createDataFrame(
        [("a", 1.0), ("a", 3.0), ("a", float("inf")), ("a", float("-inf"))],
        "grp string, v double",
    )
    idx.append_batch(df, "grp", "v")
    row = idx.stats().collect()[0]
    assert row["n"] == 2
    assert row["mean"] == 2.0


def test_square_is_exact_past_double_precision(spark, tmp_path):
    """The y² term squares in DECIMAL, not double: at y ≈ 1.2e8 the
    square (≈1.5e16) exceeds 2^53 and a double multiply silently
    rounds — the ledger's bit-exact contract must hold to the 2^53
    bound on y itself."""
    idx = MomentsIndex(spark, str(tmp_path / "m"), scale=1)
    vals = [123_456_789.0, 123_456_791.0]
    idx.append_batch(
        spark.createDataFrame([("a", v) for v in vals], "grp string, v double"),
        "grp",
        "v",
    )
    row = idx.moments().collect()[0]
    exact = sum(int(v) * int(v) for v in vals)
    assert int(row["s2"]) == exact
    # the double product differs — the assertion above is not vacuous
    assert any(float(v) * float(v) != int(v) * int(v) for v in vals)
