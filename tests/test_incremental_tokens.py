"""TokenCountIndex (operators/incremental_tokens.py): the third
AdditiveLedger member and the first NON-sketch one — exact
vocabulary-sized counts, no chosen budget.  Protocol depth (racing
compactors, stalled appenders, poisoned markers) is pinned by the
Count-Min suite on the shared base; this file proves the token
instantiation: exactness, weighted builds, NULL policy, top-k, and
the quality the sketches cannot give — counts that are never wrong.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cdc_demo_spark.operators.incremental_tokens import TokenCountIndex, token_counts
from cdc_demo_spark.storage import (
    DEFAULT_BACKEND,
    ConcurrentAppendError,
    InMemoryCommitBackend,
)


def _tokens(spark, start, n):
    # zipf-ish repetition: token t-(id % k) with k shrinking repeats
    return spark.range(start, start + n).select(
        F.concat(F.lit("t-"), (F.col("id") % 37).cast("string")).alias("tok")
    )


@pytest.fixture(params=["posix", "memory"])
def be(request):
    return DEFAULT_BACKEND if request.param == "posix" else InMemoryCommitBackend()


def _exact(spark, start, n):
    return {
        (r["token"], r["cnt"])
        for r in token_counts(_tokens(spark, start, n), "tok").collect()
    }


def test_incremental_equals_one_shot_exact(spark, tmp_path, be):
    idx = TokenCountIndex(spark, str(tmp_path / "tk"), backend=be)
    idx.append_batch(_tokens(spark, 0, 300), "tok")
    idx.append_batch(_tokens(spark, 300, 200), "tok")
    got = {(r["token"], r["cnt"]) for r in idx.counts().collect()}
    assert got == _exact(spark, 0, 500)


def test_weighted_append_matches_repeated_rows(spark, tmp_path, be):
    pre = spark.createDataFrame(
        [("a", 3), ("b", 2), ("a", 4)], "tok string, w int"
    )
    rep = spark.createDataFrame(
        [("a",)] * 7 + [("b",)] * 2, "tok string"
    )
    i1 = TokenCountIndex(spark, str(tmp_path / "w"), backend=be)
    i1.append_batch(pre, "tok", weight_col="w")
    i2 = TokenCountIndex(spark, str(tmp_path / "r"), backend=be)
    i2.append_batch(rep, "tok")
    assert sorted(map(tuple, i1.counts().collect())) == sorted(
        map(tuple, i2.counts().collect())
    )


def test_null_tokens_never_counted(spark, tmp_path, be):
    df = spark.createDataFrame([("a",), (None,), ("a",)], "tok string")
    idx = TokenCountIndex(spark, str(tmp_path / "n"), backend=be)
    idx.append_batch(df, "tok")
    assert sorted(map(tuple, idx.counts().collect())) == [("a", 2)]


def test_compact_supersedes_and_counts_stay_exact(spark, tmp_path, be):
    idx = TokenCountIndex(spark, str(tmp_path / "tk"), backend=be)
    idx.append_batch(_tokens(spark, 0, 200), "tok")
    idx.compact()
    idx.append_batch(_tokens(spark, 200, 200), "tok")
    got = {(r["token"], r["cnt"]) for r in idx.counts().collect()}
    assert got == _exact(spark, 0, 400)
    idx.compact()
    assert idx.gc() != []
    got = {(r["token"], r["cnt"]) for r in idx.counts().collect()}
    assert got == _exact(spark, 0, 400)


def test_epoch_keyed_replay_not_double_counted(spark, tmp_path, be):
    idx = TokenCountIndex(spark, str(tmp_path / "tk"), backend=be)
    assert idx.append_batch(_tokens(spark, 0, 100), "tok", batch_id=0) is True
    assert idx.append_batch(_tokens(spark, 0, 100), "tok", batch_id=0) is False
    assert idx.append_batch(_tokens(spark, 100, 100), "tok", batch_id=1) is True
    got = {(r["token"], r["cnt"]) for r in idx.counts().collect()}
    assert got == _exact(spark, 0, 200)


def test_topk_deterministic_tiebreak(spark, tmp_path, be):
    df = spark.createDataFrame(
        [("b",), ("b",), ("a",), ("a",), ("c",)], "tok string"
    )
    idx = TokenCountIndex(spark, str(tmp_path / "tk"), backend=be)
    idx.append_batch(df, "tok")
    assert [(r["token"], r["cnt"]) for r in idx.topk(2).collect()] == [
        ("a", 2),
        ("b", 2),
    ]
