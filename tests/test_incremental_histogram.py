"""HistogramIndex (operators/incremental_histogram.py): the second
member of the AdditiveLedger family — incremental == one-shot EXACTLY
(bucket counts add over a disjoint split), superseding compaction, and
exactly-once stream feeding, on both storage backends.  The protocol
itself is pinned in depth by the Count-Min suite; this file proves the
histogram instantiation and the quantile read path on top of it.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cdc_demo_spark.operators.incremental_histogram import HistogramIndex
from cdc_demo_spark.operators.sketches import histogram_build, histogram_quantiles
from cdc_demo_spark.storage import (
    DEFAULT_BACKEND,
    ConcurrentAppendError,
    InMemoryCommitBackend,
)

LO, HI, NB = 0.0, 1000.0, 64


def _values(spark, start, n):
    # deterministic skewed doubles covering clamp-below/above too
    return spark.range(start, start + n).select(
        ((F.col("id") * 37) % 1100 - 25).cast("double").alias("v")
    )


@pytest.fixture(params=["posix", "memory"])
def be(request):
    return DEFAULT_BACKEND if request.param == "posix" else InMemoryCommitBackend()


def _assert_equals_one_shot(spark, idx, start, n):
    one_shot = histogram_build(_values(spark, start, n), "v", LO, HI, NB)
    merged = idx.hist()
    assert merged.exceptAll(one_shot).count() == 0
    assert one_shot.exceptAll(merged).count() == 0


def test_incremental_equals_one_shot_exact(spark, tmp_path, be):
    idx = HistogramIndex(spark, str(tmp_path / "h"), LO, HI, NB, backend=be)
    idx.append_batch(_values(spark, 0, 300), "v")
    idx.append_batch(_values(spark, 300, 200), "v")
    _assert_equals_one_shot(spark, idx, 0, 500)


def test_quantiles_bit_identical_to_one_shot(spark, tmp_path, be):
    idx = HistogramIndex(spark, str(tmp_path / "h"), LO, HI, NB, backend=be)
    idx.append_batch(_values(spark, 0, 250), "v")
    idx.append_batch(_values(spark, 250, 250), "v")
    qs = [0.25, 0.5, 0.9]
    got = {r.q: r.est for r in idx.quantiles(qs).collect()}
    hist = histogram_build(_values(spark, 0, 500), "v", LO, HI, NB)
    want = {r.q: r.est for r in histogram_quantiles(hist, qs, LO, HI, NB).collect()}
    assert got == want  # bit-identical doubles, not approx


def test_compact_supersedes_no_double_count(spark, tmp_path, be):
    idx = HistogramIndex(spark, str(tmp_path / "h"), LO, HI, NB, backend=be)
    idx.append_batch(_values(spark, 0, 200), "v")
    idx.append_batch(_values(spark, 200, 100), "v")
    idx.compact()
    # the superseded batch dirs still on disk must NOT re-merge
    _assert_equals_one_shot(spark, idx, 0, 300)
    # append on top of the checkpoint keeps summing correctly
    idx.append_batch(_values(spark, 300, 100), "v")
    _assert_equals_one_shot(spark, idx, 0, 400)
    # second compact absorbs only the fresh batch; gc reclaims
    idx.compact()
    assert idx.gc() != []
    _assert_equals_one_shot(spark, idx, 0, 400)


def test_epoch_keyed_replay_not_double_counted(spark, tmp_path, be):
    idx = HistogramIndex(spark, str(tmp_path / "h"), LO, HI, NB, backend=be)
    assert idx.append_batch(_values(spark, 0, 100), "v", batch_id=0) is True
    assert idx.append_batch(_values(spark, 0, 100), "v", batch_id=0) is False
    assert idx.append_batch(_values(spark, 100, 100), "v", batch_id=1) is True
    _assert_equals_one_shot(spark, idx, 0, 200)


def test_grid_mismatch_raises(spark, tmp_path, be):
    HistogramIndex(spark, str(tmp_path / "h"), LO, HI, NB, backend=be)
    with pytest.raises(ValueError, match="built with"):
        HistogramIndex(spark, str(tmp_path / "h"), LO, HI, 32, backend=be)
    with pytest.raises(ValueError, match="lo < hi"):
        HistogramIndex(spark, str(tmp_path / "bad"), 5.0, 5.0, NB, backend=be)


def test_histogram_sink_through_real_stream(spark, tmp_path, be):
    """End-to-end: a rate-less file stream feeds the ledger via
    foreachBatch; the merged state equals a one-shot histogram of all
    streamed rows (exactly-once under at-least-once delivery)."""
    import json
    import os

    from cdc_demo_spark.operators.incremental_histogram import histogram_sink

    src = tmp_path / "src"
    src.mkdir()
    for i, (a, b) in enumerate([(0, 200), (200, 150)]):
        rows = [
            json.dumps({"v": float((x * 37) % 1100 - 25)})
            for x in range(a, a + b)
        ]
        (src / f"f{i}.json").write_text("\n".join(rows))
    idx = HistogramIndex(spark, str(tmp_path / "h"), LO, HI, NB, backend=be)
    stream = (
        spark.readStream.schema("v double")
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
    )
    q = (
        stream.writeStream.foreachBatch(histogram_sink(idx, "v"))
        .option("checkpointLocation", os.path.join(str(tmp_path), "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    one_shot = histogram_build(_values(spark, 0, 350), "v", LO, HI, NB)
    merged = idx.hist()
    assert merged.exceptAll(one_shot).count() == 0
    assert one_shot.exceptAll(merged).count() == 0
