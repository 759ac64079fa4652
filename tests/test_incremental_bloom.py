"""BloomIndex (operators/incremental_bloom.py): incremental ==
one-shot EXACTLY (bit_or is associative/commutative — stronger than
the MinHash index's cap-caveated equality), plus the BatchCommitLog
durability contract on both storage backends.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cdc_demo_spark.operators.incremental_bloom import BloomIndex
from cdc_demo_spark.operators.sketches import bloom_build
from cdc_demo_spark.storage import (
    DEFAULT_BACKEND,
    ConcurrentAppendError,
    InMemoryCommitBackend,
)

BITS, HASHES = 4096, 4


def _values(spark, start, n):
    return spark.range(start, start + n).select(
        F.concat(F.lit("v-"), "id").alias("v")
    )


@pytest.fixture(params=["posix", "memory"])
def be(request):
    return DEFAULT_BACKEND if request.param == "posix" else InMemoryCommitBackend()


def test_incremental_equals_one_shot_bit_exact(spark, tmp_path, be):
    idx = BloomIndex(spark, str(tmp_path / "bl"), BITS, HASHES, backend=be)
    idx.append_batch(_values(spark, 0, 300), "v")
    idx.append_batch(_values(spark, 300, 200), "v")
    one_shot = bloom_build(_values(spark, 0, 500), "v", BITS, HASHES)
    merged = idx.words()
    assert merged.exceptAll(one_shot).count() == 0
    assert one_shot.exceptAll(merged).count() == 0


def test_probe_no_false_negatives_across_batches(spark, tmp_path, be):
    idx = BloomIndex(spark, str(tmp_path / "bl"), BITS, HASHES, backend=be)
    idx.append_batch(_values(spark, 0, 250), "v")
    idx.append_batch(_values(spark, 250, 250), "v")
    probed = idx.probe(_values(spark, 0, 500), "v")
    assert probed.filter(~F.col("bloom_member")).count() == 0


def test_empty_index_probe_all_negative(spark, tmp_path, be):
    idx = BloomIndex(spark, str(tmp_path / "bl"), BITS, HASHES, backend=be)
    probed = idx.probe(_values(spark, 0, 50), "v")
    assert probed.filter(F.col("bloom_member")).count() == 0


def test_compact_preserves_state_and_bounds_rows(spark, tmp_path, be):
    idx = BloomIndex(spark, str(tmp_path / "bl"), BITS, HASHES, backend=be)
    for b in range(3):
        idx.append_batch(_values(spark, b * 100, 100), "v")
    before = idx.words().collect()
    idx.compact()
    after = idx.words().collect()
    assert sorted(before) == sorted(after)
    assert len(after) <= BITS // 63 + 1


def test_crashed_append_invisible_and_id_burned(spark, tmp_path, be):
    idx = BloomIndex(spark, str(tmp_path / "bl"), BITS, HASHES, backend=be)
    idx.append_batch(_values(spark, 0, 100), "v")
    n_words = idx.words().count()
    # crash model: data dir exists, marker never landed
    (tmp_path / "bl" / "words" / "batch=1").mkdir(parents=True)
    assert idx.words().count() == n_words, "uncommitted batch leaked"
    assert idx._log.next_batch_id("words") == 2  # id burned, not reused
    idx.append_batch(_values(spark, 100, 100), "v")
    assert idx.backend.exists(idx._log.marker(2))


def test_concurrent_append_loser_fails_loudly(spark, tmp_path, be):
    idx = BloomIndex(spark, str(tmp_path / "bl"), BITS, HASHES, backend=be)
    idx.append_batch(_values(spark, 0, 100), "v")
    # rival's marker lands between our id computation and our claim
    assert be.put_if_absent(idx._log.marker(1), b"")
    idx._log.next_batch_id = lambda table: 1
    with pytest.raises(ConcurrentAppendError):
        idx.append_batch(_values(spark, 100, 100), "v")


def test_param_mismatch_raises(spark, tmp_path, be):
    BloomIndex(spark, str(tmp_path / "bl"), BITS, HASHES, backend=be)
    with pytest.raises(ValueError, match="built with"):
        BloomIndex(spark, str(tmp_path / "bl"), BITS * 2, HASHES, backend=be)


def test_epoch_keyed_replay_skipped(spark, tmp_path, be):
    idx = BloomIndex(spark, str(tmp_path / "bl"), BITS, HASHES, backend=be)
    assert idx.append_batch(_values(spark, 0, 100), "v", batch_id=0) is True
    n_batches = len(idx._log.committed_batches("words"))
    # at-least-once redelivery of the same foreachBatch epoch
    assert idx.append_batch(_values(spark, 0, 100), "v", batch_id=0) is False
    assert len(idx._log.committed_batches("words")) == n_batches
    assert idx.append_batch(_values(spark, 100, 100), "v", batch_id=1) is True


def test_compaction_ids_cannot_shadow_future_epochs(spark, tmp_path, be):
    # regression: compaction used to claim the next id in the words
    # batch space — a stream-owned index would then SKIP the epoch
    # carrying that id, silently losing its values
    idx = BloomIndex(spark, str(tmp_path / "bl"), BITS, HASHES, backend=be)
    idx.append_batch(_values(spark, 0, 100), "v", batch_id=0)
    idx.append_batch(_values(spark, 100, 100), "v", batch_id=1)
    idx.compact()
    assert idx.append_batch(_values(spark, 200, 100), "v", batch_id=2) is True
    probed = idx.probe(_values(spark, 0, 300), "v")
    assert probed.filter(~F.col("bloom_member")).count() == 0


def test_gc_reclaims_absorbed_dirs_probe_unchanged(spark, tmp_path, be):
    import os

    idx = BloomIndex(spark, str(tmp_path / "bl"), BITS, HASHES, backend=be)
    idx.append_batch(_values(spark, 0, 150), "v", batch_id=0)
    idx.append_batch(_values(spark, 150, 150), "v", batch_id=1)
    assert idx.gc() == []  # no compaction yet
    before = sorted(map(tuple, idx.words().collect()))
    idx.compact()
    removed = idx.gc()
    assert len(removed) == 2 and not any(os.path.isdir(d) for d in removed)
    assert sorted(map(tuple, idx.words().collect())) == before
    # a replayed epoch whose word table was gc'd still skips (marker is
    # the dedup identity)
    assert idx.append_batch(_values(spark, 0, 150), "v", batch_id=0) is False
    # later life: new epoch, second compaction absorbs it + compaction 0
    assert idx.append_batch(_values(spark, 300, 100), "v", batch_id=2) is True
    idx.compact()
    assert len(idx.gc()) == 2
    probed = idx.probe(_values(spark, 0, 400), "v")
    assert probed.filter(~F.col("bloom_member")).count() == 0
