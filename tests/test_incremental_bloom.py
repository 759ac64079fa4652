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


def test_repeat_compact_without_gc_is_noop(spark, tmp_path, be):
    # regression (ADVICE r7): compact();compact() with no gc() between
    # used to rewrite the full merged table and burn a compaction id
    # per call — the covered sidecar is the freshness authority, not
    # the still-on-disk absorbed dirs
    idx = BloomIndex(spark, str(tmp_path / "bl"), BITS, HASHES, backend=be)
    idx.append_batch(_values(spark, 0, 150), "v")
    idx.append_batch(_values(spark, 150, 150), "v")
    idx.compact()
    c_dirs = idx._clog.committed_batches("words")
    assert len(c_dirs) == 1
    idx.compact()  # nothing new landed, absorbed dirs NOT yet gc'd
    assert idx._clog.committed_batches("words") == c_dirs, (
        "fresh compaction must be a no-op before gc"
    )
    # a new batch makes it stale again
    idx.append_batch(_values(spark, 300, 50), "v")
    idx.compact()
    assert len(idx._clog.committed_batches("words")) == 2
    probed = idx.probe(_values(spark, 0, 350), "v")
    assert probed.filter(~F.col("bloom_member")).count() == 0


def test_gc_orphan_sweep_reclaims_unpublished_dirs(spark, tmp_path, be):
    import os

    idx = BloomIndex(spark, str(tmp_path / "bl"), BITS, HASHES, backend=be)
    idx.append_batch(_values(spark, 0, 100), "v")
    before = sorted(map(tuple, idx.words().collect()))
    # a crashed appender: staged words dir, marker never claimed
    crashed = tmp_path / "bl" / "words" / "batch=7-deadbeef"
    crashed.mkdir(parents=True)
    (crashed / "part-0.parquet").write_bytes(b"junk")
    # a losing racer: marker at 0 names the winner's uid, not this one
    loser = tmp_path / "bl" / "words" / "batch=0-00000000"
    loser.mkdir(parents=True)
    # marker-driven gc never touches them
    assert idx.gc() == []
    assert crashed.is_dir() and loser.is_dir()
    # young orphans survive a conservative horizon
    assert idx.gc(orphan_ttl_seconds=3600) == []
    # past the horizon both are swept; published state is untouched
    removed = idx.gc(orphan_ttl_seconds=0)
    assert {os.path.basename(d) for d in removed} == {
        "batch=7-deadbeef",
        "batch=0-00000000",
    }
    assert not crashed.is_dir() and not loser.is_dir()
    assert sorted(map(tuple, idx.words().collect())) == before
    # the crashed id stays burned (its dir is gone but ids come from
    # markers too — and batch 0's marker still names the winner)
    idx.append_batch(_values(spark, 100, 50), "v")
    probed = idx.probe(_values(spark, 0, 150), "v")
    assert probed.filter(~F.col("bloom_member")).count() == 0


def test_gc_orphan_sweep_losing_compactor_sidecar(spark, tmp_path, be):
    import os

    if isinstance(be, InMemoryCommitBackend):
        pytest.skip("sidecar age needs an fs footprint; in-memory keeps them")
    idx = BloomIndex(spark, str(tmp_path / "bl"), BITS, HASHES, backend=be)
    idx.append_batch(_values(spark, 0, 100), "v")
    idx.compact()
    idx.gc()  # drain the marker-driven arm (absorbed words batch)
    # a compactor that wrote its sidecar but crashed before claiming:
    # seq 9 was never claimed, so nothing publishes 9-feedface
    orphan = os.path.join(str(tmp_path / "bl"), "compactions", "covered", "9-feedface")
    assert be.put_if_absent(orphan, b'{"words": [], "compactions": []}')
    winner = idx._clog.committed_batches("words")
    sidecar_of_winner = os.path.basename(winner[0]).split("=")[1]
    assert idx.gc(orphan_ttl_seconds=3600) == []  # too young
    removed = idx.gc(orphan_ttl_seconds=0)
    assert orphan in removed
    assert not be.exists(orphan)
    # the WINNER's sidecar is load-bearing and must survive any sweep
    assert be.exists(
        os.path.join(str(tmp_path / "bl"), "compactions", "covered", sidecar_of_winner)
    )
