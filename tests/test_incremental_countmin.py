"""CountMinIndex (operators/incremental_countmin.py): incremental ==
one-shot EXACTLY (cell counts add over a disjoint batch split), and —
the part that differs from BloomIndex — compaction must SUPERSEDE the
history it merges, because SUM-merging a checkpoint with its own
inputs double-counts.  Both storage backends.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cdc_demo_spark.operators.incremental_countmin import CountMinIndex
from cdc_demo_spark.operators.sketches import countmin_build, countmin_estimate
from cdc_demo_spark.storage import (
    DEFAULT_BACKEND,
    ConcurrentAppendError,
    InMemoryCommitBackend,
)

DEPTH, WIDTH = 3, 256


def _occurrences(spark, start, n):
    # value i appears (i % 5) + 1 times — multiplicities matter for SUM
    return (
        spark.range(start, start + n)
        .select(
            F.concat(F.lit("v-"), "id").alias("v"),
            ((F.col("id") % 5) + 1).cast("int").alias("w"),
        )
        .select(F.expr("explode(array_repeat(v, w))").alias("v"))
    )


def _distinct(spark, start, n):
    return spark.range(start, start + n).select(F.concat(F.lit("v-"), "id").alias("v"))


@pytest.fixture(params=["posix", "memory"])
def be(request):
    return DEFAULT_BACKEND if request.param == "posix" else InMemoryCommitBackend()


def _assert_equals_one_shot(spark, idx, start, n):
    one_shot = countmin_build(_occurrences(spark, start, n), "v", DEPTH, WIDTH)
    merged = idx.cells()
    assert merged.exceptAll(one_shot).count() == 0
    assert one_shot.exceptAll(merged).count() == 0
    got = idx.estimate(_distinct(spark, start, n), "v")
    want = countmin_estimate(_distinct(spark, start, n), "v", one_shot, DEPTH, WIDTH)
    assert got.exceptAll(want).count() == 0 and want.exceptAll(got).count() == 0


def test_incremental_equals_one_shot_exact(spark, tmp_path, be):
    idx = CountMinIndex(spark, str(tmp_path / "cm"), DEPTH, WIDTH, backend=be)
    idx.append_batch(_occurrences(spark, 0, 120), "v")
    idx.append_batch(_occurrences(spark, 120, 80), "v")
    _assert_equals_one_shot(spark, idx, 0, 200)


def test_estimates_never_underestimate_across_batches(spark, tmp_path, be):
    idx = CountMinIndex(spark, str(tmp_path / "cm"), DEPTH, WIDTH, backend=be)
    idx.append_batch(_occurrences(spark, 0, 100), "v")
    idx.append_batch(_occurrences(spark, 100, 100), "v")
    exact = _occurrences(spark, 0, 200).groupBy("v").agg(F.count(F.lit(1)).alias("c"))
    est = idx.estimate(exact.select("v"), "v")
    assert est.join(exact, "v").filter(F.col("est") < F.col("c")).count() == 0


def test_weighted_append_matches_repeated_rows(spark, tmp_path, be):
    a = CountMinIndex(spark, str(tmp_path / "a"), DEPTH, WIDTH, backend=be)
    a.append_batch(_occurrences(spark, 0, 100), "v")
    b = CountMinIndex(spark, str(tmp_path / "b"), DEPTH, WIDTH, backend=be)
    b.append_batch(
        spark.range(100).select(
            F.concat(F.lit("v-"), "id").alias("v"), ((F.col("id") % 5) + 1).alias("w")
        ),
        "v",
        weight_col="w",
    )
    assert a.cells().exceptAll(b.cells()).count() == 0
    assert b.cells().exceptAll(a.cells()).count() == 0


def test_empty_index_estimates_zero(spark, tmp_path, be):
    idx = CountMinIndex(spark, str(tmp_path / "cm"), DEPTH, WIDTH, backend=be)
    est = idx.estimate(_distinct(spark, 0, 20), "v").collect()
    assert all(r.est == 0 for r in est)


def test_compact_supersedes_no_double_count(spark, tmp_path, be):
    # THE CountMin-specific hazard: after compaction the superseded
    # batch tables still exist on disk — a reader that merged them with
    # the checkpoint would double every count
    idx = CountMinIndex(spark, str(tmp_path / "cm"), DEPTH, WIDTH, backend=be)
    idx.append_batch(_occurrences(spark, 0, 100), "v")
    idx.append_batch(_occurrences(spark, 100, 100), "v")
    before = sorted(map(tuple, idx.cells().collect()))
    idx.compact()
    assert sorted(map(tuple, idx.cells().collect())) == before
    assert len(before) <= DEPTH * WIDTH
    _assert_equals_one_shot(spark, idx, 0, 200)


def test_append_after_compact_sums_on_top(spark, tmp_path, be):
    idx = CountMinIndex(spark, str(tmp_path / "cm"), DEPTH, WIDTH, backend=be)
    idx.append_batch(_occurrences(spark, 0, 100), "v")
    idx.compact()
    idx.append_batch(_occurrences(spark, 100, 100), "v")
    _assert_equals_one_shot(spark, idx, 0, 200)
    idx.compact()  # second checkpoint covers the post-compact batch
    _assert_equals_one_shot(spark, idx, 0, 200)


def test_compact_with_nothing_new_is_noop(spark, tmp_path, be):
    idx = CountMinIndex(spark, str(tmp_path / "cm"), DEPTH, WIDTH, backend=be)
    idx.compact()  # empty index: no checkpoint claimed
    assert idx._checkpoint() == (-1, None, frozenset())
    idx.append_batch(_occurrences(spark, 0, 50), "v")
    idx.compact()
    seq, _, covered = idx._checkpoint()
    idx.compact()  # everything already covered: returns, does not raise
    assert idx._checkpoint()[0] == seq and idx._checkpoint()[2] == covered


def test_crashed_append_invisible_and_id_burned(spark, tmp_path, be):
    idx = CountMinIndex(spark, str(tmp_path / "cm"), DEPTH, WIDTH, backend=be)
    idx.append_batch(_occurrences(spark, 0, 50), "v")
    n_cells = idx.cells().count()
    (tmp_path / "cm" / "cells" / "batch=1").mkdir(parents=True)
    assert idx.cells().count() == n_cells, "uncommitted batch leaked"
    assert idx._log.next_batch_id("cells") == 2
    idx.append_batch(_occurrences(spark, 50, 50), "v")
    assert idx.backend.exists(idx._log.marker(2))


def test_concurrent_same_seq_compactors_lose_loudly(spark, tmp_path, be):
    idx = CountMinIndex(spark, str(tmp_path / "cm"), DEPTH, WIDTH, backend=be)
    idx.append_batch(_occurrences(spark, 0, 50), "v")
    # rival's marker lands between our seq computation and our claim
    import os

    assert be.put_if_absent(os.path.join(idx.path, "checkpoints", "0"), b"{}")
    idx._next_checkpoint_seq = lambda: 0
    with pytest.raises(ConcurrentAppendError):
        idx.compact()


def test_stalled_appender_below_checkpoint_seq_stays_readable(spark, tmp_path, be):
    # THE hazard a coverage-threshold design has: appender stages
    # batch 1 but stalls before claiming; batch 2 lands (id burned past
    # 1); a checkpoint merges {0, 2}; the stalled appender then claims
    # batch 1.  Its counts must still be served — the checkpoint's
    # covered SET excludes it, whatever its id.
    import os
    import uuid

    from cdc_demo_spark.operators.sketches import countmin_build

    idx = CountMinIndex(spark, str(tmp_path / "cm"), DEPTH, WIDTH, backend=be)
    idx.append_batch(_occurrences(spark, 0, 60), "v")  # batch 0
    # zombie stages batch 1's data but has not claimed the marker yet
    z_uid = uuid.uuid4().hex[:8]
    countmin_build(_occurrences(spark, 60, 60), "v", DEPTH, WIDTH).write.mode(
        "overwrite"
    ).parquet(os.path.join(idx.path, "cells", f"batch=1-{z_uid}"))
    idx.append_batch(_occurrences(spark, 120, 80), "v")  # claims batch 2
    idx.compact()  # covered = {0, 2}
    assert idx._checkpoint()[2] == frozenset({0, 2})
    idx._log.claim(1, z_uid)  # zombie wakes and commits
    _assert_equals_one_shot(spark, idx, 0, 200)  # nothing lost
    idx.compact()  # next checkpoint absorbs the late batch
    assert idx._checkpoint()[2] == frozenset({0, 1, 2})
    _assert_equals_one_shot(spark, idx, 0, 200)


def test_poisoned_checkpoint_marker_skipped_and_seq_burned(spark, tmp_path, be):
    # our claim order (data THEN marker) makes a dangling marker
    # unreachable from CountMinIndex itself, but a reader must skip a
    # poisoned one rather than fail or read nothing — and a later
    # compaction must burn past its seq, not collide with it
    idx = CountMinIndex(spark, str(tmp_path / "cm"), DEPTH, WIDTH, backend=be)
    idx.append_batch(_occurrences(spark, 0, 50), "v")
    import os

    assert be.put_if_absent(os.path.join(idx.path, "checkpoints", "0"), b"nodir")
    _assert_equals_one_shot(spark, idx, 0, 50)  # falls back to the batch
    idx.compact()  # claims seq 1, skipping the poisoned 0
    assert idx._checkpoint()[0] == 1
    _assert_equals_one_shot(spark, idx, 0, 50)


def test_param_mismatch_raises(spark, tmp_path, be):
    CountMinIndex(spark, str(tmp_path / "cm"), DEPTH, WIDTH, backend=be)
    with pytest.raises(ValueError, match="built with"):
        CountMinIndex(spark, str(tmp_path / "cm"), DEPTH, WIDTH * 2, backend=be)


def test_epoch_keyed_replay_not_double_counted(spark, tmp_path, be):
    # THE additive-state streaming hazard: foreachBatch is
    # at-least-once, and replaying a batch into SUM-merged state
    # double-counts.  Epoch-keyed commits skip the replay.
    idx = CountMinIndex(spark, str(tmp_path / "cm"), DEPTH, WIDTH, backend=be)
    assert idx.append_batch(_occurrences(spark, 0, 100), "v", batch_id=0) is True
    assert idx.append_batch(_occurrences(spark, 0, 100), "v", batch_id=0) is False
    assert idx.append_batch(_occurrences(spark, 100, 100), "v", batch_id=1) is True
    _assert_equals_one_shot(spark, idx, 0, 200)  # replay added nothing


def test_countmin_sink_through_real_stream(spark, tmp_path, be):
    """Drive the frequency ledger via an actual Structured Streaming
    query (file source → foreachBatch(countmin_sink), availableNow) in
    two waves under one checkpoint: merged state must equal the
    one-shot sketch over everything ingested — the streaming epoch ids
    key the commits, so re-listing cannot double-count."""
    import os

    from cdc_demo_spark.operators.incremental_countmin import countmin_sink

    occ = _occurrences(spark, 0, 200).localCheckpoint(eager=True)
    land = str(tmp_path / "land")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(land)
    idx = CountMinIndex(spark, str(tmp_path / "cm"), DEPTH, WIDTH, backend=be)

    def run_wave(pred, prefix):
        occ.filter(pred).coalesce(1).write.mode("overwrite").parquet(
            str(tmp_path / f"stage_{prefix}")
        )
        for i, name in enumerate(
            f
            for f in os.listdir(tmp_path / f"stage_{prefix}")
            if f.endswith(".parquet")
        ):
            os.rename(
                tmp_path / f"stage_{prefix}" / name, f"{land}/{prefix}-{i}.parquet"
            )
        (
            spark.readStream.schema(occ.schema)
            .parquet(land)
            .writeStream.foreachBatch(countmin_sink(idx, "v"))
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
            .awaitTermination(120)
        )

    from pyspark.sql import functions as F2

    run_wave(F2.length("v") % 2 == 0, "w1")
    run_wave(F2.length("v") % 2 == 1, "w2")
    _assert_equals_one_shot(spark, idx, 0, 200)


def test_gc_reclaims_covered_batches_state_unchanged(spark, tmp_path, be):
    import os

    idx = CountMinIndex(spark, str(tmp_path / "cm"), DEPTH, WIDTH, backend=be)
    idx.append_batch(_occurrences(spark, 0, 100), "v")
    idx.append_batch(_occurrences(spark, 100, 100), "v")
    assert idx.gc() == []  # nothing checkpointed yet: nothing reclaimable
    idx.compact()
    removed = idx.gc()
    assert len(removed) == 2 and not any(os.path.isdir(d) for d in removed)
    _assert_equals_one_shot(spark, idx, 0, 200)  # checkpoint serves alone
    # burned ids + later life continue unaffected
    idx.append_batch(_occurrences(spark, 200, 50), "v")
    _assert_equals_one_shot(spark, idx, 0, 250)
    idx.compact()
    # absorbed batch + the SUPERSEDED checkpoint dir (each checkpoint
    # is a full grid; leaking one per compact cycle defeats gc)
    assert len(idx.gc()) == 2
    _assert_equals_one_shot(spark, idx, 0, 250)


def test_mixed_id_modes_raise_loudly(spark, tmp_path, be):
    # an auto-id append on a stream-owned index claims max+1, which a
    # future epoch can equal — that epoch would skip as a "replay" and
    # silently lose its counts; the mode guard makes it a loud error
    idx = CountMinIndex(spark, str(tmp_path / "cm"), DEPTH, WIDTH, backend=be)
    idx.append_batch(_occurrences(spark, 0, 30), "v", batch_id=0)
    with pytest.raises(ValueError, match="epoch-owned"):
        idx.append_batch(_occurrences(spark, 30, 30), "v")
    idx2 = CountMinIndex(spark, str(tmp_path / "cm2"), DEPTH, WIDTH, backend=be)
    idx2.append_batch(_occurrences(spark, 0, 30), "v")
    with pytest.raises(ValueError, match="auto-owned"):
        idx2.append_batch(_occurrences(spark, 30, 30), "v", batch_id=7)


def test_gc_orphan_sweep_same_seq_rival_and_staged_cells(spark, tmp_path, be):
    # the marker-driven gc arms can never reach: (a) a losing/crashed
    # appender's staged cells dir, (b) a SAME-seq rival checkpoint dir
    # (the `< seq` arm only catches older seqs) — both leaked forever
    # before the orphan sweep (ADVICE r7)
    import os

    idx = CountMinIndex(spark, str(tmp_path / "cm"), DEPTH, WIDTH, backend=be)
    idx.append_batch(_occurrences(spark, 0, 60), "v")
    idx.compact()
    idx.gc()  # drain the marker-driven arms (covered cells batch)
    want = sorted(map(tuple, idx.cells().collect()))
    # (a) crashed appender's staged dir — no marker will ever claim it
    staged = tmp_path / "cm" / "cells" / "batch=9-deadbeef"
    staged.mkdir(parents=True)
    # (b) same-seq rival: checkpoint 0's marker records the winner's
    # uid; the loser's full-grid data dir sits beside it
    winner = [
        d
        for d in os.listdir(tmp_path / "cm" / "checkpoint_data")
        if d.startswith("ckpt=0-")
    ]
    assert len(winner) == 1
    rival = tmp_path / "cm" / "checkpoint_data" / "ckpt=0-00000000"
    rival.mkdir(parents=True)
    (rival / "part-0.parquet").write_bytes(b"junk")
    assert idx.gc() == []  # marker-driven arms see nothing to do
    assert staged.is_dir() and rival.is_dir()
    assert idx.gc(orphan_ttl_seconds=3600) == []  # too young to condemn
    removed = idx.gc(orphan_ttl_seconds=0)
    assert {os.path.basename(d) for d in removed} == {
        "batch=9-deadbeef",
        "ckpt=0-00000000",
    }
    # the winner's checkpoint and the merged state are untouched
    assert (tmp_path / "cm" / "checkpoint_data" / winner[0]).is_dir()
    assert sorted(map(tuple, idx.cells().collect())) == want


def test_epoch_adoption_over_unowned_history_refused(spark, tmp_path, be):
    # r8 guard (storage.claim_ownership_mode): a pre-ownership history
    # burned its ids via next_batch_id, so adopting it as epoch-owned
    # would make stream epochs 0..max skip as "replays" — refuse and
    # tell the operator to rebuild or stay auto
    idx = CountMinIndex(spark, str(tmp_path / "cm"), DEPTH, WIDTH, backend=be)
    idx.append_batch(_occurrences(spark, 0, 40), "v")
    idx.append_batch(_occurrences(spark, 40, 40), "v")
    # simulate pre-guard history: the ownership record never existed
    be.delete(str(tmp_path / "cm" / "_ownership"))
    with pytest.raises(ValueError, match="burned batch ids"):
        idx.append_batch(_occurrences(spark, 80, 40), "v", batch_id=0)
    # auto-id appends remain welcome (the file is re-created as auto)
    idx.append_batch(_occurrences(spark, 80, 40), "v")
    _assert_equals_one_shot(spark, idx, 0, 120)


def test_epoch_adoption_refused_for_legacy_markerless_layout(spark, tmp_path, be):
    # ADVICE r8: a legacy pre-marker layout (batch=<n>, _COMMITTED, no
    # markers) has burned ids through next_batch_id's data-dir scan —
    # it must refuse epoch adoption exactly like a marker history
    import os

    path = tmp_path / "cm"
    legacy = path / "cells" / "batch=3"
    legacy.mkdir(parents=True)
    (legacy / "_COMMITTED").write_bytes(b"")
    idx = CountMinIndex(spark, str(path), DEPTH, WIDTH, backend=be)
    with pytest.raises(ValueError, match="burned batch ids"):
        idx.append_batch(_occurrences(spark, 0, 30), "v", batch_id=0)
    assert not be.exists(os.path.join(str(path), "_ownership"))


def test_epoch_ownership_clean_index_still_works(spark, tmp_path, be):
    # the refusal must not touch the legitimate path: a FRESH index
    # adopting epoch mode from its first append
    idx = CountMinIndex(spark, str(tmp_path / "cm"), DEPTH, WIDTH, backend=be)
    assert idx.append_batch(_occurrences(spark, 0, 50), "v", batch_id=0) is True
    assert idx.append_batch(_occurrences(spark, 0, 50), "v", batch_id=0) is False
    assert idx.append_batch(_occurrences(spark, 50, 50), "v", batch_id=1) is True
    _assert_equals_one_shot(spark, idx, 0, 100)
