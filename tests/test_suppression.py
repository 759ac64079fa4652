"""Takedown-ledger (suppression) semantics on the pair indexes, plus
the erase verify-retry contract (r10 ADVICE): erase() must converge
even when an append commits inside its snapshot→claim window, and with
``suppress=True`` an erased id can never re-enter probe state, tiles,
vectors, or the pairs log through a later append — the pair-index
mirror of silver's record_erased_key re-filter."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from cdc_demo_spark.operators.incremental_ann import IvfIndex
from cdc_demo_spark.operators.incremental_dedup import MinHashIndex
from cdc_demo_spark.operators.incremental_semantic import SemanticIndex
from cdc_demo_spark.operators.suppression import SuppressionLedger


def _docs(spark, ids, salt=""):
    rows = [
        (i, f"shared boilerplate words for shingles doc {i % 7} tail {salt} "
            f"alpha beta gamma delta epsilon")
        for i in ids
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_ledger_record_is_idempotent_and_ordered(tmp_path):
    led = SuppressionLedger(str(tmp_path / "idx"))
    led.record([3, 1, 2])
    led.record([2, 1, 3])  # same set, any order: content-hash dedupes
    led.record([])  # no-op, creates nothing
    files = os.listdir(os.path.join(str(tmp_path / "idx"), "_suppressed"))
    assert len([f for f in files if f.startswith("sup-")]) == 1
    assert led.ids() == {1, 2, 3}
    led.record([4])
    assert led.ids() == {1, 2, 3, 4}


def test_filter_batch_is_noop_on_empty_ledger(spark, tmp_path):
    led = SuppressionLedger(str(tmp_path / "idx"))
    df = _docs(spark, range(5))
    assert led.filter_batch(df, "doc_id") is df  # zero plan change


def test_minhash_suppress_blocks_readmission(spark, tmp_path):
    idx = MinHashIndex(spark, str(tmp_path / "mh"), k=3, threshold=0.1)
    idx.append_batch(_docs(spark, range(40)))
    victims = [5, 12]
    idx.erase(victims, suppress=True)
    # a later batch carrying the erased ids drops them ON ENTRY
    idx.append_batch(_docs(spark, [5, 12, 100, 101], salt="again"))
    assert idx.stored_shingles(victims).count() == 0
    state_ids = {r["id"] for r in idx._read(
        "buckets", "id long, band int, bucket long").select("id").distinct().collect()}
    assert not (set(victims) & state_ids)
    assert {100, 101} <= state_ids  # fresh ids in the same batch admitted
    pairs = idx.stored_pairs()
    assert pairs.filter(
        F.col("id_a").isin(victims) | F.col("id_b").isin(victims)
    ).count() == 0


def test_minhash_erase_without_suppress_allows_readmission(spark, tmp_path):
    # the documented default: an erased id returning as genuinely new
    # data is legitimate (the user came back)
    idx = MinHashIndex(spark, str(tmp_path / "mh"), k=3, threshold=0.1)
    idx.append_batch(_docs(spark, range(20)))
    idx.erase([7])
    idx.append_batch(_docs(spark, [7], salt="returned"))
    assert idx.stored_shingles([7]).count() > 0


def test_minhash_erase_converges_under_racing_append(spark, tmp_path):
    # r10 ADVICE: a batch committed between erase's snapshot and its
    # claim stays outside the superseding checkpoint; the verify pass
    # must catch it and re-run until the ids are really gone
    idx = MinHashIndex(spark, str(tmp_path / "mh"), k=3, threshold=0.1)
    idx.append_batch(_docs(spark, range(30)))
    victims = [3, 4]

    orig_claim = idx._ckpts.claim
    calls = {"n": 0}

    def racing_claim(seq, uid, covered):
        calls["n"] += 1
        if calls["n"] == 1:
            # a rival writer lands the victims again, post-snapshot
            rival = MinHashIndex(spark, str(tmp_path / "mh"), k=3, threshold=0.1)
            rival.append_batch(_docs(spark, victims, salt="race"))
        return orig_claim(seq, uid, covered)

    idx._ckpts.claim = racing_claim
    try:
        idx.erase(victims)
    finally:
        idx._ckpts.claim = orig_claim
    assert calls["n"] >= 2, "verify pass must have re-run the erase"
    assert idx.stored_shingles(victims).count() == 0


def test_semantic_suppress_blocks_readmission(spark, tmp_path):
    from cdc_demo_spark.sources.synth_vectors import synth_embeddings

    emb = synth_embeddings(spark, 300)
    idx = SemanticIndex(
        spark, str(tmp_path / "sem"), t_num=4, t_den=5, n_buckets=8, probes=2,
    )
    idx.build(emb.filter(F.col("vec_id") < 250))
    victims = [10, 20]
    idx.erase(victims, suppress=True)
    idx.append_batch(emb.filter(F.col("vec_id").isin(victims + [260, 261])))
    members = idx._read("members", "id long, centroid_id long")
    ids = {r["id"] for r in members.select("id").distinct().collect()}
    assert not (set(victims) & ids)
    assert {260, 261} <= ids


def test_ivf_suppress_blocks_readmission(spark, tmp_path):
    from cdc_demo_spark.sources.synth_vectors import synth_embeddings

    emb = synth_embeddings(spark, 300)
    idx = IvfIndex(spark, str(tmp_path / "ivf"), n_centroids=8, nprobe=3)
    idx.build(emb.filter(F.col("vec_id") < 250))
    victims = [1, 2]
    idx.erase(victims, suppress=True)
    idx.append_batch(emb.filter(F.col("vec_id").isin(victims + [270])))
    ids = {r["vec_id"] for r in idx._vectors().select("vec_id").distinct().collect()}
    assert not (set(victims) & ids)
    assert 270 in ids


# -- append-intent fence (r11 ADVICE: the pre-record re-admission
# window) -------------------------------------------------------------
#
# An append that read the suppression ledger BEFORE erase's record()
# but claimed its marker AFTER the final verify pass re-admitted the
# erased ids permanently while erase() reported success.  The fence
# (storage.BatchCommitLog.open_intent / wait_intents_drained) makes
# suppress-mode erase drain exactly the intents live at record() time.


def test_intent_fence_unit(tmp_path):
    from cdc_demo_spark.storage import BatchCommitLog

    log = BatchCommitLog(str(tmp_path / "idx"))
    assert log.live_intents() == set()
    p = log.open_intent()
    assert log.live_intents() == {p}
    # an already-closed intent drains immediately
    log.close_intent(p)
    log.wait_intents_drained({p}, timeout_seconds=1.0)
    # close is idempotent
    log.close_intent(p)


def test_intent_fence_timeout_raises(tmp_path):
    import pytest

    from cdc_demo_spark.storage import BatchCommitLog

    log = BatchCommitLog(str(tmp_path / "idx"))
    p = log.open_intent()
    with pytest.raises(RuntimeError, match="did not drain"):
        log.wait_intents_drained({p}, timeout_seconds=0.5)
    log.close_intent(p)


def test_intent_fence_stale_intent_is_dead(tmp_path):
    import time
    import warnings

    from cdc_demo_spark.storage import BatchCommitLog

    log = BatchCommitLog(str(tmp_path / "idx"))
    p = log.open_intent()
    # a crashed appender: rewrite the open-timestamp two hours back
    with open(p, "w") as f:
        f.write(repr(time.time() - 7200))
    # default stale TTL is 3600s -> treated dead, drain returns — but
    # NOT silently (r12 ADVICE #2): the skipped intent comes back in
    # the result and a RuntimeWarning tells the operator an append
    # outliving the TTL would be invisible to the erase verify.
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        skipped = log.wait_intents_drained({p}, timeout_seconds=1.0)
    assert skipped == {p}
    assert any(
        "intent_stale_ttl_seconds" in str(w.message)
        and issubclass(w.category, RuntimeWarning)
        for w in caught
    )
    # and gc's sweep removes the corpse
    assert log.sweep_stale_intents(3600.0) == [p]
    assert log.live_intents() == set()


def test_intent_fence_normal_drain_returns_empty_no_warning(tmp_path):
    import warnings

    from cdc_demo_spark.storage import BatchCommitLog

    log = BatchCommitLog(str(tmp_path / "idx"))
    p = log.open_intent()
    log.close_intent(p)
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        assert log.wait_intents_drained({p}, timeout_seconds=1.0) == set()
    assert not [w for w in caught if issubclass(w.category, RuntimeWarning)]


def test_append_leaves_no_intent_behind(spark, tmp_path):
    idx = MinHashIndex(spark, str(tmp_path / "mh"), k=3, threshold=0.1)
    idx.append_batch(_docs(spark, range(10)))
    assert idx._log.live_intents() == set()
    # epoch-replay skip path exits before the fence opens
    idx2 = MinHashIndex(spark, str(tmp_path / "mh2"), k=3, threshold=0.1)
    idx2.append_batch(_docs(spark, range(5)), batch_id=0)
    idx2.append_batch(_docs(spark, range(5)), batch_id=0)  # replay: skipped
    assert idx2._log.live_intents() == set()


def test_suppress_erase_drains_prerecord_append(spark, tmp_path):
    """The full race, deterministically: an append whose ledger read
    predates record() commits the victim AFTER record but BEFORE the
    erase's verify would have run.  The fence forces the erase to wait
    for that append's intent; once drained, its snapshot/verify loop
    sees the committed rows and purges them."""
    idx = MinHashIndex(spark, str(tmp_path / "mh"), k=3, threshold=0.1)
    idx.append_batch(_docs(spark, range(30)))
    victims = [3]

    # the in-flight appender: fence opened + ledger read already done
    # (ledger is empty at this point, so the read kept the victim)
    rival = MinHashIndex(spark, str(tmp_path / "mh"), k=3, threshold=0.1)
    inflight_intent = rival._log.open_intent()
    rival.suppression.filter_batch(_docs(spark, victims, salt="race"), "doc_id")

    orig_wait = idx._log.wait_intents_drained
    state = {"committed": False}

    def commit_rival_then_wait(observed, **kw):
        # the rival claims its marker while erase is blocked on the
        # fence — its ledger read happened pre-record, so simulate
        # that by bypassing the (now-populated) ledger re-read
        orig_filter = rival.suppression.filter_batch
        rival.suppression.filter_batch = lambda df, c: df
        try:
            rival.append_batch(_docs(spark, victims, salt="race"))
        finally:
            rival.suppression.filter_batch = orig_filter
        rival._log.close_intent(inflight_intent)
        state["committed"] = True
        return orig_wait(observed, timeout_seconds=10.0)

    idx._log.wait_intents_drained = commit_rival_then_wait
    try:
        idx.erase(victims, suppress=True)
    finally:
        idx._log.wait_intents_drained = orig_wait
    assert state["committed"], "the race must have actually run"
    # the erase's post-drain pass purged the re-admitted rows
    assert idx.stored_shingles(victims).count() == 0
    buckets = idx._read("buckets", "id long, band int, bucket long")
    assert buckets.filter(F.col("id").isin(victims)).count() == 0


def test_suppress_erase_times_out_on_wedged_append(spark, tmp_path):
    import pytest

    idx = MinHashIndex(spark, str(tmp_path / "mh"), k=3, threshold=0.1)
    idx.append_batch(_docs(spark, range(10)))
    idx._log.intent_timeout_seconds = 0.5
    wedged = idx._log.open_intent()
    try:
        with pytest.raises(RuntimeError, match="did not drain"):
            idx.erase([2], suppress=True)
    finally:
        idx._log.close_intent(wedged)
    # non-suppress erase never touches the fence
    idx.erase([2])
    assert idx.stored_shingles([2]).count() == 0
