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
