"""Exactly-once streaming maintenance of the PAIR indexes
(minhash_sink / semantic_sink): foreachBatch is at-least-once, and
replaying an epoch into a pair index DOUBLES its shingle/membership
rows — every future Jaccard denominator (or tile scan) is then wrong,
the pair-index twin of the ledgers' double-count hazard.  Epoch-keyed
commits skip the replay BEFORE the probe runs and hand back the
epoch's persisted pairs, making stored_pairs() a replay-stable output
log."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from cdc_demo_spark.operators import ann_scale as AS
from cdc_demo_spark.operators.dedup import minhash_near_duplicates
from cdc_demo_spark.operators.incremental_dedup import MinHashIndex, minhash_sink
from cdc_demo_spark.operators.incremental_semantic import (
    SemanticIndex,
    semantic_sink,
)
from cdc_demo_spark.sources.synth_vectors import synth_embeddings
from cdc_demo_spark.sources.tables import load_table


def _pairs(df):
    return {(r["id_a"], r["id_b"]) for r in df.collect()}


def test_minhash_epoch_replay_skipped(spark, sf_dir, tmp_path):
    docs = load_table(spark, sf_dir, "documents")
    a = docs.filter(F.col("doc_id") < 300)
    b = docs.filter(F.col("doc_id") >= 300)

    idx = MinHashIndex(spark, str(tmp_path / "idx"), k=3, threshold=0.12)
    p0 = _pairs(idx.append_batch(a, batch_id=0, persist_pairs=True))
    rows_after_0 = idx.stored_shingles().count()
    # replay of epoch 0: skipped before the build, returns the
    # PERSISTED pairs, adds zero state rows
    replay = idx.append_batch(a, batch_id=0, persist_pairs=True)
    assert _pairs(replay) == p0
    assert idx.stored_shingles().count() == rows_after_0

    p1 = _pairs(idx.append_batch(b, batch_id=1, persist_pairs=True))
    one_shot = _pairs(
        minhash_near_duplicates(
            docs, "doc_id", "text", k=3, num_hashes=64, bands=16, threshold=0.12
        )
    )
    assert p0 | p1 == one_shot
    assert _pairs(idx.stored_pairs()) == one_shot


def test_minhash_ownership_mixing_refuses(spark, sf_dir, tmp_path):
    docs = load_table(spark, sf_dir, "documents").limit(30)
    idx = MinHashIndex(spark, str(tmp_path / "a"), k=3, threshold=0.12)
    idx.append_batch(docs)  # auto-owned
    with pytest.raises(ValueError, match="auto-owned"):
        idx.append_batch(docs, batch_id=5)
    idx2 = MinHashIndex(spark, str(tmp_path / "b"), k=3, threshold=0.12)
    idx2.append_batch(docs, batch_id=0)  # epoch-owned
    with pytest.raises(ValueError, match="epoch-owned"):
        idx2.append_batch(docs)


def test_minhash_sink_through_real_stream(spark, sf_dir, tmp_path):
    """Drive the near-dup index via an actual Structured Streaming
    query (file source → foreachBatch(minhash_sink), availableNow) in
    two waves under one checkpoint: final state must equal a one-shot
    run over everything ingested, and stored_pairs() is the complete
    exactly-once pair log."""
    docs = load_table(spark, sf_dir, "documents").localCheckpoint(eager=True)
    land = str(tmp_path / "land")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(land)
    idx = MinHashIndex(spark, str(tmp_path / "idx"), k=3, threshold=0.12)

    def run_wave(pred, prefix):
        docs.filter(pred).coalesce(1).write.mode("overwrite").parquet(
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
            spark.readStream.schema(docs.schema)
            .parquet(land)
            .writeStream.foreachBatch(minhash_sink(idx))
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
            .awaitTermination(120)
        )

    run_wave(F.col("doc_id") % 2 == 0, "w1")
    run_wave(F.col("doc_id") % 2 == 1, "w2")

    one_shot = _pairs(
        minhash_near_duplicates(
            docs, "doc_id", "text", k=3, num_hashes=64, bands=16, threshold=0.12
        )
    )
    assert _pairs(idx.stored_pairs()) == one_shot
    # compaction composes with the stream-owned log: state folds,
    # pairs survive untouched
    idx.compact()
    idx.gc()
    assert _pairs(idx.stored_pairs()) == one_shot


def test_semantic_stream_owned_replay_and_parity(spark, tmp_path):
    """A stream-owned semantic index: freeze_centroids (no batch-owned
    build), every batch through epoch ids; a replayed epoch adds no
    membership rows and returns its persisted pairs; the union equals
    the one-shot bucketed pair scan."""
    n = 3000
    corpus = synth_embeddings(spark, n, dup_every=100).cache()
    cents = AS.train_centroids_sampled(corpus, 32, sample=2048, iters=3).cache()
    first = corpus.filter(F.col("vec_id") < n // 2)
    second = corpus.filter(F.col("vec_id") >= n // 2)

    idx = SemanticIndex(
        spark, str(tmp_path / "idx"), t_num=4, t_den=5,
        n_buckets=32, probes=2, arrow=True,
    )
    idx.freeze_centroids(cents)
    with pytest.raises(RuntimeError, match="already built"):
        idx.freeze_centroids(cents)

    p0 = _pairs(idx.append_batch(first, batch_id=0, persist_pairs=True))
    members_after_0 = idx._read("members", "id long, centroid_id long").count()
    replay = idx.append_batch(first, batch_id=0, persist_pairs=True)
    assert _pairs(replay) == p0
    assert (
        idx._read("members", "id long, centroid_id long").count() == members_after_0
    )
    p1 = _pairs(idx.append_batch(second, batch_id=1, persist_pairs=True))

    one_shot = _pairs(
        AS.int8_cosine_pairs_bucketed_gemm(
            corpus, t_num=4, t_den=5, n_buckets=32, probes=2, centroids=cents
        )
    )
    assert p0 | p1 == one_shot
    assert _pairs(idx.stored_pairs()) == one_shot


def test_semantic_sink_through_real_stream(spark, tmp_path):
    """semantic_sink end-to-end: embedding stream in two waves under
    one checkpoint feeds a frozen-layout index; stored_pairs() equals
    the one-shot scan over everything ingested."""
    n = 2000
    corpus = synth_embeddings(spark, n, dup_every=100).localCheckpoint(eager=True)
    cents = AS.train_centroids_sampled(corpus, 16, sample=1024, iters=3).cache()
    land = str(tmp_path / "land")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(land)
    idx = SemanticIndex(
        spark, str(tmp_path / "idx"), t_num=4, t_den=5,
        n_buckets=16, probes=2, arrow=True,
    )
    idx.freeze_centroids(cents)

    def run_wave(pred, prefix):
        corpus.filter(pred).coalesce(1).write.mode("overwrite").parquet(
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
            spark.readStream.schema(corpus.schema)
            .parquet(land)
            .writeStream.foreachBatch(semantic_sink(idx))
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
            .awaitTermination(120)
        )

    run_wave(F.col("vec_id") % 2 == 0, "w1")
    run_wave(F.col("vec_id") % 2 == 1, "w2")

    one_shot = _pairs(
        AS.int8_cosine_pairs_bucketed_gemm(
            corpus, t_num=4, t_den=5, n_buckets=16, probes=2, centroids=cents
        )
    )
    assert _pairs(idx.stored_pairs()) == one_shot


def test_ivf_epoch_replay_skipped(spark, tmp_path):
    """IvfIndex shares the epoch protocol: a replayed vector-ingest
    epoch is skipped (replaying would double stored vectors and
    duplicate every future topk hit) and a stream-owned index freezes
    its layout first."""
    from cdc_demo_spark.operators.incremental_ann import IvfIndex

    corpus = synth_embeddings(spark, 1000, dup_every=80).cache()
    cents = AS.train_centroids_sampled(corpus, 8, sample=512, iters=2).cache()
    first = corpus.filter(F.col("vec_id") < 500)
    second = corpus.filter(F.col("vec_id") >= 500)

    idx = IvfIndex(spark, str(tmp_path / "idx"), n_centroids=8, nprobe=3)
    idx.freeze_centroids(
        cents.select(
            F.col("centroid_id"), F.col("centroid_vec")
        )
    )
    assert idx.append_batch(first, batch_id=0) is True
    n0 = idx._vectors().count()
    assert idx.append_batch(first, batch_id=0) is False  # replay: skipped
    assert idx._vectors().count() == n0
    assert idx.append_batch(second, batch_id=1) is True
    vecs = idx._vectors()
    assert vecs.count() == 1000
    assert vecs.select("vec_id").distinct().count() == 1000  # no doubles
    with pytest.raises(ValueError, match="epoch-owned"):
        idx.append_batch(second)


def test_ivf_rebuild_fresh_layout(spark, tmp_path):
    """The drift remedy: rebuild() trains fresh centroids from the
    stored vectors into a NEW dir (old index untouched — immutable-
    then-swap), carries every stored vector across, and the new index
    answers topk at least as well as the drifted old one on
    out-of-distribution queries."""
    from cdc_demo_spark.operators.incremental_ann import IvfIndex

    base = synth_embeddings(spark, 800, dup_every=80).cache()
    drifted = synth_embeddings(spark, 800, start=100_000, dup_every=80).cache()

    idx = IvfIndex(spark, str(tmp_path / "old"), n_centroids=8, nprobe=2)
    idx.build(base)
    idx.append_batch(drifted)

    new = idx.rebuild(str(tmp_path / "new"))
    assert new._vectors().count() == idx._vectors().count() == 1600
    assert {r["vec_id"] for r in new._vectors().select("vec_id").collect()} == {
        r["vec_id"] for r in idx._vectors().select("vec_id").collect()
    }
    # old index still fully readable (swap is the caller's move)
    assert len(idx._state_dirs()) == 2
    # fresh centroids fit the union at least as well as the frozen ones
    probe = drifted.limit(200)
    assert new.centroid_drift(probe) >= idx.centroid_drift(probe) - 1e-9
    # the new table is batch-owned (build admits batch 0 under an
    # auto id); further batch appends land normally
    assert new.append_batch(synth_embeddings(spark, 50, start=200_000)) is True
    assert new._vectors().count() == 1650
