"""Multi-table covered-set compaction of the pair indexes
(operators/compaction.py): compact() must fold K batch dirs per table
into one checkpoint WITHOUT changing any answer — state row-sets are
identical pre/post, an append after compaction returns exactly what it
returns on an uncompacted twin, gc reclaims only superseded dirs, and
the protocol survives the rename-less object-store backend.  In arrow
mode the semantic compactor additionally RE-PACKS tiles to full
occupancy and re-shards to corpus-sized moduli — the repair-pass
property the module exists for."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from cdc_demo_spark.operators import ann_scale as AS
from cdc_demo_spark.operators.incremental_dedup import MinHashIndex
from cdc_demo_spark.operators.incremental_semantic import SemanticIndex
from cdc_demo_spark.sources.synth_vectors import synth_embeddings
from cdc_demo_spark.sources.tables import load_table
from cdc_demo_spark.storage import (
    ConcurrentAppendError,
    ObjectStoreCommitBackend,
    PosixCommitBackend,
)


def _pairs(df):
    return {(r["id_a"], r["id_b"]) for r in df.collect()}


def _shingle_set(idx):
    return {(r["id"], r["h64"]) for r in idx.stored_shingles().collect()}


def _bucket_set(idx):
    return {
        (r["id"], r["band"], r["bucket"])
        for r in idx._read("buckets", "id long, band int, bucket long").collect()
    }


_BACKENDS = {
    "posix": PosixCommitBackend,
    "objectstore": ObjectStoreCommitBackend,
}


@pytest.mark.parametrize("backend_name", ["posix", "objectstore"])
def test_minhash_compact_preserves_state_and_appends(
    spark, sf_dir, tmp_path, monkeypatch, backend_name
):
    """Three-batch lifecycle with a compaction between batches 2 and 3:
    state row-sets identical pre/post compact, the post-compact append
    equals the uncompacted twin's, gc reclaims exactly the covered
    dirs, and the re-sharded checkpoint carries a corpus-sized
    modulus + sidecar (forced > 1 at toy scale)."""
    import cdc_demo_spark.operators.incremental_dedup as mod

    monkeypatch.setattr(mod, "_SHARD_ROWS", 256)
    be = _BACKENDS[backend_name]()
    docs = load_table(spark, sf_dir, "documents")
    a = docs.filter(F.col("doc_id") < 200)
    b = docs.filter((F.col("doc_id") >= 200) & (F.col("doc_id") < 400))
    c = docs.filter(F.col("doc_id") >= 400)

    idx = MinHashIndex(spark, str(tmp_path / "idx"), k=3, threshold=0.12, backend=be)
    twin = MinHashIndex(spark, str(tmp_path / "twin"), k=3, threshold=0.12, backend=be)
    for part in (a, b):
        idx.append_batch(part).count()
        twin.append_batch(part).count()

    pre_shingles, pre_buckets = _shingle_set(idx), _bucket_set(idx)
    idx.compact()
    assert _shingle_set(idx) == pre_shingles
    assert _bucket_set(idx) == pre_buckets
    # one checkpoint dir per table now holds the whole state
    assert len(idx._state_dirs("buckets")) == 1
    assert len(idx._state_dirs("shingles")) == 1
    (ckpt_sh,) = idx._state_dirs("shingles")
    assert os.path.basename(ckpt_sh).startswith("ckpt=")
    assert idx._nshards_of(ckpt_sh) > 1, "checkpoint should re-shard at corpus size"

    # pruned fetch through the checkpoint == full scan filtered
    ids = [r["doc_id"] for r in a.limit(4).collect()]
    pruned = {(r["id"], r["h64"]) for r in idx.stored_shingles(ids).collect()}
    full = {
        (r["id"], r["h64"])
        for r in idx.stored_shingles().filter(F.col("id").isin(ids)).collect()
    }
    assert pruned and pruned == full

    # compact again with nothing new: no-op (seq unchanged)
    seq_before = idx._ckpts.latest()[0]
    idx.compact()
    assert idx._ckpts.latest()[0] == seq_before

    # gc reclaims the covered batch dirs; answers unchanged
    removed = idx.gc()
    assert removed and all("batch=" in r for r in removed)
    assert _shingle_set(idx) == pre_shingles

    # post-compaction append == uncompacted twin's append, exactly
    p3 = idx.append_batch(c)
    p3_twin = twin.append_batch(c)
    assert _pairs(p3) == _pairs(p3_twin)
    # the new batch is OUTSIDE the covered set: readable alongside the
    # checkpoint, and a second compact folds it in
    assert len(idx._state_dirs("shingles")) == 2
    idx.compact()
    idx.gc()
    assert len(idx._state_dirs("shingles")) == 1
    assert _shingle_set(idx) == _shingle_set(twin)


def test_minhash_racing_compactors_lose_loudly(spark, sf_dir, tmp_path):
    docs = load_table(spark, sf_dir, "documents").limit(40)
    idx = MinHashIndex(spark, str(tmp_path / "idx"), k=3, threshold=0.12)
    idx.append_batch(docs).count()
    # rival's marker lands between our seq computation and our claim
    assert idx.backend.put_if_absent(
        os.path.join(idx.path, "checkpoints", "0"), b"{}"
    )
    idx._ckpts.next_seq = lambda: 0
    with pytest.raises(ConcurrentAppendError):
        idx.compact()
    # the loser's unreferenced ckpt dirs are TTL-swept, not leaked
    removed = idx.gc(orphan_ttl_seconds=0.0)
    assert any("ckpt=" in r for r in removed)
    # state is untouched: the poisoned seq is burned, a retry succeeds
    del idx._ckpts.next_seq  # restore the class method
    idx.compact()
    assert len(idx._state_dirs("shingles")) == 1


def test_semantic_arrow_compact_repacks_tiles(spark, tmp_path, monkeypatch):
    """Arrow-mode compaction re-derives tiles from merged members +
    quantized: fewer, fuller tiles; sharded with a sidecar; and the
    post-compact append returns exactly the uncompacted twin's pairs
    (bucket membership, not tile packing, decides candidates)."""
    import cdc_demo_spark.operators.incremental_semantic as mod

    monkeypatch.setattr(mod, "_TILE_SHARD_ROWS", 8)  # force ns > 1
    n = 4000
    corpus = synth_embeddings(spark, n, dup_every=100).cache()
    cents = AS.train_centroids_sampled(corpus, 32, sample=2048, iters=3).cache()
    first = corpus.filter(F.col("vec_id") < 1500)
    second = corpus.filter((F.col("vec_id") >= 1500) & (F.col("vec_id") < 3000))
    third = corpus.filter(F.col("vec_id") >= 3000)

    def make(name):
        i = SemanticIndex(
            spark, str(tmp_path / name), t_num=4, t_den=5,
            n_buckets=32, probes=2, arrow=True,
        )
        i.build(first, centroids=cents).count()
        i.append_batch(second).count()
        return i

    idx, twin = make("idx"), make("twin")

    def member_set(i):
        return {
            (r["id"], r["centroid_id"])
            for r in i._read("members", "id long, centroid_id long").collect()
        }

    pre_members = member_set(idx)
    pre_tiles = idx.stored_tiles().count()
    idx.compact()
    assert member_set(idx) == pre_members
    assert len(idx._state_dirs("tiles")) == 1
    (ckpt_tiles,) = idx._state_dirs("tiles")
    from cdc_demo_spark.operators.shard_layout import nshards_of

    assert nshards_of(idx.backend, ckpt_tiles) > 1
    # repack: two batches' per-bucket sub-tiles merge into fewer tiles
    assert idx.stored_tiles().count() < pre_tiles
    idx.gc()

    p3 = idx.append_batch(third)
    p3_twin = twin.append_batch(third)
    assert _pairs(p3) == _pairs(p3_twin)
    assert member_set(idx) == member_set(twin)


def test_ivf_compact_topk_parity(spark, tmp_path):
    """IvfIndex compaction: the centroid_id=-partitioned checkpoint
    answers topk exactly as the fragmented twin (copied pre-compact so
    the frozen centroids are identical), the next append lands outside
    the covered set, and gc reclaims only superseded dirs."""
    import shutil

    from cdc_demo_spark.operators.incremental_ann import IvfIndex

    corpus = synth_embeddings(spark, 1200, dup_every=80).cache()
    first = corpus.filter(F.col("vec_id") < 500)
    second = corpus.filter((F.col("vec_id") >= 500) & (F.col("vec_id") < 900))
    third = corpus.filter(F.col("vec_id") >= 900)
    queries = corpus.filter(F.col("vec_id") % 300 == 0).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )

    idx = IvfIndex(spark, str(tmp_path / "idx"), n_centroids=8, nprobe=3)
    idx.build(first)
    idx.append_batch(second)
    shutil.copytree(tmp_path / "idx", tmp_path / "twin")
    twin = IvfIndex(spark, str(tmp_path / "twin"), n_centroids=8, nprobe=3)

    def hits(i):
        return {
            (r["query_id"], r["vec_id"])
            for r in i.topk(queries, k=5).collect()
        }

    idx.compact()
    removed = idx.gc()
    assert removed and all("batch=" in r for r in removed)
    assert len(idx._state_dirs()) == 1
    assert hits(idx) == hits(twin)

    idx.append_batch(third)
    twin.append_batch(third)
    assert len(idx._state_dirs()) == 2  # new batch outside the covered set
    assert hits(idx) == hits(twin)


def test_semantic_hof_compact_append_parity(spark, tmp_path):
    n = 900
    corpus = synth_embeddings(spark, n, dup_every=60).cache()
    first = corpus.filter(F.col("vec_id") < 600)
    second = corpus.filter(F.col("vec_id") >= 600)

    def make(name):
        i = SemanticIndex(
            spark, str(tmp_path / name), t_num=4, t_den=5, n_buckets=8, probes=2
        )
        i.build(first).count()
        return i

    idx = make("idx")
    twin = SemanticIndex(
        spark, str(tmp_path / "twin"), t_num=4, t_den=5, n_buckets=8, probes=2
    )
    # same frozen centroids so the twin's layout matches exactly
    twin.build(first, centroids=idx.centroids()).count()

    idx.compact()
    idx.gc()
    assert len(idx._state_dirs("members")) == 1
    assert _pairs(idx.append_batch(second)) == _pairs(twin.append_batch(second))


def test_gc_of_legacy_batch_keeps_id_burned(spark, tmp_path):
    """Reclaiming a covered LEGACY (pre-marker) batch dir must not
    un-burn its id: the dir was the only thing burning it, so gc
    writes an empty-uid marker before the rmtree — otherwise the next
    append reuses the id and the covered set swallows it as
    superseded: committed-but-invisible, silent data loss."""
    import shutil as _sh

    from cdc_demo_spark.operators.incremental_ann import IvfIndex

    corpus = synth_embeddings(spark, 100, dup_every=50).cache()
    idx = IvfIndex(spark, str(tmp_path / "idx"), n_centroids=4, nprobe=2)
    idx.build(corpus)
    # devolve batch 0 into the legacy pre-marker layout
    (d0,) = idx._committed_batches()
    legacy = os.path.join(os.path.dirname(d0), "batch=0")
    _sh.move(d0, legacy)
    open(os.path.join(legacy, "_COMMITTED"), "w").write("")
    idx.backend.delete(idx._log.marker(0))
    assert idx._vectors().count() == 100

    idx.compact()
    removed = idx.gc()
    assert legacy in removed
    # the id stays burned: the next append must NOT land at 0
    assert idx._log.next_batch_id("vectors") >= 1
    assert idx.append_batch(synth_embeddings(spark, 50, start=1000)) is True
    assert idx._vectors().count() == 150  # nothing swallowed


def test_empty_epoch_does_not_brick_reads(spark, tmp_path):
    """A zero-row epoch (a quiet foreachBatch micro-batch) commits a
    batch dir holding only _SUCCESS; every later read must tolerate
    it — per-dir schema inference on such a dir throws
    UNABLE_TO_INFER_SCHEMA and one quiet epoch would brick the index
    forever."""
    from cdc_demo_spark.operators.incremental_ann import IvfIndex

    corpus = synth_embeddings(spark, 500, dup_every=50).cache()
    cents = AS.train_centroids_sampled(corpus, 4, sample=256, iters=2).cache()
    empty = corpus.filter(F.col("vec_id") < 0)

    ivf = IvfIndex(spark, str(tmp_path / "ivf"), n_centroids=4, nprobe=2)
    ivf.freeze_centroids(cents.select("centroid_id", "centroid_vec"))
    assert ivf.append_batch(corpus, batch_id=0) is True
    assert ivf.append_batch(empty, batch_id=1) is True  # quiet epoch
    assert ivf._vectors().count() == 500
    q = corpus.limit(3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    assert ivf.topk(q, k=2).count() > 0
    ivf.compact()
    ivf.gc()
    assert ivf._vectors().count() == 500

    sem = SemanticIndex(
        spark, str(tmp_path / "sem"), t_num=4, t_den=5,
        n_buckets=4, probes=2, arrow=True,
    )
    sem.freeze_centroids(cents)
    assert sem.append_batch(empty, batch_id=0).count() == 0  # FIRST epoch quiet
    p = sem.append_batch(corpus, batch_id=1)
    assert p.count() >= 0
    assert sem._read("members", "id long, centroid_id long").count() > 0

    mh = MinHashIndex(spark, str(tmp_path / "mh"), k=3, threshold=0.12)
    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    mh.append_batch(docs.filter(F.col("doc_id") < 0), batch_id=0)  # quiet
    assert mh.append_batch(docs.limit(50), batch_id=1).count() >= 0
    assert mh.stored_shingles().count() > 0
