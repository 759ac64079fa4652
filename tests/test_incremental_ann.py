"""Incremental IVF index: frozen-centroid probe must match the one-shot
ivf_topk when built from the same corpus, appended batches must be
findable, recall vs brute force must hold, and crash/param contracts
must match the MinHash index."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from cdc_demo_spark.operators.incremental_ann import IvfIndex
from cdc_demo_spark.operators.similarity import brute_force_topk, ivf_topk
from cdc_demo_spark.sources.tables import load_table


def _queries(spark, emb, n=8):
    return (
        emb.filter(F.col("vec_id") < n)
        .select(F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec"))
    )


def _rows(df):
    return {(r["query_id"], r["vec_id"], r["cos_sim"], r["rk"]) for r in df.collect()}


def test_index_matches_one_shot_ivf(spark, sf_dir, tmp_path):
    emb = load_table(spark, sf_dir, "embeddings")
    q = _queries(spark, emb)
    idx = IvfIndex(spark, str(tmp_path / "ivf"), n_centroids=16, nprobe=4)
    idx.build(emb)
    got = idx.topk(q, k=10)
    want = ivf_topk(emb, q, k=10, n_centroids=16, nprobe=4)
    assert _rows(got) == _rows(want)


def test_appended_vectors_are_found(spark, sf_dir, tmp_path):
    emb = load_table(spark, sf_dir, "embeddings")
    idx = IvfIndex(spark, str(tmp_path / "ivf"), n_centroids=8, nprobe=3)
    idx.build(emb.filter(F.col("vec_id") >= 10))

    # append the held-out vectors as a delta batch; querying BY one of
    # them must now return itself at rank 1 (cosine 1.0)
    delta = emb.filter(F.col("vec_id") < 10)
    idx.append_batch(delta)
    q = _queries(spark, emb, n=5)
    got = idx.topk(q, k=3)
    top1 = {r["query_id"]: (r["vec_id"], r["cos_sim"]) for r in got.collect() if r["rk"] == 1}
    for qid, (vid, sim) in top1.items():
        assert vid == qid and sim == 1.0


def test_recall_vs_brute_force(spark, sf_dir, tmp_path):
    emb = load_table(spark, sf_dir, "embeddings")
    q = _queries(spark, emb)
    idx = IvfIndex(spark, str(tmp_path / "ivf"), n_centroids=16, nprobe=4)
    idx.build(emb)
    approx = {(r["query_id"], r["vec_id"]) for r in idx.topk(q, k=10).collect()}
    exact = {(r["query_id"], r["vec_id"]) for r in brute_force_topk(emb, q, k=10).collect()}
    # same bound as test_similarity.py::test_ivf_recall_vs_brute_force:
    # the synthetic embeddings are RANDOM (worst case for IVF — nothing
    # clusters); 0.62 measured here, matching the one-shot path's 0.67
    assert len(approx & exact) / len(exact) >= 0.4


def test_repeat_compact_without_gc_is_noop(spark, sf_dir, tmp_path):
    # regression test for the guard at incremental_ann.IvfIndex.compact
    # (snap.fresh check): compact();compact() with no gc() between must
    # not rewrite the full vector table or burn a checkpoint id — the
    # covered sidecar is the freshness authority, not the still-on-disk
    # absorbed dirs (mirrors BloomIndex's test, VERDICT r9 #4)
    emb = load_table(spark, sf_dir, "embeddings")
    idx = IvfIndex(spark, str(tmp_path / "ivf"), n_centroids=8, nprobe=3)
    idx.build(emb.filter(F.col("vec_id") >= 10))
    idx.append_batch(emb.filter(F.col("vec_id") < 10))

    idx.compact()
    seq_before = idx._ckpts.latest()[0]
    state_dirs = sorted(idx._ckpts.state_dirs("vectors"))
    assert len(state_dirs) == 1 and "ckpt=" in state_dirs[0]

    idx.compact()  # nothing new landed, absorbed dirs NOT yet gc'd
    assert idx._ckpts.latest()[0] == seq_before, (
        "fresh compaction must be a no-op before gc"
    )
    assert sorted(idx._ckpts.state_dirs("vectors")) == state_dirs

    # a new batch makes it stale again; answers survive the second fold
    extra = emb.limit(5).select(
        (F.col("vec_id") + 100000).alias("vec_id"), "embedding"
    )
    idx.append_batch(extra)
    idx.compact()
    assert idx._ckpts.latest()[0] == seq_before + 1
    q = _queries(spark, emb, n=5)
    top1 = {r["query_id"]: r["vec_id"] for r in idx.topk(q, k=3).collect() if r["rk"] == 1}
    assert all(top1[qid] == qid for qid in top1)


def test_drift_metric_and_contracts(spark, sf_dir, tmp_path):
    emb = load_table(spark, sf_dir, "embeddings")
    idx = IvfIndex(spark, str(tmp_path / "ivf"), n_centroids=8)
    idx.build(emb)
    d = idx.centroid_drift(emb)
    assert 0.0 < d <= 1.0

    with pytest.raises(RuntimeError, match="already built"):
        idx.build(emb)
    with pytest.raises(ValueError, match="built with"):
        IvfIndex(spark, str(tmp_path / "ivf"), n_centroids=32)

    # crashed append (no _COMMITTED) stays invisible
    before = idx._vectors().count()
    orphan = tmp_path / "ivf" / "vectors" / "batch=99"
    emb.limit(5).select("vec_id", "embedding", F.lit(0).alias("centroid_id")).write.partitionBy(
        "centroid_id"
    ).parquet(str(orphan))
    assert idx._vectors().count() == before
