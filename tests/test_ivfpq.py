"""IVF-PQ composed index: recall gates vs brute force, the rerank
recovering (nearly) the IVF admission bound, residual-encoding
determinism, probed-bucket-only scanning, and self-retrieval through
the two-stage path."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cdc_demo_spark.operators.ivfpq import build_ivfpq, ivfpq_topk, ivfpq_topk_rerank
from cdc_demo_spark.operators.similarity import brute_force_topk, ivf_topk
from cdc_demo_spark.sources.tables import load_table

PARAMS = dict(n_centroids=16, nprobe=4, m=8, ksub=16)


@pytest.fixture(scope="module")
def fixture(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    model = build_ivfpq(emb, **PARAMS)
    return emb, q, model


def _pairs(df):
    return {(r["query_id"], r["vec_id"]) for r in df.collect()}


def test_recall_gates(spark, fixture):
    emb, q, model = fixture
    exact = _pairs(brute_force_topk(emb, q, k=10))
    raw = _pairs(ivfpq_topk(model, q, k=10))
    rer = _pairs(ivfpq_topk_rerank(model, emb, q, k=10, shortlist=50))
    # random 64-dim embeddings are the worst case for IVF; measured
    # 0.35 raw / 0.60 rerank at these params (the IVF admission bound
    # itself is ~0.62 here)
    assert len(raw & exact) / len(exact) >= 0.25
    assert len(rer & exact) / len(exact) >= 0.5
    assert len(rer & exact) >= len(raw & exact)


def test_rerank_recovers_ivf_admission_bound(spark, fixture):
    # the two-stage answer can't beat what the IVF probe admits; it
    # should land within a whisker of it (PQ only orders the shortlist)
    emb, q, model = fixture
    exact = _pairs(brute_force_topk(emb, q, k=10))
    ivf_only = _pairs(
        ivf_topk(emb, q, k=10, n_centroids=PARAMS["n_centroids"],
                 nprobe=PARAMS["nprobe"])
    )
    rer = _pairs(ivfpq_topk_rerank(model, emb, q, k=10, shortlist=50))
    ivf_recall = len(ivf_only & exact) / len(exact)
    rer_recall = len(rer & exact) / len(exact)
    assert rer_recall >= ivf_recall - 0.1, (rer_recall, ivf_recall)


def test_build_is_deterministic(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    a = build_ivfpq(emb, **PARAMS)
    b = build_ivfpq(emb, **PARAMS)
    assert (a.centroids == b.centroids).all()
    assert (a.codebooks == b.codebooks).all()
    rows_a = {(r["id"], r["centroid_id"], tuple(r["codes"])) for r in a.codes.collect()}
    rows_b = {(r["id"], r["centroid_id"], tuple(r["codes"])) for r in b.codes.collect()}
    assert rows_a == rows_b


def test_scans_only_probed_buckets(spark, fixture):
    emb, q, model = fixture
    # with a full-coverage probe the scan is the whole table; with the
    # default probe the candidate set must be exactly the probed
    # buckets' membership — verified through the scored row universe
    shortlist = ivfpq_topk(model, q, k=10**6)  # no top-k truncation
    scanned_ids = {r["vec_id"] for r in shortlist.select("vec_id").distinct().collect()}
    # recompute the probed buckets the operator derived
    import numpy as np

    qrows = q.collect()
    qmat = np.array([r["query_vec"] for r in qrows], dtype=np.float64)
    qmat /= np.linalg.norm(qmat, axis=1, keepdims=True)
    cnorm = model.centroids / np.linalg.norm(model.centroids, axis=1, keepdims=True)
    order = np.argsort(-(qmat @ cnorm.T), axis=1, kind="stable")[:, : model.nprobe]
    probed = {int(c) for row in order for c in row}
    members = {
        r["id"]
        for r in model.codes.filter(F.col("centroid_id").isin(sorted(probed)))
        .select("id").collect()
    }
    assert scanned_ids <= members
    non_probed = {
        r["id"]
        for r in model.codes.filter(~F.col("centroid_id").isin(sorted(probed)))
        .select("id").collect()
    }
    assert not (scanned_ids & non_probed)


def test_self_retrieval_through_rerank(spark, fixture):
    emb, q, model = fixture
    top1 = {
        r["query_id"]: (r["vec_id"], r["cos_sim"])
        for r in ivfpq_topk_rerank(model, emb, q, k=3, shortlist=50).collect()
        if r["rk"] == 1
    }
    # a query vector IS in the corpus; its own bucket is always its
    # nearest probe, and the exact rerank must put it at rank 1
    for qid, (vid, sim) in top1.items():
        assert vid == qid and sim == 1.0
