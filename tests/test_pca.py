"""PCA over embeddings: covariance vs numpy, component invariants
(orthonormal, descending variance, deterministic sign), projection
agreement with numpy, reconstruction error shrinking in k, and a
Python-free projection plan.  The distributed half's oracle is
q_embedding_covariance (queries/similarity.py)."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from cdc_demo_spark.operators.pca import (
    covariance,
    pca_components,
    project,
)
from cdc_demo_spark.sources.tables import load_table


def _np_embeddings(spark, sf_dir) -> np.ndarray:
    emb = load_table(spark, sf_dir, "embeddings").orderBy("vec_id")
    return np.stack(
        [np.array(r["embedding"], dtype=np.float64) for r in emb.collect()]
    )


def test_covariance_matches_numpy(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    got = covariance(emb)
    X = _np_embeddings(spark, sf_dir)
    want = np.cov(X, rowvar=False, bias=True)
    assert np.allclose(got, want, atol=1e-12)


def test_components_invariants(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    comps, mean = pca_components(emb, k=8)
    assert comps.shape == (8, 64) and mean.shape == (64,)
    # orthonormal rows
    assert np.allclose(comps @ comps.T, np.eye(8), atol=1e-10)
    # descending explained variance
    X = _np_embeddings(spark, sf_dir)
    proj = (X - mean) @ comps.T
    var = proj.var(axis=0)
    assert all(var[i] >= var[i + 1] - 1e-12 for i in range(7))
    # deterministic sign convention: max-|coord| entry positive
    for row in comps:
        assert row[int(np.argmax(np.abs(row)))] > 0


def test_projection_matches_numpy_and_reconstruction_shrinks(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    X = _np_embeddings(spark, sf_dir)
    errs = []
    for k in (2, 8, 16):
        comps, mean = pca_components(emb, k=k)
        got = {
            r["vec_id"]: np.array(r["pca"])
            for r in project(emb, comps, mean).select("vec_id", "pca").collect()
        }
        want = (X - mean) @ comps.T
        got_m = np.stack([got[i] for i in sorted(got)])
        assert np.allclose(got_m, want, atol=1e-9)
        recon = want @ comps + mean
        errs.append(float(np.mean((X - recon) ** 2)))
    assert errs[0] > errs[1] > errs[2], errs


def test_projection_plan_is_python_free(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    comps, mean = pca_components(emb, k=4)
    plan = (
        project(emb, comps, mean)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
