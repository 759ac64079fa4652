"""PCA over an embedding column — the OPQ-style preprocessing step of
a vector-search pipeline (rotate/project before product quantization;
see the PQ module), and the standard dimensionality reducer for
embedding analytics.

Scale shape: the ONLY distributed work is one pass computing the Gram
matrix and mean — mapInPandas emits one d×d partial Gram per Arrow
batch (numpy X.T @ X, the same fused-kernel idiom as ann_scale), and
the driver sums a handful of 64×64 partials.  The eigensolve is
driver-side numpy on a d×d matrix — at ANY corpus size the decomposed
object is d², never n — and the projection broadcasts the component
matrix back as literal arrays, applied with JVM array algebra
(zip_with dot products, no Python in the projection plan).

The covariance itself is oracle-checkable (q_embedding_covariance
mirrors it in DuckDB as an unnest-pair aggregate); the eigensolve is
not SQL-expressible, so projection quality is pinned by pytest
invariants instead: orthonormal components, descending explained
variance, reconstruction error shrinking in k, and exact agreement
with numpy's PCA on the fixture (tests/test_pca.py).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def gram_and_mean(emb: DataFrame, vec_col: str = "embedding") -> tuple[np.ndarray, np.ndarray, int]:
    """(gram, sum, n) from one distributed pass: per-Arrow-batch
    partial X.T @ X and column sums, driver-summed."""

    def partials(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            X = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            yield pd.DataFrame(
                {
                    "gram": [X.T @ X],
                    "colsum": [X.sum(axis=0)],
                    "n": [np.int64(len(X))],
                }
            )

    rows = (
        emb.select(vec_col)
        .mapInPandas(
            partials,
            schema="gram array<array<double>>, colsum array<double>, n long",
        )
        .collect()
    )
    gram = np.sum([np.array(r["gram"]) for r in rows], axis=0)
    colsum = np.sum([np.array(r["colsum"]) for r in rows], axis=0)
    n = int(sum(r["n"] for r in rows))
    return gram, colsum, n


def covariance(emb: DataFrame, vec_col: str = "embedding") -> np.ndarray:
    """Population covariance (divide by n): cov = gram/n − mean meanᵀ."""
    gram, colsum, n = gram_and_mean(emb, vec_col)
    mean = colsum / n
    return gram / n - np.outer(mean, mean)


def pca_components(emb: DataFrame, k: int, vec_col: str = "embedding") -> tuple[np.ndarray, np.ndarray]:
    """(components (k×d), mean (d,)) — top-k principal axes by
    eigendecomposition of the covariance.  Deterministic sign
    convention: each component's largest-|coordinate| entry is made
    positive, so two runs (or two engines' eigensolvers) agree."""
    gram, colsum, n = gram_and_mean(emb, vec_col)
    mean = colsum / n
    cov = gram / n - np.outer(mean, mean)
    vals, vecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(vals)[::-1][: int(k)]
    comps = vecs[:, order].T
    for i in range(comps.shape[0]):
        j = int(np.argmax(np.abs(comps[i])))
        if comps[i, j] < 0:
            comps[i] = -comps[i]
    return comps, mean


def project(
    df: DataFrame,
    components: np.ndarray,
    mean: np.ndarray,
    vec_col: str = "embedding",
    out_col: str = "pca",
) -> DataFrame:
    """Append ``out_col`` = components @ (x − mean), as JVM array
    algebra: the k×d component matrix rides along as literal arrays
    (a d≤1024 matrix is bytes, not data) and each coordinate is one
    zip_with/aggregate dot product in codegen."""
    centered = F.zip_with(
        F.col(vec_col).cast("array<double>"),
        F.array(*[F.lit(float(m)) for m in mean]),
        lambda x, m: x - m,
    )
    coords = [
        F.aggregate(
            F.zip_with(
                centered,
                F.array(*[F.lit(float(c)) for c in comp]),
                lambda x, w: x * w,
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        for comp in components
    ]
    return df.withColumn(out_col, F.array(*coords))
