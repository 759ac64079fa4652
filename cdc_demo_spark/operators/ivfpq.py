"""IVF-PQ: the composed billion-scale ANN index (faiss IndexIVFPQ
shape; Jégou et al. TPAMI 2011, §V).  IVF contributes PRUNING — a
query touches only ``nprobe`` of ``n_centroids`` buckets — and PQ
contributes COMPRESSION — each vector is M small codes, scored by
table lookups with no float vector touched.  The two multiply: query
cost ≈ (nprobe / n_centroids) × (PQ scan cost), which is the layout
every billion-vector deployment actually runs.

Residual encoding, the detail that makes the composition accurate:
vectors are encoded as PQ codes of (x − centroid), not of x.  Within
a bucket every member shares the same centroid, so ADC against the
query's OWN residual (q − centroid) computes ||q − x||² exactly up to
PQ quantization error — the coarse geometry is carried by the bucket
id, and the codebooks only need to cover the residual ball (far
smaller spread than the raw space, hence better codes at equal bits).
That is why codebooks train on residual samples with normalization
OFF (pq.train_codebooks(normalize=False)): renormalizing a residual
would destroy the geometry the trick depends on.

Engine mapping / 100 TB shape:
- build: centroid train (sampled Lloyd, frozen at ingest), one
  broadcast-join assignment pass, one Arrow-batched residual+encode
  pass.  The stored table is (vec_id, centroid_id, codes) — at scale,
  written partitioned by centroid_id so probes prune partitions.
- search: queries collect under the PQ cap (they are few BY CONTRACT;
  the corpus is the big side), probes and per-(query, probe) residual
  LUTs are built driver-side (nprobe × M × ksub floats per query —
  kilobytes) and broadcast; scoring scans ONLY probed buckets' codes
  with numpy gathers; per-query top-k via the usual window; optional
  exact re-rank joins float vectors for the shortlist only.

Scores are float sums in partition order → the registered query is
rows-only by design (like q_pq_topk / q_ann_ivf_topk); recall vs
brute force and vs flat PQ is the pytest-asserted contract
(tests/test_ivfpq.py).
"""

from __future__ import annotations

from collections.abc import Iterator
from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from cdc_demo_spark.operators.pq import PQ_QUERY_CAP, _normalize, encode, train_codebooks
from cdc_demo_spark.operators.similarity import (
    assign_buckets,
    choose_centroids,
    refine_centroids,
)


@dataclass
class IvfPqModel:
    centroids: np.ndarray  # (n_centroids, d) float64, row index = centroid_id
    codebooks: np.ndarray  # (m, ksub, d/m) float64, residual-trained
    codes: DataFrame  # (id, centroid_id, codes array<int>)
    nprobe: int


def _residuals(
    corpus: DataFrame,
    centroids: DataFrame,
    vec_col: str,
    id_col: str,
) -> DataFrame:
    """(id, centroid_id, resid) — L2-normalize x, subtract the assigned
    centroid; all JVM array algebra."""
    assigned = assign_buckets(corpus, centroids, vec_col, id_col).select(
        id_col, "centroid_id"
    )
    norm = F.sqrt(
        F.aggregate(
            F.col(vec_col).cast("array<double>"),
            F.lit(0.0),
            lambda acc, x: acc + x * x,
        )
    )
    unit = F.transform(F.col(vec_col).cast("array<double>"), lambda x: x / norm)
    return (
        corpus.select(id_col, vec_col)
        .join(assigned, id_col)
        .join(F.broadcast(centroids), "centroid_id")
        .select(
            id_col,
            "centroid_id",
            F.zip_with(
                unit,
                F.col("centroid_vec").cast("array<double>"),
                lambda x, c: x - c,
            ).alias("resid"),
        )
    )


def build_ivfpq(
    corpus: DataFrame,
    n_centroids: int = 16,
    nprobe: int = 4,
    m: int = 8,
    ksub: int = 16,
    refine_iters: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> IvfPqModel:
    """Train coarse centroids, train residual codebooks, encode the
    corpus.  Deterministic end to end (seed-spread centroids,
    md5-ordered codebook sample), so two builds agree bit-for-bit."""
    cents = choose_centroids(corpus, n_centroids, vec_col, id_col)
    if refine_iters > 0:
        cents = refine_centroids(
            corpus, cents, iterations=refine_iters, vec_col=vec_col, id_col=id_col
        )
    cents = cents.localCheckpoint(eager=True)
    resid = _residuals(corpus, cents, vec_col, id_col)
    books = train_codebooks(
        resid, m=m, ksub=ksub, vec_col="resid", id_col=id_col, normalize=False
    )
    codes = (
        encode(resid, books, vec_col="resid", id_col=id_col, normalize=False)
        .join(resid.select(id_col, "centroid_id"), id_col)
        .select(F.col(id_col).alias("id"), "centroid_id", "codes")
        .localCheckpoint(eager=True)
    )
    crows = cents.orderBy("centroid_id").collect()
    cmat = np.array([r["centroid_vec"] for r in crows], dtype=np.float64)
    return IvfPqModel(centroids=cmat, codebooks=books, codes=codes, nprobe=nprobe)


def ivfpq_topk(
    model: IvfPqModel,
    queries: DataFrame,
    k: int = 10,
    query_id: str = "query_id",
    query_vec: str = "query_vec",
    query_cap: int = PQ_QUERY_CAP,
) -> DataFrame:
    """Approximate top-k: per query, probe the ``nprobe`` nearest
    centroids, ADC-score ONLY those buckets' codes against the query's
    per-probe residual LUTs.  Returns (query_id, vec_id, approx_cos,
    rk); approx_cos = 1 − ||q − x||²/2 on unit vectors, comparable to
    the exact-cosine paths."""
    m, ksub, dsub = model.codebooks.shape
    qrows = queries.select(query_id, query_vec).limit(query_cap + 1).collect()
    if len(qrows) > query_cap:
        raise ValueError(
            f"IVF-PQ query side exceeds the driver-collect cap ({query_cap}); "
            "chunk the query batch (corpus size is unlimited — this cap is "
            "the query side only)"
        )
    qids = np.array([r[query_id] for r in qrows])
    qmat = _normalize(np.array([r[query_vec] for r in qrows], dtype=np.float64))
    cnorm = model.centroids / np.linalg.norm(model.centroids, axis=1, keepdims=True)
    sims = qmat @ cnorm.T  # (nq, n_centroids)
    order = np.argsort(-sims, axis=1, kind="stable")[:, : model.nprobe]
    # per-bucket scoring groups: for each probed centroid, the queries
    # probing it and their FLATTENED residual LUTs (m·ksub doubles per
    # (query, probe) — kilobytes), so a batch scores each bucket with
    # ONE vectorized gather across all its queries instead of a
    # per-(query, bucket) python loop
    by_cid: dict[int, tuple[np.ndarray, np.ndarray]] = {}
    groups: dict[int, list[tuple[int, np.ndarray]]] = {}
    for qi, qid in enumerate(qids):
        for cid in order[qi]:
            qres = qmat[qi] - model.centroids[int(cid)]
            lut = np.empty((m, ksub))
            for j in range(m):
                qs = qres[j * dsub : (j + 1) * dsub]
                lut[j] = ((qs[None, :] - model.codebooks[j]) ** 2).sum(axis=1)
            groups.setdefault(int(cid), []).append((int(qid), lut.ravel()))
    for cid, members in groups.items():
        by_cid[cid] = (
            np.array([q for q, _ in members]),
            np.stack([l for _, l in members]),  # (nq_c, m*ksub)
        )
    probed = sorted(by_cid)
    flat_off = (np.arange(m) * ksub)[None, :]  # codes -> flat LUT index

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            codes = np.stack(pdf["codes"].to_numpy()).astype(np.int64)
            cids = pdf["centroid_id"].to_numpy()
            ids = pdf["id"].to_numpy()
            for cid in np.unique(cids):
                grp = by_cid.get(int(cid))
                if grp is None:
                    continue
                g_qids, g_luts = grp
                mask = cids == cid
                idx = codes[mask] + flat_off  # (n_c, m) flat indices
                # (nq_c, n_c): one gather + sum per bucket, all queries
                d2 = g_luts[:, idx].sum(axis=2)
                n_c = int(mask.sum())
                yield pd.DataFrame(
                    {
                        "query_id": np.repeat(g_qids, n_c),
                        "id": np.tile(ids[mask], len(g_qids)),
                        "approx_cos": 1.0 - d2.ravel() / 2.0,
                    }
                )

    # static bucket prune first: unprobed buckets are never scanned
    cand = model.codes.filter(F.col("centroid_id").isin(probed))
    scored = cand.mapInPandas(score, schema="query_id long, id long, approx_cos double")
    w = Window.partitionBy("query_id").orderBy(F.desc("approx_cos"), F.asc("id"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select(
            F.col("query_id").alias(query_id),
            F.col("id").alias("vec_id"),
            F.round("approx_cos", 6).alias("approx_cos"),
            F.col("rk").cast("long").alias("rk"),
        )
    )


def ivfpq_topk_rerank(
    model: IvfPqModel,
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    shortlist: int = 50,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    query_id: str = "query_id",
    query_vec: str = "query_vec",
) -> DataFrame:
    """Exact re-rank of the ADC shortlist: the standard two-stage
    answer (compressed scan → exact cosine on ``shortlist`` floats per
    query).  Only the shortlist's float vectors are ever read."""
    from cdc_demo_spark.operators.similarity import cosine

    short = ivfpq_topk(model, queries, k=shortlist, query_id=query_id,
                       query_vec=query_vec)
    exact = (
        short.select(query_id, "vec_id")
        .join(corpus.select(F.col(id_col).alias("vec_id"), vec_col), "vec_id")
        .join(queries.select(query_id, query_vec), query_id)
        .select(
            query_id,
            "vec_id",
            cosine(F.col(query_vec), F.col(vec_col)).alias("cos_sim"),
        )
    )
    w = Window.partitionBy(query_id).orderBy(F.desc("cos_sim"), F.asc("vec_id"))
    return (
        exact.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select(
            query_id,
            "vec_id",
            F.round("cos_sim", 6).alias("cos_sim"),
            F.col("rk").cast("long").alias("rk"),
        )
    )
