"""Product quantization (PQ) for vector search — the compression side
of approximate nearest neighbor, complementing IVF's pruning side
(similarity.py).  Jégou et al., "Product Quantization for Nearest
Neighbor Search", TPAMI 2011.

The idea: split each L2-normalized vector into M subvectors, k-means
each subspace independently (K centroids), and store a vector as M
small codes (here M=8 × K=16 → 8 half-byte codes for a 64-dim float
vector: 64× smaller than float32).  A query is answered with
*asymmetric distance computation* (ADC): per query, precompute an
(M × K) lookup table of subspace distances, then a corpus vector's
approximate distance is M table lookups summed — no float vector is
ever touched at query time.

Engine mapping and the 100 TB shape:
- **Training is a driver-side numpy Lloyd on a deterministic sample**
  (md5-ordered, so the codebook is reproducible run-to-run).  At any
  corpus scale codebooks train on a sample by design — this is not a
  local-mode shortcut; the sample fits in one machine's memory and the
  codebooks (M·K·dsub floats) are kilobytes.
- **Encoding is one Arrow-batched pass** (mapInPandas, numpy argmin
  per subspace) over the corpus — embarrassingly parallel, happens
  once at ingest, and the stored codes are what a 100 TB deployment
  keeps hot while float vectors go cold.
- **Search streams codes, never vectors**: queries' ADC tables are a
  broadcast python object (Q·M·K floats); each partition scores its
  codes with numpy gathers and the per-query top-k is the usual
  window/heap.  Shuffle carries only (query, id, score) survivors.

Scores are float sums in partition order → rows-only at the driver
gate; recall vs brute force is the pytest-asserted contract
(tests/test_pq.py), exactly like IVF.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# Same bound as queries/similarity.ARROW_QUERY_CAP (kept separate to
# preserve layering — operators never import from queries): the ADC
# lookup tables are built from a driver-side collect of the query
# batch, so that collect must be provably bounded.
PQ_QUERY_CAP = 10_000


def _normalize(mat: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    norms[norms == 0.0] = 1.0
    return mat / norms


def train_codebooks(
    corpus: DataFrame,
    m: int = 8,
    ksub: int = 16,
    iters: int = 10,
    sample: int = 512,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    normalize: bool = True,
) -> np.ndarray:
    """(m, ksub, d/m) float64 codebooks from a deterministic
    md5-ordered sample; init = first ksub sample rows per subspace
    (deterministic), then Lloyd with empty-cluster re-seeding.
    ``normalize=False`` trains on the raw vectors — the residual-PQ
    path (operators/ivfpq.py), where inputs are x − centroid and
    renormalizing would destroy the residual geometry."""
    rows = (
        corpus.select(id_col, vec_col)
        .orderBy(F.md5(F.col(id_col).cast("string")))
        .limit(sample)
        .collect()
    )
    x = np.array([r[vec_col] for r in rows], dtype=np.float64)
    if normalize:
        x = _normalize(x)
    if len(x) < ksub:
        raise ValueError(
            f"PQ training needs >= ksub={ksub} sample vectors, got {len(x)} "
            f"(corpus too small or sample= too low)"
        )
    d = x.shape[1]
    if d % m:
        raise ValueError(f"dim {d} not divisible by m={m}")
    dsub = d // m
    books = np.empty((m, ksub, dsub))
    for j in range(m):
        xs = x[:, j * dsub : (j + 1) * dsub]
        cents = xs[:ksub].copy()
        for _ in range(iters):
            d2 = ((xs[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
            assign = d2.argmin(axis=1)
            # Empty clusters re-seed on DISTINCT farthest points (rank
            # order), not all on the same argmax — identical re-seeds
            # would collapse back into duplicate centroids next round.
            far_order = np.argsort(-d2.min(axis=1))
            n_reseeded = 0
            for c in range(ksub):
                member = xs[assign == c]
                if len(member):
                    cents[c] = member.mean(axis=0)
                else:
                    cents[c] = xs[far_order[n_reseeded % len(far_order)]]
                    n_reseeded += 1
        books[j] = cents
    return books


def encode(
    corpus: DataFrame,
    codebooks: np.ndarray,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    normalize: bool = True,
) -> DataFrame:
    """(id, codes array<int>) — one Arrow pass, numpy argmin per
    subspace; ``normalize=False`` encodes raw vectors (residual PQ)."""
    m, ksub, dsub = codebooks.shape
    books = codebooks  # captured in the closure, shipped once per task

    def part(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            # np.stack over Arrow-native ndarray rows; .tolist() would build
            # per-element Python objects (measured cost at 1M-vector grain)
            x = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            if normalize:
                x = _normalize(x)
            codes = np.empty((len(x), m), dtype=np.int32)
            for j in range(m):
                xs = x[:, j * dsub : (j + 1) * dsub]
                d2 = ((xs[:, None, :] - books[j][None, :, :]) ** 2).sum(axis=2)
                codes[:, j] = d2.argmin(axis=1)
            yield pd.DataFrame({"id": pdf[id_col], "codes": list(codes)})

    out = corpus.select(id_col, vec_col).mapInPandas(
        part, schema=f"id long, codes array<int>"
    )
    return out.withColumnRenamed("id", id_col)


def pq_topk(
    codes_df: DataFrame,
    queries: DataFrame,
    codebooks: np.ndarray,
    k: int = 10,
    id_col: str = "vec_id",
    query_id: str = "query_id",
    query_vec: str = "query_vec",
    query_cap: int = PQ_QUERY_CAP,
) -> DataFrame:
    """Approximate top-k by ADC: per-query (m × ksub) distance tables
    built once on the driver (queries are few and broadcast), corpus
    codes scored with numpy gathers, top-k per query via window.
    Returns (query_id, vec_id, approx_cos, rk) — approx_cos = 1 - d²/2
    on normalized vectors, comparable to the exact cosine paths.

    The query side is collected to the driver to build the ADC lookup
    tables, so it carries the same hard cap as the GEMM query pull
    (queries/similarity.py ARROW_QUERY_CAP): one limit(cap+1) job,
    raising loudly instead of OOMing the driver when the query batch
    exceeds ``query_cap``."""
    m, ksub, dsub = codebooks.shape
    qrows = queries.select(query_id, query_vec).limit(query_cap + 1).collect()
    if len(qrows) > query_cap:
        raise ValueError(
            f"PQ query side exceeds the driver-collect cap ({query_cap}); "
            "run queries in chunks, or use the distributed exact path "
            "(brute_force_topk) / IVF ANN for large query batches"
        )
    qids = np.array([r[query_id] for r in qrows])
    qmat = _normalize(np.array([r[query_vec] for r in qrows], dtype=np.float64))
    # luts[q, j, c] = || q_sub_j - codebook[j, c] ||^2
    luts = np.empty((len(qids), m, ksub))
    for j in range(m):
        qs = qmat[:, j * dsub : (j + 1) * dsub]
        luts[:, j, :] = ((qs[:, None, :] - codebooks[j][None, :, :]) ** 2).sum(axis=2)

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            codes = np.stack(pdf["codes"].to_numpy()).astype(np.int64)  # (n, m)
            n = len(codes)
            for qi, qid in enumerate(qids):
                # gather: d2[i] = sum_j luts[qi, j, codes[i, j]]
                d2 = luts[qi, np.arange(m)[None, :], codes].sum(axis=1)
                yield pd.DataFrame(
                    {
                        "query_id": np.full(n, qid),
                        "id": pdf["id"].to_numpy(),
                        "approx_cos": 1.0 - d2 / 2.0,
                    }
                )

    scored = codes_df.select(
        F.col(id_col).alias("id"), "codes"
    ).mapInPandas(score, schema="query_id long, id long, approx_cos double")
    w = Window.partitionBy("query_id").orderBy(F.desc("approx_cos"), F.asc("id"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select(
            F.col("query_id").alias(query_id),
            F.col("id").alias(id_col),
            F.round("approx_cos", 6).alias("approx_cos"),
            F.col("rk").cast("long").alias("rk"),
        )
    )


def pq_topk_rerank(
    codes_df: DataFrame,
    corpus: DataFrame,
    queries: DataFrame,
    codebooks: np.ndarray,
    k: int = 10,
    shortlist: int = 50,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id: str = "query_id",
    query_vec: str = "query_vec",
) -> DataFrame:
    """The production PQ pattern: ADC builds a cheap per-query
    SHORTLIST from codes alone, then only the shortlist's float
    vectors are fetched and re-ranked with exact cosine.  Final
    quality = shortlist recall (measured 0.97-1.0 at shortlist=50 on
    random 64-dim data where raw ADC top-10 recall is ~0.7), while the
    expensive exact math touches shortlist·|Q| vectors instead of
    |corpus|·|Q|.  At 100 TB the code table is ~1/16 the corpus bytes
    and stays hot; the vector fetch is a semi-join on the shortlist
    ids — the only time float vectors move."""
    from cdc_demo_spark.functions.vector import cosine

    short = pq_topk(
        codes_df, queries, codebooks, k=shortlist, id_col=id_col,
        query_id=query_id, query_vec=query_vec,
    ).select(query_id, id_col)
    cand = (
        short.join(corpus.select(id_col, vec_col), id_col)
        .join(F.broadcast(queries), query_id)
        .select(
            query_id,
            id_col,
            cosine(F.col(query_vec), F.col(vec_col)).alias("cos_sim"),
        )
    )
    w = Window.partitionBy(query_id).orderBy(F.desc("cos_sim"), F.asc(id_col))
    return (
        cand.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select(
            query_id, id_col,
            F.round("cos_sim", 6).alias("cos_sim"),
            F.col("rk").cast("long").alias("rk"),
        )
    )
