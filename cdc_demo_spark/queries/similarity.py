"""Similarity-search query surface over the embeddings table (B52)."""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cdc_demo_spark.operators import similarity as S
from cdc_demo_spark.queries.registry import register
from cdc_demo_spark.sources.tables import load_table

QUERY_IDS = (0, 1, 2)

# The GEMM top-k path collects the QUERY vectors driver-side (one numpy
# matrix broadcast to every Arrow batch).  That is only sane while the
# query set is tiny relative to the corpus; above this cap the right
# tool is the distributed exact path (brute_force_topk) or IVF/PQ.
ARROW_QUERY_CAP = 10_000


def _queries_df(emb: DataFrame) -> DataFrame:
    return emb.filter(F.col("vec_id").isin(*QUERY_IDS)).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )


def collect_query_rows(queries: DataFrame, cap: int = ARROW_QUERY_CAP) -> list:
    """Driver-side (query_id, vector) list for the GEMM kernel, with a
    hard cap so the bounded collect stays bounded: one limit(cap+1)
    job, raising (instead of OOMing the driver at scale) when the
    query side exceeds ``cap``."""
    rows = queries.limit(cap + 1).collect()
    if len(rows) > cap:
        raise ValueError(
            f"query side exceeds the driver-collect cap ({cap}); use the "
            "distributed exact path (brute_force_topk) or IVF/PQ ANN instead"
        )
    return [(r[0], list(r[1])) for r in rows]


@register(
    "q_cosine_topk",
    oracle="""
WITH q AS (
  SELECT vec_id AS query_id, embedding AS query_vec
  FROM embeddings WHERE vec_id IN (0, 1, 2)
), scored AS (
  SELECT q.query_id, e.vec_id,
         list_sum(list_transform(list_zip(q.query_vec, e.embedding),
                                 p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))
         / nullif(
             sqrt(list_sum(list_transform(q.query_vec, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
           * sqrt(list_sum(list_transform(e.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))),
           0.0) AS cos_sim
  FROM embeddings e CROSS JOIN q
)
SELECT query_id, vec_id, round(cos_sim, 6) AS cos_sim, rk FROM (
  SELECT query_id, vec_id, cos_sim,
         row_number() OVER (PARTITION BY query_id ORDER BY cos_sim DESC, vec_id ASC) AS rk
  FROM scored
) t WHERE rk <= 10
""",
)
def q_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact brute-force cosine top-10 for 3 query vectors. The corpus
    never shuffles — queries broadcast, per-partition heaps via window.
    Both engines fold the arrays left-to-right in double, so scores are
    bit-identical (rounding is belt-and-braces)."""
    emb = load_table(spark, sf_dir, "embeddings")
    return S.brute_force_topk(emb, _queries_df(emb), k=10)


@register(
    "q_cosine_topk_arrow",
    oracle="""
WITH q AS (
  SELECT vec_id AS query_id, embedding AS query_vec
  FROM embeddings WHERE vec_id IN (0, 1, 2)
), scored AS (
  SELECT q.query_id, e.vec_id,
         list_sum(list_transform(list_zip(q.query_vec, e.embedding),
                                 p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))
         / nullif(
             sqrt(list_sum(list_transform(q.query_vec, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
           * sqrt(list_sum(list_transform(e.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))),
           0.0) AS cos_sim
  FROM embeddings e CROSS JOIN q
)
SELECT query_id, vec_id, round(cos_sim, 6) AS cos_sim, rk FROM (
  SELECT query_id, vec_id, cos_sim,
         row_number() OVER (PARTITION BY query_id ORDER BY cos_sim DESC, vec_id ASC) AS rk
  FROM scored
) t WHERE rk <= 10
""",
)
def q_cosine_topk_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The numpy-GEMM top-k (mapInPandas, one BLAS matmul per Arrow
    batch) — 6× the expression path at 100 queries, same exact results
    (same oracle; equality also pinned in tests). This is the 'Python
    as the FAST path' exception: a dense linear-algebra kernel the JVM
    expression engine can't match."""
    emb = load_table(spark, sf_dir, "embeddings")
    qrows = collect_query_rows(_queries_df(emb))
    return S.brute_force_topk_arrow(emb, qrows, k=10)


@register("q_ann_ivf_topk")  # no oracle: approximate by design (recall tested vs brute force)
def q_ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-bucketed approximate top-10 (16 centroids, nprobe=4) — the
    scale path: probes ~1/4 of the corpus per query."""
    emb = load_table(spark, sf_dir, "embeddings")
    return S.ivf_topk(emb, _queries_df(emb), k=10, n_centroids=16, nprobe=4)


@register("q_embedding_near_dups")  # no oracle: bucketed-approximate pair set
def q_embedding_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs at cosine >= 0.4 (~3.2σ for
    random 64-dim vectors — tens of pairs at sf0.01, so the query output
    is non-trivial; bucketed — recall vs exact pairing asserted in
    tests, exact-dup recall is 1.0 by construction)."""
    emb = load_table(spark, sf_dir, "embeddings")
    return S.pairwise_near_duplicates(emb, threshold=0.4)


@register(
    "q_embedding_quantize_int8",
    oracle="""
WITH e AS (
  SELECT vec_id, unnest(list_transform(embedding, x -> CAST(x AS DOUBLE))) AS x
  FROM embeddings
), m AS (
  SELECT vec_id, max(abs(x)) AS mx FROM e GROUP BY vec_id
)
SELECT e.vec_id,
       count(*) AS n_dims,
       round(127.0 / nullif(m.mx, 0), 6) AS scale,
       CAST(sum(CAST(round(x * (127.0 / nullif(m.mx, 0))) AS BIGINT)
                * CAST(round(x * (127.0 / nullif(m.mx, 0))) AS BIGINT)) AS BIGINT)
         AS q_sq_sum
FROM e JOIN m USING (vec_id)
GROUP BY e.vec_id, m.mx
""",
)
def q_embedding_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric int8 quantization of the embedding column (scale =
    127/max|x| per vector) — the storage/bandwidth play that shrinks a
    100 TB float32 embedding store 4x with ~0.3% cosine error. Output
    is integer-exact evidence (quantized square-sum) so the DuckDB
    oracle matches bit-for-bit; explode + two aggregates, no UDFs.
    The float->double cast happens BEFORE any math on both sides so
    engine float-promotion rules can't diverge."""
    emb = load_table(spark, sf_dir, "embeddings")
    e = emb.select("vec_id", F.explode("embedding").alias("xf")).select(
        "vec_id", F.col("xf").cast("double").alias("x")
    )
    m = e.groupBy("vec_id").agg(F.max(F.abs("x")).alias("mx"))
    s = F.lit(127.0) / F.nullif(F.col("mx"), F.lit(0.0))
    q = F.round(F.col("x") * s).cast("long")
    return (
        e.join(m, "vec_id")
        .groupBy("vec_id", "mx")
        .agg(
            F.count(F.lit(1)).alias("n_dims"),
            F.sum(q * q).alias("q_sq_sum"),
        )
        .select(
            "vec_id",
            "n_dims",
            F.round(F.lit(127.0) / F.nullif(F.col("mx"), F.lit(0.0)), 6).alias("scale"),
            "q_sq_sum",
        )
    )


@register(
    "q_semantic_dedup_int8",
    oracle="""
WITH RECURSIVE q AS (
  SELECT vec_id,
         list_transform(embedding, x -> CAST(round(
           CAST(x AS DOUBLE) * (127.0 / nullif(
             list_aggregate(list_transform(embedding,
                            y -> abs(CAST(y AS DOUBLE))), 'max'), 0.0))
         ) AS BIGINT)) AS qv
  FROM embeddings
), p AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         CAST(list_sum(list_transform(list_zip(a.qv, b.qv),
                                      z -> z[1] * z[2])) AS BIGINT) AS dot,
         CAST(list_sum(list_transform(a.qv, x -> x * x)) AS BIGINT) AS na,
         CAST(list_sum(list_transform(b.qv, x -> x * x)) AS BIGINT) AS nb
  FROM q a JOIN q b ON a.vec_id < b.vec_id
), pe AS (
  SELECT id_a, id_b FROM p
  WHERE dot >= 0 AND 25 * dot * dot >= 4 * na * nb
), edges AS (
  SELECT id_a AS u, id_b AS v FROM pe
  UNION
  SELECT id_b AS u, id_a AS v FROM pe
), reach(s, d) AS (
  SELECT vec_id, vec_id FROM embeddings
  UNION
  SELECT r.s, e.v FROM reach r JOIN edges e ON r.d = e.u
), comp AS (
  SELECT s AS vec_id, min(d) AS cluster_id FROM reach GROUP BY s
), sz AS (
  SELECT cluster_id, CAST(count(*) AS BIGINT) AS n_members
  FROM comp GROUP BY cluster_id
)
SELECT c.vec_id, c.cluster_id, sz.n_members, c.vec_id = c.cluster_id AS keep
FROM comp c JOIN sz USING (cluster_id)
WHERE sz.n_members >= 2
""",
)
def q_semantic_dedup_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semantic dedup over the embedding column, VALUE-EXACT end to
    end (operators/similarity.semantic_dedup): int8-quantize each
    vector (the committed storage rounding), decide cosine >= 2/5 in
    pure int64 cross-multiplied arithmetic — no float compare to
    drift between engines — then close the pair graph with
    star-contraction CC and keep the min-id survivor per cluster.
    The oracle replays quantization, integer threshold, and a
    recursive-CTE transitive closure in DuckDB; this upgrades
    embedding near-dedup from rows-only (q_embedding_near_dups, LSH
    recall) to the hard driver signal.

    Pair source: the DISTRIBUTED integer-GEMM block tiling of the
    exact quadratic scan (int8_cosine_pairs_gemm) — the identical
    pair set to the HOF expression path (pytest-asserted), ~100×
    faster because the O(n²·d) compare runs as numpy int64 matmuls
    instead of per-element interpreted HOF folds, and with no
    corpus-size ceiling: tiles are packed and joined executor-side,
    nothing is collected to the driver."""
    emb = load_table(spark, sf_dir, "embeddings")
    return S.semantic_dedup(emb, t_num=2, t_den=5)  # default source = GEMM


@register("q_semantic_dedup_ann")  # no oracle: pair recall depends on IVF bucketing
def q_semantic_dedup_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q_semantic_dedup_int8's scale path (VERDICT r4 #5): the SAME
    integer-exact int8 threshold verifier, but candidates come from
    multi-probe IVF bucketing (operators/similarity.semantic_dedup_ann)
    instead of the quadratic crossJoin — ~probes²/n_buckets of the
    pair count reaches the verifier.  Rows-only by design: the verified
    pair set is provably a SUBSET of the exact one (identical filter),
    so only recall can differ, and tests/test_similarity.py gates
    recall >= 0.8 against the exact pair graph at test grain."""
    emb = load_table(spark, sf_dir, "embeddings")
    return S.semantic_dedup_ann(emb, t_num=2, t_den=5).orderBy("vec_id")


@register("q_incremental_semantic")  # no oracle: stateful multi-batch op
def q_incremental_semantic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental semantic dedup: freeze IVF centroids, admit the
    first 60% of embeddings, then probe+admit the rest as a delta —
    the crawl-refresh shape (operators/incremental_semantic.py).
    Returns the union of both batches' verified pairs, which pytest
    proves EXACTLY equals the one-shot run under the same centroids
    (integer-exact verifier, deterministic membership —
    tests/test_incremental_semantic.py)."""
    import shutil
    import tempfile

    from cdc_demo_spark.operators.incremental_semantic import SemanticIndex

    emb = load_table(spark, sf_dir, "embeddings")
    tmp = tempfile.mkdtemp(prefix="sem_index_")
    try:
        idx = SemanticIndex(spark, os.path.join(tmp, "idx"), n_buckets=8)
        p1 = idx.build(emb.filter(F.col("vec_id") % 5 < 3))
        p2 = idx.append_batch(emb.filter(F.col("vec_id") % 5 >= 3))
        return p1.unionByName(p2).orderBy("id_a", "id_b")
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


@register("q_pq_topk")  # no oracle: ADC scores are float sums of trained codebooks
def q_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ANN with exact re-rank (operators/pq.py):
    train deterministic codebooks (m=16 subspaces × 64 centroids),
    encode the corpus to 16-byte codes, ADC-score a 50-deep shortlist
    from codes alone, then exact-cosine re-rank only the shortlist.
    Final top-10 recall vs brute force is pytest-asserted >= 0.9
    (tests/test_pq.py); measured 0.97-1.0 on this corpus."""
    from cdc_demo_spark.operators import pq as PQ

    emb = load_table(spark, sf_dir, "embeddings")
    books = PQ.train_codebooks(emb, m=16, ksub=64, sample=500)
    codes = PQ.encode(emb, books)
    return PQ.pq_topk_rerank(
        codes, emb, _queries_df(emb), books, k=10, shortlist=50
    )


@register(
    "q_embedding_covariance",
    oracle="""
WITH e AS (
  SELECT embedding AS v FROM embeddings
), nn AS (
  SELECT CAST(count(*) AS DOUBLE) AS n FROM e
), pairs AS (
  SELECT ii.i AS i, jj.j AS j,
         sum(CAST(v[ii.i] AS DOUBLE) * CAST(v[jj.j] AS DOUBLE)) AS sxy
  FROM e, UNNEST(range(1, 65)) AS ii(i), UNNEST(range(1, 65)) AS jj(j)
  WHERE jj.j >= ii.i
  GROUP BY 1, 2
), means AS (
  SELECT ii.i AS i, sum(CAST(v[ii.i] AS DOUBLE)) AS sx
  FROM e, UNNEST(range(1, 65)) AS ii(i)
  GROUP BY 1
)
SELECT CAST(p.i - 1 AS BIGINT) AS i, CAST(p.j - 1 AS BIGINT) AS j,
       ROUND(p.sxy / nn.n - (mi.sx / nn.n) * (mj.sx / nn.n), 6) + 0.0 AS cov
FROM pairs p
JOIN means mi ON mi.i = p.i
JOIN means mj ON mj.i = p.j
CROSS JOIN nn
""",
)
def q_embedding_covariance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The distributed half of PCA (operators/pca.py — the OPQ-style
    preprocessing step of a vector-search pipeline): the embedding
    covariance matrix, computed as ONE Arrow-batched pass emitting
    per-batch partial Grams (numpy X.T @ X) that the driver sums —
    at any corpus size the shuffled/collected object is d², never n.
    Output is the upper triangle (2080 entries at d=64), round-6;
    the oracle recomputes it in DuckDB as an unnest-pair aggregate.
    The non-SQL half (eigensolve + projection) is pinned by
    tests/test_pca.py invariants instead."""
    import numpy as np

    from cdc_demo_spark.operators.pca import covariance

    emb = load_table(spark, sf_dir, "embeddings")
    cov = covariance(emb, "embedding")
    d = cov.shape[0]
    rows = [
        (i, j, float(cov[i, j])) for i in range(d) for j in range(i, d)
    ]
    # + 0.0 on BOTH sides: IEEE says -0.0 + 0.0 = +0.0, so entries
    # that round to zero from below can't hash-mismatch on zero sign
    return spark.createDataFrame(rows, "i bigint, j bigint, cov double").select(
        "i", "j", (F.round("cov", 6) + F.lit(0.0)).alias("cov")
    )


@register("q_ivfpq_topk")  # no oracle: k-means layout + ADC float sums
def q_ivfpq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ with exact re-rank (operators/ivfpq.py — the faiss
    IndexIVFPQ shape, the layout billion-vector deployments run): IVF
    prunes to nprobe/n_centroids of the corpus, residual-encoded PQ
    codes ADC-score the probed buckets without touching floats, and
    the exact re-rank reads only the 50-vector shortlist.  Rows-only
    by design like q_pq_topk/q_ann_ivf_topk; recall gates (raw,
    reranked, and the IVF-admission-bound recovery) live in
    tests/test_ivfpq.py, and the rerank makes self-queries exact."""
    from cdc_demo_spark.operators.ivfpq import build_ivfpq, ivfpq_topk_rerank

    emb = load_table(spark, sf_dir, "embeddings")
    model = build_ivfpq(emb, n_centroids=16, nprobe=4, m=8, ksub=16)
    return ivfpq_topk_rerank(model, emb, _queries_df(emb), k=10, shortlist=50)


@register(
    "q_semantic_decontamination",
    oracle="""
WITH ev AS (
  SELECT vec_id AS eval_id, embedding AS ev
  FROM embeddings WHERE vec_id % 50 = 0
), scored AS (
  SELECT p.vec_id, ev.eval_id,
         list_sum(list_transform(list_zip(p.embedding, ev.ev),
                                 pr -> CAST(pr[1] AS DOUBLE) * CAST(pr[2] AS DOUBLE)))
         / nullif(
             sqrt(list_sum(list_transform(p.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
           * sqrt(list_sum(list_transform(ev.ev, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))),
           0.0) AS cos_sim
  FROM embeddings p CROSS JOIN ev
  WHERE p.vec_id % 50 <> 0
), best AS (
  SELECT vec_id, cos_sim, eval_id,
         row_number() OVER (PARTITION BY vec_id
                            ORDER BY cos_sim DESC, eval_id ASC) AS rk
  FROM scored
)
SELECT vec_id,
       round(cos_sim, 6) AS max_eval_sim,
       eval_id AS nearest_eval_id,
       cos_sim >= 0.35 AS contaminated
FROM best WHERE rk = 1
""",
)
def q_semantic_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EMBEDDING-level eval decontamination (operators/similarity.
    semantic_decontaminate): every 50th vector stands in for a held-out
    eval benchmark, and every pool document reports its maximum cosine
    against ANY eval member, the argmax eval id, and a contaminated
    flag at 0.35 — the semantic complement of the exact-shingle
    (q_benchmark_contamination) and Bloom (q_bloom_decontamination)
    decontaminators: paraphrased eval leakage that shares no 3-gram
    still lands next to its source in embedding space.  Eval set
    broadcast, pool scanned once, |pool|x|eval| expansion collapsed by
    a map-side partial max — one row per pool doc crosses the wire.
    Both engines fold the arrays left-to-right in double, so the max,
    the argmax, and the threshold flag are bit-identical (the tie
    breaks toward the smaller eval id via a packed struct max)."""
    emb = load_table(spark, sf_dir, "embeddings")
    evalset = emb.filter(F.col("vec_id") % 50 == 0).select(
        F.col("vec_id").alias("eval_id"), F.col("embedding").alias("eval_vec")
    )
    pool = emb.filter(F.col("vec_id") % 50 != 0)
    return S.semantic_decontaminate(pool, evalset, 0.35).select(
        "vec_id",
        F.round("max_eval_sim", 6).alias("max_eval_sim"),
        "nearest_eval_id",
        "contaminated",
    )
