"""Similarity search over embedding columns (SURVEY.md §2 B52).

Two tiers, per the blueprint:
- ``brute_force_topk`` — exact cosine top-k. The query set is broadcast
  (it is small by definition); the corpus is scanned once, partition-
  local top-k heaps via window row_number ≤ k. Correct and oracle-
  checkable; O(|corpus|·|queries|) compute but ZERO shuffle of the
  corpus — only (query_id, corpus_id, score) survivors move.
- ``ivf_topk`` — IVF-style approximate path for scale: k-means-ish
  centroids chosen deterministically, corpus bucketed by nearest
  centroid once (a write-time layout at 100 TB), queries probe only the
  ``nprobe`` nearest buckets. Recall asserted vs brute force in tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from cdc_demo_spark.functions.vector import cosine


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
    query_id: str = "query_id",
    query_vec: str = "query_vec",
) -> DataFrame:
    """Exact top-k cosine neighbors per query vector.

    Deterministic ranking: (cosine DESC, corpus id ASC) — ties cannot
    reorder the selected set."""
    joined = corpus.crossJoin(F.broadcast(queries)).select(
        F.col(query_id),
        F.col(corpus_id),
        cosine(F.col(query_vec), F.col(corpus_vec)).alias("cos_sim"),
    )
    w = Window.partitionBy(query_id).orderBy(F.desc("cos_sim"), F.asc(corpus_id))
    return (
        joined.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select(query_id, corpus_id, F.round("cos_sim", 6).alias("cos_sim"), F.col("rk").cast("long").alias("rk"))
    )


def brute_force_topk_arrow(
    corpus: DataFrame,
    queries_rows: list[tuple[int, list[float]]],
    k: int = 10,
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
) -> DataFrame:
    """Exact top-k via mapInPandas + numpy matmul — the throughput path.

    The JVM-expression cosine (brute_force_topk) evaluates element-wise
    per row; this variant does ONE (batch × dim) @ (dim × nq) GEMM per
    Arrow batch — at high query counts the BLAS call wins by an order
    of magnitude. Query vectors ride into the closure (broadcast by
    task serialization — they are small by definition); each batch
    emits only its local top-k, so the shuffle carries
    O(partitions · nq · k) candidate rows, then one tiny global window
    finishes. Returns the same (query_id, id, cos_sim, rk) shape as
    brute_force_topk, tested equal."""
    import numpy as np
    import pandas as pd

    qids = np.array([q[0] for q in queries_rows])
    Q = np.stack([np.asarray(q[1], dtype=np.float64) for q in queries_rows])
    Qn = Q / np.linalg.norm(Q, axis=1, keepdims=True)

    def score(batches):
        for b in batches:
            if not len(b):
                continue
            M = np.stack(b[corpus_vec].map(lambda v: np.asarray(v, dtype=np.float64)))
            norms = np.linalg.norm(M, axis=1, keepdims=True)
            norms[norms == 0] = np.inf
            sims = (M / norms) @ Qn.T  # (batch, nq)
            ids = b[corpus_id].to_numpy()
            top = min(k, len(ids))
            for j, qid in enumerate(qids):
                part = np.argpartition(-sims[:, j], top - 1)[:top]
                yield pd.DataFrame(
                    {"query_id": qid, corpus_id: ids[part], "cos_sim": sims[part, j]}
                )

    local = corpus.mapInPandas(
        score, schema=f"query_id long, {corpus_id} long, cos_sim double"
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc(corpus_id))
    return (
        local.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("query_id", corpus_id, F.round("cos_sim", 6).alias("cos_sim"), F.col("rk").cast("long").alias("rk"))
    )


def choose_centroids(corpus: DataFrame, n_centroids: int, vec_col: str = "embedding", id_col: str = "vec_id") -> DataFrame:
    """Deterministic centroid seed: the first vector of each of
    ``n_centroids`` equal id-order tiles, i.e. seeds spread evenly
    through the corpus rather than the n lowest ids (adjacent-id rows
    often correlate; spread seeds start Lloyd's from a wider net —
    worth ~5 recall points before refinement even touches them).
    The global sort is seed-time-only; at 100 TB use the implemented
    scale twin ``ann_scale.sampled_kmeans_centroids`` (hash-prefix
    prefilter + bounded md5-ordered sample — training cost independent
    of corpus size).  This exact-ntile seed is the small/medium-corpus
    reference those sampled seeds are judged against, and is why
    q_ann_ivf_topk / q_embedding_near_dups sit on the audit lint's
    allowlist (tools/audit_plans.py)."""
    w = Window.orderBy(id_col)
    return (
        corpus.select(id_col, vec_col, F.ntile(n_centroids).over(w).alias("tile"))
        .groupBy("tile")
        .agg(F.min_by(vec_col, F.col(id_col)).alias("centroid_vec"))
        .select((F.col("tile") - 1).cast("long").alias("centroid_id"), "centroid_vec")
    )


def refine_centroids(
    corpus: DataFrame,
    centroids: DataFrame,
    iterations: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Lloyd's k-means refinement, fully distributed: assign → per-bucket
    elementwise mean (posexplode + groupBy + array reassembly) → repeat.

    Each iteration is two shuffles (assignment is broadcast-join + local
    argmax, means shuffle (centroid, dim) partial sums). At 100 TB you
    run this once at ingest on a sample, then freeze the centroids as
    the table's bucketing function."""
    for _ in range(iterations):
        assigned = assign_buckets(corpus, centroids, vec_col, id_col)
        means = (
            assigned.select("centroid_id", F.posexplode(vec_col).alias("pos", "x"))
            .groupBy("centroid_id", "pos")
            .agg(F.avg("x").alias("m"))
            .groupBy("centroid_id")
            .agg(
                F.array_sort(
                    F.collect_list(F.struct("pos", "m"))
                ).alias("pm")
            )
            .select(
                "centroid_id",
                F.transform("pm", lambda s: s["m"].cast("float")).alias("centroid_vec"),
            )
        )
        centroids = means
    return centroids


def assign_buckets(
    corpus: DataFrame, centroids: DataFrame, vec_col: str = "embedding", id_col: str = "vec_id"
) -> DataFrame:
    """Tag each corpus vector with its nearest centroid (max cosine).
    At 100 TB this runs once at ingest and becomes the table's physical
    partitioning — queries then prune whole partitions."""
    return assign_multiprobe(corpus, centroids, 1, id_col, vec_col)


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_centroids: int = 16,
    nprobe: int = 4,
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
    query_id: str = "query_id",
    query_vec: str = "query_vec",
    refine_iters: int = 2,
) -> DataFrame:
    """Approximate top-k: probe only the `nprobe` nearest buckets.

    Compute drops from |corpus|·|queries| to ~(nprobe/n_centroids) of
    that; recall vs brute force is the tested trade-off. Seeds are
    Lloyd-refined (`refine_iters` k-means passes) before bucketing —
    unrefined lowest-id seeds cost ~15 recall points on random data
    (measured in tests/test_similarity.py). At 100 TB the refinement
    runs once at ingest (on a sample) and the centroids freeze as the
    table's bucketing function; queries never pay it again."""
    centroids = choose_centroids(corpus, n_centroids, corpus_vec, corpus_id)
    if refine_iters > 0:
        centroids = refine_centroids(
            corpus, centroids, iterations=refine_iters, vec_col=corpus_vec, id_col=corpus_id
        )
    bucketed = assign_buckets(corpus, centroids, corpus_vec, corpus_id)

    q_scored = queries.crossJoin(F.broadcast(centroids)).select(
        query_id, query_vec, "centroid_id",
        cosine(F.col(query_vec), F.col("centroid_vec")).alias("c_sim"),
    )
    wq = Window.partitionBy(query_id).orderBy(F.desc("c_sim"), F.asc("centroid_id"))
    probes = (
        q_scored.withColumn("rn", F.row_number().over(wq))
        .filter(F.col("rn") <= nprobe)
        .select(query_id, query_vec, "centroid_id")
    )

    cand = bucketed.join(F.broadcast(probes), "centroid_id").select(
        query_id,
        corpus_id,
        cosine(F.col(query_vec), F.col(corpus_vec)).alias("cos_sim"),
    )
    w = Window.partitionBy(query_id).orderBy(F.desc("cos_sim"), F.asc(corpus_id))
    return (
        cand.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select(query_id, corpus_id, F.round("cos_sim", 6).alias("cos_sim"), F.col("rk").cast("long").alias("rk"))
    )


def assign_multiprobe(
    corpus: DataFrame,
    centroids: DataFrame,
    probes: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, vec, centroid_id): each vector assigned to its `probes`
    nearest GIVEN centroids (deterministic tiebreak: centroid_id asc).
    THE single multi-probe assignment — pairwise_near_duplicates,
    centroid_candidate_pairs, and the incremental SemanticIndex all
    route through here, because the incremental == one-shot equality
    invariant depends on their assignments staying bit-identical."""
    scored = corpus.crossJoin(F.broadcast(centroids)).select(
        id_col, vec_col, "centroid_id",
        cosine(F.col(vec_col), F.col("centroid_vec")).alias("c_sim"),
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("c_sim"), F.asc("centroid_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= probes)
        .select(id_col, vec_col, "centroid_id")
    )


def _multiprobe_membership(
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    n_buckets: int,
    probes: int,
    refine_iters: int,
) -> DataFrame:
    """assign_multiprobe after training centroids from the corpus —
    the one-shot entry point (the incremental index supplies frozen
    centroids instead)."""
    centroids = choose_centroids(corpus, n_buckets, vec_col, id_col)
    if refine_iters > 0:
        centroids = refine_centroids(
            corpus, centroids, iterations=refine_iters, vec_col=vec_col, id_col=id_col
        )
    return assign_multiprobe(corpus, centroids, probes, id_col, vec_col)


def centroid_candidate_pairs(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_buckets: int = 16,
    probes: int = 2,
    refine_iters: int = 2,
) -> DataFrame:
    """(id_a, id_b) candidate pairs from multi-probe IVF bucketing: a
    pair is a candidate iff the two vectors' probe sets intersect.
    ~probes²/n_buckets of the quadratic pair count, no verification —
    feed the output to an exact verifier (int8_cosine_pairs' filter via
    semantic_dedup_ann, or a float re-score)."""
    member = _multiprobe_membership(
        corpus, id_col, vec_col, n_buckets, probes, refine_iters
    )
    a = member.select(F.col(id_col).alias("id_a"), F.col("centroid_id"))
    b = member.select(F.col(id_col).alias("id_b"), F.col("centroid_id"))
    return (
        a.join(b, "centroid_id")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .dropDuplicates(["id_a", "id_b"])
    )


def pairwise_near_duplicates(
    corpus: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_buckets: int = 16,
    probes: int = 2,
    refine_iters: int = 2,
) -> DataFrame:
    """Embedding-cosine near-dup pairs (B51's vector variant), bucketed
    with MULTI-PROBE assignment: each vector joins its `probes` nearest
    centroid buckets, and a pair is compared if the two membership sets
    intersect. probes=2 roughly doubles recall over single-assignment
    on unclustered data for 2× membership rows (compute still
    ~probes²/n_buckets of the full O(n²)); exact pairs (cosine≈1) are
    always found — identical vectors share all probes. No false
    positives ever: candidates are re-scored exactly. Centroids are
    Lloyd-refined before bucketing (same rationale as ivf_topk)."""
    member = _multiprobe_membership(
        corpus, id_col, vec_col, n_buckets, probes, refine_iters
    )
    a, b = member.alias("a"), member.alias("b")
    return (
        a.join(
            b,
            (F.col("a.centroid_id") == F.col("b.centroid_id"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b"),
                F.col(f"a.{vec_col}").alias("_va"), F.col(f"b.{vec_col}").alias("_vb"))
        .dropDuplicates(["id_a", "id_b"])
        .withColumn("cos_sim", cosine(F.col("_va"), F.col("_vb")))
        .filter(F.col("cos_sim") >= threshold)
        .select("id_a", "id_b", F.round("cos_sim", 6).alias("cos_sim"))
    )


# --------------------------------------------------------------------------
# Semantic dedup (SemDeDup-shaped, integer-exact)
# --------------------------------------------------------------------------


def int8_quantized(
    corpus: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """(id, qv) with qv = symmetric int8 quantization of the embedding
    (scale = 127/max|x| per vector, exactly the q_embedding_quantize_int8
    construction: cast-to-double BEFORE any math, then round, so the
    quantized integers are engine-portable). A zero vector quantizes to
    NULLs and drops out of every downstream integer comparison."""
    x = F.transform(F.col(vec_col), lambda v: v.cast("double"))
    mx = F.array_max(F.transform(x, F.abs))
    s = F.lit(127.0) / F.nullif(mx, F.lit(0.0))
    qv = F.transform(x, lambda v: F.round(v * s).cast("long"))
    return corpus.select(F.col(id_col).alias("id"), qv.alias("qv"))


def int8_cosine_pairs(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    t_num: int = 2,
    t_den: int = 5,
) -> DataFrame:
    """(id_a, id_b) for every pair whose INT8-QUANTIZED cosine is
    >= t_num/t_den (a positive rational) — decided in pure integer
    arithmetic, so the pair set is bit-reproducible across engines:

        cos(qa, qb) >= t  <=>  dot >= 0  AND  t_den² · dot² >= t_num² · |qa|²·|qb|²

    (both sides exact int64: 64 dims × 127² keeps every term < 2^50).
    Float cosine enters only once, at quantization — the same rounding
    the int8 storage path already commits to.

    Scale: this is the EXACT quadratic baseline (the honest cost of
    all-pairs over dense vectors — prefix filters prune nothing when
    every dimension is nonzero); at corpus scale you tile it as GEMM
    or swap in an ANN candidate generator and keep this as the
    verifier — int8_cosine_pairs_ann below does exactly that with
    multi-probe IVF bucketing, and semantic_dedup_ann plumbs it
    through the clustering unchanged."""
    q = int8_quantized(corpus, id_col, vec_col)
    a = q.select(F.col("id").alias("id_a"), F.col("qv").alias("qa"))
    b = q.select(F.col("id").alias("id_b"), F.col("qv").alias("qb"))
    cand = a.crossJoin(b).filter(F.col("id_a") < F.col("id_b"))
    return _int8_threshold_filter(cand, t_num, t_den)


def _int8_threshold_filter(cand: DataFrame, t_num: int, t_den: int) -> DataFrame:
    """(id_a, id_b) rows of ``cand`` (which carries qa/qb int64 arrays)
    whose int8-quantized cosine >= t_num/t_den — the shared
    integer-exact verifier behind both the quadratic pair source and
    the ANN candidate path (identical filter => ANN results are always
    a subset of the exact pair set; recall is the only degree of
    freedom)."""
    zero = F.lit(0).cast("long")
    add = lambda acc, v: acc + v  # noqa: E731
    dot = F.aggregate(F.zip_with("qa", "qb", lambda x, y: x * y), zero, add)
    na = F.aggregate(F.transform("qa", lambda x: x * x), zero, add)
    nb = F.aggregate(F.transform("qb", lambda x: x * x), zero, add)
    return (
        cand.select("id_a", "id_b", dot.alias("dot"), na.alias("na"), nb.alias("nb"))
        .filter(
            (F.col("dot") >= 0)
            & (
                F.lit(t_den * t_den) * F.col("dot") * F.col("dot")
                >= F.lit(t_num * t_num) * F.col("na") * F.col("nb")
            )
        )
        .select("id_a", "id_b")
    )


def int8_cosine_pairs_gemm(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    t_num: int = 2,
    t_den: int = 5,
    tile_rows: int = 8192,
) -> DataFrame:
    """int8_cosine_pairs tiled as DISTRIBUTED integer GEMM — identical
    pair set (pure int64 arithmetic on both paths, asserted equal in
    tests/test_similarity.py), ~100× faster than the HOF path (which
    evaluates ``aggregate(zip_with(...))`` interpreted per element per
    PAIR — O(n²·d) interpreter steps) and with NO corpus-size ceiling:
    nothing is ever collected to the driver.

    Shape: hash-tile the quantized corpus into ``L = ceil(n/tile_rows)``
    blocks, pack each block into ONE row (collect_list of (id, qv) —
    ≤ tile_rows·d int64 ≈ 4 MB at the defaults), theta-join the packed
    blocks on ``bx <= by`` (L(L+1)/2 rows), and GEMM each block pair in
    a single Arrow batch.  Total shuffle = L · |quantized corpus| —
    inherent to exact all-pairs (compute is O(n²·d) regardless); per-
    task memory is two tiles, constant in n.  A parallelism floor
    splits small corpora into a few tiles anyway so local[32] doesn't
    serialize behind one task.  This replaces the r5 driver-collect
    design (cap 65,536) — the exact baseline now scales with the
    cluster; switch to int8_cosine_pairs_ann only when O(n²) COMPUTE
    (not memory) is the binding cost.
    Overflow: |dot| <= d·127², so t_den²·dot² fits int64 for
    d·t_den² < ~5.7e5 — d=64, t_den=5 is 4 orders under the line."""
    import math

    import numpy as np
    import pandas as pd

    q = int8_quantized(corpus, id_col, vec_col).filter(
        ~F.exists("qv", lambda x: x.isNull())  # zero vectors match nothing
    )
    # drives the tile count only; counted BEFORE quantization so the job
    # reads zero value columns from a parquet scan (upper bound of the
    # quantized row count — zero vectors only make tiles slightly small)
    n = corpus.count()
    if n == 0:
        return corpus.sparkSession.createDataFrame([], "id_a long, id_b long")
    # parallelism floor: even a sub-tile corpus splits ~8 ways so the
    # block-pair join yields ~36 tasks, not 1 (tiles of >= ~512 rows
    # keep the per-task GEMM worth its scheduling overhead)
    n_tiles = max(math.ceil(n / tile_rows), min(8, math.ceil(n / 512)))
    packed = (
        q.groupBy(F.pmod(F.xxhash64(F.col("id")), F.lit(n_tiles)).alias("blk"))
        .agg(F.collect_list(F.struct("id", "qv")).alias("chunk"))
        .localCheckpoint(eager=False)  # pack once; both join sides reuse it
    )
    # Multi-tile corpora: one tile per partition BEFORE the theta join.
    # A CartesianProduct partition is (left partition × right
    # partition), so this pins the per-task Arrow batch to ~1 block
    # pair (two tiles, ~8 MB payload) — the r6 review caught that
    # AQE-coalesced inputs could otherwise hand mapInPandas a batch of
    # HUNDREDS of pair rows, each carrying two packed tiles, and Arrow
    # materializes the whole batch as Python objects before the
    # generator sees row one. The single-tile toy regime skips the
    # extra exchange and keeps the broadcast fast path (measured 1.7 s
    # vs 5 s warm at sf0.1's 500-row corpus).
    # repartitionByRange, not hash repartition: blk values are exactly
    # 0..L-1, so range partitioning lands ~one tile per partition
    # deterministically, where hashpartitioning(blk) % L leaves
    # birthday-collision partitions holding several tiles (k tiles on
    # both sides of a cartesian task -> k^2 pair rows per Arrow batch)
    side = packed if n_tiles == 1 else packed.repartitionByRange(n_tiles, "blk")
    x = side.select(F.col("blk").alias("bx"), F.col("chunk").alias("cx"))
    y = side.select(F.col("blk").alias("by"), F.col("chunk").alias("cy"))
    # pure theta join: Spark broadcasts the packed side while it fits
    # the broadcast threshold and falls back to CartesianProduct past
    # it — L×L block pairs either way
    block_pairs = x.join(y, F.col("bx") <= F.col("by"))
    tn2, td2 = t_num * t_num, t_den * t_den

    def unpack(cell):
        ids = np.fromiter((e["id"] for e in cell), dtype=np.int64, count=len(cell))
        M = np.stack([np.asarray(e["qv"], dtype=np.int64) for e in cell])
        return ids, M, (M * M).sum(axis=1)

    def gen(batches):
        for b in batches:
            for bx, by, cx, cy in zip(b["bx"], b["by"], b["cx"], b["cy"]):
                ids_x, X, nx2 = unpack(cx)
                if bx == by:
                    ids_y, Y, ny2 = ids_x, X, nx2
                else:
                    ids_y, Y, ny2 = unpack(cy)
                D = X @ Y.T  # (tile, tile) exact int64
                ok = (D >= 0) & (td2 * D * D >= tn2 * nx2[:, None] * ny2[None, :])
                lt = ok & (ids_x[:, None] < ids_y[None, :])
                ii, jj = np.nonzero(lt)
                out_a, out_b = [ids_x[ii]], [ids_y[jj]]
                if bx != by:
                    # ids hash to exactly one block, so cross-block pairs
                    # appear once — emit the (y < x) orientation too
                    gt = ok & (ids_x[:, None] > ids_y[None, :])
                    ii, jj = np.nonzero(gt)
                    out_a.append(ids_y[jj])
                    out_b.append(ids_x[ii])
                a = np.concatenate(out_a)
                if len(a):
                    yield pd.DataFrame({"id_a": a, "id_b": np.concatenate(out_b)})

    return block_pairs.mapInPandas(gen, schema="id_a long, id_b long")


def int8_cosine_pairs_ann(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    t_num: int = 2,
    t_den: int = 5,
    n_buckets: int = 16,
    probes: int = 2,
    refine_iters: int = 2,
) -> DataFrame:
    """The scale path for the int8 pair graph (VERDICT r4 #5): generate
    candidates with multi-probe IVF bucketing (~probes²/n_buckets of
    the quadratic pair count crosses the verifier), then apply the SAME
    integer-exact threshold filter as int8_cosine_pairs.  Zero false
    positives by construction; recall is the bucketing's miss rate,
    pytest-gated vs the exact pair graph."""
    cand = centroid_candidate_pairs(
        corpus, id_col, vec_col, n_buckets, probes, refine_iters
    )
    q = int8_quantized(corpus, id_col, vec_col)
    qa = q.select(F.col("id").alias("id_a"), F.col("qv").alias("qa"))
    qb = q.select(F.col("id").alias("id_b"), F.col("qv").alias("qb"))
    return _int8_threshold_filter(cand.join(qa, "id_a").join(qb, "id_b"), t_num, t_den)


def semantic_dedup_ann(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    t_num: int = 2,
    t_den: int = 5,
    n_buckets: int = 16,
    probes: int = 2,
    refine_iters: int = 2,
) -> DataFrame:
    """semantic_dedup with the ANN candidate generator plumbed in as
    the pair source — the shape you run at corpus scale (the default
    quadratic source is the oracle-checkable baseline).  Same output
    schema; clusters depend on the bucketing's recall."""
    pairs = int8_cosine_pairs_ann(
        corpus, id_col, vec_col, t_num, t_den, n_buckets, probes, refine_iters
    )
    return semantic_dedup(corpus, id_col, vec_col, t_num, t_den, pairs=pairs)


def semantic_dedup(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    t_num: int = 2,
    t_den: int = 5,
    pairs: DataFrame | None = None,
) -> DataFrame:
    """SemDeDup-shaped semantic deduplication (Abbas et al. 2023 use
    k-means cluster + intra-cluster cosine; here: threshold pair graph
    + connected components, the same closure used for text near-dups):
    (vec_id, cluster_id, n_members, keep) for every vector in a
    semantic-duplicate cluster of >= 2 members; keep marks the min-id
    survivor. The default pair source is the exact
    distributed integer-GEMM scan (int8_cosine_pairs_gemm —
    block-tiled, no corpus-size ceiling); pass ``pairs`` to swap in an
    ANN candidate generator when O(n²) compute is the binding cost
    (semantic_dedup_ann does; clusters then depend on its recall)."""
    from cdc_demo_spark.operators.graph import connected_components_star

    if pairs is None:
        pairs = int8_cosine_pairs_gemm(corpus, id_col, vec_col, t_num, t_den)
    # materialize the pair scan once: the vertex set below and the
    # closure's edge list are separate consumers, and without this the
    # full GEMM pipeline runs twice (measured at 1M)
    pairs = pairs.localCheckpoint(eager=True)
    # Only pair-touched nodes can reach the output (singletons are
    # dropped by the n_members >= 2 filter below), so the closure runs
    # on the pair graph's vertex set, not the corpus: at 1M vectors
    # with ~10k duplicate pairs that's ~20k rows per contraction round
    # instead of 1M (measured: the full-corpus node set made the
    # clustering stage 5× the cost of the entire pair scan).
    nodes = pairs.select(
        F.explode(F.array("id_a", "id_b")).alias(id_col)
    ).distinct()
    cc = connected_components_star(nodes, pairs, id_col=id_col)
    sizes = cc.groupBy("component").agg(F.count(F.lit(1)).alias("n_members"))
    return (
        cc.join(sizes, "component")
        .filter(F.col("n_members") >= 2)
        .select(
            id_col,
            F.col("component").alias("cluster_id"),
            "n_members",
            (F.col(id_col) == F.col("component")).alias("keep"),
        )
    )


def semantic_decontaminate(
    pool: DataFrame,
    evalset: DataFrame,
    threshold: float,
    pool_id: str = "vec_id",
    pool_vec: str = "embedding",
    eval_id: str = "eval_id",
    eval_vec: str = "eval_vec",
) -> DataFrame:
    """EMBEDDING-level eval decontamination: for every pool document,
    the maximum cosine similarity against ANY held-out eval document,
    its argmax eval id, and a ``contaminated`` flag at ``threshold`` —
    the semantic complement of the exact-shingle
    (q_benchmark_contamination) and Bloom (q_bloom_decontamination)
    decontaminators: paraphrased or lightly-edited eval leakage that
    shares no 3-gram still lands next to its source in embedding
    space.

    Scale shape: the eval set is BROADCAST (eval benchmarks are small
    by definition — the same asymmetry brute_force_topk exploits for
    queries); the pool is scanned once, the |pool|x|eval| expansion is
    collapsed by a map-side partial max (each pool row's group lives
    entirely inside its own task, so the exchange carries exactly one
    row per pool doc), and nothing else moves.  Ties break toward the
    SMALLEST eval id via the packed (cos, -id) struct max, so the
    report is deterministic across engines and partitionings."""
    scored = pool.crossJoin(F.broadcast(evalset)).select(
        F.col(pool_id),
        F.col(eval_id),
        cosine(F.col(pool_vec), F.col(eval_vec)).alias("cos_sim"),
    )
    best = scored.groupBy(pool_id).agg(
        F.max(
            F.struct(F.col("cos_sim"), (-F.col(eval_id)).alias("_nid"))
        ).alias("m")
    )
    return best.select(
        pool_id,
        F.col("m.cos_sim").alias("max_eval_sim"),
        (-F.col("m._nid")).alias("nearest_eval_id"),
        (F.col("m.cos_sim") >= F.lit(float(threshold))).alias("contaminated"),
    )


def collect_eval_vectors(
    evalset: DataFrame, eval_vec: str = "eval_vec", max_rows: int = 100_000
) -> list[list[float]]:
    """The eval set as a driver-side list for ``semantic_keep_expr`` —
    the frozen-model idiom's collect step, bounded by contract (eval
    benchmarks are small; ``max_rows`` guards against a caller passing
    the corpus by mistake — the same documented-bounded class as the
    decode vocabulary literal and frozen DSIR λ)."""
    rows = evalset.select(eval_vec).limit(max_rows + 1).collect()
    if len(rows) > max_rows:
        raise ValueError(
            f"collect_eval_vectors: eval set exceeds max_rows={max_rows}; "
            "an eval benchmark should be small — for corpus-vs-corpus "
            "similarity use the bucketed semantic-dedup operators"
        )
    return [[float(x) for x in r[eval_vec]] for r in rows]


def semantic_keep_expr(
    eval_vecs: list[list[float]],
    threshold: float,
    vec_col: str = "embedding",
) -> "F.Column":
    """STREAMING-shaped semantic decontamination: keep a row iff its
    embedding's max cosine against the FROZEN eval set stays under
    ``threshold`` — the batch operator's acceptance law as ONE pure
    codegen expression (eval matrix ships as a plan literal, folded
    per row: zero joins, zero shuffles, zero state), safe inside a
    foreachBatch keep predicate exactly like dsir_keep_expr /
    mixture_keep_expr: a pure function of the row, so the kept set is
    independent of delivery batching and redelivery.  An epoch
    freezes the eval set once (``collect_eval_vectors``); rows with
    NULL/zero-norm embeddings keep (nothing to compare).  Equality
    with the batch operator's flag is pinned in
    tests/test_similarity.py."""
    from cdc_demo_spark.functions.vector import cosine as _cos

    mat = F.lit([[float(x) for x in v] for v in eval_vecs])
    best = F.array_max(
        F.transform(mat, lambda e: _cos(F.col(vec_col), e))
    )
    return F.coalesce(best < F.lit(float(threshold)), F.lit(True))


def semantic_decontaminate_arrow(
    pool: DataFrame,
    eval_rows: list[tuple[int, list[float]]],
    threshold: float,
    pool_id: str = "vec_id",
    pool_vec: str = "embedding",
) -> DataFrame:
    """The GEMM throughput path of ``semantic_decontaminate`` — same
    output shape and acceptance law, built for the 1M-pool × 1k-eval
    grain: the frozen eval matrix rides into the task closure
    (normalized once, float64), and each Arrow batch computes ONE
    (batch × dim) @ (dim × |eval|) BLAS call, a row-wise max, and an
    argmax — a fully map-side plan (mapInPandas, no join, no shuffle,
    no window; the JVM-HOF fold of the expression variant evaluates
    per element and cannot amortize across eval vectors the way a
    GEMM does).  Eval rows are sorted by id so numpy's
    first-occurrence argmax matches the struct-max tie rule (toward
    the SMALLER eval id) on exact ties; zero-norm pool vectors score
    0.0 (uncontaminated), matching the NULL-safe expression variant's
    keep-by-default.  Agreement with the expression operator is
    pinned in tests/test_ann_scale.py at fixture scale."""
    import numpy as np
    import pandas as pd

    rows = sorted(eval_rows, key=lambda r: r[0])
    eids = np.array([r[0] for r in rows], dtype=np.int64)
    E = np.stack([np.asarray(r[1], dtype=np.float64) for r in rows])
    En = E / np.linalg.norm(E, axis=1, keepdims=True)
    thr = float(threshold)

    def score(batches):
        for b in batches:
            if not len(b):
                continue
            M = np.stack(b[pool_vec].map(lambda v: np.asarray(v, dtype=np.float64)))
            norms = np.linalg.norm(M, axis=1, keepdims=True)
            norms[norms == 0] = np.inf
            sims = (M / norms) @ En.T  # (batch, |eval|)
            best_j = np.argmax(sims, axis=1)
            best = sims[np.arange(len(sims)), best_j]
            yield pd.DataFrame(
                {
                    pool_id: b[pool_id].to_numpy(),
                    "max_eval_sim": best,
                    "nearest_eval_id": eids[best_j],
                    "contaminated": best >= thr,
                }
            )

    return pool.mapInPandas(
        score,
        schema=(
            f"{pool_id} long, max_eval_sim double, "
            "nearest_eval_id long, contaminated boolean"
        ),
    )
