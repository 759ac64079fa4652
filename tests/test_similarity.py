"""Similarity-search tests (B52): brute-force correctness, IVF recall,
vector function sanity."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from cdc_demo_spark.functions.vector import cosine, dot, l2_norm, normalize
from cdc_demo_spark.operators import similarity as S
from cdc_demo_spark.sources.tables import load_table


def queries_df(emb, ids=(0, 1, 2)):
    return emb.filter(F.col("vec_id").isin(*ids)).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )


def test_vector_functions_against_python(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings").limit(5)
    rows = emb.select("vec_id", "embedding",
                      dot("embedding", "embedding").alias("d"),
                      l2_norm("embedding").alias("n")).collect()
    for r in rows:
        v = r["embedding"]
        expected = sum(float(x) * float(x) for x in v)
        assert math.isclose(r["d"], expected, rel_tol=1e-9)
        assert math.isclose(r["n"], math.sqrt(expected), rel_tol=1e-9)


def test_self_similarity_is_one(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    topk = S.brute_force_topk(emb, queries_df(emb), k=1)
    for r in topk.collect():
        assert r["vec_id"] == r["query_id"]
        assert abs(r["cos_sim"] - 1.0) < 1e-6


def test_normalize_unit_norm(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings").limit(10)
    norms = emb.select(l2_norm(normalize("embedding")).alias("n")).collect()
    for r in norms:
        assert abs(r["n"] - 1.0) < 1e-9


def test_ivf_recall_vs_brute_force(spark, sf_dir):
    """IVF with nprobe=4/16 buckets must keep decent top-10 recall on
    random data (bucketing is signal-free there, so the bound is loose;
    on clustered real embeddings recall would be far higher)."""
    emb = load_table(spark, sf_dir, "embeddings")
    q = queries_df(emb)
    exact = S.brute_force_topk(emb, q, k=10).collect()
    approx = S.ivf_topk(emb, q, k=10, n_centroids=16, nprobe=4).collect()
    by_q_exact = {}
    for r in exact:
        by_q_exact.setdefault(r["query_id"], set()).add(r["vec_id"])
    by_q_approx = {}
    for r in approx:
        by_q_approx.setdefault(r["query_id"], set()).add(r["vec_id"])
    # every query returns k results and self is always found
    for qid, got in by_q_approx.items():
        assert len(got) == 10
        assert qid in got
    recalls = [len(by_q_exact[q] & by_q_approx[q]) / 10 for q in by_q_exact]
    assert sum(recalls) / len(recalls) >= 0.4  # refined centroids (0.67 measured)


def test_pairwise_near_duplicates_finds_planted_dup(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    clone = emb.filter(F.col("vec_id") == 7).select(
        (F.col("vec_id") + 100000).alias("vec_id"), "embedding", "label"
    )
    with_dup = emb.unionByName(clone)
    pairs = S.pairwise_near_duplicates(with_dup, threshold=0.99)
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    assert (7, 100007) in got


def test_arrow_topk_equals_expression_topk(spark, sf_dir):
    """The numpy-GEMM path must return the exact same neighbors and
    (rounded) scores as the JVM-expression path."""
    emb = load_table(spark, sf_dir, "embeddings")
    q = queries_df(emb)
    qrows = [(r["query_id"], list(r["query_vec"])) for r in q.collect()]
    a = sorted(map(tuple, S.brute_force_topk(emb, q, k=10).collect()))
    b = sorted(map(tuple, S.brute_force_topk_arrow(emb, qrows, k=10).collect()))
    assert a == b


def test_refined_centroids_shapes_and_recall(spark, sf_dir):
    """Lloyd refinement must preserve dim/shape and not hurt top-k
    self-recall; cluster means must match a pandas recomputation."""
    import numpy as np

    emb = load_table(spark, sf_dir, "embeddings")
    init = S.choose_centroids(emb, 8)
    refined = S.refine_centroids(emb, init, iterations=1)
    rows = refined.collect()
    assert 0 < len(rows) <= 8
    assert all(len(r["centroid_vec"]) == 64 for r in rows)

    # cross-check one centroid against a pandas groupby-mean
    assigned = S.assign_buckets(emb, init).toPandas()
    vecs = load_table(spark, sf_dir, "embeddings").toPandas().set_index("vec_id")
    cid = rows[0]["centroid_id"]
    members = assigned[assigned.centroid_id == cid]["vec_id"]
    want = np.stack(vecs.loc[members]["embedding"].map(np.asarray)).mean(axis=0)
    got = np.asarray(rows[0]["centroid_vec"])
    assert np.allclose(got, want, atol=1e-5)


def test_bucketed_near_dup_recall_vs_exact(spark, sf_dir):
    """Measured recall of the centroid-bucketed pairing against the
    exact O(n²) pair set at cosine >= 0.4 (random vectors are the worst
    case for bucketing — clustered real embeddings do far better).
    Lloyd refinement must lift recall materially over raw seeds at the
    SAME bucket/probe budget (measured 0.61 -> 0.82 at sf0.001)."""
    emb = load_table(spark, sf_dir, "embeddings")
    a, b = emb.alias("a"), emb.alias("b")
    from cdc_demo_spark.functions.vector import cosine as cos

    exact = {
        (r["ia"], r["ib"])
        for r in a.join(b, F.col("a.vec_id") < F.col("b.vec_id"))
        .select(
            F.col("a.vec_id").alias("ia"), F.col("b.vec_id").alias("ib"),
            cos(F.col("a.embedding"), F.col("b.embedding")).alias("c"),
        )
        .filter(F.col("c") >= 0.4)
        .collect()
    }
    got = {(r["id_a"], r["id_b"])
           for r in S.pairwise_near_duplicates(emb, threshold=0.4).collect()}
    assert got <= exact  # no false positives ever
    if exact:
        assert len(got & exact) / len(exact) >= 0.7  # refined buckets

    raw = {(r["id_a"], r["id_b"])
           for r in S.pairwise_near_duplicates(emb, threshold=0.4,
                                               refine_iters=0).collect()}
    if exact:
        # refinement must not lose recall vs unrefined seeds
        assert len(got & exact) >= len(raw & exact)


def test_arrow_query_collect_cap(spark):
    """The GEMM path's driver-side query collect is hard-capped: over
    the cap it must raise with a pointer to the distributed paths, not
    attempt the collect (one limit(cap+1) job either way)."""
    import pytest

    from cdc_demo_spark.queries.similarity import collect_query_rows

    q = spark.range(10).select(
        F.col("id").alias("query_id"),
        F.array(F.lit(1.0), F.lit(2.0)).alias("query_vec"),
    )
    rows = collect_query_rows(q, cap=10)
    assert len(rows) == 10 and rows[0][1] == [1.0, 2.0]
    with pytest.raises(ValueError, match="brute_force_topk"):
        collect_query_rows(q, cap=9)


def test_semantic_dedup_planted_clusters(spark):
    """Planted geometry: two exact-duplicate groups plus a slightly
    jittered member must cluster together (cosine(v, v+eps) ~ 1 >= 0.4);
    orthogonal vectors must not. keep marks exactly one min-id
    survivor per cluster, and the pairs= override swaps the generator."""
    from cdc_demo_spark.operators.similarity import (
        int8_cosine_pairs,
        semantic_dedup,
    )

    def basis(i, dim=8, scale=1.0):
        v = [0.0] * dim
        v[i] = scale
        return v

    rows = [
        (0, basis(0)), (1, basis(0, scale=2.0)),          # colinear pair
        (2, basis(1)), (3, basis(1)), (4, [0.0, 1.0, 0.05] + [0.0] * 5),
        (5, basis(2)),                                    # singleton
        (6, basis(3)),                                    # singleton
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = {
        r["vec_id"]: (r["cluster_id"], r["n_members"], r["keep"])
        for r in semantic_dedup(df, t_num=2, t_den=5).collect()
    }
    assert got[0] == (0, 2, True) and got[1] == (0, 2, False)
    assert got[2] == (2, 3, True)
    assert got[3][0] == 2 and got[4][0] == 2
    assert 5 not in got and 6 not in got  # singletons excluded
    # survivors: exactly one keep per cluster
    keeps = [v for v in got.values() if v[2]]
    assert len(keeps) == len({v[0] for v in got.values()})
    # pluggable pair source: an empty pair set yields no clusters
    empty = int8_cosine_pairs(df).filter(F.lit(False))
    assert semantic_dedup(df, pairs=empty).count() == 0


def test_int8_gemm_pairs_equal_hof_pairs(spark, sf_dir):
    """The distributed GEMM tiling must produce the IDENTICAL pair set
    to the HOF expression path — both are pure int64 arithmetic, so
    equality is exact, not approximate. Also pins that the pair set is
    invariant to the tile size (tile_rows small enough to force many
    block pairs, including every cross-block orientation)."""
    from cdc_demo_spark.operators.similarity import (
        int8_cosine_pairs,
        int8_cosine_pairs_gemm,
    )
    from cdc_demo_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    hof = {(r.id_a, r.id_b) for r in int8_cosine_pairs(emb).collect()}
    gemm = {(r.id_a, r.id_b) for r in int8_cosine_pairs_gemm(emb).collect()}
    assert gemm == hof and hof
    # tiling invariance: many tiny tiles => same exact pair set
    tiny = {
        (r.id_a, r.id_b)
        for r in int8_cosine_pairs_gemm(emb, tile_rows=64).collect()
    }
    assert tiny == hof
    # empty and all-zero-vector corpora: no pairs, no numpy AxisError
    empty = emb.filter(F.lit(False))
    assert int8_cosine_pairs_gemm(empty).count() == 0
    zeros = spark.createDataFrame(
        [(1, [0.0] * 4), (2, [0.0] * 4)], "vec_id long, embedding array<float>"
    )
    assert int8_cosine_pairs_gemm(zeros).count() == 0


def test_semantic_dedup_ann_subset_and_recall(spark, sf_dir):
    """The ANN pair source (multi-probe IVF candidates + the SAME
    integer-exact verifier) must produce (a) a strict SUBSET of the
    exact int8 pair graph — the verifier is identical, so a non-subset
    means the candidate join corrupted pairs — and (b) recall >= 0.8
    on the real embeddings fixture at test grain."""
    from cdc_demo_spark.operators.similarity import (
        int8_cosine_pairs,
        int8_cosine_pairs_ann,
    )
    from cdc_demo_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    exact = {(r.id_a, r.id_b) for r in int8_cosine_pairs(emb).collect()}
    ann = {(r.id_a, r.id_b) for r in int8_cosine_pairs_ann(emb).collect()}
    assert ann <= exact
    assert exact, "fixture produced no exact pairs; recall gate is vacuous"
    recall = len(ann) / len(exact)
    assert recall >= 0.8, f"ANN pair recall {recall:.3f} < 0.8 ({len(ann)}/{len(exact)})"


def test_semantic_dedup_ann_exact_duplicates_always_found(spark):
    """Identical vectors share every probe, so exact duplicates can
    never be missed by the bucketing — the guarantee that matters for
    dedup (near-misses cost recall, true dupes must not)."""
    from cdc_demo_spark.operators.similarity import semantic_dedup_ann

    rows = [(i, [float(i % 7 + 1), float((i * 3) % 5 + 1), 1.0, 2.0]) for i in range(40)]
    rows += [(100, [9.0, 1.0, 4.0, 2.0]), (101, [9.0, 1.0, 4.0, 2.0])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = {r.vec_id: r.cluster_id for r in semantic_dedup_ann(df, n_buckets=4).collect()}
    assert got.get(100) == got.get(101) is not None


def test_semantic_decontaminate_planted_leak_and_ties(spark):
    """semantic_decontaminate (r16): a pool vector that IS an eval
    vector scores max_eval_sim == 1.0 and is flagged; an orthogonal
    vector is not; when two eval members tie exactly, the argmax
    breaks toward the SMALLER eval id (the packed struct max)."""
    from cdc_demo_spark.operators.similarity import semantic_decontaminate

    ev = spark.createDataFrame(
        [(10, [1.0, 0.0]), (11, [1.0, 0.0]), (12, [0.0, 1.0])],
        "eval_id long, eval_vec array<float>",
    )
    pool = spark.createDataFrame(
        [
            (1, [2.0, 0.0]),    # colinear with eval 10 AND 11 -> tie at 1.0
            (2, [0.0, -3.0]),   # anti-colinear with 12, orthogonal to 10/11
            (3, [1.0, 1.0]),    # 45 degrees from both axes
        ],
        "vec_id long, embedding array<float>",
    )
    got = {
        r["vec_id"]: r
        for r in semantic_decontaminate(pool, ev, 0.9).collect()
    }
    assert got[1]["max_eval_sim"] == 1.0
    assert got[1]["nearest_eval_id"] == 10  # tie -> smaller eval id
    assert got[1]["contaminated"] is True
    assert got[2]["max_eval_sim"] == 0.0 and got[2]["contaminated"] is False
    assert abs(got[3]["max_eval_sim"] - 0.5 ** 0.5) < 1e-9
    assert got[3]["contaminated"] is False


def test_semantic_keep_expr_equals_batch_operator(spark, sf_dir):
    """semantic_keep_expr (r16): the frozen-eval-set expression keeps
    EXACTLY the rows the batch operator leaves unflagged (keep ==
    NOT contaminated) at fixture scale, independent of batching (a
    two-slice evaluation agrees with the whole-pool one); the
    bounded-collect guard refuses an oversized eval set."""
    import pytest

    from cdc_demo_spark.operators.similarity import (
        collect_eval_vectors,
        semantic_decontaminate,
        semantic_keep_expr,
    )
    from cdc_demo_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    evalset = emb.filter(F.col("vec_id") % 50 == 0).select(
        F.col("vec_id").alias("eval_id"), F.col("embedding").alias("eval_vec")
    )
    pool = emb.filter(F.col("vec_id") % 50 != 0)
    want = {
        r["vec_id"]: not r["contaminated"]
        for r in semantic_decontaminate(pool, evalset, 0.35).collect()
    }

    vecs = collect_eval_vectors(evalset)
    keep = semantic_keep_expr(vecs, 0.35)
    got = {r["vec_id"]: r["k"] for r in pool.select("vec_id", keep.alias("k")).collect()}
    assert got == want
    # batching-independence: evaluating per slice changes nothing
    half = {
        r["vec_id"]: r["k"]
        for cond in (F.col("vec_id") % 2 == 0, F.col("vec_id") % 2 == 1)
        for r in pool.filter(cond).select("vec_id", keep.alias("k")).collect()
    }
    assert half == want

    with pytest.raises(ValueError, match="max_rows"):
        collect_eval_vectors(evalset, max_rows=3)
