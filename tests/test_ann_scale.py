"""Scale twins of the ANN/semantic-dedup stack (operators/ann_scale.py)
and the synthetic corpus that grounds them (sources/synth_vectors.py).

Equality contracts:
- arrow assignment == HOF assignment on the driver fixture (set-exact);
- arrow int8 filter == HOF int8 filter (int64 math is order-free, so
  this must be EXACT, not approximate);
- bucketed GEMM pairs ⊆ exact GEMM pairs (same integer admission test
  — subset by construction, asserted anyway);
- arrow SemanticIndex: two-batch == one-shot, the same invariant the
  HOF index pins.

Recall contract: planted near-duplicates (synth_vectors' ground truth
— cosine ≈ 0.999 vs a ≈ 0.56 background max at 5k rows) are found at
>= 0.95 by the bucketed path at a 50k mid-grain, the scale the driver
fixtures never reach (VERDICT r6 item 1).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cdc_demo_spark.operators import ann_scale as AS
from cdc_demo_spark.operators import similarity as S
from cdc_demo_spark.operators.incremental_semantic import SemanticIndex
from cdc_demo_spark.sources.synth_vectors import planted_pairs, synth_embeddings
from cdc_demo_spark.sources.tables import load_table


def test_synth_corpus_deterministic_across_partitioning(spark):
    a = synth_embeddings(spark, 2000, parts=32)
    b = synth_embeddings(spark, 2000, parts=7)

    def digest(df):
        return (
            df.orderBy("vec_id")
            .select(F.md5(F.to_json(F.struct("vec_id", "embedding"))).alias("h"))
            .agg(F.md5(F.concat_ws("", F.collect_list("h"))).alias("d"))
            .collect()[0]["d"]
        )

    assert digest(a) == digest(b)


def test_arrow_assignment_equals_hof(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings").cache()
    cents = S.refine_centroids(
        emb, S.choose_centroids(emb, 16), iterations=2
    ).cache()
    hof = {
        (r["vec_id"], r["centroid_id"])
        for r in S.assign_multiprobe(emb, cents, 2)
        .select("vec_id", "centroid_id")
        .collect()
    }
    arw = {
        (r["vec_id"], r["centroid_id"])
        for r in AS.assign_multiprobe_arrow(emb, cents, 2).collect()
    }
    assert hof == arw


def test_arrow_int8_filter_exactly_equals_hof(spark):
    corpus = synth_embeddings(spark, 300, dup_every=50).cache()
    q = S.int8_quantized(corpus)
    a = q.select(F.col("id").alias("id_a"), F.col("qv").alias("qa"))
    b = q.select(F.col("id").alias("id_b"), F.col("qv").alias("qb"))
    cand = a.crossJoin(b).filter(F.col("id_a") < F.col("id_b"))
    for tn, td in ((4, 5), (2, 5), (9, 10)):
        hof = {(r.id_a, r.id_b) for r in S._int8_threshold_filter(cand, tn, td).collect()}
        arw = {(r.id_a, r.id_b) for r in AS.int8_threshold_filter_arrow(cand, tn, td).collect()}
        assert hof == arw, f"t={tn}/{td}"


def test_bucketed_gemm_subset_and_planted_recall_5k(spark):
    n = 5000
    corpus = synth_embeddings(spark, n, dup_every=100).cache()
    exact = {(r.id_a, r.id_b) for r in
             S.int8_cosine_pairs_gemm(corpus, t_num=4, t_den=5).collect()}
    buck = {(r.id_a, r.id_b) for r in
            AS.int8_cosine_pairs_bucketed_gemm(
                corpus, t_num=4, t_den=5, n_buckets=32, probes=2,
                sample=2048, train_iters=3,
            ).collect()}
    planted = set(planted_pairs(n, 100))
    assert buck <= exact  # zero false positives — same integer test
    assert planted <= exact  # the synth ground truth is real
    assert len(buck & planted) / len(planted) >= 0.95


def test_bucketed_gemm_recall_midgrain_50k(spark):
    """The grain the driver fixtures never reach: 50k vectors, 128
    buckets — recall of the 500 planted pairs must hold without any
    quadratic reference scan."""
    n = 50_000
    corpus = synth_embeddings(spark, n, dup_every=100).cache()
    pairs = AS.int8_cosine_pairs_bucketed_gemm(
        corpus, t_num=4, t_den=5, n_buckets=128, probes=2,
        sample=8192, train_iters=3,
    )
    got = {(r.id_a, r.id_b) for r in pairs.collect()}
    planted = set(planted_pairs(n, 100))
    assert len(got & planted) / len(planted) >= 0.95
    # background at 0.8 is ~nothing: found pairs are almost all planted
    assert len(got - planted) <= len(planted) // 10


def test_semantic_dedup_ann_gemm_clusters_planted_dups(spark):
    n = 5000
    corpus = synth_embeddings(spark, n, dup_every=100).cache()
    out = AS.semantic_dedup_ann_gemm(
        corpus, t_num=4, t_den=5, n_buckets=32, probes=2,
        sample=2048, train_iters=3,
    )
    rows = out.collect()
    by_cluster = {}
    for r in rows:
        by_cluster.setdefault(r["cluster_id"], []).append(r)
    # planted groups are (k*100-2, k*100-1); most must land in 2-member
    # clusters with exactly one keep=True survivor
    planted = planted_pairs(n, 100)
    found = 0
    for a, b in planted:
        ca = [r["cluster_id"] for r in rows if r["vec_id"] == a]
        cb = [r["cluster_id"] for r in rows if r["vec_id"] == b]
        if ca and cb and ca[0] == cb[0]:
            found += 1
    assert found / len(planted) >= 0.95
    for cid, members in by_cluster.items():
        assert sum(r["keep"] for r in members) == 1
        assert all(r["n_members"] == len(members) for r in members)


def test_arrow_semantic_index_two_batch_equals_one_shot(spark, tmp_path):
    """The HOF index's core invariant, re-pinned for arrow mode: build
    + append over a split corpus admits exactly the pairs a one-shot
    bucketed run finds (same frozen centroids on both sides)."""
    n = 4000
    corpus = synth_embeddings(spark, n, dup_every=100).cache()
    cents = AS.train_centroids_sampled(corpus, 32, sample=2048, iters=3).cache()

    one_shot = {
        (r.id_a, r.id_b)
        for r in AS.int8_cosine_pairs_bucketed_gemm(
            corpus, t_num=4, t_den=5, n_buckets=32, probes=2, centroids=cents
        ).collect()
    }

    first = corpus.filter(F.col("vec_id") < n // 2)
    second = corpus.filter(F.col("vec_id") >= n // 2)
    idx = SemanticIndex(
        spark, str(tmp_path / "idx"), t_num=4, t_den=5,
        n_buckets=32, probes=2, arrow=True,
    )
    p1 = {(r.id_a, r.id_b) for r in idx.build(first, centroids=cents).collect()}
    p2 = {(r.id_a, r.id_b) for r in idx.append_batch(second).collect()}
    assert p1 | p2 == one_shot
    assert not (p1 & p2)


def test_arrow_index_meta_mismatch_raises(spark, tmp_path):
    idx = SemanticIndex(spark, str(tmp_path / "idx"), arrow=True)
    assert idx.arrow
    with pytest.raises(ValueError, match="built with"):
        SemanticIndex(spark, str(tmp_path / "idx"), arrow=False)


def test_centroid_collect_cap_raises(spark):
    corpus = synth_embeddings(spark, 64, dup_every=0)
    cents = corpus.select(
        F.col("vec_id").alias("centroid_id"), F.col("embedding").alias("centroid_vec")
    )
    import cdc_demo_spark.operators.ann_scale as mod

    old = mod.CENTROID_CAP
    mod.CENTROID_CAP = 16
    try:
        with pytest.raises(ValueError, match="centroid set exceeds"):
            AS.centroid_matrix(cents)
    finally:
        mod.CENTROID_CAP = old


def test_numpy_quantization_parity_with_jvm(spark, sf_dir):
    """int8_quantize_rows (the pack-step quantizer) must produce the
    SAME integers as the JVM int8_quantized for every vector — on the
    driver fixture and on 20k synth vectors — or the bucketed path's
    subset-of-exact proof would silently stop holding."""
    import numpy as np

    for corpus in (
        load_table(spark, sf_dir, "embeddings"),
        synth_embeddings(spark, 20_000, dup_every=100),
    ):
        jvm = {
            r["id"]: r["qv"]
            for r in S.int8_quantized(corpus).collect()
        }
        rows = corpus.select("vec_id", "embedding").collect()
        ids = np.array([r["vec_id"] for r in rows])
        X = np.array([r["embedding"] for r in rows], dtype=np.float32)
        Q, nz = AS.int8_quantize_rows(X)
        for i, vid in enumerate(ids):
            if not nz[i]:
                assert all(v is None for v in jvm[vid])
            else:
                assert jvm[vid] == list(Q[i]), f"vec {vid}"


def test_pack_tiles_streaming_carry_packs_each_group_once(spark):
    """pack_tiles streams a sorted partition batch-by-batch, carrying
    only a possibly-split trailing group (ADVICE r8: the whole-
    partition concat made task memory scale with corpus/npart).  With
    Arrow batches forced far smaller than the groups, every group
    spans batches — each must still land in EXACTLY one tile row with
    its full membership."""
    import numpy as np

    key = "spark.sql.execution.arrow.maxRecordsPerBatch"
    old = spark.conf.get(key)
    spark.conf.set(key, "64")
    try:
        corpus = synth_embeddings(spark, 2000, parts=8)
        qm = corpus.select(
            F.pmod(F.col("vec_id"), F.lit(3)).cast("int").alias("centroid_id"),
            F.col("vec_id").alias("id"),
            F.col("embedding").alias("vec"),
        )
        # tile_rows=150 also forces nsub > 1: multi-block buckets
        tiles = AS.pack_tiles(qm, tile_rows=150).collect()
        seen: dict[tuple, list] = {}
        for r in tiles:
            ids = np.frombuffer(r["ids"], dtype=np.int64)
            assert r["n"] == len(ids)
            k = (r["centroid_id"], r["blk"])
            assert k not in seen, f"group {k} split across tile rows"
            seen[k] = list(ids)
        got = sorted(i for v in seen.values() for i in v)
        assert got == sorted(range(2000)), "every id in exactly one tile"
    finally:
        spark.conf.set(key, old)


def test_arrow_index_sharded_tiles_two_batch_equals_one_shot(
    spark, tmp_path, monkeypatch
):
    """r9 sharded stored-tile layout: with the shard threshold forced
    below the bucket count, batch-0 tiles land partitioned by
    pmod(centroid_id, nshards) and the delta append reads them through
    the shard-pruned path — the core two-batch == one-shot invariant
    must survive the layout, and the pruned fetch must equal the full
    one after the probe's own filter."""
    import cdc_demo_spark.operators.incremental_semantic as mod

    monkeypatch.setattr(mod, "_TILE_SHARD_ROWS", 8)  # force ns > 1
    n = 4000
    corpus = synth_embeddings(spark, n, dup_every=100).cache()
    cents = AS.train_centroids_sampled(corpus, 32, sample=2048, iters=3).cache()

    one_shot = {
        (r.id_a, r.id_b)
        for r in AS.int8_cosine_pairs_bucketed_gemm(
            corpus, t_num=4, t_den=5, n_buckets=32, probes=2, centroids=cents
        ).collect()
    }

    first = corpus.filter(F.col("vec_id") < n // 2)
    second = corpus.filter(F.col("vec_id") >= n // 2)
    idx = SemanticIndex(
        spark, str(tmp_path / "idx"), t_num=4, t_den=5,
        n_buckets=32, probes=2, arrow=True,
    )
    p1 = {(r.id_a, r.id_b) for r in idx.build(first, centroids=cents).collect()}
    (d0,) = idx._committed_batches("tiles")
    from cdc_demo_spark.operators.shard_layout import nshards_of, shard_files

    ns = nshards_of(idx.backend, d0)
    assert ns > 1, "batch-0 tiles should have sharded"
    p2 = {(r.id_a, r.id_b) for r in idx.append_batch(second).collect()}
    assert p1 | p2 == one_shot
    assert not (p1 & p2)

    # pruned fetch: a few buckets' tiles, via their shards only
    cids = [0, 5, 31]
    shards = sorted({c % ns for c in cids})
    assert len(shard_files(idx.backend, d0, shards)) < len(
        shard_files(idx.backend, d0, None)
    )
    pruned = {
        (r["centroid_id"], r["blk"])
        for r in idx.stored_tiles(cids).filter(F.col("centroid_id").isin(cids)).collect()
    }
    full = {
        (r["centroid_id"], r["blk"])
        for r in idx.stored_tiles().filter(F.col("centroid_id").isin(cids)).collect()
    }
    assert pruned and pruned == full


def test_grouped_assignment_full_groups_equals_flat_numpy():
    """Parity anchor for the two-level coarse quantizer: with
    group_probes == n_groups every centroid is scored, so the grouped
    top-k must equal the flat one EXACTLY — same scores, same
    (score desc, index asc) tie rule.  Clustered fixture (centroids +
    queries share latent directions), the IVF-realistic shape."""
    import numpy as np

    rng = np.random.default_rng(7)
    latent = rng.standard_normal((64, 64))
    C = latent[rng.integers(0, 64, 1024)] + 0.3 * rng.standard_normal((1024, 64))
    Cn = AS._norm_rows(C).T
    X = AS._norm_rows(
        latent[rng.integers(0, 64, 2000)] + 0.3 * rng.standard_normal((2000, 64))
    )
    flat = AS._topk_centroids(X, Cn, 2)
    Gn, members = AS.group_centroids(Cn, 32)
    assert np.array_equal(
        AS._topk_centroids_grouped(X, Cn, 2, Gn, members, group_probes=32), flat
    )
    # truncated exploration: approximate, measured — clustered queries
    # keep near-perfect assignment recall at 4-of-32 groups
    g4 = AS._topk_centroids_grouped(X, Cn, 2, Gn, members, group_probes=4)
    assert (g4 == flat).mean() >= 0.98


def test_grouped_assignment_spark_path_parity(spark):
    """The fused Spark assigner with group_probes == n_groups emits
    exactly the flat path's rows; with truncated groups it stays
    within the measured recall band on the synthetic corpus."""
    corpus = synth_embeddings(spark, 3000, dup_every=100).cache()
    cents = AS.train_centroids_sampled(corpus, 64, sample=2048, iters=3).cache()

    def rows(df):
        return {(r["centroid_id"], r["id"], bytes(r["qv"])) for r in df.collect()}

    flat = rows(AS.assign_quantized_multiprobe(corpus, cents, 2))
    full = rows(
        AS.assign_quantized_multiprobe(
            corpus, cents, 2, group_probes=8, n_groups=8
        )
    )
    assert full == flat

    # truncated exploration on a CLUSTERED corpus (the IVF-realistic
    # regime: trained centroids sit near the data, so a query's true
    # buckets live in its nearest groups).  On UNIFORM vectors the
    # 2nd-probe bucket is arbitrary and two-level recall honestly
    # degrades (~0.74 at 3-of-8 groups on synth_embeddings) — that
    # regime is documented, not gated.
    import numpy as np
    import pandas as pd

    rng = np.random.default_rng(11)
    latent = rng.standard_normal((32, 64))
    V = latent[rng.integers(0, 32, 3000)] + 0.3 * rng.standard_normal((3000, 64))
    cdf = spark.createDataFrame(
        pd.DataFrame(
            {"vec_id": np.arange(3000), "embedding": [r.astype("float32") for r in V]}
        )
    )
    ccents = AS.train_centroids_sampled(cdf, 64, sample=2048, iters=3).cache()
    cflat = rows(AS.assign_quantized_multiprobe(cdf, ccents, 2))
    cg = rows(
        AS.assign_quantized_multiprobe(cdf, ccents, 2, group_probes=3, n_groups=8)
    )
    assert len(cg & cflat) / len(cflat) >= 0.95


def test_grouped_index_two_batch_equals_one_shot(spark, tmp_path):
    """The incremental invariant WITHIN the grouped-assignment choice:
    a grouped-assigned index fed two batches equals the same index fed
    everything at once (same frozen centroids, same deterministic
    grouping) — and the choice is frozen: reopening with a different
    group_probes refuses, a pre-group_probes meta opens as flat."""
    import json as _json
    import os as _os

    n = 3000
    corpus = synth_embeddings(spark, n, dup_every=100).cache()
    cents = AS.train_centroids_sampled(corpus, 32, sample=2048, iters=3).cache()

    def make(name, parts):
        i = SemanticIndex(
            spark, str(tmp_path / name), t_num=4, t_den=5,
            n_buckets=32, probes=2, arrow=True, group_probes=4,
        )
        i.freeze_centroids(cents)
        out = set()
        for bid, p in enumerate(parts):
            out |= {
                (r.id_a, r.id_b) for r in i.append_batch(p, batch_id=bid).collect()
            }
        return i, out

    first = corpus.filter(F.col("vec_id") < n // 2)
    second = corpus.filter(F.col("vec_id") >= n // 2)
    _, two = make("two", [first, second])
    _, one = make("one", [corpus])
    assert two == one

    with pytest.raises(ValueError, match="built with"):
        SemanticIndex(
            spark, str(tmp_path / "two"), t_num=4, t_den=5,
            n_buckets=32, probes=2, arrow=True, group_probes=8,
        )
    # legacy meta without the key == flat index: opens under None
    legacy = tmp_path / "legacy"
    _os.makedirs(legacy)
    idx_flat = SemanticIndex(
        spark, str(tmp_path / "flatref"), t_num=4, t_den=5,
        n_buckets=32, probes=2, arrow=True,
    )
    meta = _json.loads(open(tmp_path / "flatref" / "_meta.json", "rb").read())
    del meta["group_probes"]
    open(legacy / "_meta.json", "w").write(_json.dumps(meta))
    SemanticIndex(
        spark, str(legacy), t_num=4, t_den=5, n_buckets=32, probes=2, arrow=True
    )  # must not raise


def test_blocked_topk_equals_naive_with_cross_block_ties():
    """The r12 column-blocked _topk_centroids must equal a naive
    full-matrix argsort under its exact tie rule — including DUPLICATE
    centroids planted in DIFFERENT column blocks, where the running
    merge's ordering (earlier blocks concatenated first) is what makes
    equal scores resolve to the lowest centroid id.  K deliberately
    not a multiple of _SCORE_COLS, rows not a multiple of _SCORE_ROWS,
    probes up to 4 so merges span several picks."""
    import numpy as np

    rng = np.random.default_rng(12)
    K = AS._SCORE_COLS * 3 + 137  # ragged tail block
    d = 16
    C = rng.standard_normal((K, d))
    # plant exact duplicates straddling block boundaries: copies of
    # column j at j + _SCORE_COLS and j + 2 * _SCORE_COLS
    for j in range(0, 40):
        C[j + AS._SCORE_COLS] = C[j]
        C[j + 2 * AS._SCORE_COLS] = C[j]
    Cn = AS._norm_rows(C).T
    X = AS._norm_rows(rng.standard_normal((AS._SCORE_ROWS + 61, d)))
    # several query rows exactly aligned with duplicated centroids so
    # the top hit is an exact multi-way cross-block tie
    X[:40] = Cn.T[:40]
    for probes in (1, 2, 4):
        got = AS._topk_centroids(X, Cn, probes)
        S = X @ Cn
        # naive reference: stable argsort on (-score, index)
        ref = np.argsort(-S, axis=1, kind="stable")[:, :probes]
        assert np.array_equal(got, ref), f"probes={probes}"
    # the planted ties really resolved across blocks: the first-probe
    # winner for the aligned rows is the ORIGINAL (lowest) index
    assert np.array_equal(AS._topk_centroids(X, Cn, 1)[:40, 0], np.arange(40))


def test_semantic_decontaminate_arrow_agrees_with_expression(spark, sf_dir):
    """semantic_decontaminate_arrow (r16): the GEMM path agrees with
    the JVM-expression operator on flag and argmax for every pool row
    at fixture scale, and on max_eval_sim to within blocked-vs-
    sequential float-sum tolerance; the planted twin of an eval head
    must argmax to its own head under both."""
    from cdc_demo_spark.operators.similarity import (
        semantic_decontaminate,
        semantic_decontaminate_arrow,
    )
    from cdc_demo_spark.sources.synth_vectors import synth_embeddings

    emb = synth_embeddings(spark, 3_000).localCheckpoint(eager=True)
    evalset = emb.filter(F.col("vec_id") % 1000 == 998).select(
        F.col("vec_id").alias("eval_id"), F.col("embedding").alias("eval_vec")
    )
    pool = emb.filter(F.col("vec_id") % 1000 != 998)
    want = {
        r["vec_id"]: r
        for r in semantic_decontaminate(pool, evalset, 0.9).collect()
    }
    eval_rows = [
        (r["eval_id"], list(r["eval_vec"])) for r in evalset.collect()
    ]
    got = {
        r["vec_id"]: r
        for r in semantic_decontaminate_arrow(pool, eval_rows, 0.9).collect()
    }
    assert set(got) == set(want)
    for vid, w in want.items():
        g = got[vid]
        assert g["contaminated"] == w["contaminated"], vid
        assert g["nearest_eval_id"] == w["nearest_eval_id"], vid
        assert abs(g["max_eval_sim"] - w["max_eval_sim"]) < 1e-9, vid
    # planted twins flagged and argmaxed to their own head in both
    for vid in (999, 1999, 2999):
        assert want[vid]["contaminated"] and got[vid]["contaminated"]
        assert want[vid]["nearest_eval_id"] == vid - 1
