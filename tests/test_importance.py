"""DSIR importance resampling (operators/importance.py): weight
semantics, determinism, the empty-doc convention, and the measured
rank-k boundary margin that backs q_dsir_sample's oracle claim."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from cdc_demo_spark.operators.importance import (
    dsir_log_ratios,
    dsir_logweights,
    dsir_resample,
    hashed_ngram_counts,
)
from cdc_demo_spark.sources.tables import load_table


def test_hashed_ngram_counts_census(spark):
    """Bucket counts conserve the n-gram census: sum(c) per doc =
    n_tokens + max(n_tokens - 1, 0); empty/whitespace docs contribute
    no rows; single-token docs get no bigram (the descending-sequence
    guard)."""
    df = spark.createDataFrame(
        [(1, "a b c"), (2, "solo"), (3, ""), (4, "   "), (5, "x  y")],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: r["n"]
        for r in hashed_ngram_counts(df, "text", "doc_id")
        .groupBy("doc_id")
        .agg(F.sum("c").alias("n"))
        .collect()
    }
    # doc 5: split('x  y') -> ['x','','y'] -> nonempty ['x','y'] -> 3 grams
    assert got == {1: 5, 2: 1, 5: 3}


def test_dsir_weights_separate_target_from_rest(spark, sf_dir):
    """On the real corpus with target lang='en', the mean importance
    log-weight of en documents must exceed the mean over every other
    lang (the defining property of the ratio model), and empty-feature
    docs come back weight 0.0 with n_ngrams 0."""
    docs = load_table(spark, sf_dir, "documents")
    lw = dsir_logweights(docs, "text", "doc_id", F.col("lang") == "en")
    joined = lw.join(docs.select("doc_id", "lang"), "doc_id")
    means = {
        r["lang"]: r["m"]
        for r in joined.groupBy("lang")
        .agg(F.avg(F.col("logweight_raw") / F.greatest("n_ngrams", F.lit(1))).alias("m"))
        .collect()
    }
    assert all(means["en"] > v for k, v in means.items() if k != "en"), means
    assert lw.count() == docs.count()


def test_dsir_logweights_deterministic_and_salted(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").limit(80)
    a = {
        r["doc_id"]: r["logweight_raw"]
        for r in dsir_logweights(docs, "text", "doc_id", F.col("lang") == "en").collect()
    }
    b = {
        r["doc_id"]: r["logweight_raw"]
        for r in dsir_logweights(docs, "text", "doc_id", F.col("lang") == "en").collect()
    }
    assert a == b  # bit-identical across runs
    c = dsir_logweights(
        docs, "text", "doc_id", F.col("lang") == "en", salt="dsir_v2"
    ).collect()
    assert {r["doc_id"] for r in c} == set(a)  # salted rehash, same coverage


def test_dsir_resample_boundary_margin_and_bias(spark, sf_dir):
    """The oracle-backing margin measurement (q_weighted_sample
    precedent): the gap between the rank-100 and rank-101 race keys
    must be enormously wider than libm ulp wiggle (~1e-15 relative),
    and the selected sample must be en-enriched relative to the pool
    (the point of DSIR)."""
    docs = load_table(spark, sf_dir, "documents")
    lw = dsir_logweights(docs, "text", "doc_id", F.col("lang") == "en")
    from cdc_demo_spark.operators.sampling import uniform_from_id

    key = F.round(F.col("logweight_raw"), 6) - F.log(-F.log(uniform_from_id(F.col("doc_id"), "dsir_pick")))
    ordered = [
        r["k"] for r in lw.select(key.alias("k")).orderBy(F.desc("k")).limit(101).collect()
    ]
    gap = ordered[99] - ordered[100]
    assert gap > 1e-9 * max(1.0, abs(ordered[99])), gap

    picked = dsir_resample(docs, "text", "doc_id", F.col("lang") == "en", k=100)
    rows = picked.collect()
    assert len(rows) == 100 and len({r["doc_id"] for r in rows}) == 100
    en_pool = docs.filter(F.col("lang") == "en").count() / docs.count()
    en_pick = sum(1 for r in rows if r["lang"] == "en") / 100
    assert en_pick > en_pool, (en_pick, en_pool)


def test_dsir_log_ratios_smoothing_exact(spark):
    """Hand-checked 2-bucket-touching fixture: ratios must equal the
    Laplace formula exactly (the oracle's value-exactness rests on
    both engines feeding ln() identical rationals)."""
    counts = spark.createDataFrame(
        [(1, 0, 3), (1, 1, 1), (2, 0, 2), (2, 2, 4)],
        "doc_id long, b long, c long",
    )
    target = spark.createDataFrame([(1,)], "doc_id long")
    B = 8
    lam = {r["b"]: r["lam"] for r in dsir_log_ratios(counts, "doc_id", target, B).collect()}
    tt, tr = 4.0, 10.0
    expect = {
        0: math.log((3 + 1) / (tt + B)) - math.log((5 + 1) / (tr + B)),
        1: math.log((1 + 1) / (tt + B)) - math.log((1 + 1) / (tr + B)),
        2: math.log((0 + 1) / (tt + B)) - math.log((4 + 1) / (tr + B)),
    }
    assert lam == pytest.approx(expect, abs=0.0)  # exact, not approx


def test_frozen_score_expr_matches_join_weights(spark, sf_dir):
    """dsir_score_expr (the zero-join frozen-model fold) must agree
    with the join-path dsir_logweights on the deterministic part of
    the key to within one rounding quantum (the fold sums per-gram in
    stream order, the join path per-bucket — same terms, different
    order), and unseen n-grams must score the smoothed unseen ratio,
    not 0."""
    import math

    from cdc_demo_spark.operators.importance import (
        dsir_score_expr,
        freeze_dsir_ratios,
    )
    from cdc_demo_spark.operators.sampling import uniform_from_id

    docs = load_table(spark, sf_dir, "documents").limit(120).localCheckpoint(eager=True)
    B = 256
    lam = freeze_dsir_ratios(
        docs, "text", "doc_id", F.col("lang") == "en", n_buckets=B
    )
    assert len(lam) == B
    key = dsir_score_expr(lam, "text", "doc_id")
    gumbel = -F.log(-F.log(uniform_from_id(F.col("doc_id"), "dsir_pick")))
    folded = {
        r["doc_id"]: r["w"]
        for r in docs.select("doc_id", (key - gumbel).alias("w")).collect()
    }
    joined = {
        r["doc_id"]: round(r["logweight_raw"], 6)
        for r in dsir_logweights(
            docs, "text", "doc_id", F.col("lang") == "en", n_buckets=B
        ).collect()
    }
    assert set(folded) == set(joined)
    for did in folded:
        assert abs(folded[did] - joined[did]) <= 1e-6, did

    # unseen-gram scoring: against a SPARSE model (2 docs, 4096
    # buckets — the probe's 3 grams land in never-populated buckets
    # with probability ~(1 - 9/4096)^3), a doc of never-seen words
    # folds to n_grams * ln((Tr+B)/(Tt+B)), not 0
    tiny = spark.createDataFrame(
        [(1, "aa bb cc", "en"), (2, "dd ee ff", "de")],
        "doc_id long, text string, lang string",
    )
    B2 = 4096
    lam2 = freeze_dsir_ratios(
        tiny, "text", "doc_id", F.col("lang") == "en", n_buckets=B2
    )
    tr, tt = 10.0, 5.0  # 5 grams per doc; target = doc 1
    unseen = math.log(tr + B2) - math.log(tt + B2)
    probe = spark.createDataFrame(
        [(999_999, "zzqx1 zzqx2")], "doc_id long, text string"
    )
    got = probe.select((dsir_score_expr(lam2, "text", "doc_id") + F.log(
        -F.log(uniform_from_id(F.col("doc_id"), "dsir_pick"))
    )).alias("w")).collect()[0]["w"]
    # 3 grams (2 unigrams + 1 bigram), all in unseen buckets
    assert abs(got - round(3 * unseen, 6)) <= 1e-6


def test_counts_artifact_path_matches_default(spark, sf_dir):
    """dsir_logweights(counts=<materialized artifact>) — the
    bucket-grain on-disk flow — must agree with the default gram-grain
    flow to within one rounding quantum (identical λ inputs; only the
    float summation grouping differs), with n_ngrams exactly equal."""
    docs = load_table(spark, sf_dir, "documents").limit(100).localCheckpoint(eager=True)
    counts = hashed_ngram_counts(docs, "text", "doc_id", 256)
    via_artifact = {
        r["doc_id"]: (r["n_ngrams"], round(r["logweight_raw"], 6))
        for r in dsir_logweights(
            docs, "text", "doc_id", F.col("lang") == "en",
            n_buckets=256, counts=counts,
        ).collect()
    }
    default = {
        r["doc_id"]: (r["n_ngrams"], round(r["logweight_raw"], 6))
        for r in dsir_logweights(
            docs, "text", "doc_id", F.col("lang") == "en", n_buckets=256
        ).collect()
    }
    assert set(via_artifact) == set(default)
    for did in default:
        assert via_artifact[did][0] == default[did][0], did
        assert abs(via_artifact[did][1] - default[did][1]) <= 1e-6, did


def test_dsir_model_ledger_incremental_equals_oneshot(spark, sf_dir, tmp_path):
    """DsirModelIndex (late r15): bucket counts merge by ADDITION over
    a disjoint batch split, so the ledger state — and the frozen λ
    list derived from it — must equal the one-shot fit over the union
    BIT-EXACTLY; a replayed epoch must skip; re-opening with different
    frozen parameters must refuse."""
    from cdc_demo_spark.operators.importance import (
        DsirModelIndex,
        freeze_dsir_ratios,
    )

    docs = load_table(spark, sf_dir, "documents").localCheckpoint(eager=True)
    idx = DsirModelIndex(spark, str(tmp_path / "dsir"), n_buckets=256)
    assert idx.append_batch(
        docs.filter(F.col("doc_id") < 250), "text", "doc_id",
        target_expr=F.col("lang") == "en", batch_id=0,
    )
    assert idx.append_batch(
        docs.filter(F.col("doc_id") >= 250), "text", "doc_id",
        target_expr=F.col("lang") == "en", batch_id=1,
    )
    # epoch replay: same batch_id skips before any build
    assert not idx.append_batch(
        docs.limit(10), "text", "doc_id",
        target_expr=F.col("lang") == "en", batch_id=1,
    )
    oneshot = freeze_dsir_ratios(
        docs, "text", "doc_id", F.col("lang") == "en", n_buckets=256
    )
    assert idx.freeze_ratios() == oneshot  # bit-exact, not approx
    # merged state equals the one-shot bucket census
    from cdc_demo_spark.operators.importance import _bucket_models

    want = {
        r["b"]: (r["cr"], r["ct"])
        for r in _bucket_models(
            docs, "text", "doc_id",
            docs.filter(F.col("lang") == "en").select("doc_id"), 256, "dsir_v1",
        ).collect()
    }
    got = {r["b"]: (r["cr"], r["ct"]) for r in idx.models().collect()}
    assert got == want
    # compaction preserves state; frozen-param mismatch refuses
    idx.compact()
    assert {r["b"]: (r["cr"], r["ct"]) for r in idx.models().collect()} == want
    with pytest.raises(ValueError):
        DsirModelIndex(spark, str(tmp_path / "dsir"), n_buckets=512)


def test_multi_target_matches_single_target_bit_exact(spark, sf_dir):
    """dsir_multi_logweights (r16): every lw_<name> column equals the
    single-target dsir_logweights(counts=...) output BIT-EXACTLY per
    target (same Laplace operands, same double math), n_ngrams
    matches, zero-gram docs score 0.0 toward every target, and the
    guards reject an empty dict and a non-identifier name."""
    from cdc_demo_spark.operators.importance import (
        dsir_logweights,
        dsir_multi_logweights,
        hashed_ngram_counts,
    )

    docs = load_table(spark, sf_dir, "documents")
    counts = hashed_ngram_counts(docs, "text", "doc_id").localCheckpoint(
        eager=True
    )
    targets = {
        "en": docs.filter(F.col("lang") == "en").select("doc_id"),
        "zh": docs.filter(F.col("lang") == "zh").select("doc_id"),
        "big": docs.filter(F.col("n_chars") > 400).select("doc_id"),
    }
    multi = {
        r["doc_id"]: r
        for r in dsir_multi_logweights(
            counts, "doc_id", targets, all_ids=docs.select("doc_id")
        ).collect()
    }
    assert len(multi) == docs.count()
    for name, ids in targets.items():
        single = {
            r["doc_id"]: r
            for r in dsir_logweights(
                docs, "text", "doc_id", target_ids=ids, counts=counts
            ).collect()
        }
        assert set(single) == set(multi)
        for d, s in single.items():
            assert s["n_ngrams"] == multi[d]["n_ngrams"], (name, d)
            assert s["logweight_raw"] == multi[d][f"lw_{name}"], (name, d)

    with pytest.raises(ValueError, match="empty"):
        dsir_multi_logweights(counts, "doc_id", {})
    with pytest.raises(ValueError, match="identifier"):
        dsir_multi_logweights(
            counts, "doc_id", {"bad name": targets["en"]}
        )


def test_hash_impl_xx_production_path(spark, sf_dir):
    """hash_impl='xx' (r16): the xxhash64 production bucket family is
    deterministic, preserves the hash-independent invariants (per-doc
    n_ngrams identical to md5 — the gram stream is the same, only the
    bucket label changes; model total cr equals the gram total), still
    separates the target from the pool, and rejects unknown names."""
    from cdc_demo_spark.operators.importance import (
        _bucket_models,
        dsir_logweights,
    )

    docs = load_table(spark, sf_dir, "documents")
    tgt = F.col("lang") == "en"
    md5_lw = {
        r["doc_id"]: r
        for r in dsir_logweights(docs, "text", "doc_id", tgt).collect()
    }
    xx_lw = {
        r["doc_id"]: r
        for r in dsir_logweights(
            docs, "text", "doc_id", tgt, hash_impl="xx"
        ).collect()
    }
    assert set(md5_lw) == set(xx_lw)
    for d in md5_lw:
        assert md5_lw[d]["n_ngrams"] == xx_lw[d]["n_ngrams"], d
    # determinism
    xx_again = {
        r["doc_id"]: r["logweight_raw"]
        for r in dsir_logweights(
            docs, "text", "doc_id", tgt, hash_impl="xx"
        ).collect()
    }
    assert xx_again == {d: r["logweight_raw"] for d, r in xx_lw.items()}
    # model mass conservation: total raw count == total gram count,
    # independent of the hash family
    tgt_ids = docs.filter(tgt).select("doc_id")
    tot = {
        impl: _bucket_models(docs, "text", "doc_id", tgt_ids, 512, "dsir_v1",
                             hash_impl=impl)
        .agg(F.sum("cr").alias("cr"), F.sum("ct").alias("ct")).collect()[0]
        for impl in ("md5", "xx")
    }
    assert tot["md5"]["cr"] == tot["xx"]["cr"] > 0
    assert tot["md5"]["ct"] == tot["xx"]["ct"] > 0
    # separation holds under xx too
    sep = {
        bool(r["is_t"]): r["m"]
        for r in dsir_logweights(docs, "text", "doc_id", tgt, hash_impl="xx")
        .join(docs.select("doc_id", "lang"), "doc_id")
        .groupBy((F.col("lang") == "en").alias("is_t"))
        .agg(F.avg("logweight_raw").alias("m"))
        .collect()
    }
    assert sep[True] > sep[False]
    with pytest.raises(ValueError, match="hash_impl"):
        dsir_logweights(
            docs, "text", "doc_id", tgt, hash_impl="sha9"
        ).collect()
