"""Deterministic weighted sampling (A-ES): semantic properties that
substitute for the impossible DuckDB oracle."""

from __future__ import annotations

from pyspark.sql import functions as F

from cdc_demo_spark.operators.sampling import uniform_from_id, weighted_sample
from cdc_demo_spark.sources.tables import load_table


def test_uniform_weights_degenerate_to_unweighted(spark, sf_dir):
    """With all weights equal, the A-ES ranking is the plain md5-u
    ranking — the weighted sampler must pick exactly the unweighted
    md5 top-k."""
    docs = load_table(spark, sf_dir, "documents").withColumn("w", F.lit(1.0))
    got = {r["doc_id"] for r in weighted_sample(docs, "doc_id", "w", 50, "t").collect()}
    want = {
        r["doc_id"]
        for r in docs.withColumn("u", uniform_from_id(F.col("doc_id"), "t"))
        .orderBy(F.desc("u"))
        .limit(50)
        .collect()
    }
    assert got == want


def test_raising_a_members_weight_never_evicts_it(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    base = weighted_sample(docs, "doc_id", "n_chars", 40, "t2")
    member = base.collect()[20]["doc_id"]
    boosted = docs.withColumn(
        "w",
        F.when(F.col("doc_id") == member, F.col("n_chars") * 100).otherwise(
            F.col("n_chars")
        ),
    )
    got = {r["doc_id"] for r in weighted_sample(boosted, "doc_id", "w", 40, "t2").collect()}
    assert member in got


def test_nonpositive_weights_never_sample(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").withColumn(
        "w", F.when(F.col("doc_id") % 2 == 0, F.lit(-1.0)).otherwise(F.lit(0.0))
    )
    half = docs.withColumn(
        "w",
        F.when(F.col("doc_id") < 100, F.col("n_chars").cast("double")).otherwise(
            F.col("w")
        ),
    )
    rows = weighted_sample(half, "doc_id", "w", 500, "t3").collect()
    assert rows and all(r["doc_id"] < 100 for r in rows)


def test_sample_is_deterministic_and_salt_sensitive(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    a = [r["doc_id"] for r in weighted_sample(docs, "doc_id", "n_chars", 30, "s1").collect()]
    b = [r["doc_id"] for r in weighted_sample(docs, "doc_id", "n_chars", 30, "s1").collect()]
    c = {r["doc_id"] for r in weighted_sample(docs, "doc_id", "n_chars", 30, "s2").collect()}
    assert a == b
    assert set(a) != c


def test_heavier_docs_oversampled(spark, sf_dir):
    """Rough proportionality: sample 150 of 500 by n_chars weight —
    the sampled mean n_chars must exceed the corpus mean (heavier docs
    win their races more often)."""
    docs = load_table(spark, sf_dir, "documents")
    corpus_mean = docs.agg(F.avg("n_chars")).collect()[0][0]
    sample_mean = (
        weighted_sample(docs, "doc_id", "n_chars", 150, "t4")
        .agg(F.avg("n_chars"))
        .collect()[0][0]
    )
    assert sample_mean > corpus_mean


def test_temperature_mixture_flattens_the_skew(spark, sf_dir):
    """q_mixture_temperature (r15): alpha=0.5 must flatten the lang
    skew — the dominant stratum's keep-RATE is strictly below a tail
    stratum's (that's what temperature sampling is for) — while every
    derived threshold is a pure function of the counts (deterministic
    across runs) and the kept sets are salt-versioned subsets."""
    from cdc_demo_spark.queries.registry import QUERIES

    rows = {r["lang"]: r for r in
            QUERIES["q_mixture_temperature"](spark, sf_dir).collect()}
    assert set(rows) == {"de", "en", "es", "fr", "zh"}
    # counts for rate computation
    from cdc_demo_spark.sources.tables import load_table
    from pyspark.sql import functions as F

    counts = {r["lang"]: r["n"] for r in
              load_table(spark, sf_dir, "documents")
              .groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    rate = {g: rows[g]["n_kept"] / counts[g] for g in rows}
    # en dominates the corpus -> lowest keep-rate under alpha<1
    assert rate["en"] == min(rate.values())
    assert all(rate["en"] < rate[g] for g in rows if g != "en")
    # deterministic re-run
    again = {r["lang"]: r["n_kept"] for r in
             QUERIES["q_mixture_temperature"](spark, sf_dir).collect()}
    assert again == {g: rows[g]["n_kept"] for g in rows}


def test_epoch_mixture_exercises_both_regimes(spark, sf_dir):
    """q_mixture_epochs (r15): the with-replacement schedule must put
    the dominant lang in the downsample regime (k_full=0, some docs
    unsampled) and tail langs in the REPEAT regime (k_full>=1, every
    doc sampled, instances > docs), with each stratum's instance total
    equal to k_full*n + fractional draws — the exact budget the
    integer thresholds encode."""
    from cdc_demo_spark.queries.registry import QUERIES

    rows = {r["lang"]: r for r in
            QUERIES["q_mixture_epochs"](spark, sf_dir).collect()}
    en = rows["en"]
    assert en["k_full"] == 0
    assert en["n_sampled_docs"] < en["n_docs"]
    assert en["total_instances"] == en["n_sampled_docs"]
    for g, r in rows.items():
        if g == "en":
            continue
        assert r["k_full"] >= 1, g
        assert r["n_sampled_docs"] == r["n_docs"], g  # every doc appears
        assert r["total_instances"] > r["n_docs"], g  # repetition regime
        extra = r["total_instances"] - r["k_full"] * r["n_docs"]
        assert 0 <= extra <= r["n_docs"], g
