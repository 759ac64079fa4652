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
