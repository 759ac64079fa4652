"""The synthetic document corpus behind the 200k-doc MinHash bench
entries (sources/synth_docs.py) — the text twin of synth_vectors.

Contracts:
- bit-determinism across partitioning (the corpus is a pure function
  of (seed, doc_id), so batch boundaries can never change content);
- the planted ground truth is REAL: every planted pair's exact
  shingle-Jaccard clears the 0.5 LSH threshold, and background pairs
  essentially never do (so bench recall is measurable without a
  quadratic scan);
- the production minhash_near_duplicates pipeline recovers the
  planted pairs at a 5k grain with zero false positives.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from cdc_demo_spark.operators.dedup import minhash_near_duplicates
from cdc_demo_spark.sources.synth_docs import planted_doc_pairs, synth_documents


def test_corpus_deterministic_across_partitioning(spark):
    a = synth_documents(spark, 1500, parts=32)
    b = synth_documents(spark, 1500, parts=7)

    def digest(df):
        return (
            df.orderBy("doc_id")
            .select(F.md5(F.concat_ws("\x01", "doc_id", "text")).alias("h"))
            .agg(F.md5(F.concat_ws("", F.collect_list("h"))).alias("d"))
            .collect()[0]["d"]
        )

    assert digest(a) == digest(b)


def test_start_offset_is_a_window_not_a_reseed(spark):
    """synth_documents(n, start=s) must emit the SAME rows ids s..s+n
    get in a larger corpus — the index-append bench depends on the
    delta being a true continuation (its planted dups reference base
    ids by value)."""
    full = {
        r["doc_id"]: r["text"]
        for r in synth_documents(spark, 600).filter(F.col("doc_id") >= 400).collect()
    }
    window = {
        r["doc_id"]: r["text"]
        for r in synth_documents(spark, 200, start=400).collect()
    }
    assert window == full


def test_planted_pairs_clear_threshold_background_does_not(spark):
    n = 3000
    docs = synth_documents(spark, n).cache()
    sh = docs.select(
        "doc_id",
        F.array_distinct(
            F.transform(
                F.expr("transform(sequence(1, size(split(text,' '))-2), "
                       "i -> concat_ws(' ', slice(split(text,' '), i, 3)))"),
                lambda s: F.xxhash64(s),
            )
        ).alias("hs"),
    )
    a = sh.select(F.col("doc_id").alias("id_a"), F.col("hs").alias("hs_a"))
    b = sh.select(F.col("doc_id").alias("id_b"), F.col("hs").alias("hs_b"))
    planted = planted_doc_pairs(n)
    pdf = spark.createDataFrame(planted, "id_a long, id_b long")
    jac = (
        pdf.join(a, "id_a").join(b, "id_b")
        .select(
            (F.size(F.array_intersect("hs_a", "hs_b"))
             / F.size(F.array_union("hs_a", "hs_b"))).alias("j")
        )
        .agg(F.min("j").alias("jmin"), F.avg("j").alias("javg"))
        .collect()[0]
    )
    assert jac["jmin"] >= 0.5, f"planted pair below LSH threshold: {jac['jmin']}"
    assert jac["javg"] >= 0.75
    # (i, i+2) pairs are never planted (plants are adjacent): background
    bg = spark.createDataFrame(
        [(i, i + 2) for i in range(0, 200, 2)], "id_a long, id_b long"
    )
    bgmax = (
        bg.join(a, "id_a").join(b, "id_b")
        .select(
            (F.size(F.array_intersect("hs_a", "hs_b"))
             / F.size(F.array_union("hs_a", "hs_b"))).alias("j")
        )
        .agg(F.max("j").alias("jmax"))
        .collect()[0]["jmax"]
    )
    assert bgmax < 0.1, f"background Jaccard too high: {bgmax}"


def test_minhash_pipeline_recovers_planted_pairs_5k(spark):
    n = 5000
    docs = synth_documents(spark, n).cache()
    got = {
        (r["id_a"], r["id_b"])
        for r in minhash_near_duplicates(
            docs, "doc_id", "text", k=3, threshold=0.5
        ).collect()
    }
    planted = set(planted_doc_pairs(n))
    recall = len(got & planted) / len(planted)
    assert recall >= 0.99, f"planted recall {recall:.4f}"
    # verification is exact Jaccard — anything extra means the corpus
    # generator's background collided, a bug not noise
    assert not (got - planted), sorted(got - planted)[:5]
