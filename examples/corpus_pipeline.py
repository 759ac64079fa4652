#!/usr/bin/env python
"""End-to-end training-corpus preparation on the engine — the pipeline
a 100 TB pretraining-data run executes, demonstrated at sf scale:

    documents
      1. quality gate      (token count, repetition ratio, stopword mix)
      1b. perplexity gate  (corpus-own bigram LM — drop the worst 5%)
      1c. rule->model distillation (train the fastText-shaped quality
          classifier on the gate's verdicts; assert it learned)
      2. exact dedup       (digest groupBy — min-id survivor)
      3. near-dup clusters (Jaccard pairs -> connected components)
      3b. decontamination  (drop docs overlapping the held-out eval set)
      3b2. passage dedup   (duplicated-span keep-one removal)
      3c. weighted selection (A-ES race on n_chars — quality-weighted
          corpus cap, deterministic across cluster sizes)
      4. chunk             (64-token windows, stride 48)
      5. pack              (256-token training blocks per source shard)
      6. deterministic sample (md5-threshold, resumable on any cluster)
      6b. training shards  (md5 epoch-salted 16-way shard assignment)
      7. write parquet partitioned by shard + a one-line corpus report
      8. tokenizer artifact (BPE merge table trained on the final
         survivors, lossless re-tokenization asserted, shipped parquet)

Run: python examples/corpus_pipeline.py [sf_dir] [out_dir]
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from cdc_demo_spark.operators.chunking import chunk_documents
from cdc_demo_spark.operators.dedup import exact_dedup, jaccard_pairs
from cdc_demo_spark.operators.graph import connected_components
from cdc_demo_spark.operators.packing import pack_chunks
from cdc_demo_spark.session import get_spark
from cdc_demo_spark.sources.tables import load_table


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out = sys.argv[2] if len(sys.argv) > 2 else tempfile.mkdtemp(prefix="corpus_")
    spark = get_spark("corpus-pipeline")
    spark.sparkContext.setLogLevel("ERROR")

    docs = load_table(spark, sf_dir, "documents")
    n0 = docs.count()

    # 1. quality gate — pure codegen projections, no shuffle
    toks = F.split("text", " ")
    total_bigrams = F.size(toks) - 1
    from cdc_demo_spark.operators.dedup import shingle_array

    rep_ratio = F.lit(1.0) - F.size(shingle_array(F.col("text"), 2)).cast(
        "double"
    ) / F.nullif(total_bigrams, F.lit(0))
    quality = docs.filter(
        (F.size(toks) >= 20) & (F.coalesce(rep_ratio, F.lit(0.0)) <= 0.6)
    )
    n1 = quality.count()

    # 1b. perplexity filter (r10): score every survivor under the
    # corpus's OWN add-k bigram LM and drop the most-surprising 5% —
    # the CCNet/KenLM-shaped gate that catches gibberish and
    # wrong-register text the rule gate can't
    from cdc_demo_spark.operators.text import bigram_perplexity

    ppl = bigram_perplexity(quality).localCheckpoint(eager=True)
    ppl_cut = ppl.approxQuantile("ppl", [0.95], 0.0)[0]
    keep_ids = ppl.filter(F.col("ppl") <= ppl_cut).select(
        F.col("id").alias("doc_id")
    )
    quality = quality.join(keep_ids, "doc_id", "left_semi").localCheckpoint(
        eager=True
    )
    n1b = quality.count()

    # 1c. rule -> model distillation (r10): train the fastText-shaped
    # quality classifier against the rule gate's own verdicts (exactly
    # CCNet's move: distill a cheap ruleset into a model that
    # generalizes past it), then assert the model actually separates
    # the classes it was taught — a quality model whose loss never
    # moved is a pipeline bug
    from cdc_demo_spark.operators.quality_model import (
        hashed_presence_features,
        score_documents,
        train_logreg,
    )

    labeled = docs.select(
        F.col("doc_id").alias("id"),
        (
            (F.size(F.split("text", " ")) >= 20)
            & (F.coalesce(rep_ratio, F.lit(0.0)) <= 0.6)
        ).cast("double").alias("y"),
    )
    model = train_logreg(
        hashed_presence_features(docs), labeled, lr=0.5, iterations=8
    )
    losses = [h["loss"] for h in model.history]
    assert losses[-1] < losses[0], "quality model failed to learn the gate"
    sep = (
        score_documents(docs, model)
        .join(labeled, "id")
        .groupBy("y")
        .agg(F.avg("p").alias("m"))
        .collect()
    )
    means = {r["y"]: r["m"] for r in sep}
    model_gap = means.get(1.0, 0.0) - means.get(0.0, 1.0)

    # 2. exact dedup on normalized text digest.  Each stage below is
    # pinned (localCheckpoint eager) before its count: the counts exist
    # for the report, and without pins every count() re-executes the
    # whole upstream chain — ~5 redundant stage recomputes end-to-end
    # (the span stage learned this first; now uniform).
    exact = exact_dedup(quality, ["text"], "doc_id").localCheckpoint(eager=True)
    n2 = exact.count()

    # 3. near-dup clusters -> keep min-id survivor per cluster
    pairs = jaccard_pairs(exact, "doc_id", "text", k=3, threshold=0.5, df_cap=100)
    comps = connected_components(
        exact.select("doc_id"), pairs, id_col="doc_id", src_col="id_a", dst_col="id_b"
    )
    survivors = exact.join(
        comps.filter(F.col("doc_id") == F.col("component")).select("doc_id"),
        "doc_id",
        "left_semi",
    ).localCheckpoint(eager=True)
    n3 = survivors.count()

    # 3b. decontamination: every 50th doc stands in for the eval set;
    # survivors sharing >=20% of their 3-gram shingles with it are
    # quarantined (the eval docs themselves never enter the corpus)
    from cdc_demo_spark.operators.dedup import benchmark_contamination

    bench = docs.filter(F.col("doc_id") % 50 == 0)
    survivors = survivors.join(bench.select("doc_id"), "doc_id", "left_anti")
    contam = benchmark_contamination(survivors, bench, "doc_id", "text", k=3)
    clean_ids = contam.filter(F.col("contamination") < 0.2).select(
        F.col("id").alias("doc_id")
    )
    survivors = survivors.join(clean_ids, "doc_id", "left_semi").localCheckpoint(
        eager=True
    )
    n3b = survivors.count()

    # 3b2. passage-level dedup: cut duplicated 5-gram passages that
    # survive doc-level dedup (shared boilerplate headers/footers),
    # keeping each passage's globally-first occurrence (Lee et al.
    # ACL'22 keep-one policy; operators/spans.py)
    from cdc_demo_spark.operators.spans import remove_duplicated_spans

    removed = remove_duplicated_spans(
        survivors, "doc_id", "text", n=5
    ).localCheckpoint(eager=True)  # two wide gram shuffles; pin once,
    # every downstream count/write reads the result, not the plan
    n_spans_cut = removed.agg(F.sum("n_removed")).collect()[0][0] or 0
    cleaned = removed.filter(F.length("clean_text") > 0)
    survivors = (
        survivors.drop("text", "n_chars")
        .join(cleaned.select(F.col("id").alias("doc_id"),
                             F.col("clean_text").alias("text")), "doc_id")
        .withColumn("n_chars", F.length("text"))
    ).localCheckpoint(eager=True)
    n3b2 = survivors.count()

    # 3c. quality-weighted corpus cap: keep 90%, racing on n_chars so
    # longer documents win proportionally more often (deterministic
    # A-ES — same survivors on any cluster size or rerun)
    from cdc_demo_spark.operators.sampling import weighted_sample

    survivors = (
        weighted_sample(
            survivors, "doc_id", "n_chars", k=max(1, int(n3b2 * 0.9)), salt="corpus_v1"
        )
        .drop("_key")
        .localCheckpoint(eager=True)
    )
    n3c = survivors.count()

    # 4-5. chunk + pack into training blocks
    chunks = chunk_documents(survivors, chunk_tokens=64, stride=48).join(
        survivors.select("doc_id", F.col("source").alias("group")), "doc_id"
    )
    blocks = pack_chunks(chunks, "group", block_tokens=256).localCheckpoint(eager=True)
    n_blocks = blocks.count()

    # 6. deterministic 30% sample of blocks (resumable across runs/clusters)
    sampled = blocks.filter(
        F.substring(F.md5(F.concat_ws("|", "group", "block_id")), 1, 8) < "4ccccccc"
    )
    n_sampled = sampled.count()

    # 6b-7. assign epoch-salted training shards, write partitioned by
    # shard (each shard is one training-order slice; re-salt = reshuffle)
    sharded = sampled.withColumn(
        "shard",
        F.substring(
            F.md5(F.concat_ws("|", F.lit("epoch0"), "group", "block_id")), 1, 1
        ),
    )
    sharded.withColumn(
        "doc_ids", F.concat_ws(",", F.transform("doc_ids", lambda x: x.cast("string")))
    ).write.mode("overwrite").partitionBy("shard").parquet(os.path.join(out, "blocks"))

    # 8. tokenizer artifact (r10): train a BPE merge table on the FINAL
    # survivors (the vocabulary the model will actually see), verify it
    # re-tokenizes losslessly, and ship it next to the blocks
    from cdc_demo_spark.operators.bpe import bpe_tokenize, train_bpe

    merges_df = train_bpe(survivors, "text", n_merges=16)
    merges = [(r["lhs"], r["rhs"]) for r in merges_df.collect()]
    tokenized = bpe_tokenize(survivors.limit(20), "text", merges)
    for r in tokenized.select("text", "tokens").collect():
        assert "".join(r["tokens"]) == r["text"].replace(" ", ""), "tokenizer lossy"
    merges_df.write.mode("overwrite").parquet(os.path.join(out, "tokenizer_merges"))

    gap_txt = f"{model_gap:.3f}" if 0.0 in means and 1.0 in means else "n/a (one class)"
    print(
        f"corpus: {n0} docs -> quality {n1} -> ppl-gate {n1b} "
        f"(cut at ppl {ppl_cut:.1f}) -> exact-dedup {n2} -> "
        f"near-dup survivors {n3} -> decontaminated {n3b} -> "
        f"span-dedup {n3b2} (cut {n_spans_cut} tokens) -> "
        f"weighted-cap {n3c} -> {n_blocks} blocks -> sampled {n_sampled} "
        f"-> {out}/blocks (16-way sharded); distilled quality model "
        f"class gap {gap_txt}; tokenizer: {len(merges)} merges shipped"
    )


if __name__ == "__main__":
    main()
