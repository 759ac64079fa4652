#!/usr/bin/env python
"""DSIR domain-targeted data selection, on one page: score a raw
multilingual pool against a target domain, select the target-like
half, and keep the model INCREMENTAL so streaming epochs never refit
the corpus (Xie et al., NeurIPS 2023 — operators/importance.py).

    documents
      1. dsir_logweights       per-doc importance log-weights toward
                               the en slice (two gram-grain passes,
                               bounded aggregates)
      2. dsir_resample         top-k Gumbel-max selection — the
                               deterministic without-replacement draw
      3. DsirModelIndex        the SAME model as an additive ledger:
                               two batch appends == the one-shot fit
                               bit-exactly (asserted)
      4. freeze_ratios + dsir_keep_expr
                               the streaming shape: a frozen λ list +
                               threshold turns selection into one
                               map-side predicate

Run: python examples/dsir_selection.py [sf_dir] [work_dir]
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from cdc_demo_spark.operators.importance import (
    DsirModelIndex,
    dsir_keep_expr,
    dsir_logweights,
    dsir_resample,
    dsir_score_expr,
    freeze_dsir_ratios,
)
from cdc_demo_spark.session import get_spark
from cdc_demo_spark.sources.tables import load_table


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    work = sys.argv[2] if len(sys.argv) > 2 else tempfile.mkdtemp(prefix="dsir_")
    spark = get_spark()
    docs = load_table(spark, sf_dir, "documents").localCheckpoint(eager=True)
    target = F.col("lang") == "en"
    n = docs.count()

    # 1. score
    lw = dsir_logweights(docs, "text", "doc_id", target).localCheckpoint(eager=True)

    # 2. select the target-like half
    k = n // 2
    picked = dsir_resample(docs, "text", "doc_id", target, k=k, logweights=lw)
    en_pool = docs.filter(target).count() / n
    rows = picked.select("doc_id", "lang").collect()
    en_pick = sum(1 for r in rows if r["lang"] == "en") / k
    assert en_pick > en_pool, (en_pick, en_pool)
    print(f"selection: {k}/{n} docs, en share {en_pool:.3f} -> {en_pick:.3f}")

    # 3. the incremental model: two disjoint epochs == one-shot
    idx = DsirModelIndex(spark, os.path.join(work, "model"), n_buckets=256)
    mid = sorted(r["doc_id"] for r in docs.select("doc_id").collect())[n // 2]
    idx.append_batch(docs.filter(F.col("doc_id") < mid), "text", "doc_id",
                     target_expr=target, batch_id=0)
    idx.append_batch(docs.filter(F.col("doc_id") >= mid), "text", "doc_id",
                     target_expr=target, batch_id=1)
    lam = idx.freeze_ratios()
    assert lam == freeze_dsir_ratios(docs, "text", "doc_id", target, n_buckets=256)
    print("incremental model == one-shot asserted (bit-exact lambda list)")

    # 4. streaming shape: frozen (model, threshold) as one predicate
    keys = sorted(
        r["s"] for r in docs.select(
            dsir_score_expr(lam, "text", "doc_id").alias("s")
        ).collect()
    )
    threshold = keys[len(keys) // 2]
    kept = docs.filter(dsir_keep_expr(lam, threshold, "text", "doc_id")).count()
    assert 0 < kept < n
    print(f"frozen-threshold keep: {kept}/{n} docs clear the epoch cutoff")


if __name__ == "__main__":
    main()
