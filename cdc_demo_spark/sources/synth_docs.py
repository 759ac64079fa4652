"""Deterministic synthetic document corpora for mid-scale text-dedup
probes — the text-side twin of :mod:`synth_vectors`.

The driver's ``documents`` fixture is 500 rows at every sf
(TESTDATA.md), so the MinHash/SimHash/LSH stack — like the vector
stack before round 7 — had correct designs but no measured point
above toy size.  Same design rules as the vector generator:

- **pure function of (seed, doc_id)**: tokens come from splitmix64
  mixes, so the corpus is bit-identical under any partitioning and
  any batch boundary;
- **planted ground truth**: every ``dup_every``-th document is its
  predecessor with ~3% of token positions substituted.  At shingle
  k=3, three token edits in a ~50-300-token document kill at most
  9 shingles, so the planted pair's shingle-Jaccard sits ≈0.8-0.95 —
  comfortably above the 0.5 LSH threshold, while unrelated documents
  over a 50k-word vocabulary share essentially no shingles.  Recall
  is therefore measurable with NO quadratic reference scan.

The emitted schema mirrors the driver's documents table
(doc_id, text, lang, source, n_chars) so the same operators and
queries run unchanged.
"""

from __future__ import annotations

import os
import shutil
import tempfile
import uuid

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from cdc_demo_spark.sources.synth_vectors import _mix64

VOCAB = 50_000
MAX_TOKENS = 304
MIN_TOKENS = 50


def _token_matrix(ids: np.ndarray, seed: int) -> tuple[np.ndarray, np.ndarray]:
    """(tok int64[n, MAX_TOKENS], length int64[n]) for base documents."""
    salt = np.uint64((seed * 0x9E3779B97F4A7C15) % (1 << 64))
    cols = np.arange(MAX_TOKENS, dtype=np.uint64)[None, :]
    with np.errstate(over="ignore"):
        tok = (
            _mix64(ids[:, None] * np.uint64(MAX_TOKENS) + cols + salt)
            % np.uint64(VOCAB)
        ).astype(np.int64)
        length = (
            MIN_TOKENS
            + (_mix64(ids + salt + np.uint64(17)) % np.uint64(MAX_TOKENS - MIN_TOKENS))
        ).astype(np.int64)
    return tok, length


def _docs_for_ids(
    ids: np.ndarray, seed: int, dup_every: int, sub_every: int = 33
) -> list[str]:
    """Deterministic token text per id; planted near-dups copy the
    predecessor's tokens with ~1/sub_every positions substituted."""
    ids = ids.astype(np.uint64)
    if dup_every == 1:
        # every doc would copy its predecessor's BASE tokens while the
        # predecessor's own text is itself substituted — chained copies
        # would make planted_doc_pairs a false oracle
        raise ValueError("dup_every=1 (chained copies) is not supported")
    if dup_every > 0:
        is_dup = (ids % np.uint64(dup_every) == np.uint64(dup_every - 1)) & (ids > 0)
        base_id = np.where(is_dup, ids - np.uint64(1), ids)
    else:
        is_dup = np.zeros(len(ids), dtype=bool)
        base_id = ids
    tok, length = _token_matrix(base_id, seed)
    if is_dup.any():
        salt = np.uint64((seed * 0xD6E8FEB86659FD93 + 7) % (1 << 64))
        cols = np.arange(MAX_TOKENS, dtype=np.uint64)[None, :]
        with np.errstate(over="ignore"):
            h = _mix64(ids[is_dup][:, None] * np.uint64(MAX_TOKENS) + cols + salt)
            subs = (h % np.uint64(sub_every)) == 0
            repl = ((h >> np.uint64(8)) % np.uint64(VOCAB)).astype(np.int64)
        t = tok[is_dup]
        t[subs] = repl[subs]
        tok[is_dup] = t
    return [
        " ".join(f"w{v}" for v in tok[i, : length[i]]) for i in range(len(ids))
    ]


def synth_documents(
    spark: SparkSession,
    n: int,
    seed: int = 11,
    dup_every: int = 50,
    parts: int = 32,
    start: int = 0,
) -> DataFrame:
    """(doc_id, text, lang, source, n_chars) — n deterministic docs
    with planted near-duplicate pairs (doc_id k·dup_every-1 ≈ its
    predecessor at shingle-Jaccard ≈0.8-0.95)."""

    def gen(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            ids = pdf["id"].to_numpy()
            texts = _docs_for_ids(ids, seed, dup_every)
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "text": texts,
                    "lang": ["en"] * len(ids),
                    "source": ["synth"] * len(ids),
                    "n_chars": [len(t) for t in texts],
                }
            )

    return spark.range(start, start + n, numPartitions=parts).mapInPandas(
        gen, schema="doc_id long, text string, lang string, source string, n_chars long"
    )


def planted_doc_pairs(n: int, dup_every: int = 50) -> list[tuple[int, int]]:
    return [(i - 1, i) for i in range(dup_every - 1, n, dup_every) if i >= 1]


def ensure_synth_docs(
    spark: SparkSession, n: int, seed: int = 11, dup_every: int = 50
) -> str:
    """Generate-once parquet cache (same publish protocol as the
    vector corpus)."""
    tag = f"n{n}_s{seed}_e{dup_every}"
    path = os.path.join(tempfile.gettempdir(), f"spark_graft_synthdoc_v1_{tag}")
    if os.path.exists(os.path.join(path, "_SUCCESS")):
        return path
    stage = f"{path}.build-{uuid.uuid4().hex[:8]}"
    synth_documents(spark, n, seed, dup_every).write.mode("overwrite").parquet(stage)
    try:
        os.rename(stage, path)
    except OSError:
        if not os.path.exists(os.path.join(path, "_SUCCESS")):
            raise
        shutil.rmtree(stage, ignore_errors=True)
    return path
