"""Sequence packing: assemble token chunks into fixed-budget training
blocks (the step after chunking — fill each context window as full as
possible without splitting chunks).

Greedy packing is inherently sequential, so it runs per GROUP via
``applyInPandas``: each group (a source shard, or a hash bucket of
doc_id) packs independently on one worker, all groups in parallel.
That bounds the sequential span at group size while keeping global
throughput linear — the standard way to parallelize an order-dependent
fold on Spark. Group contents sort by (doc_id, chunk_id) first, so the
result is deterministic regardless of upstream partitioning.

Within a group the fold is vectorized: block boundaries come from
``searchsorted`` over the token cumsum (each block is the maximal
prefix of remaining chunks whose sum fits the budget, minimum one
chunk), so the Python loop runs once per BLOCK, not once per row.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame

OUT_SCHEMA = (
    "group string, block_id long, n_chunks long, total_tokens long, doc_ids array<long>"
)

SEGMENTS_SCHEMA = OUT_SCHEMA + (
    ", seg_doc_ids array<long>, seg_chunk_ids array<long>"
    ", seg_tokens array<long>, seg_offsets array<long>"
)


def pack_chunks(
    chunks: DataFrame,
    group_col: str = "group",
    block_tokens: int = 256,
    strategy: str = "greedy",
    emit_segments: bool = False,
) -> DataFrame:
    """Pack (doc_id, chunk_id, n_tokens) rows into blocks of at most
    `block_tokens` per group. A chunk larger than the budget gets its
    own block (never split, never dropped).

    ``strategy``:

    - ``"greedy"`` (default, the oracle-replayed reference): chunks in
      (doc_id, chunk_id) order, each block the maximal prefix that
      fits — keeps a document's chunks adjacent, at the cost of waste
      wherever a partial tail chunk lands between full ones.
    - ``"nfd"`` (next-fit decreasing): same vectorized prefix fill
      over chunks sorted by n_tokens DESC (ties broken by
      (doc_id, chunk_id), so the result is deterministic).  Full-size
      chunks pack wall-to-wall and the short tails clump together,
      which TYPICALLY reduces padding waste for chunking-shaped size
      distributions (many equal full-size chunks + short tails — the
      shape chunk_documents emits; measured 0.8906→0.9872 fill at the
      200k bench fixture).  It is NOT a universal guarantee: next-fit
      never reopens a block, so decreasing order can pack WORSE than
      in-order when the budget sits near the chunk size — budget 10
      with in-order chunks [5,5,6,4] packs 2 blocks ([5,5],[6,4]) but
      NFD's [6,5,5,4] packs 3 ([6],[5,5],[4]); pinned in
      tests/test_corpus_pipeline.py.  Use when block composition order
      doesn't matter — training blocks get shuffled anyway
      (q_epoch_shuffle) — and read the ledger's pack.efficiency to
      confirm the win on your corpus.

    Both strategies conserve tokens exactly and never split a chunk;
    the choice changes COMPOSITION, not the census.

    ``emit_segments=True`` additionally returns each block's ordered
    SEGMENT LAYOUT — ``seg_doc_ids`` / ``seg_chunk_ids`` /
    ``seg_tokens`` / ``seg_offsets`` arrays in pack order, where
    ``seg_offsets[i]`` is segment i's start position within the block
    (exclusive prefix sum of seg_tokens) — the metadata a trainer
    needs to build block-diagonal attention masks and reset position
    ids at document boundaries when multiple packed documents share
    one context window (standard packed-pretraining practice; without
    it tokens attend across unrelated documents).  Costs only the
    extra array columns: the fold already has every slice."""
    if strategy not in ("greedy", "nfd"):
        raise ValueError(f"unknown strategy {strategy!r}; expected 'greedy' or 'nfd'")

    schema = SEGMENTS_SCHEMA if emit_segments else OUT_SCHEMA
    cols = ["group", "block_id", "n_chunks", "total_tokens", "doc_ids"]
    if emit_segments:
        cols += ["seg_doc_ids", "seg_chunk_ids", "seg_tokens", "seg_offsets"]

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        if strategy == "nfd":
            pdf = pdf.sort_values(
                ["n_tokens", "doc_id", "chunk_id"],
                ascending=[False, True, True],
            )
        else:
            pdf = pdf.sort_values(["doc_id", "chunk_id"])
        group = pdf[group_col].iloc[0]
        tokens = pdf["n_tokens"].to_numpy(dtype="int64")
        doc_ids = pdf["doc_id"].to_numpy(dtype="int64")
        chunk_ids = pdf["chunk_id"].to_numpy(dtype="int64")
        csum = np.cumsum(tokens)
        n = len(tokens)

        blocks, start, block_id = [], 0, 0
        while start < n:
            prev = int(csum[start - 1]) if start else 0
            # maximal prefix with sum <= budget; >= 1 chunk (oversized
            # chunk gets its own block, matching "never split/dropped")
            end = int(np.searchsorted(csum, prev + block_tokens, side="right"))
            if end <= start:
                end = start + 1
            row = {
                "group": group,
                "block_id": block_id,
                "n_chunks": end - start,
                "total_tokens": int(csum[end - 1]) - prev,
                "doc_ids": sorted(set(doc_ids[start:end].tolist())),
            }
            if emit_segments:
                seg_tok = tokens[start:end]
                row["seg_doc_ids"] = doc_ids[start:end].tolist()
                row["seg_chunk_ids"] = chunk_ids[start:end].tolist()
                row["seg_tokens"] = seg_tok.tolist()
                row["seg_offsets"] = (csum[start:end] - seg_tok - prev).tolist()
            blocks.append(row)
            block_id += 1
            start = end
        return pd.DataFrame(blocks, columns=cols)

    return chunks.groupBy(group_col).applyInPandas(pack, schema=schema)
