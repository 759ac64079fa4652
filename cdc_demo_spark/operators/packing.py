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
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame

OUT_SCHEMA = (
    "group string, block_id long, n_chunks long, total_tokens long, doc_ids array<long>"
)


def pack_chunks(
    chunks: DataFrame,
    group_col: str = "group",
    block_tokens: int = 256,
) -> DataFrame:
    """Pack (doc_id, chunk_id, n_tokens) rows into blocks of at most
    `block_tokens` per group. A chunk larger than the budget gets its
    own block (never split, never dropped)."""

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["doc_id", "chunk_id"])
        group = pdf[group_col].iloc[0]
        blocks, cur_docs, cur_tokens, block_id = [], [], 0, 0

        def flush():
            nonlocal cur_docs, cur_tokens, block_id
            if cur_docs:
                blocks.append(
                    {"group": group, "block_id": block_id, "n_chunks": len(cur_docs),
                     "total_tokens": cur_tokens, "doc_ids": sorted(set(cur_docs))}
                )
                block_id += 1
                cur_docs, cur_tokens = [], 0

        for _, r in pdf.iterrows():
            t = int(r["n_tokens"])
            if cur_tokens + t > block_tokens and cur_docs:
                flush()
            cur_docs.append(int(r["doc_id"]))
            cur_tokens += t
            if cur_tokens >= block_tokens:
                flush()
        flush()
        return pd.DataFrame(blocks, columns=["group", "block_id", "n_chunks",
                                             "total_tokens", "doc_ids"])

    return chunks.groupBy(group_col).applyInPandas(pack, schema=OUT_SCHEMA)
