"""Document chunking (training-data pipeline): split each document into
overlapping token-window chunks, one output row per chunk.

Pure codegen expressions (sequence → transform → slice → explode): no
shuffle, no Python; output size is ~n_tokens/stride rows per doc. This
is the preprocessing shape for context-window-bounded training corpora:
chunk → dedup (operators/dedup.py) → embed (operators/multimodal.py
pipeline shape) → pack.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def chunk_starts(n: Column, chunk_tokens: int, stride: int) -> Column:
    """0-based window start offsets for a doc of ``n`` token slots —
    THE chunk-boundary formula (0, stride, 2*stride, ... while
    start < n; the final partial window kept; >= 1 window even for
    empty docs).  Shared by chunk_documents and the token-id encode
    (operators/bpe.encode_chunked_corpus_ids) so the two can never
    disagree on where a chunk begins."""
    n_chunks = F.greatest(
        F.ceil((n - F.lit(chunk_tokens)) / F.lit(stride)) + 1, F.lit(1)
    )
    return F.transform(
        F.sequence(F.lit(0), n_chunks.cast("int") - 1), lambda i: i * stride
    )


def chunk_documents(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_tokens: int = 64,
    stride: int = 48,
    with_text: bool = True,
) -> DataFrame:
    """(id, chunk_id, chunk_text, n_tokens) — windows of `chunk_tokens`
    tokens every `stride` (overlap = chunk_tokens - stride). The final
    partial window is kept (last chunk may be short but never empty).

    ``with_text=False`` omits the ``chunk_text`` column AND the work of
    building it (r16 optimization round): Catalyst does not prune
    struct fields built inside a Generate's transform lambda, so a
    caller that drops chunk_text after the fact — the pack stage needs
    only (id, chunk_id, n_tokens) — still paid one concat_ws(slice)
    string build per chunk.  Same rows, same values for the columns
    that remain.

    The token array materializes in its own projection before the
    chunk lambda slices it — an inlined split would re-tokenize the
    document once per chunk (r11 finding; SCALE.md).

    Tokenization is the house LITERAL-SPACE split (r13 review finding
    #1): the q_document_chunks oracle splits with string_split(text,
    ' '), and every other corpus-pipeline stage (quality, spans,
    ledger censuses) splits on ' ' too — a \\s+ split here disagreed
    with all of them on text with consecutive/non-space whitespace,
    which falsified the pipeline's token-conservation invariant on
    valid input (and silently diverged from this operator's own
    oracle)."""
    base = df.select(
        F.col(id_col), F.split(F.col(text_col), " ").alias("__toks")
    )
    toks = F.col("__toks")
    n = F.size(toks)
    starts = chunk_starts(n, chunk_tokens, stride)

    def fields(s):
        out = [(s / stride).cast("long").alias("chunk_id")]
        if with_text:
            out.append(
                F.concat_ws(" ", F.slice(toks, s + 1, chunk_tokens)).alias("chunk_text")
            )
        out.append(F.least(n - s, F.lit(chunk_tokens)).cast("long").alias("n_tokens"))
        return out

    chunks = F.transform(starts, lambda s: F.struct(*fields(s)))
    cols = ["chunk_id"] + (["chunk_text"] if with_text else []) + ["n_tokens"]
    return base.select(
        F.col(id_col), F.explode(chunks).alias("c")
    ).select(id_col, *[F.col(f"c.{c}").alias(c) for c in cols])
