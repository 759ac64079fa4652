"""Python UDTFs (user-defined table functions) — the one lateral,
generator-shaped extension point the engine exposes (SURVEY.md §2 B.9).

A UDTF is the right tool when one input row expands into a variable
number of output rows AND the expansion logic is genuinely imperative
(stateful generators, backtracking tokenizers, external-library calls).
For expansions that reduce to array algebra — like the sliding context
windows here — the JVM path (``sequence``/``transform``/``explode``,
see ``window_spans_df``) is strictly faster because it stays in
whole-stage codegen; the UDTF twin exists to cover the API surface and
as the template for logic that does NOT reduce.  Both implementations
are property-tested equal (tests/test_udtf.py).

Scale note: a UDTF runs one Python worker per task, streaming pickled
rows — fine for generator logic at any corpus size because it is
embarrassingly parallel and stateless across rows, but it pays the
Python round-trip per row.  Never put one on a path a built-in
expression can express.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import udtf

WINDOW_SCHEMA = "win_id: bigint, start_tok: bigint, n_tok: bigint, chunk: string"


@udtf(returnType=WINDOW_SCHEMA)
class SlidingWindows:
    """Emit overlapping token windows of ``size`` every ``stride``
    tokens — the training-data context-window expansion.  Starts are
    ``range(0, n_tokens, stride)``; the final windows may be short
    (they still carry the document tail)."""

    def eval(self, text: str, size: int, stride: int):  # noqa: D102
        if text is None:
            return
        toks = text.split(" ")
        for win_id, start in enumerate(range(0, len(toks), stride)):
            window = toks[start : start + size]
            yield (win_id, start, len(window), " ".join(window))


def register_udtfs(spark: SparkSession) -> None:
    """Idempotently register all engine UDTFs in the session catalog."""
    spark.udtf.register("sliding_windows", SlidingWindows)


def window_spans_udtf(
    spark: SparkSession, docs: DataFrame, size: int, stride: int
) -> DataFrame:
    """UDTF path: LATERAL-join each document to its generated windows."""
    register_udtfs(spark)
    docs.select("doc_id", "text").createOrReplaceTempView("_udtf_docs")
    return spark.sql(
        f"""
        SELECT d.doc_id, w.win_id, w.start_tok, w.n_tok, w.chunk
        FROM _udtf_docs d, LATERAL sliding_windows(d.text, {int(size)}, {int(stride)}) w
        """
    )


def window_spans_df(docs: DataFrame, size: int, stride: int) -> DataFrame:
    """JVM fast path: the same expansion as pure array algebra —
    sequence of starts → transform to (id, start, slice) structs →
    explode.  Stays in codegen; no Python workers."""
    # tokens materialized in their own projection BEFORE the lambda
    # slices them (r11 HOF-lambda rule: an inlined split re-evaluates
    # per window, O(tokens²/stride) per doc; found by the r12 lint)
    base = docs.select("doc_id", F.split(F.col("text"), " ").alias("__toks"))
    toks = F.col("__toks")
    starts = F.sequence(
        F.lit(0), F.greatest(F.size(toks) - 1, F.lit(0)), F.lit(int(stride))
    )
    spans = F.transform(
        starts,
        lambda s, i: F.struct(
            i.cast("long").alias("win_id"),
            s.cast("long").alias("start_tok"),
            F.slice(toks, s + 1, int(size)).alias("win_toks"),
        ),
    )
    return (
        base.select("doc_id", F.explode(spans).alias("w"))
        .select(
            "doc_id",
            F.col("w.win_id"),
            F.col("w.start_tok"),
            F.size("w.win_toks").cast("long").alias("n_tok"),
            F.array_join("w.win_toks", " ").alias("chunk"),
        )
    )
