"""Incremental exact token-frequency state — the vocabulary ledger.

Third member of the AdditiveLedger family (operators/
additive_ledger.py), and the one that proves the extraction is not
sketch-specific: where CountMinIndex bounds its state by a CHOSEN grid
(estimates, never underestimates) and HistogramIndex by a chosen
bucket count, this ledger keeps EXACT per-token counts — the state a
BPE/unigram vocabulary trainer or a stopword-ratio quality gate
actually consumes, where an overestimate is not acceptable.  The cost
model is the honest inverse of the sketches': state is
vocabulary-sized (Heaps' law: sublinear in corpus tokens, but not a
fixed budget), each append shuffles ≤ |distinct tokens in the batch|
rows, and compaction folds the per-batch tables back to one
vocabulary-sized table.  When the vocabulary itself is too hot to
hold, Count-Min is the fallback — the two ledgers share every
protocol guarantee (exactly-once stream feeding, superseding
checkpoints, covered-set losslessness), so swapping is a build-
function change, not a re-audit.

Counts merge by ADDITION over a disjoint row split, so **incremental
== one-shot EXACTLY** for any batch partition of the corpus
(tests/test_incremental_tokens.py pins it) — which also makes
q_incremental_token_counts a full value-exact DuckDB oracle query:
the merged ledger must equal a plain GROUP BY over the whole corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cdc_demo_spark.operators.additive_ledger import AdditiveLedger
from cdc_demo_spark.storage import (  # noqa: F401  (re-export)
    DEFAULT_BACKEND,
    CommitBackend,
    ConcurrentAppendError,
)


def token_counts(df: DataFrame, token_col: str, weight_col: str | None = None) -> DataFrame:
    """One batch's (token, cnt) table: COUNT(*) per non-NULL token, or
    SUM(weight) when ``weight_col`` carries pre-aggregated
    multiplicities (the contract countmin_build uses).  NULL tokens
    are dropped, never counted — same junk policy as the sketches."""
    rows = df.filter(F.col(token_col).isNotNull())
    cnt = (
        F.sum(F.col(weight_col).cast("long"))
        if weight_col is not None
        else F.count(F.lit(1))
    )
    return rows.groupBy(F.col(token_col).alias("token")).agg(cnt.alias("cnt"))


class TokenCountIndex(AdditiveLedger):
    _TABLE = "tokens"
    _SCHEMA = "token string, cnt long"
    _KEYS = ("token",)

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        backend: CommitBackend = DEFAULT_BACKEND,
    ) -> None:
        super().__init__(spark, path, backend)
        # no build parameters to freeze — the state schema IS the
        # contract; _meta.json still lands so a future parameterized
        # variant can version itself
        self._freeze_meta({"kind": "token_counts", "v": 1})

    def counts(self) -> DataFrame:
        """The merged vocabulary: (token string, cnt long) — exactly
        the one-shot GROUP BY over the union of all admitted batches."""
        return self.state()

    def append_batch(
        self,
        df: DataFrame,
        token_col: str,
        weight_col: str | None = None,
        batch_id: int | None = None,
    ) -> bool:
        """Admit a batch of token occurrences.  NOT idempotent in
        content (counts add); ``batch_id`` keys the commit to a
        caller-owned stream epoch for exactly-once feeding.  Ownership
        and adoption rules are the base protocol's (see
        CountMinIndex.append_batch for the full contract).  Returns
        True iff THIS call committed."""
        if not self._accepts(batch_id):
            return False  # epoch already committed — skip before the build
        return self._append_state(token_counts(df, token_col, weight_col), batch_id)

    def topk(self, k: int) -> DataFrame:
        """The k most frequent tokens, count-desc with token as the
        deterministic tiebreak.  orderBy+limit compiles to
        TakeOrderedAndProject — a per-partition top-k heap — so the
        vocabulary-sized state never collects onto one node."""
        return self.counts().orderBy(F.desc("cnt"), "token").limit(k)


def token_count_sink(index: TokenCountIndex, token_col: str, weight_col: str | None = None):
    """foreachBatch adapter: ``.writeStream.foreachBatch(
    token_count_sink(idx, "tok"))`` maintains the vocabulary ledger
    from a stream with exactly-once counts."""

    def process(batch_df: DataFrame, batch_id: int) -> None:
        index.append_batch(batch_df, token_col, weight_col, batch_id=int(batch_id))

    return process
