"""Incremental Count-Min frequency state — the streaming heavy-hitter
ledger.

The one-shot sketch (operators/sketches.countmin_build) answers "how
often in THAT corpus"; operations need frequencies that accumulate
across crawl batches without ever re-scanning history.  This module
persists per-batch cell tables under the shared BatchCommitLog
protocol (storage.py) and SUM-merges them at read time:

- append cost: one pass over the batch, shuffling ≤ depth × width
  rows — independent of how many batches precede it;
- because cell counts merge by ADDITION over a disjoint row split,
  **incremental == one-shot EXACTLY** for any batch partition of the
  input (tests/test_incremental_countmin.py pins it) — estimates,
  including the deliberate overcounts, are bit-identical to a single
  build over the union.

Compaction is where this index must differ from BloomIndex: bit_or is
IDEMPOTENT, so Bloom's compacted table can coexist with the history it
merged (re-ORing is a no-op).  SUM is not — a compacted table summed
with its own inputs double-counts every cell.  So compaction here is a
CHECKPOINT that supersedes coverage instead of joining it, recording
the exact batch-id SET it merged so that any append/compaction
interleaving — including a stalled appender claiming a low id after
the checkpoint — stays lossless (never-underestimate contract).

That covered-set checkpoint protocol was pioneered here and is now
the shared ``AdditiveLedger`` base (operators/additive_ledger.py —
round 9 extraction), which any SUM-merged state table inherits;
HistogramIndex (operators/incremental_histogram.py) is the second
member.  This module keeps only what is Count-Min-specific: the
(depth, width) parameter freeze, the cell build, and the probe.
Parameters are frozen into ``_meta.json``; estimating with different
parameters than the stored cells would silently produce garbage, so
mismatches raise.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from cdc_demo_spark.operators.additive_ledger import AdditiveLedger
from cdc_demo_spark.operators.sketches import countmin_build, countmin_estimate
from cdc_demo_spark.storage import (  # noqa: F401  (re-export)
    DEFAULT_BACKEND,
    BatchCommitLog,
    CommitBackend,
    ConcurrentAppendError,
    claim_ownership_mode,
)


class CountMinIndex(AdditiveLedger):
    _TABLE = "cells"
    _SCHEMA = "j int, cell long, cnt long"
    _KEYS = ("j", "cell")

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        depth: int = 4,
        width: int = 1024,
        backend: CommitBackend = DEFAULT_BACKEND,
    ) -> None:
        super().__init__(spark, path, backend)
        self._freeze_meta({"depth": depth, "width": width})
        self.depth, self.width = depth, width

    def cells(self) -> DataFrame:
        """The merged grid: (j int, cell long, cnt long), ≤ depth×width
        rows.  SUM-merge of the newest checkpoint (if any) with every
        committed cell batch outside its covered set; an empty index is
        an empty frame (every estimate is 0)."""
        return self.state()

    def append_batch(
        self,
        df: DataFrame,
        value_col: str,
        weight_col: str | None = None,
        batch_id: int | None = None,
    ) -> bool:
        """Admit a batch's occurrences.  NOT idempotent in content
        (counts add — replaying a batch double-counts it), which is why
        the marker claim races loudly instead of best-effort: the
        caller retries with the NEXT id only for a batch that did not
        land.

        ``batch_id`` keys the commit to a CALLER-owned epoch (e.g. a
        Structured Streaming foreachBatch batch id) and is what makes
        an at-least-once stream feed this additive state exactly-once:
        a replayed epoch finds its marker claimed and is SKIPPED
        (returns False) instead of double-counted.  Caller contract:
        one batch_id ↔ one logical batch content, which foreachBatch
        guarantees under a LIVE checkpoint (deleting the checkpoint
        re-epochs the stream and voids the mapping — then rebuild the
        index too).  And one index is EITHER stream-owned (every
        append passes the epoch id) or batch-owned (auto ids), never
        both — enforced loudly, including refusal to adopt a
        pre-ownership history as epoch-owned (storage.
        claim_ownership_mode).  Returns True iff THIS call committed."""
        if not self._accepts(batch_id):
            return False  # epoch already committed — skip before the build
        cells = countmin_build(df, value_col, self.depth, self.width, weight_col)
        return self._append_state(cells, batch_id)

    def estimate(self, df: DataFrame, value_col: str) -> DataFrame:
        """`df` + ``est`` — exactly the one-shot sketch's estimate over
        the union of all admitted batches (≥ true count, always)."""
        return countmin_estimate(df, value_col, self.cells(), self.depth, self.width)


def countmin_sink(index: CountMinIndex, value_col: str, weight_col: str | None = None):
    """foreachBatch adapter: ``.writeStream.foreachBatch(countmin_sink(
    idx, "sh"))`` maintains the frequency ledger from a stream with
    exactly-once counts — the streaming batch id keys each commit, so
    at-least-once redelivery is skipped, not double-counted (the
    property OR-merged Bloom state gets for free and SUM-merged state
    must engineer; see append_batch)."""

    def process(batch_df: DataFrame, batch_id: int) -> None:
        index.append_batch(batch_df, value_col, weight_col, batch_id=int(batch_id))

    return process
