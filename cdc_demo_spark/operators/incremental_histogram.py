"""Incremental fixed-grid histogram state — the streaming quantile
ledger, completing the sketch family's incremental story
(membership=BloomIndex, frequency=CountMinIndex, quantile=THIS).

The one-shot histogram (operators/sketches.histogram_build) answers
"how are values distributed in THAT corpus"; operations need a
distribution that accumulates across crawl batches — e.g. document
length or quality-score drift monitoring over a growing corpus —
without re-scanning history.  Bucket counts merge by ADDITION over a
disjoint row split, so this is a textbook ``AdditiveLedger``
(operators/additive_ledger.py, the covered-set checkpoint protocol
extracted from CountMinIndex): **incremental == one-shot EXACTLY**,
bit-identical bucket counts for any batch split of the input
(tests/test_incremental_histogram.py pins it), and therefore
bit-identical interpolated quantile estimates.

- append cost: one pass over the batch, shuffling ≤ n_buckets rows —
  independent of how many batches precede it; at 100 TB the batch
  scan is the only corpus-sized term, and it is the delta, not the
  history;
- read-side merge is bounded by batches × n_buckets rows until
  ``compact()`` checkpoints it back to ≤ n_buckets (superseding, not
  joining — SUM-merged state double-counts under additive
  compaction, see the base module);
- the grid (lo, hi, n_buckets) is frozen into ``_meta.json``:
  merging counts bucketed under different grids is silent garbage, so
  mismatches raise (same contract as depth/width on Count-Min).

Quantiles come from ``histogram_quantiles`` over the merged state —
deterministic double math a SQL oracle reproduces bit-for-bit, which
is what lets q_incremental_histogram carry a full value-exact DuckDB
oracle where approx_percentile's engine-specific t-digest state never
could.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from cdc_demo_spark.operators.additive_ledger import AdditiveLedger
from cdc_demo_spark.operators.sketches import histogram_build, histogram_quantiles
from cdc_demo_spark.storage import (  # noqa: F401  (re-export)
    DEFAULT_BACKEND,
    CommitBackend,
    ConcurrentAppendError,
)


class HistogramIndex(AdditiveLedger):
    _TABLE = "buckets"
    _SCHEMA = "bucket int, cnt long"
    _KEYS = ("bucket",)

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        lo: float,
        hi: float,
        n_buckets: int = 128,
        backend: CommitBackend = DEFAULT_BACKEND,
    ) -> None:
        if not hi > lo:
            raise ValueError(f"histogram bounds must satisfy lo < hi, got [{lo}, {hi})")
        if n_buckets < 1:
            raise ValueError(f"histogram needs at least one bucket, got {n_buckets}")
        super().__init__(spark, path, backend)
        self._freeze_meta(
            {"lo": float(lo), "hi": float(hi), "n_buckets": int(n_buckets)}
        )
        self.lo, self.hi, self.n_buckets = float(lo), float(hi), int(n_buckets)

    def hist(self) -> DataFrame:
        """The merged histogram: (bucket int, cnt long), ≤ n_buckets
        rows — exactly the one-shot histogram of the union of all
        admitted batches."""
        return self.state()

    def append_batch(
        self, df: DataFrame, value_col: str, batch_id: int | None = None
    ) -> bool:
        """Admit a batch's values under the frozen grid.  NOT
        idempotent in content (counts add); ``batch_id`` keys the
        commit to a caller-owned stream epoch for exactly-once feeding
        — a replayed epoch skips before the build.  Ownership and
        adoption rules are the base protocol's (see
        CountMinIndex.append_batch for the full contract).  Returns
        True iff THIS call committed."""
        if not self._accepts(batch_id):
            return False  # epoch already committed — skip before the build
        hist = histogram_build(df, value_col, self.lo, self.hi, self.n_buckets)
        return self._append_state(hist, batch_id)

    def quantiles(self, qs: list[float]) -> DataFrame:
        """Interpolated quantile estimates (q, est) from the merged
        state — bit-identical to histogram_quantiles over a one-shot
        build of the same rows, error bounded by one bucket width."""
        return histogram_quantiles(self.hist(), qs, self.lo, self.hi, self.n_buckets)


def histogram_sink(index: HistogramIndex, value_col: str):
    """foreachBatch adapter: ``.writeStream.foreachBatch(
    histogram_sink(idx, "len"))`` maintains the distribution ledger
    from a stream with exactly-once counts — the streaming batch id
    keys each commit, so at-least-once redelivery is skipped, not
    double-counted."""

    def process(batch_df: DataFrame, batch_id: int) -> None:
        index.append_batch(batch_df, value_col, batch_id=int(batch_id))

    return process
