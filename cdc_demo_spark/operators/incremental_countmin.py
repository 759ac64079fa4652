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
CHECKPOINT that supersedes coverage instead of joining it:

- ``compact()`` merges batches 0..k into ``checkpoint_data/
  through=<k>-<uid>`` and claims marker ``checkpoints/<k>`` via
  put-if-absent (losers of a same-coverage race fail loudly and their
  data dir is unreferenced garbage);
- readers take the HIGHEST valid checkpoint plus only the cell batches
  with id > its coverage — the superseded batch dirs stay on disk for
  in-flight readers but are never merged with the checkpoint that
  already contains them.  Reclaiming them is a separate GC decision
  once no pre-compaction reader can remain (same contract as the
  silver manifest's bucket-version GC, streaming/merge.py).

An append racing a compaction is safe by construction: the checkpoint
claims exactly the coverage its read observed, so a batch landing
between the compactor's read and its claim has an id above the
coverage and stays visible.  Parameters (depth, width) are frozen into
``_meta.json``; estimating with different parameters than the stored
cells would silently produce garbage, so mismatches raise.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cdc_demo_spark.operators.sketches import countmin_build, countmin_estimate
from cdc_demo_spark.storage import (  # noqa: F401  (re-export)
    DEFAULT_BACKEND,
    BatchCommitLog,
    CommitBackend,
    ConcurrentAppendError,
)


class CountMinIndex:
    def __init__(
        self,
        spark: SparkSession,
        path: str,
        depth: int = 4,
        width: int = 1024,
        backend: CommitBackend = DEFAULT_BACKEND,
    ) -> None:
        self.spark = spark
        self.path = path
        self.backend = backend
        self._log = BatchCommitLog(path, backend)
        meta_path = os.path.join(path, "_meta.json")
        meta = {"depth": depth, "width": width}
        if not backend.put_if_absent(meta_path, json.dumps(meta).encode()):
            stored = json.loads(backend.read(meta_path))
            if stored != meta:
                raise ValueError(
                    f"index at {path} was built with {stored}, probed with {meta}"
                )
        self.depth, self.width = depth, width

    # -- storage ------------------------------------------------------

    def _checkpoint(self) -> tuple[int, str | None]:
        """(coverage, data dir) of the highest valid checkpoint, or
        (-1, None).  Valid = marker exists AND its uid-named data dir
        does (a crashed compactor leaves neither or an unreferenced
        dir — never a marker pointing at missing data, since the
        marker is claimed last)."""
        root = os.path.join(self.path, "checkpoints")
        best, best_dir = -1, None
        for m in self.backend.list_dir(root):
            if not m.isdigit() or int(m) <= best:
                continue
            uid = self.backend.read(os.path.join(root, m)).decode()
            d = os.path.join(self.path, "checkpoint_data", f"through={m}-{uid}")
            if os.path.isdir(d):
                best, best_dir = int(m), d
        return best, best_dir

    def _state_dirs(self) -> tuple[int, list[str]]:
        """One consistent listing: (highest batch id observed, the
        dirs that together hold the state) = newest checkpoint + cell
        batches above its coverage.  compact() checkpoints FROM this
        exact listing, so a batch landing after it stays out of both
        the merged data and the claimed coverage."""
        through, ckpt_dir = self._checkpoint()
        top = through
        dirs = [] if ckpt_dir is None else [ckpt_dir]
        for d in self._log.committed_batches("cells"):
            n = int(os.path.basename(d).split("=")[1].split("-")[0])
            if n > through:
                dirs.append(d)
                top = max(top, n)
        return top, dirs

    def _merged(self, dirs: list[str]) -> DataFrame:
        if not dirs:
            return self.spark.createDataFrame([], "j int, cell long, cnt long")
        return (
            self.spark.read.parquet(*dirs)
            .groupBy("j", "cell")
            .agg(F.sum("cnt").alias("cnt"))
        )

    def cells(self) -> DataFrame:
        """The merged grid: (j int, cell long, cnt long), ≤ depth×width
        rows.  SUM-merge of the newest checkpoint (if any) with the
        cell batches ABOVE its coverage; an empty index is an empty
        frame (every estimate is 0)."""
        return self._merged(self._state_dirs()[1])

    # -- the operator -------------------------------------------------

    def append_batch(
        self, df: DataFrame, value_col: str, weight_col: str | None = None
    ) -> None:
        """Admit a batch's occurrences.  NOT idempotent in content
        (counts add — replaying a batch double-counts it), which is why
        the marker claim races loudly instead of best-effort: the
        caller retries with the NEXT id only for a batch that did not
        land."""
        import uuid

        batch_cells = countmin_build(df, value_col, self.depth, self.width, weight_col)
        n = self._log.next_batch_id("cells")
        uid = uuid.uuid4().hex[:8]
        batch_cells.write.mode("overwrite").parquet(
            os.path.join(self.path, "cells", f"batch={n}-{uid}")
        )
        self._log.claim(n, uid)

    def estimate(self, df: DataFrame, value_col: str) -> DataFrame:
        """`df` + ``est`` — exactly the one-shot sketch's estimate over
        the union of all admitted batches (≥ true count, always)."""
        return countmin_estimate(df, value_col, self.cells(), self.depth, self.width)

    def compact(self) -> None:
        """Checkpoint the merged state through the current highest
        batch id, superseding (not joining) everything it covers — see
        the module docstring for why SUM-merge forbids Bloom-style
        additive compaction.  Same-coverage racers fail loudly."""
        import uuid

        through_old, _ = self._checkpoint()
        through, dirs = self._state_dirs()
        if through < 0 or through == through_old:
            return  # nothing new to cover
        # merged over EXACTLY the listed dirs (not a re-list at action
        # time), and pinned: a batch landing after this listing stays
        # out of the checkpoint AND above its claimed coverage
        merged = self._merged(dirs).localCheckpoint(eager=True)
        uid = uuid.uuid4().hex[:8]
        merged.write.mode("overwrite").parquet(
            os.path.join(self.path, "checkpoint_data", f"through={through}-{uid}")
        )
        if not self.backend.put_if_absent(
            os.path.join(self.path, "checkpoints", str(through)), uid.encode()
        ):
            raise ConcurrentAppendError(
                f"checkpoint through={through} at {self.path} was claimed by "
                "another compactor; this one's data dir is unreferenced"
            )
