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

- ``compact()`` merges one consistent listing of committed batches
  into ``checkpoint_data/ckpt=<seq>-<uid>`` and claims marker
  ``checkpoints/<seq>`` via put-if-absent, whose CONTENT records the
  exact batch-id SET the checkpoint merged (losers of a same-seq race
  fail loudly and their data dir is unreferenced garbage);
- readers take the HIGHEST valid checkpoint plus every committed cell
  batch OUTSIDE its covered set — the superseded batch dirs stay on
  disk for in-flight readers but are never merged with the checkpoint
  that already contains them.  Reclaiming them is a separate GC
  decision once no pre-compaction reader can remain (same contract as
  the silver manifest's bucket-version GC, streaming/merge.py).

Recording the covered SET (not a high-water id) is what makes any
append/compaction interleaving lossless: a batch landing after the
compactor's listing — including a STALLED appender claiming an id
below the checkpoint's highest merged id (its id was burned by
next_batch_id long before its claim) — is outside the set and stays
readable.  A coverage-threshold design would drop that batch's counts
silently, breaking the never-underestimate contract.  Parameters
(depth, width) are frozen into ``_meta.json``; estimating with
different parameters than the stored cells would silently produce
garbage, so mismatches raise.
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
    claim_ownership_mode,
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

    def _checkpoint(self) -> tuple[int, str | None, frozenset[int]]:
        """(seq, data dir, covered batch ids) of the highest valid
        checkpoint, or (-1, None, ∅).  Valid = marker exists AND its
        uid-named data dir does (the marker is claimed after the data
        write, so the class itself never produces a marker pointing at
        missing data; an externally poisoned marker is skipped, never
        fatal).

        Checkpoints record the EXACT batch-id set they merged, not a
        high-water coverage: a stalled appender can commit a batch id
        BELOW a later checkpoint's high-water mark (its id was burned
        by next_batch_id before it claimed), and a coverage-threshold
        reader would silently drop those counts forever — breaking the
        never-underestimate contract.  With the explicit set, any
        committed batch the checkpoint did not merge stays readable,
        whatever its id."""
        root = os.path.join(self.path, "checkpoints")
        best, best_dir, covered = -1, None, frozenset()
        for m in self.backend.list_dir(root):
            if not m.isdigit() or int(m) <= best:
                continue
            try:
                meta = json.loads(self.backend.read(os.path.join(root, m)))
                uid, ids = meta["uid"], frozenset(meta["covered"])
            except (ValueError, KeyError, TypeError):
                continue  # poisoned marker: skip (its seq stays burned)
            d = os.path.join(self.path, "checkpoint_data", f"ckpt={m}-{uid}")
            if os.path.isdir(d):
                best, best_dir, covered = int(m), d, ids
        return best, best_dir, covered

    def _next_checkpoint_seq(self) -> int:
        """max over ALL digit-named markers (valid or poisoned — a
        burned seq is never reused) + 1."""
        root = os.path.join(self.path, "checkpoints")
        seqs = [int(m) for m in self.backend.list_dir(root) if m.isdigit()]
        return max(seqs, default=-1) + 1

    def _state_dirs(self) -> tuple[list[str], frozenset[int], list[int]]:
        """One consistent listing: (dirs that together hold the state,
        the checkpoint's covered set, the uncovered committed batch
        ids).  State = newest checkpoint + every committed batch NOT in
        its covered set.  compact() checkpoints FROM this exact
        listing, so a batch landing after it stays out of both the
        merged data and the claimed covered set."""
        _, ckpt_dir, covered = self._checkpoint()
        dirs = [] if ckpt_dir is None else [ckpt_dir]
        fresh = []
        for d in self._log.committed_batches("cells"):
            n = BatchCommitLog.batch_id_of(d)
            if n not in covered:
                dirs.append(d)
                fresh.append(n)
        return dirs, covered, fresh

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
        rows.  SUM-merge of the newest checkpoint (if any) with every
        committed cell batch outside its covered set; an empty index is
        an empty frame (every estimate is 0)."""
        return self._merged(self._state_dirs()[0])

    # -- the operator -------------------------------------------------

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
        both — an auto-id append claims max+1, which a future epoch id
        can equal, making that epoch skip as a "replay" and lose its
        counts.  (Compaction checkpoints live in their own seq
        namespace and cannot collide.)  ENFORCED: the first append
        records its mode and a mixed-mode call raises
        (storage.claim_ownership_mode).  Returns True iff THIS call
        committed."""
        import uuid

        claim_ownership_mode(
            self.backend, self.path, "auto" if batch_id is None else "epoch"
        )
        if batch_id is not None and self.backend.exists(self._log.marker(batch_id)):
            return False  # epoch already committed — skip before the build
        batch_cells = countmin_build(df, value_col, self.depth, self.width, weight_col)
        n = self._log.next_batch_id("cells") if batch_id is None else int(batch_id)
        uid = uuid.uuid4().hex[:8]
        batch_cells.write.mode("overwrite").parquet(
            os.path.join(self.path, "cells", f"batch={n}-{uid}")
        )
        try:
            self._log.claim(n, uid)
        except ConcurrentAppendError:
            if batch_id is None:
                raise  # auto-id: a rival stole the id — caller retries
            return False  # epoch raced a replay; the winner has this content
        return True

    def estimate(self, df: DataFrame, value_col: str) -> DataFrame:
        """`df` + ``est`` — exactly the one-shot sketch's estimate over
        the union of all admitted batches (≥ true count, always)."""
        return countmin_estimate(df, value_col, self.cells(), self.depth, self.width)

    def compact(self) -> None:
        """Checkpoint the merged state, superseding (not joining) the
        exact batch set it merged — see the module docstring for why
        SUM-merge forbids Bloom-style additive compaction.  The claimed
        marker records covered = previous covered ∪ the batches merged
        from ONE consistent listing, so a batch committed after the
        listing (or by a stalled appender, at any id) stays outside the
        set and remains readable.  Racing compactors serialize on the
        next marker seq: the loser raises and its data dir is
        unreferenced garbage."""
        import uuid

        dirs, covered, fresh = self._state_dirs()
        if not fresh:
            return  # nothing new to cover
        # merged over EXACTLY the listed dirs (not a re-list at action
        # time) and pinned before the write
        merged = self._merged(dirs).localCheckpoint(eager=True)
        seq = self._next_checkpoint_seq()
        uid = uuid.uuid4().hex[:8]
        merged.write.mode("overwrite").parquet(
            os.path.join(self.path, "checkpoint_data", f"ckpt={seq}-{uid}")
        )
        meta = json.dumps({"uid": uid, "covered": sorted(covered | set(fresh))})
        if not self.backend.put_if_absent(
            os.path.join(self.path, "checkpoints", str(seq)), meta.encode()
        ):
            raise ConcurrentAppendError(
                f"checkpoint seq={seq} at {self.path} was claimed by another "
                "compactor; this one's data dir is unreferenced"
            )


    def gc(self, orphan_ttl_seconds: float | None = None) -> list[str]:
        """Reclaim what the newest checkpoint supersedes: cell-batch
        dirs in its covered set AND older checkpoint dirs (each a full
        depth×width table no reader can reach — without this arm,
        routine compact()+gc() would leak one merged sketch per cycle
        forever).  Returns the removed paths.

        With ``orphan_ttl_seconds``, ALSO sweeps never-published
        garbage older than that horizon, which the marker-driven arms
        above can never reach: crashed/losing appenders' staged
        ``cells/batch=<n>-<uid>`` dirs (no marker, or the marker names
        the winner's uid) and SAME-seq rival checkpoint dirs
        ``ckpt=<seq>-<uid>`` whose marker records a different uid (the
        ``< seq`` arm only catches older seqs, so a losing compactor's
        full-grid table at the winning seq would leak forever).  The
        horizon must exceed any live writer's stage-to-claim gap; see
        BatchCommitLog.orphan_batch_dirs.  Default None keeps gc
        purely marker-driven.

        Caller contract: no reader started BEFORE the checkpoint may
        still be running — a pre-checkpoint reader could hold the old
        dirs in an unexecuted plan (the same quiesce contract as the
        silver manifest's bucket-version GC, streaming/merge.py).  The
        batch MARKERS stay: their ids remain burned so next_batch_id,
        the covered set, and epoch-replay dedup keep their history."""
        import shutil
        import time

        removed = []
        if orphan_ttl_seconds is not None:
            for d in self._log.orphan_batch_dirs("cells", orphan_ttl_seconds):
                shutil.rmtree(d, ignore_errors=True)
                removed.append(d)
        seq, ckpt_dir, covered = self._checkpoint()
        ckpt_root = os.path.join(self.path, "checkpoint_data")
        if orphan_ttl_seconds is not None and os.path.isdir(ckpt_root):
            now = time.time()
            for name in sorted(os.listdir(ckpt_root)):
                full = os.path.join(ckpt_root, name)
                if not name.startswith("ckpt=") or not os.path.isdir(full):
                    continue
                m, _, uid = name.split("=", 1)[1].partition("-")
                marker = os.path.join(self.path, "checkpoints", m)
                try:
                    meta = json.loads(self.backend.read(marker))
                    published = meta.get("uid") == uid
                except (OSError, ValueError, KeyError, TypeError):
                    published = False  # no/poisoned marker: never readable
                try:
                    old = now - os.path.getmtime(full) >= orphan_ttl_seconds
                except OSError:
                    continue
                if not published and old:
                    shutil.rmtree(full, ignore_errors=True)
                    removed.append(full)
        if ckpt_dir is None:
            return removed
        for d in self._log.committed_batches("cells"):
            if BatchCommitLog.batch_id_of(d) in covered:
                shutil.rmtree(d, ignore_errors=True)
                removed.append(d)
        for name in sorted(os.listdir(ckpt_root)) if os.path.isdir(ckpt_root) else []:
            full = os.path.join(ckpt_root, name)
            if (
                name.startswith("ckpt=")
                and os.path.isdir(full)
                and BatchCommitLog.batch_id_of(full) < seq
            ):
                shutil.rmtree(full, ignore_errors=True)
                removed.append(full)
        return removed


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
