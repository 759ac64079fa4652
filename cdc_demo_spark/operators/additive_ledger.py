"""Covered-set checkpoint protocol over ANY SUM-merged state table.

Extracted (round 9) from CountMinIndex, which pioneered the shape; the
Count-Min module's docstring (operators/incremental_countmin.py) holds
the full why.  The short version: state whose rows merge by ADDITION
over a disjoint input split — Count-Min cells, histogram buckets,
token tallies — gives **incremental == one-shot EXACTLY** for free
(SUM is associative/commutative), but compaction cannot be Bloom-style
additive: a merged table summed with its own inputs double-counts.  So
compaction here is a CHECKPOINT that SUPERSEDES the exact batch-id set
it merged, and readers take the highest valid checkpoint plus every
committed batch OUTSIDE its covered set.

The protocol a subclass inherits, verbatim from the Count-Min design:

- per-batch state lands under the shared BatchCommitLog marker scheme
  (storage.py): stage ``<table>/batch=<n>-<uid>``, claim ONE marker;
- ``batch_id`` keys a commit to a CALLER-owned epoch (Structured
  Streaming foreachBatch), making an at-least-once stream feed the
  additive state exactly-once — a replayed epoch's marker is already
  claimed and the append is SKIPPED, not double-counted.  One index is
  either stream-owned or batch-owned, never both (enforced by
  storage.claim_ownership_mode, including the adoption refusal over
  pre-ownership history);
- ``compact()`` checkpoints one consistent listing into
  ``checkpoint_data/ckpt=<seq>-<uid>`` + marker ``checkpoints/<seq>``
  whose content records the covered batch-id SET — not a high-water
  id, so a stalled appender claiming a low id after the checkpoint
  stays readable (the never-underestimate contract);
- ``gc()`` reclaims covered batch dirs and superseded checkpoint
  dirs; with an ``orphan_ttl_seconds`` horizon it also sweeps staged
  dirs and same-seq rival checkpoints no marker publishes.

Subclasses declare the state shape (``_TABLE``, ``_SCHEMA``,
``_KEYS`` — the counts column is always ``cnt``) and provide a public
``append_batch`` that builds the batch's state frame and hands it to
``_append_state``.  At 100 TB every append shuffles at most the
STATE's key space (sketch-sized, never the corpus), and the read-side
merge is bounded by batches x state size until a compaction folds it.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cdc_demo_spark.storage import (
    DEFAULT_BACKEND,
    BatchCommitLog,
    CheckpointLog,
    CommitBackend,
    ConcurrentAppendError,
    claim_ownership_mode,
)


class AdditiveLedger:
    """Generic SUM-merged incremental state.  Not an index by itself:
    subclasses (CountMinIndex, HistogramIndex) freeze their build
    parameters into ``_meta.json`` and define what a batch's state
    frame IS; everything storage-shaped lives here once."""

    #: state table name under the index path
    _TABLE: str = "state"
    #: empty-frame schema of one state table
    _SCHEMA: str = "cnt long"
    #: groupBy keys of the SUM merge
    _KEYS: tuple[str, ...] = ()
    #: the SUM-merged value columns (one for counts-shaped state;
    #: several for moment-sum state like MomentsIndex's n/s1/s2 —
    #: each must be exactly summable: longs, or integer-scaled
    #: DECIMAL(38,0), never raw doubles, whose addition order would
    #: break incremental == one-shot bit-equality)
    _VALUES: tuple[str, ...] = ("cnt",)

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        backend: CommitBackend = DEFAULT_BACKEND,
    ) -> None:
        self.spark = spark
        self.path = path
        self.backend = backend
        self._log = BatchCommitLog(path, backend)
        self._ckpt_log = CheckpointLog(path, backend)

    def _freeze_meta(self, meta: dict) -> None:
        """put-if-absent then verify: racing creators with identical
        params both succeed; a param mismatch raises for the loser —
        probing stored state with different parameters would silently
        produce garbage."""
        meta_path = os.path.join(self.path, "_meta.json")
        if not self.backend.put_if_absent(meta_path, json.dumps(meta).encode()):
            stored = json.loads(self.backend.read(meta_path))
            if stored != meta:
                raise ValueError(
                    f"index at {self.path} was built with {stored}, probed with {meta}"
                )

    # -- storage ------------------------------------------------------

    def _checkpoint(self) -> tuple[int, str | None, frozenset[int]]:
        """(seq, data dir, covered batch ids) of the highest valid
        checkpoint, or (-1, None, 0).  Valid = marker exists AND its
        uid-named data dir does (the marker is claimed after the data
        write, so the class itself never produces a marker pointing at
        missing data; an externally poisoned marker is skipped, never
        fatal).

        Checkpoints record the EXACT batch-id set they merged, not a
        high-water coverage — the never-underestimate rationale lives
        on storage.CheckpointLog, which owns the marker bookkeeping
        (extracted r9 so the pair indexes' compaction shares it;
        marker format unchanged, existing ledgers read as-is)."""

        def valid(seq: int, uid: str) -> bool:
            return os.path.isdir(self._ckpt_data_dir(seq, uid))

        seq, uid, covered = self._ckpt_log.latest(valid)
        d = None if uid is None else self._ckpt_data_dir(seq, uid)
        return seq, d, covered

    def _ckpt_data_dir(self, seq: int, uid: str) -> str:
        return os.path.join(self.path, "checkpoint_data", f"ckpt={seq}-{uid}")

    def _next_checkpoint_seq(self) -> int:
        return self._ckpt_log.next_seq()

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
        for d in self._log.committed_batches(self._TABLE):
            n = BatchCommitLog.batch_id_of(d)
            if n not in covered:
                dirs.append(d)
                fresh.append(n)
        return dirs, covered, fresh

    def _merged(self, dirs: list[str]) -> DataFrame:
        if not dirs:
            return self.spark.createDataFrame([], self._SCHEMA)
        return (
            self.spark.read.parquet(*dirs)
            .groupBy(*self._KEYS)
            .agg(*[F.sum(c).alias(c) for c in self._VALUES])
        )

    def state(self) -> DataFrame:
        """The merged state table.  SUM-merge of the newest checkpoint
        (if any) with every committed batch outside its covered set; an
        empty index is an empty frame."""
        return self._merged(self._state_dirs()[0])

    # -- the protocol -------------------------------------------------

    def _accepts(self, batch_id: int | None) -> bool:
        """Ownership + epoch-replay gate, run BEFORE the subclass
        builds the batch's state (a replayed epoch skips the whole
        build, not just the write).  Raises on mixed id modes or on
        epoch adoption over unowned history (storage.
        claim_ownership_mode); False = epoch already committed."""
        claim_ownership_mode(
            self.backend, self.path, "auto" if batch_id is None else "epoch"
        )
        return not (
            batch_id is not None and self.backend.exists(self._log.marker(batch_id))
        )

    def _append_state(self, state: DataFrame, batch_id: int | None) -> bool:
        """Land one batch's state frame under the marker protocol.
        NOT idempotent in content (counts add — replaying a batch
        double-counts), which is why the marker claim races loudly for
        auto ids and skips for epoch replays.  Returns True iff THIS
        call committed."""
        import uuid

        n = self._log.next_batch_id(self._TABLE) if batch_id is None else int(batch_id)
        uid = uuid.uuid4().hex[:8]
        state.write.mode("overwrite").parquet(
            os.path.join(self.path, self._TABLE, f"batch={n}-{uid}")
        )
        try:
            self._log.claim(n, uid)
        except ConcurrentAppendError:
            if batch_id is None:
                raise  # auto-id: a rival stole the id — caller retries
            return False  # epoch raced a replay; the winner has this content
        return True

    def compact(self) -> None:
        """Checkpoint the merged state, superseding (not joining) the
        exact batch set it merged — see the module docstring for why
        SUM-merge forbids Bloom-style additive compaction.  The claimed
        marker records covered = previous covered + the batches merged
        from ONE consistent listing, so a batch committed after the
        listing (or by a stalled appender, at any id) stays outside the
        set and remains readable.  Racing compactors serialize on the
        next marker seq: the loser raises and its data dir is
        unreferenced garbage.  No-op when nothing new landed."""
        import uuid

        dirs, covered, fresh = self._state_dirs()
        if not fresh:
            return  # nothing new to cover
        # merged over EXACTLY the listed dirs (not a re-list at action
        # time) and pinned before the write
        merged = self._merged(dirs).localCheckpoint(eager=True)
        seq = self._next_checkpoint_seq()
        uid = uuid.uuid4().hex[:8]
        merged.write.mode("overwrite").parquet(self._ckpt_data_dir(seq, uid))
        self._ckpt_log.claim(seq, uid, covered | set(fresh))

    def gc(self, orphan_ttl_seconds: float | None = None) -> list[str]:
        """Reclaim what the newest checkpoint supersedes: batch dirs in
        its covered set AND older checkpoint dirs (each a full state
        table no reader can reach — without this arm, routine
        compact()+gc() would leak one merged table per cycle forever).
        Returns the removed paths.

        With ``orphan_ttl_seconds``, ALSO sweeps never-published
        garbage older than that horizon, which the marker-driven arms
        can never reach: crashed/losing appenders' staged batch dirs
        and SAME-seq rival checkpoint dirs whose marker records a
        different uid (the ``< seq`` arm only catches older seqs).
        The horizon must exceed any live writer's stage-to-claim gap;
        see BatchCommitLog.orphan_batch_dirs.  Default None keeps gc
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
            for d in self._log.orphan_batch_dirs(self._TABLE, orphan_ttl_seconds):
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
                published = not self._ckpt_log.rival_uid(int(m), uid)
                try:
                    old = now - os.path.getmtime(full) >= orphan_ttl_seconds
                except OSError:
                    continue
                if not published and old:
                    shutil.rmtree(full, ignore_errors=True)
                    removed.append(full)
        if ckpt_dir is None:
            return removed
        for d in self._log.committed_batches(self._TABLE):
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
