"""Multi-table covered-set compaction for the pair indexes.

The incremental pair indexes (MinHashIndex, SemanticIndex) append one
batch dir PER STATE TABLE per delta, so after K crawl deltas every
probe unions K dirs per table: K listings, K parquet reads, K tiny
shard layouts — an O(n_appends) read-side term that a year of daily
deltas turns into hundreds of dirs, and (worse for the tile GEMM) a
10k delta spread over 2048 buckets leaves ~5-row tiles whose fixed
per-tile cost dominates the scan.  The additive ledgers already
solved the read-side growth with covered-set checkpoints
(operators/additive_ledger.py); this module extends that protocol to
MULTI-TABLE state whose rows are disjoint-append (no SUM merge):

- ``compact()`` rewrites ONE consistent listing of every state table
  into per-table ``<table>/ckpt=<seq>-<uid>`` dirs, then claims ONE
  marker ``checkpoints/<seq>`` (storage.CheckpointLog — same marker
  format as the ledgers) recording the EXACT batch-id set it merged;
- readers take the newest valid checkpoint (valid = every table's
  ckpt dir has data) plus every committed batch OUTSIDE its covered
  set — a batch committed after the listing, or by a stalled appender
  at any id, stays readable (never-underestimate, as in the ledgers);
- the rewrite is also a REPAIR pass: shingle shards re-size to the
  full corpus (per-batch moduli were sized to their batch) and
  semantic tiles re-pack to full occupancy from merged members +
  quantized — state quality after compaction equals a fresh one-shot
  build's, which is the property that makes incremental operation
  sustainable instead of merely correct;
- ``gc()`` reclaims covered batch dirs and superseded checkpoint
  dirs; with an ``orphan_ttl_seconds`` horizon it also sweeps staged
  batch dirs and same-seq rival checkpoint dirs no marker publishes.

Consistency argument for the snapshot: the PRIMARY table (the one the
append claims its batch id from) is listed FIRST; any batch id in
that listing has its marker claimed, and every table's dirs are fully
written BEFORE the marker (BatchCommitLog protocol), so the other
tables' listings — taken after — must contain those ids.  Ids that
appear only in a LATER listing (a batch committed mid-snapshot) are
dropped from the snapshot and stay outside the covered set.
Concurrency: appends are one-writer-at-a-time by the index contract;
a compactor may run concurrently with an append (the covered set
protects the racing batch) and racing compactors serialize on the
checkpoint marker — the loser raises, its dirs are orphan garbage.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

from cdc_demo_spark.storage import (
    BatchCommitLog,
    CheckpointLog,
    CommitBackend,
)


class PairsLog:
    """The exactly-once OUTPUT log of a stream-fed pair index: each
    epoch's verified pairs land under ``pairs/batch=<n>-<uid>`` inside
    the SAME single-marker commit as the epoch's state, so a replayed
    epoch reads its pairs back instead of recomputing — replay-stable
    output.  Shared by MinHashIndex and SemanticIndex (one schema
    parameter apart); the pairs table is results, not probe state, so
    compaction never covers it and gc touches only a losing racer's
    unpublished dirs (TTL orphan sweep)."""

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        backend: CommitBackend,
        log: BatchCommitLog,
        schema: str,
    ) -> None:
        self.spark = spark
        self.path = path
        self.backend = backend
        self._log = log
        self.schema = schema

    def write(self, pairs: DataFrame, n: int, uid: str) -> None:
        """Stage epoch ``n``'s pairs; the caller claims the marker."""
        pairs.write.mode("overwrite").parquet(
            os.path.join(self.path, "pairs", f"batch={n}-{uid}")
        )

    def batch(self, n: int) -> DataFrame:
        """The pairs committed for batch ``n``, or an empty frame if
        that epoch kept its pairs ephemeral — what a REPLAYED epoch
        returns, so a consumer that persists sees replay-stable
        output."""
        empty = self.spark.createDataFrame([], self.schema)
        try:
            uid = self.backend.read(self._log.marker(n)).decode()
        except OSError:
            return empty
        d = os.path.join(
            self.path, "pairs", f"batch={n}-{uid}" if uid else f"batch={n}"
        )
        if self.backend.list_data_dir(d):
            return self.spark.read.schema(self.schema).parquet(d)
        return empty

    def all(self) -> DataFrame:
        """Every committed batch's persisted pairs."""
        dirs = self._log.committed_batches("pairs")
        if not dirs:
            return self.spark.createDataFrame([], self.schema)
        return self.spark.read.schema(self.schema).parquet(*dirs)

    def sweep_orphans(self, ttl_seconds: float) -> list[str]:
        """A losing epoch racer's unpublished pairs dir is orphan
        garbage like any staged dir; the TTL arm reclaims it."""
        import shutil

        removed = []
        for d in self._log.orphan_batch_dirs("pairs", ttl_seconds):
            shutil.rmtree(d, ignore_errors=True)
            removed.append(d)
        return removed

    def cleanse(self, keep) -> int:
        """Right-to-be-forgotten over the OUTPUT log: rewrite every
        committed pairs dir in place, keeping only rows matching
        ``keep`` (a Column predicate).  The one sanctioned mutation of
        an immutable-by-convention dir — same stance as the silver
        erasure's selective partition swaps (streaming/erasure.py).
        Idempotent and crash-recoverable: re-running an interrupted
        cleanse first recovers any half-finished swap from its
        deterministic tmp/old names."""
        recover_erase_swaps(os.path.join(self.path, "pairs"))
        n = 0
        for d in self._log.committed_batches("pairs"):
            rewrite_dir_inplace(self.spark, self.schema, d, keep)
            n += 1
        return n


def rewrite_dir_inplace(spark: SparkSession, schema: str, d: str, keep) -> None:
    """Filtered in-place rewrite of one parquet dir via staged write +
    two renames.  Crash windows leave the deterministic ``.erase-tmp``
    / ``.erase-old`` names that recover_erase_swaps repairs; content is
    complete before any rename happens.  The renames are DATA-PLANE
    operations on bytes Spark wrote (same stance as
    streaming/erasure.py's partition swaps) — commit METADATA never
    moves, so the backend seam's rename-less contract is untouched; an
    object-store port does copy+delete here, as it must for any
    data-file rewrite."""
    import shutil

    tmp, old = d + ".erase-tmp", d + ".erase-old"
    spark.read.schema(schema).parquet(d).filter(keep).write.mode(
        "overwrite"
    ).parquet(tmp)
    os.rename(d, old)
    os.rename(tmp, d)
    shutil.rmtree(old, ignore_errors=True)


def recover_erase_swaps(root: str) -> None:
    """Repair interrupted rewrite_dir_inplace swaps under ``root``:
    a lingering ``.erase-old`` beside a live dir means the swap
    finished (drop the old); an ``.erase-old`` WITHOUT the live dir
    means the crash hit between the renames (roll the old back); a
    lone ``.erase-tmp`` is an incomplete stage (drop it)."""
    import shutil

    if not os.path.isdir(root):
        return
    for name in os.listdir(root):
        p = os.path.join(root, name)
        if name.endswith(".erase-old"):
            live = p[: -len(".erase-old")]
            if os.path.isdir(live):
                shutil.rmtree(p, ignore_errors=True)
            else:
                os.rename(p, live)
        elif name.endswith(".erase-tmp"):
            shutil.rmtree(p, ignore_errors=True)


@dataclass
class Snapshot:
    """One consistent multi-table listing: the dirs that together hold
    the current state, keyed by table, plus the covered/fresh split
    the compactor claims from."""

    seq: int
    covered: frozenset[int]
    fresh: list[int]
    dirs: dict[str, list[str]]


class TableCheckpoints:
    """Checkpoint bookkeeping over a pair index's state tables.

    ``tables`` maps every state table the index owns; ``primary`` is
    the table whose batch ids drive the listing (the one
    ``next_batch_id`` is claimed against).  ``include_legacy`` mirrors
    the index's own reader (MinHashIndex accepts pre-marker
    ``_COMMITTED`` dirs)."""

    def __init__(
        self,
        path: str,
        backend: CommitBackend,
        log: BatchCommitLog,
        tables: tuple[str, ...],
        primary: str,
        include_legacy: bool = False,
    ) -> None:
        self.path = path
        self.backend = backend
        self._log = log
        self.tables = tables
        self.primary = primary
        self.include_legacy = include_legacy
        self._ckpt_log = CheckpointLog(path, backend)

    # -- naming -------------------------------------------------------

    def ckpt_dir(self, table: str, seq: int, uid: str) -> str:
        return os.path.join(self.path, table, f"ckpt={seq}-{uid}")

    # -- read side ----------------------------------------------------

    def latest(self) -> tuple[int, str | None, frozenset[int]]:
        def valid(seq: int, uid: str) -> bool:
            return all(
                self.backend.list_data_dir(self.ckpt_dir(t, seq, uid))
                for t in self.tables
            )

        return self._ckpt_log.latest(valid)

    def state_dirs(self, table: str) -> list[str]:
        """The dirs that together hold ``table``'s current state:
        newest valid checkpoint (if any) + every committed batch dir
        outside its covered set."""
        seq, uid, covered = self.latest()
        dirs = [] if uid is None else [self.ckpt_dir(table, seq, uid)]
        for d in self._log.committed_batches(table, self.include_legacy):
            if BatchCommitLog.batch_id_of(d) not in covered:
                dirs.append(d)
        return dirs

    # -- compact side ---------------------------------------------------

    def snapshot(self) -> Snapshot:
        """One consistent listing across all tables (see the module
        docstring's consistency argument): the primary table's
        uncovered committed ids are canonical; other tables contribute
        only dirs for those ids."""
        seq, uid, covered = self.latest()
        primary_dirs = [
            d
            for d in self._log.committed_batches(self.primary, self.include_legacy)
            if BatchCommitLog.batch_id_of(d) not in covered
        ]
        fresh = sorted(BatchCommitLog.batch_id_of(d) for d in primary_dirs)
        fresh_set = set(fresh)
        dirs: dict[str, list[str]] = {self.primary: primary_dirs}
        for t in self.tables:
            if t == self.primary:
                continue
            dirs[t] = [
                d
                for d in self._log.committed_batches(t, self.include_legacy)
                if BatchCommitLog.batch_id_of(d) in fresh_set
            ]
        if uid is not None:
            for t in self.tables:
                dirs[t].insert(0, self.ckpt_dir(t, seq, uid))
        return Snapshot(seq=seq, covered=covered, fresh=fresh, dirs=dirs)

    def next_seq(self) -> int:
        return self._ckpt_log.next_seq()

    def claim(self, seq: int, uid: str, covered) -> None:
        self._ckpt_log.claim(seq, uid, covered)

    # -- gc -------------------------------------------------------------

    def gc(self, orphan_ttl_seconds: float | None = None) -> list[str]:
        """Reclaim what the newest checkpoint supersedes: covered batch
        dirs (every table) and older-seq checkpoint dirs.  With a TTL,
        also sweep never-published garbage the marker-driven arms can't
        reach: crashed/losing appenders' staged batch dirs and
        same-seq rival checkpoint dirs whose marker records a
        different uid.  Batch MARKERS stay — ids remain burned for
        next_batch_id and the covered set.  Caller contract: no reader
        started before the checkpoint may still be running (the same
        quiesce contract as the ledgers and the silver manifest gc)."""
        import shutil
        import time

        removed: list[str] = []
        if orphan_ttl_seconds is not None:
            for t in self.tables:
                for d in self._log.orphan_batch_dirs(t, orphan_ttl_seconds):
                    shutil.rmtree(d, ignore_errors=True)
                    removed.append(d)
        seq, uid, covered = self.latest()
        now = time.time()
        for t in self.tables:
            root = os.path.join(self.path, t)
            for name in sorted(self.backend.list_data_dir(root)):
                full = os.path.join(root, name)
                if not name.startswith("ckpt=") or not os.path.isdir(full):
                    continue
                m, _, cuid = name.split("=", 1)[1].partition("-")
                if int(m) < seq:
                    shutil.rmtree(full, ignore_errors=True)
                    removed.append(full)
                elif (
                    orphan_ttl_seconds is not None
                    and self._ckpt_log.rival_uid(int(m), cuid)
                ):
                    try:
                        old = now - os.path.getmtime(full) >= orphan_ttl_seconds
                    except OSError:
                        continue
                    if old:
                        shutil.rmtree(full, ignore_errors=True)
                        removed.append(full)
        if uid is None:
            return removed
        for t in self.tables:
            for d in self._log.committed_batches(t, self.include_legacy):
                n = BatchCommitLog.batch_id_of(d)
                if n not in covered:
                    continue
                if "-" not in os.path.basename(d):
                    # LEGACY pre-marker dir: its id is burned only by
                    # the dir itself (no marker in commits/), so
                    # removing it would let next_batch_id REUSE the id
                    # — and the covered set would then swallow the new
                    # batch as superseded: committed-but-invisible,
                    # silent data loss.  Burn the id with an empty-uid
                    # marker BEFORE the rmtree; if a marker already
                    # exists it must be a previous gc's burn (legacy
                    # and marker ids are disjoint by next_batch_id) —
                    # anything else is corruption, leave the dir.
                    if not self.backend.put_if_absent(
                        self._log.marker(n), b""
                    ) and self.backend.read(self._log.marker(n)) != b"":
                        continue
                shutil.rmtree(d, ignore_errors=True)
                removed.append(d)
        return removed
