"""Incremental Bloom membership state — the cross-crawl dedup ledger.

The one-shot bloom (operators/sketches.bloom_build) answers "is this
value in THAT corpus"; operations need "has ANY earlier crawl seen this
value", a question whose state must survive across batches and grow by
deltas.  This module persists the bloom as parquet word tables under
the shared BatchCommitLog protocol (storage.py) and ORs them together
at read time:

- append cost: one pass over the batch, shuffling ≤ bit-budget/63
  rows — independent of how many batches precede it;
- read-side merge is a groupBy(word).bit_or over Σ batch word tables,
  bounded by batches × m/63 rows (``compact()`` collapses the history
  back to ≤ m/63 under the same marker protocol when that sum grows);
- because bit_or is associative and commutative, **incremental ==
  one-shot EXACTLY** — not "superset under a cap caveat" like the
  MinHash index, but bit-identical state for any batch split
  (tests/test_incremental_bloom.py pins it) — so probe results are
  exactly the one-shot bloom's, false positives included.

The filter only grows (no deletes): that is the Bloom contract, and
for its pipeline use — "quarantine what any earlier crawl contained" —
monotone is correct.  Erasure of a KEY from the corpus doesn't require
unseeing its membership; if it ever did, rebuild from the surviving
corpus (the build is one pass).

Parameters (num_bits, num_hashes) are frozen into ``_meta.json``;
probing with different parameters than the stored words would silently
produce garbage, so mismatches raise.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cdc_demo_spark.operators.sketches import bloom_build, bloom_probe
from cdc_demo_spark.storage import (  # noqa: F401  (re-export)
    DEFAULT_BACKEND,
    BatchCommitLog,
    CommitBackend,
    ConcurrentAppendError,
    claim_ownership_mode,
)


class BloomIndex:
    def __init__(
        self,
        spark: SparkSession,
        path: str,
        num_bits: int = 1 << 20,
        num_hashes: int = 4,
        backend: CommitBackend = DEFAULT_BACKEND,
    ) -> None:
        self.spark = spark
        self.path = path
        self.backend = backend
        self._log = BatchCommitLog(path, backend)
        # compactions commit under their OWN log: they used to claim
        # ids in the words batch space, where an epoch-keyed streaming
        # append (batch_id=N) would find a compaction's marker at N
        # claimed and silently skip that epoch's data
        self._clog = BatchCommitLog(os.path.join(path, "compactions"), backend)
        meta_path = os.path.join(path, "_meta.json")
        meta = {"num_bits": num_bits, "num_hashes": num_hashes}
        if not backend.put_if_absent(meta_path, json.dumps(meta).encode()):
            stored = json.loads(backend.read(meta_path))
            if stored != meta:
                raise ValueError(
                    f"index at {path} was built with {stored}, probed with {meta}"
                )
        self.num_bits, self.num_hashes = num_bits, num_hashes

    # -- storage ------------------------------------------------------

    def _or_merged(self, dirs: list[str]) -> DataFrame:
        if not dirs:
            return self.spark.createDataFrame([], "word long, bits long")
        return (
            self.spark.read.parquet(*dirs)
            .groupBy("word")
            .agg(F.bit_or("bits").alias("bits"))
        )

    def words(self) -> DataFrame:
        """The merged filter: (word long, bits long), ≤ num_bits/63
        rows.  OR-merge across committed batch tables AND compaction
        tables (separate log — see compact()); an empty index is an
        empty frame (every probe misses)."""
        return self._or_merged(
            self._log.committed_batches("words") + self._clog.committed_batches("words")
        )

    # -- the operator -------------------------------------------------

    def append_batch(
        self, df: DataFrame, value_col: str, batch_id: int | None = None
    ) -> bool:
        """Admit a batch's values.  Idempotent in CONTENT (OR-ing the
        same values twice is a no-op) but not in storage (a retried
        append lands a second word table; compact() reclaims it).

        ``batch_id`` keys the commit to a caller-owned epoch (e.g. a
        foreachBatch batch id): a replayed epoch is skipped (returns
        False), saving the redundant build + word table that plain
        replay would land — for Bloom an efficiency, for the SUM-merged
        CountMinIndex the same keying is a CORRECTNESS requirement
        (see its append_batch).  Returns True iff this call committed.

        Ownership contract: one index is EITHER stream-owned (every
        append passes the stream's epoch id) or batch-owned (auto
        ids), never both — an auto-id append claims max+1, which a
        future epoch id can equal, making that epoch skip as a
        \"replay\".  ENFORCED: the first append records its mode and a
        mixed-mode call raises (storage.claim_ownership_mode)."""
        import uuid

        claim_ownership_mode(
            self.backend, self.path, "auto" if batch_id is None else "epoch"
        )
        if batch_id is not None and self.backend.exists(self._log.marker(batch_id)):
            return False  # epoch already committed — skip the rebuild
        batch_words = bloom_build(df, value_col, self.num_bits, self.num_hashes)
        n = self._log.next_batch_id("words") if batch_id is None else int(batch_id)
        uid = uuid.uuid4().hex[:8]
        batch_words.write.mode("overwrite").parquet(
            os.path.join(self.path, "words", f"batch={n}-{uid}")
        )
        try:
            self._log.claim(n, uid)
        except ConcurrentAppendError:
            if batch_id is None:
                raise
            return False  # epoch raced a replay; content is identical
        return True

    def probe(self, df: DataFrame, value_col: str) -> DataFrame:
        """`df` + boolean ``bloom_member`` — exactly the one-shot
        bloom's answer over the union of all admitted batches."""
        return bloom_probe(df, value_col, self.words(), self.num_bits, self.num_hashes)

    def compact(self) -> None:
        """Collapse the committed history into one merged word table,
        admitted under the compaction log's marker protocol.  Old
        batch tables stay referenced (readers started before the
        compaction still see consistent state; bit_or re-merging them
        with the compacted table is a no-op), so compaction is safe at
        any time; ``gc()`` reclaims the superseded dirs once no
        pre-compaction reader can remain.  The separate log keeps
        compaction ids out of the words batch space, where they would
        collide with caller-owned epoch ids (append_batch(batch_id=
        ...)) and make a future epoch silently skip.

        The merge reads ONE consistent listing (not a re-list at
        action time), and a ``covered/<n>-<uid>`` sidecar records
        exactly which dirs it absorbed — written BEFORE the marker
        claim and keyed by THIS attempt's uid, so the sidecar gc()
        later trusts is always the one written by the compactor whose
        marker actually won (an id-only sidecar could be a losing
        rival's listing, crediting the winner with dirs its merged
        table never absorbed — gc would then delete live bits and
        manufacture false negatives).  A crashed or losing attempt
        leaves only unreferenced garbage.  No-op when nothing has
        landed since the last compaction — including BEFORE gc() has
        reclaimed the absorbed dirs: the newest compaction's covered
        sidecar is the freshness authority, so compact();compact()
        without an intervening gc() does not rewrite the full merged
        table again or burn a second compaction id (the CountMin
        ledger got this check first; ADVICE r7)."""
        import uuid

        w_dirs = self._log.committed_batches("words")
        c_dirs = self._clog.committed_batches("words")
        if not w_dirs and len(c_dirs) <= 1:
            return  # nothing new to absorb — avoid a do-nothing rewrite
        bid = BatchCommitLog.batch_id_of
        if c_dirs:
            newest = max(c_dirs, key=bid)
            sidecar = os.path.join(
                self.path, "compactions", "covered",
                os.path.basename(newest).split("=")[1],
            )
            if self.backend.exists(sidecar):
                cov = json.loads(self.backend.read(sidecar))
                if {bid(d) for d in w_dirs} <= set(cov["words"]) and {
                    bid(d) for d in c_dirs if d != newest
                } <= set(cov["compactions"]):
                    return  # newest compaction already absorbed all of this
        merged = self._or_merged(w_dirs + c_dirs).localCheckpoint(eager=True)
        n = self._clog.next_batch_id("words")
        uid = uuid.uuid4().hex[:8]
        merged.write.mode("overwrite").parquet(
            os.path.join(self.path, "compactions", "words", f"batch={n}-{uid}")
        )
        if not self.backend.put_if_absent(
            os.path.join(self.path, "compactions", "covered", f"{n}-{uid}"),
            json.dumps(
                {
                    "words": sorted(bid(d) for d in w_dirs),
                    "compactions": sorted(bid(d) for d in c_dirs),
                }
            ).encode(),
        ):
            # the key embeds THIS attempt's fresh uid, so an occupant
            # means backend corruption, not a race; committing without
            # the sidecar would make gc() unable to prove absorption
            # and compact() unable to prove freshness — fail loudly
            raise ConcurrentAppendError(
                f"covered sidecar {n}-{uid} at {self.path} already exists; "
                "refusing to claim a compaction whose absorption set is lost"
            )
        self._clog.claim(n, uid, what="compaction")

    def gc(self, orphan_ttl_seconds: float | None = None) -> list[str]:
        """Reclaim batch and older-compaction dirs the NEWEST committed
        compaction has absorbed (its uid-keyed sidecar lists them;
        their bits are all in its merged table).  Returns the removed
        paths.

        With ``orphan_ttl_seconds``, ALSO sweeps never-published staged
        dirs older than that horizon — crashed appenders' and losing
        racers' ``batch=<n>-<uid>`` dirs in both the words and the
        compactions batch spaces, plus losing compactors' covered
        sidecars — which no marker references and the absorption path
        above therefore never reclaims (they would otherwise leak
        forever).  The horizon must exceed the longest possible
        stage-to-claim gap of a LIVE appender; see
        BatchCommitLog.orphan_batch_dirs.  Default None keeps gc purely
        marker-driven (no wall-clock reasoning).

        Caller contract: no reader started before that compaction may
        still be running (same quiesce contract as the silver
        manifest's bucket-version GC).  Markers stay — ids remain
        burned, and a replayed epoch whose word table was gc'd still
        skips (its marker is its dedup identity, not its data)."""
        import shutil

        bid = BatchCommitLog.batch_id_of
        removed = []
        if orphan_ttl_seconds is not None:
            for log in (self._log, self._clog):
                for d in log.orphan_batch_dirs("words", orphan_ttl_seconds):
                    shutil.rmtree(d, ignore_errors=True)
                    removed.append(d)
            removed += self._sweep_orphan_sidecars(orphan_ttl_seconds)
        c_dirs = self._clog.committed_batches("words")
        if not c_dirs:
            return removed
        newest = max(c_dirs, key=bid)
        # sidecar key = the WINNER's (n, uid), read off its marker-published
        # dir name — a losing rival's sidecar has a different uid
        sidecar = os.path.join(
            self.path, "compactions", "covered",
            os.path.basename(newest).split("=")[1],
        )
        if not self.backend.exists(sidecar):
            return removed  # pre-sidecar compaction: nothing provably absorbed
        covered = json.loads(self.backend.read(sidecar))
        for log, key in ((self._log, "words"), (self._clog, "compactions")):
            for d in log.committed_batches("words"):
                if bid(d) in set(covered[key]):
                    shutil.rmtree(d, ignore_errors=True)
                    removed.append(d)
        return removed

    def _sweep_orphan_sidecars(self, ttl: float) -> list[str]:
        """Covered sidecars whose ``<n>-<uid>`` no compaction marker
        publishes (the compactor crashed pre-claim or lost the claim
        race), past the same age horizon as the dir sweep.  Sidecars
        live in the backend, so age comes from the POSIX mtime when the
        object is fs-backed; a backend with no fs footprint just keeps
        them (bytes-sized, harmless)."""
        import time

        root = os.path.join(self.path, "compactions", "covered")
        now = time.time()
        removed = []
        for name in self.backend.list_dir(root):
            n, _, uid = name.partition("-")
            if not n.isdigit() or not uid:
                continue
            marker = self._clog.marker(int(n))
            if self.backend.exists(marker) and self.backend.read(marker).decode() == uid:
                continue  # the winner's sidecar — load-bearing for gc
            full = os.path.join(root, name)
            try:
                if now - os.path.getmtime(full) < ttl:
                    continue
            except OSError:
                continue  # no fs footprint (in-memory backend): keep
            self.backend.delete(full)
            removed.append(full)
        return removed


def bloom_sink(index: BloomIndex, value_col: str):
    """foreachBatch adapter: ``.writeStream.foreachBatch(bloom_sink(
    idx, "sh"))`` grows the membership ledger from a stream; the batch
    id keys each commit so at-least-once redelivery skips instead of
    landing duplicate word tables."""

    def process(batch_df: DataFrame, batch_id: int) -> None:
        index.append_batch(batch_df, value_col, batch_id=int(batch_id))

    return process
