"""Incremental MinHash-LSH near-duplicate index.

One-shot corpus dedup (``minhash_near_duplicates``) re-shingles and
re-pairs the WHOLE corpus every run — the right shape for a first build,
the wrong one for operations: a 100 TB corpus grows by daily crawl
deltas that are ~0.1% of its size, and re-clustering 100 TB to admit
100 GB is a non-starter. This module persists the LSH state (band
buckets + hashed shingles + set sizes) as parquet and lets each new
batch probe ONLY the buckets it lands in:

- probe cost ~ O(|batch| × bucket occupancy), independent of corpus
  size except through bucket width;
- the corpus-side tables are touched join-wise (the band/bucket join
  keys drive which stored rows matter — at cluster scale you'd bucket
  the stored table BY (band, bucket) so the probe co-locates without a
  full shuffle; plain parquet keeps this demo filesystem-only);
- verification reads shingles for candidate ids only (semi-join
  reduction before the intersection count).

Batches append under ``batch=<n>/`` subdirectories, so a crashed append
is invisible to readers until its commit marker exists — same
garbage-not-corruption contract as the CDC silver manifest
(streaming/merge.py), in miniature.  One BATCH-LEVEL marker
(``commits/<n>``) spans both state tables: the per-table markers this
replaced could expose a batch's bucket ids without their shingles
after a crash between the two writes, and candidates without shingles
silently lose every pair they should have verified.  Markers are
claimed with the storage backend's put-if-absent
(cdc_demo_spark.storage — POSIX link today, conditional create on an
object store), so two appends racing to one batch id fail loudly
(ConcurrentAppendError) instead of interleaving state.  Concurrency
contract: one writer at a time; the marker enforces it.

Parameters (k, num_hashes, bands, threshold) are frozen into
``_meta.json`` at creation; probing with different parameters than the
stored signatures would silently produce garbage, so mismatches raise.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cdc_demo_spark.operators.dedup import (
    hashed_shingles,
    minhash_signatures,
)
from cdc_demo_spark.storage import (  # noqa: F401  (re-export)
    DEFAULT_BACKEND,
    BatchCommitLog,
    CommitBackend,
    ConcurrentAppendError,
    claim_ownership_mode,
)


# Stored-shingle shard layout (r8, now the shared
# operators/shard_layout helpers): verification fetches the shingles
# of CANDIDATE ids only — a few hundred per typical delta — but r7 read
# them by scanning every stored shingle row map-side (35M rows at the
# 200k-doc grain, measured ~1.5 s/append and linear in corpus size).
# Each batch dir partitions its shingles by shard = pmod(id, nshards),
# nshards sized so a shard holds ~_SHARD_ROWS rows, recorded in a
# per-dir ``_nshards`` sidecar.  A probe collects its candidate ids
# (cap-guarded), computes each dir's touched shards, and reads ONLY
# those partitions — bytes ∝ |candidate ids| × shard size, FLAT in
# corpus size (nshards grows with the batch instead of shard size).
from cdc_demo_spark.operators.compaction import PairsLog, TableCheckpoints
from cdc_demo_spark.operators.suppression import SuppressionLedger
from cdc_demo_spark.operators.shard_layout import (
    n_shards,
    nshards_of,
    shard_files,
    write_nshards_sidecar,
    write_sharded,
)

_SHARD_ROWS = 32_768
# Above this many candidate ids the isin-literal plan stops being a
# win (every shard is touched anyway once |ids| ≫ nshards) — fall back
# to the full-scan join, which is what r7 always did.
_CAND_ID_CAP = 5_000


def _shingle_shards(rows: int) -> int:
    return n_shards(rows, _SHARD_ROWS)


class MinHashIndex:
    def __init__(
        self,
        spark: SparkSession,
        path: str,
        k: int = 3,
        num_hashes: int = 64,
        bands: int = 16,
        threshold: float = 0.5,
        max_bucket: int = 200,
        backend: CommitBackend = DEFAULT_BACKEND,
    ) -> None:
        self.spark = spark
        self.path = path
        self.backend = backend
        self._log = BatchCommitLog(path, backend)
        self._ckpts = TableCheckpoints(
            path, backend, self._log,
            tables=("buckets", "shingles"), primary="buckets",
            include_legacy=True,
        )
        meta_path = os.path.join(path, "_meta.json")
        meta = {
            "k": k,
            "num_hashes": num_hashes,
            "bands": bands,
            "threshold": threshold,
            "max_bucket": max_bucket,
        }
        # put-if-absent then verify: racing creators with identical
        # params both succeed; a param mismatch raises for the loser.
        if not backend.put_if_absent(meta_path, json.dumps(meta).encode()):
            stored = json.loads(backend.read(meta_path))
            if stored != meta:
                raise ValueError(
                    f"index at {path} was built with {stored}, probed with {meta}"
                )
        self.k, self.num_hashes, self.bands = k, num_hashes, bands
        self.rows = num_hashes // bands
        self.threshold, self.max_bucket = threshold, max_bucket
        self.suppression = SuppressionLedger(path, backend)

    # -- storage ------------------------------------------------------
    # Batch publication delegates to the shared BatchCommitLog
    # (storage.py); only the legacy pre-marker ``_COMMITTED`` layout is
    # index-specific.

    def _committed_batches(self, table: str) -> list[str]:
        """Marker-published batch dirs, plus legacy per-table
        ``_COMMITTED`` dirs for indexes written before the scheme
        (the legacy filter lives on BatchCommitLog, shared with
        IvfIndex)."""
        return self._log.committed_batches(table, include_legacy=True)

    def _state_dirs(self, table: str) -> list[str]:
        """The dirs that together hold `table`'s CURRENT state: the
        newest compaction checkpoint (if any) + every committed batch
        outside its covered set (operators/compaction.py)."""
        return self._ckpts.state_dirs(table)

    def _read(self, table: str, schema: str) -> DataFrame:
        dirs = self._state_dirs(table)
        if not dirs:
            return self.spark.createDataFrame([], schema)
        # explicit schema: a zero-row epoch's batch dir holds only
        # _SUCCESS, and inference over a dir set where EVERY dir is
        # empty (first epoch quiet) throws UNABLE_TO_INFER_SCHEMA
        return self.spark.read.schema(schema).parquet(*dirs)

    def _nshards_of(self, batch_dir: str) -> int:
        """Shared shard-layout sidecar read (operators/shard_layout)."""
        return nshards_of(self.backend, batch_dir)

    def _shard_files(self, d: str, shards: list[int] | None) -> list[str]:
        """Shared shard-file discovery (operators/shard_layout) —
        direct listing through the backend seam; handing Spark the
        batch-dir root instead costs a full partition discovery +
        footer-inference pass (measured 3 s per read at 2048 shard
        dirs, dwarfing the 0.15 s pruned scan it gates)."""
        return shard_files(self.backend, d, shards)

    def stored_shingles(
        self,
        cand_ids: list[int] | None = None,
        dirs: list[str] | None = None,
    ) -> DataFrame:
        """Stored (id, h64) rows across the current state dirs
        (checkpoint + uncovered batches), restricted to ``cand_ids``
        when given.  Sharded dirs (see module constants) are read
        per-dir so each prunes to the candidates' OWN shard partitions
        under its own modulus — the bytes read are ∝ |cand_ids| ×
        shard size, not corpus size.  Dirs are unioned (not multi-path
        read): dirs can mix shard moduli and legacy unsharded layouts,
        which a single partition-discovery pass would reject.
        ``dirs`` overrides the listing (compact()'s consistent
        snapshot reads from exactly the dirs it will cover)."""
        if dirs is None:
            dirs = self._state_dirs("shingles")
        empty = self.spark.createDataFrame([], "id long, h64 long")
        if not dirs:
            return empty
        out = None
        for d in dirs:
            ns = self._nshards_of(d)
            if ns > 1:
                shards = None
                if cand_ids is not None:
                    shards = sorted({(i % ns + ns) % ns for i in cand_ids})
                files = self._shard_files(d, shards)
                if not files:
                    continue
                sub = self.spark.read.schema("id long, h64 long").parquet(*files)
            else:
                sub = self.spark.read.schema("id long, h64 long").parquet(d)
            if cand_ids is not None:
                sub = sub.filter(F.col("id").isin(cand_ids))
            sub = sub.select("id", "h64")
            out = sub if out is None else out.unionByName(sub)
        return out if out is not None else empty

    # -- the operator -------------------------------------------------

    def _band_buckets(self, sigs: DataFrame) -> DataFrame:
        entries = F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(self.bands - 1)),
                lambda b: F.struct(
                    b.alias("band"),
                    # xxhash64(e1..ek) == xxhash64(slice) exactly; see
                    # dedup.lsh_candidate_pairs (stored buckets keep
                    # their values — appends stay compatible)
                    F.xxhash64(
                        *[F.element_at(F.col("signature"), b * self.rows + 1 + i)
                          for i in range(self.rows)]
                    ).alias("bucket"),
                ),
            )
        )
        return sigs.select("id", entries.alias("e")).select(
            "id", F.col("e.band").alias("band"), F.col("e.bucket").alias("bucket")
        )

    _PAIRS_SCHEMA = "id_a long, id_b long, jaccard double"

    @property
    def _pairs_log(self) -> PairsLog:
        """Shared pairs-output-log machinery (operators/compaction.py)."""
        return PairsLog(self.spark, self.path, self.backend, self._log, self._PAIRS_SCHEMA)

    def _stored_pairs(self, n: int) -> DataFrame:
        """The pairs batch ``n`` persisted under its commit marker
        (``persist_pairs``) — what a REPLAYED epoch returns."""
        return self._pairs_log.batch(n)

    def stored_pairs(self) -> DataFrame:
        """Every committed batch's persisted pairs (the exactly-once
        output log of a stream-fed index)."""
        return self._pairs_log.all()

    def append_batch(
        self,
        docs: DataFrame,
        id_col: str = "doc_id",
        text_col: str = "text",
        batch_id: int | None = None,
        persist_pairs: bool = False,
    ) -> DataFrame:
        """Probe `docs` against the stored corpus AND each other, then
        admit them to the index. Returns verified near-dup pairs
        (id_a < id_b, jaccard) where at least one side is new. Ids must
        be globally unique across all batches (caller's contract —
        they're the dedup identity).

        ``batch_id`` keys the commit to a CALLER-owned epoch (e.g. a
        Structured Streaming foreachBatch batch id) — what makes an
        at-least-once stream feed this index exactly-once: a replayed
        epoch finds its marker claimed and is SKIPPED before the build
        even runs (replaying would DOUBLE the epoch's shingle rows,
        inflating every future Jaccard denominator — the pair-index
        twin of the ledgers' double-count hazard).  The replay returns
        the epoch's persisted pairs (``persist_pairs`` lands them
        under ``pairs/batch=<n>-<uid>`` inside the same single-marker
        commit) or an empty frame if the winner kept them ephemeral.
        One index is EITHER stream-owned (every append passes the
        epoch id) or batch-owned (auto ids), never both — enforced
        loudly, including refusal to adopt a pre-ownership history as
        epoch-owned (storage.claim_ownership_mode).

        Cap-crossing caveat: the ``max_bucket`` skew guard is evaluated
        against COMBINED occupancy at probe time. Pairs admitted while a
        (band, bucket) was under the cap are never retracted after later
        batches push it over, whereas a one-shot run over the union
        drops the whole bucket. Incremental == one-shot therefore holds
        exactly only when no bucket crosses the cap between batches
        (tests/test_incremental_dedup.py asserts this precondition on
        its fixture); on a cap-crossing corpus the incremental result is
        a superset restricted to early-admitted pairs — still verified
        pairs, just not bit-identical to the one-shot pipeline."""
        claim_ownership_mode(
            self.backend, self.path, "auto" if batch_id is None else "epoch"
        )
        if batch_id is not None and self.backend.exists(
            self._log.marker(int(batch_id))
        ):
            # replayed epoch: skip the whole build, not just the write
            return self._stored_pairs(int(batch_id))
        # Append-intent fence (storage.py): published BEFORE the
        # suppression-ledger read, closed after the commit on every
        # exit path.  A racing erase(suppress=True) drains the intents
        # it observed at record() time before trusting its verify, so
        # an append whose ledger read predates the record can never
        # claim its marker after the erase reported success.
        intent = self._log.open_intent()
        try:
            return self._probe_and_admit(
                docs, id_col, text_col, batch_id, persist_pairs
            )
        finally:
            self._log.close_intent(intent)

    def _probe_and_admit(
        self,
        docs: DataFrame,
        id_col: str,
        text_col: str,
        batch_id: int | None,
        persist_pairs: bool,
    ) -> DataFrame:
        """append_batch's body past the intent fence — see its doc."""
        # takedown ledger (suppression.py): a suppressed id never
        # re-enters probe state or the pairs log as "new" data
        docs = self.suppression.filter_batch(docs, id_col)
        sh_new = hashed_shingles(docs, id_col, text_col, self.k).cache()
        sigs = minhash_signatures(
            docs, id_col, text_col, self.k, self.num_hashes, shingles_df=sh_new
        )
        new_buckets = self._band_buckets(sigs).cache()
        old_buckets = self._read("buckets", "id long, band int, bucket long")

        # Everything below only matters for (band, bucket) keys the NEW
        # batch lands in: an untouched bucket can produce no candidate
        # pair, and the skew cap only gates rows through joins with
        # probe rows.  Restricting the stored side FIRST (broadcast
        # semi-join on the batch's ~|batch|·bands keys) turns both the
        # occupancy aggregate and the candidate join's build side from
        # full-corpus shuffles (O(corpus·bands) rows per append — the
        # dominant cost of the 200k-grain bench entry) into map-side
        # filtered scans whose surviving rows are proportional to the
        # probed buckets' occupancy.  Combined counts are unchanged:
        # the semi-join keeps EVERY stored row of a probed bucket.
        probe_keys = new_buckets.select("band", "bucket").distinct()
        # The broadcast hint bypasses Spark's size guard, so gate it on
        # the batch's actual key volume: |new_buckets| = |batch|·bands
        # (cached above, so the count is cheap) bounds the distinct key
        # set.  A typical delta (5k docs × 16 bands = 80k keys) rides
        # the map-side semi-join; a huge batch (multi-million docs)
        # falls back to a plain semi-join — slower but shuffle-planned,
        # instead of forcing a multi-GB broadcast that would exceed the
        # 8 GB hard limit or OOM the driver.  AQE can still promote the
        # fallback to broadcast at runtime if stats allow.
        if new_buckets.count() <= 4_000_000:
            probe_keys = F.broadcast(probe_keys)
        relevant_old = old_buckets.join(probe_keys, ["band", "bucket"], "left_semi")
        # pinned: the occupancy aggregate AND the candidate join's
        # build side both read it — lazy, each re-ran the O(corpus·
        # bands) stored-bucket scan (the second scan measured ~0.4 s
        # of the 200k append; survivors are O(probed occupancy))
        relevant = relevant_old.unionByName(new_buckets).localCheckpoint(eager=True)
        # skew guard over the COMBINED occupancy (a bucket that was fine
        # at batch 0 can be degenerate by batch 40)
        oversized = (
            relevant.groupBy("band", "bucket")
            .agg(F.count(F.lit(1)).alias("bsz"))
            .filter(F.col("bsz") > self.max_bucket)
            .select("band", "bucket")
        )
        probe = new_buckets.join(F.broadcast(oversized), ["band", "bucket"], "left_anti")
        build = relevant.join(
            F.broadcast(oversized), ["band", "bucket"], "left_anti"
        )
        cands = (
            probe.alias("a")
            .join(
                build.alias("b"),
                (F.col("a.band") == F.col("b.band"))
                & (F.col("a.bucket") == F.col("b.bucket"))
                & (F.col("a.id") != F.col("b.id")),
            )
            .select(
                F.least("a.id", "b.id").alias("id_a"),
                F.greatest("a.id", "b.id").alias("id_b"),
            )
            .distinct()
            # materialized: read three times below (id set + two joins) —
            # lazy, each would re-run the LSH bucket join
            .localCheckpoint(eager=True)
        )

        # Verification touches only candidate ids.  The typical delta
        # yields a few hundred of them, so collect the id list (cap-
        # guarded) and push it INTO the stored-shingle read as shard +
        # id filters: the sharded layout prunes the scan to the
        # candidates' partitions, making bytes read ∝ |cand_ids| —
        # r7's map-side join still SCANNED every stored shingle row
        # (35M at 200k docs, ~1.5 s/append, linear in corpus).  A
        # dirty batch past the cap falls back to that full-scan join
        # (pruning is moot once |ids| ≫ nshards — every shard is hit).
        cand_id_rows = (
            cands.select(F.explode(F.array("id_a", "id_b")).alias("id"))
            .distinct()
            .limit(_CAND_ID_CAP + 1)
            .collect()
        )
        ids = [r["id"] for r in cand_id_rows]
        if not ids:
            sh_all = self.spark.createDataFrame([], "id long, h64 long")
        elif len(ids) > _CAND_ID_CAP:
            cand_ids = cands.select(
                F.explode(F.array("id_a", "id_b")).alias("id")
            ).distinct()
            sh_all = (
                self.stored_shingles()
                .unionByName(sh_new)
                .join(cand_ids, "id")
                .localCheckpoint(eager=True)
            )
        else:
            # Materialized: three consumers below (sizes + both sides
            # of the intersection join) — without the pin each re-runs
            # the pruned scan.  After the restriction this is
            # |candidate ids| × shingles-per-doc rows — tiny.
            sh_all = (
                self.stored_shingles(ids)
                .unionByName(sh_new.filter(F.col("id").isin(ids)))
                .localCheckpoint(eager=True)
            )
        sizes = sh_all.groupBy("id").agg(F.count(F.lit(1)).alias("sz"))
        a, b = sh_all.alias("a"), sh_all.alias("b")
        inter = (
            cands.join(a, cands.id_a == F.col("a.id"))
            .join(b, (cands.id_b == F.col("b.id")) & (F.col("a.h64") == F.col("b.h64")))
            .groupBy("id_a", "id_b")
            .agg(F.count(F.lit(1)).alias("inter"))
        )
        pairs = (
            inter.join(
                sizes.withColumnRenamed("id", "id_a").withColumnRenamed("sz", "sz_a"),
                "id_a",
            )
            .join(
                sizes.withColumnRenamed("id", "id_b").withColumnRenamed("sz", "sz_b"),
                "id_b",
            )
            .withColumn(
                "jaccard",
                F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter")),
            )
            .filter(F.col("jaccard") >= self.threshold)
            .select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))
        )
        # materialize BEFORE admitting the batch, so the returned frame
        # doesn't observe its own writes on re-evaluation
        pairs = pairs.localCheckpoint(eager=True)

        import uuid

        n = self._log.next_batch_id("buckets") if batch_id is None else int(batch_id)
        uid = uuid.uuid4().hex[:8]
        new_buckets.write.mode("overwrite").parquet(
            os.path.join(self.path, "buckets", f"batch={n}-{uid}")
        )
        # shingles land SHARDED by pmod(id, nshards): all of one doc's
        # rows in one shard, nshards sized to the batch so shard files
        # stay ~_SHARD_ROWS rows whatever the corpus grows to — the
        # layout stored_shingles() prunes against.  The _nshards
        # sidecar is written BEFORE the marker (readers only see
        # committed dirs, and a committed dir always has its sidecar
        # unless the backend is ephemeral — then reads degrade to
        # unpruned, never wrong).
        ns = _shingle_shards(sh_new.count())
        sh_dst = os.path.join(self.path, "shingles", f"batch={n}-{uid}")
        write_sharded(sh_new, sh_dst, "id", ns)
        write_nshards_sidecar(self.backend, sh_dst, ns)
        if persist_pairs:
            # the epoch's OUTPUT, durable under the same marker as its
            # state: a replay reads these instead of recomputing
            self._pairs_log.write(pairs, n, uid)
        # ONE marker after ALL tables land (BatchCommitLog protocol);
        # the unpersists sit in a finally so no exit path — success,
        # race-loser return, or raise — leaks the cached batch state
        # into a long-running driver's storage memory
        try:
            self._log.claim(n, uid)
        except ConcurrentAppendError:
            if batch_id is None:
                raise  # auto id: a rival stole it — caller retries
            # an epoch replay raced us; the winner committed identical
            # content (one batch_id ↔ one logical batch), our staged
            # dirs are orphan garbage for gc's TTL sweep
            return self._stored_pairs(n)
        finally:
            sh_new.unpersist()
            new_buckets.unpersist()
        return pairs

    def probe_only(
        self, docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
    ) -> DataFrame:
        """READ-ONLY cross probe — the incremental-decontamination
        shape (r16): verified near-dup pairs between ``docs`` and the
        STORED corpus at the index threshold, WITHOUT admitting
        anything.  Where ``append_batch`` answers "what does this
        batch duplicate (and remember it)", this answers "is this
        batch contaminated by what the index holds" — e.g. an eval-
        benchmark index grown one benchmark release at a time, probed
        by every training batch; read-only means a foreachBatch caller
        needs no exactly-once machinery at all (same inputs, same
        output, no state mutated).  Returns (probe_id, stored_id,
        jaccard), cross pairs only — probe-vs-probe duplicates are
        append_batch's business.  Probe ids must not collide with
        stored ids (the index's id-uniqueness contract applies: ids
        are the identity the shingle-size tables key on).

        Scale shape mirrors the append probe: the stored side is
        semi-join-restricted to the batch's buckets FIRST, the skew
        cap gates combined occupancy, and verification reads only the
        candidates' shingle shards (pruned)."""
        docs = self.suppression.filter_batch(docs, id_col)
        sh_new = hashed_shingles(docs, id_col, text_col, self.k).cache()
        sigs = minhash_signatures(
            docs, id_col, text_col, self.k, self.num_hashes, shingles_df=sh_new
        )
        try:
            new_buckets = self._band_buckets(sigs).cache()
            try:
                return self._probe_cross_pairs(sh_new, new_buckets)
            finally:
                new_buckets.unpersist()
        finally:
            sh_new.unpersist()

    def _probe_cross_pairs(
        self, sh_new: DataFrame, new_buckets: DataFrame
    ) -> DataFrame:
        """probe_only's body: bucket-restricted candidate join against
        the stored side only, exact-Jaccard verification over pruned
        shingle reads.  Materializes the result before returning (the
        caches it reads are released by the caller)."""
        old_buckets = self._read("buckets", "id long, band int, bucket long")
        probe_keys = new_buckets.select("band", "bucket").distinct()
        if new_buckets.count() <= 4_000_000:
            probe_keys = F.broadcast(probe_keys)
        relevant_old = old_buckets.join(
            probe_keys, ["band", "bucket"], "left_semi"
        ).localCheckpoint(eager=True)
        oversized = (
            relevant_old.unionByName(new_buckets)
            .groupBy("band", "bucket")
            .agg(F.count(F.lit(1)).alias("bsz"))
            .filter(F.col("bsz") > self.max_bucket)
            .select("band", "bucket")
        )
        probe = new_buckets.join(
            F.broadcast(oversized), ["band", "bucket"], "left_anti"
        )
        build = relevant_old.join(
            F.broadcast(oversized), ["band", "bucket"], "left_anti"
        )
        cands = (
            probe.alias("a")
            .join(
                build.alias("b"),
                (F.col("a.band") == F.col("b.band"))
                & (F.col("a.bucket") == F.col("b.bucket")),
            )
            .select(
                F.col("a.id").alias("probe_id"), F.col("b.id").alias("stored_id")
            )
            .distinct()
            .localCheckpoint(eager=True)
        )
        stored_ids_rows = (
            cands.select("stored_id").distinct().limit(_CAND_ID_CAP + 1).collect()
        )
        stored_ids = [r["stored_id"] for r in stored_ids_rows]
        if not stored_ids:
            return self.spark.createDataFrame(
                [], "probe_id long, stored_id long, jaccard double"
            )
        if len(stored_ids) > _CAND_ID_CAP:
            sh_old = self.stored_shingles().join(
                cands.select(F.col("stored_id").alias("id")).distinct(), "id"
            )
        else:
            sh_old = self.stored_shingles(stored_ids)
        sh_old = sh_old.localCheckpoint(eager=True)
        sz_new = sh_new.groupBy("id").agg(F.count(F.lit(1)).alias("sz"))
        sz_old = sh_old.groupBy("id").agg(F.count(F.lit(1)).alias("sz"))
        inter = (
            cands.join(sh_new.alias("a"), cands.probe_id == F.col("a.id"))
            .join(
                sh_old.alias("b"),
                (cands.stored_id == F.col("b.id"))
                & (F.col("a.h64") == F.col("b.h64")),
            )
            .groupBy("probe_id", "stored_id")
            .agg(F.count(F.lit(1)).alias("inter"))
        )
        return (
            inter.join(
                sz_new.withColumnRenamed("id", "probe_id")
                .withColumnRenamed("sz", "sz_a"),
                "probe_id",
            )
            .join(
                sz_old.withColumnRenamed("id", "stored_id")
                .withColumnRenamed("sz", "sz_b"),
                "stored_id",
            )
            .withColumn(
                "jaccard",
                F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter")),
            )
            .filter(F.col("jaccard") >= self.threshold)
            .select("probe_id", "stored_id", F.round("jaccard", 6).alias("jaccard"))
            .localCheckpoint(eager=True)
        )

    # -- maintenance ---------------------------------------------------

    def compact(self) -> None:
        """Fold the current state (checkpoint + uncovered batches)
        into ONE checkpoint per table, superseding the exact batch-id
        set it merged (operators/compaction.py).  Read-side effect:
        probes union O(1) dirs instead of O(appends).  The rewrite is
        also a repair pass — shingles re-shard with nshards sized to
        the FULL corpus (per-batch moduli were sized to their batch,
        so a year of 10k deltas leaves a thicket of tiny layouts),
        restoring the bytes-∝-|cand_ids| pruning bound at corpus
        grain.  State ROWS are unchanged (disjoint append, no merge
        semantics), so incremental == one-shot invariants survive
        verbatim; a batch committed after the snapshot stays outside
        the covered set and readable.  No-op when nothing new landed;
        racing compactors serialize on the marker."""
        import uuid

        snap = self._ckpts.snapshot()
        if not snap.fresh:
            return
        seq = self._ckpts.next_seq()
        uid = uuid.uuid4().hex[:8]
        buckets = self.spark.read.schema("id long, band int, bucket long").parquet(
            *snap.dirs["buckets"]
        )
        buckets.write.mode("overwrite").parquet(
            self._ckpts.ckpt_dir("buckets", seq, uid)
        )
        shingles = self.stored_shingles(dirs=snap.dirs["shingles"])
        ns = _shingle_shards(shingles.count())
        dst = self._ckpts.ckpt_dir("shingles", seq, uid)
        write_sharded(shingles, dst, "id", ns)
        write_nshards_sidecar(self.backend, dst, ns)
        self._ckpts.claim(seq, uid, snap.covered | set(snap.fresh))

    def erase(
        self,
        doc_ids: list[int],
        suppress: bool = False,
        max_attempts: int = 3,
    ) -> None:
        """Right-to-be-forgotten across the WHOLE index footprint: a
        superseding checkpoint excludes the ids from both state tables
        (buckets + sharded shingles), and the pairs OUTPUT log — which
        compaction never touches — is cleansed in place of every pair
        naming an erased doc (its jaccard against some other document
        is derived personal data).  Never no-ops on freshness; bytes
        leave the filesystem at gc(); epoch markers survive, so stream
        replays stay skipped and cannot resurrect the ids.

        Concurrency (r10 ADVICE): a batch that commits between this
        call's state snapshot and its claim stays OUTSIDE the
        superseding checkpoint — left alone it would keep the ids
        readable and its pairs would land after the cleanse.  The
        erase therefore VERIFIES after claiming (state + pairs free of
        the ids) and re-runs against a fresh snapshot until clean,
        bounded by ``max_attempts``; if racing ingest keeps
        re-admitting the ids it raises rather than return a lying
        success.  ``suppress=True`` records the ids in the takedown
        ledger FIRST (operators/suppression.py), so every append that
        consults the ledger after the record drops them on entry —
        the GDPR-complete mode, mirroring silver's record_erased_key;
        without it a later batch may legitimately re-admit an id (a
        returning user), which is the documented default."""
        ids = [int(i) for i in doc_ids]
        if suppress:
            self.suppression.record(ids)
            # Drain the append-intent fence (storage.py): an append
            # that read the ledger BEFORE the record above could have
            # had zero filesystem footprint at record() time and
            # commit AFTER the verify loop below — re-admitting the
            # ids while this call reports success.  Every append that
            # survives the drain opened its intent after the record,
            # so its ledger read dropped the ids on entry.  Raises
            # (loud, no lying success) if a pre-record append stays
            # in flight past the timeout.
            self._log.wait_intents_drained(self._log.live_intents())
        for _ in range(max_attempts):
            self._erase_once(ids)
            if self._erase_verified(ids):
                return
        raise RuntimeError(
            f"erase could not converge after {max_attempts} attempts: "
            "concurrent ingest keeps re-admitting the ids — quiesce "
            "appends (or pass suppress=True) and retry"
        )

    def _erase_verified(self, ids: list[int]) -> bool:
        """Current state AND pairs log hold nothing naming the ids."""
        if self.stored_shingles(ids).limit(1).count():
            return False
        buckets = self._read("buckets", "id long, band int, bucket long")
        if buckets.filter(F.col("id").isin(ids)).limit(1).count():
            return False
        touched = F.col("id_a").isin(ids) | F.col("id_b").isin(ids)
        return self.stored_pairs().filter(touched).limit(1).count() == 0

    def _erase_once(self, ids: list[int]) -> None:
        import uuid

        snap = self._ckpts.snapshot()
        seq = self._ckpts.next_seq()
        uid = uuid.uuid4().hex[:8]
        buckets = (
            self.spark.read.schema("id long, band int, bucket long")
            .parquet(*snap.dirs["buckets"])
            .filter(~F.col("id").isin(ids))
        )
        buckets.write.mode("overwrite").parquet(
            self._ckpts.ckpt_dir("buckets", seq, uid)
        )
        shingles = self.stored_shingles(dirs=snap.dirs["shingles"]).filter(
            ~F.col("id").isin(ids)
        )
        ns = _shingle_shards(shingles.count())
        dst = self._ckpts.ckpt_dir("shingles", seq, uid)
        write_sharded(shingles, dst, "id", ns)
        write_nshards_sidecar(self.backend, dst, ns)
        self._ckpts.claim(seq, uid, snap.covered | set(snap.fresh))
        self._pairs_log.cleanse(
            ~F.col("id_a").isin(ids) & ~F.col("id_b").isin(ids)
        )

    def gc(self, orphan_ttl_seconds: float | None = None) -> list[str]:
        """Reclaim covered batch dirs and superseded checkpoints; with
        a TTL, also crashed appenders' staged dirs and rival same-seq
        checkpoint dirs (operators/compaction.py holds the contract:
        markers stay, quiesce before gc).  The pairs OUTPUT log is
        never compacted or covered (it is results, not probe state),
        but a losing epoch racer's unpublished pairs dir is orphan
        garbage like any staged dir — the TTL arm sweeps it."""
        removed = self._ckpts.gc(orphan_ttl_seconds)
        if orphan_ttl_seconds is not None:
            removed += self._pairs_log.sweep_orphans(orphan_ttl_seconds)
            removed += self._log.sweep_stale_intents(orphan_ttl_seconds)
        return removed


def minhash_sink(index: MinHashIndex, id_col: str = "doc_id", text_col: str = "text"):
    """foreachBatch adapter: ``.writeStream.foreachBatch(minhash_sink(
    idx))`` maintains the near-dup index from a document stream with
    exactly-once state — the streaming batch id keys each commit, so
    at-least-once redelivery is skipped, not double-shingled.  Each
    epoch's verified pairs land durably under its commit marker
    (``persist_pairs``), making ``index.stored_pairs()`` the stream's
    exactly-once output log."""

    def process(batch_df: DataFrame, batch_id: int) -> None:
        index.append_batch(
            batch_df, id_col, text_col, batch_id=int(batch_id), persist_pairs=True
        )

    return process
