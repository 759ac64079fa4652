"""Incremental semantic-dedup index over embedding batches.

``semantic_dedup_ann`` re-buckets and re-verifies the WHOLE corpus per
run; operationally embeddings arrive as crawl/refresh deltas, and at
100 TB you admit a delta by probing only the buckets it lands in — the
same shift ``MinHashIndex`` (operators/incremental_dedup.py) makes for
text near-dup.  State per committed batch: int8-quantized vectors plus
their multi-probe IVF memberships; new batches probe stored members
through the FROZEN centroids, and every candidate passes the SAME
integer-exact int8 cosine threshold as the one-shot operators, so
admitted pairs are bit-identical to what a one-shot run over the union
would verify (given the same centroids — pytest pins two-batch ==
one-shot exactly; tests/test_incremental_semantic.py).

Centroids can be supplied at ``build`` (the train-once-at-ingest story;
also what makes the equality invariant testable) or trained from the
initial corpus.  Durability follows the house contract with one
refinement: a batch's two state tables (members + quantized vectors)
commit under a SINGLE batch-level marker written after both parquet
writes, so a crash mid-append leaves garbage no probe ever observes —
a per-table marker could expose ids without their vectors and
silently drop pairs.

Concurrency contract: ONE writer per index at a time (appends are
ordered state transitions, like silver merges).  The contract is
ENFORCED at the commit point, not assumed: markers are claimed with
the storage backend's put-if-absent, so if two append_batch calls
race to the same batch id the loser raises ConcurrentAppendError
instead of silently interleaving its members with the winner's
vectors (the exact ids-without-vectors pair-loss the batch marker
exists to prevent).  The backend seam (cdc_demo_spark.storage) is the
same one the silver manifest commits through — POSIX link here,
conditional create on an object store.

Scale shape: probe cost ~ O(|batch| x bucket occupancy); stored state
is touched join-wise on (centroid_id) and (id); quantized vectors are
int64 arrays (8 x dim bytes per row) — at cluster scale the state
tables would be bucketed BY centroid_id so probes co-locate without a
full shuffle.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cdc_demo_spark.operators.similarity import (
    _int8_threshold_filter,
    assign_multiprobe,
    choose_centroids,
    int8_quantized,
    refine_centroids,
)
from cdc_demo_spark.operators.compaction import PairsLog, TableCheckpoints
from cdc_demo_spark.operators.suppression import SuppressionLedger
from cdc_demo_spark.operators.shard_layout import (
    n_shards,
    nshards_of,
    shard_files,
    write_nshards_sidecar,
    write_sharded,
)
from cdc_demo_spark.storage import (  # noqa: F401  (re-export)
    DEFAULT_BACKEND,
    BatchCommitLog,
    CommitBackend,
    ConcurrentAppendError,
    claim_ownership_mode,
)

# Stored-tile shard layout (r9, the shared operators/shard_layout
# helpers): the cross-tile probe needs only the tiles of the buckets
# the DELTA lands in, so tiles land sharded by pmod(centroid_id,
# nshards) and the append prunes its stored-tile read to the probed
# buckets' shards.  SIZING is a measured trade, not a free win
# (ROUND_NOTES r9): pmod interleaves, so k probed buckets touch
# ~ns·(1−(1−1/ns)^k) shards — pruning bites only when ns ≳ k — while
# per-file scan overhead grows with ns (a fine 32-tiles/shard layout
# measured +1.5 s on every bench-grain append, where the 10k×2-probe
# delta touches every bucket and pruning CANNOT bite; a 128-of-8192-
# bucket probe against the same layout read 41% of tile bytes).  The
# default keeps shards coarse (~8 MB): neutral at bench grain, pruned
# for bucket-concentrated probes (re-crawl of one domain, targeted
# backfill).  A deployment whose deltas probe few buckets relative to
# n_buckets turns this knob down toward ns ≈ expected probe count —
# the mechanism (per-dir modulus sidecars, per-dir pruned listing,
# unpruned fallback) is layout-compatible with ANY value per batch.
_TILE_SHARD_ROWS = 256
_TILE_MAX_SHARDS = 8_192
# Driver-side probe-bucket collect bound: |distinct cids| ≤ min(2·
# |delta|, n_buckets); past the cap pruning is moot (every shard
# touched) and the read falls back to the full scan.
_PROBE_CID_CAP = 65_536


class SemanticIndex:
    def __init__(
        self,
        spark: SparkSession,
        path: str,
        t_num: int = 2,
        t_den: int = 5,
        n_buckets: int = 16,
        probes: int = 2,
        refine_iters: int = 2,
        backend: CommitBackend = DEFAULT_BACKEND,
        arrow: bool = False,
        group_probes: int | None = None,
    ) -> None:
        self.spark = spark
        self.path = path
        self.backend = backend
        self._log = BatchCommitLog(path, backend)
        self.arrow = arrow
        if group_probes is not None and not arrow:
            raise ValueError(
                "group_probes is the arrow/tile path's scale knob; the HOF "
                "path scores all centroids JVM-side (use arrow=True)"
            )
        self.group_probes = group_probes
        self._ckpts = TableCheckpoints(
            path, backend, self._log,
            tables=(
                ("members", "quantized", "tiles")
                if arrow
                else ("members", "quantized")
            ),
            primary="members",
        )
        meta_path = os.path.join(path, "_meta.json")
        meta = {
            "t_num": t_num,
            "t_den": t_den,
            "n_buckets": n_buckets,
            "probes": probes,
            "refine_iters": refine_iters,
            "arrow": arrow,
            # Two-level coarse-quantizer assignment (ann_scale.
            # group_centroids): a QUERY-PATH choice that changes which
            # buckets a vector probes, so it is frozen like every
            # other probe parameter — an index is flat-assigned or
            # grouped-assigned for life, and two-batch == one-shot
            # holds within the choice.  None = flat (score all K
            # centroids; right up to a few thousand buckets); an int
            # = explore that many groups of ~√K centroids each
            # (O(√K) per row — the at-scale path; 27× measured at
            # K=64k, ROUND_NOTES r9).
            "group_probes": group_probes,
            # On-disk STATE encoding, not a query param: v2 (r8's fused
            # arrow path) stores the quantized sidecar's qv as packed
            # int8 BYTES and excludes zero vectors from members; v1
            # stored array<bigint> qv and kept zero vectors.  Mixing
            # encodings inside one 'quantized' table would corrupt any
            # future rebuild that reads all batch dirs at once, so a
            # pre-version (or other-version) index refuses to open
            # under this code — rebuild it (ADVICE r8).
            "state_encoding": 2,
        }
        # put-if-absent then verify: two racing creators with identical
        # params both succeed (one writes, both compare); mismatched
        # params always raise for whichever lost the create.
        if not backend.put_if_absent(meta_path, json.dumps(meta).encode()):
            stored = json.loads(backend.read(meta_path))
            # a pre-group_probes index IS a flat-assigned index: the
            # key's absence means None, not a param change (unlike
            # state_encoding, whose absence means incompatible bytes)
            stored.setdefault("group_probes", None)
            if stored != meta:
                raise ValueError(
                    f"index at {path} was built with {stored}, opened with {meta}"
                )
        self.t_num, self.t_den = t_num, t_den
        self.n_buckets, self.probes, self.refine_iters = n_buckets, probes, refine_iters
        self.suppression = SuppressionLedger(path, backend)

    # -- storage ------------------------------------------------------

    @property
    def _centroids_path(self) -> str:
        return os.path.join(self.path, "centroids")

    def centroids(self) -> DataFrame:
        if not os.path.isdir(self._centroids_path):
            raise RuntimeError(f"index at {self.path} has no centroids; call build()")
        return self.spark.read.parquet(self._centroids_path)

    def _committed_batches(self, table: str) -> list[str]:
        """Batch dirs published by the shared BatchCommitLog
        (storage.py — one marker spans ALL of a batch's state tables:
        per-table markers would let a crash between the members commit
        and the quantized write leave a half-visible batch whose ids
        generate candidates but have no vectors to verify against)."""
        return self._log.committed_batches(table)

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

    def stored_tiles(
        self,
        probe_cids: list[int] | None = None,
        dirs: list[str] | None = None,
    ) -> DataFrame:
        """Current tile state (checkpoint + uncovered batches), pruned
        to ``probe_cids``'s shards when given (see the module-level
        shard-layout note).  Dirs are read individually — they can mix
        shard moduli and unsharded (delta/legacy) layouts — under the
        explicit TILE_SCHEMA; a missing sidecar degrades that dir to
        an unpruned read, never a wrong answer.  Extra same-shard
        tiles survive the prune; the cross-tile join on centroid_id
        drops them, so callers see exactly the probed buckets' tiles
        either way.  ``dirs`` overrides the listing (compact()'s
        consistent snapshot)."""
        from cdc_demo_spark.operators.ann_scale import TILE_SCHEMA

        if dirs is None:
            dirs = self._state_dirs("tiles")
        empty = self.spark.createDataFrame([], TILE_SCHEMA)
        if not dirs:
            return empty
        out = None
        for d in dirs:
            ns = nshards_of(self.backend, d)
            if ns > 1:
                shards = None
                if probe_cids is not None:
                    shards = sorted({(c % ns + ns) % ns for c in probe_cids})
                files = shard_files(self.backend, d, shards)
                if not files:
                    continue
                sub = self.spark.read.schema(TILE_SCHEMA).parquet(*files)
            else:
                sub = self.spark.read.schema(TILE_SCHEMA).parquet(d)
            sub = sub.select("centroid_id", "blk", "n", "ids", "qvb")
            out = sub if out is None else out.unionByName(sub)
        return out if out is not None else empty

    # -- the operator -------------------------------------------------

    def freeze_centroids(self, centroids: DataFrame) -> None:
        """Freeze a trained centroid set WITHOUT admitting any batch —
        the setup step of a stream-owned index, where every batch
        (initial corpus included) arrives through the epoch-keyed sink
        and batch-owned build() would poison the id space (storage.
        claim_ownership_mode).  Refuses a second freeze: the centroids
        are the index's immutable physical layout."""
        if os.path.isdir(self._centroids_path):
            raise RuntimeError(f"index at {self.path} is already built")
        centroids.write.mode("overwrite").parquet(self._centroids_path)

    def build(
        self,
        corpus: DataFrame,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
        centroids: DataFrame | None = None,
    ) -> DataFrame:
        """Freeze centroids (supplied, or trained from `corpus`) and
        admit `corpus` as batch 0. Returns batch-0 internal pairs."""
        if os.path.isdir(self._centroids_path):
            raise RuntimeError(f"index at {self.path} is already built")
        if centroids is None:
            if self.arrow:
                # scale mode trains from a bounded deterministic sample
                # (the HOF trainer's global-ntile seed + per-iteration
                # corpus re-score don't survive a 1M-row build)
                from cdc_demo_spark.operators.ann_scale import train_centroids_sampled

                centroids = train_centroids_sampled(
                    corpus, self.n_buckets,
                    iters=max(self.refine_iters, 1),
                    vec_col=vec_col, id_col=id_col,
                )
            else:
                centroids = choose_centroids(corpus, self.n_buckets, vec_col, id_col)
                if self.refine_iters > 0:
                    centroids = refine_centroids(
                        corpus,
                        centroids,
                        iterations=self.refine_iters,
                        vec_col=vec_col,
                        id_col=id_col,
                    )
        centroids.write.mode("overwrite").parquet(self._centroids_path)
        return self.append_batch(corpus, id_col, vec_col)

    _PAIRS_SCHEMA = "id_a long, id_b long"

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
        vectors: DataFrame,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
        batch_id: int | None = None,
        persist_pairs: bool = False,
    ) -> DataFrame:
        """Probe `vectors` against the stored corpus AND each other
        through the frozen centroids, verify with the integer-exact
        int8 threshold, then admit the batch. Returns verified pairs
        (id_a < id_b) with at least one new side. Ids must be globally
        unique across batches (caller's contract).

        ``batch_id`` keys the commit to a CALLER-owned epoch (see
        MinHashIndex.append_batch — the contract is identical): a
        replayed foreachBatch epoch is skipped BEFORE the probe runs
        (replaying would duplicate the epoch's membership and tile
        rows) and returns the epoch's persisted pairs
        (``persist_pairs``) or an empty frame.  One index is either
        stream-owned or batch-owned, never both; a stream-owned index
        freezes its layout with ``freeze_centroids`` and takes every
        batch through the sink."""
        claim_ownership_mode(
            self.backend, self.path, "auto" if batch_id is None else "epoch"
        )
        if batch_id is not None and self.backend.exists(
            self._log.marker(int(batch_id))
        ):
            return self._stored_pairs(int(batch_id))
        # Append-intent fence (storage.py): published BEFORE the
        # suppression-ledger read, closed after the commit on every
        # exit path — lets erase(suppress=True) drain pre-record
        # appends before trusting its verify pass.
        intent = self._log.open_intent()
        try:
            return self._probe_and_admit(
                vectors, id_col, vec_col, batch_id, persist_pairs
            )
        finally:
            self._log.close_intent(intent)

    def _probe_and_admit(
        self,
        vectors: DataFrame,
        id_col: str,
        vec_col: str,
        batch_id: int | None,
        persist_pairs: bool,
    ) -> DataFrame:
        """append_batch's body past the intent fence — see its doc."""
        # takedown ledger (suppression.py): a suppressed id never
        # re-enters probe state, tiles, or the pairs log
        vectors = self.suppression.filter_batch(vectors, id_col)
        base = vectors.select(
            F.col(id_col).alias("vec_id"), F.col(vec_col).alias("embedding")
        ).localCheckpoint(eager=True)

        tiles_new = None
        if self.arrow:
            # Tile-GEMM probe (ann_scale): the batch's membership rows
            # pack into binary per-(bucket, sub-tile) blocks; batch-
            # internal pairs come from the self tile scan, batch ×
            # stored pairs from the cross tile scan against the
            # COMMITTED tile state — the same exact integer admission
            # as the HOF path, but a failing candidate never exists as
            # a row.  The row-materializing probe join below builds
            # ~|batch| × bucket-occupancy candidate rows; at 1M stored
            # vectors that is ~2·10⁹ rows for a batch-0 build
            # (measured out past 10 minutes), where the tile path is
            # the same ~20 s bucketed scan bench.py measures one-shot.
            from cdc_demo_spark.operators.ann_scale import (
                assign_quantized_multiprobe,
                pack_tiles,
                tile_cross_pairs,
                tile_self_pairs,
            )

            # ONE fused assignment+quantization pass feeds ALL of the
            # batch's state (r8, closing the r7 verdict's "documented
            # double assignment GEMM"): members and the quantized
            # sidecar are column selections of qm, where r7 ran a
            # second GEMM assignment plus the three-pass JVM HOF
            # quantizer to produce the same values (~1.3 s of a 10k
            # append; parity was already pinned — the fused pass
            # computes membership and qv exactly as the unfused
            # ones, tests/test_ann_scale.py).  Arrow-mode state
            # therefore EXCLUDES zero vectors (their qv is NULL in
            # the JVM path and they can never pass the threshold, so
            # the pair invariants are unaffected), and the quantized
            # sidecar stores qv as the packed int8 BYTES (the tile
            # encoding) rather than array<bigint> — both recorded
            # here because mode is frozen into _meta.json.
            # eager pin: pack_tiles reads qm in two branches of one job
            # (per-centroid counts + the pack side) — a lazy input
            # computes the fused GEMM twice (ann_scale's measured rule)
            qm = assign_quantized_multiprobe(
                base, self.centroids(), self.probes, "vec_id", "embedding",
                group_probes=self.group_probes,
            ).localCheckpoint(eager=True)
            member_new = qm.select("id", "centroid_id")
            q_new = qm.dropDuplicates(["id"]).select("id", "qv")
            tiles_new = pack_tiles(qm).localCheckpoint(eager=True)
            # probed buckets (cap-guarded collect, ≤ min(2·|batch|,
            # n_buckets) values) prune the stored-tile read to their
            # shards; past the cap every shard is touched anyway and
            # the read is the old full scan
            cid_rows = (
                member_new.select("centroid_id")
                .distinct()
                .limit(_PROBE_CID_CAP + 1)
                .collect()
            )
            probe_cids = [r["centroid_id"] for r in cid_rows]
            if len(probe_cids) > _PROBE_CID_CAP:
                probe_cids = None
            stored = self.stored_tiles(probe_cids)
            verified = tile_self_pairs(tiles_new, self.t_num, self.t_den).unionByName(
                tile_cross_pairs(tiles_new, stored, self.t_num, self.t_den)
            ).dropDuplicates(["id_a", "id_b"])
        else:
            member_new = self._assign(base).localCheckpoint(eager=True)
            q_new = int8_quantized(base, "vec_id", "embedding").localCheckpoint(
                eager=True
            )
            member_old = self._read("members", "id long, centroid_id long")
            member_all = member_old.unionByName(member_new)
            cand = (
                member_new.withColumnRenamed("id", "pid")
                .join(member_all, "centroid_id")
                .filter(F.col("pid") != F.col("id"))
                .select(
                    F.least("pid", "id").alias("id_a"),
                    F.greatest("pid", "id").alias("id_b"),
                )
                .distinct()
            )
            q_all = self._read(
                "quantized", "id long, qv array<bigint>"
            ).unionByName(q_new)
            qa = q_all.select(F.col("id").alias("id_a"), F.col("qv").alias("qa"))
            qb = q_all.select(F.col("id").alias("id_b"), F.col("qv").alias("qb"))
            joined = cand.join(qa, "id_a").join(qb, "id_b")
            verified = _int8_threshold_filter(joined, self.t_num, self.t_den)
        pairs = verified.localCheckpoint(eager=True)  # materialize before admitting state

        import uuid

        n = self._log.next_batch_id("members") if batch_id is None else int(batch_id)
        uid = uuid.uuid4().hex[:8]
        for table, df in (("members", member_new), ("quantized", q_new)):
            df.write.mode("overwrite").parquet(
                os.path.join(self.path, table, f"batch={n}-{uid}")
            )
        if tiles_new is not None:
            # tiles are derived state (re-derivable from members +
            # quantized) but commit under the same marker so a probe
            # never sees a batch's members without its tiles.  They
            # land SHARDED by pmod(centroid_id, nshards) so future
            # appends prune their stored-tile read to probed buckets
            # (module-level note); the sidecar precedes the marker.
            ns = n_shards(tiles_new.count(), _TILE_SHARD_ROWS, _TILE_MAX_SHARDS)
            dst = os.path.join(self.path, "tiles", f"batch={n}-{uid}")
            write_sharded(tiles_new, dst, "centroid_id", ns)
            write_nshards_sidecar(self.backend, dst, ns)
        if persist_pairs:
            # the epoch's OUTPUT, durable under the same marker as its
            # state: a replay reads these instead of recomputing
            self._pairs_log.write(pairs, n, uid)
        # the single marker lands only after ALL tables are fully
        # written — a crash anywhere above leaves invisible garbage
        # (BatchCommitLog protocol).
        try:
            self._log.claim(n, uid)
        except ConcurrentAppendError:
            if batch_id is None:
                raise  # auto id: a rival stole it — caller retries
            # an epoch replay raced us; the winner committed identical
            # content, our staged dirs are orphan garbage for gc's TTL
            return self._stored_pairs(n)
        return pairs

    # -- maintenance ---------------------------------------------------

    def compact(self) -> None:
        """Fold the current state (checkpoint + uncovered batches)
        into ONE checkpoint per table, superseding the exact batch-id
        set it merged (operators/compaction.py).  Read-side effect:
        probes union O(1) dirs instead of O(appends).  In arrow mode
        the rewrite is also a REPAIR pass: tiles re-derive from merged
        members + quantized via pack_tiles, so the thicket of tiny
        per-delta tiles (a 10k delta spread over 2048 buckets leaves
        ~5-row tiles whose fixed per-tile GEMM cost dominates) re-packs
        to full occupancy, and the tile shard modulus re-sizes to the
        full corpus — post-compaction state quality equals a fresh
        one-shot build's.  Pair semantics are untouched: candidates
        depend on bucket MEMBERSHIP, never on tile packing (the block
        GEMM scores every cross pair), so incremental == one-shot
        invariants survive verbatim.  No-op when nothing new landed;
        racing compactors serialize on the marker."""
        import uuid

        snap = self._ckpts.snapshot()
        if not snap.fresh:
            return
        seq = self._ckpts.next_seq()
        uid = uuid.uuid4().hex[:8]
        members = self.spark.read.schema("id long, centroid_id long").parquet(
            *snap.dirs["members"]
        )
        q_schema = "id long, qv binary" if self.arrow else "id long, qv array<bigint>"
        quantized = self.spark.read.schema(q_schema).parquet(*snap.dirs["quantized"])
        if self.arrow:
            # pinned: pack_tiles reads its input in two branches of one
            # job (per-centroid counts + the pack side) — a lazy input
            # would run the join twice (ann_scale's measured rule)
            qm = (
                members.join(quantized, "id")
                .select("centroid_id", "id", "qv")
                .localCheckpoint(eager=True)
            )
            from cdc_demo_spark.operators.ann_scale import pack_tiles

            tiles = pack_tiles(qm).localCheckpoint(eager=True)
            ns = n_shards(tiles.count(), _TILE_SHARD_ROWS, _TILE_MAX_SHARDS)
            dst = self._ckpts.ckpt_dir("tiles", seq, uid)
            write_sharded(tiles, dst, "centroid_id", ns)
            write_nshards_sidecar(self.backend, dst, ns)
        members.write.mode("overwrite").parquet(
            self._ckpts.ckpt_dir("members", seq, uid)
        )
        quantized.write.mode("overwrite").parquet(
            self._ckpts.ckpt_dir("quantized", seq, uid)
        )
        self._ckpts.claim(seq, uid, snap.covered | set(snap.fresh))

    def erase(
        self,
        ids_to_erase: list[int],
        suppress: bool = False,
        max_attempts: int = 3,
    ) -> None:
        """Right-to-be-forgotten (same contract as MinHashIndex.erase,
        including its concurrency note — verify after claim, re-run on
        a racing re-admission, bounded retries; ``suppress=True``
        records the ids in the takedown ledger first so post-record
        appends drop them on entry): a superseding checkpoint excludes
        the ids from members + quantized (and, in arrow mode, re-packs
        tiles from the filtered rows — an erased vector's quantized
        codes leave the tile bytes too, not just the membership), and
        the pairs OUTPUT log is cleansed in place.  Never no-ops on
        freshness; physical reclamation happens at gc(); epoch markers
        survive so stream replays stay skipped."""
        ids = [int(i) for i in ids_to_erase]
        if suppress:
            self.suppression.record(ids)
            # Drain the append-intent fence: an append that read the
            # ledger before the record could commit after the verify
            # loop with zero footprint visible here — see
            # MinHashIndex.erase for the full argument.
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
        snap = self._ckpts.snapshot()
        members = self.spark.read.schema("id long, centroid_id long").parquet(
            *snap.dirs["members"]
        )
        if members.filter(F.col("id").isin(ids)).limit(1).count():
            return False
        touched = F.col("id_a").isin(ids) | F.col("id_b").isin(ids)
        return self.stored_pairs().filter(touched).limit(1).count() == 0

    def _erase_once(self, ids: list[int]) -> None:
        import uuid

        snap = self._ckpts.snapshot()
        seq = self._ckpts.next_seq()
        uid = uuid.uuid4().hex[:8]
        members = (
            self.spark.read.schema("id long, centroid_id long")
            .parquet(*snap.dirs["members"])
            .filter(~F.col("id").isin(ids))
        )
        q_schema = "id long, qv binary" if self.arrow else "id long, qv array<bigint>"
        quantized = (
            self.spark.read.schema(q_schema)
            .parquet(*snap.dirs["quantized"])
            .filter(~F.col("id").isin(ids))
        )
        if self.arrow:
            qm = (
                members.join(quantized, "id")
                .select("centroid_id", "id", "qv")
                .localCheckpoint(eager=True)
            )
            from cdc_demo_spark.operators.ann_scale import pack_tiles

            tiles = pack_tiles(qm).localCheckpoint(eager=True)
            ns = n_shards(tiles.count(), _TILE_SHARD_ROWS, _TILE_MAX_SHARDS)
            dst = self._ckpts.ckpt_dir("tiles", seq, uid)
            write_sharded(tiles, dst, "centroid_id", ns)
            write_nshards_sidecar(self.backend, dst, ns)
        members.write.mode("overwrite").parquet(
            self._ckpts.ckpt_dir("members", seq, uid)
        )
        quantized.write.mode("overwrite").parquet(
            self._ckpts.ckpt_dir("quantized", seq, uid)
        )
        self._ckpts.claim(seq, uid, snap.covered | set(snap.fresh))
        self._pairs_log.cleanse(
            ~F.col("id_a").isin(ids) & ~F.col("id_b").isin(ids)
        )

    def gc(self, orphan_ttl_seconds: float | None = None) -> list[str]:
        """Reclaim covered batch dirs and superseded checkpoints; with
        a TTL, also crashed appenders' staged dirs and rival same-seq
        checkpoint dirs (operators/compaction.py holds the contract:
        markers stay, quiesce before gc).  The pairs OUTPUT log is
        never compacted or covered (results, not probe state); the TTL
        arm sweeps a losing racer's unpublished pairs dir."""
        removed = self._ckpts.gc(orphan_ttl_seconds)
        if orphan_ttl_seconds is not None:
            removed += self._pairs_log.sweep_orphans(orphan_ttl_seconds)
            removed += self._log.sweep_stale_intents(orphan_ttl_seconds)
        return removed

    def centroid_drift(
        self, vectors: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
    ) -> float:
        """Mean nearest-centroid cosine for a batch — the rebuild alarm
        (same contract as IvfIndex.centroid_drift): frozen centroids
        never retrain, so when this drops against its build-time value
        the layout no longer fits the data and recall decays; the
        remedy is a rebuild into a new index dir, not in-place
        mutation."""
        from cdc_demo_spark.functions.vector import cosine

        scored = (
            vectors.select(
                F.col(id_col).alias("vec_id"), F.col(vec_col).alias("embedding")
            )
            .crossJoin(F.broadcast(self.centroids()))
            .select(
                "vec_id",
                cosine(F.col("embedding"), F.col("centroid_vec")).alias("c_sim"),
            )
            .groupBy("vec_id")
            .agg(F.max("c_sim").alias("best"))
            .agg(F.avg("best").alias("drift"))
        )
        return float(scored.collect()[0]["drift"])

    def _assign(self, base: DataFrame) -> DataFrame:
        """(id, centroid_id) multi-probe membership against the FROZEN
        centroids (no retraining — the probe set must match what every
        earlier batch was stored under). Routes through the SAME
        assignment as the one-shot operators; the incremental ==
        one-shot equality invariant depends on that.

        ``arrow=True`` indexes use the GEMM assignment
        (ann_scale.assign_multiprobe_arrow) — same (cosine desc,
        centroid_id asc) ranking, numpy instead of HOF; the flag is
        part of the index meta because float sums can differ in the
        last ulp between the two paths, and membership must be
        computed identically for every batch of one index."""
        if self.arrow:
            from cdc_demo_spark.operators.ann_scale import assign_multiprobe_arrow

            return assign_multiprobe_arrow(
                base, self.centroids(), self.probes, "vec_id", "embedding"
            ).select(F.col("vec_id").alias("id"), "centroid_id")
        return assign_multiprobe(
            base, self.centroids(), self.probes, "vec_id", "embedding"
        ).select(F.col("vec_id").alias("id"), "centroid_id")


def semantic_sink(
    index: SemanticIndex, id_col: str = "vec_id", vec_col: str = "embedding"
):
    """foreachBatch adapter: ``.writeStream.foreachBatch(semantic_sink(
    idx))`` maintains the semantic-dedup index from an embedding
    stream with exactly-once state — the streaming batch id keys each
    commit, so at-least-once redelivery is skipped, not re-admitted.
    Setup contract: freeze the layout first (``idx.freeze_centroids``)
    so EVERY batch, the initial corpus included, arrives through the
    stream under epoch ids.  Each epoch's verified pairs land durably
    under its commit marker; ``index.stored_pairs()`` is the stream's
    exactly-once output log."""

    def process(batch_df: DataFrame, batch_id: int) -> None:
        index.append_batch(
            batch_df, id_col, vec_col, batch_id=int(batch_id), persist_pairs=True
        )

    return process
