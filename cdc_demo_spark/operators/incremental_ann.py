"""Incremental IVF index for embedding similarity search.

``ivf_topk`` trains centroids and buckets the corpus on every call —
right for a one-shot query, wrong for operations: embeddings arrive in
batches (each crawl/training-data refresh), and at 100 TB you train the
bucketing function ONCE and freeze it as the table's physical layout.
This module is that shape:

- ``build``: Lloyd-refined centroids from the initial corpus, frozen to
  parquet; vectors land partitioned by ``centroid_id=``.
- ``append_batch``: new vectors are assigned to the FROZEN centroids
  (no retrain — the layout is immutable, like a table's bucketing
  spec) and appended under a committed ``batch=N`` dir.
- ``topk``: probes the ``nprobe`` nearest buckets per query; the
  ``centroid_id=`` partition dirs mean the scan PRUNES to the probed
  buckets — the corpus outside them is never read.

Centroid drift: if the data distribution shifts far from the frozen
centroids, recall decays; the remedy is a rebuild (new index dir, swap
pointers), not in-place retraining — retraining would silently strand
already-bucketed vectors. ``centroid_drift`` measures it (mean cosine
of a batch to its nearest centroid) so operators can alarm on decay.

Same durability contract as the MinHash/Semantic indexes: batches are
published via the shared BatchCommitLog (storage.py — uuid-staged dirs
+ put-if-absent marker; upgraded in round 7 from the older in-place
``_COMMITTED`` scheme, which let a racing loser's mode-overwrite write
clobber a winner's committed files before its own claim failed.
Legacy ``_COMMITTED`` batch dirs remain readable).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cdc_demo_spark.functions.vector import cosine
from cdc_demo_spark.operators.similarity import (
    assign_buckets,
    choose_centroids,
    refine_centroids,
)
from cdc_demo_spark.operators.compaction import TableCheckpoints
from cdc_demo_spark.operators.suppression import SuppressionLedger
from cdc_demo_spark.storage import (
    DEFAULT_BACKEND,
    BatchCommitLog,
    CommitBackend,
    ConcurrentAppendError,
    claim_ownership_mode,
)


class IvfIndex:
    def __init__(
        self,
        spark: SparkSession,
        path: str,
        n_centroids: int = 16,
        nprobe: int = 4,
        refine_iters: int = 2,
        backend: CommitBackend = DEFAULT_BACKEND,
    ) -> None:
        self.spark = spark
        self.path = path
        self.backend = backend
        self._log = BatchCommitLog(path, backend)
        self._ckpts = TableCheckpoints(
            path, backend, self._log,
            tables=("vectors",), primary="vectors",
            include_legacy=True,
        )
        meta_path = os.path.join(path, "_meta.json")
        meta = {"n_centroids": n_centroids, "nprobe": nprobe, "refine_iters": refine_iters}
        # put-if-absent then verify: racing creators with identical
        # params both succeed; a param mismatch raises for the loser.
        if not backend.put_if_absent(meta_path, json.dumps(meta).encode()):
            stored = json.loads(backend.read(meta_path))
            if stored != meta:
                raise ValueError(
                    f"index at {path} was built with {stored}, opened with {meta}"
                )
        self.n_centroids, self.nprobe, self.refine_iters = (
            n_centroids,
            nprobe,
            refine_iters,
        )
        self.suppression = SuppressionLedger(path, backend)

    # -- storage ------------------------------------------------------

    @property
    def _centroids_path(self) -> str:
        return os.path.join(self.path, "centroids")

    def _committed_batches(self) -> list[str]:
        """Marker-published batch dirs, plus legacy ``_COMMITTED``
        dirs for indexes written before the scheme (legacy filter
        shared on BatchCommitLog with MinHashIndex)."""
        return self._log.committed_batches("vectors", include_legacy=True)

    def _state_dirs(self) -> list[str]:
        """The dirs that together hold the current vector state: the
        newest compaction checkpoint (if any) + every committed batch
        outside its covered set (operators/compaction.py)."""
        return self._ckpts.state_dirs("vectors")

    def centroids(self) -> DataFrame:
        if not os.path.isdir(self._centroids_path):
            raise RuntimeError(f"index at {self.path} has no centroids; call build() first")
        return self.spark.read.parquet(self._centroids_path)

    def _vectors(self, dirs: list[str] | None = None) -> DataFrame:
        if dirs is None:
            dirs = self._state_dirs()
        if not dirs:
            return self.spark.createDataFrame(
                [], "vec_id long, embedding array<float>, centroid_id long"
            )
        # per-dir reads, each with ITSELF as basePath: keeps the
        # centroid_id= partition column visible while letting batch=
        # and ckpt= dirs coexist in one state listing (a single
        # multi-path read would see them as conflicting partition
        # columns); centroid_id stays a partition column in every
        # sub-read, so topk's isin filter still statically prunes.
        # The EXPLICIT schema is load-bearing, not style: a zero-row
        # epoch (a quiet foreachBatch micro-batch) commits a batch dir
        # holding only _SUCCESS, and a per-dir schema INFERENCE on it
        # throws UNABLE_TO_INFER_SCHEMA — one empty epoch would brick
        # every future read (the old multi-path read inferred from
        # sibling dirs and masked this).
        out = None
        for d in dirs:
            sub = (
                self.spark.read.schema(
                    "vec_id long, embedding array<float>, centroid_id long"
                )
                .option("basePath", d)
                .parquet(d)
                .select("vec_id", "embedding", "centroid_id")
            )
            out = sub if out is None else out.unionByName(sub)
        return out

    def _write_batch(self, assigned: DataFrame, batch_id: int | None = None) -> None:
        import uuid

        n = self._log.next_batch_id("vectors") if batch_id is None else int(batch_id)
        uid = uuid.uuid4().hex[:8]
        dst = os.path.join(self.path, "vectors", f"batch={n}-{uid}")
        assigned.write.mode("overwrite").partitionBy("centroid_id").parquet(dst)
        try:
            self._log.claim(n, uid)
        except ConcurrentAppendError:
            if batch_id is None:
                raise  # auto id: a rival stole it — caller retries
            # an epoch replay raced us; the winner's content is
            # identical, our staged dir is orphan garbage for gc's TTL
            return

    # -- maintenance ---------------------------------------------------

    def compact(self) -> None:
        """Fold the current state (checkpoint + uncovered batches)
        into ONE ``centroid_id=``-partitioned checkpoint dir,
        superseding the exact batch-id set it merged (operators/
        compaction.py — same covered-set protocol as MinHashIndex and
        SemanticIndex).  Read-side effect: topk's partition-pruned
        scan touches nprobe dirs once instead of nprobe × n_appends,
        and the per-bucket small files a year of deltas accretes
        rewrite into full-sized ones.  Row-set unchanged; a batch
        committed after the snapshot stays readable.  No-op when
        nothing new landed; racing compactors serialize on the
        marker."""
        import uuid

        snap = self._ckpts.snapshot()
        if not snap.fresh:
            return
        seq = self._ckpts.next_seq()
        uid = uuid.uuid4().hex[:8]
        self._vectors(dirs=snap.dirs["vectors"]).write.mode(
            "overwrite"
        ).partitionBy("centroid_id").parquet(
            self._ckpts.ckpt_dir("vectors", seq, uid)
        )
        self._ckpts.claim(seq, uid, snap.covered | set(snap.fresh))

    def gc(self, orphan_ttl_seconds: float | None = None) -> list[str]:
        """Reclaim covered batch dirs and superseded checkpoints; with
        a TTL, also crashed appenders' staged dirs and rival same-seq
        checkpoint dirs (operators/compaction.py holds the contract:
        markers stay, quiesce before gc).  The TTL arm also sweeps
        crashed appenders' stale intent fences."""
        removed = self._ckpts.gc(orphan_ttl_seconds)
        if orphan_ttl_seconds is not None:
            removed += self._log.sweep_stale_intents(orphan_ttl_seconds)
        return removed

    def erase(
        self,
        vec_ids: list[int],
        suppress: bool = False,
        max_attempts: int = 3,
    ) -> None:
        """Right-to-be-forgotten for stored vectors (the pair-index
        twin of streaming/erasure.py): write a superseding checkpoint
        holding everything EXCEPT ``vec_ids`` — unlike compact() this
        never no-ops on freshness, because erasure must apply to an
        already-compacted index too.  The erased bytes physically
        leave the filesystem when gc() reclaims the covered dirs
        (Delta DELETE + VACUUM shape).  Epoch markers are untouched,
        so a replayed stream epoch that originally carried the vector
        stays SKIPPED — replay cannot resurrect an erased id.

        Concurrency contract identical to MinHashIndex.erase: a batch
        committed between snapshot and claim would stay outside the
        superseding checkpoint, so the erase verifies afterwards and
        re-runs against a fresh snapshot, bounded by ``max_attempts``;
        ``suppress=True`` records the ids in the takedown ledger first
        so any post-record append drops them on entry (without it, a
        later batch may legitimately re-admit an id)."""
        ids = [int(i) for i in vec_ids]
        if suppress:
            self.suppression.record(ids)
            # Drain the append-intent fence: an append that read the
            # ledger before the record could commit after the verify
            # loop with zero footprint visible here — see
            # MinHashIndex.erase for the full argument.
            self._log.wait_intents_drained(self._log.live_intents())
        for _ in range(max_attempts):
            self._erase_once(ids)
            if not self._vectors().filter(
                F.col("vec_id").isin(ids)
            ).limit(1).count():
                return
        raise RuntimeError(
            f"erase could not converge after {max_attempts} attempts: "
            "concurrent ingest keeps re-admitting the ids — quiesce "
            "appends (or pass suppress=True) and retry"
        )

    def _erase_once(self, ids: list[int]) -> None:
        import uuid

        snap = self._ckpts.snapshot()
        seq = self._ckpts.next_seq()
        uid = uuid.uuid4().hex[:8]
        kept = self._vectors(dirs=snap.dirs["vectors"]).filter(
            ~F.col("vec_id").isin(ids)
        )
        kept.write.mode("overwrite").partitionBy("centroid_id").parquet(
            self._ckpts.ckpt_dir("vectors", seq, uid)
        )
        self._ckpts.claim(seq, uid, snap.covered | set(snap.fresh))

    # -- the operator -------------------------------------------------

    def build(
        self, corpus: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
    ) -> None:
        """Train (seed-spread + Lloyd refine) and freeze the centroids,
        then admit `corpus` as batch 0."""
        if os.path.isdir(self._centroids_path):
            raise RuntimeError(f"index at {self.path} is already built")
        cents = choose_centroids(corpus, self.n_centroids, vec_col, id_col)
        if self.refine_iters > 0:
            cents = refine_centroids(
                corpus, cents, iterations=self.refine_iters, vec_col=vec_col, id_col=id_col
            )
        cents.write.mode("overwrite").parquet(self._centroids_path)
        self.append_batch(corpus, id_col, vec_col)

    def freeze_centroids(self, centroids: DataFrame) -> None:
        """Freeze a trained centroid set WITHOUT admitting any batch —
        the setup step of a stream-owned index (every batch, the
        initial corpus included, arrives through the epoch-keyed sink;
        a batch-owned build would poison the epoch id space).  Refuses
        a second freeze: the centroids are the table's immutable
        physical layout."""
        if os.path.isdir(self._centroids_path):
            raise RuntimeError(f"index at {self.path} is already built")
        centroids.write.mode("overwrite").parquet(self._centroids_path)

    def append_batch(
        self,
        vectors: DataFrame,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
        batch_id: int | None = None,
    ) -> bool:
        """Assign `vectors` to the frozen centroids and commit them as a
        new batch. Ids must be globally unique across batches.

        ``batch_id`` keys the commit to a CALLER-owned epoch (see
        MinHashIndex.append_batch — identical contract): a replayed
        foreachBatch epoch is skipped before the assignment runs
        (replaying would double the stored vectors, duplicating every
        future topk hit), and one index is either stream-owned or
        batch-owned, never both (storage.claim_ownership_mode).
        Returns True iff THIS call committed."""
        claim_ownership_mode(
            self.backend, self.path, "auto" if batch_id is None else "epoch"
        )
        if batch_id is not None and self.backend.exists(
            self._log.marker(int(batch_id))
        ):
            return False  # replayed epoch: already admitted
        # Append-intent fence (storage.py): published BEFORE the
        # suppression-ledger read, closed after the commit — lets
        # erase(suppress=True) drain pre-record appends before
        # trusting its verify pass.
        intent = self._log.open_intent()
        try:
            # takedown ledger (suppression.py): a suppressed id never
            # re-enters the stored vectors
            vectors = self.suppression.filter_batch(vectors, id_col)
            cents = self.centroids()
            assigned = assign_buckets(
                vectors.select(
                    F.col(id_col).alias("vec_id"),
                    F.col(vec_col).alias("embedding"),
                ),
                cents,
            )
            self._write_batch(assigned, batch_id)
            return True
        finally:
            self._log.close_intent(intent)

    def centroid_drift(
        self, vectors: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
    ) -> float:
        """Mean nearest-centroid cosine for a batch — the rebuild alarm.
        Compare against the same number measured at build time; a drop
        means the frozen layout no longer fits the data."""
        cents = self.centroids()
        scored = (
            vectors.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("embedding"))
            .crossJoin(F.broadcast(cents))
            .select("vec_id", cosine(F.col("embedding"), F.col("centroid_vec")).alias("c_sim"))
            .groupBy("vec_id")
            .agg(F.max("c_sim").alias("best"))
            .agg(F.avg("best").alias("drift"))
        )
        return float(scored.collect()[0]["drift"])

    def rebuild(self, new_path: str, n_centroids: int | None = None) -> "IvfIndex":
        """The drift remedy this module's header promises: train FRESH
        centroids from the CURRENT stored vectors and admit them as
        batch 0 of a NEW index dir — never in-place retraining, which
        would silently strand already-bucketed vectors under a layout
        their ``centroid_id=`` partitions no longer match.  The caller
        swaps its pointer to ``new_path`` when ready (and may gc the
        old dir); readers of the old index are untouched throughout —
        the same immutable-then-swap shape as the silver manifest's
        version dirs.  The carried vectors are admitted as batch 0
        under an auto id, so the new index is batch-owned like any
        built index (a stream that fed the old one must re-checkpoint
        against the new table either way — its epochs named the OLD
        table's batches).  Cost: one full scan + shuffle of the stored
        vectors — the operation is FOR the rare drift alarm, not
        routine maintenance (that is compact())."""
        n = n_centroids or self.n_centroids
        new = IvfIndex(
            self.spark, new_path, n_centroids=n,
            nprobe=self.nprobe, refine_iters=self.refine_iters,
            backend=self.backend,
        )
        new.build(self._vectors().select("vec_id", "embedding"))
        return new

    def topk(
        self,
        queries: DataFrame,
        k: int = 10,
        query_id: str = "query_id",
        query_vec: str = "query_vec",
    ) -> DataFrame:
        """Top-k over the probed buckets only. The probe set (query ×
        nprobe centroid ids) is driver-collected — bounded by
        |queries|·nprobe, and |queries| is small by contract (the large
        side is the INDEX) — so the bucket filter is a STATIC partition
        prune: unprobed centroid_id= dirs are never even listed."""
        cents = self.centroids()
        q_scored = queries.crossJoin(F.broadcast(cents)).select(
            query_id,
            query_vec,
            "centroid_id",
            cosine(F.col(query_vec), F.col("centroid_vec")).alias("c_sim"),
        )
        wq = Window.partitionBy(query_id).orderBy(F.desc("c_sim"), F.asc("centroid_id"))
        probes = (
            q_scored.withColumn("rn", F.row_number().over(wq))
            .filter(F.col("rn") <= self.nprobe)
            .select(query_id, query_vec, "centroid_id")
        )
        probed_ids = sorted(
            {r["centroid_id"] for r in probes.select("centroid_id").distinct().collect()}
        )
        vecs = self._vectors().filter(F.col("centroid_id").isin(probed_ids))
        cand = vecs.join(F.broadcast(probes), "centroid_id").select(
            query_id,
            "vec_id",
            cosine(F.col(query_vec), F.col("embedding")).alias("cos_sim"),
        )
        w = Window.partitionBy(query_id).orderBy(F.desc("cos_sim"), F.asc("vec_id"))
        return (
            cand.withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") <= k)
            .select(
                query_id,
                "vec_id",
                F.round("cos_sim", 6).alias("cos_sim"),
                F.col("rk").cast("long").alias("rk"),
            )
        )


def ivf_sink(index: IvfIndex, id_col: str = "vec_id", vec_col: str = "embedding"):
    """foreachBatch adapter: ``.writeStream.foreachBatch(ivf_sink(
    idx))`` maintains the IVF table from an embedding stream with
    exactly-once state — the streaming batch id keys each commit, so
    at-least-once redelivery is skipped, not re-admitted (a replayed
    epoch would double its vectors and duplicate every future topk
    hit).  Setup contract: ``idx.freeze_centroids`` first, so every
    batch arrives through the stream under epoch ids."""

    def process(batch_df: DataFrame, batch_id: int) -> None:
        index.append_batch(batch_df, id_col, vec_col, batch_id=int(batch_id))

    return process
