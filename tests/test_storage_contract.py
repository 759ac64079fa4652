"""The commit-metadata seam (cdc_demo_spark.storage): every durability
decision — silver manifest CAS, incremental-index batch markers — must
go through CommitBackend.put_if_absent and nothing stronger.

Proven by running the real merge and index paths against
InMemoryCommitBackend, which has NO rename, NO hard link, NO
filesystem at all for metadata (the model of an object store's
conditional create).  If any commit path regressed to a direct
os.link/os.rename/open() on its metadata, these tests would fail:
the manifest/marker would land on disk where the fake can't see it
(reads would miss it), or land in the fake without the atomicity the
POSIX path provided.

Also pins the single-writer enforcement the round-5 ADVICE asked for:
two appends racing to one batch id -> the loser raises
ConcurrentAppendError instead of silently interleaving half-batches.
"""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from cdc_demo_spark.storage import (
    ConcurrentAppendError,
    InMemoryCommitBackend,
    ObjectStoreCommitBackend,
)


@pytest.fixture(params=["memory", "objectstore"])
def be(request):
    """Every commit-path test runs against BOTH non-POSIX backends
    (VERDICT r6 #5): the rename-less in-memory fake proves the seam's
    semantics, the durable lock+validated-frame object-store emulation
    proves a real filesystem deployment needs nothing stronger."""
    if request.param == "memory":
        return InMemoryCommitBackend()
    return ObjectStoreCommitBackend()


def _env(spark, rows, seq0=0):
    return spark.createDataFrame(
        [
            (
                op,
                dt.datetime(2024, 1, 1, 0, 0, seq0 + s),
                seq0 + s,
                "pet",
                k,
                {"name": k, "v": v},
            )
            for s, (op, k, v) in enumerate(rows)
        ],
        "op string, ts timestamp, seq long, table string, key string, "
        "after struct<name:string, v:string>",
    )


class TestMergeOnFake:
    def test_merge_read_roundtrip_without_rename_or_link(self, spark, tmp_path, be):
        from cdc_demo_spark.streaming.merge import merge_into_silver, read_silver

        silver = str(tmp_path / "silver")
        merge_into_silver(
            spark,
            _env(spark, [("c", "fluffy", "1"), ("c", "claws", "1")]),
            silver,
            "pet",
            num_buckets=4,
            backend=be,
        )
        merge_into_silver(
            spark,
            _env(spark, [("u", "fluffy", "2"), ("d", "claws", None)], seq0=10),
            silver,
            "pet",
            backend=be,
        )
        got = {
            (r["name"], r["v"]) for r in read_silver(spark, silver, backend=be).collect()
        }
        assert got == {("fluffy", "2")}
        # the manifest went THROUGH the backend, not around it
        import os

        if isinstance(be, InMemoryCommitBackend):
            assert any("_manifest" in k for k in be._objects)
            assert not any(
                "_manifest" in f for f in os.listdir(silver)
            ), "manifest leaked to the filesystem bypassing the backend"
        else:
            # durable backend: the on-disk object is FRAMED (magic +
            # length) — a caller that bypassed the backend with a bare
            # open() would have written raw JSON
            names = [f for f in os.listdir(silver) if "_manifest" in f and not f.startswith(".")]
            assert names
            raw = open(os.path.join(silver, names[0]), "rb").read()
            assert raw[:4] == ObjectStoreCommitBackend._MAGIC

    def test_concurrent_commit_loses_cleanly(self, spark, tmp_path, be):
        from cdc_demo_spark.streaming.merge import (
            ConcurrentCommitError,
            _commit_manifest,
            _load_manifest,
            merge_into_silver,
        )

        silver = str(tmp_path / "silver")
        merge_into_silver(
            spark, _env(spark, [("c", "a", "1")]), silver, "pet", num_buckets=4, backend=be
        )
        manifest = _load_manifest(silver, be)
        # a rival claims version N+1 first (same loaded snapshot)
        _commit_manifest(silver, dict(manifest), be)
        with pytest.raises(ConcurrentCommitError):
            _commit_manifest(silver, dict(manifest), be)


class TestIndexesOnFake:
    def test_semantic_index_on_fake_backend(self, spark, sf_dir, tmp_path, be):
        from cdc_demo_spark.operators.incremental_semantic import SemanticIndex
        from cdc_demo_spark.sources.tables import load_table

        emb = load_table(spark, sf_dir, "embeddings").limit(120).localCheckpoint()
        idx = SemanticIndex(spark, str(tmp_path / "ix"), n_buckets=4, backend=be)
        first = emb.filter(F.col("vec_id") % 2 == 0)
        second = emb.filter(F.col("vec_id") % 2 == 1)
        p1 = idx.build(first)
        p1.count()
        idx.append_batch(second).count()
        # both batches committed through the fake; meta + 2 markers
        assert be.exists(str(tmp_path / "ix" / "_meta.json"))
        assert be.list_dir(str(tmp_path / "ix" / "commits")) in (["0", "1"], ["1", "0"])
        # reopening with identical params is fine; mismatch raises
        SemanticIndex(spark, str(tmp_path / "ix"), n_buckets=4, backend=be)
        with pytest.raises(ValueError, match="built with"):
            SemanticIndex(spark, str(tmp_path / "ix"), n_buckets=8, backend=be)

    def test_semantic_concurrent_append_fails_loudly(self, spark, sf_dir, tmp_path, be):
        from cdc_demo_spark.operators.incremental_semantic import SemanticIndex
        from cdc_demo_spark.sources.tables import load_table

        emb = load_table(spark, sf_dir, "embeddings").limit(40).localCheckpoint()
        idx = SemanticIndex(spark, str(tmp_path / "ix"), n_buckets=4, backend=be)
        idx.build(emb).count()
        # the race: both writers compute next id = 1, the rival's marker
        # lands first.  Pin our id computation to model the interleaving
        # (in real time the rival commits between our _next_batch_id and
        # our put_if_absent).
        assert be.put_if_absent(idx._log.marker(1), b"")
        idx._log.next_batch_id = lambda table: 1
        with pytest.raises(ConcurrentAppendError):
            idx.append_batch(
                emb.withColumn("vec_id", F.col("vec_id") + 10_000)
            ).count()

    def test_minhash_index_on_fake_backend(self, spark, sf_dir, tmp_path, be):
        from cdc_demo_spark.operators.incremental_dedup import MinHashIndex
        from cdc_demo_spark.sources.tables import load_table

        docs = load_table(spark, sf_dir, "documents").limit(80).localCheckpoint()
        idx = MinHashIndex(spark, str(tmp_path / "mh"), backend=be)
        idx.append_batch(docs).count()
        assert be.list_dir(str(tmp_path / "mh" / "commits")) == ["0"]
        # rival's marker for id 1 lands between our id computation and
        # our commit -> loud failure, no interleaving
        assert be.put_if_absent(idx._log.marker(1), b"")
        idx._log.next_batch_id = lambda table: 1
        with pytest.raises(ConcurrentAppendError):
            idx.append_batch(
                docs.withColumn("doc_id", F.col("doc_id") + 10_000)
            ).count()

    def test_uncommitted_batch_invisible_and_id_not_reused(
        self, spark, sf_dir, tmp_path, be
    ):
        """Crash model: batch dirs written, marker never landed — the
        batch must be invisible to probes AND its id must not be
        reused by the next append (reuse would resurrect the garbage
        under a later marker)."""
        from cdc_demo_spark.operators.incremental_dedup import MinHashIndex
        from cdc_demo_spark.sources.tables import load_table

        docs = load_table(spark, sf_dir, "documents").limit(60).localCheckpoint()
        idx = MinHashIndex(spark, str(tmp_path / "mh"), backend=be)
        idx.append_batch(docs).count()
        # simulate a crashed append: data dirs exist, marker missing
        crashed = docs.withColumn("doc_id", F.col("doc_id") + 50_000)
        sh = idx._read("shingles", "id long, h64 long")
        n_committed = sh.count()
        for table in ("buckets", "shingles"):
            (tmp_path / "mh" / table / "batch=1").mkdir(parents=True, exist_ok=True)
        assert idx._log.next_batch_id("buckets") == 2  # dir present -> id burned
        assert (
            idx._read("shingles", "id long, h64 long").count() == n_committed
        ), "uncommitted batch leaked into reads"
        idx.append_batch(crashed).count()
        assert be.exists(idx._log.marker(2))


class TestMergeRetry:
    def test_retry_wins_after_concurrent_commit(self, spark, tmp_path, be):
        """A rival commits between our manifest load and our commit; the
        wrapper reloads and lands on the next version — final state
        reflects BOTH writers (the loser's re-merge sees the winner's
        rows as state)."""
        from cdc_demo_spark.streaming import merge as M

        silver = str(tmp_path / "silver")
        M.merge_into_silver(
            spark, _env(spark, [("c", "a", "1")]), silver, "pet",
            num_buckets=4, backend=be,
        )

        # rival fires exactly once, right at our first commit attempt
        real_commit = M._commit_manifest
        fired = {"n": 0}

        def racing_commit(path, manifest, backend):
            if fired["n"] == 0:
                fired["n"] = 1
                rival = dict(M._load_manifest(path, backend))
                real_commit(path, rival, backend)  # rival claims our version
            real_commit(path, manifest, backend)

        M._commit_manifest = racing_commit
        try:
            attempts = M.merge_into_silver_with_retry(
                spark, _env(spark, [("c", "b", "2")], seq0=10), silver, "pet",
                backend=be,
            )
        finally:
            M._commit_manifest = real_commit
        assert attempts == 2
        got = {
            (r["name"], r["v"])
            for r in M.read_silver(spark, silver, backend=be).collect()
        }
        assert got == {("a", "1"), ("b", "2")}

    def test_retry_exhaustion_raises(self, spark, tmp_path, be):
        from cdc_demo_spark.streaming import merge as M

        silver = str(tmp_path / "silver")
        M.merge_into_silver(
            spark, _env(spark, [("c", "a", "1")]), silver, "pet",
            num_buckets=4, backend=be,
        )
        real_commit = M._commit_manifest

        def always_raced(path, manifest, backend):
            rival = dict(M._load_manifest(path, backend))
            real_commit(path, rival, backend)
            real_commit(path, manifest, backend)  # always loses

        M._commit_manifest = always_raced
        try:
            with pytest.raises(M.ConcurrentCommitError):
                M.merge_into_silver_with_retry(
                    spark, _env(spark, [("c", "b", "2")], seq0=10), silver,
                    "pet", retries=2, backend=be,
                )
        finally:
            M._commit_manifest = real_commit


class TestErasureOnBackends:
    def test_silver_erasure_commits_through_backend(self, spark, tmp_path, be):
        """GDPR silver erasure rewrites a bucket and commits the new
        manifest via the SAME put-if-absent seam as merges — proven by
        running it end-to-end on both non-POSIX backends."""
        from cdc_demo_spark.streaming.erasure import erase_key_from_silver
        from cdc_demo_spark.streaming.merge import merge_into_silver, read_silver

        silver = str(tmp_path / "silver")
        merge_into_silver(
            spark,
            _env(spark, [("c", "fluffy", "1"), ("c", "claws", "2")], seq0=30),
            silver, "pet", num_buckets=4, backend=be,
        )
        assert erase_key_from_silver(spark, silver, "fluffy", backend=be)
        got = {(r["name"], r["v"])
               for r in read_silver(spark, silver, backend=be).collect()}
        assert got == {("claws", "2")}
        # late straggler older than the tombstone cannot resurrect
        merge_into_silver(
            spark, _env(spark, [("u", "fluffy", "9")], seq0=10),
            silver, "pet", backend=be,
        )
        got = {(r["name"], r["v"])
               for r in read_silver(spark, silver, backend=be).collect()}
        assert got == {("claws", "2")}


class TestObjectStoreSemantics:
    def test_torn_put_is_absent_and_reclaimable(self, tmp_path):
        """A crash mid-PUT leaves a torn frame: readers must treat the
        object as ABSENT (an object store's failed PUT never existed)
        and a later conditional create must reclaim the name."""
        import os

        be = ObjectStoreCommitBackend()
        p = str(tmp_path / "meta" / "marker")
        assert be.put_if_absent(p, b"good")
        # torn write: truncate mid-frame (as a crash would)
        with open(p, "r+b") as f:
            f.truncate(8)
        assert not be.exists(p)
        assert be.list_dir(str(tmp_path / "meta")) == []
        import pytest as _pytest

        with _pytest.raises(FileNotFoundError):
            be.read(p)
        assert be.put_if_absent(p, b"second")  # name reclaimed
        assert be.read(p) == b"second"

    def test_concurrent_threads_single_winner(self, tmp_path):
        import threading

        be = ObjectStoreCommitBackend()
        p = str(tmp_path / "c" / "marker")
        wins = []

        def go(i):
            if be.put_if_absent(p, f"writer-{i}".encode()):
                wins.append(i)

        ts = [threading.Thread(target=go, args=(i,)) for i in range(16)]
        for t in ts:
            t.start()
        for t in ts:
            t.join()
        assert len(wins) == 1
        assert be.read(p) == f"writer-{wins[0]}".encode()

    def test_lock_files_invisible(self, tmp_path):
        be = ObjectStoreCommitBackend()
        d = str(tmp_path / "dir")
        assert be.put_if_absent(d + "/a", b"1")
        assert be.exists(d + "/a") and not be.exists(d + "/b")
        assert be.list_dir(d) == ["a"]
        be.delete(d + "/a")
        assert be.list_dir(d) == []


class TestShardedLayoutThroughSeam:
    def test_sharded_pruned_fetch_roundtrip_on_object_store(
        self, spark, sf_dir, tmp_path, be, monkeypatch
    ):
        """The r8 sharded stored-shingle layout discovers its shard
        partitions through CommitBackend.list_data_dir (VERDICT r8 #4)
        — this pins the full append → sidecar → pruned-fetch loop on
        the non-POSIX backends, so an object-store port that reroutes
        the one listing method inherits a proven path."""
        import cdc_demo_spark.operators.incremental_dedup as mod
        from cdc_demo_spark.operators.incremental_dedup import MinHashIndex
        from cdc_demo_spark.sources.tables import load_table

        monkeypatch.setattr(mod, "_SHARD_ROWS", 256)  # force nshards > 1
        docs = load_table(spark, sf_dir, "documents")
        big = docs.filter(F.col("doc_id") < 400).localCheckpoint()
        idx = MinHashIndex(spark, str(tmp_path / "mh"), k=3, threshold=0.12, backend=be)
        idx.append_batch(big).count()
        (d,) = idx._committed_batches("shingles")
        ns = idx._nshards_of(d)
        assert ns > 1, "batch should have sharded"
        ids = [r["doc_id"] for r in big.limit(6).collect()]
        # the pruned fetch must touch only the candidates' shards ...
        shards = sorted({(i % ns + ns) % ns for i in ids})
        assert len(idx._shard_files(d, shards)) < len(idx._shard_files(d, None))
        # ... and return exactly what the unpruned scan filters to
        pruned = {(r["id"], r["h64"]) for r in idx.stored_shingles(ids).collect()}
        full = {
            (r["id"], r["h64"])
            for r in idx.stored_shingles().filter(F.col("id").isin(ids)).collect()
        }
        assert pruned and pruned == full
