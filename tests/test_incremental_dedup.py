"""Incremental MinHash index: two-batch probe+append must find exactly
the pairs a one-shot corpus dedup finds, uncommitted batches must stay
invisible, and parameter drift must refuse loudly."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from cdc_demo_spark.operators.dedup import minhash_near_duplicates
from cdc_demo_spark.operators.incremental_dedup import MinHashIndex
from cdc_demo_spark.sources.tables import load_table


def _pairs(df):
    return {(r["id_a"], r["id_b"], r["jaccard"]) for r in df.collect()}


def test_incremental_equals_one_shot(spark, sf_dir, tmp_path):
    docs = load_table(spark, sf_dir, "documents")
    a = docs.filter(F.col("doc_id") < 300)
    b = docs.filter(F.col("doc_id") >= 300)

    one_shot = minhash_near_duplicates(
        docs, "doc_id", "text", k=3, num_hashes=64, bands=16, threshold=0.12
    )

    idx = MinHashIndex(spark, str(tmp_path / "idx"), k=3, threshold=0.12)
    p1 = idx.append_batch(a)
    p2 = idx.append_batch(b)

    # Precondition for exact equality (see append_batch docstring): no
    # (band, bucket) may cross max_bucket between batches — pairs
    # admitted under the cap are never retracted. Assert the fixture
    # keeps every combined bucket under the cap so a future corpus
    # change surfaces here, not as a mystery equality failure below.
    from cdc_demo_spark.operators.dedup import minhash_signatures

    combined = idx._band_buckets(
        minhash_signatures(docs, "doc_id", "text", k=3, num_hashes=idx.num_hashes)
    )
    max_occ = (
        combined.groupBy("band", "bucket")
        .count()
        .agg(F.max("count").alias("m"))
        .collect()[0]["m"]
    )
    assert max_occ <= idx.max_bucket, (
        f"fixture now has a bucket at {max_occ} > cap {idx.max_bucket}; "
        "incremental==one-shot no longer guaranteed (cap-crossing caveat)"
    )

    # batch-2 pairs must touch at least one batch-2 doc
    assert all(x >= 300 or y >= 300 for x, y, _ in _pairs(p2))
    assert _pairs(p1) | _pairs(p2) == _pairs(one_shot)


def test_uncommitted_batch_is_invisible(spark, sf_dir, tmp_path):
    docs = load_table(spark, sf_dir, "documents").limit(50)
    idx = MinHashIndex(spark, str(tmp_path / "idx"), k=3, threshold=0.12)
    idx.append_batch(docs)

    # simulate a crashed append: parquet written, no marker published
    orphan = tmp_path / "idx" / "buckets" / "batch=99-deadbeef"
    docs.select(
        F.col("doc_id").alias("id"), F.lit(0).alias("band"), F.lit(0).cast("long").alias("bucket")
    ).write.parquet(str(orphan))
    import glob

    committed = idx._committed_batches("buckets")
    assert committed == glob.glob(str(tmp_path / "idx" / "buckets" / "batch=0-*"))
    assert str(orphan) not in committed


def test_parameter_drift_refuses(spark, tmp_path):
    MinHashIndex(spark, str(tmp_path / "idx"), k=3, bands=16)
    with pytest.raises(ValueError, match="built with"):
        MinHashIndex(spark, str(tmp_path / "idx"), k=5, bands=16)
    with pytest.raises(ValueError, match="built with"):
        MinHashIndex(spark, str(tmp_path / "idx"), k=3, bands=8)


def test_empty_index_first_batch_self_pairs(spark, tmp_path):
    df = spark.createDataFrame(
        [
            (1, "w x y z a b c d"),
            (2, "w x y z a b c e"),  # near-dup of 1
            (3, "p q r s t u v j"),
        ],
        "doc_id long, text string",
    )
    idx = MinHashIndex(spark, str(tmp_path / "idx"), k=3, threshold=0.3)
    got = _pairs(idx.append_batch(df))
    assert {(x, y) for x, y, _ in got} == {(1, 2)}


def test_sharded_layout_pruned_fetch_equals_full(spark, sf_dir, tmp_path, monkeypatch):
    """r8 sharded stored-shingle layout: a batch past _SHARD_ROWS lands
    partitioned by pmod(id, nshards) with an _nshards sidecar, and the
    pruned candidate fetch returns EXACTLY the rows the unpruned scan
    filters — across a MIX of sharded and unsharded batch dirs (the
    legacy degradation path)."""
    import cdc_demo_spark.operators.incremental_dedup as mod

    monkeypatch.setattr(mod, "_SHARD_ROWS", 256)  # force ns > 1 at toy scale
    docs = load_table(spark, sf_dir, "documents")
    big = docs.filter(F.col("doc_id") < 400).localCheckpoint()
    tiny = docs.filter(F.col("doc_id") >= 400).limit(3).localCheckpoint()

    idx = MinHashIndex(spark, str(tmp_path / "idx"), k=3, threshold=0.12)
    idx.append_batch(big).count()
    idx.append_batch(tiny).count()

    d_big, d_tiny = idx._committed_batches("shingles")
    assert idx._nshards_of(d_big) > 1, "big batch should have sharded"
    assert idx._nshards_of(d_tiny) == 1, "3-doc batch should stay unsharded"

    ids = [r["doc_id"] for r in big.limit(5).collect()] + [
        r["doc_id"] for r in tiny.limit(1).collect()
    ]
    pruned = {(r["id"], r["h64"]) for r in idx.stored_shingles(ids).collect()}
    full = {
        (r["id"], r["h64"])
        for r in idx.stored_shingles().filter(F.col("id").isin(ids)).collect()
    }
    assert pruned and pruned == full


def test_sharded_append_equals_one_shot(spark, sf_dir, tmp_path, monkeypatch):
    """The core incremental == one-shot invariant, re-pinned with the
    stored side FORCED through the sharded layout + pruned fetch."""
    import cdc_demo_spark.operators.incremental_dedup as mod

    monkeypatch.setattr(mod, "_SHARD_ROWS", 256)
    docs = load_table(spark, sf_dir, "documents")
    a = docs.filter(F.col("doc_id") < 300)
    b = docs.filter(F.col("doc_id") >= 300)
    one_shot = minhash_near_duplicates(
        docs, "doc_id", "text", k=3, num_hashes=64, bands=16, threshold=0.12
    )
    idx = MinHashIndex(spark, str(tmp_path / "idx"), k=3, threshold=0.12)
    p1 = idx.append_batch(a)
    p2 = idx.append_batch(b)
    assert idx._nshards_of(idx._committed_batches("shingles")[0]) > 1
    assert _pairs(p1) | _pairs(p2) == _pairs(one_shot)


def test_probe_only_cross_decontamination(spark, sf_dir, tmp_path):
    """probe_only (r16): a read-only cross probe against the stored
    corpus finds exactly the cross pairs the cross-LSH operator finds
    on the same frames (same signature family), mutates NOTHING (state
    dirs, stored_pairs, and a re-probe are all unchanged), and reports
    no probe-vs-probe pairs."""
    from cdc_demo_spark.operators.dedup import minhash_cross_near_duplicates

    docs = load_table(spark, sf_dir, "documents")
    stored = docs.filter(F.col("doc_id") % 50 == 0)       # "benchmark" index
    probe = docs.filter(F.col("doc_id") % 50 != 0)

    idx = MinHashIndex(spark, str(tmp_path / "idx"), k=3, threshold=0.5)
    idx.append_batch(stored)
    dirs_before = sorted(
        os.path.join(r, f)
        for r, _, fs in os.walk(str(tmp_path / "idx"))
        for f in fs
    )
    stored_pairs_before = _pairs(idx.stored_pairs())

    got = {
        (r["probe_id"], r["stored_id"], r["jaccard"])
        for r in idx.probe_only(probe).collect()
    }
    # reference: the one-shot cross operator on the same two frames
    want = {
        (r["id_a"], r["id_b"], r["jaccard"])
        for r in minhash_cross_near_duplicates(
            probe, stored, "doc_id", "text", k=3, threshold=0.5
        ).collect()
    }
    assert got == want and got, (len(got), len(want))
    # cross only, correct orientation
    assert all(p % 50 != 0 and s % 50 == 0 for p, s, _ in got)

    # read-only: nothing on disk changed, stored pairs unchanged,
    # re-probe returns the same result
    dirs_after = sorted(
        os.path.join(r, f)
        for r, _, fs in os.walk(str(tmp_path / "idx"))
        for f in fs
    )
    assert dirs_after == dirs_before
    assert _pairs(idx.stored_pairs()) == stored_pairs_before
    again = {
        (r["probe_id"], r["stored_id"], r["jaccard"])
        for r in idx.probe_only(probe).collect()
    }
    assert again == got
