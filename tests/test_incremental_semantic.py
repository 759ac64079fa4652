"""SemanticIndex: incremental semantic dedup must equal the one-shot
run exactly when both use the same frozen centroids — the verifier is
integer-exact and membership is deterministic, so there is no fp
tolerance, only set equality.  Mirrors test_incremental_dedup.py's
invariant for the MinHash index.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from cdc_demo_spark.operators.incremental_semantic import SemanticIndex
from cdc_demo_spark.operators.similarity import (
    choose_centroids,
    refine_centroids,
)
from cdc_demo_spark.sources.tables import load_table


def _pairs(df) -> set[tuple[int, int]]:
    return {(r.id_a, r.id_b) for r in df.collect()}


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return load_table(spark, sf_dir, "embeddings").localCheckpoint(eager=True)


@pytest.fixture(scope="module")
def frozen_centroids(spark, emb):
    c = choose_centroids(emb, 8)
    return refine_centroids(emb, c, iterations=2).localCheckpoint(eager=True)


def test_two_batch_equals_one_shot(spark, emb, frozen_centroids, tmp_path):
    one = SemanticIndex(spark, str(tmp_path / "one"), n_buckets=8)
    p_one = _pairs(one.build(emb, centroids=frozen_centroids))

    inc = SemanticIndex(spark, str(tmp_path / "inc"), n_buckets=8)
    first = emb.filter(F.col("vec_id") % 5 < 3)
    second = emb.filter(F.col("vec_id") % 5 >= 3)
    p1 = _pairs(inc.build(first, centroids=frozen_centroids))
    p2 = _pairs(inc.append_batch(second))

    assert p1 | p2 == p_one
    assert p1 & p2 == set()  # a pair is admitted exactly once
    assert p_one, "fixture produced no pairs; invariant is vacuous"


def test_pairs_subset_of_exact_graph(spark, emb, frozen_centroids, tmp_path):
    """Admitted pairs use the same integer verifier as the exact scan,
    so they can only MISS (bucketing recall), never invent."""
    from cdc_demo_spark.operators.similarity import int8_cosine_pairs_gemm

    idx = SemanticIndex(spark, str(tmp_path / "sub"), n_buckets=8)
    got = _pairs(idx.build(emb, centroids=frozen_centroids))
    exact = _pairs(int8_cosine_pairs_gemm(emb))
    assert got <= exact
    assert len(got) / len(exact) >= 0.8


def test_centroid_drift_detects_shift(spark, emb, frozen_centroids, tmp_path):
    """In-distribution batches score near the build-time drift value;
    a distribution-shifted batch (negated vectors) scores lower —
    the signal that triggers a rebuild."""
    idx = SemanticIndex(spark, str(tmp_path / "drift"), n_buckets=8)
    idx.build(emb, centroids=frozen_centroids)
    base = idx.centroid_drift(emb)
    shifted = emb.select(
        "vec_id", F.transform("embedding", lambda x: -x).alias("embedding")
    )
    assert idx.centroid_drift(shifted) < base


def test_meta_mismatch_raises(spark, emb, frozen_centroids, tmp_path):
    path = str(tmp_path / "meta")
    SemanticIndex(spark, path, n_buckets=8).build(emb, centroids=frozen_centroids)
    with pytest.raises(ValueError, match="built with"):
        SemanticIndex(spark, path, n_buckets=4)


def test_crashed_append_is_invisible(spark, emb, frozen_centroids, tmp_path):
    """A batch without its batch-level commit marker must contribute
    NOTHING to later probes (garbage, not corruption) — including the
    half-written case where one state table landed and the other (or
    the marker) did not, which a per-table marker scheme would expose
    as candidate ids with no vectors to verify against."""
    path = str(tmp_path / "crash")
    idx = SemanticIndex(spark, path, n_buckets=8)
    first = emb.filter(F.col("vec_id") % 5 < 3)
    second = emb.filter(F.col("vec_id") % 5 >= 3)
    idx.build(first, centroids=frozen_centroids)
    # simulate a crash after the members write but before commit:
    # quantized dir gone, marker gone, members dir still on disk
    import shutil

    import glob

    os.remove(os.path.join(path, "commits", "0"))
    shutil.rmtree(glob.glob(os.path.join(path, "quantized", "batch=0-*"))[0])
    # with batch 0 uncommitted, the second batch only sees itself
    solo = SemanticIndex(spark, str(tmp_path / "solo"), n_buckets=8)
    expected = _pairs(solo.build(second, centroids=frozen_centroids))
    assert _pairs(idx.append_batch(second)) == expected


def test_state_encoding_mismatch_refuses_to_open(spark, tmp_path):
    """ADVICE r8: the arrow-mode quantized sidecar changed encoding
    (packed int8 bytes vs array<bigint>) — a pre-version index must
    refuse to open under current code rather than accept appends that
    mix encodings inside one table."""
    import json

    from cdc_demo_spark.storage import DEFAULT_BACKEND

    path = str(tmp_path / "sem")
    idx = SemanticIndex(spark, path, arrow=True)
    meta_path = os.path.join(path, "_meta.json")
    stored = json.loads(DEFAULT_BACKEND.read(meta_path))
    assert stored["state_encoding"] == 2
    # simulate a pre-version index: no state_encoding field at all
    legacy = {k: v for k, v in stored.items() if k != "state_encoding"}
    DEFAULT_BACKEND.delete(meta_path)
    assert DEFAULT_BACKEND.put_if_absent(meta_path, json.dumps(legacy).encode())
    with pytest.raises(ValueError, match="built with"):
        SemanticIndex(spark, path, arrow=True)
    # same params + same encoding still opens fine
    DEFAULT_BACKEND.delete(meta_path)
    assert DEFAULT_BACKEND.put_if_absent(meta_path, json.dumps(stored).encode())
    SemanticIndex(spark, path, arrow=True)
