"""Deterministic synthetic embedding corpora for mid-scale probes.

The driver fixtures pin documents/embeddings at 500 rows at EVERY sf
(TESTDATA.md), so the ANN/PQ/GEMM stack's scale claims had no measured
point between toy and asymptotic reasoning (VERDICT r6 item 1).  This
module generates corpora of arbitrary size that are:

- **Distributed**: vectors are a pure function of (vec_id, seed),
  computed partition-side with vectorized integer hashing — no driver
  materialization, no RNG state to coordinate, identical output for
  any partitioning.  (numpy RNGs are deliberately avoided: per-row
  seeding is slow and batch seeding depends on batch boundaries.)
- **Reproducible**: splitmix64 of (seed, vec_id, dim) — same corpus
  bit-for-bit every run, which is what makes benchmark deltas
  meaningful round over round.
- **Ground-truthed**: every ``dup_every``-th vector is a planted
  near-duplicate of its predecessor (the predecessor's vector plus
  ``noise``-scaled perturbation), so ANN recall can be measured
  against a KNOWN pair set without first running an exact quadratic
  scan — at 1M vectors the exact scan is the expensive thing the
  probe exists to avoid.

Random 64-dim unit vectors concentrate near cosine 0 (std ≈ 1/√d), so
with a dedup threshold of 0.8 the planted pairs are, by construction,
essentially the only true pairs — accidental ones are ~6σ events.
"""

from __future__ import annotations

import os
import shutil
import tempfile
import uuid

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

_GOLDEN = np.uint64(0x9E3779B97F4A7C15)


def _mix64(z: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer — vectorized, wraps mod 2^64 (uint64).
    errstate: the wrap IS the algorithm; numpy's overflow warning would
    otherwise fire (and break warnings-as-errors test runs)."""
    with np.errstate(over="ignore"):
        z = z + _GOLDEN
        z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        return z ^ (z >> np.uint64(31))


def _unit_floats(keys: np.ndarray) -> np.ndarray:
    """uint64 hash keys -> floats uniform in [-1, 1)."""
    return (_mix64(keys) >> np.uint64(11)).astype(np.float64) / float(1 << 53) * 2.0 - 1.0


def _vectors_for_ids(ids: np.ndarray, dim: int, seed: int,
                     dup_every: int, noise: float) -> np.ndarray:
    """(len(ids), dim) float32 — the pure function of id this module
    is built around.  Planted dups: id % dup_every == dup_every-1 takes
    id-1's base vector + noise * perturbation(id)."""
    ids = ids.astype(np.uint64)
    if dup_every > 0:
        # (guard, not np.where over a dup_every=0 branch: an eager
        # `ids % 0` would warn/poison even when unselected)
        base_id = np.where(
            (ids % np.uint64(dup_every) == np.uint64(dup_every - 1)) & (ids > 0),
            ids - np.uint64(1),
            ids,
        )
    else:
        base_id = ids
    cols = np.arange(dim, dtype=np.uint64)[None, :]
    salt = np.uint64((seed * 0xD6E8FEB86659FD93) % (1 << 64))
    with np.errstate(over="ignore"):
        keys = base_id[:, None] * np.uint64(dim) + cols + salt
        x = _unit_floats(keys)
        if dup_every > 0:
            is_dup = base_id != ids
            if is_dup.any():
                pert = _unit_floats(
                    ids[is_dup][:, None] * np.uint64(dim) + cols
                    + salt + np.uint64(0xA5A5A5A5A5A5A5A5)
                )
                x[is_dup] += noise * pert
    return x.astype(np.float32)


def synth_embeddings(
    spark: SparkSession,
    n: int,
    dim: int = 64,
    seed: int = 7,
    dup_every: int = 100,
    noise: float = 0.05,
    parts: int = 32,
    start: int = 0,
) -> DataFrame:
    """(vec_id long, embedding array<float>) — n deterministic vectors
    with planted near-duplicate pairs (vec_id k·dup_every-1 ≈ its
    predecessor). Generated partition-side; safe at any n.  ``start``
    offsets the id range: vectors are a pure function of vec_id, so
    ``start=N`` generates exactly the rows a bigger corpus would have
    had there — the incremental-index bench uses this for deltas."""

    def gen(batches):
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            vecs = _vectors_for_ids(ids, dim, seed, dup_every, noise)
            yield pd.DataFrame({"vec_id": ids, "embedding": list(vecs)})

    return spark.range(start, start + n, numPartitions=parts).mapInPandas(
        gen, schema="vec_id long, embedding array<float>"
    )


def planted_pairs(n: int, dup_every: int = 100) -> list[tuple[int, int]]:
    """The ground-truth near-dup pair set for a synth corpus of size n:
    (k·dup_every-2, k·dup_every-1) for every complete group."""
    return [
        (i - 1, i)
        for i in range(dup_every - 1, n, dup_every)
        if i >= 1
    ]


def ensure_synth_corpus(
    spark: SparkSession,
    n: int,
    dim: int = 64,
    seed: int = 7,
    dup_every: int = 100,
    noise: float = 0.05,
) -> str:
    """Generate-once parquet cache for bench runs (same build-to-temp +
    atomic-rename publish as the derived event layout: racing builders
    each stage under a uuid, the loser adopts the winner's copy)."""
    tag = f"n{n}_d{dim}_s{seed}_e{dup_every}_z{noise}"
    path = os.path.join(tempfile.gettempdir(), f"spark_graft_synthvec_v1_{tag}")
    if os.path.exists(os.path.join(path, "_SUCCESS")):
        return path
    stage = f"{path}.build-{uuid.uuid4().hex[:8]}"
    synth_embeddings(spark, n, dim, seed, dup_every, noise).write.mode(
        "overwrite"
    ).parquet(stage)
    try:
        os.rename(stage, path)
    except OSError:
        if not os.path.exists(os.path.join(path, "_SUCCESS")):
            raise
        shutil.rmtree(stage, ignore_errors=True)
    return path
