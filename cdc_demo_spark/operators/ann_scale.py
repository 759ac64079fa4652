"""Arrow/GEMM fast paths for the ANN + semantic-dedup stack at scale.

The one-shot operators in ``similarity.py`` are written for oracle
parity: centroid assignment is a broadcast crossJoin with the HOF
``cosine`` (interpreted per element) ranked by a window, and pair
verification is the HOF integer filter — exactly right for the
500-row driver fixture, where being DuckDB-checkable matters more
than constants.  Probing them at ~1M vectors (VERDICT r6 item 1)
makes the constants the story:

- assignment: 1M rows × K centroids × d dims of interpreted HOF is
  hours; the same argmax is one numpy GEMM per Arrow batch.
- verification: millions of candidate pairs × d interpreted steps;
  the same int64 math vectorizes to one fused numpy expression.
- candidate pairs: materializing (id_a, id_b) rows before verifying
  them shuffles the quadratic-ish candidate set; verifying WITHIN
  bucket tiles (the bucketed analog of ``int8_cosine_pairs_gemm``)
  never materializes a candidate that fails the threshold.

Everything here preserves the exact semantics of its slow twin:

- ``assign_multiprobe_arrow`` ranks by (cosine desc, centroid_id asc)
  like ``assign_multiprobe``; float sums may differ in the last ulp
  (BLAS reorders additions) which can only matter on exact rank ties
  — pytest pins set-equality on the driver fixture.
- ``int8_threshold_filter_arrow`` is the SAME int64 arithmetic as
  ``_int8_threshold_filter`` — integer math is order-independent, so
  equality is exact by construction (and still pytest-pinned).
- ``int8_cosine_pairs_bucketed_gemm`` admits a pair only through that
  integer test, so its output is provably a subset of the exact
  ``int8_cosine_pairs_gemm`` graph; recall against planted duplicates
  is the measured, pytest-gated quantity.

100 TB shape: centroids train once on a bounded deterministic sample
(driver k-means — kilobytes of state, same policy as PQ codebooks),
assignment is one Arrow pass over the corpus, and the bucketed GEMM's
per-task memory is two sub-tiles (= 2 · tile_rows · d int64) no matter
the corpus size.  Skewed buckets split into hash sub-tiles
sized from an exact per-bucket count, so a hot bucket degrades into
more tasks, not a bigger task.
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cdc_demo_spark.operators.similarity import int8_quantized

# Driver-side bound for the centroid collect (K vectors of d floats).
# K beyond this is not an IVF layout anymore — it's a second corpus.
CENTROID_CAP = 1 << 17


def centroid_matrix(centroids: DataFrame) -> tuple[np.ndarray, np.ndarray]:
    """(centroid_ids int64[K], matrix float64[K, d]) from a centroids
    DataFrame, cap-guarded like every other driver-side pull."""
    rows = centroids.select("centroid_id", "centroid_vec").limit(
        CENTROID_CAP + 1
    ).collect()
    if len(rows) > CENTROID_CAP:
        raise ValueError(
            f"centroid set exceeds the driver-collect cap ({CENTROID_CAP}); "
            "an IVF layout with more buckets than that should shard its "
            "centroid table and assign hierarchically"
        )
    rows.sort(key=lambda r: r["centroid_id"])
    ids = np.array([r["centroid_id"] for r in rows], dtype=np.int64)
    C = np.array([r["centroid_vec"] for r in rows], dtype=np.float64)
    return ids, C


def _norm_rows(x: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(x, axis=1, keepdims=True)
    n[n == 0.0] = 1.0
    return x / n


def train_centroids_sampled(
    corpus: DataFrame,
    n_centroids: int,
    sample: int = 65536,
    iters: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Spherical k-means centroids from a deterministic md5-ordered
    sample — the scale twin of ``choose_centroids`` + ``refine_
    centroids`` (whose ntile seed is a GLOBAL window sort and whose
    Lloyd iterations each re-score corpus × K through the interpreted
    HOF; their own docstrings say "at 100 TB seed/train from a
    sample" — this is that function).  Same policy as PQ codebook
    training: the sample is md5-ordered so the result is reproducible
    run-to-run, the trained state is kilobytes, and training cost is
    independent of corpus size."""
    spark = corpus.sparkSession
    rows = (
        corpus.select(id_col, vec_col)
        .orderBy(F.md5(F.col(id_col).cast("string")), F.col(id_col))
        .limit(sample)
        .collect()
    )
    if len(rows) < n_centroids:
        raise ValueError(
            f"sampled k-means needs >= n_centroids={n_centroids} vectors, "
            f"got {len(rows)}"
        )
    x = _norm_rows(np.array([r[vec_col] for r in rows], dtype=np.float64))
    # deterministic spread seed: evenly spaced rows of the id-sorted
    # sample (the sampled analog of choose_centroids' ntile-first-row)
    order = np.argsort(np.array([r[id_col] for r in rows]))
    seed_idx = order[np.linspace(0, len(rows) - 1, n_centroids).astype(int)]
    C = x[seed_idx].copy()
    for _ in range(iters):
        # assign in chunks: sims chunk×K, argmax ties broken low-id by
        # argmax's first-max rule (rows of C are centroid_id order)
        assign = np.empty(len(x), dtype=np.int64)
        Cn = _norm_rows(C)
        step = max(1, (1 << 24) // max(1, n_centroids))
        for lo in range(0, len(x), step):
            assign[lo : lo + step] = (x[lo : lo + step] @ Cn.T).argmax(axis=1)
        for k in range(n_centroids):
            members = x[assign == k]
            if len(members):
                C[k] = members.mean(axis=0)
            else:
                # deterministic re-seed: the sample row furthest into
                # the list not already a seed (stable, data-dependent)
                C[k] = x[seed_idx[k % len(seed_idx)]]
    out = [
        (int(k), [float(v) for v in C[k]]) for k in range(n_centroids)
    ]
    return spark.createDataFrame(
        out, "centroid_id long, centroid_vec array<float>"
    )


def assign_multiprobe_arrow(
    corpus: DataFrame,
    centroids: DataFrame,
    probes: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, centroid_id): each vector's ``probes`` nearest centroids by
    (cosine desc, centroid_id asc) — ``assign_multiprobe`` semantics,
    one numpy GEMM per Arrow batch instead of crossJoin × HOF × window.
    Output drops the vector column (every caller rejoins by id)."""
    cids, C = centroid_matrix(centroids)
    Cn = _norm_rows(C).T  # (d, K)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf[id_col].to_numpy()
            X = _norm_rows(np.array(pdf[vec_col].tolist(), dtype=np.float64))
            S = X @ Cn  # (n, K)
            # top-`probes` per row by (sim desc, centroid_id asc):
            # argsort on -S is stable, so equal sims keep index order
            # == centroid_id order (cids is sorted ascending)
            top = np.argsort(-S, axis=1, kind="stable")[:, :probes]
            n = len(ids)
            yield pd.DataFrame(
                {
                    "id": np.repeat(ids, probes),
                    "centroid_id": cids[top].reshape(n * probes),
                }
            )

    out = corpus.select(id_col, vec_col).mapInPandas(
        gen, schema="id long, centroid_id long"
    )
    return out.withColumnRenamed("id", id_col) if id_col != "id" else out


def int8_threshold_filter_arrow(
    cand: DataFrame, t_num: int, t_den: int
) -> DataFrame:
    """``_int8_threshold_filter`` vectorized: same int64 test
    (dot >= 0 AND t_den²·dot² >= t_num²·|qa|²·|qb|²) evaluated with
    numpy integer arithmetic — order-independent, so EXACTLY the same
    pair set, at Arrow-batch speed.  ``cand`` carries qa/qb int64
    arrays with no nulls (quantized zero vectors are filtered by the
    caller, as in every GEMM path)."""
    tn2, td2 = t_num * t_num, t_den * t_den

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            if not len(b):
                continue
            qa = np.array(b["qa"].tolist(), dtype=np.int64)
            qb = np.array(b["qb"].tolist(), dtype=np.int64)
            dot = (qa * qb).sum(axis=1)
            na = (qa * qa).sum(axis=1)
            nb = (qb * qb).sum(axis=1)
            ok = (dot >= 0) & (td2 * dot * dot >= tn2 * na * nb)
            yield pd.DataFrame(
                {
                    "id_a": b["id_a"].to_numpy()[ok],
                    "id_b": b["id_b"].to_numpy()[ok],
                }
            )

    return cand.select("id_a", "id_b", "qa", "qb").mapInPandas(
        gen, schema="id_a long, id_b long"
    )


def int8_cosine_pairs_bucketed_gemm(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    t_num: int = 2,
    t_den: int = 5,
    n_buckets: int = 1024,
    probes: int = 2,
    centroids: DataFrame | None = None,
    sample: int = 65536,
    train_iters: int = 4,
    tile_rows: int = 8192,
) -> DataFrame:
    """The ANN pair scan restructured as WITHIN-BUCKET integer GEMM —
    ``int8_cosine_pairs_ann``'s scale twin.  Instead of materializing
    (id_a, id_b) candidate rows and verifying each through a joined
    filter (the candidate set is ~probes²/n_buckets of n² — billions
    of rows at 1M vectors), quantized vectors are packed into per-
    (bucket, sub-tile) blocks and each block pair is verified as one
    int64 GEMM, the same kernel as ``int8_cosine_pairs_gemm`` — a
    failing pair costs 2d integer ops inside numpy and never exists
    as a row.

    Admission is the identical integer threshold test, so the output
    is a strict subset of the exact pair graph (zero false positives);
    recall = the bucketing's miss rate, measured against planted
    duplicates (tests/test_ann_scale.py) exactly like the candidate-
    row path's recall gate.

    Per-task memory: two sub-tiles (2·tile_rows·d int64), constant in
    corpus size; sub-tile counts come from an exact per-bucket count,
    so skew splits hot buckets into more tasks."""
    if centroids is None:
        centroids = train_centroids_sampled(
            corpus, n_buckets, sample, train_iters, vec_col, id_col
        )
    member = assign_multiprobe_arrow(corpus, centroids, probes, id_col, vec_col)
    q = int8_quantized(corpus, id_col, vec_col).filter(
        ~F.exists("qv", lambda x: x.isNull())
    )
    qm = member.join(q, member[id_col] == q["id"]).select("centroid_id", "id", "qv")
    counts = qm.groupBy("centroid_id").agg(F.count(F.lit(1)).alias("cnt"))
    qm = (
        qm.join(counts, "centroid_id")
        .withColumn("nsub", F.greatest(F.ceil(F.col("cnt") / tile_rows), F.lit(1)))
        .withColumn("blk", F.pmod(F.xxhash64("id"), F.col("nsub")))
    )
    packed = (
        qm.groupBy("centroid_id", "blk")
        .agg(F.collect_list(F.struct("id", "qv")).alias("chunk"))
        .localCheckpoint(eager=False)  # pack once; both join sides reuse it
    )
    x = packed.select("centroid_id", F.col("blk").alias("bx"), F.col("chunk").alias("cx"))
    y = packed.select("centroid_id", F.col("blk").alias("by"), F.col("chunk").alias("cy"))
    # within-bucket sub-tile pairs; ~n_buckets rows when buckets fit one
    # tile. Hash-repartition spreads tile payloads so one Arrow batch
    # holds a handful of block pairs, not hundreds (the same bounded-
    # batch reasoning as int8_cosine_pairs_gemm's one-tile-per-partition)
    block_pairs = (
        x.join(y, ["centroid_id"])
        .filter(F.col("bx") <= F.col("by"))
        .repartition(max(64, min(2048, n_buckets)), "centroid_id", "bx", "by")
    )
    tn2, td2 = t_num * t_num, t_den * t_den

    def unpack(cell):
        ids = np.fromiter((e["id"] for e in cell), dtype=np.int64, count=len(cell))
        M = np.stack([np.asarray(e["qv"], dtype=np.int64) for e in cell])
        return ids, M, (M * M).sum(axis=1)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            for bx, by, cx, cy in zip(b["bx"], b["by"], b["cx"], b["cy"]):
                ids_x, X, nx2 = unpack(cx)
                if bx == by:
                    ids_y, Y, ny2 = ids_x, X, nx2
                else:
                    ids_y, Y, ny2 = unpack(cy)
                D = X @ Y.T
                ok = (D >= 0) & (td2 * D * D >= tn2 * nx2[:, None] * ny2[None, :])
                lt = ok & (ids_x[:, None] < ids_y[None, :])
                ii, jj = np.nonzero(lt)
                out_a, out_b = [ids_x[ii]], [ids_y[jj]]
                if bx != by:
                    # within a bucket an id lives in exactly one sub-
                    # tile, so cross-tile pairs appear once per bucket —
                    # emit the (y < x) orientation too
                    gt = ok & (ids_x[:, None] > ids_y[None, :])
                    ii, jj = np.nonzero(gt)
                    out_a.append(ids_y[jj])
                    out_b.append(ids_x[ii])
                a = np.concatenate(out_a)
                if len(a):
                    yield pd.DataFrame({"id_a": a, "id_b": np.concatenate(out_b)})

    pairs = block_pairs.select("bx", "by", "cx", "cy").mapInPandas(
        gen, schema="id_a long, id_b long"
    )
    # multi-probe puts a vector in `probes` buckets; a pair sharing two
    # buckets is found twice — same dedup as centroid_candidate_pairs
    return pairs.dropDuplicates(["id_a", "id_b"])


def semantic_dedup_ann_gemm(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    t_num: int = 2,
    t_den: int = 5,
    n_buckets: int = 1024,
    probes: int = 2,
    centroids: DataFrame | None = None,
    sample: int = 65536,
    train_iters: int = 4,
) -> DataFrame:
    """``semantic_dedup_ann`` with the bucketed-GEMM pair source — the
    composition you run at 1M+ vectors (benched in bench.py's ann_1m
    entries). Same output schema as semantic_dedup."""
    from cdc_demo_spark.operators.similarity import semantic_dedup

    pairs = int8_cosine_pairs_bucketed_gemm(
        corpus, id_col, vec_col, t_num, t_den,
        n_buckets, probes, centroids, sample, train_iters,
    )
    return semantic_dedup(corpus, id_col, vec_col, t_num, t_den, pairs=pairs)
