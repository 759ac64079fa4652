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

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

TILE_SCHEMA = "centroid_id long, blk long, n int, ids binary, qvb binary"

# Driver-side bound for the centroid collect (K vectors of d floats).
# K beyond this is not an IVF layout anymore — it's a second corpus.
CENTROID_CAP = 1 << 17


def centroid_matrix(centroids: DataFrame) -> tuple[np.ndarray, np.ndarray]:
    """(centroid_ids int64[K], matrix float64[K, d]) from a centroids
    DataFrame, cap-guarded like every other driver-side pull.

    Arrow ``toPandas`` instead of ``collect``: at the 64k-centroid
    bench grain, row-object collect materializes 4M Python floats and
    measured ~1.2 s of the 2.7 s assignment entry; the Arrow pull of
    the same table is ~0.1 s and values are identical (float32 cells
    widen exactly into the float64 matrix either way).  r12, part of
    the ann_assign drift pin."""
    pdf = (
        centroids.select("centroid_id", "centroid_vec")
        .limit(CENTROID_CAP + 1)
        .toPandas()
    )
    if len(pdf) > CENTROID_CAP:
        raise ValueError(
            f"centroid set exceeds the driver-collect cap ({CENTROID_CAP}); "
            "an IVF layout with more buckets than that should shard its "
            "centroid table and assign hierarchically"
        )
    if not len(pdf):
        return np.empty(0, dtype=np.int64), np.empty((0, 0), dtype=np.float64)
    ids = pdf["centroid_id"].to_numpy().astype(np.int64)
    order = np.argsort(ids)
    ids = ids[order]
    C = np.stack(pdf["centroid_vec"].to_numpy())[order].astype(np.float64)
    return ids, C


def _norm_rows(x: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(x, axis=1, keepdims=True)
    n[n == 0.0] = 1.0
    return x / n


def _ship_matrix(centroids: DataFrame, C: np.ndarray) -> np.ndarray:
    """The centroid matrix in the narrowest LOSSLESS dtype for worker
    shipping: float32 when the source column is float32 (the astype
    round-trip is exact because every value in ``C`` came from a
    float32 cell), float64 otherwise.  Halves the mapInPandas closure
    (33 MB → 17 MB at 64k×64) that each python worker unpickles per
    job; workers widen back to float64 BEFORE normalization or any
    other arithmetic, so scores stay bit-identical to the driver-side
    float64 path.  r12, part of the ann_assign drift pin."""
    from pyspark.sql.types import ArrayType, FloatType

    dt = centroids.schema["centroid_vec"].dataType
    if isinstance(dt, ArrayType) and isinstance(dt.elementType, FloatType):
        return C.astype(np.float32)
    return C


def _widen(df: DataFrame) -> DataFrame:
    """Repartition a narrow input up to the cluster's parallelism.

    A 1M×64 float corpus is ~280 MB of parquet — which the scan
    coalesces into ~3 partitions at the default maxPartitionBytes, so
    every Arrow stage downstream runs 3-wide on a 32-core host
    (measured: the assignment GEMM alone was 104 s at 1M before this,
    ~6 s after).  Dense-vector work is CPU-bound per byte, so the
    right split size is far below the scan default; one explicit
    round-robin shuffle of the vectors buys full-width compute for
    every stage after it."""
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


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
    src = _widen(corpus.select(id_col, vec_col))
    n = src.count()
    if n > sample * 8:
        # hash-prefix prefilter: keep ~4·sample rows cheaply so the
        # md5 ordering sorts thousands of rows, not the whole corpus
        # (the filter is a pure function of id — still deterministic;
        # uniform hash makes undershooting 4× margin a non-event, and
        # the length check below catches it loudly regardless)
        cut = int((sample * 4 / n) * (1 << 32))
        src = src.filter(
            F.pmod(F.xxhash64(F.col(id_col)), F.lit(1 << 32)) < cut
        )
    # Narrow-key sample selection (r12): TakeOrdered heaps carrying the
    # 64-float vectors measured 3.5-4.6 s of training — sort only
    # (md5, id) pairs, broadcast the winning ids back onto the vector
    # scan, and restore the exact (md5, id) order driver-side, so the
    # sample SET and ORDER are identical to the old single wide sort
    # (reproducibility contract unchanged, including across different
    # input partitionings).
    h = F.md5(F.col(id_col).cast("string")).alias("__h")
    winners = src.select(h, id_col).orderBy("__h", id_col).limit(sample)
    pdf = (
        src.join(F.broadcast(winners), id_col)
        .toPandas()  # Arrow pull — a 65k row-object collect was ~2 s (r12)
        .sort_values(["__h", id_col], kind="mergesort", ignore_index=True)
    )
    if len(pdf) < n_centroids:
        raise ValueError(
            f"sampled k-means needs >= n_centroids={n_centroids} vectors, "
            f"got {len(pdf)}"
        )
    x = _norm_rows(np.stack(pdf[vec_col].to_numpy()).astype(np.float64))
    # deterministic spread seed: evenly spaced rows of the id-sorted
    # sample (the sampled analog of choose_centroids' ntile-first-row)
    order = np.argsort(pdf[id_col].to_numpy())
    seed_idx = order[np.linspace(0, len(pdf) - 1, n_centroids).astype(int)]
    C = x[seed_idx].copy()
    d = x.shape[1]
    for _ in range(iters):
        # assignment through the blocked top-k (probes=1): identical
        # first-max/lowest-id tie rule, and the cache-resident score
        # blocks run the same flops 2.6x faster than the old
        # row-chunked full-K slabs even single-process (r12; the
        # slab's 134 MB chunks were memory-bound here too)
        Cn = _norm_rows(C)
        assign = _topk_centroids(x, np.ascontiguousarray(Cn.T), 1)[:, 0]
        # vectorized update: per-dimension bincount (deterministic
        # input-order accumulation) replaces the K boolean-mask scans —
        # the old loop was O(K·n) element touches per iteration and
        # measured ~15 s of the 18.6 s training at K=2048/n=65536
        # (r12).  Values differ from np.mean's pairwise summation only
        # in the last ulp; training stays deterministic and frozen
        # indexes keep their stored centroids regardless.
        counts = np.bincount(assign, minlength=n_centroids)
        sums = np.empty((n_centroids, d))
        for j in range(d):
            sums[:, j] = np.bincount(
                assign, weights=x[:, j], minlength=n_centroids
            )
        nz = counts > 0
        C[nz] = sums[nz] / counts[nz, None]
        # deterministic re-seed of empty clusters: fall back to the
        # cluster's original spread-seed row (stable, data-dependent)
        for k in np.nonzero(~nz)[0]:
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
    C_ship = _ship_matrix(centroids, C)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        Cn = None  # widened + normalized once per task, not per batch
        for pdf in batches:
            if not len(pdf):  # empty partition: np.stack needs >= 1 row
                continue
            if Cn is None:
                Cn = _norm_rows(C_ship.astype(np.float64)).T  # (d, K)
            ids = pdf[id_col].to_numpy()
            # np.stack over the Arrow-native ndarray rows — .tolist()
            # would materialize every element as a Python float (64M
            # objects at 1M×64, measured as most of the stage's wall)
            X = _norm_rows(np.stack(pdf[vec_col].to_numpy()).astype(np.float64))
            top = _topk_centroids(X, Cn, probes)
            n = len(ids)
            yield pd.DataFrame(
                {
                    "id": np.repeat(ids, probes),
                    "centroid_id": cids[top].reshape(n * probes),
                }
            )

    out = _widen(corpus.select(id_col, vec_col)).mapInPandas(
        gen, schema="id long, centroid_id long"
    )
    return out.withColumnRenamed("id", id_col) if id_col != "id" else out


_SCORE_CHUNK = 2048  # row chunk for the grouped (gathered-column) path
_SCORE_ROWS = 512
_SCORE_COLS = 1024


def _topk_centroids(X: np.ndarray, Cn: np.ndarray, probes: int) -> np.ndarray:
    """top-``probes`` centroid column indices per row of ``X @ Cn``,
    ranked by (score desc, index asc).

    The score GEMM runs in ROW × COLUMN blocks so each score block
    stays ~4 MB (cache-resident) instead of n×K.  Row chunking alone
    (the r7 version) still materialized a full n_chunk×K slab — 164 MB
    per task at K=64k — and 32 concurrent tasks streaming those slabs
    through DRAM made the stage bandwidth-bound: worker-side compute
    measured 20-40× its single-process cost (r12 drift pin on
    ann_assign_64k_flat).  Column blocking with a running top-k merge
    keeps the argmax passes in cache: measured 57-121 → 17-19
    aggregate compute-seconds, stage wall 2.5-5.5 → 1.5-2.0 s at
    10k×64k, and the blocked result is np.array_equal to the
    single-slab one.

    Tie rule everywhere is FIRST max = lowest centroid id: within a
    block argmax takes the first column; across blocks the running
    candidates (earlier blocks = lower ids) are concatenated BEFORE
    the block's, so equal scores resolve to the earlier block; within
    the merged candidate row, entries are kept (score desc, id asc)
    ordered by construction — the identical tie rule as the HOF
    window."""
    n = len(X)
    K = Cn.shape[1]
    top = np.empty((n, probes), dtype=np.int64)
    for rs in range(0, n, _SCORE_ROWS):
        Xr = X[rs : rs + _SCORE_ROWS]
        m = len(Xr)
        rows = np.arange(m)
        run_s = np.full((m, probes), -np.inf)
        run_i = np.zeros((m, probes), dtype=np.int64)
        for cs in range(0, K, _SCORE_COLS):
            S = Xr @ Cn[:, cs : cs + _SCORE_COLS]
            cand_s = np.empty((m, probes))
            cand_i = np.empty((m, probes), dtype=np.int64)
            for p in range(probes):
                t = S.argmax(axis=1)
                cand_s[:, p] = S[rows, t]
                cand_i[:, p] = t + cs
                S[rows, t] = -np.inf
            ms = np.concatenate([run_s, cand_s], axis=1)
            mi = np.concatenate([run_i, cand_i], axis=1)
            for p in range(probes):
                t = ms.argmax(axis=1)
                run_s[:, p] = ms[rows, t]
                run_i[:, p] = mi[rows, t]
                ms[rows, t] = -np.inf
        top[rs : rs + m] = run_i
    return top


def group_centroids(
    Cn: np.ndarray, n_groups: int, iters: int = 8
) -> tuple[np.ndarray, list[np.ndarray]]:
    """Deterministic spherical k-means over the CENTROIDS themselves:
    returns (Gn float64[d, G] unit group directions, member
    column-index arrays per group).  The two-level coarse quantizer's
    upper level — recomputed on demand from the frozen centroid
    matrix (K ≤ CENTROID_CAP rows driver-side, ~10⁸ flops at
    K=8192/G=90: cheaper than storing + versioning group state, and
    deterministic, so every caller of the same frozen centroids sees
    the same grouping).  Seeds are evenly spaced centroid indices
    (centroid_matrix sorts by centroid_id, so the seed — like every
    argmax tie below — is id-order stable)."""
    X = Cn.T  # (K, d), unit rows (callers pass _norm_rows output)
    K = len(X)
    if not 0 < n_groups <= K:
        raise ValueError(f"n_groups must be in [1, {K}], got {n_groups}")
    G = X[np.linspace(0, K - 1, n_groups).astype(int)].copy()
    for _ in range(iters):
        a = (X @ _norm_rows(G).T).argmax(axis=1)
        for g in range(n_groups):
            m = X[a == g]
            if len(m):
                G[g] = m.mean(axis=0)
    Gn = _norm_rows(G)
    a = (X @ Gn.T).argmax(axis=1)
    members = [np.nonzero(a == g)[0] for g in range(n_groups)]
    return Gn.T, members


def _topk_centroids_grouped(
    X: np.ndarray,
    Cn: np.ndarray,
    probes: int,
    Gn: np.ndarray,
    members: list[np.ndarray],
    group_probes: int,
) -> np.ndarray:
    """``_topk_centroids`` through a two-level coarse quantizer: score
    the G group directions, keep each row's top-``group_probes``
    groups, and score ONLY their member centroids — O(G + gp·K/G) per
    row instead of O(K), the at-scale assignment shape (at K=10⁶ flat
    scoring is 100× the flops of G=√K=1000 two-level).  APPROXIMATE:
    a row whose true nearest centroid lives outside its explored
    groups picks its best explored one — recall is measured, not
    assumed (tests + the ann_assign_64k bench pair).  With
    group_probes == G every centroid is scored and the result matches
    ``_topk_centroids`` exactly, including the (score desc, centroid
    index asc) tie rule — the parity anchor the tests pin."""
    n = len(X)
    gp = min(group_probes, Gn.shape[1])
    top = np.empty((n, probes), dtype=np.int64)
    for s in range(0, n, _SCORE_CHUNK):
        Xc = X[s : s + _SCORE_CHUNK]
        m = len(Xc)
        SG = Xc @ Gn  # (m, G)
        rows = np.arange(m)
        gsel = np.empty((m, gp), dtype=np.int64)
        for p in range(gp):
            t = SG.argmax(axis=1)
            gsel[:, p] = t
            SG[rows, t] = -np.inf
        # per group: score its members for the rows that probe it and
        # keep each row's top-`probes` WITHIN the group (argmax passes
        # — a row's global top-p are each inside their group's top-p,
        # so nothing is lost); then one small lexsort over ≤ gp·probes
        # candidates per row picks the global winners under the flat
        # path's exact tie rule (score desc, column index asc).  An
        # earlier draft lexsorted EVERY (row, member) score — m·gp·K/G
        # triples — and measured SLOWER than flat at K=64k; the
        # truncated gather is what makes two-level win.
        r_parts, s_parts, c_parts = [], [], []
        for g in np.unique(gsel):
            cols = members[g]
            if not len(cols):
                continue
            rsel = np.nonzero((gsel == g).any(axis=1))[0]
            Sg = Xc[rsel] @ Cn[:, cols]  # (|rsel|, |cols|)
            rr = np.arange(len(rsel))
            for _ in range(min(probes, len(cols))):
                t = Sg.argmax(axis=1)
                r_parts.append(rsel)
                s_parts.append(Sg[rr, t])
                c_parts.append(cols[t])
                Sg[rr, t] = -np.inf
        r = np.concatenate(r_parts)
        sc = np.concatenate(s_parts)
        c = np.concatenate(c_parts)
        order = np.lexsort((c, -sc, r))  # row asc, score desc, col asc
        r, c = r[order], c[order]
        starts = np.searchsorted(r, np.arange(m), side="left")
        ends = np.searchsorted(r, np.arange(m), side="right")
        if np.any(ends - starts < probes):
            raise ValueError(
                "a row has fewer candidate centroids than `probes`; "
                "raise group_probes or n_groups"
            )
        idx = starts[:, None] + np.arange(probes)[None, :]
        top[s : s + m] = c[idx]
    return top


def assign_quantized_multiprobe(
    corpus: DataFrame,
    centroids: DataFrame,
    probes: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    group_probes: int | None = None,
    n_groups: int | None = None,
) -> DataFrame:
    """(centroid_id, id, qv binary): multi-probe assignment FUSED with
    int8 quantization — one Arrow pass emits the tile-pack input
    directly.

    Why this exists: ``assign_multiprobe_arrow`` drops the vector
    column and every tile caller re-joined it by id — and that join
    re-shuffles the 512-byte float arrays of the whole corpus through
    a sort-merge (measured 50 s of the 79 s one-shot 1M pair scan,
    r7).  The assignment pass already holds the vectors; emitting the
    64-byte int8 form instead costs nothing and the join disappears.

    Parity: scores, probe ranking and tie rule are computed exactly as
    ``assign_multiprobe_arrow`` (same float64 normalize, same argmax
    scans), and qv bytes are ``int8_quantize_rows`` output — the
    elementwise JVM-parity-pinned quantizer.  Zero vectors are dropped
    here (their qv is NULL in the JVM path and they match nothing);
    membership state that must include them keeps using the unfused
    assignment.

    ``group_probes`` switches to the TWO-LEVEL coarse quantizer
    (group_centroids + _topk_centroids_grouped): per row O(G +
    group_probes·K/G) centroid scores instead of O(K) — the at-scale
    path once K outgrows a few thousand (flat scoring of a 10k delta
    is ~0.6 s per 4× bucket growth at the bench grain, and untenable
    at K=10⁶).  ``n_groups`` defaults to ~√K.  The grouping derives
    deterministically from the frozen centroids, so every batch of an
    index sees the same grouping — a whole pipeline picks flat OR
    grouped once (SemanticIndex freezes the choice in _meta.json) and
    two-batch == one-shot holds within that choice."""
    cids, C = centroid_matrix(centroids)
    C_ship = _ship_matrix(centroids, C)
    grouped = None
    if group_probes is not None:
        import math

        Cn_driver = _norm_rows(C).T  # (d, K)
        g = n_groups or max(1, int(math.isqrt(Cn_driver.shape[1])))
        grouped = group_centroids(Cn_driver, g)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        Cn = None  # widened + normalized once per task, not per batch
        for pdf in batches:
            if not len(pdf):
                continue
            if Cn is None:
                Cn = _norm_rows(C_ship.astype(np.float64)).T  # (d, K)
            ids = pdf[id_col].to_numpy()
            V = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            Q, nz = int8_quantize_rows(V)
            ids, V, Q = ids[nz], V[nz], Q[nz]
            if not len(ids):
                continue
            X = _norm_rows(V)
            if grouped is not None:
                top = _topk_centroids_grouped(
                    X, Cn, probes, grouped[0], grouped[1], group_probes
                )
            else:
                top = _topk_centroids(X, Cn, probes)
            n = len(ids)
            M = Q.astype(np.int8)
            qv = np.empty(n, dtype=object)
            for i in range(n):
                qv[i] = M[i].tobytes()
            yield pd.DataFrame(
                {
                    "centroid_id": cids[top].reshape(n * probes),
                    "id": np.repeat(ids, probes),
                    "qv": np.repeat(qv, probes),
                }
            )

    return _widen(corpus.select(id_col, vec_col)).mapInPandas(
        gen, schema="centroid_id long, id long, qv binary"
    )


def int8_quantize_rows(X: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(Q int64[n,d], nonzero bool[n]) — numpy twin of
    ``similarity.int8_quantized``: scale = 127/max|x| per row on the
    float64-cast values, ROUND_HALF_UP (away from zero), zero vectors
    flagged for the caller to drop (their qv is NULL in the JVM path
    and they match nothing).

    Rounding parity: Spark's round() is BigDecimal HALF_UP of the
    double's shortest decimal form; ``copysign(floor(|v| + 0.5), v)``
    computes the same integer unless |v| sits within one ulp of a
    half-integer AND the +0.5 addition rounds across it — a measure-
    zero coincidence for real-valued inputs that the elementwise
    parity test (tests/test_ann_scale.py) would surface if a fixture
    ever hit it.  The payoff: the JVM quantizer is three interpreted-
    HOF passes (~29 s alone at 1M×64); this is one fused numpy
    expression inside a pass that already exists."""
    X = X.astype(np.float64)
    mx = np.abs(X).max(axis=1)
    nonzero = mx > 0.0
    s = np.where(nonzero, 127.0 / np.where(nonzero, mx, 1.0), 0.0)
    V = X * s[:, None]
    Q = np.copysign(np.floor(np.abs(V) + 0.5), V).astype(np.int64)
    return Q, nonzero


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
            qa = np.stack(b["qa"].to_numpy()).astype(np.int64)
            qb = np.stack(b["qb"].to_numpy()).astype(np.int64)
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


def pack_tiles(qm: DataFrame, tile_rows: int = 8192) -> DataFrame:
    """Membership rows -> BINARY-PACKED tiles (centroid_id, blk, n,
    ids, qvb): per (bucket, sub-tile), ids as int64 bytes and
    int8-quantized vectors as raw bytes.  Accepts either
    (centroid_id, id, vec) rows — quantization happens in the pack —
    or (centroid_id, id, qv binary) rows straight from
    ``assign_quantized_multiprobe``, where the pack is a pure byte
    concatenation (the scale path: nothing float-sized ever shuffles).

    Why binary, not array<struct<id, qv>>: the struct encoding turns
    every tile element into Python objects at each Arrow boundary —
    measured as ~2/3 of the 1M-run wall (ROUND_NOTES r6 candidate #6)
    — and shuffles an int64 slot per value that fits a byte.  np.stack
    over Arrow list rows packs without per-element objects;
    np.frombuffer unpacks for free; the tile shuffle shrinks ~8×.

    Sub-tile counts come from an exact per-bucket count, so a skewed
    bucket splits into more tiles (more tasks), never a bigger task.
    Quantization happens here (int8_quantize_rows — the JVM HOF
    quantizer costs ~29 s alone at 1M×64); zero vectors drop out, as
    in every quantized path.

    Shape: one repartition on (centroid_id, blk), a sort within each
    partition on the same key, then a STREAMING pandas groupby over
    the partition's Arrow batches (mapInPandas).  The groupBy().
    applyInPandas it replaced paid a per-GROUP Arrow/pandas round-trip
    — at 2048 buckets that fixed overhead was ~5 s of a 10k-row delta
    append (r8 profile) and the same ~5 s inside the 1M one-shot scan.
    The first mapInPandas cut (r8) concatenated the WHOLE partition
    before grouping, so task memory scaled with corpus/|partitions| —
    fine at the 1M bench grain, a regression risk at 100 TB (ADVICE
    r8).  With the in-partition sort, groups arrive contiguous, so
    each Arrow batch's complete groups pack immediately and only the
    possibly-split trailing group carries over: task memory is one
    Arrow batch + one tile, independent of corpus AND of partition
    count.  Pair results never depend on row order within a tile: the
    block GEMM scores every cross pair."""
    has_qv = "qv" in qm.columns
    data_col = "qv" if has_qv else "vec"
    counts = qm.groupBy("centroid_id").agg(F.count(F.lit(1)).alias("cnt"))
    qm = (
        qm.join(counts, "centroid_id")
        .withColumn("nsub", F.greatest(F.ceil(F.col("cnt") / tile_rows), F.lit(1)))
        .withColumn("blk", F.pmod(F.xxhash64("id"), F.col("nsub")))
    )

    def pack_partition(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        carry: pd.DataFrame | None = None
        for b in batches:
            if not len(b):
                continue
            if carry is not None:
                b = pd.concat([carry, b], ignore_index=True)
                carry = None
            # rows are sorted by (centroid_id, blk), so the group that
            # may continue into the next batch is exactly the suffix
            # holding the LAST key — hold it back, pack the rest
            last_cid = b["centroid_id"].iat[-1]
            last_blk = b["blk"].iat[-1]
            tail = (
                (b["centroid_id"].to_numpy() == last_cid)
                & (b["blk"].to_numpy() == last_blk)
            )
            start = int(np.argmax(tail))  # first index of the suffix
            carry = b.iloc[start:]
            head = b.iloc[:start]
            if len(head):
                yield from _pack_groups(head, has_qv)
        if carry is not None and len(carry):
            yield from _pack_groups(carry, has_qv)

    def _pack_groups(pdf: pd.DataFrame, has_qv: bool) -> Iterator[pd.DataFrame]:
        out: dict[str, list] = {"centroid_id": [], "blk": [], "n": [], "ids": [], "qvb": []}
        for (cid, blk), g in pdf.groupby(["centroid_id", "blk"], sort=False):
            ids = g["id"].to_numpy(dtype=np.int64)
            if has_qv:  # pre-quantized bytes (zero vectors already dropped)
                qvb = b"".join(g["qv"])
            else:
                Q, nz = int8_quantize_rows(np.stack(g["vec"].to_numpy()))
                ids, M = ids[nz], Q[nz].astype(np.int8)
                if not len(ids):  # all-zero-vector tile: nothing to compare
                    continue
                qvb = M.tobytes()
            out["centroid_id"].append(int(cid))
            out["blk"].append(int(blk))
            out["n"].append(len(ids))
            out["ids"].append(ids.tobytes())
            out["qvb"].append(qvb)
        if out["n"]:
            yield pd.DataFrame(out)

    # the streaming carry above makes task memory independent of
    # partition sizing, so the count is purely a parallelism choice:
    # honor the session's shuffle sizing when it asks for more than
    # core count (the tuning knob a 100 TB run actually turns)
    spark = qm.sparkSession
    try:
        shuffle_parts = int(spark.conf.get("spark.sql.shuffle.partitions"))
    except (TypeError, ValueError):
        shuffle_parts = 0  # e.g. "auto" under some AQE configs
    npart = max(spark.sparkContext.defaultParallelism, shuffle_parts)
    return (
        qm.repartition(npart, "centroid_id", "blk")
        .select("centroid_id", "blk", "id", data_col)
        .sortWithinPartitions("centroid_id", "blk")
        .mapInPandas(pack_partition, schema=TILE_SCHEMA)
    )


def _unpack_tile(n, ids_b, qv_b):
    ids = np.frombuffer(ids_b, dtype=np.int64)
    # float64 GEMM, EXACT integers: every product is |a·b| <= 127² and
    # every partial sum <= d·127² ≈ 1e6 << 2^53, so the BLAS result is
    # the same integer the int64 loop computes — while numpy's integer
    # matmul (a non-BLAS gufunc loop) was measured as ~2/3 of the 1M
    # wall.  The threshold test itself stays in int64 after the exact
    # cast.
    M = np.frombuffer(qv_b, dtype=np.int8).reshape(n, -1).astype(np.float64)
    return ids, M, (M * M).sum(axis=1).astype(np.int64)


def _gemm_tasks(df: DataFrame) -> int:
    # ~2× cluster parallelism: each mapInPandas task carries ~1 s of
    # fixed Arrow/worker overhead, so one-block-pair tasks are pure
    # overhead (512 tasks measured 6.3 s where 64 took 2.8 s for the
    # same data); a small multiple of the core count balances skew
    # without breaking the two-tiles-per-GEMM memory bound (tiles are
    # decoded one block pair at a time inside the generator).
    return 2 * df.sparkSession.sparkContext.defaultParallelism


def tile_self_pairs(tiles: DataFrame, t_num: int, t_den: int) -> DataFrame:
    """All within-bucket pairs (id_a < id_b) of ONE tile set passing
    the int8 cosine threshold — each (sub-tile × sub-tile) block pair
    verified as one exact GEMM. Pairs sharing several buckets emerge
    once per bucket; callers dropDuplicates after unioning sources."""
    tiles = tiles.localCheckpoint(eager=True)  # both join sides read it
    x = tiles.select(
        "centroid_id", F.col("blk").alias("bx"),
        F.col("n").alias("nx"), F.col("ids").alias("ix"), F.col("qvb").alias("cx"),
    )
    y = tiles.select(
        "centroid_id", F.col("blk").alias("by"),
        F.col("n").alias("ny"), F.col("ids").alias("iy"), F.col("qvb").alias("cy"),
    )
    block_pairs = (
        x.join(y, ["centroid_id"])
        .filter(F.col("bx") <= F.col("by"))
        .repartition(_gemm_tasks(tiles), "centroid_id", "bx", "by")
    )
    tn2, td2 = t_num * t_num, t_den * t_den

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            for bx, by, nx, ix, cx, ny, iy, cy in zip(
                b["bx"], b["by"], b["nx"], b["ix"], b["cx"],
                b["ny"], b["iy"], b["cy"],
            ):
                ids_x, X, nx2 = _unpack_tile(nx, ix, cx)
                if bx == by:
                    ids_y, Y, ny2 = ids_x, X, nx2
                else:
                    ids_y, Y, ny2 = _unpack_tile(ny, iy, cy)
                D = (X @ Y.T).astype(np.int64)  # exact: see _unpack_tile
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

    return block_pairs.drop("centroid_id").mapInPandas(
        gen, schema="id_a long, id_b long"
    )


def tile_cross_pairs(
    new_tiles: DataFrame, stored_tiles: DataFrame, t_num: int, t_den: int
) -> DataFrame:
    """All same-bucket pairs BETWEEN two tile sets with disjoint id
    sets (a new batch probing stored state), canonical (id_a < id_b)
    orientation, threshold-verified by the same exact GEMM.  This is
    the incremental index's probe path: candidate pairs never exist
    as rows — a failing pair costs 2d numpy ops inside a tile GEMM —
    where the row-materializing probe join was ~occupancy·|batch|
    rows (measured out past 10 minutes at 1M stored × 10k batch)."""
    x = new_tiles.select(
        "centroid_id", F.col("blk").alias("bx"),
        F.col("n").alias("nx"), F.col("ids").alias("ix"), F.col("qvb").alias("cx"),
    )
    y = stored_tiles.select(
        "centroid_id", F.col("blk").alias("by"),
        F.col("n").alias("ny"), F.col("ids").alias("iy"), F.col("qvb").alias("cy"),
    )
    block_pairs = x.join(y, ["centroid_id"]).repartition(
        _gemm_tasks(new_tiles), "centroid_id", "bx", "by"
    )
    tn2, td2 = t_num * t_num, t_den * t_den

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            for nx, ix, cx, ny, iy, cy in zip(
                b["nx"], b["ix"], b["cx"], b["ny"], b["iy"], b["cy"]
            ):
                ids_x, X, nx2 = _unpack_tile(nx, ix, cx)
                ids_y, Y, ny2 = _unpack_tile(ny, iy, cy)
                D = (X @ Y.T).astype(np.int64)
                ok = (D >= 0) & (td2 * D * D >= tn2 * nx2[:, None] * ny2[None, :])
                ii, jj = np.nonzero(ok)
                if len(ii):
                    a, c = ids_x[ii], ids_y[jj]
                    yield pd.DataFrame(
                        {"id_a": np.minimum(a, c), "id_b": np.maximum(a, c)}
                    )

    return block_pairs.select("nx", "ix", "cx", "ny", "iy", "cy").mapInPandas(
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
    (bucket, sub-tile) blocks (pack_tiles) and each block pair is
    verified as one exact GEMM (tile_self_pairs) — a failing pair
    costs 2d integer ops inside numpy and never exists as a row.

    Admission is the identical integer threshold test, so the output
    is a strict subset of the exact pair graph (zero false positives);
    recall = the bucketing's miss rate, measured against planted
    duplicates (tests/test_ann_scale.py) exactly like the candidate-
    row path's recall gate.

    Per-task memory: two sub-tiles (2·tile_rows·d int64), constant in
    corpus size."""
    # one widening shuffle up front: training and the fused
    # assignment+quantization pass both read it (eager — shared input)
    corpus = _widen(corpus.select(id_col, vec_col)).localCheckpoint(eager=True)
    if centroids is None:
        centroids = train_centroids_sampled(
            corpus, n_buckets, sample, train_iters, vec_col, id_col
        )
    # fused pass: membership + 64-byte qv in one Arrow sweep.  The
    # previous shape (assign ids-only, then rejoin the embedding table
    # by id) sort-merged 512-byte float arrays across the whole corpus
    # — measured 50 s of a 79 s one-shot 1M scan (r7); fused: ~8 s.
    qm = (
        assign_quantized_multiprobe(corpus, centroids, probes, id_col, vec_col)
        # materialize once, EAGERLY: the per-bucket counts and the
        # packing both read qm — a lazy checkpoint shared by two
        # branches of the same job can still compute twice (measured:
        # the composite run cost ~20 s more than the sum of its
        # stages until the shared inputs were pinned eagerly)
        .localCheckpoint(eager=True)
    )
    pairs = tile_self_pairs(pack_tiles(qm, tile_rows), t_num, t_den)
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
