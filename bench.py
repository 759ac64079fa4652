#!/usr/bin/env python
"""Benchmark harness: runs the headline query suite at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is fully materialized through the noop sink (count() would
let Catalyst prune the projections we mean to measure).
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from cdc_demo_spark.queries import QUERIES  # noqa: E402
from cdc_demo_spark.session import get_spark  # noqa: E402

# Representative headline set: scans+joins+aggs, windows, set ops,
# scalar-heavy projections, dedup, similarity, text, as-of.
HEADLINE = [
    "q_revenue_by_nation",
    "q_shipping_priority",
    "q_returned_items",
    "q_pricing_summary",
    "q_filter_predicates",
    "q_outer_join",
    "q_rollup",
    "q_latest_order_per_customer",
    "q_running_sum",
    "q_asof_join",
    "q_json_extract",
    "q_cosine_topk",
    "q_minhash_near_dups",
    "q_text_quality",
    # LLM-tier cost centers (added round 3 — the suite total grows by
    # their honest cost; round-over-round comparison is per-query):
    "q_allpairs_jaccard",
    "q_dedup_clusters",
    "q_pq_topk",
    # round-4 additions (VERDICT r4 #8): keep their honest cost tracked
    "q_semantic_dedup_int8",
    "q_fuzzy_name_pairs_d2",
    # round-6: partition-pruned day-range rollup (asserts PartitionFilters
    # in its own plan; the derived layout is built once on the warm-up
    # pass, so steady passes time the pruned scan, not the write)
    "q_day_partition_pruning",
    # round-7: passage-level span dedup (fixture grain here; the real
    # measurement is the 200k-doc spans_200k_detect entry)
    "q_duplicated_spans",
    # round-7: the sketch family's timed record (lineitem histogram +
    # exact-quantile twin; the mid-scale sketch point is
    # bloom_200k_decontam)
    "q_histogram_quantiles",
]


def time_cdc_merge(spark, sf_dir: str) -> float:
    """The CDC core under load: events table -> envelope stream (3
    micro-batches, keyed per user so batches genuinely collide on keys)
    -> selective bucket merge. Times the full staging->replica path."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from cdc_demo_spark.sources.tables import load_table
    from cdc_demo_spark.streaming.merge import merge_into_silver

    ev = load_table(spark, sf_dir, "events")
    env = ev.select(
        F.lit("u").alias("op"),
        F.col("ts"),
        F.col("event_id").alias("seq"),
        F.lit("events").alias("table"),
        F.col("user_id").cast("string").alias("key"),
        F.lit(None).cast(
            "struct<user_id:bigint,event_type:string,value:double>"
        ).alias("before"),
        F.struct("user_id", "event_type", "value").alias("after"),
    )
    tmp = tempfile.mkdtemp()
    n = env.count()
    t0 = time.perf_counter()
    for lo, hi in ((0, n // 3), (n // 3, 2 * n // 3), (2 * n // 3, n + 1)):
        merge_into_silver(
            spark, env.filter((F.col("seq") >= lo) & (F.col("seq") < hi)), tmp + "/s", "events"
        )
    dt = round(time.perf_counter() - t0, 3)
    shutil.rmtree(tmp)
    return dt


def time_cdc_merge_skewed(spark, sf_dir: str) -> float:
    """VERDICT r6 #6 — the merge under pathological key skew: ONE key
    owns ~50% of every batch (the pet-name skew the reference's data
    model invites: a handful of popular pet names, SURVEY §1.1).  The
    merge's latest-image collapse reduces the hot key map-side before
    any state moves (partial aggregation / AQE skew handling), so the
    hot key costs its row count once, not a hot shuffle partition —
    this entry is the measured proof next to SCALE.md's argument.

    A per-bucket balance assert gates the timing: after the merge the
    hot key is ONE state row, so state rows spread by key hash and no
    bucket may hold more than ~4× the mean — if a regression ever let
    the raw skew reach the bucket layout, the assert (not a silently
    slower number) is what fails."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from cdc_demo_spark.streaming.merge import merge_into_silver, read_silver_state

    env = _events_envelope(spark, sf_dir)
    # every other event goes to the single hot key
    env = env.withColumn(
        "key",
        F.when(F.col("seq") % 2 == 0, F.lit("hot-pet")).otherwise(F.col("key")),
    )
    tmp = tempfile.mkdtemp()
    n = env.count()
    t0 = time.perf_counter()
    for lo, hi in ((0, n // 3), (n // 3, 2 * n // 3), (2 * n // 3, n + 1)):
        merge_into_silver(
            spark,
            env.filter((F.col("seq") >= lo) & (F.col("seq") < hi)),
            tmp + "/s",
            "events",
        )
    dt = round(time.perf_counter() - t0, 3)
    per_bucket = (
        read_silver_state(spark, tmp + "/s")
        .groupBy("__bucket")
        .count()
        .collect()
    )
    shutil.rmtree(tmp)
    counts = [r["count"] for r in per_bucket]
    assert max(counts) <= 4 * (sum(counts) / len(counts)), (
        f"bucket imbalance under skew: {sorted(counts, reverse=True)[:5]} "
        f"vs mean {sum(counts) / len(counts):.0f}"
    )
    return dt


def _events_envelope(spark, sf_dir: str):
    from pyspark.sql import functions as F

    from cdc_demo_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        F.lit("u").alias("op"),
        F.col("ts"),
        F.col("event_id").alias("seq"),
        F.lit("events").alias("table"),
        F.col("user_id").cast("string").alias("key"),
        F.lit(None).cast(
            "struct<user_id:bigint,event_type:string,value:double>"
        ).alias("before"),
        F.struct("user_id", "event_type", "value").alias("after"),
    )


def time_cdc_ingest(spark, sf_dir: str, fmt: str) -> float:
    """The FULL ingest path (file listing -> parse/decode -> DLQ split
    -> bronze -> silver merge) through CdcPipeline at sf grain, for
    fmt in {json, avro}. The two lines differ ONLY in the parse stage,
    so avro/json is the measured cost of the pure-Python Avro container
    codec vs Spark's JVM JSON reader (VERDICT r3 #6: keep that cost
    visible). Landing-file creation is setup, not timed."""
    import shutil
    import tempfile

    from pyspark.sql.types import StructType

    from cdc_demo_spark.sources.formats import write_avro
    from cdc_demo_spark.streaming.pipeline import CdcPipeline

    env = _events_envelope(spark, sf_dir).repartition(32)
    base = tempfile.mkdtemp()
    payload = StructType.fromDDL("user_id bigint, event_type string, value double")
    pipe = CdcPipeline(spark, base, {"events": payload}, fmt=fmt)
    landing = os.path.join(pipe.landing_dir, "events")
    if fmt == "avro":
        write_avro(env, landing)
    else:  # micros, not the writer's default millis (envelope fidelity)
        env.write.mode("overwrite").option(
            "timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX"
        ).json(landing)
    t0 = time.perf_counter()
    pipe.run_available_now("events")
    dt = round(time.perf_counter() - t0, 3)
    shutil.rmtree(base)
    return dt


def time_cdc_restart(spark, sf_dir: str) -> float:
    """Checkpoint-kill-resume UNDER LOAD (VERDICT r5 #7): the full
    events envelope lands as 256 JSON files (4 micro-batches at the
    64-file trigger cap), a continuous-trigger pipeline is killed after
    its first committed batch — mid-stream, with most of the backlog
    unprocessed — and an available-now run on the SAME checkpoint
    drains the rest.  Timed span = first start to full drain.  The
    function then ASSERTS convergence: the silver replica must hold
    exactly one live row per key, each carrying that key's max (ts,
    seq) winner — i.e. the kill/replay boundary lost nothing and
    duplicated nothing (bronze idempotence + (ts,seq) merge rule).
    The r5 unit suite proves this at toy grain; this entry prices it
    at bench grain."""
    import shutil
    import tempfile
    import time as _t

    from pyspark.sql import functions as F
    from pyspark.sql.types import StructType

    from cdc_demo_spark.streaming.merge import read_silver_state
    from cdc_demo_spark.streaming.pipeline import CdcPipeline

    env = _events_envelope(spark, sf_dir).repartition(256).localCheckpoint()
    base = tempfile.mkdtemp()
    payload = StructType.fromDDL("user_id bigint, event_type string, value double")
    pipe = CdcPipeline(spark, base, {"events": payload})
    landing = os.path.join(pipe.landing_dir, "events")
    # micros in the landing files: Spark's JSON writer defaults to
    # millisecond timestamps, which would shift every envelope ts the
    # merge stores (the reader parses micros fine)
    env.write.mode("overwrite").option(
        "timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX"
    ).json(landing)

    t0 = time.perf_counter()
    q = pipe.start_continuous("events", interval="0 seconds")
    deadline = _t.time() + 120
    while _t.time() < deadline:  # kill after the FIRST committed batch
        p = q.lastProgress
        if p is not None and p["batchId"] >= 1:
            break
        _t.sleep(0.05)
    q.stop()  # mid-stream: later batches unprocessed, in-flight work cut
    pipe.run_available_now("events")  # resume from the same checkpoint
    dt = round(time.perf_counter() - t0, 3)

    # convergence assert (untimed): one live row per key, winner (ts,seq)
    state = read_silver_state(spark, pipe.silver_dir("events"))
    got = state.filter(F.col("__op") != "d").select(
        F.col("__key").alias("key"), F.col("__ts").alias("ts"), F.col("__seq").alias("seq")
    )
    want = env.groupBy("key").agg(
        F.max(F.struct("ts", "seq")).alias("w")
    ).select("key", F.col("w.ts").alias("ts"), F.col("w.seq").alias("seq"))
    n_got, n_want = got.count(), want.count()
    n_match = got.join(want, ["key", "ts", "seq"]).count()
    shutil.rmtree(base)
    if not (n_got == n_want == n_match):
        raise AssertionError(
            f"restart did not converge: {n_got} silver rows, {n_want} keys, "
            f"{n_match} (key,ts,seq) matches"
        )
    return dt


# ---------------------------------------------------------------------------
# 1M-vector ANN probes (VERDICT r6 #1): the driver fixtures pin
# embeddings at 500 rows at every sf, so the ANN/PQ/semantic-dedup
# designs had no measured point above toy size.  These entries run on a
# deterministic synthetic corpus (sources/synth_vectors.py — seeded,
# bit-reproducible, planted near-dup ground truth) that is generated
# once per host and cached; derived state (built semantic index, PQ
# codes) is likewise built once and cached, so the timed sections
# measure the OPERATION — one-shot dedup pair scan + clustering, delta
# admission into a 1M index, ADC top-k over 1M codes — not fixture
# construction.  Corpus size is fixed (not sf-scaled): the point is a
# mid-scale measurement, comparable round over round.

ANN_N = 1_000_000
ANN_BUCKETS = 2048
ANN_T = (4, 5)  # cosine >= 0.8: planted dups ~0.999, random 64-dim ~N(0, 1/8)


def _ann_corpus(spark):
    from cdc_demo_spark.sources.synth_vectors import ensure_synth_corpus

    return spark.read.parquet(ensure_synth_corpus(spark, ANN_N))


def _ensure_built(tag: str, build):
    """Generic build-once cache under tempdir: build(stage_dir) then
    atomic-rename publish (same pattern as the synth corpus)."""
    import shutil
    import tempfile
    import uuid

    path = os.path.join(tempfile.gettempdir(), f"spark_graft_{tag}")
    marker = os.path.join(path, "_BUILT")
    if os.path.exists(marker):
        return path
    stage = f"{path}.build-{uuid.uuid4().hex[:8]}"
    os.makedirs(stage, exist_ok=True)
    build(stage)
    with open(os.path.join(stage, "_BUILT"), "w") as f:
        f.write("ok")
    try:
        os.rename(stage, path)
    except OSError:
        if not os.path.exists(marker):
            raise
        shutil.rmtree(stage, ignore_errors=True)
    return path


def time_ann_semantic_dedup_1m(spark) -> float:
    """One-shot SemDeDup at 1M×64: sampled k-means training, GEMM
    multi-probe assignment, bucketed int8-GEMM pair scan (integer-exact
    admission), star-contraction clustering. Asserts the planted
    ground truth was actually found — a fast-but-wrong run must not
    record a time."""
    from cdc_demo_spark.operators.ann_scale import semantic_dedup_ann_gemm
    from cdc_demo_spark.sources.synth_vectors import planted_pairs

    corpus = _ann_corpus(spark)
    _quiesce_self_load()  # a cold run just generated the 1M corpus
    t0 = time.perf_counter()
    out = semantic_dedup_ann_gemm(
        corpus, t_num=ANN_T[0], t_den=ANN_T[1],
        n_buckets=ANN_BUCKETS, probes=2,
    )
    n_clustered = out.count()
    dt = round(time.perf_counter() - t0, 3)
    n_planted_members = 2 * len(planted_pairs(ANN_N, 100))
    assert n_clustered >= 0.99 * n_planted_members, (
        f"dedup found {n_clustered} clustered vectors; "
        f"expected ~{n_planted_members}"
    )
    return dt


def time_ann_1m_decontam(spark) -> float:
    """Embedding-level eval decontamination at the 1M-pool × 1k-eval
    grain (the q_semantic_decontamination flow at bench scale): eval =
    every 1000th planted-pair head (vec_id % 1000 == 998, 1000 rows,
    frozen driver-side untimed — the per-epoch freeze), pool = the
    other 999k vectors, scored by the GEMM map-side plan
    (semantic_decontaminate_arrow: one (batch×64)@(64×1000) BLAS call
    per Arrow batch, no join/shuffle/window).  Gates: every planted
    twin (..999, cos ≈ 0.999 to its head) is flagged AND argmaxes to
    exactly its own head; random vectors stay unflagged at 0.9
    (64-dim random cosine ~N(0, 1/8)) — contamination count must
    equal the twin count."""
    from pyspark.sql import functions as F

    from cdc_demo_spark.operators.similarity import semantic_decontaminate_arrow

    corpus = _ann_corpus(spark)
    eval_rows = [
        (r["vec_id"], list(r["embedding"]))
        for r in corpus.filter(F.col("vec_id") % 1000 == 998).collect()
    ]
    pool = corpus.filter(F.col("vec_id") % 1000 != 998)
    _quiesce_self_load()
    t0 = time.perf_counter()
    out = semantic_decontaminate_arrow(pool, eval_rows, 0.9)
    agg = out.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("contaminated").cast("long")).alias("n_flagged"),
    ).collect()[0]
    dt = round(time.perf_counter() - t0, 3)
    n_eval = len(eval_rows)
    assert agg["n"] == ANN_N - n_eval
    twins = out.filter(F.col("vec_id") % 1000 == 999).collect()
    assert len(twins) == n_eval
    bad = [
        r for r in twins
        if not r["contaminated"] or r["nearest_eval_id"] != r["vec_id"] - 1
    ]
    assert not bad, f"{len(bad)} planted twins unflagged/mis-argmaxed: {bad[:3]}"
    assert agg["n_flagged"] == len(twins), (agg["n_flagged"], len(twins))
    return dt


def time_kn_200k_ppl(spark) -> float:
    """Kneser-Ney perplexity at the 200k-doc grain (the oracle query
    runs on the 500-row fixture): model fit on the every-50th-doc
    slice (4k docs — the CCNet fit-on-clean shape), all 200k docs
    scored through the bigram-grain joins.  Timed span = fit + score +
    the separation aggregate.  Gates: every doc scored exactly once,
    and the slice the model was fit on scores itself lower (mean ppl)
    than the rest — the separation the filter exists for."""
    from pyspark.sql import functions as F

    from cdc_demo_spark.operators.text import kneser_ney_perplexity

    docs = _doc_corpus(spark)
    t0 = time.perf_counter()
    out = kneser_ney_perplexity(docs, F.col("doc_id") % 50 == 0)
    sep = (
        out.withColumn("is_t", F.col("id") % 50 == 0)
        .groupBy("is_t")
        .agg(F.count(F.lit(1)).alias("n"), F.avg("ppl").alias("m"))
        .collect()
    )
    dt = round(time.perf_counter() - t0, 3)
    by = {bool(r["is_t"]): r for r in sep}
    assert by[True]["n"] + by[False]["n"] == DOC_N
    assert by[True]["m"] < by[False]["m"], (by[True]["m"], by[False]["m"])
    return dt


def _semantic_index_path(spark, n: int = ANN_N, n_buckets: int = ANN_BUCKETS) -> str:
    from cdc_demo_spark.operators.ann_scale import train_centroids_sampled
    from cdc_demo_spark.operators.incremental_semantic import SemanticIndex
    from cdc_demo_spark.sources.synth_vectors import ensure_synth_corpus

    def build(stage: str) -> None:
        corpus = spark.read.parquet(ensure_synth_corpus(spark, n))
        idx = SemanticIndex(
            spark, os.path.join(stage, "idx"),
            t_num=ANN_T[0], t_den=ANN_T[1],
            n_buckets=n_buckets, probes=2, arrow=True,
        )
        cents = train_centroids_sampled(corpus, n_buckets).localCheckpoint()
        idx.build(corpus, centroids=cents)

    return _ensure_built(f"semidx_v5_n{n}_b{n_buckets}", build)


def _time_ann_index_append(spark, n: int, n_buckets: int) -> float:
    """Delta admission into an n-vector incremental semantic index:
    probe 10k new vectors against stored members through the frozen
    centroids, verify integer-exact, commit the batch.  The cached
    built index is copied fresh per run (append mutates state); the
    copy is excluded from the timing."""
    import shutil
    import tempfile
    import uuid

    from cdc_demo_spark.operators.incremental_semantic import SemanticIndex
    from cdc_demo_spark.sources.synth_vectors import synth_embeddings

    built = _semantic_index_path(spark, n, n_buckets)
    work = os.path.join(tempfile.gettempdir(), f"semidx_run_{uuid.uuid4().hex[:8]}")
    shutil.copytree(os.path.join(built, "idx"), work)
    try:
        idx = SemanticIndex(
            spark, work, t_num=ANN_T[0], t_den=ANN_T[1],
            n_buckets=n_buckets, probes=2, arrow=True,
        )
        delta = synth_embeddings(spark, 10_000, start=n)
        # A cold-cache run REBUILDS the n-vector index just above (the
        # 4M build alone is ~100 s of full-load work); the r13 capture
        # recorded these appends at la1 19-22 from exactly that burst
        # (the block-start gate cannot see load born inside the entry).
        # Shed it before the timed section.
        _quiesce_self_load()
        t0 = time.perf_counter()
        pairs = idx.append_batch(delta)
        n_pairs = pairs.count()
        dt = round(time.perf_counter() - t0, 3)
        # the delta's internal planted dups (one per dup_every block)
        # must have been admitted — correctness gates the timing
        assert n_pairs >= 90, f"delta admission found only {n_pairs} pairs"
        return dt
    finally:
        shutil.rmtree(work, ignore_errors=True)


def time_ann_index_append_1m(spark) -> float:
    return _time_ann_index_append(spark, ANN_N, ANN_BUCKETS)


def time_ann_index_append_2m(spark) -> float:
    """The slope probe for the semantic index: the SAME 10k delta
    admitted into a DOUBLED (2M) stored corpus with DOUBLED bucket
    count.  An IVF probe's inherent cost is O(|delta| × bucket
    occupancy); the at-scale contract is that n_buckets grows with the
    corpus so occupancy — and therefore append cost — stays constant.
    This entry measures exactly that contract: 2M vectors / 4096
    buckets holds per-bucket occupancy at the 1M/2048 level, so the
    time should match ann_1m_index_append; a widening gap means some
    stage is scaling with the corpus instead of the delta."""
    return _time_ann_index_append(spark, 2 * ANN_N, 2 * ANN_BUCKETS)


def time_ann_index_append_4m(spark) -> float:
    """Third slope point (r8 verdict stretch): 4M vectors / 8192
    buckets, same 10k delta, same constant occupancy.  Two points can
    hide a slow super-linear term that happens to cancel at one
    doubling; three measured doublings (1M/2M/4M) pin the append as
    flat-in-corpus or expose the curve.  The built index is cached
    (under the current semidx cache tag) so the 4M build cost is
    one-time, not per-round."""
    return _time_ann_index_append(spark, 4 * ANN_N, 4 * ANN_BUCKETS)


_ASSIGN_64K: dict = {}


def _assign_64k_fixture(spark):
    """Deterministic clustered 64k-centroid assignment fixture (256
    latent directions + noise — the IVF-realistic regime where trained
    centroids sit near the data), built once per process.  64k buckets
    is the grain where flat assignment's O(delta × K) GEMM stops being
    ignorable and the two-level coarse quantizer is the documented
    scale path (ann_scale.group_centroids)."""
    if "cents" not in _ASSIGN_64K:
        import numpy as np
        import pandas as pd

        rng = np.random.default_rng(7)
        latent = rng.standard_normal((256, 64))
        C = latent[rng.integers(0, 256, 65536)] + 0.3 * rng.standard_normal(
            (65536, 64)
        )
        X = latent[rng.integers(0, 256, 10000)] + 0.3 * rng.standard_normal(
            (10000, 64)
        )
        _ASSIGN_64K["cents"] = spark.createDataFrame(
            pd.DataFrame(
                {
                    "centroid_id": np.arange(65536),
                    "centroid_vec": [r.astype("float32") for r in C],
                }
            )
        ).localCheckpoint(eager=True)
        _ASSIGN_64K["delta"] = spark.createDataFrame(
            pd.DataFrame(
                {
                    "vec_id": np.arange(10000),
                    "embedding": [r.astype("float32") for r in X],
                }
            )
        ).localCheckpoint(eager=True)
    return _ASSIGN_64K["cents"], _ASSIGN_64K["delta"]


def time_ann_assign_64k_flat(spark) -> float:
    """Flat multi-probe assignment of a 10k delta against 64k frozen
    centroids: the O(delta × K) baseline the grouped entry beats."""
    from cdc_demo_spark.operators.ann_scale import assign_quantized_multiprobe

    cents, delta = _assign_64k_fixture(spark)
    t0 = time.perf_counter()
    out = assign_quantized_multiprobe(delta, cents, 2)
    rows = {(r["centroid_id"], r["id"]) for r in out.select("centroid_id", "id").collect()}
    dt = round(time.perf_counter() - t0, 3)
    assert len(rows) == 20_000
    _ASSIGN_64K["flat_rows"] = rows  # the grouped entry's recall oracle
    return dt


def time_ann_assign_64k_grouped(spark) -> float:
    """Two-level coarse-quantizer assignment at the same grain: score
    256 group directions, explore 8 groups (~256 centroids each) —
    O(G + gp·K/G) per row instead of O(K).  Correctness gates the
    timing: ≥99% of (id, bucket) assignments must match the flat
    baseline on this clustered fixture (approximation recall is the
    price; on uniform vectors it honestly degrades — documented in
    tests/test_ann_scale.py, not hidden here)."""
    from cdc_demo_spark.operators.ann_scale import assign_quantized_multiprobe

    cents, delta = _assign_64k_fixture(spark)
    t0 = time.perf_counter()
    out = assign_quantized_multiprobe(
        delta, cents, 2, group_probes=8, n_groups=256
    )
    rows = {(r["centroid_id"], r["id"]) for r in out.select("centroid_id", "id").collect()}
    dt = round(time.perf_counter() - t0, 3)
    flat = _ASSIGN_64K.get("flat_rows")
    if flat is None:
        flat = {
            (r["centroid_id"], r["id"])
            for r in assign_quantized_multiprobe(delta, cents, 2)
            .select("centroid_id", "id")
            .collect()
        }
        _ASSIGN_64K["flat_rows"] = flat
    recall = len(rows & flat) / len(flat)
    assert recall >= 0.99, f"grouped assignment recall {recall:.4f} < 0.99"
    return dt


def time_ann_pq_topk_1m(spark) -> float:
    """ADC top-k over 1M PQ codes for 16 queries: numpy gather scoring
    + per-query top-k window; codes + codebooks built once and cached.
    Recall is pq's pytest contract; here a sanity floor (each query's
    own vector must rank in its top-k) gates the timing."""
    import numpy as np
    from pyspark.sql.functions import col as F_col

    from cdc_demo_spark.operators import pq as PQ
    from cdc_demo_spark.sources.synth_vectors import synth_embeddings

    def build(stage: str) -> None:
        # widen: the corpus parquet coalesces to ~3 scan partitions,
        # which would serialize the Arrow encode pass
        corpus = _ann_corpus(spark).repartition(
            spark.sparkContext.defaultParallelism
        ).localCheckpoint()
        books = PQ.train_codebooks(corpus, m=16, ksub=64, sample=4096)
        np.save(os.path.join(stage, "books.npy"), books)
        codes = PQ.encode(corpus, books)
        codes.write.mode("overwrite").parquet(os.path.join(stage, "codes"))

    path = _ensure_built(f"pqcodes_v1_n{ANN_N}", build)
    books = np.load(os.path.join(path, "books.npy"))
    codes = spark.read.parquet(os.path.join(path, "codes")).repartition(
        spark.sparkContext.defaultParallelism
    ).localCheckpoint()
    queries = synth_embeddings(spark, 16, start=500_000).select(
        F_col("vec_id").alias("query_id"), F_col("embedding").alias("query_vec")
    )
    t0 = time.perf_counter()
    top = PQ.pq_topk(codes, queries, books, k=10)
    rows = top.collect()
    dt = round(time.perf_counter() - t0, 3)
    hits = {(r["query_id"], r["vec_id"]) for r in rows}
    self_hits = sum((q, q) in hits for q in range(500_000, 500_016))
    assert self_hits >= 14, f"only {self_hits}/16 queries rank themselves top-k"
    return dt


def time_ann_ivfpq_topk_1m(spark) -> float:
    """IVF-PQ (operators/ivfpq.py) at 1M×64 for 16 CORPUS queries:
    the composed index scans only nprobe/n_centroids of the PQ codes
    (here 8/64 = 12.5%), so the timed span should undercut the flat
    ann_1m_pq_topk scan — the pruning × compression multiply this
    layout exists for.  Build (centroids + residual codebooks + codes)
    is cached; the timed span is shortlist ADC over probed buckets +
    exact re-rank of 50 floats per query.  Gate: every query is a
    corpus member whose own bucket is its nearest probe — the rerank
    must return it at rank 1 with cosine 1.0."""
    import numpy as np

    from cdc_demo_spark.operators import ivfpq as IVFPQ
    from pyspark.sql.functions import col as F_col

    def build(stage: str) -> None:
        corpus = _ann_corpus(spark).repartition(
            spark.sparkContext.defaultParallelism
        ).localCheckpoint()
        model = IVFPQ.build_ivfpq(
            corpus, n_centroids=64, nprobe=8, m=16, ksub=64, refine_iters=2
        )
        np.save(os.path.join(stage, "cents.npy"), model.centroids)
        np.save(os.path.join(stage, "books.npy"), model.codebooks)
        # partitioned by bucket: the probe filter becomes a STATIC
        # partition prune — unprobed dirs are never even listed, which
        # is the entire point of the IVF half (same layout as IvfIndex)
        model.codes.write.mode("overwrite").partitionBy("centroid_id").parquet(
            os.path.join(stage, "codes")
        )

    path = _ensure_built(f"ivfpq_v1_n{ANN_N}", build)
    model = IVFPQ.IvfPqModel(
        centroids=np.load(os.path.join(path, "cents.npy")),
        codebooks=np.load(os.path.join(path, "books.npy")),
        codes=spark.read.parquet(os.path.join(path, "codes")),
        nprobe=8,
    )
    corpus = _ann_corpus(spark)
    queries = corpus.filter(F_col("vec_id") < 16).select(
        F_col("vec_id").alias("query_id"), F_col("embedding").alias("query_vec")
    ).localCheckpoint()
    t0 = time.perf_counter()
    top = IVFPQ.ivfpq_topk_rerank(model, corpus, queries, k=10, shortlist=50)
    rows = top.collect()
    dt = round(time.perf_counter() - t0, 3)
    top1 = {r["query_id"]: (r["vec_id"], r["cos_sim"]) for r in rows if r["rk"] == 1}
    assert len(top1) == 16 and all(
        top1[q] == (q, 1.0) for q in top1
    ), f"self-retrieval broke: {top1}"
    return dt


_CLK_TCK = os.sysconf("SC_CLK_TCK")
_NCPU = os.cpu_count() or 1


def _host_busy_ticks() -> int:
    """Total non-idle CPU ticks across all cores (/proc/stat cpu line,
    everything but idle+iowait)."""
    with open("/proc/stat") as f:
        vals = [int(x) for x in f.readline().split()[1:]]
    return sum(vals) - vals[3] - (vals[4] if len(vals) > 4 else 0)


def _tree_cpu_map() -> dict[int, int]:
    """{pid: utime+stime+cutime+cstime} for this process and every live
    descendant — the PySpark JVM and its forked python workers.

    Per-PID (r12, second iteration): the share computation takes
    per-pid deltas over pids alive at the LATER snapshot, so a worker
    pool dying mid-window contributes zero instead of a hugely
    NEGATIVE total-tree delta.  A single summed total — even with
    cutime — misattributed worker-pool death as external load
    (measured: 8349 ticks vanished at the ~80 s idle-timeout, and
    spans_200k_detect recorded ext_cpu = 1.0 on an idle host; pyspark
    worker exit status is discarded, so their ticks never reach a live
    ancestor's cutime).  cutime/cstime still matter for children the
    JVM does reap.  The residual error is only the work a dying
    process did WITHIN the window — idle-timeout victims by
    definition did none."""
    kids: dict[int, list[int]] = {}
    ticks: dict[int, int] = {}
    for d in os.listdir("/proc"):
        if not d.isdigit():
            continue
        try:
            with open(f"/proc/{d}/stat") as f:
                rest = f.read().rsplit(")", 1)[1].split()
        except OSError:
            continue  # raced a process exit
        pid = int(d)
        kids.setdefault(int(rest[1]), []).append(pid)
        ticks[pid] = (
            int(rest[11]) + int(rest[12]) + int(rest[13]) + int(rest[14])
        )
    out: dict[int, int] = {}
    stack = [os.getpid()]
    while stack:
        p = stack.pop()
        out[p] = ticks.get(p, 0)
        stack.extend(kids.get(p, ()))
    return out


def _load_snap() -> tuple[float, int, dict[int, int]]:
    return (time.perf_counter(), _host_busy_ticks(), _tree_cpu_map())


def _external_cpu_share(a: tuple, b: tuple) -> float:
    """Fraction of total host CPU capacity consumed by OTHER processes
    between two snapshots.  This is the per-entry contention signal the
    r9 verdict asked for: unlike loadavg — which the bench's own 32
    threads dominate within minutes of starting — it subtracts our own
    process tree, so a nonzero value really is a neighbor.

    Tree delta = Σ per-pid max(0, ticks_b − ticks_a) over pids in the
    LATER snapshot (new pids count in full; the max(0, ·) guards PID
    reuse) — see _tree_cpu_map for why not a summed total."""
    dt = b[0] - a[0]
    if dt <= 0:
        return 0.0
    tree = sum(
        max(0, t - a[2].get(pid, 0)) for pid, t in b[2].items()
    )
    ext = max(0, (b[1] - a[1]) - tree)
    return min(1.0, ext / (_CLK_TCK * _NCPU * dt))


def _wait_for_quiet_host() -> bool:
    """VERDICT r6 #3: every committed bench so far was captured under
    load (r6: loadavg 11.5 on 32 cpus — ~15% contention noise in the
    round-over-round deltas).  Act on the loadavg field instead of
    just recording it: wait up to SPARK_GRAFT_LOAD_WAIT seconds
    (default 120) for the 1-minute load to drop below
    SPARK_GRAFT_MAX_LOAD (default 4.0), then proceed either way and
    flag the artifact with load_warning so a noisy capture is
    self-describing rather than silently contaminated."""
    max_load = float(os.environ.get("SPARK_GRAFT_MAX_LOAD", "4.0"))
    deadline = time.time() + float(os.environ.get("SPARK_GRAFT_LOAD_WAIT", "120"))
    while os.getloadavg()[0] > max_load:
        if time.time() >= deadline:
            print(
                f"WARNING: benching under load (loadavg {os.getloadavg()[0]:.1f} "
                f"> {max_load}); timings will carry contention noise",
                file=sys.stderr,
            )
            return False
        time.sleep(5)
    return True


def _quiesce_self_load(target_la1: float = 8.0, max_wait: float = 120.0) -> None:
    """Idle until the 1-minute loadavg decays below ``target_la1``
    (bounded): entries late in the suite otherwise inherit la1 ≈ 15-20
    from the suite's OWN earlier bursts, and the r12 drift pin measured
    exactly that self-load inflating quiet-capable entries 1.2-2x (the
    same three entries read 0.92-1.11x of their anchors at la1 ≈ 7 a
    few minutes later).  ext_cpu already proves such runs had no
    external neighbor; this makes the recorded la1 mean what readers
    take it to mean.  Costs idle wall only — no entry's timing includes
    the wait (VERDICT r11 #8)."""
    deadline = time.time() + max_wait
    while os.getloadavg()[0] > target_la1 and time.time() < deadline:
        time.sleep(5)


# Text-dedup mid-scale probes: the documents fixture is 500 rows at
# every sf, so the MinHash/LSH stack had the same unmeasured-above-toy
# gap the vector stack had.  Same recipe: deterministic synthetic
# corpus (sources/synth_docs.py — planted near-dups at shingle-Jaccard
# ≈0.8-0.95 over a 50k-word vocabulary), cached parquet, correctness-
# gated timings.

DOC_N = 200_000


def _doc_corpus(spark):
    from cdc_demo_spark.sources.synth_docs import ensure_synth_docs

    return spark.read.parquet(ensure_synth_docs(spark, DOC_N))


def time_minhash_near_dups_200k(spark) -> float:
    """Full MinHash-LSH near-dup pipeline (signatures → banded buckets
    → exact-Jaccard verification) at 200k docs / ~35M shingles — 400×
    the driver fixture. Gate: planted recall ≥ 0.99 with zero false
    positives (verification is exact Jaccard, so extras would mean the
    generator's background collided — a corpus bug, not noise)."""
    from cdc_demo_spark.operators.dedup import minhash_near_duplicates
    from cdc_demo_spark.sources.synth_docs import planted_doc_pairs

    docs = _doc_corpus(spark)
    t0 = time.perf_counter()
    got = {
        (r["id_a"], r["id_b"])
        for r in minhash_near_duplicates(
            docs, "doc_id", "text", k=3, threshold=0.5
        ).collect()
    }
    dt = round(time.perf_counter() - t0, 3)
    planted = set(planted_doc_pairs(DOC_N))
    recall = len(got & planted) / len(planted)
    assert recall >= 0.99, f"planted recall {recall:.4f}"
    assert not (got - planted), f"{len(got - planted)} non-planted pairs"
    return dt


def _minhash_index_path(spark, n_docs: int = DOC_N) -> str:
    # v2: sharded stored-shingle layout (r8) — the slope the 400k
    # variant measures depends on it
    from cdc_demo_spark.operators.incremental_dedup import MinHashIndex
    from cdc_demo_spark.sources.synth_docs import ensure_synth_docs

    def build(stage: str) -> None:
        idx = MinHashIndex(spark, os.path.join(stage, "idx"))
        idx.append_batch(spark.read.parquet(ensure_synth_docs(spark, n_docs))).count()

    return _ensure_built(f"mhidx_v2_n{n_docs}", build)


def _time_minhash_index_append(spark, n_docs: int) -> float:
    """Delta admission into an n_docs incremental MinHash index: 5k
    new docs probe the stored banded buckets, verified by exact
    Jaccard, committed as a batch. Copy of the cached index excluded
    from the timing (append mutates state)."""
    import shutil
    import tempfile
    import uuid

    from cdc_demo_spark.operators.incremental_dedup import MinHashIndex
    from cdc_demo_spark.sources.synth_docs import synth_documents

    built = _minhash_index_path(spark, n_docs)
    work = os.path.join(tempfile.gettempdir(), f"mhidx_run_{uuid.uuid4().hex[:8]}")
    shutil.copytree(os.path.join(built, "idx"), work)
    try:
        idx = MinHashIndex(spark, work)
        # pinned BEFORE the clock: a real append reads its batch from
        # landed storage — regenerating the synthetic delta (Python
        # mapInPandas) is fixture cost, not append cost, same contract
        # as excluding the state copy above
        delta = synth_documents(spark, 5_000, start=n_docs).localCheckpoint(eager=True)
        t0 = time.perf_counter()
        n_pairs = idx.append_batch(delta).count()
        dt = round(time.perf_counter() - t0, 3)
        # the delta's internal planted dups (~100) must be admitted
        assert n_pairs >= 90, f"delta admission found only {n_pairs} pairs"
        return dt
    finally:
        shutil.rmtree(work, ignore_errors=True)


def time_minhash_index_append_200k(spark) -> float:
    return _time_minhash_index_append(spark, DOC_N)


def time_minhash_index_compact_200k(spark) -> float:
    """The index's maintenance op: fold the state into one checkpoint
    per table under a covered-set marker, re-sharding the stored
    shingles to a corpus-sized modulus (operators/compaction.py).
    This is the op a daily-delta deployment runs to keep append cost
    flat in n_appends — measured at the 200k grain: a 10-delta
    fragmented index appended in ~10 s vs ~7.6 s after compaction
    (ROUND_NOTES r9), so the rewrite pays for itself in ~7 appends.
    The cached index is copied fresh per run (compact mutates state);
    the copy is excluded from the timing.  Gates: exactly one state
    dir per table afterwards."""
    import shutil
    import tempfile
    import uuid

    from cdc_demo_spark.operators.incremental_dedup import MinHashIndex

    built = _minhash_index_path(spark, DOC_N)
    work = os.path.join(tempfile.gettempdir(), f"mhidx_cpt_{uuid.uuid4().hex[:8]}")
    shutil.copytree(os.path.join(built, "idx"), work)
    try:
        idx = MinHashIndex(spark, work)
        t0 = time.perf_counter()
        idx.compact()
        dt = round(time.perf_counter() - t0, 3)
        assert len(idx._state_dirs("shingles")) == 1
        assert len(idx._state_dirs("buckets")) == 1
        return dt
    finally:
        shutil.rmtree(work, ignore_errors=True)


def time_minhash_index_append_400k(spark) -> float:
    """The r7 verdict's slope probe: the SAME 5k-doc delta admitted
    into a DOUBLED stored corpus.  With the r8 sharded shingle layout
    the append's reads are ∝ candidate ids × shard size, so this entry
    should match minhash_200k_index_append — an O(corpus) append
    regression shows up here as a widening gap, not as noise in the
    200k number."""
    return _time_minhash_index_append(spark, 2 * DOC_N)


def time_bloom_200k_decontam(spark) -> float:
    """Bloom decontamination at the 200k-doc grain — the sketch
    family's mid-scale point (the oracle queries run on the 500-row
    fixture): a 2^23-bit k=4 bloom built over the eval slice's distinct
    3-gram shingles (every 50th doc, ~700k distinct — m sized ~1.44·n·
    log2(1/fp) for fp≈1%), probed by a 20k-doc corpus slice (~3.5M
    probe shingles).  Timed span = build + probe + both gate
    aggregates.  Gates: ZERO false negatives (every eval shingle must
    report member — the Bloom contract, not a tolerance) and the
    corpus flagged fraction stays ≤5% (fp budget + the planted
    near-dup overlap; an unsized or broken filter saturates to ~100%
    and fails loudly rather than recording a fast-but-wrong time)."""
    from pyspark.sql import functions as F

    from cdc_demo_spark.operators.sketches import bloom_build, bloom_probe
    from cdc_demo_spark.queries.sketchops import _string_shingles

    m, k = 1 << 23, 4
    docs = _doc_corpus(spark)
    t0 = time.perf_counter()
    eval_sh = (
        _string_shingles(docs.filter(F.col("doc_id") % 50 == 0))
        .select("sh").distinct().localCheckpoint(eager=True)  # shared: build + FN gate
    )
    bloom = bloom_build(eval_sh, "sh", m, k).localCheckpoint(eager=True)
    n_fn = (
        bloom_probe(eval_sh, "sh", bloom, m, k)
        .filter(~F.col("bloom_member")).count()
    )
    corpus_sh = _string_shingles(
        docs.filter((F.col("doc_id") % 50 != 0) & (F.col("doc_id") < 20_000))
    )
    probed = bloom_probe(corpus_sh, "sh", bloom, m, k)
    agg = probed.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("bloom_member").cast("long")).alias("hits"),
    ).collect()[0]
    dt = round(time.perf_counter() - t0, 3)
    assert n_fn == 0, f"{n_fn} false negatives — Bloom contract broken"
    frac = agg["hits"] / agg["n"]
    assert frac <= 0.05, f"flagged fraction {frac:.4f} exceeds the fp budget"
    return dt


def time_dsir_200k_weights(spark, hash_impl: str = "md5") -> float:
    """DSIR importance weighting + selection at the 200k-doc grain
    (the oracle queries run on the 500-row fixture): hashed
    unigram+bigram bags into 4096 buckets, target = the every-50th-doc
    slice (the bloom entry's eval-slice idiom), per-doc log-weights
    and a 10k-doc Gumbel-max selection.  Timed span = the whole chain
    through the top-k collect.  Gates: every doc scored exactly once,
    and the target slice's mean log-weight exceeds the rest's — KL
    non-negativity: the target's own empirical bucket distribution
    must score itself above the pool model, so a sign flip means the
    ratio model is wired backwards, not noise.

    ``hash_impl='xx'`` is the r16 PRODUCTION-hash twin
    (dsir_200k_weights_xx): identical plan, xxhash64 buckets instead
    of the oracle-portable md5 — what a deployment that doesn't need
    DuckDB replay would run; the delta vs this entry prices md5's
    engine-portability tax (~2.3x per gram pass measured in
    isolation)."""
    from pyspark.sql import functions as F

    from cdc_demo_spark.operators.importance import dsir_logweights, dsir_resample

    docs = _doc_corpus(spark)
    target = F.col("doc_id") % 50 == 0
    t0 = time.perf_counter()
    # scored frame computed once and pinned: the separation gate and
    # the selection both read it (the operator's own counts pin covers
    # the model fit; this covers the per-doc weight output)
    lw = dsir_logweights(
        docs, "text", "doc_id", target, n_buckets=4096, hash_impl=hash_impl
    ).localCheckpoint(eager=True)
    sep = (
        lw.withColumn("is_t", F.col("doc_id") % 50 == 0)
        .groupBy("is_t")
        .agg(F.count(F.lit(1)).alias("n"), F.avg("logweight_raw").alias("m"))
        .collect()
    )
    picked = dsir_resample(
        docs, "text", "doc_id", target, k=10_000, n_buckets=4096,
        logweights=lw,
    ).select("doc_id").collect()
    dt = round(time.perf_counter() - t0, 3)
    by = {bool(r["is_t"]): r for r in sep}
    assert by[True]["n"] + by[False]["n"] == DOC_N
    assert by[True]["m"] > by[False]["m"], (by[True]["m"], by[False]["m"])
    assert len(picked) == 10_000 and len({r["doc_id"] for r in picked}) == 10_000
    return dt


def time_dsir_200k_artifact(spark) -> float:
    """The DSIR counts= ARTIFACT flow priced (VERDICT r15 #5): write
    the (doc, bucket, c) hashed n-gram counts ONCE to parquet — the
    multi-target amortization claim of importance.py — then reread and
    score ONE target through ``dsir_logweights(counts=...)``.  The
    timed span is write + reread + one scored target; versus
    dsir_200k_weights (direct two-pass, no artifact) the delta prices
    what the artifact costs up front and what each additional target
    model would cost afterwards (the artifact path's scoring is
    bucket-grain math over the stored table, no corpus re-scan).
    Agreement artifact-vs-direct is pytest-pinned
    (tests/test_importance.py); the gates here are the same structural
    ones as the direct entry: every doc scored exactly once and the
    KL-non-negativity separation."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from cdc_demo_spark.operators.importance import (
        dsir_logweights,
        hashed_ngram_counts,
    )

    docs = _doc_corpus(spark)
    target = F.col("doc_id") % 50 == 0
    out = tempfile.mkdtemp(prefix="bench_dsir_counts_")
    try:
        t0 = time.perf_counter()
        hashed_ngram_counts(docs, "text", "doc_id", n_buckets=4096).write.mode(
            "overwrite"
        ).parquet(out + "/counts")
        counts = spark.read.parquet(out + "/counts")
        lw = dsir_logweights(
            docs, "text", "doc_id", target, n_buckets=4096, counts=counts
        ).localCheckpoint(eager=True)
        sep = (
            lw.withColumn("is_t", F.col("doc_id") % 50 == 0)
            .groupBy("is_t")
            .agg(F.count(F.lit(1)).alias("n"), F.avg("logweight_raw").alias("m"))
            .collect()
        )
        dt = round(time.perf_counter() - t0, 3)
        by = {bool(r["is_t"]): r for r in sep}
        assert by[True]["n"] + by[False]["n"] == DOC_N
        assert by[True]["m"] > by[False]["m"], (by[True]["m"], by[False]["m"])
        return dt
    finally:
        shutil.rmtree(out, ignore_errors=True)


def time_bpe_train_200k(spark) -> float:
    """BPE vocabulary training at the 200k-doc grain (the oracle query
    q_bpe_train runs on the 500-row fixture): 30 merges learned from
    the synthetic corpus.  The design claim this measures is that
    training cost is a function of the WORD-FREQUENCY table (~50k-word
    vocabulary here), not the corpus — the corpus is scanned exactly
    once; each of the 30 iterations is a vocabulary-grain pair-count
    aggregate plus a fold-applied merge.  Gates: all 30 merges learned,
    sequential ranks, every count positive, and the first merge's count
    matches an independently computed max pair count."""
    from pyspark.sql import functions as F

    from cdc_demo_spark.operators.bpe import train_bpe, word_frequencies

    docs = _doc_corpus(spark)
    t0 = time.perf_counter()
    merges = train_bpe(docs, "text", n_merges=30).collect()
    dt = round(time.perf_counter() - t0, 3)
    assert len(merges) == 30, f"learned {len(merges)} merges, wanted 30"
    assert [m["rank"] for m in merges] == list(range(1, 31))
    assert all(m["cnt"] > 0 for m in merges)
    # independent gate on the first iteration: its count is the global
    # max adjacent-pair weight of the char-symbolized vocabulary
    words = word_frequencies(docs, "text").select(
        "freq", F.split("word", "").alias("toks")
    )
    pair_idx = F.sequence(F.lit(1), F.size("toks") - 1)
    max_cnt = (
        words.filter(F.size("toks") >= 2)
        .select(
            "freq",
            F.explode(
                F.transform(
                    pair_idx,
                    lambda i: F.concat_ws(
                        "\x00", F.element_at("toks", i), F.element_at("toks", i + 1)
                    ),
                )
            ).alias("p"),
        )
        .groupBy("p")
        .agg(F.sum("freq").alias("cnt"))
        .agg(F.max("cnt"))
        .collect()[0][0]
    )
    assert merges[0]["cnt"] == max_cnt, (
        f"first merge count {merges[0]['cnt']} != independent max {max_cnt}"
    )
    return dt


def time_bpe_encode_200k(spark) -> float:
    """Corpus tokenization with the trained 30-merge vocabulary at the
    200k-doc grain — the encode half of the BPE story, in the r13
    vocabulary-grain shape (encode each DISTINCT word once, join back,
    positional regroup; impl='auto' routes the 30-merge list to the
    Arrow priority encoder).  Training runs OUTSIDE the timed section
    (bpe_train_200k measures it); the timed section is explode + vocab
    encode + join + regroup + token census.  Gate: the total token
    count equals the pinned constant the per-occurrence fold chain
    produced for this deterministic corpus (the r13 A/B measured the
    inline chain at 363.7 s vs ~9 s for this path, token-for-token
    identical — SCALE.md)."""
    from pyspark.sql import functions as F

    from cdc_demo_spark.operators.bpe import bpe_tokenize, train_bpe

    docs = _doc_corpus(spark)
    merges = [
        (r["lhs"], r["rhs"])
        for r in train_bpe(docs, "text", n_merges=30).collect()
    ]
    assert len(merges) == 30
    t0 = time.perf_counter()
    total = (
        bpe_tokenize(docs, "text", merges, id_col="doc_id")
        .agg(F.sum(F.size("tokens")))
        .collect()[0][0]
    )
    dt = round(time.perf_counter() - t0, 3)
    assert total == 145_518_199, f"token census {total} != pinned 145518199"
    return dt


def time_jdbc_warehouse_sink(spark, sf_dir: str) -> float:
    """Exactly-once JDBC warehouse ingest (streaming/jdbc_sink.py)
    end-to-end against embedded Derby: the sf events envelope in 3
    micro-batches -> per-key latest-image collapse -> staged
    single-transaction upsert.  ROUND_NOTES r7 candidate: the sink had
    Derby test coverage but no visible cost.  Gate: the served table
    equals the latest image per key computed independently in Spark."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from cdc_demo_spark.streaming.jdbc_sink import JdbcUpsertSink

    env = _events_envelope(spark, sf_dir).localCheckpoint(eager=True)
    n = env.count()
    base = tempfile.mkdtemp()
    try:
        # Warm-up (VERDICT r9 #5 / ROUND_NOTES r9 candidate 5): the
        # entry's 4.2-7.4 s run-to-run spread tracked Derby engine
        # boot + class-loading/JIT, paid inside the timed window on
        # whichever pass ran first.  Boot the engine against a
        # throwaway database first so both timed passes measure the
        # upsert path, not JVM warm-up.
        JdbcUpsertSink(
            spark,
            f"jdbc:derby:{base}/warm;create=true",
            "warmup_t",
            driver="org.apache.derby.jdbc.EmbeddedDriver",
        ).process_batch(env.limit(50), 0)
        sink = JdbcUpsertSink(
            spark,
            f"jdbc:derby:{base}/wh;create=true",
            "events_serving",
            driver="org.apache.derby.jdbc.EmbeddedDriver",
        )
        # last entry of the CDC block: shed the 5 preceding entries'
        # decay (r13 recorded this at la1 10.8 and 1.40x its anchor;
        # isolated quiet runs have always converged to ~4-5 s)
        _quiesce_self_load()
        t0 = time.perf_counter()
        for i, (lo, hi) in enumerate(
            ((0, n // 3), (n // 3, 2 * n // 3), (2 * n // 3, n + 1))
        ):
            sink.process_batch(
                env.filter((F.col("seq") >= lo) & (F.col("seq") < hi)), i
            )
        dt = round(time.perf_counter() - t0, 3)
        served = {
            (r["user_id"], r["event_type"], r["value"])
            for r in sink.read_target().collect()
        }
        w_expected = F.max_by(
            F.struct("after.user_id", "after.event_type", "after.value"),
            F.struct("ts", "seq"),
        )
        expected = {
            (r["img"]["user_id"], r["img"]["event_type"], r["img"]["value"])
            for r in env.groupBy("key").agg(w_expected.alias("img")).collect()
        }
        assert served == expected, (
            f"warehouse diverged: {len(served)} served vs {len(expected)} expected"
        )
        return dt
    finally:
        shutil.rmtree(base, ignore_errors=True)


MERGE_KEYS = 1_000_000


def _merge_envelope(spark, lo: int, hi: int, seq0: int, ts0: int):
    """Deterministic CDC envelope rows: keys lo..hi (as strings), seq
    monotone from seq0 — same shape as _events_envelope."""
    from pyspark.sql import functions as F

    return spark.range(lo, hi, numPartitions=32).select(
        F.lit("u").alias("op"),
        F.timestamp_seconds(F.lit(ts0)).alias("ts"),
        (F.col("id") - lo + seq0).alias("seq"),
        F.lit("events").alias("table"),
        F.col("id").cast("string").alias("key"),
        F.lit(None)
        .cast("struct<user_id:bigint,event_type:string,value:double>")
        .alias("before"),
        F.struct(
            F.col("id").alias("user_id"),
            F.lit("synth").alias("event_type"),
            (F.col("id") % 997).cast("double").alias("value"),
        ).alias("after"),
    )


def _silver_1m_path(spark) -> str:
    from cdc_demo_spark.streaming.merge import merge_into_silver

    def build(stage: str) -> None:
        merge_into_silver(
            spark,
            _merge_envelope(spark, 0, MERGE_KEYS, 0, 1_700_000_000),
            os.path.join(stage, "s"),
            "events",
            expected_state_bytes=MERGE_KEYS * 100,
        )

    return _ensure_built(f"silver1m_v1_k{MERGE_KEYS}", build)


def time_cdc_merge_1m_create(spark) -> float:
    """Silver state creation at 1M distinct keys — the bulk-load end
    of the merge's cost curve (every bucket written once).  Gate:
    exactly MERGE_KEYS state rows and hash-balanced buckets."""
    import shutil
    import tempfile

    from cdc_demo_spark.streaming.merge import merge_into_silver, read_silver_state

    tmp = tempfile.mkdtemp()
    try:
        t0 = time.perf_counter()
        merge_into_silver(
            spark,
            _merge_envelope(spark, 0, MERGE_KEYS, 0, 1_700_000_000),
            tmp + "/s",
            "events",
            expected_state_bytes=MERGE_KEYS * 100,
        )
        dt = round(time.perf_counter() - t0, 3)
        per_bucket = (
            read_silver_state(spark, tmp + "/s").groupBy("__bucket").count().collect()
        )
        counts = [r["count"] for r in per_bucket]
        assert sum(counts) == MERGE_KEYS, f"state rows {sum(counts)}"
        assert max(counts) <= 2 * (sum(counts) / len(counts)), "bucket imbalance"
        return dt
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def time_cdc_merge_1m_trickle(spark) -> float:
    """A 10k-update trickle batch into the committed 1M-key table —
    the steady-state CDC cost the bucketed O(touched) design exists
    for.  State is copied out of the build-once cache (merge mutates
    it).  Gate: key count unchanged, updated keys serve new images."""
    import shutil
    import tempfile
    import uuid

    from pyspark.sql import functions as F

    from cdc_demo_spark.streaming.merge import merge_into_silver, read_silver

    built = _silver_1m_path(spark)
    work = os.path.join(tempfile.gettempdir(), f"silver1m_run_{uuid.uuid4().hex[:8]}")
    shutil.copytree(os.path.join(built, "s"), work)
    try:
        # every 100th key: 10k updates spread across the key space
        delta = spark.range(0, MERGE_KEYS // 100, numPartitions=32).select(
            F.lit("u").alias("op"),
            F.timestamp_seconds(F.lit(1_700_000_100)).alias("ts"),
            (F.col("id") + MERGE_KEYS).alias("seq"),
            F.lit("events").alias("table"),
            (F.col("id") * 100).cast("string").alias("key"),
            F.lit(None)
            .cast("struct<user_id:bigint,event_type:string,value:double>")
            .alias("before"),
            F.struct(
                (F.col("id") * 100).alias("user_id"),
                F.lit("updated").alias("event_type"),
                F.lit(-1.0).alias("value"),
            ).alias("after"),
        )
        t0 = time.perf_counter()
        merge_into_silver(spark, delta, work, "events")
        dt = round(time.perf_counter() - t0, 3)
        served = read_silver(spark, work)
        n = served.count()
        assert n == MERGE_KEYS, f"served rows {n}"
        n_upd = served.filter(F.col("event_type") == "updated").count()
        assert n_upd == MERGE_KEYS // 100, f"updated rows {n_upd}"
        return dt
    finally:
        shutil.rmtree(work, ignore_errors=True)


def time_span_dedup_200k(spark) -> float:
    """Passage-level dedup detection (operators/spans.py, hashed scale
    path) at 200k docs / ~35M positional 5-grams.  Gate: every planted
    near-dup doc AND its base carry a duplicated span; essentially no
    unrelated doc does (50k-word vocabulary — a background duplicated
    5-gram would be a generator bug).  plan="auto" since r13 (VERDICT
    r12 #4): the sampled skew probe costs ~5% here (measured,
    SCALE.md) and the bench should time the self-routing plan a
    100 TB caller gets by default."""
    from cdc_demo_spark.operators.spans import duplicated_spans
    from cdc_demo_spark.sources.synth_docs import planted_doc_pairs

    docs = _doc_corpus(spark)
    t0 = time.perf_counter()
    spanned = {
        r["id"]
        for r in duplicated_spans(docs, "doc_id", "text", n=5, hashed=True, plan="auto")
        .select("id")
        .distinct()
        .collect()
    }
    dt = round(time.perf_counter() - t0, 3)
    planted = planted_doc_pairs(DOC_N)
    expected = {a for a, _ in planted} | {b for _, b in planted}
    missing = expected - spanned
    assert not missing, f"{len(missing)} planted docs without spans"
    extras = len(spanned - expected)
    assert extras <= DOC_N // 1000, f"{extras} unexpected spanned docs"
    return dt


def time_corpus_e2e_200k_greedy(spark) -> float:
    """End-to-end corpus construction (VERDICT r12 #1): ONE wall number
    for the composed chain quality filter -> exact dedup -> MinHash
    near-dup dedup -> span removal -> leakage-safe split -> chunk+pack
    -> shards at 200k docs, with the per-stage doc/token ledger printed
    as a CORPUS_LEDGER diagnostics line.  Gate: the full cross-stage
    invariant set (split safety, token conservation, block provenance)
    plus funnel sanity — every stage must have actually cut something
    it was supposed to cut.

    LINEAGE (r16 rename, VERDICT r15 #4): this is the entry recorded
    as `corpus_e2e_200k` in BENCH_r12..r15 — greedy packing, kept as
    the parallel lineage entry now that the composite default flipped
    to NFD packing (`corpus_e2e_200k` below continues the r14/r15
    `corpus_e2e_200k_nfd` lineage).

    The rule band is fitted to the synthetic vocabulary (the Gopher
    thresholds are corpus-specific by design): keeps ~91% at 200k, so
    the gate is exercised rather than a no-op."""
    from cdc_demo_spark.operators.corpus_pipeline import (
        assert_corpus_invariants,
        build_corpus,
    )
    from cdc_demo_spark.sources.synth_docs import planted_doc_pairs

    docs = _doc_corpus(spark)
    rules = {
        "min_tokens": 60,
        "mean_token_len": (5.70, 5.85),
        "min_distinct_ratio": 0.9,
    }
    t0 = time.perf_counter()
    res = build_corpus(
        docs, rules=rules, minhash_threshold=0.5, span_hashed=True
    )
    dt = round(time.perf_counter() - t0, 3)
    led = res["ledger"]
    _GREEDY_PACK_LEDGER["pack"] = led["pack"]  # the nfd twin compares to this
    print("CORPUS_LEDGER " + json.dumps(led, separators=(",", ":")))
    # verification (untimed — it's the checker, not the pipeline)
    assert_corpus_invariants(res)
    assert led["quality"]["docs"] < led["input"]["docs"]  # gate cut
    # the planted near-dup population must collapse: every planted pair
    # whose BOTH ends survived the quality gate loses one end to dedup
    assert led["neardup_dedup"]["docs"] < led["exact_dedup"]["docs"]
    n_planted = len(planted_doc_pairs(DOC_N))
    cut = led["exact_dedup"]["docs"] - led["neardup_dedup"]["docs"]
    assert cut >= int(0.8 * n_planted * 0.9 * 0.9), (
        f"near-dup stage cut only {cut} of ~{n_planted} planted dups"
    )
    assert led["pack"]["blocks"] > 0 and len(led["split"]) == 3
    return dt


def time_corpus_e2e_200k_tokens(spark) -> float:
    """The corpus composite ENDING AT MODEL-READY TOKEN IDS (r13
    VERDICT #1): the corpus_e2e_200k chain plus BPE training on the
    surviving corpus (30 merges — the bpe_train_200k grain) and the
    vocabulary-grain chunk encode (operators/bpe.encode_corpus_ids),
    as ONE wall number.  Gate: the full invariant set INCLUDING the
    token-stage censuses (encoded slot total == packed token total,
    encoded chunk count == the blocks' own chunk census), plus ledger
    funnel sanity.  The delta vs corpus_e2e_200k isolates what the
    token stage costs inside the composed plan; bpe_train_200k /
    bpe_encode_200k price the same work standalone on the UNFILTERED
    corpus (larger: pre-dedup)."""
    from cdc_demo_spark.operators.corpus_pipeline import (
        assert_corpus_invariants,
        build_corpus,
    )

    docs = _doc_corpus(spark)
    rules = {
        "min_tokens": 60,
        "mean_token_len": (5.70, 5.85),
        "min_distinct_ratio": 0.9,
    }
    t0 = time.perf_counter()
    res = build_corpus(
        docs, rules=rules, minhash_threshold=0.5, span_hashed=True,
        bpe_merges=30,
    )
    dt = round(time.perf_counter() - t0, 3)
    led = res["ledger"]
    print("CORPUS_LEDGER_TOKENS " + json.dumps(led, separators=(",", ":")))
    assert_corpus_invariants(res)  # untimed: the checker, not the pipeline
    tl = led["tokens"]
    assert tl["slots"] == led["pack"]["tokens"]
    assert tl["n_merges"] == 30
    assert 0 < tl["words"] <= tl["bpe_tokens"] <= tl["slots"] * 64  # sanity bounds
    return dt


_GREEDY_PACK_LEDGER: dict = {}  # stashed by the greedy run for the nfd default
_NFD_PACK_LEDGER: dict = {}  # stashed by the nfd run for the summary line


def time_corpus_e2e_200k(spark) -> float:
    """The corpus composite with pack_strategy='nfd' — THE DEFAULT as
    of r16 (VERDICT r15 #4: the efficiency win is oracle-proven via
    q_packed_segments_nfd and ledger-visible — r14/r15 measured
    0.8906 -> 0.9872 fill, ~10% fewer training blocks for identical
    tokens — so the composite of record now prices the packing a real
    deployment would run).  LINEAGE: continues the r14/r15
    `corpus_e2e_200k_nfd` entry (63.8/64.9/72.3 band); the greedy
    chain this entry recorded through r15 lives on unchanged as
    `corpus_e2e_200k_greedy` above.  The ledger line carries
    pack.efficiency/pack.blocks, which also land in the summary JSON
    as `corpus_pack`.
    Gate: full invariants, token conservation vs the greedy run of the
    same suite pass, and the fixture-shaped efficiency win (this
    corpus is exactly the many-full-chunks+short-tails shape NFD is
    for; packing.py documents the counter-example shape)."""
    from cdc_demo_spark.operators.corpus_pipeline import (
        assert_corpus_invariants,
        build_corpus,
    )

    docs = _doc_corpus(spark)
    rules = {
        "min_tokens": 60,
        "mean_token_len": (5.70, 5.85),
        "min_distinct_ratio": 0.9,
    }
    t0 = time.perf_counter()
    res = build_corpus(
        docs, rules=rules, minhash_threshold=0.5, span_hashed=True,
        pack_strategy="nfd",
    )
    dt = round(time.perf_counter() - t0, 3)
    led = res["ledger"]
    _NFD_PACK_LEDGER["pack"] = led["pack"]  # summary JSON `corpus_pack`
    print("CORPUS_LEDGER_NFD " + json.dumps(led, separators=(",", ":")))
    assert_corpus_invariants(res)  # untimed: the checker, not the pipeline
    g = _GREEDY_PACK_LEDGER.get("pack")
    if g:  # absent only under tools/drift_pin.py's isolated re-measure
        assert led["pack"]["tokens"] == g["tokens"]
        assert led["pack"]["efficiency"] >= g["efficiency"], (g, led["pack"])
        assert led["pack"]["blocks"] <= g["blocks"]
    return dt


def time_corpus_e2e_200k_tokens_write(spark) -> float:
    """The corpus composite ENDING AT BYTES ON DISK (VERDICT r14 #4):
    corpus_e2e_200k_tokens' chain plus write_token_shards — the full
    raw-docs -> trainer-mmappable shard files wall number, priced as
    its own entry so the tokens entry's drift lineage stays clean.
    The delta vs corpus_e2e_200k_tokens isolates the shard-writer hop
    (one hash shuffle on (split, shard) + the manifest aggregate).
    Gate: invariants plus the writer's conservation — per-shard
    manifest censuses sum EXACTLY to the ledger's token stage."""
    import shutil
    import tempfile

    from cdc_demo_spark.operators.corpus_pipeline import (
        assert_corpus_invariants,
        build_corpus,
        write_token_shards,
    )

    docs = _doc_corpus(spark)
    rules = {
        "min_tokens": 60,
        "mean_token_len": (5.70, 5.85),
        "min_distinct_ratio": 0.9,
    }
    out = tempfile.mkdtemp(prefix="bench_token_shards_")
    try:
        t0 = time.perf_counter()
        res = build_corpus(
            docs, rules=rules, minhash_threshold=0.5, span_hashed=True,
            bpe_merges=30,
        )
        manifest = write_token_shards(res["tokens"], out + "/shards")
        dt = round(time.perf_counter() - t0, 3)
        led = res["ledger"]
        print("CORPUS_LEDGER_TOKENS_WRITE "
              + json.dumps(led, separators=(",", ":")))
        assert_corpus_invariants(res)  # untimed
        shards = manifest["shards"].values()
        assert sum(s["bpe_tokens"] for s in shards) == led["tokens"]["bpe_tokens"]
        assert sum(s["words"] for s in shards) == led["tokens"]["words"]
        assert sum(s["chunks"] for s in shards) == led["tokens"]["chunks"]
        return dt
    finally:
        shutil.rmtree(out, ignore_errors=True)


def _trainer_shards_path(spark) -> str:
    """Build-once cache of the 200k corpus as trainer artifacts: token
    shards + block index under one dir (the corpus_e2e_200k_tokens
    chain with emit_segments, then write_token_shards +
    write_block_index)."""
    from cdc_demo_spark.operators.corpus_pipeline import (
        build_corpus,
        write_block_index,
        write_token_shards,
    )

    def build(stage: str) -> None:
        docs = _doc_corpus(spark)
        rules = {
            "min_tokens": 60,
            "mean_token_len": (5.70, 5.85),
            "min_distinct_ratio": 0.9,
        }
        res = build_corpus(
            docs, rules=rules, minhash_threshold=0.5, span_hashed=True,
            bpe_merges=30, emit_segments=True,
        )
        out = os.path.join(stage, "shards")
        write_token_shards(res["tokens"], out)
        write_block_index(res["blocks"], out)

    return os.path.join(_ensure_built("trainer_shards_v1_200k", build), "shards")


def time_trainer_assemble_200k(spark) -> float:
    """The trainer's READ side priced (closes the artifact loop the
    r15/r16 write entries opened): one worker assembles its OWN shard
    — block index + token rows, both partition-pruned to the same
    (split, shard) dir — into input_ids + seg_id_lens batches
    (operators/corpus_pipeline.assemble_training_blocks), for every
    train shard in sequence (16 workers' worth of work, run serially
    so the number is per-epoch assembly cost at suite grain).  The
    shard fixture builds once and caches (untimed).  Gates: per shard,
    assembled block count == the block index census and the id total
    == sum of segment id lengths (exact cover at id grain)."""
    import json as _json

    from pyspark.sql import functions as F

    from cdc_demo_spark.operators.corpus_pipeline import assemble_training_blocks

    path = _trainer_shards_path(spark)
    with open(os.path.join(path, "_manifest.json")) as f:
        manifest = _json.load(f)
    blocks_census = {
        k: v["blocks"] for k, v in manifest["blocks"].items()
        if k.startswith("train/")
    }
    _quiesce_self_load()
    t0 = time.perf_counter()
    total_blocks, total_ids = 0, 0
    for key in sorted(blocks_census):
        shard = int(key.split("/")[1])
        agg = (
            assemble_training_blocks(spark, path, split="train", shards=[shard])
            .agg(
                F.count(F.lit(1)).alias("b"),
                F.coalesce(F.sum("n_ids"), F.lit(0)).alias("ids"),
                F.coalesce(
                    F.sum(F.aggregate("seg_id_lens", F.lit(0).cast("long"),
                                      lambda a, x: a + x)),
                    F.lit(0),
                ).alias("seg_ids"),
            )
            .collect()[0]
        )
        assert agg["b"] == blocks_census[key], (key, agg["b"], blocks_census[key])
        assert agg["ids"] == agg["seg_ids"], key  # exact cover at id grain
        total_blocks += agg["b"]
        total_ids += int(agg["ids"])
    dt = round(time.perf_counter() - t0, 3)
    assert total_blocks == sum(blocks_census.values()) and total_ids > 0
    return dt


def suite_blocks(spark, sf_dir: str) -> list[tuple[str, int, list[tuple[str, object]]]]:
    """Every non-headline bench entry as (block, passes, entries),
    grouped into the quiesce-gated blocks main() runs them in.
    Module-level so tools/drift_pin.py can resolve ANY entry by name
    for an isolated quiet re-measure (VERDICT r12 #8) instead of
    keeping its own copy of three of them.  Thunks close over
    `spark`/`sf_dir`; each returns seconds.  passes=2 records the min
    (steady-state damping); the corpus composite runs ONE pass — its
    constituent plan shapes (LSH, spans, components, pack) are already
    codegen-warmed by the blocks before it, and a second 60s pass
    would buy noise damping at too high a suite-wall price."""
    return [
        # CDC entries: min of two runs, same steady-state rationale as
        # the query loop (a single pass right after 60 query executions
        # eats their GC/compilation debris — r6 observed a 5x outlier on
        # the avro entry that two clean runs bounded at 2.3 s).
        ("cdc", 2, [
            ("cdc_merge_events", lambda: time_cdc_merge(spark, sf_dir)),
            # full ingest (landing -> parse -> bronze -> silver) per
            # format; avro/json ratio = the pure-Python Avro codec's
            # visible cost
            ("cdc_merge_events_json", lambda: time_cdc_ingest(spark, sf_dir, "json")),
            ("cdc_merge_events_avro", lambda: time_cdc_ingest(spark, sf_dir, "avro")),
            # kill-resume under load (asserts convergence; VERDICT r5 #7)
            ("cdc_restart_resume", lambda: time_cdc_restart(spark, sf_dir)),
            # one key owns half of every batch; balance assert inside
            ("cdc_merge_events_skewed", lambda: time_cdc_merge_skewed(spark, sf_dir)),
            # exactly-once warehouse upsert into embedded Derby
            ("cdc_jdbc_warehouse_sink", lambda: time_jdbc_warehouse_sink(spark, sf_dir)),
        ]),
        # Mid-scale probes (1M vectors / 200k docs): min of two passes.
        # These were single-pass until r7's full-suite run showed the
        # first pass paying 2-4x in whole-stage-codegen/JIT for their
        # plan shapes (minhash_200k_near_dups: 66 s first, 15.7 s steady
        # measured in isolation) — the same resident-engine rationale as
        # the query loop's steady passes.  Heavy fixtures are cached;
        # every entry gates its timing on a correctness assert.
        ("ann_mid", 2, [
            ("ann_1m_semantic_dedup", lambda: time_ann_semantic_dedup_1m(spark)),
            ("ann_1m_index_append", lambda: time_ann_index_append_1m(spark)),
            ("ann_2m_index_append", lambda: time_ann_index_append_2m(spark)),
            ("ann_4m_index_append", lambda: time_ann_index_append_4m(spark)),
            ("ann_1m_pq_topk", lambda: time_ann_pq_topk_1m(spark)),
            ("ann_1m_ivfpq_topk", lambda: time_ann_ivfpq_topk_1m(spark)),
            ("ann_1m_decontam", lambda: time_ann_1m_decontam(spark)),
        ]),
        # the two-round watch-listed entries (VERDICT r11 #8: ann_assign
        # read 1.37-1.9x "always under la1 > 20" — which was the 1M
        # block just above; r12's isolated min-of-3 put both at 0.6-0.9x
        # of their anchors) get their own quiet window
        ("ann_assign", 2, [
            ("ann_assign_64k_flat", lambda: time_ann_assign_64k_flat(spark)),
            ("ann_assign_64k_grouped", lambda: time_ann_assign_64k_grouped(spark)),
        ]),
        # VERDICT r12 #3: the tail entries inherited la1 ≈ 15-19 from
        # the suite's own earlier bursts (the r12 sidecar recorded
        # spans_200k_detect at la1 18.6, bloom at 19.2, the 1M-CDC pair
        # at 15-17 — the exact signature the drift pin proved inflates
        # quiet-capable entries 1.2-2x).  Gate each tail sub-block the
        # same way the CDC and mid-ANN blocks were gated in r12.
        ("minhash", 2, [
            ("minhash_200k_near_dups", lambda: time_minhash_near_dups_200k(spark)),
            ("minhash_200k_index_append", lambda: time_minhash_index_append_200k(spark)),
            ("minhash_200k_index_compact", lambda: time_minhash_index_compact_200k(spark)),
            ("minhash_400k_index_append", lambda: time_minhash_index_append_400k(spark)),
        ]),
        ("text", 2, [
            ("bpe_train_200k", lambda: time_bpe_train_200k(spark)),
            ("bpe_encode_200k", lambda: time_bpe_encode_200k(spark)),
            ("spans_200k_detect", lambda: time_span_dedup_200k(spark)),
            ("bloom_200k_decontam", lambda: time_bloom_200k_decontam(spark)),
            ("dsir_200k_weights", lambda: time_dsir_200k_weights(spark)),
            ("dsir_200k_weights_xx",
             lambda: time_dsir_200k_weights(spark, hash_impl="xx")),
            ("kn_200k_ppl", lambda: time_kn_200k_ppl(spark)),
        ]),
        # the DSIR artifact flow: single pass — its dominant cost is
        # the doc×bucket parquet write, which steady-state passes
        # would just repeat without codegen benefit
        ("dsir_artifact", 1, [
            ("dsir_200k_artifact", lambda: time_dsir_200k_artifact(spark)),
        ]),
        ("cdc_1m", 2, [
            ("cdc_merge_1m_create", lambda: time_cdc_merge_1m_create(spark)),
            ("cdc_merge_1m_trickle", lambda: time_cdc_merge_1m_trickle(spark)),
        ]),
        # the composed corpus-construction pipeline (VERDICT r12 #1),
        # plus its model-ready-token-ids extension (VERDICT r13 #1);
        # single pass each — constituent plan shapes are codegen-warm
        # from the earlier blocks and a second ~60 s pass buys noise
        # damping at too high a suite-wall price
        # r16 composite flip (VERDICT r15 #4): `corpus_e2e_200k` is now
        # the NFD-packed composite (continuing corpus_e2e_200k_nfd's
        # lineage); `corpus_e2e_200k_greedy` continues the pre-r16
        # corpus_e2e_200k greedy lineage and runs FIRST so the nfd run
        # can assert token conservation + efficiency against its
        # ledger.  tokens/tokens_write stay greedy-packed this round —
        # their first drift comparisons just landed (r15) and flipping
        # their strategy now would contaminate exactly the lineage the
        # r15 verdict asked to keep clean; they follow once the nfd
        # composite has two suite points of its own.
        ("corpus_e2e", 1, [
            ("corpus_e2e_200k_greedy",
             lambda: time_corpus_e2e_200k_greedy(spark)),
            ("corpus_e2e_200k", lambda: time_corpus_e2e_200k(spark)),
            ("corpus_e2e_200k_tokens", lambda: time_corpus_e2e_200k_tokens(spark)),
            ("corpus_e2e_200k_tokens_write",
             lambda: time_corpus_e2e_200k_tokens_write(spark)),
            # the READ side: per-worker shard assembly over a cached
            # shard fixture (fixture build untimed)
            ("trainer_assemble_200k",
             lambda: time_trainer_assemble_200k(spark)),
        ]),
    ]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0
    quiet = _wait_for_quiet_host()
    # Captured BEFORE the run: the end-of-run loadavg is dominated by
    # the bench's own 32 threads (r7 observed [27.8, ...] on a host
    # that was at 1.8 when the run began), so only the start value can
    # answer "was the host quiet", which is what the r6 verdict used
    # the field for.
    load_start = [round(x, 2) for x in os.getloadavg()]
    spark = get_spark("cdc-demo-spark-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # Warmup: JVM + codegen on a trivial action, then file-index/footer
    # reads for every table (a resident engine would hold these cached;
    # per-query timings should measure query work, not first-touch I/O).
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    from cdc_demo_spark.sources.tables import load_all

    for df in load_all(spark, sf_dir).values():
        df.count()

    # Three passes, report per-query MIN of passes 2-3 (steady state):
    # pass 1 pays one-time whole-stage-codegen compilation (the
    # 64-permutation MinHash agg alone compiles for ~5s) — a resident
    # engine pays that once per plan shape, not per query. Min-of-2
    # steady passes damps this host's ±25% run-to-run noise so the
    # recorded number tracks the plan, not the neighbor.
    #
    # Every entry is individually fenced: one broken benchmark records
    # {"err": ...} for itself and NOTHING else (r4 lost all 18 timings
    # to a single NotImplementedError raised after they were measured —
    # the JSON line must survive any partial failure).
    # Transient failures retry: an entry that errored on an earlier
    # pass is attempted again on every later pass, and a successful
    # timing REPLACES the err record — the err survives only if every
    # pass failed (round-5 ADVICE: a warm-up hiccup must not cost the
    # timing a later pass would have produced).
    timings: dict[str, object] = {}
    # Per-entry load trail (VERDICT r9 #5): for the attempt whose
    # timing is the one recorded (the min), keep the 1/5-min loadavg at
    # its start plus the measured external-CPU share DURING it, and
    # flag the entry "loaded" past the gate — so one contended run is
    # self-describing per entry instead of polluting the artifact of
    # record silently.
    entry_load: dict[str, dict] = {}
    ext_gate = float(os.environ.get("SPARK_GRAFT_ENTRY_EXT_GATE", "0.10"))

    def attempt(name: str, thunk, record: bool = True) -> None:
        la = os.getloadavg()
        snap0 = _load_snap()
        try:
            dt = thunk()
        except Exception as exc:  # noqa: BLE001 — record, keep benching
            if not isinstance(timings.get(name), float):  # keep a good pass
                timings[name] = {"err": f"{type(exc).__name__}: {exc}"[:300]}
            return
        if not record:  # warm-up pass: pays codegen, never recorded
            return
        prev = timings.get(name)
        if not isinstance(prev, float) or dt < prev:
            ext = _external_cpu_share(snap0, _load_snap())
            timings[name] = dt
            entry_load[name] = {
                "la1": round(la[0], 2),
                "la5": round(la[1], 2),
                "ext_cpu": round(ext, 3),
                "loaded": ext > ext_gate,
            }

    def timed_query(name: str):
        def thunk() -> float:
            t0 = time.perf_counter()
            QUERIES[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            return round(time.perf_counter() - t0, 3)

        return thunk

    for _pass in range(3):
        for name in HEADLINE:
            attempt(name, timed_query(name), record=_pass > 0)

    # Non-headline entries run in quiesce-gated blocks (see
    # suite_blocks' per-block rationale comments): each block sheds the
    # previous block's la1 before timing, so the sidecar's recorded
    # la1 means host+neighbor load, not the suite's own decay.
    for _block, passes, entries in suite_blocks(spark, sf_dir):
        _quiesce_self_load()
        for name, fn in entries:
            for _pass in range(passes):
                attempt(name, fn)

    ok = {k: v for k, v in timings.items() if isinstance(v, float)}
    total = round(sum(ok.values()), 3)
    # Two-tier output (VERDICT r10 #1): the driver keeps only the LAST
    # 2000 chars of stdout, and r10's single JSON line — grown by the
    # per-entry load map the r9 verdict asked for — pushed the timings
    # outside that tail, so BENCH_r10.json recorded no numbers at all.
    # Diagnostics (per-entry loadavg / external-CPU trail) now go to a
    # sidecar file plus an EARLIER stdout line; the FINAL stdout line
    # is the compact summary alone, size-guarded well under the tail.
    diagnostics = {
        "entry_load": entry_load,
        "loaded_entries": sorted(
            n for n, v in entry_load.items() if v["loaded"]
        ),
        "ext_cpu_gate": ext_gate,
        "loadavg_end": [round(x, 2) for x in os.getloadavg()],
    }
    sidecar = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "bench_load.json")
    try:
        with open(sidecar, "w") as f:
            json.dump(diagnostics, f, indent=1)
    except OSError:
        pass  # diagnostics are best-effort; the summary line must print
    print("BENCH_DIAGNOSTICS " + json.dumps(diagnostics,
                                            separators=(",", ":")))
    summary = {
        "metric": "headline_suite_wall",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "timed_entries": len(ok),
        "errored_entries": len(timings) - len(ok),
        "loadavg": load_start,
        "load_warning": not quiet,
        "loaded_entries": diagnostics["loaded_entries"],
        "sf": sf,
    }
    if _NFD_PACK_LEDGER.get("pack"):  # VERDICT r15 #4: the flip's
        p = _NFD_PACK_LEDGER["pack"]  # deliverable, in the record
        summary["corpus_pack"] = {
            "strategy": "nfd",
            "efficiency": p["efficiency"],
            "blocks": p["blocks"],
        }
    line = json.dumps(summary, separators=(",", ":"))
    if len(line) > 1900:  # belt-and-braces: never outgrow the tail again
        for key in ("loaded_entries", "load_warning", "loadavg"):
            summary.pop(key, None)
            line = json.dumps(summary, separators=(",", ":"))
            if len(line) <= 1900:
                break
    if len(line) > 1900:  # many errored entries: keep names, cut messages
        summary["queries"] = {
            k: (v if isinstance(v, float)
                else {"err": str(v.get("err", ""))[:40]})
            for k, v in timings.items()
        }
        line = json.dumps(summary, separators=(",", ":"))
    print(line)


if __name__ == "__main__":
    main()
