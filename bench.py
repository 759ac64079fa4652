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


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0
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
    for _pass in range(3):
        for name in HEADLINE:
            try:
                t0 = time.perf_counter()
                QUERIES[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
                dt = round(time.perf_counter() - t0, 3)
            except Exception as exc:  # noqa: BLE001 — record, keep benching
                if not isinstance(timings.get(name), float):  # keep a good pass
                    timings[name] = {"err": f"{type(exc).__name__}: {exc}"[:300]}
                continue
            if _pass == 0:
                continue
            prev = timings.get(name, dt)
            timings[name] = min(prev, dt) if isinstance(prev, float) else dt

    # CDC entries: min of two runs, same steady-state rationale as the
    # query loop (a single pass right after 60 query executions eats
    # their GC/compilation debris — r6 observed a 5x outlier on the
    # avro entry that two clean runs bounded at 2.3 s).
    for name, fn in (
        ("cdc_merge_events", lambda: time_cdc_merge(spark, sf_dir)),
        # full ingest (landing -> parse -> bronze -> silver) per format;
        # avro/json ratio = the pure-Python Avro codec's visible cost
        ("cdc_merge_events_json", lambda: time_cdc_ingest(spark, sf_dir, "json")),
        ("cdc_merge_events_avro", lambda: time_cdc_ingest(spark, sf_dir, "avro")),
        # kill-resume under load (asserts convergence; VERDICT r5 #7)
        ("cdc_restart_resume", lambda: time_cdc_restart(spark, sf_dir)),
    ):
        for _pass in range(2):
            try:
                dt = fn()
            except Exception as exc:  # noqa: BLE001
                if not isinstance(timings.get(name), float):
                    timings[name] = {"err": f"{type(exc).__name__}: {exc}"[:300]}
                continue
            prev = timings.get(name, dt)
            timings[name] = min(prev, dt) if isinstance(prev, float) else dt

    ok = {k: v for k, v in timings.items() if isinstance(v, float)}
    total = round(sum(ok.values()), 3)
    # Host-load indicator (round-5 VERDICT #3): the 1/5/15-minute load
    # averages let a reader normalize round-over-round deltas for
    # driver/CI contention instead of attributing host noise to plans.
    print(json.dumps({
        "metric": "headline_suite_wall",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "timed_entries": len(ok),
        "errored_entries": len(timings) - len(ok),
        "loadavg": [round(x, 2) for x in os.getloadavg()],
        "sf": sf,
    }))


if __name__ == "__main__":
    main()
