"""Two-lane pytest runner — the r11 answer to the suite's wall-clock
(VERDICT r10 #8: 28 min single-process and growing; pytest-xdist is
not installable in this environment).

Two pytest processes run CONCURRENTLY on disjoint test files, each
with its own JVM pinned to half the cores via SPARK_GRAFT_MASTER
(tests/conftest.py's get_spark honors it).  Nothing is weakened: the
union of the two lanes is exactly `python -m pytest tests/`, and each
test keeps its own tmp_path isolation.  Files that touch shared
cwd state (Derby's derby.log, spark-warehouse/, the menagerie TSV
golden dir) are pinned to lane A so the lanes never collide.

Lane assignment is static, balanced by the r12 census durations
(--durations capture), heaviest-first greedy; new test files default
to lane B (print a warning so the table gets updated).

Usage:
    python tools/run_tests_split.py            # both lanes, live output
    python tools/run_tests_split.py --lane A   # one lane only

Exit code is non-zero if either lane fails.
"""

from __future__ import annotations

import argparse
import glob
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# Files that write shared cwd state — keep in ONE lane (A).
CWD_BOUND = {
    "test_jdbc_sink.py",
    "test_jdbc_snapshot.py",
    "test_menagerie.py",
    "test_sql_surface.py",
    "test_snapshot_replication.py",
}

# Per-file test seconds summed from the r12 two-lane census
# (--durations=0 capture in .pytest_lane_{A,B}.log; only the RATIOS
# matter for balance).  Refresh occasionally via:
#   python tools/run_tests_split.py --durations 0  # then re-sum the logs
DURATIONS = {
    "test_corpus_pipeline.py": 42,  # r13 census (7 tests, composed pipeline)
    "test_importance.py": 75,  # late-r15 estimate (6 DSIR tests)
    "test_queries.py": 232,
    "test_index_compaction.py": 118,
    "test_incremental_countmin.py": 107,
    "test_dedup.py": 100,
    "test_spans_hypothesis.py": 79,
    "test_suppression.py": 70,
    "test_pair_index_sinks.py": 63,
    "test_examples.py": 60,
    "test_storage_contract.py": 60,
    "test_ann_scale.py": 59,
    "test_time_travel.py": 41,
    "test_similarity.py": 40,
    "test_cdc_merge.py": 37,
    "test_index_erasure.py": 34,
    "test_erasure.py": 32,
    "test_incremental_dedup.py": 29,
    "test_jdbc_sink.py": 27,
    "test_incremental_bloom.py": 25,
    "test_incremental_ann.py": 21,
    "test_incremental_semantic.py": 19,
    "test_quality_model.py": 19,
    "test_streaming_windows.py": 17,
    "test_incremental_histogram.py": 16,
    "test_ivfpq.py": 15,
    "test_merge_hypothesis.py": 15,
    "test_incremental_moments.py": 14,
    "test_streaming.py": 14,
    "test_synth_docs.py": 13,
    "test_stream_stream.py": 12,
    "test_sketches.py": 12,
    "test_graph_pagerank.py": 12,
    "test_spans.py": 11,
    "test_bpe.py": 10,
    "test_incremental_tokens.py": 10,
    "test_plans.py": 10,
    "test_stateful_and_skew.py": 9,
    "test_avro.py": 8,
    "test_text.py": 8,
    "test_rollup.py": 7,
    "test_notified_pipeline.py": 7,
    "test_snapshot_replication.py": 6,
    "test_layout.py": 6,
    "test_multimodal.py": 5,
    "test_sessionization_hypothesis.py": 5,
    "test_pq.py": 4,
    "test_debezium_envelope.py": 4,
    "test_jdbc_snapshot.py": 4,
    "test_pca.py": 4,
    "test_menagerie.py": 3,
    "test_sql_surface.py": 3,
    "test_udtf.py": 2,
    "test_stream_enrichment.py": 2,
    "test_asof.py": 2,
    "test_tables.py": 2,
    "test_sampling.py": 1,
    "test_timetravel.py": 1,
    "test_multimodal_pil.py": 1,
    "test_skew.py": 1,
    "test_lint_hof.py": 1,
}


def lanes() -> tuple[list[str], list[str]]:
    files = sorted(
        os.path.basename(p) for p in glob.glob(os.path.join(REPO, "tests", "test_*.py"))
    )
    a: list[str] = [f for f in files if f in CWD_BOUND]
    b: list[str] = []
    wa = sum(DURATIONS.get(f, 0) for f in a)
    wb = 0.0
    rest = [f for f in files if f not in CWD_BOUND]
    for f in sorted(rest, key=lambda f: -DURATIONS.get(f, 25)):
        if f not in DURATIONS:
            print(f"note: {f} not in DURATIONS table; assuming 25s", file=sys.stderr)
        w = DURATIONS.get(f, 25)
        if wa <= wb:
            a.append(f)
            wa += w
        else:
            b.append(f)
            wb += w
    return a, b


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--lane", choices=["A", "B"], default=None)
    ap.add_argument(
        "--cores",
        type=int,
        default=14,
        help="TOTAL cores to spend; split across however many lanes run",
    )
    ap.add_argument(
        "--durations",
        type=int,
        default=None,
        help="pass --durations=N to each lane's pytest (0 = all) so the "
        "DURATIONS table above can be refreshed from the lane logs",
    )
    args = ap.parse_args()
    lane_a, lane_b = lanes()
    jobs = {"A": lane_a, "B": lane_b}
    run = [args.lane] if args.lane else ["A", "B"]
    # split the budget across concurrent lanes (r11 ADVICE: both lanes
    # getting the full default oversubscribed the host 2x and skewed
    # any timing captured during the run)
    per_lane = max(1, args.cores // len(run))
    procs = {}
    t0 = time.time()
    for name in run:
        env = dict(os.environ, SPARK_GRAFT_MASTER=f"local[{per_lane}]")
        cmd = [sys.executable, "-m", "pytest", "-q", *(
            [f"--durations={args.durations}"] if args.durations is not None else []
        ), *(
            os.path.join("tests", f) for f in jobs[name]
        )]
        log = os.path.join(REPO, f".pytest_lane_{name}.log")
        procs[name] = (
            subprocess.Popen(
                cmd, cwd=REPO, env=env,
                stdout=open(log, "w"), stderr=subprocess.STDOUT,
            ),
            log,
        )
        print(f"lane {name}: {len(jobs[name])} files -> {log}")
    rc = 0
    for name, (p, log) in procs.items():
        p.wait()
        tail = open(log).read().strip().splitlines()
        print(f"lane {name} rc={p.returncode}: {tail[-1] if tail else '(no output)'}")
        rc = rc or p.returncode
    print(f"total wall: {time.time() - t0:.0f}s")
    sys.exit(rc)


if __name__ == "__main__":
    main()
