"""Interleaved quiet min-of-N A/B for drifting bench entries — the
"semantic-dedup method" (r8) as a reusable tool, generalized per
VERDICT r12 #8: anchors are now PARSED from the committed BENCH_r*.json
history (no hand-maintained table to drift from its own comment — the
r12 ADVICE #3 failure mode), and ANY suite entry can be pinned by name
via bench.suite_blocks() / the headline query list.

Method: wait for a quiet host, one warm-up pass (codegen), then N
recorded passes with the entries INTERLEAVED (any transient host noise
lands on all entries, not one), report per-entry min + the la1/ext-CPU
trail of the winning pass, and the ratio vs the anchor.  A min within
the host's noise band (~10%) of the anchor = the suite-context numbers
were load, not code; a min still 1.2x+ = a real regression to chase.

Anchor = the MIN across every committed BENCH_r*.json record of the
entry (the quietest capture the history contains — the fairest "code
was once this fast" target); the latest round's value is printed next
to it so a reader sees both "best ever" and "most recent" without
opening the history.

Usage:
    python tools/drift_pin.py [passes] entry [entry ...]
    python tools/drift_pin.py --list            # entries + anchors
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import bench  # noqa: E402
from cdc_demo_spark.session import get_spark  # noqa: E402


def bench_history() -> dict[str, dict[int, float]]:
    """entry -> {round -> seconds} from every committed BENCH_r*.json
    (both the raw driver capture shape with a 'parsed' key and the
    bare summary shape are accepted)."""
    hist: dict[str, dict[int, float]] = {}
    for path in sorted(glob.glob(os.path.join(REPO, "BENCH_r*.json"))):
        m = re.search(r"r(\d+)", os.path.basename(path))
        if not m:
            continue
        rnd = int(m.group(1))
        try:
            with open(path) as f:
                doc = json.load(f)
        except (OSError, ValueError):
            continue
        queries = (doc.get("parsed") or doc).get("queries", {})
        for name, val in queries.items():
            if isinstance(val, (int, float)):
                hist.setdefault(name, {})[rnd] = float(val)
    return hist


def anchors_from_history(hist: dict[str, dict[int, float]]) -> dict[str, tuple[float, int, float, int]]:
    """entry -> (anchor_min, round_of_min, latest_value, latest_round)."""
    out = {}
    for name, by_round in hist.items():
        rnd_min = min(by_round, key=by_round.get)
        rnd_new = max(by_round)
        out[name] = (by_round[rnd_min], rnd_min, by_round[rnd_new], rnd_new)
    return out


def resolve_entries(spark, sf_dir: str, names: list[str]) -> dict[str, object]:
    """name -> zero-arg timing thunk, from bench.suite_blocks plus the
    headline query list (timed the same way main() times them)."""
    table: dict[str, object] = {}
    for _block, _passes, entries in bench.suite_blocks(spark, sf_dir):
        table.update(entries)
    from cdc_demo_spark.queries import QUERIES

    def timed_query(qname: str):
        def thunk() -> float:
            t0 = time.perf_counter()
            QUERIES[qname](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            return round(time.perf_counter() - t0, 3)

        return thunk

    for qname in getattr(bench, "HEADLINE", []):
        table.setdefault(qname, timed_query(qname))
    missing = [n for n in names if n not in table]
    if missing:
        raise SystemExit(f"unknown bench entries: {missing}")
    return {n: table[n] for n in names}


def main() -> None:
    argv = sys.argv[1:]
    hist = bench_history()
    anchors = anchors_from_history(hist)
    if argv and argv[0] == "--list":
        print(f"{'entry':32} {'anchor':>8} {'(rnd)':>6} {'latest':>8} {'(rnd)':>6}")
        for name in sorted(anchors):
            a, ra, latest, rl = anchors[name]
            print(f"{name:32} {a:8.3f} r{ra:<5} {latest:8.3f} r{rl:<5}")
        return
    passes = 3
    if argv and argv[0].isdigit():
        passes = int(argv[0])
        argv = argv[1:]
    names = argv or [
        "cdc_merge_events",
        "cdc_merge_events_json",
        "ann_assign_64k_flat",
    ]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    bench._wait_for_quiet_host()
    spark = get_spark("cdc-demo-spark-driftpin")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    entries = resolve_entries(spark, sf_dir, names)
    best: dict[str, float] = {}
    trail: dict[str, dict] = {}
    for p in range(passes + 1):  # pass 0 = warm-up, unrecorded
        for name, fn in entries.items():
            la = os.getloadavg()
            snap0 = bench._load_snap()
            t = fn()
            ext = bench._external_cpu_share(snap0, bench._load_snap())
            if p == 0:
                continue
            if name not in best or t < best[name]:
                best[name] = t
                trail[name] = {"la1": round(la[0], 2), "ext_cpu": round(ext, 3)}
        time.sleep(2)

    print(
        f"\n{'entry':28} {'min':>7} {'anchor':>7} {'ratio':>6} "
        f"{'latest':>7}  la1/ext of min"
    )
    for name, t in best.items():
        if name in anchors:
            a, ra, latest, rl = anchors[name]
            print(
                f"{name:28} {t:7.3f} {a:7.3f} {t / a:6.2f} {latest:7.3f}  "
                f"la1={trail[name]['la1']} ext={trail[name]['ext_cpu']} "
                f"(anchor r{ra}, latest r{rl})"
            )
        else:
            print(
                f"{name:28} {t:7.3f} {'—':>7} {'—':>6} {'—':>7}  "
                f"la1={trail[name]['la1']} ext={trail[name]['ext_cpu']} "
                "(no committed history — this min becomes the anchor "
                "once a BENCH round records it)"
            )


if __name__ == "__main__":
    main()
