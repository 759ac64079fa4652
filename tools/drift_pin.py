"""Interleaved quiet min-of-N A/B for drifting bench entries — the
"semantic-dedup method" (r8) as a reusable tool, built for VERDICT r11
#4: cdc_merge_events / cdc_merge_events_json read ~1.2-1.3x above
their r9 anchors for two consecutive rounds at moderate la1, and
ann_assign_64k_flat read 1.37-1.49x twice, always under la1 > 20 —
each time in full-suite context, never in isolation.

Method: wait for a quiet host, one warm-up pass (codegen), then N
recorded passes with the entries INTERLEAVED (any transient host noise
lands on all entries, not one), report per-entry min + the la1/ext-CPU
trail of the winning pass, and the ratio vs the anchor.  A min within
the host's noise band (~10%) of the anchor = the suite-context numbers
were load, not code; a min still 1.2x+ = a real regression to chase.

Usage:
    python tools/drift_pin.py [passes]     # default 3 recorded passes
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402
from cdc_demo_spark.session import get_spark  # noqa: E402

# entry -> anchor seconds.  The r9 values are the original drift
# targets; r12 quiet min-of-3 re-baselined them (cdc_merge_events
# 2.425, cdc_merge_events_json 2.455, ann_assign_64k_flat 1.55
# isolated / 2.46 interleaved after the blocked-top-k fix) — update
# these when a verdict names new drifters.
ANCHORS = {
    "cdc_merge_events": 2.454,
    "cdc_merge_events_json": 2.219,
    "ann_assign_64k_flat": 2.672,
}


def main() -> None:
    passes = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    bench._wait_for_quiet_host()
    spark = get_spark("cdc-demo-spark-driftpin")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    entries = {
        "cdc_merge_events": lambda: bench.time_cdc_merge(spark, sf_dir),
        "cdc_merge_events_json": lambda: bench.time_cdc_ingest(
            spark, sf_dir, "json"
        ),
        "ann_assign_64k_flat": lambda: bench.time_ann_assign_64k_flat(spark),
    }
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

    print(f"\n{'entry':28} {'min':>7} {'anchor':>7} {'ratio':>6}  la1/ext of min")
    for name, t in best.items():
        a = ANCHORS[name]
        print(
            f"{name:28} {t:7.3f} {a:7.3f} {t / a:6.2f}  "
            f"la1={trail[name]['la1']} ext={trail[name]['ext_cpu']}"
        )


if __name__ == "__main__":
    main()
