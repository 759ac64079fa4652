"""Driver-window staleness report — codifies the rotation policy that
rounds 5-7 computed by hand.

The driver's CORRECTNESS_r{N}.json captures only the FIRST 50
registered queries each round, so every oracle query's durable
evidence is its NEWEST green driver record.  Each round the window
head should hold: (a) the round's new oracle queries, then (b) the
oracle queries with the OLDEST newest-green record (refreshes).  This
tool reads the CORRECTNESS_r*.json union and prints, per oracle-backed
query, its newest green round — plus the suggested next head.

Usage:  python tools/window_staleness.py [head_size]
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cdc_demo_spark.queries import ORACLES, QUERIES  # noqa: E402


def newest_green() -> dict[str, int]:
    """query -> newest round with a hash-green driver record."""
    best: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(os.path.dirname(__file__), "..", "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        with open(path) as f:
            data = json.load(f)
        for name, rec in data.items():
            if rec.get("hash_match") and rec.get("rows_match") and rec.get("schema_match"):
                best[name] = max(best.get(name, 0), rnd)
    return best


def main() -> None:
    head_size = int(sys.argv[1]) if len(sys.argv) > 1 else 50
    green = newest_green()
    oracle_qs = [n for n in QUERIES if n in ORACLES]
    rows = sorted(oracle_qs, key=lambda n: (green.get(n, 0), n))
    print(f"{len(oracle_qs)} oracle-backed queries; "
          f"{sum(1 for n in oracle_qs if n not in green)} never driver-checked")
    by_round: dict[int, int] = {}
    for n in oracle_qs:
        by_round[green.get(n, 0)] = by_round.get(green.get(n, 0), 0) + 1
    for rnd in sorted(by_round):
        label = f"r{rnd}" if rnd else "never"
        print(f"  newest-green {label}: {by_round[rnd]} queries")
    print(f"\nSuggested next head ({head_size} stalest-first; new queries "
          "land at 0 and sort first automatically):")
    for n in rows[:head_size]:
        label = f"r{green[n]}" if n in green else "NEW/never"
        print(f"  {label:>10}  {n}")
    current_head = list(QUERIES)[:head_size]
    suggested = set(rows[:head_size])
    drop = [n for n in current_head if n not in suggested]
    add = [n for n in rows[:head_size] if n not in set(current_head)]
    if drop or add:
        print(f"\nvs current registration head: +{len(add)} / -{len(drop)}")
        for n in add[:10]:
            print(f"  + {n}")
        for n in drop[:10]:
            print(f"  - {n}")


if __name__ == "__main__":
    main()
