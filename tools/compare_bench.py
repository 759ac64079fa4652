#!/usr/bin/env python
"""Noise-aware comparison of two bench.py JSON artifacts.

Usage: python tools/compare_bench.py OLD.json NEW.json

Prints per-shared-query deltas classified against this host's measured
run-to-run noise (±25%, plus a 0.3 s absolute floor so 0.2 s queries
don't flag on scheduler jitter), the shared-suite ratio, and the two
runs' loadavg so contention-skewed artifacts are read as such instead
of as plan regressions (the r5 verdict's complaint about comparing a
loaded capture against a quiet one).
"""

from __future__ import annotations

import json
import sys

NOISE = 0.25
ABS_FLOOR = 0.3


def load(path: str) -> dict:
    """Accepts either bench.py's raw JSON line or the driver's
    BENCH_r{N}.json wrapper (payload under 'parsed')."""
    with open(path) as f:
        data = json.load(f)
    return data.get("parsed", data)


def main() -> None:
    if len(sys.argv) != 3:
        sys.exit(__doc__)
    old, new = load(sys.argv[1]), load(sys.argv[2])
    oq = {k: v for k, v in old["queries"].items() if isinstance(v, (int, float))}
    nq = {k: v for k, v in new["queries"].items() if isinstance(v, (int, float))}
    shared = sorted(set(oq) & set(nq))
    rows, o_tot, n_tot = [], 0.0, 0.0
    for q in shared:
        a, b = oq[q], nq[q]
        o_tot += a
        n_tot += b
        delta = b - a
        ratio = b / a if a else float("inf")
        if abs(delta) < ABS_FLOOR or (1 - NOISE) <= ratio <= (1 + NOISE):
            verdict = "~noise"
        elif ratio < 1:
            verdict = "IMPROVED"
        else:
            verdict = "REGRESSED"
        rows.append((q, a, b, ratio, verdict))

    w = max(len(q) for q in shared) if shared else 10
    print(f"{'query'.ljust(w)}  {'old':>8}  {'new':>8}  {'ratio':>6}  verdict")
    for q, a, b, r, v in rows:
        print(f"{q.ljust(w)}  {a:8.3f}  {b:8.3f}  {r:6.2f}  {v}")
    print()
    if shared:
        print(f"shared-suite total: {o_tot:.2f} s -> {n_tot:.2f} s "
              f"({n_tot / o_tot:.2f}x, {len(shared)} queries)")
    else:
        print("no shared numeric queries between the two artifacts")
    for name, d in (("old", old), ("new", new)):
        extra = sorted(set(d["queries"]) - set(shared))
        if extra:
            print(f"only in {name}: {', '.join(extra)}")
        if "loadavg" in d:
            print(f"{name} loadavg: {d['loadavg']}")
    flagged = [r[0] for r in rows if r[4] == "REGRESSED"]
    if flagged:
        print(f"\nREGRESSED beyond noise: {', '.join(flagged)}")
        sys.exit(1)


if __name__ == "__main__":
    main()
