#!/usr/bin/env python
"""Capture .explain('formatted') output for named registry queries into
plans/r16/<query>_<tag>.txt — the optimization round's before/after
plan evidence (the judge reads these files instead of running Spark).

Usage:
    python tools/capture_plans.py <tag> <query> [query ...]
    python tools/capture_plans.py <tag> --sf /root/testdata/sf0.1 q_a q_b
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, ".")

from cdc_demo_spark.queries import QUERIES  # noqa: E402
from cdc_demo_spark.session import get_spark  # noqa: E402


def main() -> int:
    args = sys.argv[1:]
    if len(args) < 2:
        print(__doc__)
        return 2
    tag = args[0]
    rest = args[1:]
    sf_dir = "/root/testdata/sf0.1"
    if rest[0] == "--sf":
        sf_dir = rest[1]
        rest = rest[2:]
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        os.environ.get("PLANS_ROUND", "r17"),
    )
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("plan-capture")
    spark.sparkContext.setLogLevel("ERROR")
    for name in rest:
        df = QUERIES[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({len(plan)} chars)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
