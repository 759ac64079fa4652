#!/usr/bin/env python
"""Local stand-in for the driver's oracle-differential check.

Runs every registered query on Spark and its DuckDB oracle on the same
parquet, compares row count + column names + (sorted) values, and prints
a per-query verdict. Usage:

    python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys
from decimal import Decimal

import duckdb
import pandas as pd

sys.path.insert(0, ".")

from cdc_demo_spark.queries import QUERIES, ORACLES  # noqa: E402
from cdc_demo_spark.session import get_spark  # noqa: E402
from cdc_demo_spark.schemas import TABLE_NAMES  # noqa: E402


def norm_cell(v):
    if v is None or (isinstance(v, float) and math.isnan(v)):
        return "<null>"
    if isinstance(v, Decimal):
        return f"{v.normalize():f}"
    if isinstance(v, float):
        return repr(v)  # full precision — bit-identical or bust
    if isinstance(v, pd.Timestamp):
        return v.isoformat()
    return str(v)


def canon(df: pd.DataFrame) -> list[tuple]:
    cols = sorted(df.columns)
    rows = [tuple(norm_cell(v) for v in row) for row in df[cols].itertuples(index=False)]
    return sorted(rows)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])
    spark = get_spark()
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    failures = 0
    for name, fn in QUERIES.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            spd = sdf.toPandas()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: spark error: {e}")
            failures += 1
            continue
        if name not in ORACLES:
            print(f"ok?   {name}: no oracle (rows-only) — {len(spd)} rows")
            continue
        try:
            opd = con.sql(ORACLES[name]).df()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: duckdb error: {e}")
            failures += 1
            continue
        if sorted(spd.columns) != sorted(opd.columns):
            print(f"FAIL  {name}: columns {sorted(spd.columns)} vs {sorted(opd.columns)}")
            failures += 1
            continue
        if len(spd) != len(opd):
            print(f"FAIL  {name}: rowcount {len(spd)} vs {len(opd)}")
            failures += 1
            continue
        a, b = canon(spd), canon(opd)
        if a != b:
            diff = [(x, y) for x, y in zip(a, b) if x != y][:3]
            print(f"FAIL  {name}: value mismatch, first diffs: {diff}")
            failures += 1
            continue
        print(f"PASS  {name} ({len(spd)} rows)")
    print(f"\n{'ALL PASS' if failures == 0 else f'{failures} FAILURES'}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
