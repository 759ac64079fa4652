"""Inspect physical plans to ASSERT the optimizations Catalyst should be
giving us (predicate pushdown, column pruning, broadcast selection,
bounded shuffles) — the §4 contract that we verify rather than rebuild.

Used by tests/test_plans.py; also handy interactively:

    >>> from cdc_demo_spark.plans import pushed_filters
    >>> pushed_filters(q)   # -> ['IsNotNull(l_quantity)', ...]
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def physical_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), "formatted"
    )


def pushed_filters(df: DataFrame) -> list[str]:
    """Filters that reached the parquet scan (empty list = nothing pushed)."""
    plan = physical_plan(df)
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", plan):
        if m.group(1).strip():
            out.extend(s.strip() for s in m.group(1).split(","))
    return out


def scan_columns(df: DataFrame) -> list[list[str]]:
    """Per-scan ReadSchema column lists (column pruning check)."""
    plan = physical_plan(df)
    schemas = []
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", plan):
        cols = [c.split(":")[0].strip() for c in m.group(1).split(",") if c.strip()]
        schemas.append(cols)
    return schemas


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in physical_plan(df) or "BroadcastNestedLoopJoin" in physical_plan(df)


def shuffle_count(df: DataFrame) -> int:
    """Number of Exchange operators (formatted plans print each node
    twice — tree and detail — so count only the detail headers)."""
    return len(re.findall(r"\(\d+\) Exchange", physical_plan(df)))


def assert_no_cartesian(df: DataFrame) -> None:
    plan = physical_plan(df)
    if "CartesianProduct" in plan:
        raise AssertionError("plan contains a CartesianProduct:\n" + plan)


def _top_level_args(s: str) -> list[str]:
    """Split a windowspecdefinition argument string at top-level commas
    (paren-balance aware; stops at the spec's own closing paren)."""
    args, cur, depth = [], [], 0
    for ch in s:
        if ch == "(":
            depth += 1
        elif ch == ")":
            if depth == 0:
                break
            depth -= 1
        if ch == "," and depth == 0:
            args.append("".join(cur).strip())
            cur = []
        else:
            cur.append(ch)
    args.append("".join(cur).strip())
    return args


def unpartitioned_window_specs(df: DataFrame) -> list[str]:
    """Every ``windowspecdefinition(...)`` in the plan whose spec has NO
    partition columns — the Exchange-SinglePartition global-window
    shape WindowExec warns about, where one task sorts the whole input
    (fine for dimension-grade cardinalities, fatal at fact grain and
    100×).  Detection: the spec's first top-level argument is either an
    ORDER column (carries ASC/DESC) or directly the frame — i.e. the
    partition-column list is empty.  Returns one truncated spec string
    per offender (empty list = clean).  Used by tools/audit_plans.py's
    registry-wide lint (VERDICT r14 #2)."""
    plan = physical_plan(df)
    out: list[str] = []
    marker = "windowspecdefinition("
    pos = 0
    while True:
        i = plan.find(marker, pos)
        if i < 0:
            break
        pos = i + len(marker)
        args = _top_level_args(plan[pos:])
        head = args[0] if args else ""
        if head.startswith("specifiedwindowframe") or " ASC" in head or " DESC" in head:
            out.append(marker + ", ".join(args)[:120])
    # de-dup: the formatted plan prints each node in tree + details
    return sorted(set(out))
