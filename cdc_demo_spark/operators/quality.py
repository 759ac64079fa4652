"""Data-quality validation (expectations) — the admission-control side
of a training-data pipeline: before documents/embeddings/facts enter a
run, count rule violations cheaply and in one pass.

Every rule compiles to a conditional-count aggregate, so checking N
rules costs ONE scan with N counters (map-side combined) — no per-rule
jobs, no driver-side row iteration, any table size.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Rule:
    name: str
    violated_when: Column  # boolean expression: true == violation


def not_null(col: str) -> Rule:
    return Rule(f"{col}_not_null", F.col(col).isNull())


def in_range(col: str, lo, hi) -> Rule:
    return Rule(f"{col}_in_range", ~F.col(col).between(lo, hi) | F.col(col).isNull())


def matches(col: str, pattern: str) -> Rule:
    return Rule(f"{col}_matches", ~F.col(col).rlike(pattern) | F.col(col).isNull())


def one_of(col: str, values: list) -> Rule:
    return Rule(f"{col}_one_of", ~F.col(col).isin(*values) | F.col(col).isNull())


def validate(df: DataFrame, rules: list[Rule]) -> DataFrame:
    """One row: total rows + one violation count per rule."""
    aggs = [F.count(F.lit(1)).alias("n_rows")] + [
        F.count(F.when(r.violated_when, 1)).alias(r.name) for r in rules
    ]
    return df.agg(*aggs)


def referential_violations(
    fact: DataFrame, fact_key: str, dim: DataFrame, dim_key: str
) -> DataFrame:
    """Fact rows whose key has no dimension match (the 'Clyde' check,
    /root/reference/README.md:100 vs :108, generalized) — left-anti on
    the key, counts only."""
    missing = fact.join(dim, fact[fact_key] == dim[dim_key], "left_anti")
    return missing.agg(F.count(F.lit(1)).alias("n_orphans"))
