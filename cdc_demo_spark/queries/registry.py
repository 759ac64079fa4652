"""Query registry: name -> (spark, sf_dir) -> DataFrame, plus DuckDB oracles.

This is the engine's public query surface, consumed by
``__spark_entry__.py`` (driver contract) and by the oracle-differential
tests.  Register with::

    @register("q_name", oracle="SELECT ... AS same_alias ...")
    def q_name(spark, sf_dir): ...

Rules that keep the differential check meaningful (SURVEY.md §5):
- Alias every computed column identically in Spark and SQL — the driver
  sorts columns by name before hashing.
- Sums over doubles go through ``decimal(38,6)`` so the result is exact
  and order-independent (Spark's parallel sum order ≠ DuckDB's serial
  order; IEEE doubles don't commute, decimals do).
- ``oracle=None`` marks genuinely non-SQL-expressible ops; the driver
  then records a weaker rows-only check.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name {name!r}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle.strip()
        return fn

    return deco
