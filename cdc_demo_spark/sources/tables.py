"""Parquet loaders for the analytic tables (SURVEY.md §2 B1).

Replaces the reference's warehouse-table layer (BigQuery datasets declared
at /root/reference/main.tf:188-215) with Parquet + DataFrame reads.  All
loads are schema-checked against the registry in ``schemas.py`` — the
reference pins its target schemas in checked-in files (main.tf:202,213)
and we keep that no-inference property.

Scale notes (100 TB design point):
- Plain ``spark.read.parquet`` keeps predicate pushdown, column pruning
  and partition pruning available to Catalyst; we never materialize or
  cache eagerly here.
- The only column rewritten at load time is ``events.ts``, canonicalized
  to microsecond ``TimestampType`` from whatever the runtime's parquet
  reader produced (int64 nanos on legacy 3.x confs, ``TIMESTAMP_NTZ`` on
  Spark 4.x).  That cast is a cheap
  projection executed inside whole-stage codegen, not a UDF, so it does
  not break pushdown on the *other* columns.  Filters on ``ts`` itself
  are evaluated post-scan — acceptable because a production deployment
  would partition the events table by date, making partition pruning
  (not row-group pushdown) the coarse filter.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, TimestampType

from cdc_demo_spark import schemas

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one synthetic table by name, normalized to the registry schema."""
    if name not in schemas.TESTDATA:
        raise KeyError(f"unknown table {name!r}; known: {sorted(schemas.TESTDATA)}")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events":
        # Canonicalize ts to TimestampType regardless of what the runtime's
        # parquet reader produced for the fixture's timestamp[us]
        # (isAdjustedToUTC=false) column:
        #   - Spark <=3.x with legacy nanosAsLong: raw int64 nanos →
        #     truncate to micros (`div` = exact integer division; float `/`
        #     would round — 1.7e18 ns exceeds double's 53-bit mantissa).
        #   - Spark 4.x: TIMESTAMP_NTZ → cast to TIMESTAMP. Under the
        #     pinned UTC session zone this relabels the same micros value,
        #     giving instants identical to the DuckDB oracle's.
        dt = df.schema["ts"].dataType
        if isinstance(dt, LongType):
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif not isinstance(dt, TimestampType):
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in schemas.TABLE_NAMES}


def register_views(spark: SparkSession, sf_dir: str, prefix: str = "") -> None:
    """Register all tables as temp views so ``spark.sql`` works over them."""
    for name, df in load_all(spark, sf_dir).items():
        df.createOrReplaceTempView(prefix + name)
