"""SparkSession factory tuned for the engine.

The reference provisions its engines declaratively (Terraform,
/root/reference/main.tf); our equivalent of "provisioning" is building a
correctly-configured SparkSession. Defaults are chosen for the 100 TB
design point and scale down fine to local test runs:

- AQE on: runtime shuffle-partition coalescing + skew-join splitting
  replace hand-tuned partition counts at any scale.
- Arrow on: every pandas-UDF / toPandas crossing is columnar.
- Session timezone pinned to UTC: timestamps mean the same thing in the
  engine, the DuckDB oracle, and the CDC envelope (source commit times).
- ``parquet.nanosAsLong``: nanosecond parquet timestamps (unsupported by
  Spark's vectorized reader) are read as raw int64 and converted by the
  loaders in ``sources.tables`` — lossless for microsecond-precision data.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Runtime-settable SQL confs that the engine depends on. Kept separate so
# they can also be applied to an externally-created session (`configure`).
RUNTIME_CONFS: dict[str, str] = {
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # events.parquet carries TIMESTAMP(NANOS); read as long, convert in loader.
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # Columnar batch reads for parquet.
    "spark.sql.parquet.enableVectorizedReader": "true",
    # Runtime row-level filtering: a selective filter on one side of a
    # shuffle join injects a bloom filter into the other side's scan
    # (pinned by tests/test_plans.py; at 100 TB this is the difference
    # between shuffling a fact table and shuffling the ~matching rows).
    # Production gate: application-side scan must exceed
    # applicationSideScanSizeThreshold (10 GB default) — tests lower it.
    "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
}


def default_parallelism() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))


def configure(spark: SparkSession) -> SparkSession:
    """Apply the engine's runtime confs to an existing session.

    The driver hands us its own SparkSession; everything the engine needs
    must be settable at runtime (all keys in RUNTIME_CONFS are).
    """
    for k, v in RUNTIME_CONFS.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            pass  # non-settable on this build; loaders have fallbacks
    return spark


def get_spark(
    app_name: str = "cdc-demo-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    """Build (or reuse) the engine session.

    shuffle_partitions defaults to 2x cores locally; on a real cluster you
    would leave it high (or rely on AQE coalescing, which is enabled).
    """
    cores = default_parallelism()
    master = master or os.environ.get("SPARK_GRAFT_MASTER", f"local[{cores}]")
    if shuffle_partitions is None:
        shuffle_partitions = max(4, cores)
    b = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    for k, v in RUNTIME_CONFS.items():
        b = b.config(k, v)
    return configure(b.getOrCreate())
