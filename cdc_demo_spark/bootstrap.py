"""Environment bootstrap — the engine's equivalent of `terraform apply`
(SURVEY.md §3.1).

The reference constructs its environment declaratively: database +
user (/root/reference/main.tf:122-140), warehouse dataset + tables from
checked-in JSON schemas (main.tf:188-215), bucket + notification
(main.tf:150-181). Our single-process equivalent: create a Spark SQL
database, register the replica tables from the registry StructTypes
(A1), idempotently (A2 — `DROP/CREATE IF [NOT] EXISTS` mirrors the
reference's re-runnable teardown), and lay out the landing/bronze/
silver/checkpoint directories the streaming pipeline uses.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

from cdc_demo_spark import schemas

DB = "menagerie_reporting"  # the reference's dataset name, main.tf:191


def bootstrap(spark: SparkSession, base_path: str, db: str = DB) -> None:
    """Idempotent: safe to run repeatedly (like `terraform apply`)."""
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {db}")
    for sub in ("landing", "bronze", "silver", "checkpoints", "dlq"):
        os.makedirs(os.path.join(base_path, sub), exist_ok=True)
    for name, schema in schemas.MENAGERIE.items():
        ddl = ", ".join(f"`{f.name}` {f.dataType.simpleString()}" for f in schema.fields)
        path = os.path.join(base_path, "tables", name)
        spark.sql(
            f"CREATE TABLE IF NOT EXISTS {db}.{name} ({ddl}) USING parquet "
            f"LOCATION '{path}'"
        )


def teardown(spark: SparkSession, db: str = DB) -> None:
    """A2/A16 — idempotent destroy (the reference's cleanup section,
    README.md:239-252)."""
    for name in schemas.MENAGERIE:
        spark.sql(f"DROP TABLE IF EXISTS {db}.{name}")
    spark.sql(f"DROP DATABASE IF EXISTS {db}")
