r"""TSV loader with MySQL ``LOAD DATA`` conventions (SURVEY.md §2 A3/B2).

The reference bulk-loads tab-separated files via ``LOAD DATA LOCAL INFILE``
(/root/reference/menagerie-db/load_pet_tbl.sql:5, README.txt:44) with two
null conventions the engine must reproduce:

- explicit ``\N`` markers (pet.txt:4-8 ``death`` column), and
- ragged short rows — event.txt:6-7 carry 3 of 4 fields, so the trailing
  ``remark`` column loads as NULL.

Spark's CSV reader in PERMISSIVE mode gives both behaviors natively.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

from cdc_demo_spark import schemas

REFERENCE_DB_DIR = "/root/reference/menagerie-db"


def read_tsv(spark: SparkSession, path: str, schema: StructType) -> DataFrame:
    """Read a MySQL-convention TSV: tab sep, no header, \\N = NULL,
    short rows pad trailing columns with NULL (PERMISSIVE)."""
    return (
        spark.read.schema(schema)
        .option("sep", "\t")
        .option("header", "false")
        .option("nullValue", "\\N")
        .option("mode", "PERMISSIVE")
        .option("dateFormat", "yyyy-MM-dd")
        .csv(path)
    )


def load_menagerie(spark: SparkSession, base_dir: str = REFERENCE_DB_DIR) -> dict[str, DataFrame]:
    """Load the golden pet/event fixtures exactly as A3 specifies."""
    return {
        "pet": read_tsv(spark, os.path.join(base_dir, "pet.txt"), schemas.PET),
        "event": read_tsv(spark, os.path.join(base_dir, "event.txt"), schemas.EVENT),
    }
