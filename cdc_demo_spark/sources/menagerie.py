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
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

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


# Scripted deltas, verbatim from the reference (A4/A15):
# /root/reference/README.md:99-110, :217-222; menagerie-db/ins_puff_rec.sql:1.
# Note 'Cyde' the pet vs 'Clyde' the event — the reference's (intentional
# or not) dangling reference; our join surface must preserve it.
PET_DELTAS = [
    ("Puffball", "Diane", "hamster", "f", "1999-03-30", None),
    ("Bonnie", "Travis", "cat", "f", "2017-04-14", None),
    ("Cyde", "Travis", "cat", "m", "2017-04-14", None),
    ("Thelma", "Travis", "cat", "f", "2020-08-09", None),
    ("Louise", "Travis", "cat", "f", "2020-08-09", None),
    ("Alfred", "Travis", "bat", "m", "1971-04-14", None),
]

EVENT_DELTAS = [
    ("Bonnie", "2021-08-02", "feeding", "Fed her treats"),
    ("Clyde", "2021-08-02", "feeding", "Fed him treats"),
    ("Louise", "2021-08-03", "belly scratches", "Good puppy!"),
    ("Thelma", "2021-08-04", "belly scratches", "Good puppy!"),
    ("Bonnie", "2021-08-10", "feeding", "Fed her treats"),
    ("Clyde", "2021-08-11", "feeding", "Fed him treats"),
    ("Louise", "2021-08-09", "belly scratches", "Good puppy!"),
]


def insert_values(spark: SparkSession, df: DataFrame, rows: list[tuple], schema) -> DataFrame:
    """A4 — INSERT ... VALUES as a unionByName with a literal DataFrame
    (dates arrive as ISO strings, cast through the registry schema)."""
    as_strings = StructType(
        [StructField(f.name, StringType(), True) for f in schema.fields]
    )
    lit = spark.createDataFrame(rows, schema=as_strings)
    lit = lit.select(
        *[F.col(f.name).cast(f.dataType).alias(f.name) for f in schema.fields]
    )
    return df.unionByName(lit)


def load_menagerie_with_deltas(spark: SparkSession, base_dir: str = REFERENCE_DB_DIR) -> dict[str, DataFrame]:
    """Fixture state after all scripted reference inserts ran."""
    base = load_menagerie(spark, base_dir)
    return {
        "pet": insert_values(spark, base["pet"], PET_DELTAS, schemas.PET),
        "event": insert_values(spark, base["event"], EVENT_DELTAS, schemas.EVENT),
    }
