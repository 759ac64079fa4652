"""Format-specific readers/writers beyond parquet/TSV (B3-B5).

- JSON (B3): batch scan with explicit schema + corrupt-record capture —
  the batch twin of the streaming source in streaming/pipeline.py.
- Avro (B4): the reference's preferred change-file format
  (/root/reference/README.md:168 "Avro is a very compact file format").
  PySpark treats avro as an external module (spark-avro jar); this
  container ships without it, so the helpers probe availability and
  fail with an actionable message instead of a Java stack trace. The
  JSON path is the tested default (the reference's own dataflow path
  also used JSON: README.md:202 `inputFileFormat=json`).
- JDBC (B5): the snapshot source (A6). Exercised end-to-end against
  embedded Apache Derby (the one JDBC engine shipping in
  $SPARK_HOME/jars): tests write a source table over JDBC, snapshot it
  back with a partitioned read, and replicate it through the CDC merge
  (tests/test_jdbc_snapshot.py). Against MySQL (the reference's source,
  /root/reference/main.tf:79) only the url/driver options change.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


def read_json(
    spark: SparkSession, path: str, schema: StructType, corrupt_col: str = "_corrupt"
) -> DataFrame:
    """Schema-checked JSON scan; malformed rows land in `corrupt_col`
    (filter on it to build a batch DLQ, A13)."""
    return (
        spark.read.schema(schema.add(corrupt_col, "string", True))
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", corrupt_col)
        .json(path)
    )


def avro_available(spark: SparkSession) -> bool:
    try:
        spark.read.format("avro").load("/nonexistent-avro-probe")
        return True  # pragma: no cover - jar present AND path exists
    except Exception as e:  # noqa: BLE001
        return "Failed to find data source: avro" not in str(e)


def read_avro(spark: SparkSession, path: str) -> DataFrame:
    if not avro_available(spark):
        raise NotImplementedError(
            "spark-avro is not on the classpath in this environment; launch with "
            "--packages org.apache.spark:spark-avro_2.13:<spark version> or use the "
            "JSON change-file path (reference also ran JSON: README.md:202)"
        )
    return spark.read.format("avro").load(path)  # pragma: no cover


def write_avro(df: DataFrame, path: str, mode: str = "append") -> None:
    if not avro_available(df.sparkSession):
        raise NotImplementedError("spark-avro is not on the classpath (see read_avro)")
    df.write.format("avro").mode(mode).save(path)  # pragma: no cover


def jdbc_snapshot_reader(
    spark: SparkSession,
    url: str,
    table: str,
    partition_column: str | None = None,
    num_partitions: int = 8,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    **options: str,
):
    """A6/B5 — configured JDBC snapshot read (initial 'backfill').

    Partitioned pulls (partitionColumn + bounds) parallelize the
    snapshot across executors — required at any real table size; an
    unpartitioned JDBC read is a single-connection scan.
    Returns the configured DataFrameReader; `.load()` connects."""
    reader = spark.read.format("jdbc").option("url", url).option("dbtable", table)
    if partition_column is not None:
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("numPartitions", str(num_partitions))
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
        )
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader
