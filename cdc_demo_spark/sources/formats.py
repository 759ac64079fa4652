"""Format-specific readers/writers beyond parquet/TSV (B3-B5).

- JSON (B3): batch scan with explicit schema + corrupt-record capture —
  the batch twin of the streaming source in streaming/pipeline.py.
- Avro (B4): the reference's preferred change-file format
  (/root/reference/README.md:168 "Avro is a very compact file format").
  PySpark treats avro as an external module (spark-avro jar); when the
  jar is present the helpers use it (fast JVM path). When it is absent
  (this container) they fall back to the engine's own spec-conformant
  pure-Python container codec (sources/avro_codec.py): reads
  parallelize over files (binaryFile scan -> mapInPandas decode per
  file), writes run one container file per partition via the RDD
  partition API — nothing funnels through the driver either way.
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


def read_avro(spark: SparkSession, path: str, schema: StructType | None = None) -> DataFrame:
    """Avro scan: spark-avro when the jar is present, else the built-in
    pure-Python container codec, parallelized one task per file."""
    if avro_available(spark):
        reader = spark.read.format("avro")  # pragma: no cover - jar absent here
        if schema is not None:  # pragma: no cover
            reader = reader.schema(schema)  # pragma: no cover
        return reader.load(path)  # pragma: no cover
    return _read_avro_py(spark, path, schema)


def write_avro(df: DataFrame, path: str, mode: str = "append", codec: str = "deflate") -> None:
    """Avro sink: spark-avro when present, else one container file per
    partition written executor-side (no driver collect)."""
    if avro_available(df.sparkSession):
        df.write.format("avro").mode(mode).save(path)  # pragma: no cover
        return  # pragma: no cover
    _write_avro_py(df, path, mode, codec)


def _list_avro_files(path: str) -> list[str]:
    import os

    if os.path.isdir(path):
        return sorted(
            os.path.join(path, f) for f in os.listdir(path) if f.endswith(".avro")
        )
    return [path]


def _read_avro_py(spark: SparkSession, path: str, schema: StructType | None) -> DataFrame:
    import pandas as pd

    from cdc_demo_spark.sources import avro_codec as AC

    if schema is None:
        # schema discovery = one header read (a few hundred bytes) of
        # the first file, driver-side — the same metadata touch any
        # self-describing format needs before planning
        files = _list_avro_files(path)
        if not files:
            raise FileNotFoundError(f"no .avro files under {path}")
        with open(files[0], "rb") as f:
            avsc, _, _ = AC.read_header(f)
        schema = AC.spark_schema_of(avsc)

    field_names = schema.fieldNames()
    binfiles = (
        spark.read.format("binaryFile").option("pathGlobFilter", "*.avro").load(path)
        .select("content")
    )

    def decode_batches(batches):
        for pdf in batches:
            for content in pdf["content"]:
                _, recs = AC.read_container(bytes(content))
                if recs:
                    yield pd.DataFrame(
                        {name: [r.get(name) for r in recs] for name in field_names}
                    )

    return binfiles.mapInPandas(decode_batches, schema=schema)


def _write_avro_py(df: DataFrame, path: str, mode: str, codec: str) -> None:
    import os
    import uuid

    from cdc_demo_spark.sources import avro_codec as AC

    os.makedirs(path, exist_ok=True)
    existing = _list_avro_files(path) if os.path.isdir(path) else []
    if mode == "overwrite":
        for f in existing:
            os.unlink(f)
    elif mode == "error" and existing:
        raise FileExistsError(path)
    elif mode not in ("append", "overwrite"):
        raise ValueError(f"unsupported mode {mode!r}")

    avsc = AC.avro_schema_of(df.schema)
    run_id = uuid.uuid4().hex[:8]

    def write_partition(idx, rows):
        # RDD partition API by design: per-partition imperative file IO
        # (the documented exception to DataFrame-only)
        recs = [r.asDict(recursive=True) for r in rows]
        if recs:
            AC.write_container(
                os.path.join(path, f"part-{idx:05d}-{run_id}.avro"), avsc, recs, codec
            )
        return iter(())

    df.rdd.mapPartitionsWithIndex(write_partition).count()


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
