"""cdc_demo_spark — a PySpark-native analytics engine.

Re-expresses the data-processing semantics of the reference CDC pipeline
(``tiny-tinker/cdc-demo``: MySQL snapshot + binlog -> change files ->
staging append -> merge -> queryable replica, /root/reference/README.md:10-28)
as idiomatic Spark: DataFrame/SQL on Catalyst for the batch relational
surface, Structured Streaming for continuous replication, plus the
large-scale training-data operators (dedup, similarity search, text
analysis, multimodal columns) designed for 100 TB operation.

Layout:
  session    -- SparkSession factory (AQE, Arrow, tuned shuffle)
  schemas    -- explicit StructType registry (no inference; reference
                pins schemas in checked-in files, main.tf:202,213)
  sources/   -- batch + streaming readers/writers (parquet/tsv/json/avro)
  operators/ -- composed operators: CDC merge, dedup, similarity, text
  functions/ -- column-level helpers (vector math, hashing)
  queries/   -- the registered query surface (queries() + oracle_sql())
  streaming/ -- CDC envelope, bronze/silver pipeline, DLQ
  plans/     -- plan introspection helpers (pushdown/broadcast asserts)
"""

__version__ = "0.1.0"
