"""Explicit StructType registry.

The reference never infers schemas: source tables are pinned by DDL
(/root/reference/menagerie-db/cr_pet_tbl.sql:5-13, cr_event_tbl.sql:5-11)
and targets by checked-in JSON schema files wired into the warehouse
tables (/root/reference/main.tf:202, :213).  We keep that property — every
table the engine touches has an explicit StructType here; ``inferSchema``
is never used for core tables.

Covers: the two menagerie tables (pet, event), the CDC envelope
(SURVEY.md §1.3 — the reference delegates this to Datastream,
/root/reference/README.md:168, so the envelope is our own design), and
the ten driver-generated synthetic tables (FIXTURES.md §B).
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    DateType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)


def _st(*fields: tuple) -> StructType:
    return StructType([StructField(n, t, nullable) for n, t, nullable in fields])


# --------------------------------------------------------------------------
# Menagerie tables (reference DDL; everything nullable, no PKs — see
# /root/reference/menagerie-db/cr_pet_tbl.sql:5-13 and SURVEY.md §1.1).
# --------------------------------------------------------------------------

PET = _st(
    ("name", StringType(), True),
    ("owner", StringType(), True),
    ("species", StringType(), True),
    ("sex", StringType(), True),
    ("birth", DateType(), True),
    ("death", DateType(), True),
)

EVENT = _st(
    ("name", StringType(), True),
    ("date", DateType(), True),
    ("type", StringType(), True),
    ("remark", StringType(), True),
)

MENAGERIE: dict[str, StructType] = {"pet": PET, "event": EVENT}


def envelope_schema(payload: StructType) -> StructType:
    """CDC change-event envelope (SURVEY.md §1.3).

    Datastream/Debezium-style: op + source commit time + monotonic log
    position + before/after row images.  ``key`` is nullable because the
    reference's tables are keyless (no PK anywhere in the DDL).
    """
    return StructType(
        [
            StructField("op", StringType(), False),  # c / u / d / r
            StructField("ts", TimestampType(), False),
            StructField("seq", LongType(), False),
            StructField("table", StringType(), False),
            StructField("key", StringType(), True),
            StructField("before", payload, True),
            StructField("after", payload, True),
        ]
    )


# --------------------------------------------------------------------------
# Driver synthetic tables (/root/testdata/sf*/; FIXTURES.md §B).
# NOTE: events.ts is TIMESTAMP(NANOS) in the parquet files; with
# spark.sql.legacy.parquet.nanosAsLong=true it scans as LongType and the
# loader converts to TimestampType (micros).  This registry records the
# *post-load* schema the engine exposes.
# --------------------------------------------------------------------------

REGION = _st(
    ("r_regionkey", IntegerType(), True),
    ("r_name", StringType(), True),
)

NATION = _st(
    ("n_nationkey", IntegerType(), True),
    ("n_name", StringType(), True),
    ("n_regionkey", IntegerType(), True),
)

CUSTOMER = _st(
    ("c_custkey", LongType(), True),
    ("c_name", StringType(), True),
    ("c_nationkey", IntegerType(), True),
    ("c_acctbal", DoubleType(), True),
    ("c_mktsegment", StringType(), True),
)

SUPPLIER = _st(
    ("s_suppkey", LongType(), True),
    ("s_name", StringType(), True),
    ("s_nationkey", IntegerType(), True),
    ("s_acctbal", DoubleType(), True),
)

PART = _st(
    ("p_partkey", LongType(), True),
    ("p_name", StringType(), True),
    ("p_brand", StringType(), True),
    ("p_type", StringType(), True),
    ("p_size", IntegerType(), True),
    ("p_retailprice", DoubleType(), True),
)

ORDERS = _st(
    ("o_orderkey", LongType(), True),
    ("o_custkey", LongType(), True),
    ("o_orderstatus", StringType(), True),
    ("o_totalprice", DoubleType(), True),
    ("o_orderdate", TimestampType(), True),
    ("o_orderpriority", StringType(), True),
)

LINEITEM = _st(
    ("l_orderkey", LongType(), True),
    ("l_partkey", LongType(), True),
    ("l_suppkey", LongType(), True),
    ("l_linenumber", IntegerType(), True),
    ("l_quantity", DoubleType(), True),
    ("l_extendedprice", DoubleType(), True),
    ("l_discount", DoubleType(), True),
    ("l_tax", DoubleType(), True),
    ("l_returnflag", StringType(), True),
    ("l_linestatus", StringType(), True),
    ("l_shipdate", TimestampType(), True),
)

EVENTS = _st(
    ("event_id", LongType(), True),
    ("ts", TimestampType(), True),
    ("user_id", LongType(), True),
    ("event_type", StringType(), True),
    ("value", DoubleType(), True),
    ("props", StringType(), True),
)

DOCUMENTS = _st(
    ("doc_id", LongType(), True),
    ("text", StringType(), True),
    ("lang", StringType(), True),
    ("source", StringType(), True),
    ("n_chars", LongType(), True),
)

EMBEDDINGS = _st(
    ("vec_id", LongType(), True),
    ("embedding", ArrayType(FloatType(), True), True),
    ("label", IntegerType(), True),
)

# events.props payload: JSON object text like {"k": 87} (FIXTURES.md §B).
EVENT_PROPS = _st(("k", LongType(), True))

TESTDATA: dict[str, StructType] = {
    "region": REGION,
    "nation": NATION,
    "customer": CUSTOMER,
    "supplier": SUPPLIER,
    "part": PART,
    "orders": ORDERS,
    "lineitem": LINEITEM,
    "events": EVENTS,
    "documents": DOCUMENTS,
    "embeddings": EMBEDDINGS,
}

TABLE_NAMES = tuple(TESTDATA)
