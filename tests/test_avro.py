"""Avro change-file path (B4): spec conformance of the pure-Python
container codec, Spark roundtrips, and the reference's preferred flow —
Avro change files -> CDC merge (/root/reference/README.md:168)."""

from __future__ import annotations

import io
from datetime import date, datetime

from pyspark.sql import functions as F

from cdc_demo_spark.sources import avro_codec as AC
from cdc_demo_spark.sources.formats import read_avro, write_avro


def test_zigzag_varint_roundtrip():
    for n in (0, -1, 1, 63, 64, -64, -65, 2**31, -(2**31), 2**62, -(2**62)):
        buf = io.BytesIO()
        AC.write_long(buf, n)
        buf.seek(0)
        assert AC.read_long(buf) == n
    # spec examples: zigzag(0)=0x00, zigzag(-1)=0x01, zigzag(1)=0x02
    for n, expected in ((0, b"\x00"), (-1, b"\x01"), (1, b"\x02"), (-2, b"\x03")):
        buf = io.BytesIO()
        AC.write_long(buf, n)
        assert buf.getvalue() == expected


def test_container_file_spec_shape(tmp_path):
    schema = {"type": "record", "name": "r",
              "fields": [{"name": "x", "type": "long"},
                         {"name": "s", "type": ["null", "string"]}]}
    path = str(tmp_path / "t.avro")
    AC.write_container(path, schema, [{"x": 1, "s": "a"}, {"x": 2, "s": None}])
    raw = open(path, "rb").read()
    assert raw[:4] == b"Obj\x01"  # spec magic
    got_schema, records = AC.read_container(raw)
    assert got_schema == schema
    assert records == [{"x": 1, "s": "a"}, {"x": 2, "s": None}]


def test_deflate_and_null_codecs_roundtrip(tmp_path):
    schema = {"type": "record", "name": "r",
              "fields": [{"name": "t", "type": "string"}]}
    recs = [{"t": "z" * 1000} for _ in range(50)]
    p_null = str(tmp_path / "n.avro")
    p_defl = str(tmp_path / "d.avro")
    AC.write_container(p_null, schema, recs, codec="null")
    AC.write_container(p_defl, schema, recs, codec="deflate")
    import os

    assert os.path.getsize(p_defl) < os.path.getsize(p_null) / 10  # it compresses
    assert AC.read_container(open(p_null, "rb").read())[1] == recs
    assert AC.read_container(open(p_defl, "rb").read())[1] == recs


def test_corrupt_sync_marker_detected(tmp_path):
    schema = {"type": "record", "name": "r", "fields": [{"name": "x", "type": "long"}]}
    path = str(tmp_path / "c.avro")
    AC.write_container(path, schema, [{"x": i} for i in range(10)], codec="null")
    raw = bytearray(open(path, "rb").read())
    raw[-1] ^= 0xFF  # flip a bit in the trailing sync marker
    import pytest

    with pytest.raises(ValueError, match="sync"):
        AC.read_container(bytes(raw))


def test_schema_translation_roundtrip():
    from pyspark.sql.types import (
        ArrayType, DoubleType, LongType, StringType, StructField, StructType,
        TimestampType,
    )

    st = StructType([
        StructField("id", LongType(), False),
        StructField("name", StringType(), True),
        StructField("ts", TimestampType(), True),
        StructField("vals", ArrayType(DoubleType(), False), True),
        StructField("nested", StructType([
            StructField("a", StringType(), True),
        ]), True),
    ])
    back = AC.spark_schema_of(AC.avro_schema_of(st))
    assert back == st


def test_timestamp_micro_encode_is_exact():
    """Pure-codec regression for the float-truncation bug: naive and
    tz-aware datetimes whose micros round 1µs low under
    int(total_seconds()*1e6) must encode exactly (timedelta // 1µs)."""
    import io
    from datetime import timedelta, timezone

    schema = {"type": "long", "logicalType": "timestamp-micros"}
    # 1110779019281869 µs: int(total_seconds()*1e6) yields ...868
    adversarial = datetime(2005, 3, 14, 5, 43, 39, 281869)
    for value, want in [
        (adversarial, 1110779019281869),
        (adversarial.replace(tzinfo=timezone.utc), 1110779019281869),
        (datetime(1970, 1, 1) - timedelta(microseconds=3), -3),
    ]:
        buf = io.BytesIO()
        AC.encode(buf, schema, value)
        buf.seek(0)
        got = AC.decode(buf, schema)
        assert (got - datetime(1970, 1, 1)) // timedelta(microseconds=1) == want
    # local-timestamp-micros is zone-LESS: a tz-aware input is a caller
    # error and must raise, not silently store some zone's wall clock
    # (round-5 ADVICE; Spark NTZ always hands the codec naive values)
    import pytest

    local = {"type": "long", "logicalType": "local-timestamp-micros"}
    buf = io.BytesIO()
    AC.encode(buf, local, adversarial)  # naive: fine
    with pytest.raises(ValueError, match="naive datetime"):
        AC.encode(io.BytesIO(), local, adversarial.replace(tzinfo=timezone.utc))


def test_ntz_schema_and_value_roundtrip(spark, tmp_path):
    """TIMESTAMP_NTZ <-> local-timestamp-micros, both schema and values
    (the r4 bench crashed on the missing mapping: NTZ envelope ->
    NotImplementedError before a single timing printed)."""
    from pyspark.sql.types import (
        LongType, StructField, StructType, TimestampNTZType,
    )

    st = StructType([
        StructField("id", LongType(), False),
        StructField("ts", TimestampNTZType(), True),
    ])
    avro = AC.avro_schema_of(st)
    (ts_field,) = [f for f in avro["fields"] if f["name"] == "ts"]
    assert ts_field["type"][1]["logicalType"] == "local-timestamp-micros"
    assert AC.spark_schema_of(avro) == st

    df = spark.range(100).select(
        F.col("id"),
        (
            F.to_timestamp(F.lit("2001-06-01 12:34:56.789")).cast("timestamp_ntz")
            + F.make_interval(secs=F.col("id"))
        ).alias("ts"),
    )
    path = str(tmp_path / "avro_ntz")
    write_avro(df.repartition(2), path, mode="overwrite")
    back = read_avro(spark, path)
    assert isinstance(back.schema["ts"].dataType, type(st["ts"].dataType))
    assert sorted(map(tuple, df.collect())) == sorted(map(tuple, back.collect()))


def test_spark_write_read_roundtrip(spark, tmp_path):
    df = spark.range(500).select(
        F.col("id"),
        F.concat(F.lit("name"), F.col("id")).alias("name"),
        (F.col("id") * 1.5).alias("score"),
        F.to_timestamp(F.lit("2001-06-01 12:34:56.789")).alias("ts"),
        F.to_date(F.lit("1999-12-31")).alias("d"),
    )
    path = str(tmp_path / "avro_table")
    write_avro(df.repartition(4), path, mode="overwrite")
    import os

    parts = [f for f in os.listdir(path) if f.endswith(".avro")]
    assert len(parts) == 4  # one container file per partition

    back = read_avro(spark, path)  # schema self-described from header
    assert back.schema.fieldNames() == df.schema.fieldNames()
    a = sorted(map(tuple, df.collect()))
    b = sorted(map(tuple, back.collect()))
    assert a == b
    # logical types decode to real datetime/date
    r = back.orderBy("id").first()
    assert r["ts"] == datetime(2001, 6, 1, 12, 34, 56, 789000)
    assert r["d"] == date(1999, 12, 31)


def test_avro_envelope_feeds_cdc_merge(spark, tmp_path):
    """The reference's declared flow: change events land as AVRO files,
    then replicate (README.md:168). Write an envelope batch as avro,
    read it back with the self-described schema, merge to silver."""
    from cdc_demo_spark.streaming.generator import generate_events
    from cdc_demo_spark.streaming.merge import merge_into_silver, read_silver, replay_oracle
    from tests.test_cdc_merge import envelope_df

    events = generate_events(n_keys=12, n_events=80, seed=31)
    env = envelope_df(spark, events)
    landing = str(tmp_path / "landing")
    write_avro(env.repartition(3), landing, mode="overwrite")

    back = read_avro(spark, landing)
    silver = str(tmp_path / "silver")
    merge_into_silver(spark, back, silver, "pet")
    got = {r["name"]: r.asDict() for r in read_silver(spark, silver).collect()}
    assert got == replay_oracle(events)


def test_streaming_avro_pipeline_end_to_end(spark, tmp_path):
    """A8 with the reference's PREFERRED format: Avro change files
    land, the streaming pipeline (binaryFile source + container codec)
    drains them through bronze/DLQ/silver; a second wave plus the same
    checkpoint proves exactly-once listing; a corrupt file routes to
    the DLQ instead of poisoning the stream."""
    import os

    from pyspark.sql.types import StringType, StructField, StructType

    from cdc_demo_spark.streaming.generator import generate_events
    from cdc_demo_spark.streaming.merge import read_silver, replay_oracle
    from cdc_demo_spark.streaming.pipeline import CdcPipeline
    from tests.test_cdc_merge import envelope_df

    payload = StructType(
        [StructField(c, StringType(), True)
         for c in ("name", "owner", "species", "sex", "birth", "death")]
    )
    p = CdcPipeline(spark, str(tmp_path / "cdc"), {"pet": payload}, fmt="avro")
    land = os.path.join(p.landing_dir, "pet")

    events = generate_events(n_keys=10, n_events=80, seed=41)
    half = len(events) // 2
    write_avro(envelope_df(spark, events[:half]).repartition(2), land, mode="append")
    p.run_available_now("pet")
    got1 = {r["name"]: r.asDict() for r in read_silver(spark, p.silver_dir("pet")).collect()}
    assert got1 == replay_oracle(events[:half])

    # wave 2 + one corrupt file
    write_avro(envelope_df(spark, events[half:]).repartition(2), land, mode="append")
    with open(os.path.join(land, "zz-corrupt.avro"), "wb") as f:
        f.write(b"Obj\x01garbage-not-a-container")
    p.run_available_now("pet")

    got2 = {r["name"]: r.asDict() for r in read_silver(spark, p.silver_dir("pet")).collect()}
    assert got2 == replay_oracle(events)
    dlq = spark.read.parquet(os.path.join(p.dlq_dir, "pet"))
    assert dlq.count() == 1 and "zz-corrupt" in dlq.collect()[0]["_corrupt"]
    # bronze holds exactly the good events once (no re-ingest, no dupes)
    bronze = spark.read.parquet(os.path.join(p.bronze_dir, "pet"))
    assert bronze.count() == len(events)


# ---------------------------------------------------------------------------
# Hypothesis fuzz: pure-Python codec roundtrip over adversarial values
# ---------------------------------------------------------------------------

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


def _values():
    import datetime as dt

    # naive datetimes at microsecond grain within Avro's long-micros range
    ts = st.datetimes(
        min_value=dt.datetime(1900, 1, 1),
        max_value=dt.datetime(2200, 1, 1),
    ).map(lambda d: d.replace(tzinfo=None))
    return st.fixed_dictionaries(
        {
            "s": st.one_of(st.none(), st.text(max_size=40)),  # incl. non-BMP unicode
            "n": st.one_of(
                st.none(), st.integers(min_value=-(2**63), max_value=2**63 - 1)
            ),
            "f": st.one_of(
                st.none(),
                st.floats(allow_nan=False, width=64),  # ±inf allowed
            ),
            "b": st.one_of(st.none(), st.binary(max_size=32)),
            "t": st.one_of(st.none(), ts),
            "arr": st.lists(
                st.integers(min_value=-(2**40), max_value=2**40), max_size=5
            ),
        }
    )


FUZZ_SCHEMA = {
    "type": "record",
    "name": "fuzz",
    "fields": [
        {"name": "s", "type": ["null", "string"]},
        {"name": "n", "type": ["null", "long"]},
        {"name": "f", "type": ["null", "double"]},
        {"name": "b", "type": ["null", "bytes"]},
        {"name": "t", "type": ["null", {"type": "long", "logicalType": "timestamp-micros"}]},
        {"name": "arr", "type": {"type": "array", "items": "long"}},
    ],
}


@settings(
    max_examples=50,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(recs=st.lists(_values(), min_size=0, max_size=7), deflate=st.booleans())
def test_container_roundtrip_fuzz(tmp_path_factory, recs, deflate):
    """write_container -> read_container must be the identity on every
    representable record batch — unicode astral planes, ±inf, long
    extremes, empty batches, both codecs.  (The r5 1-microsecond
    timestamp truncation bug is exactly the class this hunts: the
    fixed-fixture roundtrips happened to avoid it.)"""
    import os

    from cdc_demo_spark.sources import avro_codec as AC

    d = tmp_path_factory.mktemp("avrofuzz")
    path = os.path.join(str(d), "f.avro")
    AC.write_container(
        path, FUZZ_SCHEMA, recs, codec="deflate" if deflate else "null"
    )
    with open(path, "rb") as f:
        _, got = AC.read_container(f.read())
    # bytes come back as bytes; hypothesis binary is bytes — direct compare
    assert got == [
        {**r, "b": bytes(r["b"]) if r["b"] is not None else None} for r in recs
    ]
