"""Pure-Python Avro Object Container File codec (B4).

The reference's preferred change-file format is Avro
(/root/reference/README.md:168 "Avro is a very compact file format and
allows for fast reads"). This container ships neither the spark-avro
DataSource jar nor a Python avro library, so the engine carries its own
minimal, spec-conformant implementation of the PUBLIC Avro 1.11 spec
(container format + binary encoding):

- container: magic ``Obj\\x01`` + file-metadata map (``avro.schema``,
  ``avro.codec``) + 16-byte sync marker; then blocks of
  (record count, byte size, data, sync).
- binary encoding: zigzag-varint int/long, IEEE little-endian
  float/double, length-prefixed bytes/string, records as concatenated
  fields, unions as (branch index, value), arrays/maps as blocks.
- codecs: ``null`` and ``deflate`` (raw zlib, RFC 1951).
- logical types: timestamp-micros (long), local-timestamp-micros
  (long, for TIMESTAMP_NTZ), date (int).

Only what the CDC envelope needs is implemented (no enum/fixed,
map keys are strings per spec); unsupported schema nodes raise.

The Spark integration lives in :mod:`cdc_demo_spark.sources.formats`:
reads parallelize over files (binaryFile scan -> mapInPandas decode),
writes run per-partition via foreachPartition — nothing funnels
through the driver.
"""

from __future__ import annotations

import io
import json
import os
import struct
import zlib

from datetime import date as _date
from datetime import datetime as _datetime
from datetime import timedelta as _timedelta
from datetime import timezone as _timezone

MAGIC = b"Obj\x01"
SYNC_SIZE = 16
_EPOCH_NAIVE = _datetime(1970, 1, 1)
_EPOCH_UTC = _datetime(1970, 1, 1, tzinfo=_timezone.utc)
_EPOCH_DATE = _date(1970, 1, 1)
_MICRO = _timedelta(microseconds=1)

_PRIMITIVE_WRITERS = {}
_PRIMITIVE_READERS = {}


# --------------------------------------------------------------------------
# zigzag varint (the long encoding everything else builds on)
# --------------------------------------------------------------------------


def write_long(buf: io.BytesIO, n: int) -> None:
    n = (n << 1) ^ (n >> 63)  # zigzag
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            buf.write(bytes([b | 0x80]))
        else:
            buf.write(bytes([b]))
            return


def read_long(buf) -> int:
    shift, acc = 0, 0
    while True:
        (b,) = buf.read(1)
        acc |= (b & 0x7F) << shift
        if not b & 0x80:
            break
        shift += 7
    return (acc >> 1) ^ -(acc & 1)  # un-zigzag


# --------------------------------------------------------------------------
# schema-directed encode/decode
# --------------------------------------------------------------------------


def _norm(schema):
    """Allow shorthand 'string' for {'type': 'string'}."""
    return {"type": schema} if isinstance(schema, str) else schema


def encode(buf: io.BytesIO, schema, value) -> None:
    if isinstance(schema, list):  # union
        for i, branch in enumerate(schema):
            bt = _norm(branch)["type"]
            if (value is None) == (bt == "null"):
                write_long(buf, i)
                if bt != "null":
                    encode(buf, branch, value)
                return
        raise ValueError(f"no union branch for {value!r} in {schema}")
    schema = _norm(schema)
    t = schema["type"]
    if t == "null":
        return
    if t == "boolean":
        buf.write(b"\x01" if value else b"\x00")
    elif t in ("int", "long"):
        lt = schema.get("logicalType")
        if lt in ("timestamp-micros", "local-timestamp-micros") and not isinstance(
            value, int
        ):
            # timedelta // 1µs is EXACT integer arithmetic; the tempting
            # int(total_seconds() * 1e6) truncates 1µs low for ~1.3% of
            # values (float rounds twice) — same hazard tables.py documents
            # for the nanos cast.
            if lt == "local-timestamp-micros" and value.tzinfo is not None:
                # 'local' semantics are zone-less; Spark NTZ always hands
                # the codec naive datetimes, so a tz-aware value here is a
                # caller error — converting it to any zone's wall clock
                # would silently shift the stored value (round-5 ADVICE).
                raise ValueError(
                    "local-timestamp-micros takes a naive datetime; got "
                    f"tz-aware {value!r} — convert and strip tzinfo first"
                )
            value = (
                (value - _EPOCH_UTC) // _MICRO
                if value.tzinfo
                else (value - _EPOCH_NAIVE) // _MICRO
            )
        elif lt == "date" and not isinstance(value, int):
            value = (value - _EPOCH_DATE).days
        write_long(buf, int(value))
    elif t == "float":
        buf.write(struct.pack("<f", float(value)))
    elif t == "double":
        buf.write(struct.pack("<d", float(value)))
    elif t == "bytes":
        write_long(buf, len(value))
        buf.write(bytes(value))
    elif t == "string":
        raw = value.encode("utf-8")
        write_long(buf, len(raw))
        buf.write(raw)
    elif t == "record":
        for f in schema["fields"]:
            encode(buf, f["type"], None if value is None else value.get(f["name"]))
    elif t == "array":
        if value:
            write_long(buf, len(value))
            for item in value:
                encode(buf, schema["items"], item)
        write_long(buf, 0)
    elif t == "map":
        if value:
            write_long(buf, len(value))
            for k, v in value.items():
                encode(buf, "string", k)
                encode(buf, schema["values"], v)
        write_long(buf, 0)
    else:
        raise NotImplementedError(f"avro type {t!r}")


def decode(buf, schema):
    if isinstance(schema, list):  # union
        idx = read_long(buf)
        branch = _norm(schema[idx])
        if branch["type"] == "null":
            return None
        return decode(buf, schema[idx])
    schema = _norm(schema)
    t = schema["type"]
    if t == "null":
        return None
    if t == "boolean":
        return buf.read(1) == b"\x01"
    if t in ("int", "long"):
        n = read_long(buf)
        lt = schema.get("logicalType")
        if lt in ("timestamp-micros", "local-timestamp-micros"):
            return _EPOCH_NAIVE + _timedelta(microseconds=n)
        if lt == "date":
            return _EPOCH_DATE + _timedelta(days=n)
        return n
    if t == "float":
        return struct.unpack("<f", buf.read(4))[0]
    if t == "double":
        return struct.unpack("<d", buf.read(8))[0]
    if t == "bytes":
        return buf.read(read_long(buf))
    if t == "string":
        return buf.read(read_long(buf)).decode("utf-8")
    if t == "record":
        return {f["name"]: decode(buf, f["type"]) for f in schema["fields"]}
    if t == "array":
        out = []
        while True:
            n = read_long(buf)
            if n == 0:
                return out
            if n < 0:  # block with byte-size prefix (spec permits)
                read_long(buf)
                n = -n
            out.extend(decode(buf, schema["items"]) for _ in range(n))
    if t == "map":
        out = {}
        while True:
            n = read_long(buf)
            if n == 0:
                return out
            if n < 0:
                read_long(buf)
                n = -n
            for _ in range(n):
                k = decode(buf, "string")
                out[k] = decode(buf, schema["values"])
    raise NotImplementedError(f"avro type {t!r}")


# --------------------------------------------------------------------------
# container files
# --------------------------------------------------------------------------


def write_container(
    path: str, schema: dict, records, codec: str = "deflate", sync: bytes | None = None
) -> int:
    """Write one Avro Object Container File; returns record count."""
    if codec not in ("null", "deflate"):
        raise NotImplementedError(f"codec {codec!r}")
    sync = sync or os.urandom(SYNC_SIZE)
    n = 0
    data = io.BytesIO()
    for rec in records:
        encode(data, schema, rec)
        n += 1
    block = data.getvalue()
    if codec == "deflate":
        # raw DEFLATE (no zlib wrapper), per the Avro spec
        block = zlib.compress(block)[2:-4]
    out = io.BytesIO()
    out.write(MAGIC)
    meta = {"avro.schema": json.dumps(schema), "avro.codec": codec}
    write_long(out, len(meta))
    for k, v in meta.items():
        encode(out, "string", k)
        raw = v.encode("utf-8")
        write_long(out, len(raw))
        out.write(raw)
    write_long(out, 0)
    out.write(sync)
    if n:
        write_long(out, n)
        write_long(out, len(block))
        out.write(block)
        out.write(sync)
    with open(path, "wb") as f:
        f.write(out.getvalue())
    return n


def read_header(buf) -> tuple[dict, str, bytes]:
    """Parse magic + metadata; returns (schema, codec, sync_marker)."""
    if buf.read(4) != MAGIC:
        raise ValueError("not an Avro object container file (bad magic)")
    meta = {}
    while True:
        n = read_long(buf)
        if n == 0:
            break
        if n < 0:
            read_long(buf)
            n = -n
        for _ in range(n):
            k = decode(buf, "string")
            meta[k] = buf.read(read_long(buf))
    schema = json.loads(meta["avro.schema"].decode("utf-8"))
    codec = meta.get("avro.codec", b"null").decode("utf-8")
    return schema, codec, buf.read(SYNC_SIZE)


def read_container(data: bytes) -> tuple[dict, list]:
    """Decode a whole container file; returns (schema, records)."""
    buf = io.BytesIO(data)
    schema, codec, sync = read_header(buf)
    records = []
    while True:
        head = buf.read(1)
        if not head:
            break
        buf.seek(-1, io.SEEK_CUR)
        n = read_long(buf)
        size = read_long(buf)
        block = buf.read(size)
        if codec == "deflate":
            block = zlib.decompress(block, wbits=-15)
        elif codec != "null":
            raise NotImplementedError(f"codec {codec!r}")
        if buf.read(SYNC_SIZE) != sync:
            raise ValueError("sync marker mismatch (corrupt block)")
        bbuf = io.BytesIO(block)
        records.extend(decode(bbuf, schema) for _ in range(n))
    return schema, records


# --------------------------------------------------------------------------
# Spark <-> Avro schema translation
# --------------------------------------------------------------------------


def avro_schema_of(struct, name: str = "topLevelRecord") -> dict:
    """StructType -> Avro record schema (nullable fields as
    union[null, T]; timestamps as timestamp-micros, dates as date —
    the same mapping spark-avro documents)."""
    from pyspark.sql import types as T

    def conv(dt, field_name):
        if isinstance(dt, T.StructType):
            return avro_schema_of(dt, name=field_name)
        if isinstance(dt, T.ArrayType):
            item = conv(dt.elementType, field_name + "_item")
            return {"type": "array", "items": ["null", item] if dt.containsNull else item}
        if isinstance(dt, T.MapType):
            val = conv(dt.valueType, field_name + "_value")
            return {"type": "map", "values": ["null", val] if dt.valueContainsNull else val}
        simple = {
            T.StringType: "string",
            T.LongType: "long",
            T.IntegerType: "int",
            T.ShortType: "int",
            T.ByteType: "int",
            T.DoubleType: "double",
            T.FloatType: "float",
            T.BooleanType: "boolean",
            T.BinaryType: "bytes",
        }.get(type(dt))
        if simple:
            return simple
        if isinstance(dt, T.TimestampType):
            return {"type": "long", "logicalType": "timestamp-micros"}
        if isinstance(dt, T.TimestampNTZType):
            # Avro 1.10+ local-timestamp-micros: wall-clock micros with no
            # zone, the exact semantics of Spark's TIMESTAMP_NTZ (the r4
            # bench crashed here: NotImplementedError on an NTZ envelope).
            return {"type": "long", "logicalType": "local-timestamp-micros"}
        if isinstance(dt, T.DateType):
            return {"type": "int", "logicalType": "date"}
        raise NotImplementedError(f"no avro mapping for {dt.simpleString()}")

    fields = []
    for f in struct.fields:
        ft = conv(f.dataType, f.name)
        fields.append(
            {"name": f.name, "type": ["null", ft] if f.nullable else ft}
        )
    return {"type": "record", "name": name, "fields": fields}


def spark_schema_of(avro: dict):
    """Avro record schema -> StructType (inverse of avro_schema_of)."""
    from pyspark.sql import types as T

    def conv(node):
        if isinstance(node, list):  # union -> nullable inner type
            inner = [b for b in node if _norm(b)["type"] != "null"]
            if len(inner) != 1:
                raise NotImplementedError(f"non-simple union {node}")
            dt, _ = conv(inner[0])
            return dt, True
        node = _norm(node)
        t = node["type"]
        lt = node.get("logicalType")
        if lt == "timestamp-micros":
            return T.TimestampType(), False
        if lt == "local-timestamp-micros":
            return T.TimestampNTZType(), False
        if lt == "date":
            return T.DateType(), False
        if t == "record":
            fields = []
            for f in node["fields"]:
                dt, nullable = conv(f["type"])
                fields.append(T.StructField(f["name"], dt, nullable))
            return T.StructType(fields), False
        if t == "array":
            dt, nullable = conv(node["items"])
            return T.ArrayType(dt, nullable), False
        if t == "map":
            dt, nullable = conv(node["values"])
            return T.MapType(T.StringType(), dt, nullable), False
        simple = {
            "string": T.StringType(),
            "long": T.LongType(),
            "int": T.IntegerType(),
            "double": T.DoubleType(),
            "float": T.FloatType(),
            "boolean": T.BooleanType(),
            "bytes": T.BinaryType(),
            "null": T.NullType(),
        }.get(t)
        if simple is None:
            raise NotImplementedError(f"avro type {t!r}")
        return simple, False

    dt, _ = conv(avro)
    return dt
