"""Avro payload serialization (reference: Serializer.java impls).

The spark-avro connector jar is absent in this environment, so
``typed_serializer`` falls back to the pure-Python spec codec
(functions/avro_codec.py) behind Arrow-batched pandas UDFs. These tests
pin the wire format to the Avro spec (known byte vectors) and prove the
DataFrame-level round trip through a stream write/read.
"""

import json

import pytest
from pyspark.sql import functions as F

from pravega_spark.functions.avro_codec import AvroSchema
from pravega_spark.functions import serializers

EV_SCHEMA = json.dumps(
    {
        "type": "record",
        "name": "Ev",
        "fields": [
            {"name": "event_id", "type": "long"},
            {"name": "event_type", "type": ["null", "string"]},
            {"name": "value", "type": "double"},
        ],
    }
)


def test_spec_byte_vectors():
    # zigzag longs straight from the Avro spec's binary-encoding table
    s = AvroSchema('"long"')
    assert s.encode(0) == b"\x00"
    assert s.encode(-1) == b"\x01"
    assert s.encode(1) == b"\x02"
    assert s.encode(-64) == b"\x7f"
    assert s.encode(64) == b"\x80\x01"
    assert AvroSchema('"string"').encode("foo") == b"\x06foo"


def test_record_round_trip_all_types():
    schema = AvroSchema(
        json.dumps(
            {
                "type": "record",
                "name": "T",
                "fields": [
                    {"name": "i", "type": "int"},
                    {"name": "l", "type": "long"},
                    {"name": "f", "type": "float"},
                    {"name": "d", "type": "double"},
                    {"name": "b", "type": "boolean"},
                    {"name": "s", "type": ["null", "string"]},
                    {"name": "raw", "type": "bytes"},
                    {"name": "arr", "type": {"type": "array", "items": "long"}},
                    {"name": "m", "type": {"type": "map", "values": "string"}},
                    {
                        "name": "nest",
                        "type": {
                            "type": "record",
                            "name": "N",
                            "fields": [{"name": "x", "type": "long"}],
                        },
                    },
                ],
            }
        )
    )
    v = {
        "i": -123456,
        "l": 1 << 40,
        "f": 1.5,
        "d": -2.25,
        "b": True,
        "s": "héllo",
        "raw": b"\x00\xff",
        "arr": [1, -2, 3],
        "m": {"k1": "v1", "k2": "v2"},
        "nest": {"x": 7},
    }
    assert schema.decode(schema.encode(v)) == v
    assert schema.decode(schema.encode({**v, "s": None}))["s"] is None


def test_unsupported_schema_rejected_at_compile():
    with pytest.raises(ValueError):
        AvroSchema(json.dumps(["string", "long"]))  # non-null union
    with pytest.raises(ValueError):
        AvroSchema(json.dumps({"type": "enum", "name": "E", "symbols": [1]}))
    with pytest.raises(ValueError):  # decimal without precision
        AvroSchema(json.dumps({"type": "bytes", "logicalType": "decimal", "scale": 2}))


def test_typed_serializer_prefers_python_avro_without_connector(spark):
    fmt, ser, de = serializers.typed_serializer(spark, EV_SCHEMA, prefer="avro")
    # with the connector absent the python codec still delivers avro
    assert fmt in ("avro", "avro-py")


def test_dataframe_avro_round_trip(spark, events):
    src = events.limit(50).select("event_id", "event_type", "value")
    fmt, ser, de = serializers.typed_serializer(spark, EV_SCHEMA, prefer="avro")
    packed = src.select(ser(F.struct("event_id", "event_type", "value")).alias("payload"))
    assert dict(packed.dtypes)["payload"] == "binary"
    unpacked = packed.select(de("payload", EV_SCHEMA).alias("data")).select("data.*")
    a = sorted(src.collect(), key=lambda r: r.event_id)
    b = sorted(unpacked.collect(), key=lambda r: r.event_id)
    assert [r.asDict() for r in a] == [r.asDict() for r in b]


def test_avro_payload_through_stream(store, events):
    """Write avro-encoded payloads into a stream, read them back typed."""
    from pravega_spark.config import ScalingPolicy, StreamConfiguration

    spark = store.spark
    store.create_scope("s")
    store.create_stream("s", "av", StreamConfiguration(scaling=ScalingPolicy.fixed(2)))
    fmt, ser, de = serializers.typed_serializer(spark, EV_SCHEMA, prefer="avro")
    staged = events.limit(40).select(
        F.col("user_id").cast("string").alias("routing_key"),
        F.col("ts").alias("event_time"),
        ser(F.struct("event_id", "event_type", "value")).alias("payload"),
    )
    store.write_events("s", "av", staged)
    got = (
        store.read("s", "av")
        .select(de("payload", EV_SCHEMA).alias("data"))
        .select("data.*")
        .orderBy("event_id")
        .collect()
    )
    want = events.limit(40).select("event_id", "event_type", "value").orderBy("event_id").collect()
    assert [r.asDict() for r in got] == [r.asDict() for r in want]


# ---------------- round 5: enum / fixed / logical types ----------------


def test_enum_fixed_byte_vectors():
    e = AvroSchema(json.dumps({"type": "enum", "name": "E", "symbols": ["A", "B", "C"]}))
    assert e.encode("C") == b"\x04"  # index 2, zigzag 4
    assert e.decode(b"\x04") == "C"
    assert e.encode("A") == b"\x00"
    f = AvroSchema(json.dumps({"type": "fixed", "name": "F", "size": 3}))
    assert f.encode(b"abc") == b"abc"  # raw bytes, no length prefix
    assert f.decode(b"abc") == b"abc"
    with pytest.raises(ValueError):
        f.encode(b"toolong")


def test_timestamp_logical_byte_vectors():
    import datetime as dt

    ms = AvroSchema(json.dumps({"type": "long", "logicalType": "timestamp-millis"}))
    # 1970-01-01T00:00:01Z = 1000 ms -> zigzag 2000 -> varint d0 0f
    assert ms.encode(dt.datetime(1970, 1, 1, 0, 0, 1)) == b"\xd0\x0f"
    assert ms.decode(b"\xd0\x0f") == dt.datetime(1970, 1, 1, 0, 0, 1)
    us = AvroSchema(json.dumps({"type": "long", "logicalType": "timestamp-micros"}))
    # 1e6 us -> zigzag 2e6 -> varint 80 89 7a
    assert us.encode(dt.datetime(1970, 1, 1, 0, 0, 1)) == b"\x80\x89\x7a"
    assert us.decode(b"\x80\x89\x7a") == dt.datetime(1970, 1, 1, 0, 0, 1)
    # aware datetimes normalize to UTC; sub-ms precision survives micros
    aware = dt.datetime(2024, 5, 1, 12, 0, 0, 123456, tzinfo=dt.timezone.utc)
    assert us.decode(us.encode(aware)) == aware.replace(tzinfo=None)
    assert ms.decode(ms.encode(aware)) == aware.replace(tzinfo=None, microsecond=123000)


def test_date_logical():
    import datetime as dt

    d = AvroSchema(json.dumps({"type": "int", "logicalType": "date"}))
    assert d.encode(dt.date(1970, 1, 1)) == b"\x00"
    assert d.encode(dt.date(1970, 1, 2)) == b"\x02"
    assert d.decode(d.encode(dt.date(2024, 2, 29))) == dt.date(2024, 2, 29)


def test_decimal_logical_byte_vectors():
    from decimal import Decimal

    b = AvroSchema(json.dumps(
        {"type": "bytes", "logicalType": "decimal", "precision": 6, "scale": 2}))
    # 123.45 -> unscaled 12345 -> BE two's-complement 30 39, length 2 (zigzag 04)
    assert b.encode(Decimal("123.45")) == b"\x04\x30\x39"
    assert b.decode(b"\x04\x30\x39") == Decimal("123.45")
    # negative: -1.00 -> -100 -> single byte 0x9c
    assert b.encode(Decimal("-1.00")) == b"\x02\x9c"
    assert b.decode(b"\x02\x9c") == Decimal("-1.00")
    fx = AvroSchema(json.dumps(
        {"type": "fixed", "name": "D", "size": 4,
         "logicalType": "decimal", "precision": 9, "scale": 2}))
    assert fx.encode(Decimal("123.45")) == b"\x00\x00\x30\x39"
    assert fx.decode(b"\x00\x00\x30\x39") == Decimal("123.45")
    assert fx.decode(fx.encode(Decimal("-123.45"))) == Decimal("-123.45")


def test_unknown_logical_type_falls_back_to_underlying():
    # spec: unknown logical types are ignored, underlying type used
    s = AvroSchema(json.dumps({"type": "string", "logicalType": "uuid-ish"}))
    assert s.decode(s.encode("x")) == "x"


def test_logical_types_through_spark(spark):
    """python_avro_codec round trip of a record carrying every new type
    as Spark-native columns (timestamp, date, decimal, string, binary)."""
    import datetime as dt
    from decimal import Decimal

    schema = json.dumps(
        {
            "type": "record",
            "name": "T",
            "fields": [
                {"name": "ts", "type": {"type": "long", "logicalType": "timestamp-micros"}},
                {"name": "day", "type": {"type": "int", "logicalType": "date"}},
                {"name": "amount", "type": {"type": "bytes", "logicalType": "decimal",
                                             "precision": 10, "scale": 2}},
                {"name": "status", "type": {"type": "enum", "name": "S",
                                             "symbols": ["OPEN", "CLOSED"]}},
                {"name": "tag", "type": {"type": "fixed", "name": "Tag", "size": 2}},
            ],
        }
    )
    ser, de = serializers.python_avro_codec(schema)
    rows = [
        (dt.datetime(2024, 5, 1, 12, 0, 0, 123456), dt.date(2024, 2, 29),
         Decimal("12345.67"), "OPEN", b"ab"),
        (dt.datetime(1999, 12, 31, 23, 59, 59), dt.date(1970, 1, 1),
         Decimal("-0.05"), "CLOSED", b"zz"),
    ]
    df = spark.createDataFrame(
        rows, "ts timestamp, day date, amount decimal(10,2), status string, tag binary"
    )
    enc = df.select(ser(F.struct("ts", "day", "amount", "status", "tag")).alias("p"))
    dec = enc.select(de("p").alias("r")).select("r.*")
    assert dict(dec.dtypes) == {
        "ts": "timestamp", "day": "date", "amount": "decimal(10,2)",
        "status": "string", "tag": "binary",
    }
    got = sorted(
        ((r["ts"], r["day"], r["amount"], r["status"], bytes(r["tag"])) for r in dec.collect()),
        key=lambda x: x[0],
    )
    assert got == sorted(rows, key=lambda x: x[0])
