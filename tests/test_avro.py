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
        AvroSchema(json.dumps({"type": "enum", "name": "E", "symbols": ["A"]}))
    with pytest.raises(ValueError):
        AvroSchema(json.dumps(["string", "long"]))  # non-null union


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
