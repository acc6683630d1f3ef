"""Schema registry: versioned contracts + typed read/write round-trip."""

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, LongType, StringType, StructField, StructType

from pravega_spark.config import ScalingPolicy, StreamConfiguration
from pravega_spark.schemas import (
    SchemaCompatibilityError,
    SchemaRegistry,
    read_typed,
    write_typed,
)

V1 = StructType([
    StructField("event_id", LongType()),
    StructField("value", DoubleType()),
])
V2 = StructType([
    StructField("event_id", LongType()),
    StructField("value", DoubleType()),
    StructField("event_type", StringType()),  # added field: backward-ok
])


def test_register_and_compat(store):
    store.create_scope("s")
    store.create_stream("s", "typed", StreamConfiguration(scaling=ScalingPolicy.fixed(2)))
    reg = SchemaRegistry(store.meta)
    assert reg.register("s", "typed", V1) == 1
    assert reg.register("s", "typed", V2) == 2
    assert reg.versions("s", "typed") == [1, 2]
    assert reg.get("s", "typed")["version"] == 2
    assert reg.get("s", "typed", 1)["version"] == 1

    removed = StructType([StructField("event_id", LongType())])
    with pytest.raises(SchemaCompatibilityError):
        reg.register("s", "typed", removed)
    retyped = StructType([
        StructField("event_id", StringType()),
        StructField("value", DoubleType()),
        StructField("event_type", StringType()),
    ])
    with pytest.raises(SchemaCompatibilityError):
        reg.register("s", "typed", retyped)
    # widening is allowed (double stays, long may widen to double)
    widened = StructType([
        StructField("event_id", DoubleType()),
        StructField("value", DoubleType()),
        StructField("event_type", StringType()),
    ])
    assert reg.register("s", "typed", widened) == 3


def test_typed_roundtrip(store, events):
    store.create_scope("s")
    store.create_stream("s", "typed", StreamConfiguration(scaling=ScalingPolicy.fixed(2)))
    SchemaRegistry(store.meta).register("s", "typed", V2)
    src = events.orderBy("event_id").limit(80).select(
        "event_id", "value", "event_type",
        F.col("user_id").cast("string").alias("rk"),
        F.col("ts").alias("event_time"),
    )
    write_typed(store, "s", "typed", src, routing_key_col="rk", event_time_col="event_time")
    back = read_typed(store, "s", "typed")
    assert set(back.columns) == {
        "routing_key", "segment_id", "offset", "event_time", "ingest_time",
        "event_id", "value", "event_type",
    }
    want = {(r["event_id"], r["event_type"]) for r in src.collect()}
    got = {(r["event_id"], r["event_type"]) for r in back.collect()}
    assert got == want
    # values survive float round-trip
    tot = back.agg(F.round(F.sum("value"), 4).alias("s")).collect()[0]["s"]
    want_tot = src.agg(F.round(F.sum("value"), 4).alias("s")).collect()[0]["s"]
    assert abs(tot - want_tot) < 1e-6
