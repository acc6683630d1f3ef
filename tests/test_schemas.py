"""Schema registry: versioned contracts + typed read/write round-trip."""

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, FloatType, IntegerType, LongType, StringType, StructField, StructType

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
    # widening is allowed under BACKWARD (a new, wider reader resolves
    # old int/long data); under the default FULL it is rejected, because
    # readers pinned to the old version couldn't take the wide values
    widened = StructType([
        StructField("event_id", DoubleType()),
        StructField("value", DoubleType()),
        StructField("event_type", StringType()),
    ])
    with pytest.raises(SchemaCompatibilityError):
        reg.register("s", "typed", widened)
    reg.set_compatibility("s", "typed", "BACKWARD")
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


def _st(*fields):
    return StructType([StructField(n, t, nullable) for n, t, nullable in fields])


def test_compatibility_mode_matrix(store):
    """Accept/reject per mode for the canonical transitions: add
    nullable, add non-nullable, remove, widen, retype. Mirrors the
    registry project's mode semantics on our field model."""
    store.create_scope("s")
    reg = SchemaRegistry(store.meta)
    base = _st(("a", LongType(), True), ("b", DoubleType(), True))
    add_nullable = _st(("a", LongType(), True), ("b", DoubleType(), True),
                       ("c", StringType(), True))
    add_required = _st(("a", LongType(), True), ("b", DoubleType(), True),
                       ("c", StringType(), False))
    removed = _st(("a", LongType(), True))
    widened = _st(("a", DoubleType(), True), ("b", DoubleType(), True))
    retyped = _st(("a", StringType(), True), ("b", DoubleType(), True))
    # NARROWING (long->integer, double->float): a narrowed NEW READER
    # over old wide data silently NULLs/overflows — rejected under
    # BACKWARD/FULL. A narrowed NEW WRITER is Avro-legal under FORWARD:
    # old readers promote writer-int -> reader-long (r8 ADVICE fix).
    narrowed = _st(("a", IntegerType(), True), ("b", DoubleType(), True))
    narrowed2 = _st(("a", LongType(), True), ("b", FloatType(), True))
    cases = {
        # mode: (accepted, rejected)
        # widening is BACKWARD-only: the FORWARD direction pins old
        # readers, which cannot take a widened writer's values (r7
        # ADVICE fix — the registry reference rejects widening under
        # FORWARD/FULL the same way); symmetrically, narrowing is
        # FORWARD-only (promotion always resolves writer->reader)
        "BACKWARD": ([add_nullable, removed, widened],
                     [add_required, retyped, narrowed, narrowed2]),
        "FORWARD": ([add_nullable, add_required, narrowed, narrowed2],
                    [removed, retyped, widened]),
        "FULL": ([add_nullable],
                 [add_required, removed, retyped, narrowed, narrowed2, widened]),
        "NONE": ([add_nullable, add_required, removed, widened, retyped,
                  narrowed, narrowed2], []),
    }
    i = 0
    for mode, (ok, bad) in cases.items():
        for nxt in ok + bad:
            i += 1
            stream = f"m{i}"
            store.create_stream(
                "s", stream, StreamConfiguration(scaling=ScalingPolicy.fixed(1))
            )
            reg.set_compatibility("s", stream, mode)
            assert reg.get_compatibility("s", stream) == mode
            assert reg.register("s", stream, base) == 1
            if nxt in ok:
                assert reg.register("s", stream, nxt) == 2, (mode, "should accept")
            else:
                with pytest.raises(SchemaCompatibilityError):
                    reg.register("s", stream, nxt)


def test_compatibility_transitive(store):
    """_TRANSITIVE checks against EVERY version: a change acceptable
    vs the latest but not vs an ancestor is rejected."""
    store.create_scope("s")
    store.create_stream("s", "t", StreamConfiguration(scaling=ScalingPolicy.fixed(1)))
    reg = SchemaRegistry(store.meta)
    reg.set_compatibility("s", "t", "BACKWARD")
    v1 = _st(("a", LongType(), True), ("b", DoubleType(), True))
    v2 = _st(("a", LongType(), True))          # BACKWARD: removal ok
    assert reg.register("s", "t", v1) == 1
    assert reg.register("s", "t", v2) == 2
    # re-adding b as a STRING is backward-ok vs v2 (b absent there) but
    # retypes it vs v1 — plain BACKWARD accepts, TRANSITIVE must reject
    v3 = _st(("a", LongType(), True), ("b", StringType(), True))
    assert reg.register("s", "t", v3) == 3
    reg.set_compatibility("s", "t", "BACKWARD_TRANSITIVE")
    with pytest.raises(SchemaCompatibilityError):
        reg.register("s", "t", v3)
    # default mode is FULL when none configured
    store.create_stream("s", "d", StreamConfiguration(scaling=ScalingPolicy.fixed(1)))
    assert reg.get_compatibility("s", "d") == "FULL"
