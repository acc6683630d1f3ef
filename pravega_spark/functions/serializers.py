"""Serializers: lift opaque event payloads into typed columns and back.

Reference: events are bytes; ``Serializer<T>`` (client/.../stream/
Serializer.java) is the only typed surface, with shipped impls
JavaSerializer / ByteArraySerializer / ByteBufferSerializer /
UTF8StringSerializer (client/.../stream/impl/). The Spark-native twin
is columnar: serializers are column expressions applied at read/write —
they compose with any query and stay JVM-side.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


# ---------------- byte/str (ByteArraySerializer / UTF8StringSerializer)
def utf8_serialize(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("string").cast("binary")


def utf8_deserialize(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("string")


# ---------------- JSON event serializer (the common typed path)
def json_serialize(*cols: str) -> Column:
    """Pack columns into a JSON payload (writer side)."""
    return F.to_json(F.struct(*cols)).cast("binary")


def json_deserialize(payload: Column | str, schema: StructType | str) -> Column:
    """Lift a JSON payload into a struct column (reader side)."""
    c = F.col(payload) if isinstance(payload, str) else payload
    return F.from_json(c.cast("string"), schema)


def lift_json(df: DataFrame, schema: StructType | str, payload_col: str = "payload") -> DataFrame:
    """events DataFrame → envelope + typed columns (select ``data.*``)."""
    return df.withColumn("data", json_deserialize(payload_col, schema)).select("*", "data.*").drop("data")


# ---------------- Avro (gated: the spark-avro CONNECTOR jar may be absent)
# Note the failure mode: ``pyspark.sql.avro.functions`` always imports
# (it's part of pyspark), but without the spark-avro connector on the
# session classpath the expression fails at ANALYSIS time
# (AVRO_NOT_LOADED_SQL_FUNCTIONS_UNUSABLE). avro_available() probes the
# JVM up front so callers get a decision, not a deferred blow-up.


def avro_available(spark) -> bool:
    """True iff the spark-avro connector classes are on the classpath."""
    try:
        spark._jvm.java.lang.Class.forName("org.apache.spark.sql.avro.AvroDataToCatalyst")
        return True
    except Exception:
        return False


def avro_deserialize(payload: Column | str, json_schema: str) -> Column:
    from pyspark.sql.avro.functions import from_avro

    c = F.col(payload) if isinstance(payload, str) else payload
    return from_avro(c, json_schema)


def avro_serialize(col: Column | str) -> Column:
    from pyspark.sql.avro.functions import to_avro

    c = F.col(col) if isinstance(col, str) else col
    return to_avro(c)


def typed_serializer(spark, schema: StructType | str, prefer: str = "avro"):
    """Best available typed payload codec: ``(format, ser_fn, de_fn)``.

    The reference ships Serializer impls per format and callers pick one
    (Serializer.java); here the engine degrades gracefully — if the
    spark-avro connector isn't loaded, the JSON codec (always present,
    same struct-in/struct-out contract, self-describing payloads) is
    returned instead of an analysis-time failure. ``format`` tells the
    caller which wire format their payloads actually carry.
    """
    if prefer == "avro" and avro_available(spark):
        return (
            "avro",
            lambda struct_col: avro_serialize(struct_col),
            lambda payload, json_schema: avro_deserialize(payload, json_schema),
        )
    return (
        "json",
        lambda struct_col: F.to_json(struct_col).cast("binary"),
        lambda payload, _schema=None, __s=schema: json_deserialize(payload, __s),
    )
