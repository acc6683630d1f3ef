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


# ---------------- Avro (gated: spark-avro jar may be absent locally)
def avro_deserialize(payload: Column | str, json_schema: str) -> Column:
    try:
        from pyspark.sql.avro.functions import from_avro
    except ImportError as e:  # pragma: no cover
        raise NotImplementedError("spark-avro not on classpath in this build") from e
    c = F.col(payload) if isinstance(payload, str) else payload
    return from_avro(c, json_schema)


def avro_serialize(col: Column | str) -> Column:
    try:
        from pyspark.sql.avro.functions import to_avro
    except ImportError as e:  # pragma: no cover
        raise NotImplementedError("spark-avro not on classpath in this build") from e
    c = F.col(col) if isinstance(col, str) else col
    return to_avro(c)
