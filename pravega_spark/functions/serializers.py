"""Serializers: lift opaque event payloads into typed columns and back.

Reference: events are bytes; ``Serializer<T>`` (client/.../stream/
Serializer.java) is the only typed surface, with shipped impls
JavaSerializer / ByteArraySerializer / ByteBufferSerializer /
UTF8StringSerializer (client/.../stream/impl/). The Spark-native twin
is columnar: serializers are column expressions applied at read/write —
they compose with any query and stay JVM-side.
"""

from __future__ import annotations

import json

import pandas as pd

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


# ---------------- Python Avro fallback (spec codec, Arrow-batched)
_AVRO_TO_SPARK = {
    "null": "void",
    "boolean": "boolean",
    "int": "int",
    "long": "long",
    "float": "float",
    "double": "double",
    "bytes": "binary",
    "string": "string",
}


def _avro_to_spark_type(s):
    """Avro schema (parsed JSON) → Spark DDL type string."""
    if isinstance(s, str):
        return _AVRO_TO_SPARK[s]
    if isinstance(s, list):  # nullable union — Spark fields are nullable anyway
        return _avro_to_spark_type(next(b for b in s if b != "null"))
    t = s["type"]
    lt = s.get("logicalType")
    if lt in ("timestamp-millis", "timestamp-micros") and t == "long":
        return "timestamp"
    if lt == "date" and t == "int":
        return "date"
    if lt == "decimal" and t in ("bytes", "fixed"):
        return f"decimal({s['precision']},{s.get('scale', 0)})"
    if t == "record":
        inner = ", ".join(f"`{f['name']}` {_avro_to_spark_type(f['type'])}" for f in s["fields"])
        return f"struct<{inner}>"
    if t == "array":
        return f"array<{_avro_to_spark_type(s['items'])}>"
    if t == "map":
        return f"map<string, {_avro_to_spark_type(s['values'])}>"
    if t == "enum":
        return "string"
    if t == "fixed":
        return "binary"
    return _avro_to_spark_type(t)


def python_avro_codec(avro_json_schema: str):
    """``(ser_fn, de_fn)`` over the pure-Python spec codec
    (functions/avro_codec.py), Arrow-batched via pandas UDFs — the
    wire format stays real Avro binary even without the spark-avro
    connector jar, so payloads interop with JVM producers/consumers."""
    import json as _json

    from pyspark.sql.functions import pandas_udf

    from pravega_spark.functions.avro_codec import AvroSchema

    parsed = _json.loads(avro_json_schema)
    if not (isinstance(parsed, dict) and parsed.get("type") == "record"):
        # the UDF pair is struct-in/struct-out; payload events are records
        raise ValueError("python_avro_codec needs a top-level record schema")
    AvroSchema(avro_json_schema)  # validate the full schema up front
    spark_ddl = _avro_to_spark_type(parsed)
    field_names = [f["name"] for f in parsed["fields"]]

    def _is_null(v) -> bool:
        # scalar null under Arrow/pandas: None, float NaN, or NaT —
        # a null timestamp field arrives as pd.NaT, not None
        return v is None or (isinstance(v, float) and v != v) or v is pd.NaT

    # one compiled codec per worker PROCESS: recompiling (json parse +
    # recursive schema _check) per Arrow batch is constant work repeated
    # thousands of times on a large scan
    _codec_box: dict = {}

    def _codec() -> AvroSchema:
        c = _codec_box.get("c")
        if c is None:
            c = _codec_box["c"] = AvroSchema(avro_json_schema)
        return c

    @pandas_udf("binary")
    def _enc(structs: pd.Series) -> pd.Series:
        # a struct column arrives as a pd.DataFrame (one column per
        # field) under Arrow; older paths hand a Series of dicts —
        # normalize to records either way. Null struct rows (None, or
        # the all-NaN row a null struct becomes under pandas) encode as
        # null payload, and PER-FIELD NaN/NaT normalize to None so a
        # nullable-union field takes its null branch instead of
        # crashing the codec on int(NaN) / _to_epoch(NaT).
        codec = _codec()
        recs = structs.to_dict("records") if isinstance(structs, pd.DataFrame) else list(structs)
        out = []
        for r in recs:
            if r is None or (isinstance(r, dict) and all(_is_null(v) for v in r.values())):
                out.append(None)
            else:
                if isinstance(r, dict):
                    r = {k: (None if _is_null(v) else v) for k, v in r.items()}
                out.append(codec.encode(r))
        return pd.Series(out, dtype=object)

    @pandas_udf(spark_ddl)
    def _dec(payload: pd.Series) -> pd.DataFrame:
        # null payloads (the envelope's payload column is nullable)
        # yield a null-fields row rather than failing the whole query
        codec = _codec()
        if payload.empty:
            return pd.DataFrame({n: pd.Series(dtype=object) for n in field_names})
        null_row = {n: None for n in field_names}
        return pd.DataFrame(
            [null_row if _is_null(b) else codec.decode(bytes(b)) for b in payload]
        )

    def ser(struct_col: Column | str) -> Column:
        c = F.col(struct_col) if isinstance(struct_col, str) else struct_col
        return _enc(c)

    def de(payload: Column | str, _json_schema: str | None = None) -> Column:
        c = F.col(payload) if isinstance(payload, str) else payload
        return _dec(c)

    return ser, de


def typed_serializer(spark, schema: StructType | str, prefer: str = "avro"):
    """Best available typed payload codec: ``(format, ser_fn, de_fn)``.

    The reference ships Serializer impls per format and callers pick one
    (Serializer.java); here the engine picks the best wire format
    available: the JVM spark-avro connector when its jar is on the
    classpath (``"avro"``, whole-stage-codegen fast path), else — when
    ``schema`` is an Avro JSON schema the spec codec supports — the
    pure-Python Avro binary codec behind Arrow-batched pandas UDFs
    (``"avro-py"``, identical bytes on the wire), else the JSON codec
    (always present, self-describing). ``format`` tells the caller which
    wire format their payloads actually carry.
    """
    if prefer == "avro" and avro_available(spark):
        return (
            "avro",
            lambda struct_col: avro_serialize(struct_col),
            lambda payload, json_schema: avro_deserialize(payload, json_schema),
        )
    if prefer == "avro" and isinstance(schema, str):
        try:
            ser, de = python_avro_codec(schema)
            return ("avro-py", ser, de)
        except (ValueError, KeyError):
            pass  # not an Avro schema / unsupported subset → JSON
    json_schema = schema
    if isinstance(schema, str):
        # the Avro JSON document is NOT a from_json schema: when the
        # degradation path fires (codec rejected the schema), derive a
        # Spark DDL from the Avro doc so the returned deserializer
        # actually works; a non-JSON string is already a DDL
        try:
            parsed = json.loads(schema)
            if isinstance(parsed, dict) and parsed.get("type") == "record":
                json_schema = _avro_to_spark_type(parsed)
        except ValueError:
            pass  # plain DDL string
    return (
        "json",
        lambda struct_col: F.to_json(struct_col).cast("binary"),
        lambda payload, _schema=None, __s=json_schema: json_deserialize(payload, __s),
    )
