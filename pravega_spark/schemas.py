"""Schema registry: versioned payload contracts per stream.

The reference keeps events as opaque bytes and ships typing as a
separate schema-registry project (SURVEY §1.2 — not in the repo; the
in-repo surface is the client ``Serializer``). This module provides the
engine's native equivalent so typed pipelines don't hand schemas
around out of band:

- schemas are versioned documents in the metadata store
  (``_metadata/<scope>/<stream>/schemas.json``), format ``json`` or
  ``avro``;
- backward-compatibility enforcement on register (a new version may
  add fields but not remove or retype existing ones — the registry
  project's BACKWARD mode default);
- ``read_typed`` lifts the binary payload into typed columns with the
  registered schema (from_json / from_avro), so consumers get columns
  without knowing the writer's contract.

Scale note: the lift is a JVM-side expression (from_json/from_avro in
whole-stage codegen) — schema resolution happens once on the driver.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame

from pravega_spark.errors import PravegaSparkError


class SchemaCompatibilityError(PravegaSparkError):
    pass


# StructType.json() type names (integer/long/float/double)
_ALLOWED_WIDENINGS = {
    ("integer", "long"),
    ("float", "double"),
    ("integer", "double"),
    ("long", "double"),
}


def _fields(schema_json: str) -> dict[str, str]:
    """Flatten a Spark DDL-ish JSON schema doc {name: type} (top level)."""
    doc = json.loads(schema_json)
    if isinstance(doc, dict) and doc.get("type") == "struct":
        return {f["name"]: str(f["type"]) for f in doc["fields"]}
    raise SchemaCompatibilityError("schema must be a Spark struct JSON document")


class SchemaRegistry:
    """Versioned per-stream schema store over the engine metadata."""

    def __init__(self, meta):
        self.meta = meta

    def _doc(self, scope: str, stream: str) -> dict:
        return self.meta._read(self.meta._doc_path(scope, stream, "schemas.json"), {"versions": []})

    def register(self, scope: str, stream: str, spark_schema, fmt: str = "json",
                 check_compatibility: bool = True) -> int:
        """Register a schema version; returns the new version number.

        ``spark_schema`` is a StructType (or its .json() string).
        BACKWARD compatibility: every existing field must survive with
        the same (or widened) type.
        """
        schema_json = spark_schema if isinstance(spark_schema, str) else spark_schema.json()
        if fmt not in ("json", "avro"):
            raise SchemaCompatibilityError(f"unsupported format: {fmt}")
        self.meta.get_stream(scope, stream)  # stream must exist
        doc = self._doc(scope, stream)
        new_fields = _fields(schema_json)
        if doc["versions"] and check_compatibility:
            last = doc["versions"][-1]
            old_fields = _fields(last["schema"])
            for name, typ in old_fields.items():
                if name not in new_fields:
                    raise SchemaCompatibilityError(f"field removed: {name}")
                if new_fields[name] != typ and (typ, new_fields[name]) not in _ALLOWED_WIDENINGS:
                    raise SchemaCompatibilityError(
                        f"field retyped: {name} {typ} -> {new_fields[name]}"
                    )
        version = len(doc["versions"]) + 1
        doc["versions"].append({"version": version, "format": fmt, "schema": schema_json})
        self.meta._write(self.meta._doc_path(scope, stream, "schemas.json"), doc)
        return version

    def get(self, scope: str, stream: str, version: int | None = None) -> dict:
        doc = self._doc(scope, stream)
        if not doc["versions"]:
            raise SchemaCompatibilityError(f"no schema registered for {scope}/{stream}")
        if version is None:
            return doc["versions"][-1]
        for v in doc["versions"]:
            if v["version"] == version:
                return v
        raise SchemaCompatibilityError(f"no schema version {version} for {scope}/{stream}")

    def versions(self, scope: str, stream: str) -> list[int]:
        return [v["version"] for v in self._doc(scope, stream)["versions"]]


def read_typed(store, scope: str, stream: str, version: int | None = None,
               **read_kwargs) -> DataFrame:
    """Bounded read with the payload lifted to typed columns via the
    stream's registered schema (Serializer.deserialize, engine-side)."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import StructType

    entry = SchemaRegistry(store.meta).get(scope, stream, version)
    df = store.read(scope, stream, **read_kwargs)
    schema = StructType.fromJson(json.loads(entry["schema"]))
    if entry["format"] == "json":
        lifted = F.from_json(F.col("payload").cast("string"), schema)
    else:  # avro
        from pyspark.sql.avro.functions import from_avro

        # spark's avro needs an avro-json schema; structs registered as
        # avro carry the avro schema string verbatim
        lifted = from_avro(F.col("payload"), entry["schema"])
    return df.withColumn("event", lifted).select(
        "routing_key", "segment_id", "offset", "event_time", "ingest_time", "event.*"
    )


def write_typed(store, scope: str, stream: str, df: DataFrame, routing_key_col: str,
                version: int | None = None, **write_kwargs) -> dict[int, int]:
    """Append typed rows: serialize the registered schema's columns into
    the payload (Serializer.serialize, engine-side)."""
    from pyspark.sql import functions as F

    entry = SchemaRegistry(store.meta).get(scope, stream, version)
    cols = list(_fields(entry["schema"]))
    payload = F.to_json(F.struct(*cols)).cast("binary")
    out = df.withColumn("payload", payload)
    return store.write_events(scope, stream, out, routing_key_col=routing_key_col, **write_kwargs)
