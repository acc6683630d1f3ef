"""Schema registry: versioned payload contracts per stream.

The reference keeps events as opaque bytes and ships typing as a
separate schema-registry project (SURVEY §1.2 — not in the repo; the
in-repo surface is the client ``Serializer``). This module provides the
engine's native equivalent so typed pipelines don't hand schemas
around out of band:

- schemas are versioned documents in the metadata store
  (``_metadata/<scope>/<stream>/schemas.json``), format ``json`` or
  ``avro``;
- compatibility enforcement on register with the registry project's
  full mode matrix (NONE / BACKWARD / FORWARD / FULL and their
  _TRANSITIVE variants; default FULL: a new version may add nullable
  fields and widen numeric types, but not remove or retype fields);
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


# StructType.json() type names (integer/long/float/double), as
# (writer, reader) pairs in the ONE direction Avro resolves: a reader
# may be wider than the writer (writer int -> reader long), never the
# reverse — avro readers pinned to an old version via get(version)
# cannot take a widened writer's out-of-range values, so the FORWARD
# direction requires exact equality (see _can_read).
_ALLOWED_WIDENINGS = {
    ("integer", "long"),
    ("float", "double"),
    ("integer", "double"),
    ("long", "double"),
}

COMPATIBILITY_MODES = (
    "NONE",
    "BACKWARD",
    "FORWARD",
    "FULL",
    "BACKWARD_TRANSITIVE",
    "FORWARD_TRANSITIVE",
    "FULL_TRANSITIVE",
)
DEFAULT_COMPATIBILITY = "FULL"


def _fields(schema_json: str) -> dict[str, str]:
    """Flatten a Spark DDL-ish JSON schema doc {name: type} (top level)."""
    doc = json.loads(schema_json)
    if isinstance(doc, dict) and doc.get("type") == "struct":
        return {f["name"]: str(f["type"]) for f in doc["fields"]}
    raise SchemaCompatibilityError("schema must be a Spark struct JSON document")


def _fields_nullable(schema_json: str) -> dict[str, tuple[str, bool]]:
    """{name: (type, nullable)} for the compatibility checks."""
    doc = json.loads(schema_json)
    if isinstance(doc, dict) and doc.get("type") == "struct":
        return {
            f["name"]: (str(f["type"]), bool(f.get("nullable", True)))
            for f in doc["fields"]
        }
    raise SchemaCompatibilityError("schema must be a Spark struct JSON document")


def _type_ok(t_writer: str, t_reader: str) -> bool:
    """True when a reader on ``t_reader`` can decode ``t_writer`` data:
    equal, or a promotion in the direction Avro actually resolves —
    writer-int -> reader-long / writer-float -> reader-double. Used in
    BOTH compatibility directions (resolution is always writer->reader;
    only which side is "new" flips): under FORWARD this admits a
    narrowed new writer while still rejecting a widened one, whose
    values a pinned old reader could not take."""
    return t_writer == t_reader or (t_writer, t_reader) in _ALLOWED_WIDENINGS


def _can_read(reader_json: str, writer_json: str, absent_ok_if_nullable: bool,
              new_is_reader: bool = True) -> str | None:
    """None if a consumer on ``reader_json`` can decode payloads written
    with ``writer_json``; else a human-readable reason.

    A reader field must be present in the writer schema with a readable
    type. A reader field ABSENT from the writer is tolerated only when
    ``absent_ok_if_nullable`` and the field is nullable (it lifts to
    NULL — from_json semantics): right for the BACKWARD direction,
    where a NEW nullable field simply reads null over old data; wrong
    for FORWARD, where a REMOVED field would strand existing consumers
    (their schema's nullability describes their data, not their needs).
    Extra writer fields are ignored (the reader never selects them).
    """
    writer = _fields_nullable(writer_json)
    for name, (t_r, nullable) in _fields_nullable(reader_json).items():
        if name in writer:
            t_w = writer[name][0]
            # Avro resolution always runs writer->reader, whichever
            # side is "new": BACKWARD lets the new reader widen over an
            # old writer (writer-int -> reader-long), and FORWARD
            # symmetrically admits a NARROWED new writer whose values a
            # pinned old reader promotes up (writer-int -> reader-long
            # again — the roles flip, the direction doesn't). What
            # FORWARD must reject is a WIDENED new writer (int -> long)
            # handing an old int reader out-of-range values — and
            # _type_ok(t_w, t_r) rejects exactly that, since widenings
            # are only allowed writer-narrow -> reader-wide.
            ok = _type_ok(t_w, t_r)
            if not ok:
                return f"field retyped: {name} {t_w} -> {t_r}" if new_is_reader else (
                    f"field retyped: {name} {t_r} -> {t_w}"
                )
        elif absent_ok_if_nullable and nullable:
            continue
        else:
            return f"field removed or added non-nullable: {name}"
    return None


def _check_compat(mode: str, new_json: str, prior: list[str]) -> None:
    """Raise unless ``new_json`` is admissible after ``prior`` versions
    (oldest first) under ``mode``:

    - BACKWARD: consumers on the NEW schema can read data written with
      the previous schema (fields may be dropped; additions must be
      nullable).
    - FORWARD: consumers on the PREVIOUS schema can read data written
      with the new one (fields may be added freely; removals break old
      consumers and are rejected).
    - FULL: both. _TRANSITIVE variants check against every registered
      version, not just the latest.
    """
    if mode == "NONE" or not prior:
        return
    base = mode.removesuffix("_TRANSITIVE")
    against = prior if mode.endswith("_TRANSITIVE") else prior[-1:]
    for i, old_json in enumerate(against):
        ver_note = "" if len(against) == 1 else f" (vs version {i + 1})"
        if base in ("BACKWARD", "FULL"):
            reason = _can_read(new_json, old_json, absent_ok_if_nullable=True, new_is_reader=True)
            if reason:
                raise SchemaCompatibilityError(f"{mode}: new reader breaks: {reason}{ver_note}")
        if base in ("FORWARD", "FULL"):
            reason = _can_read(old_json, new_json, absent_ok_if_nullable=False, new_is_reader=False)
            if reason:
                raise SchemaCompatibilityError(f"{mode}: old readers break: {reason}{ver_note}")


class SchemaRegistry:
    """Versioned per-stream schema store over the engine metadata."""

    def __init__(self, meta):
        self.meta = meta

    def _doc(self, scope: str, stream: str) -> dict:
        return self.meta._read(self.meta._doc_path(scope, stream, "schemas.json"), {"versions": []})

    def set_compatibility(self, scope: str, stream: str, mode: str) -> None:
        """Set the stream's compatibility mode (one of
        COMPATIBILITY_MODES); applies to subsequent register() calls."""
        mode = mode.upper()
        if mode not in COMPATIBILITY_MODES:
            raise SchemaCompatibilityError(
                f"unknown compatibility mode {mode!r}; one of {COMPATIBILITY_MODES}"
            )
        self.meta.get_stream(scope, stream)  # stream must exist
        doc = self._doc(scope, stream)
        doc["compatibility"] = mode
        self.meta._write(self.meta._doc_path(scope, stream, "schemas.json"), doc)

    def get_compatibility(self, scope: str, stream: str) -> str:
        return self._doc(scope, stream).get("compatibility", DEFAULT_COMPATIBILITY)

    def register(self, scope: str, stream: str, spark_schema, fmt: str = "json",
                 check_compatibility: bool = True, mode: str | None = None) -> int:
        """Register a schema version; returns the new version number.

        ``spark_schema`` is a StructType (or its .json() string). The
        compatibility mode is, in order: ``mode`` argument, the
        stream's configured mode (set_compatibility), DEFAULT (FULL).
        ``check_compatibility=False`` is shorthand for NONE.
        """
        schema_json = spark_schema if isinstance(spark_schema, str) else spark_schema.json()
        if fmt not in ("json", "avro"):
            raise SchemaCompatibilityError(f"unsupported format: {fmt}")
        _fields(schema_json)  # validate the document shape up front
        self.meta.get_stream(scope, stream)  # stream must exist
        doc = self._doc(scope, stream)
        eff = "NONE" if not check_compatibility else (
            (mode or doc.get("compatibility", DEFAULT_COMPATIBILITY)).upper()
        )
        if eff not in COMPATIBILITY_MODES:
            raise SchemaCompatibilityError(
                f"unknown compatibility mode {eff!r}; one of {COMPATIBILITY_MODES}"
            )
        _check_compat(eff, schema_json, [v["schema"] for v in doc["versions"]])
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
