"""SQL surface: streams and KVTs as Spark SQL views.

The reference has no SQL (SURVEY §2.12); this is part of the net-new
analytics layer — one call makes a scope queryable with plain
``spark.sql``:

    attach_scope(store, "prod")
    spark.sql("SELECT routing_key, count(*) FROM prod_clicks GROUP BY 1")

View names are ``<scope>_<stream>`` (and ``<scope>_<kvt>_kv`` for
key-value-table snapshots). Views are plain Catalyst plans over the
manifest-pruned read path, so predicate pushdown / partition pruning
apply as usual; a registered schema (schemas.py) lifts the payload into
typed columns automatically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from pravega_spark.schemas import SchemaCompatibilityError, read_typed


def attach_stream(store, scope: str, stream: str, view: str | None = None) -> str:
    """Register one stream as a temp view; typed if a schema is registered."""
    name = view or f"{scope}_{stream}"
    try:
        df: DataFrame = read_typed(store, scope, stream)
    except SchemaCompatibilityError:
        df = store.read(scope, stream)
    df.createOrReplaceTempView(name)
    return name


def attach_kvt(spark, root: str, scope: str, table: str, view: str | None = None) -> str:
    """Register a KVT's latest-version snapshot as a temp view."""
    from pravega_spark.kvt import KeyValueTableManager

    name = view or f"{scope}_{table}_kv"
    KeyValueTableManager(spark, root).open(scope, table).snapshot().createOrReplaceTempView(name)
    return name


def attach_scope(store, scope: str) -> list[str]:
    """Register every stream in a scope; returns the view names."""
    return [attach_stream(store, scope, s) for s in store.list_streams(scope)]
