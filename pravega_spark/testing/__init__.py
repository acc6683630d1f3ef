"""Test harnesses shipped with the engine (conformance fixtures)."""

from pravega_spark.testing.object_store import ObjectStoreHandler, mount_object_store

__all__ = ["ObjectStoreHandler", "mount_object_store"]
