"""Test harnesses shipped with the engine (conformance fixtures)."""

from pravega_spark.testing.object_store import (
    DelegatingObjectStoreHandler,
    ObjectStoreHandler,
    mount_delegating_store,
    mount_object_store,
)

__all__ = [
    "DelegatingObjectStoreHandler",
    "ObjectStoreHandler",
    "mount_delegating_store",
    "mount_object_store",
]
