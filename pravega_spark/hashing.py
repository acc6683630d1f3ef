"""Routing-key → key-space hashing.

Reference semantics: a routing key is hashed to a double in ``[0,1)`` and
the active segment whose key range ``[key_start, key_end)`` contains it
receives the event (``client/.../stream/impl/StreamSegments.java:37-52``,
``common/.../hash/HashHelper.java:117`` ``hashToRange``). The reference
uses a seeded murmur-class hash; bit-compatibility is NOT required — what
must hold is determinism, uniformity, and per-key stability, because
per-key ordering derives from "one key ↦ one segment per epoch".

We use the first 8 hex digits of ``md5(key)`` scaled by 2^32. Rationale:
``md5`` is available both in Spark (JVM-side, codegen'd) and in DuckDB,
so the oracle queries can reproduce segment assignment exactly — the
driver's correctness gate can then hash-compare segment-level results.

NULL keys hash as the EMPTY STRING on every twin (column, SQL, DuckDB,
scalar): md5(NULL) is NULL in SQL engines — a NULL hash would fall
through CASE chains to an arbitrary segment (and a NULL bucket) while
the Python twins hashed str(None)=='None', silently splitting one key
across twins. coalesce-to-'' keeps all four implementations exactly
aligned.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

TWO_32 = float(1 << 32)


def hash_to_range(key: Column | str) -> Column:
    """Spark column expression: deterministic hash of ``key`` into [0,1).

    Stays entirely JVM-side (md5/substring/conv are builtin expressions)
    so routing never leaves whole-stage codegen.
    """
    c = F.col(key) if isinstance(key, str) else key
    c = F.coalesce(c.cast("string"), F.lit(""))
    h = F.conv(F.substring(F.md5(c), 1, 8), 16, 10).cast("bigint")
    return h / F.lit(TWO_32)


def hash_to_range_sql(key_expr: str) -> str:
    """Spark-SQL text form of :func:`hash_to_range`."""
    return (
        f"(cast(conv(substring(md5(coalesce(cast({key_expr} as string), '')), 1, 8), 16, 10) as bigint)"
        " / cast(4294967296 as double))"
    )


def hash_to_range_duckdb(key_expr: str) -> str:
    """DuckDB SQL computing the identical value (oracle parity)."""
    return f"(('0x' || substr(md5(coalesce(cast({key_expr} as varchar), '')), 1, 8))::UBIGINT::DOUBLE / 4294967296.0)"


def hash_to_range_py(key: str) -> float:
    """Driver-side scalar twin (used by metadata ops & tests)."""
    import hashlib

    k = "" if key is None else str(key)
    return int(hashlib.md5(k.encode("utf-8")).hexdigest()[:8], 16) / TWO_32


def hash_to_bucket(key: Column | str, n_buckets: int) -> Column:
    """Spark column: deterministic bucket in [0, n_buckets) — same md5
    basis as :func:`hash_to_range`, so the driver can compute the same
    bucket (``bucket_for_key_py``) and point lookups prune partitions."""
    c = F.col(key) if isinstance(key, str) else key
    c = F.coalesce(c.cast("string"), F.lit(""))
    h = F.conv(F.substring(F.md5(c), 1, 8), 16, 10).cast("bigint")
    return F.pmod(h, F.lit(n_buckets)).cast("int")


def bucket_for_key_py(key: str, n_buckets: int) -> int:
    """Driver-side twin of :func:`hash_to_bucket`."""
    import hashlib

    k = "" if key is None else str(key)
    return int(hashlib.md5(k.encode("utf-8")).hexdigest()[:8], 16) % n_buckets


def segment_for_ranges(hash_col: Column, ranges: list[tuple[int, float, float]]) -> Column:
    """Map a [0,1) hash to a segment_id given active ``(segment_id,
    key_start, key_end)`` ranges — the Spark twin of
    ``SegmentSelector.getSegmentForEvent`` (SegmentSelector.java:87).

    Built as a chained CASE expression over the (small, driver-known)
    active-epoch ranges: fully codegen'd, no UDF, no shuffle.
    """
    if not ranges:
        raise ValueError("no active segments")
    ordered = sorted(ranges, key=lambda r: r[1])
    expr = F.lit(ordered[-1][0])  # last range catches hash == upper edge
    for seg_id, key_start, key_end in reversed(ordered[:-1]):
        expr = F.when(hash_col < F.lit(key_end), F.lit(seg_id)).otherwise(expr)
    return expr.cast("bigint")


def segment_for_key_py(key: str, ranges: list[tuple[int, float, float]]) -> int:
    """Driver-side scalar twin of :func:`segment_for_ranges`."""
    h = hash_to_range_py(key)
    ordered = sorted(ranges, key=lambda r: r[1])
    for seg_id, key_start, key_end in ordered:
        if key_start <= h < key_end:
            return seg_id
    return ordered[-1][0]
