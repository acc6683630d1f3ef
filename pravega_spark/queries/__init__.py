"""Query registry: every operator exposed to the driver's correctness gate.

Each entry pairs a Spark implementation ``(spark, sf_dir) -> DataFrame``
with (where SQL-expressible) an ANSI-SQL oracle string DuckDB runs on the
same parquet tables. Column names are aliased identically on both sides
because the driver sorts columns by name before value-hashing.

Numeric outputs are rounded (or decimal-cast) in BOTH engines so that
floating-point summation-order differences between Spark and DuckDB
cannot flip the hash.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from pravega_spark.queries import multimodal, relational, similarity, stream_ops, text

_MODULES = (relational, stream_ops, text, similarity, multimodal)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for m in _MODULES:
        out.update(m.QUERIES)
    return out


def oracle_sql() -> dict[str, str]:
    out: dict[str, str] = {}
    for m in _MODULES:
        out.update(m.ORACLES)
    return out
