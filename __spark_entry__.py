"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship smoke query at sf0.001.
``queries()`` — every implemented operator (SURVEY.md §2 + the
LLM-pipeline layer) as (spark, sf_dir) -> DataFrame callables.
``oracle_sql()`` — DuckDB twins for the correctness gate.

Implementations live in ``pravega_spark/queries/``; the stream-store
engine itself (write/read/txn/scale/retention/KVT/state) lives in
``pravega_spark/`` and is exercised by ``tests/``.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pravega_spark.queries import oracle_sql as _oracle_sql
from pravega_spark.queries import queries as _queries


def _apply_session_confs(spark: SparkSession) -> None:
    """Confs the engine needs on driver-built sessions.

    The driver constructs its own SparkSession, so the defaults from
    ``pravega_spark.session.get_spark`` don't apply; set the
    correctness-critical subset here before any parquet read.
    """
    # tz-less timestamp[us] testdata must read as session-tz TIMESTAMP,
    # not TIMESTAMP_NTZ (Spark >=4.1 default inference) — NTZ forbids
    # numeric casts and diverges from the DuckDB oracle
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    # compat for TIMESTAMP(NANOS) testdata (rounds 1-2 encoding)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    _apply_session_confs(spark)
    from pravega_spark.queries.relational import q1_pricing_summary

    return q1_pricing_summary(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    out = {}
    for name, fn in _queries().items():
        def wrapped(spark: SparkSession, sf_dir: str, _fn=fn) -> DataFrame:
            _apply_session_confs(spark)
            return _fn(spark, sf_dir)

        out[name] = wrapped
    return out


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each query."""
    return _oracle_sql()
