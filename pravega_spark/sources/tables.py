"""Test-table loaders.

The driver's testdata parquet stores timestamps as tz-less
``timestamp[us]`` (regenerated between rounds; rounds 1-2 shipped
TIMESTAMP(NANOS)).  ``load_table`` normalizes every timestamp column to
a session-time-zone TIMESTAMP (the session runs UTC) so results
hash-compare equal to the DuckDB oracle regardless of how the parquet
encodes time:

* ``timestamp_ntz`` columns (Spark >=4.1 infers these for tz-less
  parquet when ``spark.sql.parquet.inferTimestampNTZ.enabled`` is left
  at its default) are cast to TIMESTAMP — with a UTC session zone the
  wall-clock values are preserved bit-for-bit.
* BIGINT-nanos columns (the ``nanosAsLong`` compat path for
  TIMESTAMP(NANOS) data) are integer-divided to micros and rebuilt via
  ``timestamp_micros`` — truncating exactly like DuckDB's
  TIMESTAMP_NS → TIMESTAMP cast.

Both checks read only the Spark-inferred schema — no per-table parquet
footer reads.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, TimestampNTZType

from pravega_spark.session import autosize_shuffle_partitions

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Known timestamp columns in the driver's data model — the FALLBACK for
# the nanosAsLong compat case when the parquet footer can't be read
# (a TIMESTAMP(NANOS) column surfaces as plain BIGINT in the Spark
# schema, indistinguishable from a genuine integer column by type alone).
_TS_COLS = {"ts", "o_orderdate", "l_shipdate"}

# Footer-schema cache: testdata is immutable within a round, and the
# read is one driver-side footer fetch per (path) — not per query.
_FOOTER_TS: dict[str, frozenset[str]] = {}


def _footer_ts_cols(path: str) -> frozenset[str]:
    """Timestamp-typed column names straight from the parquet footer.

    Authoritative for the nanosAsLong detection: any column the footer
    declares as timestamp (any unit) but Spark surfaces as BIGINT is a
    TIMESTAMP(NANOS) compat column. Falls back to the hardcoded
    ``_TS_COLS`` if the footer is unreadable."""
    cached = _FOOTER_TS.get(path)
    if cached is not None:
        return cached
    try:
        import pyarrow as pa
        import pyarrow.parquet as pq

        target = path
        if os.path.isdir(path):
            parts = sorted(
                f for f in os.listdir(path) if f.endswith(".parquet") and not f.startswith(".")
            )
            if not parts:
                raise FileNotFoundError(f"no parquet parts under {path}")
            target = os.path.join(path, parts[0])
        schema = pq.read_schema(target)
        cols = frozenset(f.name for f in schema if pa.types.is_timestamp(f.type))
    except Exception:
        cols = frozenset(_TS_COLS)
    _FOOTER_TS[path] = cols
    return cols


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    # size AQE's initial shuffle-partition count to THIS data dir's
    # actual bytes (guide §2.1/§6): every registered query's first data
    # touch comes through here, so each query plans with input-derived
    # sizing instead of the former constant 1024 (VERDICT r11 item 1)
    autosize_shuffle_partitions(spark, sf_dir)
    path = os.path.join(sf_dir, f"{name}.parquet")
    df = spark.read.parquet(path)
    ts_cols = _footer_ts_cols(path)
    for field in df.schema.fields:
        if isinstance(field.dataType, TimestampNTZType):
            df = df.withColumn(field.name, F.col(field.name).cast("timestamp"))
        elif isinstance(field.dataType, LongType) and field.name in ts_cols:
            # integral `div` (not double /): double division loses
            # precision at 1e18-scale nanosecond values
            df = df.withColumn(field.name, F.expr(f"timestamp_micros(`{field.name}` div 1000)"))
    return df


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every test table as a temp view (for spark.sql queries)."""
    for t in TABLES:
        if os.path.exists(os.path.join(sf_dir, f"{t}.parquet")):
            load_table(spark, sf_dir, t).createOrReplaceTempView(t)
