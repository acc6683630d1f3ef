"""Test-table loaders.

The driver's testdata parquet stores timestamps as TIMESTAMP(NANOS),
which Spark's vectorized reader rejects. With
``spark.sql.legacy.parquet.nanosAsLong=true`` those columns surface as
BIGINT nanoseconds; ``load_table`` converts them back to proper
timestamps (microsecond precision, matching what DuckDB produces when
casting TIMESTAMP_NS → TIMESTAMP), so Spark results hash-compare equal
to the oracle.
"""

from __future__ import annotations

import os
from functools import lru_cache

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

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


@lru_cache(maxsize=256)
def _nano_cols(path: str) -> tuple[str, ...]:
    import pyarrow.parquet as pq

    schema = pq.read_schema(path)
    out = []
    for field in schema:
        t = field.type
        if str(t).startswith("timestamp[ns"):
            out.append(field.name)
    return tuple(out)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    path = os.path.join(sf_dir, f"{name}.parquet")
    df = spark.read.parquet(path)
    for c in _nano_cols(path):
        # integer-divide nanos → micros so sub-microsecond precision is
        # truncated identically to DuckDB's TIMESTAMP_NS → TIMESTAMP cast
        # (must be integral `div`: double division loses precision at 1e18)
        df = df.withColumn(c, F.expr(f"timestamp_micros(`{c}` div 1000)"))
    return df


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every test table as a temp view (for spark.sql queries)."""
    for t in TABLES:
        if os.path.exists(os.path.join(sf_dir, f"{t}.parquet")):
            load_table(spark, sf_dir, t).createOrReplaceTempView(t)
