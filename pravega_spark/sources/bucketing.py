"""Bucketed (co-located) table support — the shuffle-free big⋈big join.

At 100 TB the one shuffle left in TPC-H-shape plans is the
fact⋈fact join (e.g. lineitem⋈orders on orderkey — broadcast handles
every dim join, but neither fact side fits in memory). Spark's answer
is BUCKETING: both tables hash-clustered into the same number of
buckets on the join key at WRITE time; the join then reads
bucket-aligned splits and the Exchange disappears from the plan
entirely (verified by ``assert_no_exchange_join``). This is the same
idea as the stream layout itself — data pre-partitioned by key so
consumers never reshuffle — applied to derived analytical tables.

Usage::

    bucketize(spark, lineitem_df, "lineitem_b", keys=["l_orderkey"], n_buckets=64)
    bucketize(spark, orders_df,   "orders_b",   keys=["o_orderkey"], n_buckets=64)
    j = spark.table("lineitem_b").join(
            spark.table("orders_b"),
            F.col("l_orderkey") == F.col("o_orderkey"))
    # j's physical plan: two bucketed scans -> SortMergeJoin, NO Exchange

Bucket count guidance: total-table-bytes / 256 MB, identical on both
sides (Spark requires equal bucket counts for exchange elimination).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession

# Written next to the bucketed files so a later session can re-register
# the copy as an external table with the SAME bucket/sort spec the
# writer used (bucketed.py re-attach) instead of hardcoding SORTED BY.
BUCKET_SPEC_MARKER = "_PVS_BUCKET_SPEC.json"


def read_bucket_spec(location: str) -> dict | None:
    """The writer's recorded spec for a bucketed copy, or None."""
    try:
        with open(os.path.join(location, BUCKET_SPEC_MARKER)) as fh:
            return json.load(fh)
    except (OSError, ValueError):
        return None


def bucketize(
    spark: SparkSession,
    df: DataFrame,
    table_name: str,
    keys: list[str],
    n_buckets: int,
    sort: bool = True,
    overwrite: bool = True,
) -> None:
    """Persist ``df`` as a bucketed (and bucket-sorted) catalog table."""
    if overwrite:
        spark.sql(f"DROP TABLE IF EXISTS {table_name}")
    writer = df.write.format("parquet").bucketBy(n_buckets, *keys)
    if sort:
        writer = writer.sortBy(*keys)
    writer.mode("overwrite").saveAsTable(table_name)
    # record the spec the files actually have, for cross-session
    # re-attach: the DDL there must declare sortedness from THIS
    # invariant, never assume it
    try:
        loc = (
            spark.sql(f"DESCRIBE TABLE EXTENDED {table_name}")
            .filter("col_name = 'Location'")
            .collect()[0]["data_type"]
        ).removeprefix("file:")
        with open(os.path.join(loc, BUCKET_SPEC_MARKER), "w") as fh:
            json.dump({"keys": keys, "n_buckets": n_buckets, "sorted": bool(sort)}, fh)
    except Exception:
        pass  # non-local warehouse: re-attach will rebuild instead


def is_shuffle_free_join(joined: DataFrame) -> bool:
    """True iff the physical plan contains a join but no shuffle
    Exchange (broadcast exchanges are fine — they're the point)."""
    plan = joined._jdf.queryExecution().executedPlan().toString()
    lines = [ln for ln in plan.splitlines() if "Exchange" in ln]
    shuffles = [ln for ln in lines if "BroadcastExchange" not in ln]
    return ("Join" in plan) and not shuffles
