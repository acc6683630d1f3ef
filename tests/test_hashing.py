"""Routing-hash determinism + parity across Spark / DuckDB / Python.

Mirrors the reference's StreamSegmentsTest / SegmentSelectorTest intent:
a key always lands in exactly one active segment and assignment is
stable (client/.../stream/impl/StreamSegmentsTest.java).
"""

import duckdb
import pytest
from pyspark.sql import functions as F

from pravega_spark.hashing import (
    hash_to_range,
    hash_to_range_duckdb,
    hash_to_range_py,
    hash_to_range_sql,
    segment_for_key_py,
    segment_for_ranges,
)


def test_three_way_parity(spark):
    keys = [str(i) for i in range(200)] + ["", "a", "äöü", "key with spaces"]
    sdf = spark.createDataFrame([(k,) for k in keys], "k string")
    got = {r["k"]: float(r["h"]) for r in sdf.selectExpr("k", hash_to_range_sql("k") + " as h").collect()}
    got_col = {
        r["k"]: float(r["h"]) for r in sdf.select("k", hash_to_range(F.col("k")).alias("h")).collect()
    }
    duck = {
        r[0]: float(r[1])
        for r in duckdb.sql(
            "select k, "
            + hash_to_range_duckdb("k")
            + " as h from (select unnest(["
            + ",".join(f"'{k}'" for k in keys)
            + "]) as k)"
        ).fetchall()
    }
    for k in keys:
        py = hash_to_range_py(k)
        assert 0.0 <= py < 1.0
        assert got[k] == pytest.approx(py, abs=1e-12)
        assert got_col[k] == pytest.approx(py, abs=1e-12)
        assert duck[k] == pytest.approx(py, abs=1e-12)


def test_segment_for_ranges_matches_python(spark):
    ranges = [(0, 0.0, 0.25), (1, 0.25, 0.5), (7, 0.5, 1.0)]
    keys = [str(i) for i in range(500)]
    sdf = spark.createDataFrame([(k,) for k in keys], "k string")
    got = {
        r["k"]: r["s"]
        for r in sdf.select("k", segment_for_ranges(hash_to_range(F.col("k")), ranges).alias("s")).collect()
    }
    for k in keys:
        assert got[k] == segment_for_key_py(k, ranges)


def test_uniformity(spark):
    # 8 equal ranges over 10k keys: each segment gets 8-17% of keys
    ranges = [(i, i / 8, (i + 1) / 8) for i in range(8)]
    keys = [(str(i),) for i in range(10_000)]
    sdf = spark.createDataFrame(keys, "k string")
    counts = {
        r["s"]: r["n"]
        for r in sdf.select(segment_for_ranges(hash_to_range(F.col("k")), ranges).alias("s"))
        .groupBy("s")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert set(counts) == set(range(8))
    for n in counts.values():
        assert 800 < n < 1700
