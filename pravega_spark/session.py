"""SparkSession factory tuned for the engine.

Local testing runs on ``local[N]`` but every default here is chosen to
also be the right default on a large cluster: AQE for runtime re-planning
(skew joins, partition coalescing), Arrow for the Python boundary, UTC
session time zone so results compare bit-for-bit against the DuckDB
oracle, and shuffle partitions sized by environment rather than the
Spark default of 200.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "pravega_spark", shuffle_partitions: int | None = None) -> SparkSession:
    """Build (or reuse) the engine's SparkSession.

    ``SPARK_GRAFT_CPUS`` controls local parallelism (default 32 to match
    the test host); on a real cluster the master/deploy settings come
    from spark-submit and these configs still apply.
    """
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if shuffle_partitions is None:
        # default = cpus; override when the DATA outgrows the box (the
        # sf100 spot-check: 600M-row joins at 32 reduce partitions hold
        # ~19M rows each and spill — 256 took q18 from 198 s to 110 s
        # and corpus_ngram_novelty from 514 s to 320 s ≈ linear). On a
        # real cluster this is sized to keep post-shuffle partitions
        # ~100-200 MB; AQE coalesces the excess back down.
        shuffle_partitions = int(
            os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", str(cpus))
        )
    builder = (
        SparkSession.builder.master(os.environ.get("SPARK_MASTER", f"local[{cpus}]"))
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.compression.codec", "snappy")
        # micros (not INT96) so pyarrow executors read our own files cleanly
        .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "16g"))
        .config("spark.ui.enabled", "false")
        # testdata parquet carries tz-less timestamp[us]; Spark >=4.1 would
        # otherwise infer TIMESTAMP_NTZ, which forbids numeric casts and
        # mismatches the DuckDB oracle's TIMESTAMP semantics. Read as
        # session-tz (UTC) timestamps instead. sources.tables.load_table
        # additionally normalizes any NTZ column that slips through a
        # foreign session without this conf.
        .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
        # compat: if testdata is ever regenerated with TIMESTAMP(NANOS)
        # (as in rounds 1-2), surface it as BIGINT nanos rather than
        # erroring; load_table converts such columns back to timestamps
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
