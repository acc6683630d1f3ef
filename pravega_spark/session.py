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
    override = os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS")
    if shuffle_partitions is None:
        # ``spark.sql.shuffle.partitions`` stays = cpus: it is what the
        # NON-adaptive paths consume — Structured Streaming pins its
        # state-store partitioning to this value at first checkpoint
        # (AQE is disabled in stateful workloads), so growing it would
        # both over-partition tiny micro-batches and break checkpoint
        # compatibility across sessions.
        shuffle_partitions = int(override) if override else cpus
    # Reduce-side sizing is DATA-DRIVEN, not knob-driven (r10 sf100
    # sweep: 600M-row joins at 32 reduce partitions held ~19M rows each
    # and spilled — q18 198 s, ngram-novelty 514 s; at 256 both were
    # linear per decade). Batch (AQE) shuffles start at a deliberately
    # oversized initialPartitionNum and AQE coalesces neighbors back
    # down to ~advisory bytes, so the post-shuffle partition size tracks
    # the actual shuffled bytes of EACH query: small shuffles coalesce
    # to ~cpus tasks (parallelismFirst), huge ones keep enough reduce
    # tasks to stay in memory. Oversizing is safe (coalesce only
    # merges); undersizing is not (AQE never splits a non-skew-join
    # partition) — hence 32x cpus. On a 1000-executor cluster the same
    # pattern holds with a proportionally larger initial count.
    # SPARK_GRAFT_SHUFFLE_PARTITIONS is demoted to an override of both.
    initial_partitions = int(override) if override else max(1024, cpus * 32)
    builder = (
        SparkSession.builder.master(os.environ.get("SPARK_MASTER", f"local[{cpus}]"))
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config(
            "spark.sql.adaptive.coalescePartitions.initialPartitionNum",
            str(initial_partitions),
        )
        .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", str(64 * 1024 * 1024))
        # parallelismFirst coalescing targets max(bytes/parallelism,
        # minPartitionSize); the default 1 MiB floor is the BINDING term
        # for byte-light/compute-heavy shuffles (a few MB of distinct
        # vector reps feeding a quadratic pair join coalesced to 2
        # tasks — a 6x small-scale regression found by the r11 bench
        # A/B). 128 KiB keeps ~cpus-way parallelism for those; at real
        # scale bytes/parallelism dominates and this floor is inert.
        .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", "128k")
        # without this, the plan fragment that POPULATES a .persist()
        # cache runs with AQE partition coalescing disabled (Spark keeps
        # cached output partitioning stable by default) — at a 1024-wide
        # initialPartitionNum every persisted stage would execute all
        # 1024 reduce tasks regardless of data size
        .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
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
