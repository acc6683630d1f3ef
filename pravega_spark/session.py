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


ADVISORY_BYTES = 64 * 1024 * 1024  # AQE advisory partition size (64 MB)
MAX_INITIAL_PARTITIONS = 1024

# data_dir -> estimated input bytes (testdata is immutable within a round)
_DIR_BYTES: dict[str, int] = {}


def _dir_input_bytes(data_dir: str) -> int:
    """Total bytes of data files under ``data_dir`` (recursive, cached)."""
    key = os.path.abspath(data_dir)
    cached = _DIR_BYTES.get(key)
    if cached is not None:
        return cached
    total = 0
    for root, _dirs, files in os.walk(key):
        for f in files:
            if f.startswith((".", "_")):
                continue
            try:
                total += os.path.getsize(os.path.join(root, f))
            except OSError:
                pass
    _DIR_BYTES[key] = total
    return total


def autosize_shuffle_partitions(spark: SparkSession, data_dir: str) -> int:
    """Size AQE's ``initialPartitionNum`` from the ACTUAL input size.

    Round-11 used a constant ``max(1024, 32*cpus)``: oversizing is safe
    for correctness (AQE coalesce only merges) but every shuffle pays
    map-side bucket + driver block-tracking overhead proportional to the
    initial count — measured as a uniform ~1.3-2x inflation of every
    short query at bench SF (VERDICT r11 item 1: q1 1.06->2.21 s at
    sf0.1; 8-core runs FASTER than 32-core on the same rows because the
    overhead scales with partition count).

    The initial count is therefore derived from the data actually being
    queried: ``est_input_bytes / advisory``, clamped to [cpus, 1024].
    Calibration against the committed sweep records: sf0.1 (~17 MB) ->
    cpus (the r10 plan shape the driver's bench grades); sf100 (~17 GB)
    -> ~270, inside the 256..1024 band proven linear for the two r10
    superlinear offenders (SWEEP_r11_sf100: corpus_ngram_novelty 293 s,
    q18 106 s; the hand-tuned 256 run was within 10% of auto-1024 on
    both).  Beyond ~64 GB of input the clamp reproduces the r11
    constant.  The estimate needs only to land in that broad band —
    compressed parquet under-counts shuffle bytes, but a 2-4x estimate
    error moves the result well inside [cpus, 1024] at every proven
    decade.

    Called from ``load_table`` (every registered query's first touch of
    its data dir), so each query plans with the sizing of ITS input.
    ``SPARK_GRAFT_SHUFFLE_PARTITIONS`` still overrides everything.
    Session-global conf: harnesses plan queries single-threaded (the
    gate, bench.py, parity); concurrent planners against DIFFERENT data
    dirs in one session would race on the conf and should pin the knob.
    """
    if os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS"):
        return int(os.environ["SPARK_GRAFT_SHUFFLE_PARTITIONS"])
    if os.environ.get("SPARK_GRAFT_AUTOSIZE", "1") == "0":
        # measurement/ops escape hatch: keep the session's constant
        # (r11 behavior) — used for the same-host A/B that calibrates
        # this function, and as the fallback if a deployment's input
        # estimate is ever wrong
        return int(
            spark.conf.get("spark.sql.adaptive.coalescePartitions.initialPartitionNum")
        )
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    est = _dir_input_bytes(data_dir)
    n = max(cpus, min(MAX_INITIAL_PARTITIONS, est // ADVISORY_BYTES + 1))
    key = "spark.sql.adaptive.coalescePartitions.initialPartitionNum"
    if spark.conf.get(key, None) != str(n):
        spark.conf.set(key, str(n))
    return n


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
    # linear per decade). Batch (AQE) shuffles start at an oversized
    # initialPartitionNum and AQE coalesces neighbors back down to
    # ~advisory bytes, so the post-shuffle partition size tracks the
    # actual shuffled bytes of EACH query. The SESSION default here is
    # only a conservative floor for paths that never touch a data dir:
    # ``autosize_shuffle_partitions`` (called from load_table) resizes
    # it to the queried input's real bytes, because a constant 1024 was
    # measured as uniform fixed overhead on small inputs (VERDICT r11
    # item 1; see the autosizer's docstring for the calibration).
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
