"""Multi-stream x multi-process write scaling matrix (r10 VERDICT #4).

Two measurements the 100 TB ingest claim rests on:

1. HOT-APPEND CROSS PRODUCT — N writer processes x M streams for
   N, M in {1, 2, 4}: r9 measured the two axes separately (4 procs on
   ONE stream; N single-proc streams); the cross product shows whether
   the per-stream commit protocol and the shared disk compose
   multiplicatively. Writers are PROCESSES (threads measure the GIL,
   ~195 MiB/s ceiling — r9 lesson), assigned round-robin to streams.

2. DISTRIBUTED-TIER 8-STREAM BEND — r9's curve bent at 8 concurrent
   streams (393 MiB/s, 4.5x vs 1-stream 88). Re-running the same
   point with payload roots on tmpfs (/dev/shm) splits the two
   suspects: if tmpfs restores ~8x scaling the bend is DISK
   (writeback contention on one NVMe); if it stays ~4.5x the bend is
   the shared DRIVER (promotion + manifest flips for all streams in
   one process).

Usage:  python scripts/write_matrix.py [--skip-distributed]
Prints a JSON record; the numbers land in SCALING.md.
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

EVENT_BYTES = 100 * 1024
BATCH = 50
DUR_S = 2.0
REPS = 3


def _hot_writer(idx: int, n_streams: int, root: str, barrier, q, dur: float) -> None:
    """One hot-append client (module-level for mp spawn pickling).
    Stream assignment is round-robin: idx % n_streams."""
    import os as _os
    import time as _time

    from pravega_spark.store import StreamStore

    st = StreamStore(None, root)
    stream = f"s{idx % n_streams}"
    pl = _os.urandom(EVENT_BYTES)
    # warm BEFORE the barrier: a spawned process's first appends pay
    # import/pool/metadata warmup (~0.3 s) — inside a 2 s window that
    # skews the corner ~2x below a warmed writer's rate (bench.py's
    # single-writer figure), making corners incomparable to it
    for w in range(5):
        rows = [{"routing_key": f"k{i % 10}", "payload": pl} for i in range(BATCH)]
        st.append_events("bench", stream, rows, writer_id=f"warm{idx}", batch_seq=w)
    barrier.wait()
    n = 0
    t0 = _time.perf_counter()
    while _time.perf_counter() - t0 < dur:
        rows = [{"routing_key": f"k{i % 10}", "payload": pl} for i in range(BATCH)]
        st.append_events("bench", stream, rows, writer_id=f"w{idx}", batch_seq=n)
        n += 1
    q.put(n * BATCH)


def _hot_corner(n_procs: int, n_streams: int, base_dir: str | None) -> float:
    """Median aggregate MiB/s over REPS runs of (n_procs x n_streams)."""
    import multiprocessing as mp

    from pravega_spark.config import ScalingPolicy, StreamConfiguration
    from pravega_spark.store import StreamStore

    ctx = mp.get_context("spawn")
    reps = []
    for _ in range(REPS):
        root = tempfile.mkdtemp(prefix="pvs_mx_", dir=base_dir)
        try:
            st = StreamStore(None, root)
            st.create_scope("bench")
            for s in range(n_streams):
                st.create_stream(
                    "bench", f"s{s}",
                    StreamConfiguration(scaling=ScalingPolicy.fixed(10)),
                )
            q = ctx.Queue()
            barrier = ctx.Barrier(n_procs + 1)
            procs = [
                ctx.Process(
                    target=_hot_writer, args=(i, n_streams, root, barrier, q, DUR_S)
                )
                for i in range(n_procs)
            ]
            for p in procs:
                p.start()
            barrier.wait()
            t0 = time.perf_counter()
            for p in procs:
                p.join()
            dt = time.perf_counter() - t0
            n = sum(q.get() for _ in procs)
            reps.append(n * EVENT_BYTES / (1024 * 1024) / dt)
        finally:
            shutil.rmtree(root, ignore_errors=True)
    return round(statistics.median(reps), 1)


def _dist_point(spark, n_streams: int, base_dir: str | None,
                commits: int = 3, rows_per_commit: int = 625,
                partitions: int = 8) -> float:
    """The r9 distributed-tier configuration: ``n_streams`` concurrent
    write_events jobs (one driver thread each), 62.5 MiB commits of
    incompressible 100 KiB payloads, bounded ``partitions``-task jobs,
    ``commits`` commits per stream. Aggregate MiB/s over wall clock."""
    from concurrent.futures import ThreadPoolExecutor

    from pravega_spark.config import ScalingPolicy, StreamConfiguration
    from pravega_spark.store import StreamStore

    root = tempfile.mkdtemp(prefix="pvs_dx_", dir=base_dir)
    try:
        store = StreamStore(spark, root)
        store.create_scope("bench")
        for s in range(n_streams):
            store.create_stream(
                "bench", f"d{s}", StreamConfiguration(scaling=ScalingPolicy.fixed(8))
            )
        pl = os.urandom(EVENT_BYTES)
        df = (
            spark.createDataFrame(
                [(f"k{i}", pl) for i in range(rows_per_commit)],
                "routing_key string, payload binary",
            )
            .repartition(partitions)
            .persist()
        )
        df.count()  # materialize OUTSIDE the timed window

        def one_stream(s: int) -> None:
            for c in range(commits):
                store.write_events(
                    "bench", f"d{s}", df, writer_id=f"dw{s}", batch_seq=c
                )

        t0 = time.perf_counter()
        with ThreadPoolExecutor(max_workers=n_streams) as pool:
            list(pool.map(one_stream, range(n_streams)))
        dt = time.perf_counter() - t0
        df.unpersist()
        total_mib = n_streams * commits * rows_per_commit * EVENT_BYTES / (1024 * 1024)
        return round(total_mib / dt, 1)
    finally:
        shutil.rmtree(root, ignore_errors=True)


def main() -> None:
    out: dict = {"event_bytes": EVENT_BYTES, "reps": REPS, "dur_s": DUR_S}

    # ---- hot-append cross product -------------------------------------
    matrix = {}
    for n_procs in (1, 2, 4):
        for n_streams in (1, 2, 4):
            if n_streams > n_procs:
                continue  # a stream with no writer adds nothing
            mib = _hot_corner(n_procs, n_streams, None)
            matrix[f"{n_procs}p_x_{n_streams}s"] = mib
            print(f"# hot {n_procs} procs x {n_streams} streams: {mib} MiB/s",
                  file=sys.stderr)
    out["hot_matrix_mib_per_s"] = matrix

    # ---- distributed 8-stream bend: disk vs tmpfs ---------------------
    if "--skip-distributed" not in sys.argv:
        from pravega_spark.session import get_spark

        spark = get_spark("write-matrix")
        # warmup: the first distributed commits pay JVM/codegen/executor
        # startup (~2x penalty on a 1-stream point) — burn it untimed so
        # the 1-stream baseline is honest
        _dist_point(spark, 1, None, commits=1)
        tmpfs = "/dev/shm" if os.path.isdir("/dev/shm") else None
        dist = {}
        for label, base in (("disk", None), ("tmpfs", tmpfs)):
            if base is None and label == "tmpfs":
                continue
            for n in (1, 8):
                key = f"{label}_{n}s"
                dist[key] = _dist_point(spark, n, base)
                print(f"# dist {key}: {dist[key]} MiB/s", file=sys.stderr)
        out["dist_mib_per_s"] = dist
        if "disk_1s" in dist and "disk_8s" in dist:
            out["disk_8s_scaling"] = round(dist["disk_8s"] / dist["disk_1s"], 2)
        if "tmpfs_1s" in dist and "tmpfs_8s" in dist:
            out["tmpfs_8s_scaling"] = round(dist["tmpfs_8s"] / dist["tmpfs_1s"], 2)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
