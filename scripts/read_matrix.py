"""Multi-process x multi-stream READ scaling matrix (r10, the fan-out
twin of scripts/write_matrix.py).

The 100 TB story has two sides: write_matrix.py measured ingest
(writer processes x streams); this measures the batch READ path —
N reader processes, each a full Spark session, scanning committed
stream data through ``StreamStore.read`` (manifest resolution →
pruned parquet scan → payload bytes). Readers are PROCESSES because a
real fan-out is many independent consumers (each its own JVM), and
because in-process thread readers would share one scheduler and
measure queueing, not the storage layout.

Method: one setup pass writes ``N_STREAMS`` streams of incompressible
100 KiB events via the distributed tier. Each reader process builds
its own SparkSession (warmed with an untimed full scan), waits on a
barrier, then scans its assigned stream end-to-end ``REPS`` times
(sum(length(payload)) — forces every payload byte through the scan);
aggregate MiB/s = total bytes scanned / wall clock across the barrier
window, median over reps reported per corner.

Usage: python scripts/read_matrix.py [out_json]
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
ROWS_PER_STREAM = 2500  # ~244 MiB payload per stream
REPS = 3


def _reader_proc(idx: int, n_streams: int, root: str, barrier, q) -> None:
    """One reader client (module-level for mp spawn pickling); reads its
    round-robin stream. Its own SparkSession: fan-out consumers don't
    share a driver."""
    import os as _os

    _os.environ.setdefault("SPARK_GRAFT_CPUS", "8")  # 4 procs x 8 = box
    import time as _time

    from pyspark.sql import functions as F

    from pravega_spark.session import get_spark
    from pravega_spark.store import StreamStore

    spark = get_spark(f"read-matrix-{idx}")
    st = StreamStore(spark, root)
    stream = f"r{idx % n_streams}"
    # warm untimed: JVM/codegen/manifest cache — the matrix measures the
    # scan, not session startup
    st.read("bench", stream).agg(F.sum(F.length("payload"))).collect()
    for i in range(REPS):
        barrier.wait()
        t0 = _time.perf_counter()
        n = st.read("bench", stream).agg(
            F.sum(F.length("payload")).alias("b")
        ).collect()[0]["b"]
        # signal completion PER REP, before any teardown: the parent
        # times each rep by collecting these, so the final rep's window
        # can't absorb spark.stop()/process-exit (which deflated the
        # last rep's rate in the first version of this script)
        q.put(("rep", idx, i, _time.perf_counter() - t0, n))
    spark.stop()


def main() -> None:
    import multiprocessing as mp

    from pravega_spark.session import get_spark
    from pravega_spark.config import ScalingPolicy, StreamConfiguration
    from pravega_spark.store import StreamStore

    out_json = sys.argv[1] if len(sys.argv) > 1 else None
    root = tempfile.mkdtemp(prefix="pvs_rmx_")
    spark = get_spark("read-matrix-setup")
    store = StreamStore(spark, root)
    store.create_scope("bench")
    pl = os.urandom(EVENT_BYTES)
    df = (
        spark.createDataFrame(
            [(f"k{i % 64}", pl) for i in range(ROWS_PER_STREAM)],
            "routing_key string, payload binary",
        ).repartition(8).persist()
    )
    df.count()
    for s in range(4):
        store.create_stream(
            "bench", f"r{s}", StreamConfiguration(scaling=ScalingPolicy.fixed(8))
        )
        store.write_events("bench", f"r{s}", df, writer_id=f"w{s}", batch_seq=0)
    df.unpersist()
    stream_mib = ROWS_PER_STREAM * EVENT_BYTES / (1024 * 1024)
    print(f"# setup: 4 streams x {stream_mib:.0f} MiB committed", file=sys.stderr)

    ctx = mp.get_context("spawn")
    matrix: dict = {}
    try:
        for n_procs, n_streams in ((1, 1), (2, 2), (4, 1), (4, 4)):
            q = ctx.Queue()
            barrier = ctx.Barrier(n_procs + 1)
            procs = [
                ctx.Process(target=_reader_proc, args=(i, n_streams, root, barrier, q))
                for i in range(n_procs)
            ]
            for p in procs:
                p.start()
            rep_rates = []
            rep_bytes = []
            for _ in range(REPS):
                barrier.wait()
                t0 = time.perf_counter()
                # every reader posts a per-rep record the moment its
                # scan finishes; the rep window closes when the LAST
                # record arrives — teardown never leaks into the timing
                recs = [q.get() for _ in range(n_procs)]
                rep_rates.append(time.perf_counter() - t0)
                rep_bytes.append(sum(r[4] for r in recs))
            for p in procs:
                p.join()
            corner = [
                round(b / (1024 * 1024) / dt, 1)
                for b, dt in zip(rep_bytes, rep_rates)
            ]
            med = statistics.median(corner)
            matrix[f"{n_procs}p_x_{n_streams}s"] = med
            print(f"# read {n_procs} procs x {n_streams} streams: {med} MiB/s "
                  f"(reps {corner})", file=sys.stderr)
        out = {"event_bytes": EVENT_BYTES, "rows_per_stream": ROWS_PER_STREAM,
               "reps": REPS, "read_matrix_mib_per_s": matrix}
        line = json.dumps(out)
        print(line)
        if out_json:
            with open(out_json, "w") as fh:
                fh.write(line + "\n")
    finally:
        spark.stop()
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
