"""Multi-process crash-stress of the r9 reserve/publish commit protocol.

Three writer PROCESSES hammer one stream; each deterministically
"crashes" a fraction of its appends mid-payload (after the reservation
is durable, before publish) and then retries like a real client. The
invariants that must survive: every ACKED batch's rows are present
exactly once, per-segment offsets are gap-free 0..tail, and fsck leaves
nothing dangling. This drives the full repair surface — expiry reap,
pending-entry renumbering, same-writer in-flight guard — under real
cross-process contention, not monkeypatched single-thread scenarios.
"""

import json
import multiprocessing as mp
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_WRITERS = 3
N_BATCHES = 25
ROWS = 20


def _stress_writer(idx: int, root: str, q) -> None:
    # short grace so a crashed attempt's own retry reaps it quickly
    os.environ["PRAVEGA_SPARK_RESERVATION_GRACE_MS"] = "300"
    import pravega_spark.store as store_mod
    from pravega_spark.store import StreamStore

    st = StreamStore(None, root)
    orig = StreamStore._write_hot_batch
    state = {"boom": False}

    def maybe_crash(self, tbl, seg_arr, bases, path, tag):
        if state["boom"]:
            state["boom"] = False
            raise RuntimeError("injected mid-payload crash")
        return orig(self, tbl, seg_arr, bases, path, tag)

    StreamStore._write_hot_batch = maybe_crash
    assert store_mod.RESERVATION_GRACE_MS == 300
    acked = []
    for b in range(N_BATCHES):
        rows = [
            {"routing_key": f"k{(idx * 7 + i) % 5}", "v": f"w{idx}b{b}r{i}"}
            for i in range(ROWS)
        ]
        # every 4th/5th batch (offset per writer) dies once mid-payload,
        # with its reservation durable, then the client retries
        if b % (4 + idx) == idx:
            state["boom"] = True
        for attempt in range(8):
            try:
                st.append_events("s", "ev", rows, writer_id=f"w{idx}", batch_seq=b)
                acked.append(b)
                break
            except RuntimeError:
                continue  # the injected crash: retry the same batch_seq
        else:
            q.put(("fail", idx, b))
            return
    q.put(("ok", idx, acked))


def test_crash_stress_exactly_once_across_processes(tmp_path):
    from pravega_spark.config import ScalingPolicy, StreamConfiguration
    from pravega_spark.store import StreamStore

    root = str(tmp_path / "root")
    st = StreamStore(None, root)
    st.create_scope("s")
    st.create_stream("s", "ev", StreamConfiguration(scaling=ScalingPolicy.fixed(4)))
    ctx = mp.get_context("spawn")
    q = ctx.Queue()
    procs = [
        ctx.Process(target=_stress_writer, args=(i, root, q)) for i in range(N_WRITERS)
    ]
    for p in procs:
        p.start()
    results = [q.get(timeout=300) for _ in procs]
    for p in procs:
        p.join(60)
    assert all(r[0] == "ok" for r in results), results
    acked = {r[1]: r[2] for r in results}
    assert all(len(a) == N_BATCHES for a in acked.values())

    # drain any stranded pendings from end-of-run crashes, then verify
    os.environ["PRAVEGA_SPARK_RESERVATION_GRACE_MS"] = "300"
    import time

    import pravega_spark.store as store_mod

    old = store_mod.RESERVATION_GRACE_MS
    store_mod.RESERVATION_GRACE_MS = 300
    try:
        time.sleep(0.35)
        st.fsck_stream("s", "ev")  # reaps expired reservations + orphans
        st.fsck_stream("s", "ev")
        doc = st.meta.segments_doc("s", "ev")
        assert not doc.get("reservations") and not doc.get("pending"), doc
        # per-segment: offsets are exactly 0..tail-1 and every acked row
        # appears exactly once
        import pyarrow.parquet as pq

        from pravega_spark import fsio

        path = os.path.join(root, "streams", "s", "ev")
        seen = {}
        per_seg = {}
        for sid, entry in doc["segments"].items():
            for rel in st.meta.segment_files("s", "ev", sid, entry):
                t = pq.read_table(fsio.join(path, rel), columns=["v", "offset"])
                for v, off in zip(t["v"].to_pylist(), t["offset"].to_pylist()):
                    seen[v] = seen.get(v, 0) + 1
                    per_seg.setdefault(sid, []).append(off)
        for sid, offs in per_seg.items():
            assert sorted(offs) == list(range(len(offs))), f"segment {sid} has gaps"
            assert len(offs) == doc["segments"][sid]["tail_offset"]
        expect = {
            f"w{i}b{b}r{r}"
            for i, batches in acked.items()
            for b in batches
            for r in range(ROWS)
        }
        assert set(seen) == expect
        dupes = {v: n for v, n in seen.items() if n != 1}
        assert not dupes, f"duplicated rows: {list(dupes.items())[:5]}"
        assert sum(seen.values()) == N_WRITERS * N_BATCHES * ROWS
    finally:
        store_mod.RESERVATION_GRACE_MS = old
        os.environ.pop("PRAVEGA_SPARK_RESERVATION_GRACE_MS", None)
