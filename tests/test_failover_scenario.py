"""System-style composite scenario: transactional + plain writers
interleaved with a scale event, drained by a streaming reader that
fails over (stop → restart from the same checkpoint) mid-drain.

Mirrors the reference's tier-3 system test
``test/system/.../MultiReaderTxnWriterWithFailoverTest.java``: the
invariants are exactly-once delivery across the restart, aborted-txn
invisibility, and per-key order across the epoch boundary.
"""

import threading
import time

from pyspark.sql import Window
from pyspark.sql import functions as F

from pravega_spark.config import ScalingPolicy, StreamConfiguration
from pravega_spark.streaming import ReaderGroup
from pravega_spark.streaming.datasource import register


def _env(events, lo, hi):
    return (
        events.orderBy("event_id")
        .filter(F.col("event_id").between(lo, hi))
        .select(
            F.col("user_id").cast("string").alias("routing_key"),
            F.col("ts").alias("event_time"),
            F.to_json(F.struct("event_id")).cast("binary").alias("payload"),
        )
    )


def test_txn_writers_scale_and_reader_failover(store, events):
    store.create_scope("s")
    store.create_stream("s", "ev", StreamConfiguration(scaling=ScalingPolicy.fixed(4)))
    register(store.spark)

    # -- phase A writes: plain batch, committed txn, ABORTED txn ---------
    store.write_events("s", "ev", _env(events, 0, 99))
    txn1 = store.begin_txn("s", "ev")
    txn1.write_events(_env(events, 100, 149))
    txn1.commit()
    poison = store.begin_txn("s", "ev")
    poison.write_events(_env(events, 900, 949))
    poison.abort()

    expected = set(range(0, 300))

    # -- read plane: drain phase A, then FAIL OVER (stop the query) ------
    rg = ReaderGroup(store, "s", "ev", "rg-failover")
    seen: dict[int, list[int]] = {}
    seen_lock = threading.Lock()  # collect() runs on the query's thread

    def collect(df, batch_id):
        ids = [
            r["eid"]
            for r in df.select(
                F.get_json_object(F.col("payload").cast("string"), "$.event_id")
                .cast("long")
                .alias("eid")
            ).collect()
        ]
        with seen_lock:
            seen[batch_id] = ids  # keyed by batch id: a retry overwrites, not double-counts

    def n_seen():
        with seen_lock:
            return sum(len(v) for v in seen.values())

    def run_until(target, deadline_s=300):
        q = (
            rg.read_stream(max_events_per_trigger=20)
            .writeStream.foreachBatch(collect)
            .option("checkpointLocation", rg.checkpoint_dir)
            .trigger(processingTime="1 second")
            .start()
        )
        deadline = time.time() + deadline_s
        while time.time() < deadline and n_seen() < target:
            time.sleep(0.5)
        q.stop()
        q.awaitTermination(60)

    run_until(150)  # drain phase A, then the reader "fails"
    assert n_seen() == 150

    # -- while the reader is down: scale (split the first segment), then
    # -- a post-scale txn and a post-scale plain batch -------------------
    seg0 = store.current_segments("s", "ev")[0]
    lo, hi = seg0["key_start"], seg0["key_end"]
    mid = (lo + hi) / 2
    store.scale_stream("s", "ev", [seg0["segment_id"]], [(lo, mid), (mid, hi)])
    txn2 = store.begin_txn("s", "ev")
    txn2.write_events(_env(events, 150, 199))
    txn2.commit()
    store.write_events("s", "ev", _env(events, 200, 299))

    # -- restart on the same checkpoint: positions are epoch-0 StreamCuts,
    # -- so the resumed query must finish the sealed segment and pick up
    # -- its successors -- and deliver each event exactly once -----------
    run_until(300)

    got = [eid for ids in seen.values() for eid in ids]
    assert len(got) == 300, f"saw {len(got)} events, want exactly-once 300"
    assert set(got) == expected  # nothing lost, nothing invented
    assert not set(got) & set(range(900, 950)), "aborted txn events leaked"

    # -- per-key order across the epoch boundary (storage order) ---------
    stored = store.read("s", "ev").select(
        "segment_id",
        "offset",
        "routing_key",
        F.get_json_object(F.col("payload").cast("string"), "$.event_id")
        .cast("long")
        .alias("eid"),
    )
    w = Window.partitionBy("routing_key").orderBy("segment_id", "offset")
    viol = (
        stored.withColumn("prev", F.lag("eid").over(w))
        .filter(F.col("prev") > F.col("eid"))
        .count()
    )
    assert viol == 0, "per-key order broken across the scale boundary"
