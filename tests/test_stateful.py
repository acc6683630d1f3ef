"""Custom stateful streaming operator + notifications."""

from pyspark.sql import functions as F

from pravega_spark.config import ScalingPolicy, StreamConfiguration
from pravega_spark.streaming import ReaderGroup
from pravega_spark.streaming.notifications import SegmentNotifier
from pravega_spark.streaming.stateful import running_state_per_key


def _mk(store, events, n_events=150):
    store.create_scope("s")
    store.create_stream("s", "ev", StreamConfiguration(scaling=ScalingPolicy.fixed(4)))
    enveloped = events.orderBy("event_id").limit(n_events).select(
        F.col("user_id").cast("string").alias("routing_key"),
        F.col("ts").alias("event_time"),
        F.to_json(F.struct("event_id", "value")).cast("binary").alias("payload"),
    )
    store.write_events("s", "ev", enveloped)


def test_running_state_per_key(store, events):
    import time

    _mk(store, events, n_events=100)
    rg = ReaderGroup(store, "s", "ev", "rg-state")
    folded = running_state_per_key(
        rg.read_stream(), value_expr="get_json_object(cast(payload as string), '$.value')"
    )
    # run a continuous trigger; write a second tranche mid-flight so the
    # fold provably accumulates state ACROSS micro-batches
    final = {}

    def sink(df, _bid):
        for r in df.collect():
            final[r["routing_key"]] = (r["n_events"], r["total_value"])

    q = (
        folded.writeStream.foreachBatch(sink)
        .outputMode("update")
        .option("checkpointLocation", rg.checkpoint_dir)
        .trigger(processingTime="1 second")
        .start()
    )

    def wait_for(total, deadline_s=120):
        deadline = time.time() + deadline_s
        while time.time() < deadline and sum(v[0] for v in final.values()) < total:
            time.sleep(2)
        assert q.exception() is None, q.exception()

    wait_for(100)
    more = events.orderBy("event_id").filter(F.col("event_id").between(100, 149)).select(
        F.col("user_id").cast("string").alias("routing_key"),
        F.col("ts").alias("event_time"),
        F.to_json(F.struct("event_id", "value")).cast("binary").alias("payload"),
    )
    store.write_events("s", "ev", more)
    wait_for(150)
    q.stop()
    q.awaitTermination(60)
    assert final
    want = {
        str(r["user_id"]): (r["n"], r["s"])
        for r in events.orderBy("event_id")
        .limit(150)
        .groupBy("user_id")
        .agg(F.count("*").alias("n"), F.sum("value").alias("s"))
        .collect()
    }
    assert set(final) == set(want)
    for k, (n, total) in want.items():
        assert final[k][0] == n
        assert abs(final[k][1] - total) < 1e-6


def test_segment_notifier(store, events):
    _mk(store, events)
    got = []
    notifier = SegmentNotifier(store, "s", "ev")
    notifier.register_listener(lambda n, readers: got.append(n))
    notifier.poll()  # baseline
    seg0 = store.current_segments("s", "ev")[0]
    store.scale_stream("s", "ev", [seg0["segment_id"]], [(0.0, 0.125), (0.125, 0.25)])
    notifier.poll()
    assert got == [5]
