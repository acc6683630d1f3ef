"""End-to-end consumption-based retention with two REAL reader groups
(ConsumptionBasedRetentionWithMultipleReaderGroupsTest analogue).

The metadata-level unit test (test_maintenance.py) injects subscriber
cuts directly; this scenario drives the whole loop: two reader groups
actually consume at different speeds through streaming queries, publish
their COMMITTED positions as retention cuts, the retention job
truncates only below the slowest subscriber, and the slow group then
resumes from its checkpoint across the truncation with zero loss.
"""

from pyspark.sql import functions as F

from pravega_spark.config import RetentionPolicy, ScalingPolicy, StreamConfiguration
from pravega_spark.retention import RetentionJob
from pravega_spark.streaming import ReaderGroup


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


def _drain(rg, into):
    def sink(df, batch_id):
        into.extend(
            r["eid"]
            for r in df.select(
                F.get_json_object(F.col("payload").cast("string"), "$.event_id")
                .cast("long")
                .alias("eid")
            ).collect()
        )

    q = rg.start(sink)
    q.awaitTermination()


def test_consumption_retention_two_reader_groups_end_to_end(store, events):
    store.create_scope("s")
    store.create_stream(
        "s",
        "ev",
        StreamConfiguration(
            scaling=ScalingPolicy.fixed(2), retention=RetentionPolicy.consumption()
        ),
    )

    # slow subscriber consumes only the first installment
    store.write_events("s", "ev", _env(events, 0, 59))
    rg_slow = ReaderGroup(store, "s", "ev", "slow")
    slow_seen: list[int] = []
    _drain(rg_slow, slow_seen)
    assert sorted(slow_seen) == list(range(60))

    # the fast subscriber consumes everything, including a second
    # installment the slow group has not touched
    store.write_events("s", "ev", _env(events, 60, 199))
    rg_fast = ReaderGroup(store, "s", "ev", "fast")
    fast_seen: list[int] = []
    _drain(rg_fast, fast_seen)
    assert sorted(fast_seen) == list(range(200))

    # both groups publish their committed positions; retention truncates
    # to the MIN over subscribers = the slow group's position
    rg_slow.update_retention_stream_cut()
    rg_fast.update_retention_stream_cut()
    cut = RetentionJob(store).run("s", "ev")
    assert cut is not None
    assert cut.positions == rg_slow.committed_positions().positions
    assert store.read("s", "ev").count() == 140  # slow's backlog survives

    # the slow group resumes from its checkpoint ACROSS the truncation:
    # its position equals the truncation cut, so it loses nothing and
    # sees every remaining event exactly once
    _drain(rg_slow, slow_seen)
    assert sorted(slow_seen) == list(range(200))
    assert len(slow_seen) == 200
