"""Transaction + scaling scenarios (TransactionTest, AutoScaleTest,
StreamSeekTest analogues)."""

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from pravega_spark.config import ScalingPolicy, StreamConfiguration
from pravega_spark.errors import TxnFailedException
from pravega_spark.metadata import make_segment_id, segment_epoch


def _mk(store, n=2):
    store.create_scope("s")
    store.create_stream("s", "ev", StreamConfiguration(scaling=ScalingPolicy.fixed(n)))


def test_txn_commit_atomic(store, events):
    _mk(store)
    store.write_events("s", "ev", events.limit(100), routing_key_col="user_id")
    txn = store.begin_txn("s", "ev")
    txn.write_events(events.filter(F.col("event_id").between(100, 149)).withColumn("routing_key", F.col("user_id")))
    # staged rows invisible before commit
    assert store.read("s", "ev").count() == 100
    txn.commit()
    assert store.read("s", "ev").count() == 150
    assert txn.status() == "COMMITTED"
    txn.commit()  # idempotent


def test_txn_abort_discards(store, events):
    _mk(store)
    txn = store.begin_txn("s", "ev")
    txn.write_events(events.limit(40).withColumn("routing_key", F.col("user_id")))
    txn.abort()
    assert store.read("s", "ev").count() == 0
    with pytest.raises(TxnFailedException):
        txn.commit()
    assert store.list_completed_txns("s", "ev")[txn.txn_id] == "ABORTED"


def test_txn_order_within_key(store, events):
    _mk(store)
    txn = store.begin_txn("s", "ev")
    e = events.orderBy("event_id")
    txn.write_events(e.limit(100).withColumn("routing_key", F.col("user_id")))
    txn.write_events(
        e.filter(F.col("event_id").between(100, 199)).withColumn("routing_key", F.col("user_id"))
    )
    txn.commit()
    got = store.read("s", "ev")
    w = Window.partitionBy("routing_key").orderBy("offset")
    viol = got.withColumn("p", F.lag("event_id").over(w)).filter(F.col("p") > F.col("event_id")).count()
    assert viol == 0


def test_txn_sweeper(store, events):
    _mk(store)
    txn = store.begin_txn("s", "ev", lease_ms=1)
    txn.write_events(events.limit(5).withColumn("routing_key", F.col("user_id")))
    import time

    time.sleep(0.01)
    swept = store.sweep_txns("s", "ev")
    assert txn.txn_id in swept
    assert txn.status() == "ABORTED"


def test_scale_split_and_read_across_epochs(store, events):
    """Bounded read across a scale boundary sees every event exactly once
    (SURVEY §7 hard part 5)."""
    _mk(store, n=2)
    e = events.orderBy("event_id")
    store.write_events("s", "ev", e.limit(200), routing_key_col="user_id")
    seg0 = store.current_segments("s", "ev")[0]
    store.scale_stream("s", "ev", [seg0["segment_id"]], [(0.0, 0.25), (0.25, 0.5)])
    store.write_events("s", "ev", e.filter(F.col("event_id").between(200, 399)), routing_key_col="user_id")
    got = store.read("s", "ev")
    assert got.count() == 400
    assert got.select("event_id").distinct().count() == 400
    # successors of the sealed segment are the two new epoch-1 segments
    succ = store.get_successors("s", "ev", seg0["segment_id"])
    assert len(succ) == 2
    assert all(segment_epoch(s) == 1 for s in succ)
    # sealed segment receives no new writes
    tails_before = store.meta.tail_offsets("s", "ev")
    store.write_events("s", "ev", e.filter(F.col("event_id").between(400, 449)), routing_key_col="user_id")
    tails_after = store.meta.tail_offsets("s", "ev")
    assert tails_after[seg0["segment_id"]] == tails_before[seg0["segment_id"]]


def test_scale_merge(store, events):
    _mk(store, n=4)
    segs = store.current_segments("s", "ev")
    # merge the two middle segments [0.25,0.5)+[0.5,0.75) into one
    to_merge = [s["segment_id"] for s in segs if 0.2 < s["key_start"] < 0.7]
    store.scale_stream("s", "ev", to_merge, [(0.25, 0.75)])
    now = store.current_segments("s", "ev")
    assert len(now) == 3
    store.write_events("s", "ev", events.limit(100), routing_key_col="user_id")
    assert store.read("s", "ev").count() == 100


def test_segment_id_epoch_composition():
    sid = make_segment_id(3, 7)
    assert sid == (3 << 32) | 7
    assert segment_epoch(sid) == 3


def test_event_sourced_scale_plane(spark, tmp_path):
    """G10 fidelity: decisions publish to _system/_requeststream (the
    engine's own stream), a checkpointed processor executes them, and
    replayed/stale events are skipped idempotently."""
    from pravega_spark.config import ScalingPolicy, StreamConfiguration
    from pravega_spark.scaling import AutoScaler, ScaleDecision
    from pravega_spark.store import StreamStore

    st = StreamStore(spark, str(tmp_path / "root"))
    st.create_scope("sc")
    st.create_stream(
        "sc", "s",
        StreamConfiguration(scaling=ScalingPolicy.by_event_rate(10, scale_factor=2)),
    )
    sid = st.current_segments("sc", "s")[0]["segment_id"]
    sc = AutoScaler(st)
    assert sc.emit("sc", "s", decisions=[ScaleDecision(sid, "split", 99.0)]) == 1
    # events are durable on the internal stream before any execution
    assert st.read(sc.REQUEST_SCOPE, sc.REQUEST_STREAM).count() == 1
    applied = sc.process_requests()
    assert len(applied) == 1 and applied[0]["epoch"] == 1
    assert len(st.current_segments("sc", "s")) == 2
    # re-emitting the now-stale decision is skipped (segment superseded),
    # and the processor resumes from its checkpoint (old event not re-run)
    sc.emit("sc", "s", decisions=[ScaleDecision(sid, "split", 99.0)])
    assert sc.process_requests() == []
    assert len(st.current_segments("sc", "s")) == 2
