"""Auto-scale planner, retention job, watermark emitter."""

from pyspark.sql import functions as F

from pravega_spark.config import (
    RetentionPolicy,
    ScalingPolicy,
    StreamConfiguration,
)
from pravega_spark.retention import RetentionJob
from pravega_spark.scaling import AutoScaler
from pravega_spark.streamcut import StreamCut
from pravega_spark.watermarks import WatermarkEmitter


def _mk(store, scaling=None, retention=None, n=2):
    store.create_scope("s")
    cfg = StreamConfiguration(
        scaling=scaling or ScalingPolicy.fixed(n),
        retention=retention or RetentionPolicy(),
    )
    store.create_stream("s", "ev", cfg)


def test_scale_up_thresholds(store, events):
    _mk(store, scaling=ScalingPolicy.by_event_rate(target_rate=10, scale_factor=2, min_num_segments=2))
    store.write_events("s", "ev", events.limit(200), routing_key_col="user_id")
    scaler = AutoScaler(store)
    segs = [s["segment_id"] for s in store.current_segments("s", "ev")]
    # hot segment: 2-min rate 5x target; cold rest
    rates = {sid: {2: 0.0, 5: 0.0, 10: 0.0, 20: 0.0} for sid in segs}
    rates[segs[0]] = {2: 51.0, 5: 20.0, 10: 10.0, 20: 5.0}
    plan = scaler.plan("s", "ev", rates=rates, segment_age_min=3)
    assert [d.action for d in plan] == ["split"]
    assert plan[0].segment_id == segs[0]
    applied = scaler.run("s", "ev", decisions=plan)
    assert len(applied) == 1
    now = store.current_segments("s", "ev")
    assert len(now) == 3  # split into scale_factor=2 successors
    # stream still readable + writable across the epoch change
    store.write_events("s", "ev", events.limit(100), routing_key_col="user_id")
    assert store.read("s", "ev").count() == 300


def test_scale_down_merges_adjacent_cold(store, events):
    # start with 4 fixed segments, then switch policy (updateStream, D3)
    _mk(store, scaling=ScalingPolicy.fixed(4))
    store.update_stream(
        "s", "ev",
        StreamConfiguration(scaling=ScalingPolicy.by_event_rate(target_rate=10, scale_factor=2, min_num_segments=1)),
    )
    scaler = AutoScaler(store)
    segs = [s["segment_id"] for s in store.current_segments("s", "ev")]
    rates = {sid: {2: 0.0, 5: 0.0, 10: 0.0, 20: 1.0} for sid in segs}  # all cold
    plan = scaler.plan("s", "ev", rates=rates, segment_age_min=30)
    merges = [d for d in plan if d.action == "merge"]
    assert len(merges) == 1
    scaler.run("s", "ev", decisions=merges)
    assert len(store.current_segments("s", "ev")) == 3


def test_scale_age_gate(store, events):
    _mk(store, scaling=ScalingPolicy.by_event_rate(10, 2, 2))
    scaler = AutoScaler(store)
    segs = [s["segment_id"] for s in store.current_segments("s", "ev")]
    rates = {sid: {2: 100.0, 5: 100.0, 10: 100.0, 20: 100.0} for sid in segs}
    assert scaler.plan("s", "ev", rates=rates, segment_age_min=1) == []  # too young


def test_fixed_policy_never_scales(store, events):
    _mk(store, scaling=ScalingPolicy.fixed(2))
    scaler = AutoScaler(store)
    assert scaler.plan("s", "ev", segment_age_min=60) == []


def test_retention_by_size(store, events):
    _mk(store, retention=RetentionPolicy.by_size(events=50))
    store.write_events("s", "ev", events.limit(200), routing_key_col="user_id")
    cut = RetentionJob(store).run("s", "ev")
    assert cut is not None
    remaining = store.read("s", "ev").count()
    assert 50 <= remaining <= 60  # per-segment apportioning is approximate
    info = store.get_stream_info("s", "ev")
    assert info.event_count == remaining


def test_retention_by_time(store, events):
    _mk(store, retention=RetentionPolicy.by_time(millis=3_600_000))  # keep 1h
    store.write_events("s", "ev", events.limit(300), routing_key_col="user_id", event_time_col="ts")
    latest = events.limit(300).agg(F.max("ts")).collect()[0][0]
    job = RetentionJob(store)
    cut = job.run("s", "ev", now=latest)
    kept = store.read("s", "ev").count()
    expected = events.limit(300).filter(
        F.col("ts") >= F.lit(latest) - F.expr("INTERVAL 1 HOURS")
    ).count()
    assert kept == expected
    assert cut is not None


def test_consumption_retention_respects_slowest_subscriber(store, events):
    _mk(store, retention=RetentionPolicy.consumption())
    store.write_events("s", "ev", events.limit(100), routing_key_col="user_id")
    head = store.head_stream_cut("s", "ev")
    fast = store.get_next_stream_cut("s", "ev", head, 20)
    slow = store.get_next_stream_cut("s", "ev", head, 5)
    store.meta.update_subscriber_cut("s", "ev", "rg-fast", fast.to_json())
    store.meta.update_subscriber_cut("s", "ev", "rg-slow", slow.to_json())
    cut = RetentionJob(store).run("s", "ev")
    assert cut.positions == slow.positions  # min over subscribers
    assert store.read("s", "ev").count() == 100 - sum(slow.positions.values())


def test_watermark_emit_and_time_window(store, events):
    _mk(store)
    store.write_events("s", "ev", events.limit(100), routing_key_col="user_id")
    store.note_time("s", "ev", "w1", 1_000)
    store.note_time("s", "ev", "w2", 2_000)
    emitter = WatermarkEmitter(store)
    wm = emitter.emit("s", "ev")
    assert wm["lower_bound"] == 1_000 and wm["upper_bound"] == 2_000
    store.write_events("s", "ev", events.limit(50), routing_key_col="user_id")
    store.note_time("s", "ev", "w1", 5_000)
    store.note_time("s", "ev", "w2", 6_000)
    emitter.emit("s", "ev")
    assert len(emitter.history("s", "ev")) == 2
    # a reader at the tail is bracketed by [5000, +inf-ish]
    tw = emitter.current_time_window("s", "ev", store.tail_stream_cut("s", "ev"))
    assert tw.lower_time_bound == 5_000
    # a reader at the head is before the first watermark's upper bound
    tw0 = emitter.current_time_window("s", "ev", store.head_stream_cut("s", "ev"))
    assert tw0.upper_time_bound == 2_000
    # writer removal (Controller.removeWriter)
    store.remove_writer("s", "ev", "w2")
    wm3 = emitter.emit("s", "ev")
    assert wm3["upper_bound"] == 5_000
