"""Regression pins for the r6 core-module review fixes: bounded-stream
end-cut semantics across a scale, drain() under an end cut, the
retention max-bound vs stalled subscribers, successor protection, and
KB/s scaling rates."""

import pytest
from pyspark.sql import functions as F

from pravega_spark.config import (
    ReaderGroupConfig,
    RetentionPolicy,
    ScalingPolicy,
    StreamConfiguration,
)
from pravega_spark.retention import RetentionJob
from pravega_spark.scaling import AutoScaler
from pravega_spark.sources import load_table
from pravega_spark.streaming import ReaderGroup, write_stream_batch

SF_DIR = "/root/testdata/sf0.001"


def _envelope(events, lo, hi):
    return (
        events.orderBy("event_id")
        .filter(F.col("event_id").between(lo, hi - 1))
        .select(
            F.col("user_id").cast("string").alias("routing_key"),
            F.col("ts").alias("event_time"),
            F.to_json(F.struct("event_id")).cast("binary").alias("payload"),
        )
    )


def _scaled_stream_with_post_cut_writes(store, spark, events):
    """fixed(1) stream: 40 events -> cut at tail -> scale seg 0 into two
    successors -> 30 more events. Returns (cut, n_before, n_after)."""
    store.create_scope("s")
    store.create_stream("s", "ev", StreamConfiguration(scaling=ScalingPolicy.fixed(1)))
    store.write_events("s", "ev", _envelope(events, 0, 40))
    cut = store.tail_stream_cut("s", "ev")
    seg0 = store.current_segments("s", "ev")[0]
    store.scale_stream("s", "ev", [seg0["segment_id"]], [(0.0, 0.5), (0.5, 1.0)])
    store.write_events("s", "ev", _envelope(events, 40, 70))
    return cut, 40, 30


def test_end_cut_excludes_post_scale_successors(store, spark, events):
    """A bounded read to a pre-scale cut must NOT leak events written to
    successor segments the cut never mentions."""
    cut, n_before, n_after = _scaled_stream_with_post_cut_writes(store, spark, events)
    assert store.read("s", "ev").count() == n_before + n_after  # sanity
    rg = ReaderGroup(
        store, "s", "ev", "g-bound", ReaderGroupConfig(end_cut=cut.positions)
    )
    got = rg.read_batch().count()
    assert got == n_before, f"bounded read leaked successor events ({got})"


def test_drain_terminates_under_end_cut(store, spark, events):
    """drain() on an end-cut group caps its target at the cut: it must
    terminate promptly (not spin to timeout) once the cut is reached,
    and the destination holds exactly the pre-cut events."""
    import time

    cut, n_before, _ = _scaled_stream_with_post_cut_writes(store, spark, events)
    store.create_stream("s", "dst", StreamConfiguration(scaling=ScalingPolicy.fixed(1)))
    rg = ReaderGroup(
        store, "s", "ev", "g-drain-bound", ReaderGroupConfig(end_cut=cut.positions)
    )
    sink = write_stream_batch(store, "s", "dst", writer_id="w", passthrough_from=rg)
    t0 = time.time()
    pending = rg.drain(sink, timeout_s=60)
    took = time.time() - t0
    assert pending == n_before
    assert store.read("s", "dst").count() == n_before
    assert took < 45, f"drain spun ({took:.0f}s) instead of stopping at the cut"


def test_retention_max_caps_stalled_subscriber(store, spark, events):
    """SIZE retention with a max bound: a subscriber pinned at offset 0
    cannot hold more than retention_max events — the max floor advances
    the head anyway."""
    store.create_scope("s")
    store.create_stream(
        "s",
        "ev",
        StreamConfiguration(
            scaling=ScalingPolicy.fixed(1),
            retention=RetentionPolicy.by_size(20, max_events=50),
        ),
    )
    store.write_events("s", "ev", _envelope(events, 0, 100))
    rg = ReaderGroup(store, "s", "ev", "g-stalled")
    from pravega_spark.streamcut import StreamCut

    sid = store.current_segments("s", "ev")[0]["segment_id"]
    rg.update_retention_stream_cut(StreamCut.of({sid: 0}))  # stalled at head
    RetentionJob(store).run("s", "ev")
    head = store.meta.head_offsets("s", "ev")[sid]
    # without the max floor the stalled subscriber pins head at 0;
    # with it, at most max_events=50 of the 100 events stay retained
    assert head >= 50, f"stalled subscriber pinned retention (head={head})"


def test_retention_spares_unseen_successor(store, spark, events):
    """SIZE retention must NOT truncate a successor segment the
    subscriber has no published position for (it has not drained it
    yet) — the clamp defaults unseen segments to offset 0."""
    store.create_scope("s")
    store.create_stream(
        "s",
        "ev",
        StreamConfiguration(
            scaling=ScalingPolicy.fixed(1),
            retention=RetentionPolicy.by_size(5),  # aggressive: retain 5
        ),
    )
    store.write_events("s", "ev", _envelope(events, 0, 40))
    from pravega_spark.streamcut import StreamCut

    sid0 = store.current_segments("s", "ev")[0]["segment_id"]
    rg = ReaderGroup(store, "s", "ev", "g-sub")
    rg.update_retention_stream_cut(StreamCut.of({sid0: 40}))  # fully read epoch 0
    store.scale_stream("s", "ev", [sid0], [(0.0, 0.5), (0.5, 1.0)])
    store.write_events("s", "ev", _envelope(events, 40, 70))
    RetentionJob(store).run("s", "ev")
    heads = store.meta.head_offsets("s", "ev")
    for seg in store.current_segments("s", "ev"):
        s_id = seg["segment_id"]
        assert heads.get(s_id, 0) == 0, (
            f"successor {s_id} truncated to {heads[s_id]} before the "
            "subscriber ever read it"
        )


def test_segment_rates_kbytes_metric(store, spark, events):
    """BY_RATE_IN_KBYTES_PER_SEC rates measure payload KB/s, not
    events/s: fat payloads must dominate the kbytes metric while the
    events metric only counts rows."""
    store.create_scope("s")
    store.create_stream("s", "ev", StreamConfiguration(scaling=ScalingPolicy.fixed(1)))
    fat = (
        events.orderBy("event_id")
        .limit(60)
        .select(
            F.col("user_id").cast("string").alias("routing_key"),
            F.col("ts").alias("event_time"),
            F.repeat(F.lit("x"), 2048).cast("binary").alias("payload"),  # 2 KiB each
        )
    )
    store.write_events("s", "ev", fat)
    sc = AutoScaler(store)
    ev_rates = sc.segment_rates("s", "ev", metric="events")
    kb_rates = sc.segment_rates("s", "ev", metric="kbytes")
    sid = next(iter(ev_rates))
    n2 = ev_rates[sid][2] * 120  # events inside the 2-min window
    kb2 = kb_rates[sid][2] * 120
    assert n2 == 60
    assert kb2 == pytest.approx(60 * 2.0, rel=0.01), (
        f"kbytes metric returned {kb2} KB for 60x2KiB payloads"
    )
