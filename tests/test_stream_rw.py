"""Write→read scenarios mirroring the reference integration tests:
ReadWriteTest (per-key order), BatchClientTest (StreamCut-bounded
scans), StreamCutsTest, BoundedStreamReaderTest, exactly-once retries
(AppendProcessor writer dedup).
"""

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from pravega_spark.config import ScalingPolicy, StreamConfiguration
from pravega_spark.errors import (
    StreamNotFoundException,
    StreamSealedException,
    TruncatedDataException,
)
from pravega_spark.streamcut import StreamCut


def _mk(store, n_segments=4):
    store.create_scope("s")
    store.create_stream("s", "ev", StreamConfiguration(scaling=ScalingPolicy.fixed(n_segments)))


def test_write_read_roundtrip(store, events):
    _mk(store)
    store.write_events("s", "ev", events.limit(300), routing_key_col="user_id", event_time_col="ts")
    got = store.read("s", "ev")
    assert got.count() == 300
    # envelope columns present
    for c in ("routing_key", "segment_id", "offset", "event_time", "ingest_time"):
        assert c in got.columns
    # offsets dense per segment
    per_seg = got.groupBy("segment_id").agg(
        F.count("*").alias("n"), F.min("offset").alias("lo"), F.max("offset").alias("hi")
    )
    for r in per_seg.collect():
        assert r["lo"] == 0 and r["hi"] == r["n"] - 1


def test_per_key_order_preserved(store, events):
    _mk(store)
    # two batches, order must hold across commits (ReadWriteTest)
    e = events.orderBy("event_id")
    store.write_events("s", "ev", e.filter(F.col("event_id") < 400), routing_key_col="user_id")
    store.write_events("s", "ev", e.filter(F.col("event_id") >= 400), routing_key_col="user_id")
    got = store.read("s", "ev")
    w = Window.partitionBy("routing_key").orderBy("segment_id", "offset")
    viol = (
        got.withColumn("prev", F.lag("event_id").over(w))
        .filter(F.col("prev") > F.col("event_id"))
        .count()
    )
    assert viol == 0


def test_streamcut_bounded_read(store, events):
    _mk(store)
    store.write_events("s", "ev", events.limit(500), routing_key_col="user_id")
    head = store.head_stream_cut("s", "ev")
    mid = store.get_next_stream_cut("s", "ev", head, 20)
    tail = store.tail_stream_cut("s", "ev")
    first = store.read("s", "ev", from_cut=head, to_cut=mid)
    rest = store.read("s", "ev", from_cut=mid, to_cut=tail)
    assert first.count() + rest.count() == 500
    assert first.count() == head.distance_to(mid)
    # no overlap
    a = {(r["segment_id"], r["offset"]) for r in first.select("segment_id", "offset").collect()}
    b = {(r["segment_id"], r["offset"]) for r in rest.select("segment_id", "offset").collect()}
    assert not (a & b)


def test_exactly_once_writer_retry(store, events):
    _mk(store)
    batch = events.limit(100)
    store.write_events("s", "ev", batch, routing_key_col="user_id", writer_id="w1", batch_seq=1)
    # duplicate retry of the same batch_seq is a no-op
    store.write_events("s", "ev", batch, routing_key_col="user_id", writer_id="w1", batch_seq=1)
    assert store.read("s", "ev").count() == 100
    store.write_events("s", "ev", batch, routing_key_col="user_id", writer_id="w1", batch_seq=2)
    assert store.read("s", "ev").count() == 200


def test_fetch_event_pointer(store, events):
    _mk(store)
    store.write_events("s", "ev", events.limit(50), routing_key_col="user_id")
    some = store.read("s", "ev").limit(1).collect()[0]
    again = store.fetch_event("s", "ev", some["segment_id"], some["offset"]).collect()
    assert len(again) == 1
    assert again[0]["event_id"] == some["event_id"]


def test_truncate_then_read_raises(store, events):
    _mk(store)
    store.write_events("s", "ev", events.limit(200), routing_key_col="user_id")
    cut = store.get_next_stream_cut("s", "ev", store.head_stream_cut("s", "ev"), 5)
    store.truncate_stream("s", "ev", cut)
    # full read now starts at the new head
    n_after = store.read("s", "ev").count()
    assert n_after == 200 - sum(cut.positions.values())
    with pytest.raises(TruncatedDataException):
        store.read("s", "ev", from_cut=StreamCut.of({sid: 0 for sid in cut.positions if cut.positions[sid] > 0}))


def test_seal_blocks_writes(store, events):
    _mk(store)
    store.write_events("s", "ev", events.limit(10), routing_key_col="user_id")
    store.seal_stream("s", "ev")
    with pytest.raises(StreamSealedException):
        store.write_events("s", "ev", events.limit(10), routing_key_col="user_id")
    # reads still fine (sealed = bounded end)
    assert store.read("s", "ev").count() == 10


def test_ddl_lifecycle(store):
    store.create_scope("s")
    assert store.list_scopes() == ["s"]
    cfg = StreamConfiguration(scaling=ScalingPolicy.fixed(2), tags=("t1",))
    assert store.create_stream("s", "a", cfg)
    assert not store.create_stream("s", "a", cfg)  # already exists
    store.create_stream("s", "b", StreamConfiguration())
    assert store.list_streams("s") == ["a", "b"]
    assert store.list_streams("s", tag="t1") == ["a"]
    assert store.get_stream_tags("s", "a") == ["t1"]
    store.seal_stream("s", "a")
    store.delete_stream("s", "a")
    assert store.list_streams("s") == ["b"]
    with pytest.raises(StreamNotFoundException):
        store.read("s", "zzz")


def test_stream_info_distance(store, events):
    _mk(store)
    store.write_events("s", "ev", events.limit(120), routing_key_col="user_id")
    info = store.get_stream_info("s", "ev")
    assert info.event_count == 120
    assert not info.sealed
    assert info.head_stream_cut.distance_to(info.tail_stream_cut) == 120


def test_time_to_position_cut(store, events):
    _mk(store)
    store.write_events("s", "ev", events.limit(400), routing_key_col="user_id", event_time_col="ts")
    # double cast via session-tz timestamp stays legal if the parquet was
    # read as TIMESTAMP_NTZ (Spark >=4.1 forbids direct NTZ->numeric casts)
    mid_ts = (
        events.limit(400)
        .agg(F.expr("percentile(cast(cast(ts as timestamp) as double), 0.5)"))
        .collect()[0][0]
    )
    import datetime

    cut = store.stream_cut_at_time("s", "ev", datetime.datetime.utcfromtimestamp(mid_ts))
    n = store.read("s", "ev", from_cut=cut).count()
    # roughly half the events are at/after the median timestamp
    assert 150 <= n <= 250
