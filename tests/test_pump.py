"""Streaming pump fast path (write_stream_batch(passthrough_from=rg)).

The pump serves pure stream-to-stream copy triggers driver-side from the
source's committed files (reference shape: EventStreamReaderImpl.java's
readNextEvent tail loop feeding a writer) — these tests pin that it
produces EXACTLY what the normal Spark path produces, declines when its
preconditions fail, and stays exactly-once under foreachBatch retries.
"""

import time

import pravega_spark.streaming.sink as sink_mod
from pravega_spark.config import ScalingPolicy, StreamConfiguration
from pravega_spark.sources import load_table
from pravega_spark.streaming import ReaderGroup, write_stream_batch

SF_DIR = "/root/testdata/sf0.001"


def _setup(store, streams=("src", "dst")):
    store.create_scope("s")
    for name in streams:
        store.create_stream("s", name, StreamConfiguration(scaling=ScalingPolicy.fixed(4)))


def _key_seqs(store, scope, stream):
    rows = store.read(scope, stream).orderBy("segment_id", "offset").collect()
    out: dict = {}
    for r in rows:
        out.setdefault(r["routing_key"], []).append(r["event_time"])
    return out


def _run_capped(store, rg, sink, n_target, cap):
    q = (
        rg.read_stream(max_events_per_trigger=cap)
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", rg.checkpoint_dir)
        .trigger(processingTime="0 seconds")
        .start()
    )
    deadline = time.time() + 120
    try:
        while time.time() < deadline:
            if q.exception() is not None:
                raise q.exception()
            if sum(store.meta.tail_offsets("s", "dst").values()) >= n_target:
                break
            time.sleep(0.1)
    finally:
        q.stop()
        q.awaitTermination(30)


def _spy(monkeypatch):
    """Record pump outcomes. Every successful pump copy — verified or
    steady-state — funnels through ``_pump_commit`` (r7 split), so that
    is the one seam whose True entries mean 'the pump served this
    batch'. ``_pump_batch`` declines (False) are recorded too so the
    oversized/fallback assertions keep their meaning."""
    hits = []
    orig_commit = sink_mod._pump_commit
    orig_batch = sink_mod._pump_batch

    def spy_commit(*a, **k):
        r = orig_commit(*a, **k)
        hits.append(r)
        return r

    def spy_batch(*a, **k):
        r = orig_batch(*a, **k)
        if r is False:
            hits.append(False)
        return r

    monkeypatch.setattr(sink_mod, "_pump_commit", spy_commit)
    monkeypatch.setattr(sink_mod, "_pump_batch", spy_batch)
    return hits


def test_pump_matches_normal_path(spark, store, monkeypatch):
    """Same src drained through the pump and through the normal path:
    identical content and per-key order."""
    _setup(store, ("src", "dst", "dst2"))
    ev = load_table(spark, SF_DIR, "events").limit(400)
    n = ev.count()
    store.write_event("s", "src", "seed", {"payload": b"s"})
    rg = ReaderGroup(store, "s", "src", "g-pump")
    hits = _spy(monkeypatch)
    sink = write_stream_batch(store, "s", "dst", writer_id="wp", passthrough_from=rg)
    rg.drain(sink)  # seed
    store.write_events("s", "src", ev, routing_key_col="user_id", event_time_col="ts")
    _run_capped(store, rg, sink, n + 1, cap=max(1, n // 16))
    assert True in hits, "pump never engaged"
    # normal path into dst2 via a second group
    rg2 = ReaderGroup(store, "s", "src", "g-norm")
    sink2 = write_stream_batch(store, "s", "dst2", writer_id="wn")
    rg2.drain(sink2)
    assert store.read("s", "dst").count() == n + 1
    assert _key_seqs(store, "s", "dst") == _key_seqs(store, "s", "dst2")


def test_pump_declines_on_projection(spark, store, monkeypatch):
    """A projected pipeline fails the envelope-column check: every
    trigger falls back to the Spark path, and the query still succeeds."""
    _setup(store)
    ev = load_table(spark, SF_DIR, "events").limit(100)
    n = ev.count()
    store.write_events("s", "src", ev, routing_key_col="user_id", event_time_col="ts")
    rg = ReaderGroup(store, "s", "src", "g-proj")
    hits = _spy(monkeypatch)
    sink = write_stream_batch(store, "s", "dst", writer_id="w", passthrough_from=rg)

    def projected_sink(df, b):
        sink(df.select("routing_key", "event_time", "payload",
                       "segment_id", "offset", "ingest_time"), b)

    q = (
        rg.read_stream()
        .writeStream.foreachBatch(projected_sink)
        .option("checkpointLocation", rg.checkpoint_dir)
        .trigger(processingTime="0 seconds")
        .start()
    )
    deadline = time.time() + 120
    try:
        while time.time() < deadline:
            if q.exception() is not None:
                raise q.exception()
            if sum(store.meta.tail_offsets("s", "dst").values()) >= n:
                break
            time.sleep(0.1)
    finally:
        q.stop()
        q.awaitTermination(30)
    assert store.read("s", "dst").count() == n
    assert True not in hits, "pump must not engage on a reordered projection"


def test_pump_exactly_once_on_replayed_batch(spark, store, monkeypatch):
    """Re-invoking the sink with an already-committed batch id (a
    foreachBatch retry) is a no-op on both pump and fallback paths."""
    _setup(store)
    ev = load_table(spark, SF_DIR, "events").limit(200)
    n = ev.count()
    store.write_event("s", "src", "seed", {"payload": b"s"})
    rg = ReaderGroup(store, "s", "src", "g-retry")
    sink = write_stream_batch(store, "s", "dst", writer_id="w", passthrough_from=rg)
    rg.drain(sink)
    store.write_events("s", "src", ev, routing_key_col="user_id", event_time_col="ts")
    seen = []

    def recording_sink(df, b):
        sink(df, b)
        seen.append((df, b))

    _run_capped(store, rg, sink=recording_sink, n_target=n + 1, cap=max(1, n // 8))
    total = store.read("s", "dst").count()
    assert total == n + 1
    # replay the last two batches — counts must not move
    for df, b in seen[-2:]:
        sink(df, b)
    assert store.read("s", "dst").count() == total


def test_pump_declines_oversized_slice(spark, store, monkeypatch):
    """Slices above HOT_MAX_ROWS take the distributed path (driver
    memory stays bounded); result is still complete."""
    import pravega_spark.store as store_mod

    _setup(store)
    ev = load_table(spark, SF_DIR, "events").limit(300)
    n = ev.count()
    store.write_event("s", "src", "seed", {"payload": b"s"})
    rg = ReaderGroup(store, "s", "src", "g-big")
    hits = _spy(monkeypatch)
    sink = write_stream_batch(store, "s", "dst", writer_id="w", passthrough_from=rg)
    rg.drain(sink)
    store.write_events("s", "src", ev, routing_key_col="user_id", event_time_col="ts")
    monkeypatch.setattr(store_mod, "HOT_MAX_ROWS", 10)
    _run_capped(store, rg, sink, n + 1, cap=max(1, n // 8))
    assert store.read("s", "dst").count() == n + 1
    assert True not in hits[1:], "oversized slices must decline the pump"


def test_pump_serves_batch0_catchup(spark, store, monkeypatch):
    """A fresh group's batch 0 (start = stream heads) pumps too when the
    backlog fits HOT_MAX_ROWS — the point is that batch 0's bounds are
    recomputable from initialOffset. Verification is off to isolate the
    plain (non-verified) pump path; the verified-trigger variants are
    covered by the purity-guard and crash-replay tests."""
    monkeypatch.setenv("PRAVEGA_SPARK_PUMP_VERIFY", "never")
    _setup(store)
    ev = load_table(spark, SF_DIR, "events").limit(150)
    n = ev.count()
    store.write_events("s", "src", ev, routing_key_col="user_id", event_time_col="ts")
    rg = ReaderGroup(store, "s", "src", "g-b0")
    hits = _spy(monkeypatch)
    sink = write_stream_batch(store, "s", "dst", writer_id="w", passthrough_from=rg)
    rg.drain(sink)
    assert hits and hits[0] is True, hits
    assert store.read("s", "dst").count() == n
    assert _key_seqs(store, "s", "src") == _key_seqs(store, "s", "dst")


def test_pump_purity_guard_catches_filter(spark, store, monkeypatch):
    """A FILTERED pipeline passes the envelope-column check (columns are
    unchanged) — only the r6 runtime row-count guard can catch it. The
    sink must warn, permanently fall back to the Spark path, and write
    the FILTERED rows (never the unfiltered slice)."""
    import warnings

    _setup(store)
    ev = load_table(spark, SF_DIR, "events").limit(200)
    n = ev.count()
    store.write_events("s", "src", ev, routing_key_col="user_id", event_time_col="ts")
    expected_rows = store.read("s", "src").filter("pmod(offset, 2) = 0").count()
    assert 0 < expected_rows < n  # the filter must actually drop rows
    rg = ReaderGroup(store, "s", "src", "g-filter")
    hits = _spy(monkeypatch)
    sink = write_stream_batch(store, "s", "dst", writer_id="w", passthrough_from=rg)

    def filtered_sink(df, b):
        sink(df.filter("pmod(offset, 2) = 0"), b)

    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        q = (
            rg.read_stream()
            .writeStream.foreachBatch(filtered_sink)
            .option("checkpointLocation", rg.checkpoint_dir)
            .trigger(processingTime="0 seconds")
            .start()
        )
        deadline = time.time() + 120
        try:
            while time.time() < deadline:
                if q.exception() is not None:
                    raise q.exception()
                if sum(store.meta.tail_offsets("s", "dst").values()) >= expected_rows:
                    break
                time.sleep(0.1)
        finally:
            q.stop()
            q.awaitTermination(30)
    assert True not in hits, "pump committed a miscopied (unfiltered) batch"
    assert any("purity violation" in str(w.message) for w in caught), (
        "guard did not warn on the filtered pipeline"
    )
    # the destination holds exactly the filtered rows — nothing miscopied
    assert store.read("s", "dst").count() == expected_rows


def test_pump_purity_guard_catches_payload_rewrite(spark, store, monkeypatch):
    """A count-PRESERVING rewrite (payload mutation, columns and row
    count unchanged) is invisible to the r6 count check — the r7
    content fingerprint must catch it: warn, permanently fall back to
    the Spark path, and write the REWRITTEN rows (never the raw slice
    bytes)."""
    import warnings

    from pyspark.sql import functions as F

    _setup(store)
    # real, asymmetric payload bytes — reversing them must change content
    # (the events-table envelope has NULL payloads, where a reverse is a
    # no-op the guard must NOT flag)
    n = 150
    events = [
        {"routing_key": str(i % 10), "payload": f"payload-{i:04d}".encode()}
        for i in range(n)
    ]
    store.append_events("s", "src", events, writer_id="seed", batch_seq=0)
    rg = ReaderGroup(store, "s", "src", "g-rewrite")
    hits = _spy(monkeypatch)
    sink = write_stream_batch(store, "s", "dst", writer_id="w", passthrough_from=rg)

    def rewriting_sink(df, b):
        mutated = df.withColumn("payload", F.reverse(F.col("payload"))).select(*df.columns)
        sink(mutated, b)

    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        q = (
            rg.read_stream()
            .writeStream.foreachBatch(rewriting_sink)
            .option("checkpointLocation", rg.checkpoint_dir)
            .trigger(processingTime="0 seconds")
            .start()
        )
        deadline = time.time() + 120
        try:
            while time.time() < deadline:
                if q.exception() is not None:
                    raise q.exception()
                if sum(store.meta.tail_offsets("s", "dst").values()) >= n:
                    break
                time.sleep(0.1)
        finally:
            q.stop()
            q.awaitTermination(30)
    assert True not in hits, "pump committed a miscopied (unmutated) batch"
    assert any("fingerprint" in str(w.message) for w in caught), (
        "guard did not warn on the count-preserving rewrite"
    )
    # destination holds the REWRITTEN payloads (Spark path), not raw bytes
    def _payloads(stream):
        rows = store.read("s", stream).select("payload").collect()
        return sorted(
            p if isinstance(p, bytes) else (bytes(p) if isinstance(p, bytearray) else p.encode())
            for p in (r["payload"] for r in rows)
        )

    src_payloads = _payloads("src")
    dst_payloads = _payloads("dst")
    assert len(dst_payloads) == n
    assert src_payloads != dst_payloads
    assert sorted(p[::-1] for p in src_payloads) == dst_payloads


def test_verified_trigger_crash_before_commit_is_exactly_once(spark, store, monkeypatch):
    """A crash between verification and the pump commit replays the
    trigger; the retry must verify again and commit exactly once."""
    _setup(store)
    ev = load_table(spark, SF_DIR, "events").limit(120)
    n = ev.count()
    store.write_events("s", "src", ev, routing_key_col="user_id", event_time_col="ts")
    rg = ReaderGroup(store, "s", "src", "g-crash-verify")
    sink = write_stream_batch(store, "s", "dst", writer_id="w", passthrough_from=rg)

    orig_commit = sink_mod._pump_commit
    crashed = {"n": 0}

    def crashing_commit(*a, **k):
        if crashed["n"] == 0:
            crashed["n"] += 1
            raise RuntimeError("injected crash before pump commit")
        return orig_commit(*a, **k)

    monkeypatch.setattr(sink_mod, "_pump_commit", crashing_commit)
    captured = []

    def capturing_sink(df, b):
        captured.append((df, b))
        sink(df, b)

    # first drain: the verified trigger's commit crashes; the sink's
    # foreachBatch error propagates and the query fails
    import pytest as _pytest

    with _pytest.raises(Exception):
        rg.drain(capturing_sink)
    assert crashed["n"] == 1
    # retry with a FRESH sink (a real crash restarts the process, so
    # guard state starts over): the replayed batch re-verifies through
    # _verified_pump and commits exactly once
    rg2 = ReaderGroup(store, "s", "src", "g-crash-verify")  # same checkpoint
    sink2 = write_stream_batch(store, "s", "dst", writer_id="w", passthrough_from=rg2)
    rg2.drain(sink2)
    assert store.read("s", "dst").count() == n
    # replaying the captured batch once more is a no-op (marker dedup)
    for df, b in captured[-1:]:
        sink2(df, b)
    assert store.read("s", "dst").count() == n
