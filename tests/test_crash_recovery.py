"""Commit atomicity under crashes (DurableLogTests / recovery analogue).

The manifest protocol's contract: a crash between the parquet append and
the segments-doc write leaves orphan files that NO reader sees, and a
retried commit lands the same rows exactly once. Crashes are injected by
making the metadata write raise mid-commit.
"""

import pytest
from pyspark.sql import functions as F

from pravega_spark.config import ScalingPolicy, StreamConfiguration
from pravega_spark.errors import TxnFailedException


def _env(events, lo, hi):
    return events.filter(F.col("event_id").between(lo, hi)).select(
        F.col("user_id").cast("string").alias("routing_key"),
        F.col("ts").alias("event_time"),
        F.to_json(F.struct("event_id", "value")).cast("binary").alias("payload"),
    )


def _ids(df):
    return sorted(
        r[0]
        for r in df.select(
            F.get_json_object(F.col("payload").cast("string"), "$.event_id").cast("long")
        ).collect()
    )


class _Boom(RuntimeError):
    pass


def _crash_next_doc_write(store, monkeypatch):
    """Arm a one-shot crash on the next segments-doc write."""
    real = store.meta.put_segments_doc
    state = {"armed": True}

    def crashing(scope, stream, doc, expected_version=None):
        if state["armed"]:
            state["armed"] = False
            raise _Boom("crash before visibility flip")
        return real(scope, stream, doc, expected_version=expected_version)

    monkeypatch.setattr(store.meta, "put_segments_doc", crashing)


def test_crash_between_append_and_manifest_is_invisible_and_retryable(store, events, monkeypatch):
    store.create_scope("s")
    store.create_stream("s", "ev", StreamConfiguration(scaling=ScalingPolicy.fixed(4)))
    store.write_events("s", "ev", _env(events, 0, 49))
    assert store.read("s", "ev").count() == 50

    _crash_next_doc_write(store, monkeypatch)
    with pytest.raises(_Boom):
        store.write_events("s", "ev", _env(events, 50, 79))
    # orphan parquet files exist, but readers see only the manifest
    assert store.read("s", "ev").count() == 50
    orphans = store.fsck_stream("s", "ev")
    assert orphans  # the crashed batch's files were on disk

    # retry commits exactly once — same offsets, no duplicates
    store.write_events("s", "ev", _env(events, 50, 79))
    assert _ids(store.read("s", "ev")) == list(range(80))


def test_crashed_retry_without_fsck_never_duplicates(store, events, monkeypatch):
    """Even with orphans still on disk, a retry cannot double-count."""
    store.create_scope("s")
    store.create_stream("s", "ev", StreamConfiguration(scaling=ScalingPolicy.fixed(2)))
    _crash_next_doc_write(store, monkeypatch)
    with pytest.raises(_Boom):
        store.write_events("s", "ev", _env(events, 0, 99))
    store.write_events("s", "ev", _env(events, 0, 99))  # no fsck first
    assert _ids(store.read("s", "ev")) == list(range(100))
    assert store.fsck_stream("s", "ev")  # orphans reaped afterwards


def test_txn_commit_crash_then_retry_applies_once(store, events, monkeypatch):
    store.create_scope("s")
    store.create_stream("s", "ev", StreamConfiguration(scaling=ScalingPolicy.fixed(2)))
    txn = store.begin_txn("s", "ev")
    txn.write_events(_env(events, 0, 59))

    # crash AFTER data+marker commit, before the txn status flip
    real = store.meta.put_txn_doc
    state = {"armed": True}

    def crashing(scope, stream, doc):
        if state["armed"] and any(t.get("status") == "COMMITTED" for t in doc.values()):
            state["armed"] = False
            raise _Boom("crash before txn status flip")
        return real(scope, stream, doc)

    monkeypatch.setattr(store.meta, "put_txn_doc", crashing)
    with pytest.raises(_Boom):
        txn.commit()
    # data IS committed (marker landed with it); txn doc still says OPEN
    assert store.read("s", "ev").count() == 60
    assert txn.status() == "OPEN"
    # retried commit sees the marker: finalizes status, no double-apply
    txn.commit()
    assert txn.status() == "COMMITTED"
    assert _ids(store.read("s", "ev")) == list(range(60))


def test_writer_seq_dedup_survives_crash(store, events, monkeypatch):
    """(writer_id, batch_seq) marker commits atomically with the data, so
    a crashed-then-retried sink batch is deduped, not replayed."""
    store.create_scope("s")
    store.create_stream("s", "ev", StreamConfiguration(scaling=ScalingPolicy.fixed(2)))
    store.write_events("s", "ev", _env(events, 0, 29), writer_id="w1", batch_seq=0)
    # replay of the same batch_seq is a no-op
    store.write_events("s", "ev", _env(events, 0, 29), writer_id="w1", batch_seq=0)
    assert store.read("s", "ev").count() == 30

    _crash_next_doc_write(store, monkeypatch)
    with pytest.raises(_Boom):
        store.write_events("s", "ev", _env(events, 30, 59), writer_id="w1", batch_seq=1)
    # neither data nor marker landed — retry applies exactly once
    store.write_events("s", "ev", _env(events, 30, 59), writer_id="w1", batch_seq=1)
    store.write_events("s", "ev", _env(events, 30, 59), writer_id="w1", batch_seq=1)
    assert _ids(store.read("s", "ev")) == list(range(60))


def test_compaction_preserves_visibility_and_reaps(store, events):
    store.create_scope("s")
    store.create_stream("s", "ev", StreamConfiguration(scaling=ScalingPolicy.fixed(2)))
    for i in range(3):  # several commits -> several files per segment
        store.write_events("s", "ev", _env(events, i * 20, i * 20 + 19))
    # get_next_stream_cut advances each segment by up to `distance`
    cut = store.get_next_stream_cut("s", "ev", store.head_stream_cut("s", "ev"), 10)
    truncated = store.head_stream_cut("s", "ev").distance_to(cut)
    store.truncate_stream("s", "ev", cut)
    before = _ids(store.read("s", "ev"))
    assert len(before) == 60 - truncated
    store.compact_stream("s", "ev")
    assert _ids(store.read("s", "ev")) == before
    assert store.fsck_stream("s", "ev") == []  # nothing dangling
