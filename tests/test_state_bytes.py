"""Revisioned stream CAS, StateSynchronizer fold/compact, byte streams."""

import pytest

from pravega_spark.bytestream import ByteStreamReader, ByteStreamWriter
from pravega_spark.errors import ConditionalCheckFailedException, TruncatedDataException
from pravega_spark.state import RevisionedStreamClient, StateSynchronizer


def test_conditional_write_cas(tmp_path):
    c = RevisionedStreamClient(str(tmp_path), "s", "log")
    assert c.fetch_latest_revision() == 0
    r1 = c.write_conditionally(0, {"x": 1})
    assert r1 == 1
    with pytest.raises(ConditionalCheckFailedException):
        c.write_conditionally(0, {"x": 2})  # stale revision loses
    r2 = c.write_conditionally(r1, {"x": 2})
    assert c.read_from(0) == [(1, {"x": 1}), (2, {"x": 2})]
    assert c.read_range(0, 1) == [(1, {"x": 1})]
    assert c.read_from(r2) == []


def test_mark_cas(tmp_path):
    c = RevisionedStreamClient(str(tmp_path), "s", "log")
    assert c.get_mark() is None
    assert c.compare_and_set_mark(None, 5)
    assert not c.compare_and_set_mark(3, 7)
    assert c.compare_and_set_mark(5, 7)
    assert c.get_mark() == 7


def test_state_synchronizer_fold_and_compact(tmp_path):
    c = RevisionedStreamClient(str(tmp_path), "s", "state")
    sync = StateSynchronizer(c, initial_state=0, apply=lambda s, u: s + u)
    sync.update_state(lambda s: [5])
    sync.update_state(lambda s: [10, 1])
    assert sync.get_state() == 16
    # a second synchronizer converges from the log
    sync2 = StateSynchronizer(c, 0, lambda s, u: s + u)
    assert sync2.get_state() == 16
    sync.compact()
    # r6: a multi-update list is ONE atomic revision (all-or-nothing
    # batch), so the log is 2 update revisions + the snapshot
    assert c.fetch_latest_revision() == 3
    assert len(c.read_from(0)) == 1  # history truncated to the snapshot
    sync3 = StateSynchronizer(c, 0, lambda s, u: s + u)
    assert sync3.get_state() == 16
    sync3.update_state(lambda s: [4])
    assert sync3.get_state() == 20
    assert sync.get_state() == 20  # first instance catches up


def test_bytestream_write_read_seek(tmp_path, spark):
    w = ByteStreamWriter(str(tmp_path), "s", "b")
    assert w.write(b"hello ") == 0
    assert w.write(b"world") == 6
    r = ByteStreamReader(str(tmp_path), "s", "b")
    assert r.fetch_tail_offset() == 11
    assert r.read(0, 11) == b"hello world"
    assert r.read(3, 5) == b"lo wo"  # cross-chunk seek+read
    assert r.available(6) == 5
    df = r.as_dataframe(spark)
    assert df.count() == 2  # two chunks
    w.truncate_data_before(6)
    assert r.fetch_head_offset() == 6
    assert r.read(6, 5) == b"world"
    with pytest.raises(TruncatedDataException):
        r.read(0, 3)
    w.close_and_seal()
    from pravega_spark.errors import StreamSealedException

    with pytest.raises(StreamSealedException):
        w.write(b"!")


def test_revisioned_cas_race(tmp_path):
    """Two writers racing the same expected revision: exactly one wins
    per revision; the log is a gap-free sequence (optimistic-concurrency
    contract of RevisionedStreamClient.writeConditionally)."""
    import threading

    from pravega_spark.errors import ConditionalCheckFailedException
    from pravega_spark.state import RevisionedStreamClient

    rc = RevisionedStreamClient(str(tmp_path / "st"), "s", "race")
    wins, losses = [], []

    def writer(tag):
        for _ in range(20):
            try:
                rev = rc.write_conditionally(rc.fetch_latest_revision(), tag)
                wins.append((rev, tag))
            except ConditionalCheckFailedException:
                losses.append(tag)

    ts = [threading.Thread(target=writer, args=(f"w{i}",)) for i in range(3)]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    revisions = sorted(r for r, _ in wins)
    # no duplicate revision ever acked to two writers
    assert len(revisions) == len(set(revisions))
    # the surviving log is exactly the acked sequence, in order
    log = rc.read_from(0)
    assert [r for r, _ in log] == list(range(1, rc.fetch_latest_revision() + 1))
