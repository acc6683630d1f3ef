"""Segment attribute index (G6): per-segment key→long map with
Replace / ReplaceIfEquals (CAS) / Accumulate / Remove updates, atomic
with appends via the manifest commit.

Reference: contracts/SegmentApi.java:62 (AttributeUpdateCollection),
Attributes.java:61-137, SegmentAttributeBTreeIndex.java:81.
"""

import pytest

from pravega_spark.errors import BadAttributeUpdateException, StreamNotFoundException
from pravega_spark.store import StreamStore


@pytest.fixture()
def st(spark, tmp_path):
    s = StreamStore(spark, str(tmp_path / "root"))
    s.create_scope("sc")
    s.create_stream("sc", "s")
    return s


def _sid(st):
    return int(next(iter(st.meta.get_segments("sc", "s"))))


def test_replace_and_get(st):
    sid = _sid(st)
    attrs = st.update_attributes("sc", "s", sid, [("rate", "replace", 100)])
    assert attrs == {"rate": 100}
    assert st.get_attributes("sc", "s", sid) == {"rate": 100}
    assert st.get_attributes("sc", "s", sid, keys=["rate", "missing"]) == {"rate": 100}


def test_accumulate_and_remove(st):
    sid = _sid(st)
    st.update_attributes("sc", "s", sid, [("n", "accumulate", 5)])
    attrs = st.update_attributes("sc", "s", sid, [("n", "accumulate", 7)])
    assert attrs["n"] == 12
    attrs = st.update_attributes("sc", "s", sid, [("n", "remove", 0)])
    assert "n" not in attrs


def test_cas_semantics(st):
    sid = _sid(st)
    # NOT_EXISTS (expected=None) insert
    st.update_attributes("sc", "s", sid, [("v", "replace_if_equals", 1, None)])
    # CAS with matching expected
    st.update_attributes("sc", "s", sid, [("v", "replace_if_equals", 2, 1)])
    # CAS with stale expected fails and applies NOTHING from the batch
    with pytest.raises(BadAttributeUpdateException):
        st.update_attributes(
            "sc", "s", sid, [("other", "replace", 9), ("v", "replace_if_equals", 3, 1)]
        )
    attrs = st.get_attributes("sc", "s", sid)
    assert attrs == {"v": 2}  # neither 'other' nor the failed CAS landed


def test_unknown_segment_raises(st):
    with pytest.raises(StreamNotFoundException):
        st.update_attributes("sc", "s", 999_999, [("x", "replace", 1)])
    with pytest.raises(StreamNotFoundException):
        st.get_attributes("sc", "s", 999_999)


def test_attributes_atomic_with_append(st):
    sid = _sid(st)
    st.append_events(
        "sc", "s", [{"routing_key": "k", "v": 1}],
        attribute_updates={sid: [("events_seen", "accumulate", 1)]},
    )
    assert st.get_attributes("sc", "s", sid)["events_seen"] == 1
    assert st.read("sc", "s").count() == 1
    # failed CAS aborts the WHOLE commit: no data, no attributes
    with pytest.raises(BadAttributeUpdateException):
        st.append_events(
            "sc", "s", [{"routing_key": "k", "v": 2}],
            attribute_updates={sid: [("events_seen", "replace_if_equals", 9, 42)]},
        )
    assert st.read("sc", "s").count() == 1  # second append invisible
    assert st.get_attributes("sc", "s", sid)["events_seen"] == 1
    assert st.fsck_stream("sc", "s")  # the aborted commit's file is reaped


def test_attributes_survive_data_commits_and_compaction(st):
    sid = _sid(st)
    st.update_attributes("sc", "s", sid, [("marker", "replace", 7)])
    st.append_events("sc", "s", [{"routing_key": "k", "v": 1}])
    st.compact_stream("sc", "s")
    assert st.get_attributes("sc", "s", sid)["marker"] == 7
