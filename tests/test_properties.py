"""Property-based invariants (hypothesis) for the algebra cores.

The reference asserts these as scenario invariants (SURVEY §5: ordering
per key, positions after scale, truncation visibility); here the pure
driver-side algebra gets direct property coverage — no SparkSession
needed, so these run in milliseconds.
"""

from __future__ import annotations

import json

from hypothesis import given, settings
from hypothesis import strategies as st

from pravega_spark.hashing import hash_to_range_py, segment_for_key_py
from pravega_spark.streamcut import StreamCut

keys = st.text(min_size=0, max_size=64)
positions = st.dictionaries(st.integers(0, 1 << 40), st.integers(0, 1 << 50), max_size=8)


@given(keys)
def test_hash_in_unit_interval(k):
    h = hash_to_range_py(k)
    assert 0.0 <= h < 1.0


@given(keys)
def test_hash_deterministic(k):
    assert hash_to_range_py(k) == hash_to_range_py(k)


@st.composite
def range_sets(draw):
    """A valid active-segment range set: contiguous cover of [0,1)."""
    n = draw(st.integers(1, 8))
    cuts = sorted(draw(st.sets(st.floats(0.01, 0.99), min_size=n - 1, max_size=n - 1)))
    bounds = [0.0, *cuts, 1.0]
    return [(i, bounds[i], bounds[i + 1]) for i in range(len(bounds) - 1)]


@given(keys, range_sets())
def test_segment_assignment_total_and_stable(k, ranges):
    """Every key maps to exactly one active segment, deterministically,
    and the owning range really contains the hash (per-key order derives
    from this: one key ↦ one segment per epoch)."""
    sid = segment_for_key_py(k, ranges)
    assert sid in {r[0] for r in ranges}
    assert sid == segment_for_key_py(k, ranges)
    h = hash_to_range_py(k)
    seg = next(r for r in ranges if r[0] == sid)
    assert seg[1] <= h < seg[2] or (sid == ranges[-1][0] and h >= ranges[-1][1])


@given(keys, range_sets())
def test_split_preserves_assignment_of_other_keys(k, ranges):
    """Scale correctness seed: splitting one segment never reroutes keys
    that hash outside the split range (epoch change moves only the keys
    of the split segment — SURVEY §2.4 S4)."""
    owner = segment_for_key_py(k, ranges)
    # split the first segment that is NOT the owner
    for seg_id, lo, hi in ranges:
        if seg_id != owner:
            mid = (lo + hi) / 2
            new_ranges = [r for r in ranges if r[0] != seg_id]
            nxt = max(r[0] for r in ranges) + 1
            new_ranges += [(nxt, lo, mid), (nxt + 1, mid, hi)]
            assert segment_for_key_py(k, new_ranges) == owner
            break


@given(positions)
def test_streamcut_json_roundtrip(pos):
    cut = StreamCut.of(pos)
    back = StreamCut.from_json(cut.to_json())
    assert back.positions == cut.positions
    assert json.loads(cut.to_json())  # valid JSON document


@given(positions, positions)
def test_streamcut_distance_antisymmetric(a, b):
    ca, cb = StreamCut.of(a), StreamCut.of(b)
    assert ca.distance_to(cb) == -cb.distance_to(ca)
    assert ca.distance_to(ca) == 0


@given(positions, positions)
def test_streamcut_covers_before_partial_order(a, b):
    ca, cb = StreamCut.of(a), StreamCut.of(b)
    assert ca.covers_before(ca)
    if ca.covers_before(cb) and cb.covers_before(ca):
        shared = set(a) & set(b)
        assert all(a[s] == b[s] for s in shared)


@settings(max_examples=25)
@given(positions, st.integers(0, 1000))
def test_streamcut_advance_monotone(pos, d):
    """Advancing a cut by a nonnegative distance never regresses."""
    cut = StreamCut.of(pos)
    advanced = StreamCut.of({s: o + d for s, o in pos.items()})
    assert cut.covers_before(advanced)
    assert cut.distance_to(advanced) == d * len(pos)
