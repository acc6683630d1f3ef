"""Seeded chaos over the r9 hot-append protocol with a strict oracle.

One routing key (one segment), a single-threaded driver issuing a
random mix of appends, injected mid-payload crashes, client retries,
reservation expiry, fsck, truncation and compaction. Because ops are
sequential and the segment is single, the exact expected state is the
concatenation of the successful appends' rows (crash repair shifts
offsets but preserves relative order) with the truncated head removed —
a total-order oracle, not just set equality. Three seeds keep the
space covered while staying deterministic."""

import os
import random
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pravega_spark.config import ScalingPolicy, StreamConfiguration  # noqa: E402


class _Boom(RuntimeError):
    pass


@pytest.mark.parametrize("seed", [7, 23, 1009])
def test_chaos_single_segment_total_order(spark, tmp_path, monkeypatch, seed):
    import pravega_spark.store as store_mod
    from pravega_spark.store import StreamStore
    from pravega_spark.streamcut import StreamCut

    rng = random.Random(seed)
    store = StreamStore(spark, str(tmp_path / f"chaos{seed}"))
    store.create_scope("s")
    store.create_stream("s", "ev", StreamConfiguration(scaling=ScalingPolicy.fixed(1)))

    crash_next = {"on": False}
    orig = StreamStore._write_hot_batch

    def maybe_crash(self, tbl, seg_arr, bases, path, tag):
        if crash_next["on"]:
            crash_next["on"] = False
            raise _Boom("chaos crash")
        return orig(self, tbl, seg_arr, bases, path, tag)

    monkeypatch.setattr(StreamStore, "_write_hot_batch", maybe_crash)

    expected: list[str] = []  # total order of committed values
    head = 0
    seqs: dict[str, int] = {}
    vid = 0

    def do_append(crash: bool):
        nonlocal vid
        w = f"w{rng.randrange(3)}"
        n = rng.randrange(1, 5)
        rows = [{"routing_key": "k", "v": f"{vid + i}"} for i in range(n)]
        seq = seqs.get(w, -1) + 1
        if crash:
            crash_next["on"] = True
            with pytest.raises(_Boom):
                store.append_events("s", "ev", rows, writer_id=w, batch_seq=seq)
            # client retry semantics: the same batch retries until acked
            # (the dead reservation blocks the same writer until expiry,
            # which the retry triggers itself under grace=-1 below)
            monkeypatch.setattr(store_mod, "RESERVATION_GRACE_MS", -1)
            try:
                store.append_events("s", "ev", rows, writer_id=w, batch_seq=seq)
            finally:
                monkeypatch.setattr(store_mod, "RESERVATION_GRACE_MS", 30_000)
        else:
            store.append_events("s", "ev", rows, writer_id=w, batch_seq=seq)
        seqs[w] = seq
        expected.extend(r["v"] for r in rows)
        vid += n

    for _ in range(60):
        op = rng.random()
        if op < 0.5:
            do_append(crash=False)
        elif op < 0.7:
            do_append(crash=True)
        elif op < 0.8 and len(expected) - head > 2:
            head += rng.randrange(1, min(3, len(expected) - head))
            store.truncate_stream("s", "ev", StreamCut({0: head}))
        elif op < 0.9:
            store.fsck_stream("s", "ev")
        else:
            store.compact_stream("s", "ev")

    # settle: expire any stranded state, repair, verify the total order
    monkeypatch.setattr(store_mod, "RESERVATION_GRACE_MS", -1)
    store.fsck_stream("s", "ev")
    store.fsck_stream("s", "ev")
    doc = store.meta.segments_doc("s", "ev")
    assert not doc.get("reservations") and not doc.get("pending")
    rows = sorted(
        ((r["offset"], r["v"]) for r in store.read("s", "ev").select("offset", "v").collect())
    )
    assert [o for o, _ in rows] == list(range(head, len(expected)))
    assert [v for _, v in rows] == expected[head:]
    store.fsck_stream("s", "ev")
    assert store.fsck_stream("s", "ev") == []


@pytest.mark.parametrize("seed", [11, 47])
def test_chaos_multi_segment_with_scale_per_key_order(spark, tmp_path, monkeypatch, seed):
    """Chaos across MULTIPLE segments and scale epochs: random appends
    over 8 routing keys, injected crashes + retries, reservation expiry,
    fsck, and mid-run segment SPLITS. Invariants: (a) the visible value
    set is exactly the acked set (exactly-once through repairs and
    epoch seams), (b) per ROUTING KEY, reading in (epoch, offset) order
    reproduces ack order — the reference's per-key order contract —
    and (c) every segment's offsets are contiguous from 0."""
    import pravega_spark.store as store_mod
    from pravega_spark.store import StreamStore

    rng = random.Random(seed)
    store = StreamStore(spark, str(tmp_path / f"mchaos{seed}"))
    store.create_scope("s")
    store.create_stream("s", "ev", StreamConfiguration(scaling=ScalingPolicy.fixed(2)))

    crash_next = {"on": False}
    orig = StreamStore._write_hot_batch

    def maybe_crash(self, tbl, seg_arr, bases, path, tag):
        if crash_next["on"]:
            crash_next["on"] = False
            raise _Boom("chaos crash")
        return orig(self, tbl, seg_arr, bases, path, tag)

    monkeypatch.setattr(StreamStore, "_write_hot_batch", maybe_crash)

    by_key: dict[str, list[str]] = {}
    seqs: dict[str, int] = {}
    vid = 0

    def do_append(crash: bool):
        nonlocal vid
        w = f"w{rng.randrange(2)}"
        rows = []
        for i in range(rng.randrange(1, 6)):
            k = f"k{rng.randrange(8)}"
            rows.append({"routing_key": k, "v": f"{vid}"})
            vid += 1
        seq = seqs.get(w, -1) + 1
        if crash:
            crash_next["on"] = True
            with pytest.raises(_Boom):
                store.append_events("s", "ev", rows, writer_id=w, batch_seq=seq)
            monkeypatch.setattr(store_mod, "RESERVATION_GRACE_MS", -1)
            try:
                store.append_events("s", "ev", rows, writer_id=w, batch_seq=seq)
            finally:
                monkeypatch.setattr(store_mod, "RESERVATION_GRACE_MS", 30_000)
        else:
            store.append_events("s", "ev", rows, writer_id=w, batch_seq=seq)
        seqs[w] = seq
        for r in rows:
            by_key.setdefault(r["routing_key"], []).append(r["v"])

    for step in range(50):
        op = rng.random()
        if op < 0.55:
            do_append(crash=False)
        elif op < 0.75:
            do_append(crash=True)
        elif op < 0.85:
            store.fsck_stream("s", "ev")
        else:
            # split the hottest active segment at its midpoint
            segs = store.current_segments("s", "ev")
            tails = store.meta.tail_offsets("s", "ev")
            hot = max(segs, key=lambda s: tails.get(s["segment_id"], 0))
            lo, hi = hot["key_start"], hot["key_end"]
            store.scale_stream("s", "ev", [hot["segment_id"]], [(lo, (lo + hi) / 2), ((lo + hi) / 2, hi)])

    monkeypatch.setattr(store_mod, "RESERVATION_GRACE_MS", -1)
    store.fsck_stream("s", "ev")
    store.fsck_stream("s", "ev")
    doc = store.meta.segments_doc("s", "ev")
    assert not doc.get("reservations") and not doc.get("pending")

    got = store.read("s", "ev").select("routing_key", "segment_id", "offset", "v").collect()
    # (a) exactly-once value set
    assert sorted(int(r["v"]) for r in got) == sorted(
        int(v) for vs in by_key.values() for v in vs
    )
    # (b) per-key order across epoch seams: epoch is the segment id's
    # high 32 bits, and within a key the (epoch, offset) order must
    # reproduce ack order
    per_key: dict[str, list[tuple[int, int, str]]] = {}
    for r in got:
        per_key.setdefault(r["routing_key"], []).append(
            (r["segment_id"] >> 32, r["offset"], r["v"])
        )
    for k, entries in per_key.items():
        ordered = [v for _, _, v in sorted(entries, key=lambda e: (e[0], e[1]))]
        assert ordered == by_key[k], f"per-key order broken for {k}"
    # (c) per-segment contiguity
    per_seg: dict[int, list[int]] = {}
    for r in got:
        per_seg.setdefault(r["segment_id"], []).append(r["offset"])
    for sid, offs in per_seg.items():
        assert sorted(offs) == list(range(len(offs))), f"segment {sid} has gaps"
    assert store.fsck_stream("s", "ev") == []
