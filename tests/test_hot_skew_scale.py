"""Hot-key skew scale scenario, end-to-end (VERDICT r4 item 5).

One hot key-range drives the full S2→S3→S4 pipeline — measured rates
(windowed over ingest_time) → threshold trigger → epoch split — with
writes continuing across the epoch boundary, then a StreamCut-bounded
read across that boundary asserting exactly-once delivery and per-key
order. Mirrors the reference's system test
test/system/.../ReadWithAutoScaleTest.java (scale while reading under
a hot routing-key workload).
"""

import json

from pyspark.sql import functions as F

from pravega_spark.config import ScalingPolicy, StreamConfiguration
from pravega_spark.hashing import segment_for_key_py
from pravega_spark.scaling import AutoScaler


def _keys_for_segment(ranges, target_sid, n, prefix="k"):
    """Distinct routing keys that hash into ``target_sid``'s key range."""
    out = []
    i = 0
    while len(out) < n:
        k = f"{prefix}{i}"
        if segment_for_key_py(k, ranges) == target_sid:
            out.append(k)
        i += 1
    return out


def test_hot_skew_drives_split_and_order_survives(store):
    store.create_scope("s")
    store.create_stream(
        "s", "ev",
        StreamConfiguration(
            scaling=ScalingPolicy.by_event_rate(target_rate=1, scale_factor=2,
                                                min_num_segments=2)
        ),
    )
    ranges = store.meta.active_ranges("s", "ev")
    segs = sorted(r[0] for r in ranges)
    hot_sid = segs[0]
    hot_keys = _keys_for_segment(ranges, hot_sid, 20)
    cold_keys = _keys_for_segment(ranges, segs[1], 3, prefix="c")

    # skewed workload: ~1200 events into the hot segment, a trickle
    # elsewhere; per-key sequence number rides in the payload
    seq: dict[str, int] = {}

    def batch(keys, n):
        out = []
        for j in range(n):
            k = keys[j % len(keys)]
            seq[k] = seq.get(k, -1) + 1
            out.append({"routing_key": k, "payload": json.dumps({"k": k, "i": seq[k]}).encode()})
        return out

    store.append_events("s", "ev", batch(hot_keys, 1200))
    store.append_events("s", "ev", batch(cold_keys, 30))

    # S2: measured (not synthetic) rates see the skew
    scaler = AutoScaler(store)
    rates = scaler.segment_rates("s", "ev")
    assert rates[hot_sid][2] > 5 * 1, rates
    # S3: threshold trigger fires for the hot segment only
    plan = scaler.plan("s", "ev", rates=rates, segment_age_min=3)
    assert [d.action for d in plan] == ["split"]
    assert plan[0].segment_id == hot_sid
    # S4: epoch transition
    applied = scaler.run("s", "ev", decisions=plan)
    assert len(applied) == 1
    post_ranges = store.meta.active_ranges("s", "ev")
    assert len(post_ranges) == len(ranges) + 1
    successors = {r[0] for r in post_ranges} - {r[0] for r in ranges}
    assert len(successors) == 2

    # writes continue across the boundary: same hot keys, new epoch
    store.append_events("s", "ev", batch(hot_keys, 400))
    store.append_events("s", "ev", batch(cold_keys, 10))

    # the split actually spreads the hot range: BOTH successors take rows
    by_seg = {
        r["segment_id"]: r["n"]
        for r in store.read("s", "ev").groupBy("segment_id").agg(F.count("*").alias("n")).collect()
    }
    assert all(by_seg.get(sid, 0) > 0 for sid in successors), by_seg

    # exactly-once: bounded read to the tail StreamCut sees every event
    # exactly once (1200+30+400+10)
    cut = store.tail_stream_cut("s", "ev")
    bounded = store.read("s", "ev", to_cut=cut)
    total = bounded.count()
    assert total == 1640, total
    assert bounded.select("segment_id", "offset").distinct().count() == 1640

    # per-key order across the epoch boundary: reading old segment then
    # successors — (segment_id, offset) order, since successor ids carry
    # the higher epoch — yields each key's payload sequence 0..n gapless
    rows = (
        store.read("s", "ev")
        .orderBy("segment_id", "offset")
        .select(F.col("payload").cast("string").alias("p"))
        .collect()
    )
    per_key: dict[str, list[int]] = {}
    for r in rows:
        d = json.loads(r["p"])
        per_key.setdefault(d["k"], []).append(d["i"])
    for k, ids in per_key.items():
        assert ids == list(range(len(ids))), f"key {k} out of order: {ids[:10]}..."
    # every hot key's full sequence arrived
    for k in hot_keys:
        assert len(per_key[k]) == seq[k] + 1
