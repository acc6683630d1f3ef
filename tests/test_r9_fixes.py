"""Round-9 additions: the sharded hot-append commit (reserve → payload
outside the lock → publish with pending absorption), the bounded in-doc
manifest chains, and the index-MAINTAINED two-day near-dup loop."""

import os
import sys
import threading
import types

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pravega_spark.config import ScalingPolicy, StreamConfiguration  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"


class _Boom(RuntimeError):
    pass


def _mk(store, n_segments=1):
    store.create_scope("s")
    store.create_stream(
        "s", "ev", StreamConfiguration(scaling=ScalingPolicy.fixed(n_segments))
    )


def _rows(tag, n):
    return [{"routing_key": tag, "v": f"{tag}{i}"} for i in range(n)]


def _offsets(store):
    return sorted(r["offset"] for r in store.read("s", "ev").select("offset").collect())


# ---------------- reserve/publish protocol ----------------


def test_pending_commit_invisible_until_earlier_reservation_publishes(store):
    """A later-reserved writer that publishes FIRST is durable but
    invisible (pending) until the earlier reservation publishes —
    offsets stay contiguous and readers never see a gap."""
    _mk(store)
    entered, hold = threading.Event(), threading.Event()
    cls = type(store)
    store_a = cls(store.spark, store.root)
    store_b = cls(store.spark, store.root)
    orig = cls._write_hot_batch

    def slow_wb(self, tbl, seg_arr, bases, path, tag):
        out = orig(self, tbl, seg_arr, bases, path, tag)
        entered.set()
        assert hold.wait(30), "test orchestration stalled"
        return out

    store_a._write_hot_batch = types.MethodType(slow_wb, store_a)
    t = threading.Thread(
        target=lambda: store_a.append_events("s", "ev", _rows("a", 5), writer_id="A", batch_seq=0)
    )
    t.start()
    assert entered.wait(30)
    # B commits while A's reservation is open: durable, NOT visible
    store_b.append_events("s", "ev", _rows("b", 3), writer_id="B", batch_seq=0)
    assert store.read("s", "ev").count() == 0
    doc = store.meta.segments_doc("s", "ev")
    assert doc.get("pending"), "B's publish did not land as pending"
    assert doc["writer_seqs"].get("B") == 0  # acked (durable) at publish
    hold.set()
    t.join(30)
    assert _offsets(store) == list(range(8))
    assert store.fsck_stream("s", "ev") == []


def test_crashed_reservation_gap_repair_renumbers_pending(store, monkeypatch):
    """A writer that dies between reserve and publish leaves a gap; once
    the reservation expires, the next lock holder drops it and shifts
    the pending commits above it down — REWRITING their files' offsets
    — so the stream stays contiguous and nothing is lost."""
    import pravega_spark.store as store_mod

    _mk(store)
    store.append_events("s", "ev", _rows("base", 4), writer_id="W0", batch_seq=0)

    armed = {"on": True}
    orig = type(store)._write_hot_batch

    def crashing(self, tbl, seg_arr, bases, path, tag):
        if armed["on"]:
            armed["on"] = False
            raise _Boom("writer died mid-payload")
        return orig(self, tbl, seg_arr, bases, path, tag)

    monkeypatch.setattr(type(store), "_write_hot_batch", crashing)
    with pytest.raises(_Boom):
        store.append_events("s", "ev", _rows("dead", 5), writer_id="A", batch_seq=0)
    # B lands ABOVE the dead reservation -> pending behind the gap
    store.append_events("s", "ev", _rows("b", 3), writer_id="B", batch_seq=0)
    assert store.read("s", "ev").count() == 4
    doc = store.meta.segments_doc("s", "ev")
    assert doc.get("reservations") and doc.get("pending")
    # expire the dead writer's claim; C's commit reaps + repairs inline
    monkeypatch.setattr(store_mod, "RESERVATION_GRACE_MS", -1)
    store.append_events("s", "ev", _rows("c", 2), writer_id="C", batch_seq=0)
    assert _offsets(store) == list(range(9))  # 4 base + 3 B + 2 C, no hole
    got = {
        r["v"]: r["offset"]
        for r in store.read("s", "ev").select("v", "offset").collect()
    }
    assert {got[f"b{i}"] for i in range(3)} == {4, 5, 6}  # B renumbered down
    doc = store.meta.segments_doc("s", "ev")
    assert not doc.get("reservations") and not doc.get("pending")
    # the dead writer's payload files (if any) and the pre-shift names
    # are orphans; after fsck nothing dangles and nothing is lost
    store.fsck_stream("s", "ev")
    assert _offsets(store) == list(range(9))
    assert store.fsck_stream("s", "ev") == []


def test_same_writer_concurrent_retry_is_exactly_once(store):
    """A concurrent retry of a batch whose first attempt holds an open
    reservation must wait for it (then dedup via writer_seqs), never
    double-append."""
    _mk(store)
    entered, hold = threading.Event(), threading.Event()
    cls = type(store)
    store_a, store_b = cls(store.spark, store.root), cls(store.spark, store.root)
    orig = cls._write_hot_batch

    def slow_wb(self, tbl, seg_arr, bases, path, tag):
        out = orig(self, tbl, seg_arr, bases, path, tag)
        entered.set()
        assert hold.wait(30)
        return out

    store_a._write_hot_batch = types.MethodType(slow_wb, store_a)
    t1 = threading.Thread(
        target=lambda: store_a.append_events("s", "ev", _rows("x", 5), writer_id="W", batch_seq=0)
    )
    t1.start()
    assert entered.wait(30)
    done = threading.Event()

    def retry():
        store_b.append_events("s", "ev", _rows("x", 5), writer_id="W", batch_seq=0)
        done.set()

    t2 = threading.Thread(target=retry)
    t2.start()
    # the retry must be parked on the in-flight guard, not committing
    assert not done.wait(0.5)
    hold.set()
    t1.join(30)
    t2.join(30)
    assert done.is_set()
    assert _offsets(store) == list(range(5))  # exactly once
    assert store.fsck_stream("s", "ev") == []


def test_chain_folds_into_snapshot_and_reads_survive(store, monkeypatch):
    """The in-doc chain folds into a snapshot shard at CHAIN_MAX and
    resolution (snapshot + fresh chain) always returns every commit."""
    import pravega_spark.store as store_mod

    monkeypatch.setattr(store_mod, "CHAIN_MAX", 3)
    _mk(store)
    for b in range(8):
        store.append_events("s", "ev", _rows(f"k{b}", 2), writer_id="w", batch_seq=b)
    assert _offsets(store) == list(range(16))
    doc = store.meta.segments_doc("s", "ev")
    seg = doc["segments"]["0"]
    assert "manifest" in seg  # at least one fold happened
    assert len(seg.get("chain", [])) <= 3
    files = store.meta.segment_files("s", "ev", "0", seg)
    assert len(files) == 8
    assert store.fsck_stream("s", "ev") == []


# ---------------- maintained-index near-dup (VERDICT r8 item 4) ----------


def test_maintained_neardup_fixture_classes(spark):
    """Day-2 classes resolve three ways, and the re-crawl class matches
    its day-1 ORIGINAL through the maintained index — the signal that
    only exists because day-1 survivors were appended."""
    from pravega_spark.queries.text import (
        _DAY1_ID_OFFSET,
        dedup_minhash_incremental_maintained,
    )

    rows = dedup_minhash_incremental_maintained(spark, SF_DIR).collect()
    assert rows
    by_class = {0: [], 1: [], 2: []}
    for r in rows:
        by_class[r["doc_id"] % 3].append(r)
    for r in by_class[0]:  # exact corpus dups
        assert r["is_near_dup"] and r["matched_tier"] == "corpus"
        assert r["similarity"] == 1.0
    matched_recrawl = [r for r in by_class[1] if r["is_near_dup"]]
    assert matched_recrawl, "no day-2 re-crawl matched — maintenance vacuous"
    for r in matched_recrawl:
        assert r["matched_tier"] == "increment"
        # best match IS the day-1 upload of this document
        assert r["matched_doc"] == r["doc_id"] - 1 + _DAY1_ID_OFFSET
        assert 0.0 < r["similarity"] < 1.0
    for r in by_class[2]:  # genuinely new
        assert not r["is_near_dup"] and r["matched_tier"] is None


def test_maintained_neardup_no_rebuild_or_reappend_on_rerun(spark):
    """The daily loop is truly incremental: a rerun neither rebuilds the
    base index nor re-applies the day-1 append (exactly-once increment
    marker) and produces identical output."""
    from pravega_spark.queries.text import dedup_minhash_incremental_maintained
    from pravega_spark.sources.bucketing import applied_increments

    first = [tuple(r) for r in dedup_minhash_incremental_maintained(spark, SF_DIR).collect()]
    tbl = next(
        t.name for t in spark.catalog.listTables() if t.name.startswith("pvs_mhmaint_")
    )
    wh = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    loc = os.path.join(wh, tbl)
    listing1 = sorted(
        (f, os.path.getmtime(os.path.join(loc, f)))
        for f in os.listdir(loc)
        if f.endswith(".parquet")
    )
    assert applied_increments(spark, tbl) == ["day1"]
    second = [tuple(r) for r in dedup_minhash_incremental_maintained(spark, SF_DIR).collect()]
    listing2 = sorted(
        (f, os.path.getmtime(os.path.join(loc, f)))
        for f in os.listdir(loc)
        if f.endswith(".parquet")
    )
    assert listing1 == listing2, "rerun rebuilt or re-appended the index"
    assert applied_increments(spark, tbl) == ["day1"]
    assert first == second


def test_maintained_neardup_corpus_side_shuffle_free(spark):
    """At-scale plan shape (broadcast off): the maintained band index —
    base snapshot PLUS appended day-1 files — reaches the day-2 band
    join as a bucketed scan with no band-key shuffle."""
    from test_r8_fixes import _assert_band_join_shuffle_free

    from pravega_spark.queries.text import dedup_minhash_incremental_maintained

    dedup_minhash_incremental_maintained(spark, SF_DIR)  # index + append exist
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = (
            dedup_minhash_incremental_maintained(spark, SF_DIR)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    assert "Bucketed: true" in plan
    assert "pvs_mhmaint_" in plan
    _assert_band_join_shuffle_free(plan, 16)


# ---------------- BPE at vocabulary scale (VERDICT r8 item 5) ----------


def _bpe2_train_naive(units, n_target):
    """Reference full-recount trainer: rebuilds every pair count each
    step. Same selection rule — used to prove the incremental trainer
    equivalent and to measure the speedup (NOTES_r9)."""
    from collections import Counter

    from pravega_spark.queries.text import _bpe2_merge_seq

    syms = {i: list(t) for i, (t, _) in enumerate(units)}
    freqs = {i: f for i, (_, f) in enumerate(units)}
    merges = []
    for _ in range(n_target):
        counts = Counter()
        for ui, s in syms.items():
            f = freqs[ui]
            for i in range(len(s) - 1):
                counts[(s[i], s[i + 1])] += f
        best = min(((-c, p) for p, c in counts.items() if c >= 2), default=None)
        if best is None:
            break
        pair = best[1]
        merges.append(pair)
        for ui, s in syms.items():
            if any(s[i] == pair[0] and s[i + 1] == pair[1] for i in range(len(s) - 1)):
                syms[ui] = _bpe2_merge_seq(s, *pair)
    return merges


def test_bpe_vocab_scale_incremental_trainer_matches_naive_and_is_faster():
    """The incrementally-maintained pair counts produce EXACTLY the
    merge sequence of the full-recount loop, at a fraction of the
    time — the property that makes >=256-merge training tractable."""
    import time

    import pyarrow.parquet as pq

    from pravega_spark.queries.py_oracles import _units
    from pravega_spark.queries.text import _bpe2_train

    texts = pq.read_table(
        os.path.join(SF_DIR, "documents.parquet"), columns=["text"]
    )["text"].to_pylist()
    from collections import Counter

    freq = Counter(u for t in texts for u in _units(t))
    units = sorted(freq.items(), key=lambda kv: (-kv[1], kv[0]))[:4096]
    t0 = time.perf_counter()
    inc = _bpe2_train(list(units), 512)
    t_inc = time.perf_counter() - t0
    t0 = time.perf_counter()
    naive = _bpe2_train_naive(list(units), 512)
    t_naive = time.perf_counter() - t0
    assert inc == naive
    assert len(inc) >= 256, f"only {len(inc)} merges trainable on this corpus"
    # generous bound: the point is the asymptotic class, not the ratio
    assert t_inc < t_naive, (t_inc, t_naive)
    print(f"# bpe train 512 merges: incremental {t_inc:.2f}s vs naive {t_naive:.2f}s")


def test_bpe_vocab_scale_learned_table_and_compression(spark):
    """merges_used >= 256, every lang row pins the same learned table
    (merges_md5), and the encoding genuinely compresses: tokens per
    unit land strictly between 1 and the unit's character count."""
    from pravega_spark.queries.text import text_bpe_vocab_scale

    rows = text_bpe_vocab_scale(spark, SF_DIR).collect()
    assert len(rows) == 5
    assert len({r["merges_md5"] for r in rows}) == 1
    for r in rows:
        assert r["merges_used"] >= 256
        assert r["n_units"] <= r["n_tokens"], r  # >= one token per unit
        assert r["n_tokens"] < r["n_units"] * 12, r  # far below char count


# ---------------- maintained ANN index (r9, vector twin) ----------


def test_ann_maintained_fixture_classes(spark):
    """Day-2 vector classes resolve three ways; the re-crawl class
    matches its day-1 upload through the maintained index."""
    from pravega_spark.queries.similarity import (
        _DAY1_VID_OFFSET,
        similarity_incremental_maintained,
    )

    rows = similarity_incremental_maintained(spark, SF_DIR).collect()
    assert rows
    by_class = {0: [], 1: [], 2: []}
    for r in rows:
        by_class[r["vec_id"] % 3].append(r)
    for r in by_class[0]:  # exact corpus copies
        assert r["is_near_dup"] and r["matched_tier"] == "corpus"
        assert r["cosine"] == 1.0 and r["matched_vec"] == r["vec_id"]
    assert by_class[1], "no re-crawl class rows"
    for r in by_class[1]:  # re-crawls of day-1 survivors
        assert r["is_near_dup"] and r["matched_tier"] == "increment", r
        assert r["matched_vec"] == r["vec_id"] - 1 + _DAY1_VID_OFFSET
        assert 0.9 <= r["cosine"] < 1.0
    for r in by_class[2]:  # negations: genuinely new
        assert not r["is_near_dup"] and r["matched_tier"] is None


def test_ann_maintained_no_rebuild_or_reappend_on_rerun(spark):
    from pravega_spark.queries.similarity import similarity_incremental_maintained
    from pravega_spark.sources.bucketing import applied_increments

    first = [tuple(r) for r in similarity_incremental_maintained(spark, SF_DIR).collect()]
    tbl = next(
        t.name for t in spark.catalog.listTables() if t.name.startswith("pvs_annmaint_")
    )
    wh = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    loc = os.path.join(wh, tbl)
    listing1 = sorted(
        (f, os.path.getmtime(os.path.join(loc, f)))
        for f in os.listdir(loc)
        if f.endswith(".parquet")
    )
    assert applied_increments(spark, tbl) == ["day1"]
    second = [tuple(r) for r in similarity_incremental_maintained(spark, SF_DIR).collect()]
    listing2 = sorted(
        (f, os.path.getmtime(os.path.join(loc, f)))
        for f in os.listdir(loc)
        if f.endswith(".parquet")
    )
    assert listing1 == listing2, "rerun rebuilt or re-appended the ANN index"
    assert first == second


def test_ann_maintained_index_side_shuffle_free(spark):
    """At-scale plan (broadcast off): the maintained bucket index —
    base + appended survivor files — reaches the day-2 join as a
    bucketed scan; any Exchange on the bucket key is increment-side
    bucket alignment."""
    import re

    from pravega_spark.queries.similarity import similarity_incremental_maintained

    similarity_incremental_maintained(spark, SF_DIR)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = (
            similarity_incremental_maintained(spark, SF_DIR)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    assert "Bucketed: true" in plan
    assert "pvs_annmaint_" in plan
    for m in re.finditer(r"Exchange hashpartitioning\(bucket#\d+[^,]*, (\d+)\)", plan):
        assert m.group(1) == "16", f"bucket-key shuffle not bucket-aligned: {m.group(0)}"


def test_distributed_commit_pends_behind_open_hot_reservation(store, events):
    """The distributed tier bases its offsets at the RESERVED tail: a
    commit that runs while a hot writer holds an open reservation lands
    as a pending entry and becomes visible only when the hot writer
    publishes — offsets stay contiguous across the two tiers."""
    import pravega_spark.store as store_mod

    _mk(store, n_segments=2)
    entered, hold = threading.Event(), threading.Event()
    cls = type(store)
    store_a = cls(store.spark, store.root)
    orig = cls._write_hot_batch

    def slow_wb(self, tbl, seg_arr, bases, path, tag):
        out = orig(self, tbl, seg_arr, bases, path, tag)
        entered.set()
        assert hold.wait(60)
        return out

    store_a._write_hot_batch = types.MethodType(slow_wb, store_a)
    t = threading.Thread(
        target=lambda: store_a.append_events("s", "ev", _rows("hot", 6), writer_id="H", batch_seq=0)
    )
    t.start()
    assert entered.wait(30)
    # distributed write_events while H's reservation is open (force the
    # distributed tier so the batch takes the lock-held path)
    env = events.limit(40).select(
        F.col("user_id").cast("string").alias("routing_key"),
        F.col("ts").alias("event_time"),
        F.col("event_id").cast("string").alias("v"),
    )
    old = store_mod.HOT_MAX_EST_BYTES
    store_mod.HOT_MAX_EST_BYTES = 0
    try:
        store.write_events("s", "ev", env, writer_id="D", batch_seq=0)
    finally:
        store_mod.HOT_MAX_EST_BYTES = old
    # per-segment gating: rows landing in the segment H reserved wait
    # as pending; rows in the other segment absorb immediately
    visible = store.read("s", "ev").count()
    assert visible < 40, "no distributed rows were gated by the reservation"
    doc = store.meta.segments_doc("s", "ev")
    assert doc.get("pending") and doc["writer_seqs"].get("D") == 0
    pend_n = sum(e["n"] for lst in doc["pending"].values() for e in lst)
    assert visible + pend_n == 40  # durable split across visible+pending
    hold.set()
    t.join(60)
    assert store.read("s", "ev").count() == 46
    offs = {
        sid: sorted(r["offset"] for r in rows)
        for sid, rows in __import__("itertools").groupby(
            sorted(
                store.read("s", "ev").select("segment_id", "offset").collect(),
                key=lambda r: (r["segment_id"], r["offset"]),
            ),
            key=lambda r: r["segment_id"],
        )
    }
    for sid, o in offs.items():
        assert o == list(range(len(o))), f"segment {sid} not contiguous"
    assert store.fsck_stream("s", "ev") == []


def test_seal_racing_append_is_rejected_at_reserve(store):
    """An append whose entry-time seal check passed BEFORE seal_stream
    completed must be rejected at reserve time, not appended into the
    sealed stream (the under-lock re-check)."""
    from pravega_spark.errors import StreamSealedException

    _mk(store)
    store.append_events("s", "ev", _rows("a", 3), writer_id="w", batch_seq=0)
    # simulate the race: seal completes after the entry check would have
    # passed, then drive the commit path directly
    store.seal_stream("s", "ev")
    import pyarrow as pa

    tbl = pa.table({"routing_key": ["a", "a"], "v": ["x", "y"]})
    with pytest.raises(StreamSealedException):
        store._hot_commit("s", "ev", tbl, [], ("w", 1))
    assert store.read("s", "ev").count() == 3  # nothing landed
    assert store.fsck_stream("s", "ev") == []


# ------------- maintained EXACT-dup fingerprint index (r9) -------------


def test_fp_maintained_fixture_classes(spark):
    """The exact-fingerprint twin of the maintenance loop: day-2's
    byte-identical re-crawl of a day-1 survivor flags as a dup with
    matched_tier='increment'."""
    from pravega_spark.queries.text import (
        _DAY1_ID_OFFSET,
        corpus_dedup_incremental_maintained,
    )

    rows = corpus_dedup_incremental_maintained(spark, SF_DIR).collect()
    assert rows
    by_class = {0: [], 1: [], 2: []}
    for r in rows:
        by_class[r["doc_id"] % 3].append(r)
    for r in by_class[0]:  # exact corpus copies
        assert r["is_dup"] and r["matched_tier"] == "corpus"
    assert by_class[1], "no re-crawl rows"
    for r in by_class[1]:  # re-crawls of day-1 survivors
        assert r["is_dup"] and r["matched_tier"] == "increment", r
        assert r["matched_doc"] == r["doc_id"] - 1 + _DAY1_ID_OFFSET
    for r in by_class[2]:  # fresh
        assert not r["is_dup"] and r["matched_tier"] is None


def test_fp_maintained_no_rebuild_or_reappend_on_rerun(spark):
    from pravega_spark.queries.text import corpus_dedup_incremental_maintained
    from pravega_spark.sources.bucketing import applied_increments

    first = [tuple(r) for r in corpus_dedup_incremental_maintained(spark, SF_DIR).collect()]
    tbl = next(
        t.name for t in spark.catalog.listTables() if t.name.startswith("pvs_fpmaint_")
    )
    wh = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    loc = os.path.join(wh, tbl)
    listing1 = sorted(f for f in os.listdir(loc) if f.endswith(".parquet"))
    assert applied_increments(spark, tbl) == ["day1"]
    second = [tuple(r) for r in corpus_dedup_incremental_maintained(spark, SF_DIR).collect()]
    listing2 = sorted(f for f in os.listdir(loc) if f.endswith(".parquet"))
    assert listing1 == listing2
    assert applied_increments(spark, tbl) == ["day1"]
    assert first == second


def test_fp_maintained_index_side_shuffle_free(spark):
    """At-scale plan (broadcast off): the maintained fingerprint table
    reaches both classification joins as a bucketed scan; any Exchange
    on fp is increment-side bucket alignment."""
    import re

    from pravega_spark.queries.text import corpus_dedup_incremental_maintained

    corpus_dedup_incremental_maintained(spark, SF_DIR)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = (
            corpus_dedup_incremental_maintained(spark, SF_DIR)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    assert "Bucketed: true" in plan
    assert "pvs_fpmaint_" in plan
    for m in re.finditer(r"Exchange hashpartitioning\(fp#\d+[^,]*, (\d+)\)", plan):
        assert m.group(1) == "16", f"fp shuffle not bucket-aligned: {m.group(0)}"
