"""Round-7 regression pins (VERDICT r6 items).

Item 1: salted ``corpus_token_packing`` — the registered query now
partitions its running-sum window by ``(lang, salt)`` so no single task
ever sorts a whole language stratum. These tests pin the salted
semantics against an independent driver-side greedy pack, and pin
``groups=1`` to the pre-r7 per-stratum behavior.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from pravega_spark.queries.text import (
    _PACK_BUDGET,
    _PACK_SALT_GROUPS,
    _PACK_SHARD_STRIDE,
    _tokens,
    corpus_token_packing,
)
from pravega_spark.sources import load_table

SF_DIR = "/root/testdata/sf0.001"


def _doc_stream(spark):
    """(lang, salt16, ord, doc_id, n_tokens) rows, the packing input."""
    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "lang", "text")
    rows = docs.select(
        "doc_id",
        "lang",
        F.size(_tokens(F.col("text"))).alias("n_tokens"),
        F.md5(F.col("doc_id").cast("string")).alias("ord"),
    ).collect()
    return [
        (r.lang, int(r.ord[0], 16), r.ord, r.doc_id, r.n_tokens) for r in rows
    ]


def _reference_pack(stream, groups):
    """Driver-side greedy pack: per (lang, salt) in (ord, doc_id) order,
    a doc joins the shard where its running sum STARTS."""
    by_group: dict = {}
    for lang, h16, ordk, doc_id, n in stream:
        by_group.setdefault((lang, h16 % groups), []).append((ordk, doc_id, n))
    occupancy: dict = {}
    for (lang, salt), docs in by_group.items():
        running = 0
        for _ordk, _doc, n in sorted(docs):
            local = running // _PACK_BUDGET
            shard = salt * _PACK_SHARD_STRIDE + local
            cnt, tot = occupancy.get((lang, shard), (0, 0))
            occupancy[(lang, shard)] = (cnt + 1, tot + n)
            running += n
    return occupancy


def _query_occupancy(spark, groups):
    out = corpus_token_packing(spark, SF_DIR, groups=groups).collect()
    return {(r.lang, r.shard): (r.n_docs, r.shard_tokens) for r in out}


def test_salted_packing_matches_reference(spark):
    stream = _doc_stream(spark)
    got = _query_occupancy(spark, _PACK_SALT_GROUPS)
    want = _reference_pack(stream, _PACK_SALT_GROUPS)
    assert got == want


def test_groups_1_degenerates_to_per_stratum_pack(spark):
    stream = _doc_stream(spark)
    got = _query_occupancy(spark, 1)
    want = _reference_pack(stream, 1)
    assert got == want
    # G=1 shard ids are plain local shards (salt 0 contributes no stride)
    assert all(shard < _PACK_SHARD_STRIDE for (_lang, shard) in got)


def test_salted_vs_g1_conserves_corpus(spark):
    salted = _query_occupancy(spark, _PACK_SALT_GROUPS)
    flat = _query_occupancy(spark, 1)
    assert sum(c for c, _t in salted.values()) == sum(c for c, _t in flat.values())
    assert sum(t for _c, t in salted.values()) == sum(t for _c, t in flat.values())
    # salting multiplies the parallelism: more, smaller shards is fine,
    # but every non-final shard in a salt group must START under budget
    # (greedy invariant: a doc lands where its running sum starts)
    assert len(salted) >= len(flat)


# ---------------------------------------------------------------------------
# ADVICE r6 #2: a txn part whose _DONE landed before commit froze its part
# list must report SUCCESS from write_events, not "not part of the commit".
# ---------------------------------------------------------------------------

import threading

import pytest

from pravega_spark.config import ScalingPolicy, StreamConfiguration
from pravega_spark.errors import TxnFailedException


def _txn_setup(store):
    store.create_scope("s")
    store.create_stream("s", "ev", StreamConfiguration(scaling=ScalingPolicy.fixed(2)))


def _ev(spark, lo, hi):
    from pyspark.sql import functions as F

    return (
        load_table(spark, SF_DIR, "events")
        .filter(F.col("event_id").between(lo, hi - 1))
        .withColumn("routing_key", F.col("user_id"))
    )


def _race_write_events(spark, store, monkeypatch, commit_before_done: bool):
    """Drive the exact race: a second write_events pauses at its _DONE
    write while the main thread commits. commit_before_done=False lets
    _DONE land BEFORE the commit's freeze (part merged, call must
    succeed); True holds _DONE until after (part excluded, call must
    raise)."""
    import pravega_spark.store as store_mod

    _txn_setup(store)
    txn = store.begin_txn("s", "ev")
    txn.write_events(_ev(spark, 0, 50))  # part 0, fully staged

    done_written = threading.Event()
    release_check = threading.Event()
    orig = store_mod.fsio.write_bytes

    def gated(path, data):
        if path.endswith("_DONE") and "part=1" in path:
            if commit_before_done:
                release_check.wait(30)  # commit freezes first
            orig(path, data)
            done_written.set()
            if not commit_before_done:
                release_check.wait(30)  # _DONE landed; now let commit run
            return
        orig(path, data)

    monkeypatch.setattr(store_mod.fsio, "write_bytes", gated)
    result: dict = {}

    def writer():
        try:
            txn.write_events(_ev(spark, 50, 80))  # part 1
            result["outcome"] = "success"
        except TxnFailedException:
            result["outcome"] = "raised"

    t = threading.Thread(target=writer)
    t.start()
    if commit_before_done:
        # writer is parked pre-_DONE; commit now, then release it
        txn.commit()
        release_check.set()
        done_written.wait(30)
    else:
        done_written.wait(30)  # _DONE visible -> the freeze will see it
        txn.commit()
        release_check.set()
    t.join(60)
    monkeypatch.setattr(store_mod.fsio, "write_bytes", orig)
    return result["outcome"], store.read("s", "ev").count()


def test_txn_part_merged_before_freeze_reports_success(spark, store, monkeypatch):
    outcome, n = _race_write_events(spark, store, monkeypatch, commit_before_done=False)
    assert outcome == "success", "a merged part must not report failure"
    assert n == 80  # both parts merged


def test_txn_part_missing_freeze_still_raises(spark, store, monkeypatch):
    outcome, n = _race_write_events(spark, store, monkeypatch, commit_before_done=True)
    assert outcome == "raised", "an excluded part must keep raising"
    assert n == 50  # only part 0 merged


def test_txn_commit_retry_reuses_frozen_part_list(spark, store, monkeypatch):
    """A commit retry (sweeper roll-forward) must merge the FROZEN part
    list, never re-list: a part staged after the freeze whose writer
    was told it missed the commit must stay excluded."""
    import pravega_spark.store as store_mod
    from pravega_spark import fsio

    _txn_setup(store)
    txn = store.begin_txn("s", "ev")
    txn.write_events(_ev(spark, 0, 50))
    # freeze via phase 1 only: simulate a crash between phase 1 and the
    # merge by flipping the doc the way commit() does
    with store._commit_lock("s", "ev"):
        doc = txn._doc()
        doc[txn.txn_id]["status"] = txn.COMMITTING
        doc[txn.txn_id]["merged_parts"] = txn._list_done_parts()
        store.meta.put_txn_doc("s", "ev", doc)
    # a straggler stages part 1 AFTER the freeze (writes files + _DONE
    # directly: the public API already refuses non-OPEN txns at reserve)
    straggler = _ev(spark, 50, 90)
    staged = store._with_arrival_seq(straggler, "routing_key")
    staged.write.mode("append").parquet(fsio.join(txn.staging_path, "part=1"))
    fsio.write_bytes(fsio.join(txn.staging_path, "part=1", "_DONE"), b"")
    txn.commit()  # the roll-forward path
    assert store.read("s", "ev").count() == 50, "frozen list must exclude part 1"


# ---------------------------------------------------------------------------
# streaming_session_fold: the drained result must be invariant to the
# micro-batch partitioning (the order-independence claim, pinned).
# ---------------------------------------------------------------------------


def test_session_fold_invariant_to_trigger_partitioning(spark, monkeypatch):
    """4-trigger (range-split, one file per trigger) and single-batch
    runs of the stateful fold must drain to the identical table — the
    property that makes the SQL oracle sound."""
    import pravega_spark.queries.stream_ops as so

    multi = {tuple(r) for r in so.streaming_session_fold(spark, SF_DIR).collect()}

    # single-batch variant: same pipeline, no per-trigger file cap
    import shutil
    import tempfile
    import uuid

    from pyspark.sql import functions as F

    from pravega_spark.streaming.stateful import session_fold_per_key

    scratch = tempfile.mkdtemp(prefix="pvs_fold_inv_")
    try:
        ev = load_table(spark, SF_DIR, "events").select(
            "event_id",
            "user_id",
            F.floor(F.col("value") * 100).cast("long").alias("cents"),
            F.floor(F.unix_timestamp("ts") / 3600).cast("long").alias("hour_bucket"),
        )
        in_dir = f"{scratch}/input"
        ev.coalesce(1).write.parquet(in_dir)
        stream = spark.readStream.schema(ev.schema).parquet(in_dir)
        name = f"fold_inv_{uuid.uuid4().hex[:8]}"
        q = (
            session_fold_per_key(stream)
            .writeStream.format("memory")
            .queryName(name)
            .outputMode("update")
            .option("checkpointLocation", f"{scratch}/ckpt")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        folded = spark.table(name)
        final = folded.groupBy("user_id").agg(
            F.max("n_events").alias("n_events"),
            F.max_by("total_cents", "n_events").alias("total_cents"),
            F.max_by("last_event", "n_events").alias("last_event"),
            F.max_by("n_active_hours", "n_events").alias("n_active_hours"),
        )
        single = {
            tuple(r)
            for r in final.select(
                "user_id",
                "n_events",
                (F.col("total_cents").cast("double") / 100).alias("total_value"),
                "last_event",
                "n_active_hours",
            ).collect()
        }
        spark.catalog.dropTempView(name)
    finally:
        shutil.rmtree(scratch, ignore_errors=True)
    assert multi == single


# ---------------------------------------------------------------------------
# Claims-election lock: REAL cross-process contention on a pyarrow URI
# root (the non-local protocol), not just threads in one interpreter.
# ---------------------------------------------------------------------------


def _lock_worker(root_uri: str, n_iters: int):
    import json
    import os as _os
    import time as _time

    from pravega_spark import fsio

    lock = fsio.join(root_uri, "locks/counter")
    counter = fsio.join(root_uri, "counter.json")
    for _ in range(n_iters):
        with fsio.locked(lock, lease_ms=10_000, timeout_ms=60_000):
            doc = fsio.read_json(counter, {"n": 0})
            _time.sleep(0.002)  # widen the lost-update window
            doc["n"] += 1
            fsio.write_json_atomic(counter, doc)


def test_claims_lock_mutual_exclusion_across_processes(tmp_path):
    import multiprocessing as mp

    from pravega_spark import fsio

    root_uri = f"file://{tmp_path}"  # URI root -> pyarrow path -> claims protocol
    n_procs, n_iters = 4, 12
    ctx = mp.get_context("spawn")
    procs = [
        ctx.Process(target=_lock_worker, args=(root_uri, n_iters))
        for _ in range(n_procs)
    ]
    for p in procs:
        p.start()
    for p in procs:
        p.join(180)
        assert p.exitcode == 0
    final = fsio.read_json(fsio.join(root_uri, "counter.json"), {"n": -1})
    # a read-modify-write counter loses updates iff two holders overlap
    assert final["n"] == n_procs * n_iters


# ---------------------------------------------------------------------------
# Purity-guard fingerprint: the driver-side md5 fold and the Spark
# expression must agree bit-for-bit on arbitrary envelope content —
# load-bearing for the pump guard (a divergence would either disable
# the pump spuriously or, worse, mask a real content rewrite).
# ---------------------------------------------------------------------------


def test_fingerprint_parity_spark_vs_driver(spark):
    import datetime as dt

    import pyarrow as pa

    from pravega_spark.streaming.sink import (
        _batch_fingerprint_cols,
        _slice_fingerprint,
    )

    base = dt.datetime(2026, 1, 1, tzinfo=dt.timezone.utc)
    cases = [
        # (routing_key, event_time, payload) — nulls, empties, unicode,
        # binary with separators/null bytes, micro-precision timestamps
        ("k1", base, b"plain"),
        ("", base, b""),
        (None, base, b"null-key"),
        ("k\x1fsep", base, b"key containing the separator"),
        ("k2", None, b"null-time"),
        ("k3", base, None),
        ("ünicøde", base.replace(microsecond=123456), "☃".encode()),
        ("k4", base.replace(microsecond=999999), b"\x00\x1f\xff" * 7),
        (None, None, None),
    ]
    rows = [
        {"routing_key": rk, "segment_id": i % 3, "offset": i,
         "event_time": ts, "ingest_time": base, "payload": pl}
        for i, (rk, ts, pl) in enumerate(cases)
    ]
    df = spark.createDataFrame(
        rows,
        "routing_key string, segment_id long, offset long, "
        "event_time timestamp, ingest_time timestamp, payload binary",
    )
    spark_fp = df.agg(*_batch_fingerprint_cols()).first()["fp"]
    tbl = pa.Table.from_pylist(
        [
            {"routing_key": r["routing_key"], "event_time": r["event_time"],
             "payload": r["payload"]}
            for r in rows
        ],
        schema=pa.schema(
            [
                ("routing_key", pa.string()),
                ("event_time", pa.timestamp("us", tz="UTC")),
                ("payload", pa.binary()),
            ]
        ),
    )
    assert _slice_fingerprint(tbl) == spark_fp


def test_fingerprint_parity_randomized(spark):
    """hypothesis sweep: random envelope content, Spark fp == driver fp."""
    import datetime as dt

    import pyarrow as pa
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from pravega_spark.streaming.sink import (
        _batch_fingerprint_cols,
        _slice_fingerprint,
    )

    base_us = int(dt.datetime(2026, 1, 1, tzinfo=dt.timezone.utc).timestamp() * 1_000_000)
    row = st.tuples(
        st.one_of(st.none(), st.text(max_size=12)),
        st.one_of(st.none(), st.integers(min_value=0, max_value=10**9)),
        st.one_of(st.none(), st.binary(max_size=24)),
    )

    @settings(max_examples=20, deadline=None)
    @given(st.lists(row, min_size=1, max_size=6))
    def check(case_rows):
        rows = [
            {
                "routing_key": rk,
                "segment_id": i,
                "offset": i,
                "event_time": (
                    dt.datetime.fromtimestamp((base_us + us) / 1e6, dt.timezone.utc)
                    if us is not None
                    else None
                ),
                "ingest_time": None,
                "payload": pl,
            }
            for i, (rk, us, pl) in enumerate(case_rows)
        ]
        df = spark.createDataFrame(
            rows,
            "routing_key string, segment_id long, offset long, "
            "event_time timestamp, ingest_time timestamp, payload binary",
        )
        spark_fp = df.agg(*_batch_fingerprint_cols()).first()["fp"]
        tbl = pa.Table.from_pylist(
            [
                {"routing_key": r["routing_key"], "event_time": r["event_time"],
                 "payload": r["payload"]}
                for r in rows
            ],
            schema=pa.schema(
                [
                    ("routing_key", pa.string()),
                    ("event_time", pa.timestamp("us", tz="UTC")),
                    ("payload", pa.binary()),
                ]
            ),
        )
        assert _slice_fingerprint(tbl) == spark_fp

    check()


# ---------------------------------------------------------------------------
# Incremental dedup through the bucketed fingerprint index: identical
# output, and the corpus side joins with NO Exchange (the daily-ingest
# scale path — only the increment moves).
# ---------------------------------------------------------------------------


def test_incremental_dedup_indexed_matches_and_skips_corpus_shuffle(spark):
    from pravega_spark.queries.text import (
        corpus_dedup_incremental,
        corpus_dedup_incremental_indexed,
    )

    plain = {tuple(r) for r in corpus_dedup_incremental(spark, SF_DIR).collect()}
    indexed_df = corpus_dedup_incremental_indexed(spark, SF_DIR)
    indexed = {tuple(r) for r in indexed_df.collect()}
    assert indexed == plain
    # plan evidence under AT-SCALE planning (broadcast off — at test SF
    # AQE rightly broadcasts the tiny index, which a 100 TB corpus
    # forbids): the bucketed index side must reach its sort-merge join
    # with NO shuffle Exchange — only the increment moves. (A local
    # per-bucket Sort remains: Spark 4 removed file-level sortedness
    # recognition, so the re-sort of already-sorted runs cannot be
    # elided — linear work, zero data movement.)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = (
            corpus_dedup_incremental_indexed(spark, SF_DIR)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    assert "Bucketed: true" in plan, "index scan is not bucketed"
    lines = plan.splitlines()

    def tree_depth(ln: str) -> int:
        # tree-prefix chars (':', '+', '-', '|', spaces) ARE indentation
        # in Spark's plan rendering: a ':'-prefixed left-child line has
        # lstrip()-indent 0, which would break a whitespace-only walk
        return len(ln) - len(ln.lstrip(" :+-|"))

    idx = next(i for i, ln in enumerate(lines) if "pvs_corpus_fp_b16" in ln)
    depth = tree_depth(lines[idx])
    found_join = False
    for i in range(idx - 1, -1, -1):
        d = tree_depth(lines[i])
        if d < depth:
            depth = d
            if "Exchange hashpartitioning" in lines[i]:
                raise AssertionError(f"index side shuffles: {lines[i].strip()}")
            if "Join" in lines[i]:
                found_join = True
                break
    assert found_join, "walk never reached the join — plan shape changed"
