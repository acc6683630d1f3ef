"""Regression pins for the r6 store/state/bytestream review fixes:
the txn COMMITTING state machine, NULL routing keys, head-clamped
cuts, locked byte-stream manifests, atomic state batches, and KVT
no-op removes."""

import threading

import pytest
from pyspark.sql import functions as F

from pravega_spark.config import ScalingPolicy, StreamConfiguration
from pravega_spark.errors import StreamSealedException, TxnFailedException
from pravega_spark.store import StreamCut, Transaction


def _env(events, lo, hi, null_keys=False):
    key = F.lit(None).cast("string") if null_keys else F.col("user_id").cast("string")
    return (
        events.orderBy("event_id")
        .filter(F.col("event_id").between(lo, hi - 1))
        .select(
            key.alias("routing_key"),
            F.col("ts").alias("event_time"),
            F.to_json(F.struct("event_id")).cast("binary").alias("payload"),
        )
    )


def _setup(store, n_seg=2):
    store.create_scope("s")
    store.create_stream("s", "ev", StreamConfiguration(scaling=ScalingPolicy.fixed(n_seg)))


# ---------------- txn state machine ----------------


def test_abort_refuses_committing_txn(store, events):
    """Once commit passes its point of no return (OPEN->COMMITTING),
    abort must raise — never report success while the data publishes."""
    _setup(store)
    txn = store.begin_txn("s", "ev")
    txn.write_events(_env(events, 0, 20))
    # simulate a commit crashed right after the status flip
    doc = store.meta.txn_doc("s", "ev")
    doc[txn.txn_id]["status"] = Transaction.COMMITTING
    store.meta.put_txn_doc("s", "ev", doc)
    with pytest.raises(TxnFailedException):
        txn.abort()
    # roll-forward completes the commit exactly once
    txn.commit()
    assert txn.status() == Transaction.COMMITTED
    assert store.read("s", "ev").count() == 20
    txn.commit()  # idempotent
    assert store.read("s", "ev").count() == 20


def test_commit_rejected_on_sealed_stream(store, events):
    """A txn begun before seal_stream cannot commit afterwards."""
    _setup(store)
    txn = store.begin_txn("s", "ev")
    txn.write_events(_env(events, 0, 10))
    store.seal_stream("s", "ev")
    with pytest.raises(StreamSealedException):
        txn.commit()
    assert store.read("s", "ev").count() == 0
    txn.abort()  # still abortable
    assert txn.status() == Transaction.ABORTED


def test_sweep_rolls_forward_expired_committing_txn(store, events):
    """The sweeper completes (not aborts) a commit that crashed past
    its point of no return."""
    _setup(store)
    txn = store.begin_txn("s", "ev", lease_ms=1)
    txn.write_events(_env(events, 0, 15))
    doc = store.meta.txn_doc("s", "ev")
    doc[txn.txn_id]["status"] = Transaction.COMMITTING
    store.meta.put_txn_doc("s", "ev", doc)
    swept = store.sweep_txns("s", "ev", now_ms=2**62)
    assert txn.txn_id in swept
    assert txn.status() == Transaction.COMMITTED
    assert store.read("s", "ev").count() == 15


def test_commit_ignores_reserved_but_unstaged_part(store, events):
    """A part reserved but never staged (crash between reservation and
    staging) must not fail the commit — it simply isn't merged."""
    _setup(store)
    txn = store.begin_txn("s", "ev")
    txn.write_events(_env(events, 0, 25))
    doc = store.meta.txn_doc("s", "ev")
    doc[txn.txn_id]["parts"] += 1  # reservation whose writer died
    store.meta.put_txn_doc("s", "ev", doc)
    txn.commit()
    assert store.read("s", "ev").count() == 25


def test_commit_with_zero_staged_parts(store, events):
    """parts>0 with an empty/absent staging dir commits cleanly as an
    empty txn (previously: PATH_NOT_FOUND forever)."""
    _setup(store)
    txn = store.begin_txn("s", "ev")
    doc = store.meta.txn_doc("s", "ev")
    doc[txn.txn_id]["parts"] = 1  # reserved, never staged
    store.meta.put_txn_doc("s", "ev", doc)
    txn.commit()
    assert txn.status() == Transaction.COMMITTED
    assert store.read("s", "ev").count() == 0


# ---------------- NULL routing keys ----------------


def test_null_routing_key_routes_identically_across_tiers(store, spark, events, monkeypatch):
    """NULL routing keys normalize to '' on BOTH write tiers, so the
    same (null) key can never land in different segments depending on
    batch size."""
    import pravega_spark.store as store_mod
    from pravega_spark.store import StreamStore

    _setup(store, n_seg=4)
    store.create_stream("s", "ev2", StreamConfiguration(scaling=ScalingPolicy.fixed(4)))
    # hot tier (estimate path)
    store.write_events("s", "ev", _env(events, 0, 10, null_keys=True))
    # distributed tier (force by faking an unknown-stats estimate and a
    # tiny row cap)
    monkeypatch.setattr(store_mod, "HOT_MAX_ROWS", 1)
    monkeypatch.setattr(
        StreamStore, "_estimate_bytes", staticmethod(lambda df: store_mod._UNKNOWN_EST_BYTES)
    )
    store.write_events("s", "ev2", _env(events, 0, 10, null_keys=True))
    segs_hot = {r.segment_id for r in store.read("s", "ev").select("segment_id").collect()}
    segs_dist = {r.segment_id for r in store.read("s", "ev2").select("segment_id").collect()}
    assert len(segs_hot) == 1 and segs_hot == segs_dist
    # and the stored key is the normalized empty string on both tiers
    assert {r.routing_key for r in store.read("s", "ev").collect()} == {""}
    assert {r.routing_key for r in store.read("s", "ev2").collect()} == {""}


# ---------------- cuts clamp to head ----------------


def test_cuts_clamp_to_head_after_truncate(store, events):
    _setup(store, n_seg=1)
    store.write_events("s", "ev", _env(events, 0, 40))
    sid = store.current_segments("s", "ev")[0]["segment_id"]
    store.truncate_stream("s", "ev", StreamCut({sid: 25}))
    nxt = store.get_next_stream_cut("s", "ev", StreamCut.UNBOUNDED, 5)
    assert nxt.positions[sid] == 30  # head(25) + 5, not 0 + 5
    # a cut below head passed in is clamped up too
    nxt2 = store.get_next_stream_cut("s", "ev", StreamCut({sid: 3}), 5)
    assert nxt2.positions[sid] == 30
    # time-based cut never returns sub-head offsets (compaction hasn't
    # run, so raw rows below head still exist physically)
    early = store.read("s", "ev").agg(F.min("event_time")).collect()[0][0]
    tc = store.stream_cut_at_time("s", "ev", early)
    assert tc.positions[sid] >= 25
    # both cuts are actually readable
    assert store.read("s", "ev", from_cut=nxt).count() == 40 - 30
    assert store.read("s", "ev", from_cut=tc).count() <= 15


# ---------------- byte stream concurrency ----------------


def test_bytestream_concurrent_writers_lose_nothing(store):
    from pravega_spark.bytestream import ByteStreamReader, ByteStreamWriter

    root = store.root
    N, payload = 12, b"0123456789"
    offsets: list[int] = []
    lock = threading.Lock()

    def worker():
        w = ByteStreamWriter(root, "s", "raw")
        for _ in range(N):
            off = w.write(payload)
            with lock:
                offsets.append(off)

    threads = [threading.Thread(target=worker) for _ in range(3)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    # every acknowledged write survives: distinct contiguous offsets
    assert sorted(offsets) == [i * len(payload) for i in range(3 * N)]
    r = ByteStreamReader(root, "s", "raw")
    assert r.fetch_tail_offset() == 3 * N * len(payload)
    for off in offsets:
        assert r.read(off, len(payload)) == payload


# ---------------- state synchronizer batches ----------------


def test_state_multi_update_batch_is_atomic_under_contention(tmp_path):
    """A contending writer between fetch and CAS forces a retry; the
    batch [10, 1] must apply exactly once (no committed prefix from the
    failed attempt)."""
    from pravega_spark.state import RevisionedStreamClient, StateSynchronizer

    c = RevisionedStreamClient(str(tmp_path), "s", "st")
    sync = StateSynchronizer(c, 0, lambda s, u: s + u)
    competitor = RevisionedStreamClient(str(tmp_path), "s", "st")
    calls = {"n": 0}

    def fn(state):
        calls["n"] += 1
        if calls["n"] == 1:
            # sneak a competing update in AFTER fetch, BEFORE the CAS
            competitor.write_unconditionally(100)
        return [10, 1]

    assert sync.update_state(fn) == 111  # 100 + 10 + 1, applied once
    assert calls["n"] == 2  # one failed CAS, one clean retry
    # the failed attempt committed NOTHING (no partial [10] revision)
    fresh = StateSynchronizer(c, 0, lambda s, u: s + u)
    assert fresh.get_state() == 111


# ---------------- KVT no-op removes ----------------


def test_kvt_noop_remove_writes_nothing(spark, tmp_path):
    from pravega_spark.config import KeyValueTableConfiguration
    from pravega_spark.kvt import KeyValueTableManager

    kvt = KeyValueTableManager(spark, str(tmp_path)).create_key_value_table(
        "s", "t", KeyValueTableConfiguration(partition_count=2)
    )
    v1 = kvt.insert("k", "a")
    v_noop = kvt.update([("missing", None, None)], ["remove"])
    assert v_noop == v1  # no version burned
    # no phantom delete in the delta feed
    deltas = [(r["pk"], r["deleted"]) for r in kvt.entry_delta_iterator(0).collect()]
    assert ("missing", True) not in deltas
    # and a real remove still works
    v2 = kvt.remove("k")
    assert v2 > v1
    assert kvt.get("k") is None


def test_kvt_none_sk_normalizes_to_default(spark, tmp_path):
    """update() callers passing sk=None hit the same logical key as the
    helpers' sk='' default — a None-keyed CAS must see the stored row."""
    from pravega_spark.config import KeyValueTableConfiguration
    from pravega_spark.errors import BadKeyVersionException
    from pravega_spark.kvt import KeyValueTableManager

    kvt = KeyValueTableManager(spark, str(tmp_path)).create_key_value_table(
        "s", "t", KeyValueTableConfiguration(partition_count=2)
    )
    v1 = kvt.insert("k", "a")  # sk="" via helper
    with pytest.raises(BadKeyVersionException):
        kvt.update([("k", None, "dup")], ["insert"])  # same logical key
    v2 = kvt.update([("k", None, "b")], ["put"], [v1])  # CAS sees the row
    assert v2 > v1
    assert kvt.get("k") == ("b", v2)


# ---------------- fourth-pass fixes: codecs / metadata / hashing ----------


def test_avro_py_per_field_nulls_and_json_fallback(spark):
    """Per-field NULL (NaN/NaT under Arrow) in a nullable union must
    encode as the null branch; the JSON degradation path must return a
    WORKING deserializer for Avro schema strings the codec rejects."""
    from pravega_spark.functions.serializers import python_avro_codec, typed_serializer

    schema = (
        '{"type":"record","name":"R","fields":['
        '{"name":"a","type":["null","long"]},'
        '{"name":"t","type":["null",{"type":"long","logicalType":"timestamp-micros"}]},'
        '{"name":"b","type":"string"}]}'
    )
    ser, de = python_avro_codec(schema)
    df = spark.createDataFrame(
        [(None, None, "x"), (2, __import__("datetime").datetime(2026, 1, 1), "y")],
        "a long, t timestamp, b string",
    )
    enc = df.select(ser(F.struct("a", "t", "b")).alias("p"))
    back = enc.select(de("p").alias("d")).select("d.*").orderBy("b").collect()
    assert [r.a for r in back] == [None, 2]
    assert back[0].t is None and back[1].t is not None
    # degradation: a multi-branch union the codec rejects -> JSON with a
    # usable from_json schema derived from the Avro doc
    weird = (
        '{"type":"record","name":"W","fields":'
        '[{"name":"a","type":["null","long","string"]}]}'
    )
    fmt, jser, jde = typed_serializer(spark, weird, prefer="avro")
    assert fmt == "json"
    df2 = spark.createDataFrame([(5,)], "a long")
    out = (
        df2.select(jser(F.struct("a")).alias("p"))
        .select(jde("p").alias("d"))
        .select("d.*")
        .collect()
    )
    assert out[0].a == 5  # previously: AnalysisException at plan time


def test_avro_decode_rejects_corruption():
    """A corrupt union index / negative length is a loud decode error,
    never silently-plausible garbage."""
    from pravega_spark.functions.avro_codec import AvroSchema

    sch = AvroSchema(
        '{"type":"record","name":"R","fields":[{"name":"a","type":["null","string"]}]}'
    )
    with pytest.raises(ValueError):
        sch.decode(b"\x03abc")  # union branch 1 -> varint 3 = index -2? no: zigzag(3) = -2
    sch2 = AvroSchema('{"type":"record","name":"R","fields":[{"name":"s","type":"string"}]}')
    with pytest.raises(ValueError):
        sch2.decode(b"\x01")  # zigzag(1) = -1 length


def test_create_stream_crash_leaves_no_half_stream(store, monkeypatch):
    """A crash before the LAST create_stream doc write must leave the
    stream nonexistent (retry succeeds), never half-created."""
    store.create_scope("s")
    real = store.meta._write
    state = {"writes": 0}

    class _Boom(RuntimeError):
        pass

    def crashing(path, doc):
        state["writes"] += 1
        if state["writes"] == 3:  # the final (stream.json) write
            raise _Boom("crash before the existence marker")
        return real(path, doc)

    monkeypatch.setattr(store.meta, "_write", crashing)
    with pytest.raises(_Boom):
        store.create_stream("s", "ev")
    monkeypatch.setattr(store.meta, "_write", real)
    assert not store.stream_exists("s", "ev")
    assert store.create_stream("s", "ev") is True  # retry succeeds
    assert store.meta.active_epoch("s", "ev")["epoch"] == 0


def test_recursive_scope_delete_removes_streams(store):
    from pravega_spark.errors import ScopeNotEmptyException

    store.create_scope("s")
    store.create_stream("s", "ev")
    with pytest.raises(ScopeNotEmptyException):
        store.meta.delete_scope("s")
    assert store.meta.delete_scope("s", recursive=True) is True
    # recreating the scope must NOT resurrect the old stream
    store.create_scope("s")
    assert store.list_streams("s") == []


def test_hashing_twins_agree_on_null(spark):
    """NULL keys hash as '' on every twin (column, DuckDB SQL, scalar)."""
    import duckdb

    from pravega_spark.hashing import (
        bucket_for_key_py,
        hash_to_bucket,
        hash_to_range,
        hash_to_range_duckdb,
        hash_to_range_py,
    )

    df = spark.createDataFrame([(None,), ("k1",)], "k string")
    rows = df.select(
        hash_to_range("k").alias("h"), hash_to_bucket("k", 8).alias("b")
    ).collect()
    assert rows[0].h == pytest.approx(hash_to_range_py(None))
    assert rows[0].h == pytest.approx(hash_to_range_py(""))
    assert rows[0].b == bucket_for_key_py(None, 8)
    duck = duckdb.sql(f"SELECT {hash_to_range_duckdb('NULL')}").fetchone()[0]
    assert duck == pytest.approx(hash_to_range_py(None))
    assert rows[1].h == pytest.approx(hash_to_range_py("k1"))


# ---------------- fifth-pass fixes: watermarks / retention / CLI ----------


def test_retention_size_cut_never_over_truncates(store, events):
    """cut_by_size retains AT LEAST retain_events: per-segment flooring
    must not round every share to zero and truncate the whole stream."""
    from pravega_spark.retention import RetentionJob

    store.create_scope("s")
    store.create_stream("s", "ev", StreamConfiguration(scaling=ScalingPolicy.fixed(4)))
    store.write_events("s", "ev", _env(events, 0, 100))
    cut = RetentionJob(store).cut_by_size("s", "ev", 3)
    tails = store.meta.tail_offsets("s", "ev")
    retained = sum(tails[s] - cut.positions.get(s, 0) for s in tails)
    assert retained >= 3, f"size cut retained only {retained} of the promised 3"


def test_watermark_stale_writer_expires(store, events):
    """A crashed writer stops pinning the lower bound once its noted
    time lags beyond timestamp_aggregation_timeout_ms."""
    from pravega_spark.config import StreamConfiguration as SC
    from pravega_spark.watermarks import WatermarkEmitter

    store.create_scope("s")
    cfg = SC(scaling=ScalingPolicy.fixed(1), timestamp_aggregation_timeout_ms=10_000)
    store.create_stream("s", "ev", cfg)
    store.note_time("s", "ev", "dead", 1_000)
    store.note_time("s", "ev", "live", 100_000)
    wm = WatermarkEmitter(store).emit("s", "ev")
    assert wm["lower_bound"] == 100_000, (
        f"stale writer pinned lower bound at {wm['lower_bound']}"
    )
    # within the timeout both writers count
    store.note_time("s", "ev", "dead", 95_000)
    wm2 = WatermarkEmitter(store).emit("s", "ev")
    assert wm2["lower_bound"] == 95_000


def test_time_window_fresh_reader_gets_no_lower_bound(store, events):
    """A reader at position zero (empty cut) has passed NO watermark:
    lower bound must be None, not the newest watermark's."""
    from pravega_spark.streamcut import StreamCut as SC
    from pravega_spark.watermarks import WatermarkEmitter

    store.create_scope("s")
    store.create_stream("s", "ev", StreamConfiguration(scaling=ScalingPolicy.fixed(1)))
    store.write_events("s", "ev", _env(events, 0, 20))
    sid = store.current_segments("s", "ev")[0]["segment_id"]
    store.note_time("s", "ev", "w", 5_000)  # position = current tails ({sid: 20})
    em = WatermarkEmitter(store)
    em.emit("s", "ev")
    win = em.current_time_window("s", "ev", SC.of({}))
    assert win.lower_time_bound is None
    win0 = em.current_time_window("s", "ev", SC.of({sid: 0}))
    assert win0.lower_time_bound is None  # at zero: not past the cut
    win_past = em.current_time_window("s", "ev", SC.of({sid: 20}))
    assert win_past.lower_time_bound == 5_000


def test_cli_kvt_roundtrip_and_guards(store, tmp_path, capsys, monkeypatch):
    """kvt create prints JSON (no object dump), list prints pk/sk rows;
    scope create without a name is refused; empty append is a clean 0."""
    import io
    import json as _json

    from pravega_spark import cli

    root = str(tmp_path / "cli")
    assert cli.main(["--root", root, "scope", "create"]) == 2  # name required
    assert cli.main(["--root", root, "scope", "create", "s"]) == 0
    assert cli.main(["--root", root, "kvt", "create", "s/t"]) == 0
    out = capsys.readouterr().out.strip().splitlines()[-1]
    assert _json.loads(out) == {"created": True, "table": "s/t"}
    assert cli.main(["--root", root, "stream", "create", "s/ev"]) == 0
    monkeypatch.setattr("sys.stdin", io.StringIO(""))
    assert cli.main(["--root", root, "stream", "append", "s/ev"]) == 0
    assert _json.loads(capsys.readouterr().out.strip().splitlines()[-1]) == {"appended": 0}


# ---------------- sixth-pass fixes: similarity kernels --------------------


def test_cosine_zero_vector_yields_null_not_error(spark):
    """Zero-norm vectors: NULL cosine (row drops from thresholds) on
    both engines — never a DIVIDE_BY_ZERO under Spark 4 ANSI mode."""
    from pravega_spark.functions.vectors import cosine

    df = spark.createDataFrame(
        [(1, [0.0, 0.0]), (2, [1.0, 0.0])], "id long, v array<double>"
    )
    rows = (
        df.alias("a")
        .crossJoin(df.alias("b"))
        .select(
            F.col("a.id").alias("ia"),
            F.col("b.id").alias("ib"),
            cosine(F.col("a.v"), F.col("b.v")).alias("c"),
        )
        .collect()
    )
    got = {(r.ia, r.ib): r.c for r in rows}
    assert got[(2, 2)] == pytest.approx(1.0)
    assert got[(1, 1)] is None and got[(1, 2)] is None and got[(2, 1)] is None


def test_embedding_near_dup_gated_handles_duplicate_ids(spark, tmp_path):
    """A vec_id reused with two different embeddings must not become
    the rep of two groups and cross-attach cosines (content-derived
    group key in the expansion join)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from pravega_spark.queries.similarity import embedding_near_dup

    # label 0: id 1 appears with v1 AND v2 (distinct); ids 5,6 share v1;
    # v1·v2 cosine is ~0 (orthogonal), so v2's member must NOT inherit
    # v1's intra-pair cosine
    v1 = [1.0, 0.0, 0.0, 0.0]
    v2 = [0.0, 1.0, 0.0, 0.0]
    rows = [(1, v1, 0), (5, v1, 0), (6, v1, 0), (1, v2, 0), (9, v2, 0)]
    d = tmp_path / "emb"
    d.mkdir()
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array([r[0] for r in rows], pa.int64()),
                "embedding": pa.array([r[1] for r in rows], pa.list_(pa.float32())),
                "label": pa.array([r[2] for r in rows], pa.int32()),
            }
        ),
        str(d / "embeddings.parquet"),
    )
    out = {( r.a_id, r.b_id): r.cosine for r in embedding_near_dup(spark, str(d)).collect()}
    # intra v1 group: (1,5),(1,6),(5,6) at 1.0; intra v2 group: (1,9) at 1.0
    for p in [(1, 5), (1, 6), (5, 6), (1, 9)]:
        assert out.get(p) == pytest.approx(1.0), (p, out)
    # orthogonal cross pairs (cosine 0) are BELOW the 0.35 threshold:
    # they must not appear with a cross-attached 1.0
    for p in [(5, 9), (6, 9)]:
        assert p not in out, f"cross-attached cosine emitted for {p}: {out.get(p)}"
