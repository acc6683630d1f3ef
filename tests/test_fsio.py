"""Storage-binding layer: the engine on a URI-rooted (pyarrow.fs) store.

The reference ships LTS bindings for filesystem/HDFS/S3/GCS/Azure
(bindings/src/main/java/io/pravega/storage/*); our equivalent is
fsio.py. Running the full write→scale→read→truncate cycle against a
``file://`` root drives the *object-store* code path (pyarrow
FileSystem) end-to-end — the same calls an ``s3://`` root would make —
while Spark reads the same URIs through Hadoop.
"""

from pyspark.sql import functions as F

from pravega_spark import fsio
from pravega_spark.config import ScalingPolicy, StreamConfiguration
from pravega_spark.store import StreamStore


def test_fsio_roundtrip(tmp_path):
    root = f"file://{tmp_path}/fs"
    fsio.makedirs(fsio.join(root, "a/b"))
    fsio.write_json_atomic(fsio.join(root, "a/b/doc.json"), {"x": 1})
    assert fsio.read_json(fsio.join(root, "a/b/doc.json"), None) == {"x": 1}
    assert fsio.read_json(fsio.join(root, "a/b/missing.json"), "dflt") == "dflt"
    assert fsio.list_files_recursive(fsio.join(root, "a")) == {"b/doc.json"}
    fsio.move(fsio.join(root, "a/b/doc.json"), fsio.join(root, "a/b/doc2.json"))
    assert fsio.list_files_recursive(fsio.join(root, "a")) == {"b/doc2.json"}
    fsio.remove(fsio.join(root, "a/b/doc2.json"))
    fsio.remove(fsio.join(root, "a/b/doc2.json"))  # idempotent
    assert fsio.list_files_recursive(fsio.join(root, "a")) == set()
    assert fsio.isdir(fsio.join(root, "a/b"))
    fsio.rmtree(fsio.join(root, "a"))
    assert not fsio.isdir(fsio.join(root, "a"))


def test_store_on_uri_root(spark, events, tmp_path):
    store = StreamStore(spark, f"file://{tmp_path}/store")
    store.create_scope("s")
    store.create_stream("s", "ev", StreamConfiguration(scaling=ScalingPolicy.fixed(4)))
    env = events.orderBy("event_id").limit(120).select(
        F.col("user_id").cast("string").alias("routing_key"),
        F.col("ts").alias("event_time"),
        F.to_json(F.struct("event_id")).cast("binary").alias("payload"),
    )
    store.write_events("s", "ev", env)
    assert store.read("s", "ev").count() == 120
    # scale + continue writing: epoch chain on the URI store
    seg0 = store.current_segments("s", "ev")[0]
    store.scale_stream("s", "ev", [seg0["segment_id"]], [(0.0, 0.125), (0.125, 0.25)])
    more = events.orderBy("event_id").filter(F.col("event_id").between(120, 149)).select(
        F.col("user_id").cast("string").alias("routing_key"),
        F.col("ts").alias("event_time"),
        F.to_json(F.struct("event_id")).cast("binary").alias("payload"),
    )
    store.write_events("s", "ev", more)
    assert store.read("s", "ev").count() == 150
    # truncate + compact with the manifest flip through pyarrow.fs
    cut = store.get_next_stream_cut("s", "ev", store.head_stream_cut("s", "ev"), 5)
    store.truncate_stream("s", "ev", cut)
    n_live = store.read("s", "ev").count()
    store.compact_stream("s", "ev")
    assert store.read("s", "ev").count() == n_live
    assert store.fsck_stream("s", "ev") == []


def test_state_and_bytestream_on_uri_root(tmp_path):
    from pravega_spark.bytestream import ByteStreamReader, ByteStreamWriter
    from pravega_spark.state import RevisionedStreamClient, StateSynchronizer

    root = f"file://{tmp_path}/store2"
    rc = RevisionedStreamClient(root, "s", "log")
    assert rc.write_conditionally(0, {"a": 1}) == 1
    assert rc.write_conditionally(1, {"a": 2}) == 2
    assert [r for r, _ in rc.read_from(0)] == [1, 2]
    sync = StateSynchronizer(rc, 0, lambda st, u: st + u.get("a", 0))
    assert sync.get_state() == 3
    sync.compact()
    assert sync.get_state() == 3
    assert rc.compare_and_set_mark(None, 2)

    w = ByteStreamWriter(root, "s", "raw")
    assert w.write(b"hello ") == 0
    assert w.write(b"world") == 6
    r = ByteStreamReader(root, "s", "raw")
    assert r.read(0, 11) == b"hello world"
    assert r.read(6, 5) == b"world"
    w.truncate_data_before(6)
    assert r.fetch_head_offset() == 6


def test_torn_claim_blocks_fresh_then_reaps_stale(tmp_path):
    """An unparseable claim (a holder's in-place heartbeat rewrite
    glimpsed mid-write on a real filesystem) must read as LIVE and
    blocking — never as absent, which would let a contender elect a
    second holder — while a claim unparseable PAST the torn grace is a
    crashed writer's truncated orphan and is reaped, so it cannot
    deadlock the lock forever (r7 ADVICE)."""
    import os
    import time

    lock = f"file://{tmp_path}/locks/t"
    f, p = fsio._split(lock)
    claims = f"{p}.claims"
    f.create_dir(claims, recursive=True)
    torn = f"{claims}/{fsio._claim_name('deadbeef')}"
    with f.open_output_stream(torn) as fh:
        fh.write(b'{"token": "deadbe')  # truncated mid-write
    live = fsio._live_claims(f, claims)
    assert len(live) == 1
    assert live[0][1]["token"] == ""  # blocking placeholder, not absent
    assert live[0][1]["expiry_ms"] > time.time() * 1000  # never auto-stale
    # age past the torn grace: now an orphan — absent and reaped. Aging
    # is by LOCAL first-seen time, never store mtime (r8 ADVICE: NFS/
    # HDFS clock skew could misage a live holder's fresh rewrite into
    # the reap path) — backdate this process's first-seen record
    fsio._TORN_FIRST_SEEN[torn] = time.time() - 10 * fsio._CLAIM_TORN_GRACE_S
    assert fsio._live_claims(f, claims) == []
    assert not os.path.exists(torn)
    # and the lock is acquirable afterwards
    tok = fsio.acquire_lock(lock, lease_ms=500, timeout_ms=5000, poll_s=0.01)
    fsio.release_lock(lock, tok)
