"""Cross-process commit safety (SURVEY §7 hard part 7).

The reference serializes appends per segment across arbitrarily many
writer processes (AppendProcessor.java:302; conditional appends
WireCommands.java:633). Here N OS processes each hold an independent
StreamStore on one shared root and interleave hot appends: the
per-stream lease lock + version-conditional segments-doc write must
yield NO lost commits, contiguous offsets, and intact per-key order —
last-write-wins on the doc would silently drop whole batches.

Workers use the hot append path, which needs no SparkSession, so each
process is a real independent writer without a JVM.
"""

import multiprocessing as mp

from pyspark.sql import Window
from pyspark.sql import functions as F

from pravega_spark.config import ScalingPolicy, StreamConfiguration


def _worker(root: str, worker_id: int, n_batches: int, batch_rows: int):
    from pravega_spark.store import StreamStore

    store = StreamStore(None, root)  # hot appends never touch Spark
    for b in range(n_batches):
        rows = [
            {"routing_key": f"w{worker_id}-k{j % 5}", "payload": f"{worker_id}:{b}:{j}"}
            for j in range(batch_rows)
        ]
        store.append_events("s", "ev", rows, writer_id=f"w{worker_id}", batch_seq=b)


def test_concurrent_writers_no_lost_commits(spark, store):
    store.create_scope("s")
    store.create_stream("s", "ev", StreamConfiguration(scaling=ScalingPolicy.fixed(4)))
    n_workers, n_batches, batch_rows = 4, 6, 25
    ctx = mp.get_context("spawn")
    procs = [
        ctx.Process(target=_worker, args=(store.root, w, n_batches, batch_rows))
        for w in range(n_workers)
    ]
    for p in procs:
        p.start()
    for p in procs:
        p.join(120)
        assert p.exitcode == 0
    df = store.read("s", "ev")
    total = df.count()
    assert total == n_workers * n_batches * batch_rows  # no lost commit
    # offsets contiguous per segment (no overlap/clobber)
    gaps = (
        df.groupBy("segment_id")
        .agg(F.count("*").alias("n"), (F.max("offset") - F.min("offset") + 1).alias("span"))
        .filter(F.col("n") != F.col("span"))
        .count()
    )
    assert gaps == 0
    # no duplicated (segment, offset) slot
    dup_slots = (
        df.groupBy("segment_id", "offset").count().filter(F.col("count") > 1).count()
    )
    assert dup_slots == 0
    # per-key order: each writer's (batch, row) sequence increases with offset
    w = Window.partitionBy("routing_key").orderBy("offset")
    parts = F.split("payload", ":")
    viol = (
        df.withColumn("seq", parts.getItem(1).cast("long") * 1000 + parts.getItem(2).cast("long"))
        .withColumn("prev", F.lag("seq").over(w))
        .filter(F.col("prev") > F.col("seq"))
        .count()
    )
    assert viol == 0
    # dedup markers recorded per writer
    doc = store.meta.segments_doc("s", "ev")
    assert all(doc["writer_seqs"][f"w{i}"] == n_batches - 1 for i in range(n_workers))


def test_kvt_concurrent_instances_serialize(spark, tmp_path):
    """Two KVT instances on one root (same process, independent caches —
    the lock + reload path is identical cross-process): interleaved
    updates must produce strictly increasing versions with no clobber."""
    from pravega_spark.kvt import KeyValueTableManager

    mgr = KeyValueTableManager(spark, str(tmp_path))
    t1 = mgr.create_key_value_table("sc", "t")
    t2 = mgr.open("sc", "t")
    versions = []
    for i in range(4):
        versions.append(t1.put(f"a{i}", f"v{i}"))
        versions.append(t2.put(f"b{i}", f"v{i}"))
    assert versions == sorted(set(versions)), "versions must be unique + increasing"
    snap = {r["pk"]: r["value"] for r in t1.snapshot().collect()}
    assert len(snap) == 8  # nothing clobbered
    # CAS across instances sees the other's committed version
    import pytest as _pytest

    from pravega_spark.errors import BadKeyVersionException

    v = t2.put("a0", "v0b")
    with _pytest.raises(BadKeyVersionException):
        t1.put("a0", "x", expected_version=versions[0])
    assert t1.get("a0") == ("v0b", v)


def test_chained_manifests_bound_commit_cost(store, monkeypatch):
    """Commit metadata cost is O(touched segments) amortized, and the
    segments doc stays BOUNDED as commits accumulate (r9 protocol): each
    commit appends file names to the touched segment's in-doc chain —
    no O(files/segment) shard rewrite in the critical section — and the
    chain folds into a snapshot shard every CHAIN_MAX commits, so the
    doc never grows past O(segments * CHAIN_MAX names)."""
    import os

    import pravega_spark.store as store_mod
    from pravega_spark.hashing import segment_for_key_py

    monkeypatch.setattr(store_mod, "CHAIN_MAX", 8)
    store.create_scope("s")
    store.create_stream("s", "ev", StreamConfiguration(scaling=ScalingPolicy.fixed(8)))
    ranges = store.meta.active_ranges("s", "ev")
    # a routing key that lands in exactly one known segment
    key = next(f"k{i}" for i in range(1000) if segment_for_key_py(f"k{i}", ranges) == ranges[0][0])
    doc_path = store.meta._doc_path("s", "ev", "segments.json")
    sid0 = str(ranges[0][0])
    shard_dir = store.meta._doc_path("s", "ev", "manifests")

    sizes = []
    for b in range(31):
        store.append_events("s", "ev", [{"routing_key": key, "payload": f"x{b}"}])
        sizes.append(os.path.getsize(doc_path))
    # bounded, not flat: the doc grows with the open chain but every
    # fold snaps it back — across 31 commits (3+ folds at CHAIN_MAX=8)
    # the max doc size stays within one chain's worth of names
    assert max(sizes) <= sizes[0] + 9 * 64, sizes
    assert sizes[-1] <= max(sizes[:9]) + 64  # no cross-fold growth trend
    doc = store.meta.segments_doc("s", "ev")
    seg0 = doc["segments"][sid0]
    assert "files" not in seg0
    assert len(seg0.get("chain", [])) <= 8
    # only the touched segment carries manifest state
    untouched = [s for k, s in doc["segments"].items() if k != sid0]
    assert all(
        "manifest" not in s and "files" not in s and not s.get("chain") for s in untouched
    )
    # snapshot + chain resolve to all 31 files; exactly one live shard
    files = store.meta.segment_files("s", "ev", sid0, seg0)
    assert len(files) == 31
    shards = [f for f in os.listdir(shard_dir) if f.startswith(f"{sid0}.")]
    assert len(shards) == 1
    assert store.read("s", "ev").count() == 31


def test_fsck_sweeps_orphan_manifest_shards(store):
    """A crash between shard write and doc flip leaves an unreferenced
    manifests/<sid>.<v>.json; fsck reaps it without touching live shards."""
    import os

    from pravega_spark import fsio

    store.create_scope("s")
    store.create_stream("s", "ev", StreamConfiguration(scaling=ScalingPolicy.fixed(2)))
    store.append_events("s", "ev", [{"routing_key": "a", "payload": "x"}])
    shard_dir = store.meta._doc_path("s", "ev", "manifests")
    fsio.write_json_atomic(fsio.join(shard_dir, "999.42.json"), {"files": ["ghost.parquet"]})
    orphans = store.fsck_stream("s", "ev")
    assert any("999.42.json" in o for o in orphans)
    assert not os.path.exists(os.path.join(shard_dir, "999.42.json"))
    assert store.read("s", "ev").count() == 1  # live shard untouched


def test_two_stores_interleaved_txns(spark, store):
    """Two StreamStore instances (independent caches, shared root — the
    lock path is identical cross-process) interleave two transactions on
    one stream: both commit atomically, no txn-doc clobber, per-txn
    per-key order intact, and a duplicate commit is a no-op."""
    from pravega_spark.store import StreamStore

    store.create_scope("s")
    store.create_stream("s", "ev", StreamConfiguration(scaling=ScalingPolicy.fixed(2)))
    other = StreamStore(spark, store.root)

    t1 = store.begin_txn("s", "ev")
    t2 = other.begin_txn("s", "ev")
    df = lambda tag, n0: spark.createDataFrame(
        [(f"k{i % 3}", f"{tag}-{n0 + i}") for i in range(6)], "routing_key string, payload string"
    )
    t1.write_events(df("a", 0))
    t2.write_events(df("b", 0))
    t1.write_events(df("a", 6))
    t2.write_events(df("b", 6))
    t1.commit()
    t2.commit()
    t2.commit()  # idempotent replay
    out = store.read("s", "ev")
    assert out.count() == 24
    # the other instance's txn is visible in both stores' txn docs
    assert store.list_completed_txns("s", "ev") == other.list_completed_txns("s", "ev")
    assert len(store.list_completed_txns("s", "ev")) == 2
    # per-key sequence within each txn increases along offsets
    w = Window.partitionBy("routing_key", F.split("payload", "-").getItem(0)).orderBy("offset")
    viol = (
        out.withColumn("seq", F.split("payload", "-").getItem(1).cast("long"))
        .withColumn("prev", F.lag("seq").over(w))
        .filter(F.col("prev") > F.col("seq"))
        .count()
    )
    assert viol == 0
    # abort after material commit must refuse (state machine)
    import pytest as _pytest

    from pravega_spark.errors import TxnFailedException

    with _pytest.raises(TxnFailedException):
        store.get_txn("s", "ev", t2.txn_id).abort()
