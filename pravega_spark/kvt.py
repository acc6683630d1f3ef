"""Key-Value Tables: partitioned, versioned KV store with CAS updates.

Reference surface (client/.../tables/KeyValueTable.java:119-216,
KeyValueTableImpl.java:57; server table segments
segmentstore/contracts/tables/TableStore.java:65-318):
  - update(Insert/Put/Remove[, expected Version]) → new Version (K1)
  - get/getAll/exists (K2)
  - iterators: all / forPrefix / forRange / forPrimaryKey (K3)
  - entryDeltaIterator from a position (K4)
  - compaction dropping superseded versions (TableCompactor.java:71)

Spark-native design: an append-only version log as Parquet partitioned
by ``bucket = hash(pk) % partition_count`` (the reference's
partitionCount), committed through a MANIFEST: data files are staged
under unique names and become visible only when the meta document —
which carries the file list AND the next version counter in one atomic
JSON write — lands. A crash between the parquet write and the meta
write leaves invisible orphans and an unconsumed version number, so
latest-version resolution (row_number over desc(version)) stays
deterministic and CAS checks can never observe a half-applied batch
(the same data+marker atomicity ``store.py _commit_rows`` provides for
streams). All file operations go through ``fsio`` so KVTs work on
object-store roots like the rest of the engine.

Reads resolve the latest version per key with a window (max-version
row); ``compact()`` rewrites the log keeping only live heads — the
lakehouse MERGE/OPTIMIZE pattern replacing the reference's hash-table
segment + compactor. The version log doubles as the change feed (delta
iterator) for free.

At scale: point lookups prune to one bucket partition + parquet
row-group stats on pk; range scans prune by min/max pk stats; the
latest-version window shuffles only the touched buckets.
"""

from __future__ import annotations

import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from pravega_spark import fsio
from pravega_spark.config import KeyValueTableConfiguration
from pravega_spark.hashing import bucket_for_key_py, hash_to_bucket
from pravega_spark.errors import (
    BadKeyVersionException,
    ConcurrentModificationException,
    NoSuchKeyException,
)

# Version sentinels mirroring tables.Version.NO_VERSION / NOT_EXISTS
ANY_VERSION = -1
MUST_NOT_EXIST = -2

# Update batches at/below this row count commit driver-side via pyarrow
# (zero Spark jobs), mirroring the stream store's hot tier; larger
# batches take the distributed writer. KVT updates are the reference's
# millisecond client path (TableSegment appends), not an analytics job.
KVT_HOT_MAX_ROWS = int(os.environ.get("PRAVEGA_SPARK_KVT_HOT_MAX_ROWS", "100000"))


class KeyValueTable:
    """One KVT instance rooted at ``<root>/kvt/<scope>/<name>``."""

    def __init__(self, spark: SparkSession, root: str, scope: str, name: str,
                 config: KeyValueTableConfiguration | None = None):
        self.spark = spark
        self.scope, self.name = scope, name
        self.path = fsio.join(root, "kvt", scope, name)
        self.meta_path = fsio.join(self.path, "_kvt_meta.json")
        self.data_path = fsio.join(self.path, "log")
        doc = fsio.read_json(self.meta_path, None)
        # True when THIS open created the table (CLI reports it so
        # scripts can detect already-exists — r7 ADVICE fix)
        self.was_created = doc is None
        if doc is not None:
            self.config = KeyValueTableConfiguration(**doc["config"])
            self._next_version = doc["next_version"]
            self._meta_version = doc.get("version", 0)
            if "files" in doc:
                self._files = list(doc["files"])
            else:
                # pre-manifest layout: adopt whatever is on disk once
                self._files = sorted(self._list_data_files())
                self._save_meta()
        else:
            self.config = config or KeyValueTableConfiguration()
            self._next_version = 1
            self._meta_version = 0
            self._files = []
            self._save_meta()

    def _list_data_files(self) -> set[str]:
        return {
            f
            for f in fsio.list_files_recursive(self.data_path)
            if f.endswith(".parquet") and not os.path.basename(f).startswith(("_", "."))
        }

    def _reload_meta(self) -> None:
        """Adopt the latest committed state (files + version counter) —
        called under the table lock so cross-process instances serialize
        their CAS checks against fresh state, not a stale cache."""
        doc = fsio.read_json(self.meta_path, None)
        if doc is not None:
            self._next_version = doc["next_version"]
            self._meta_version = doc.get("version", 0)
            self._files = list(doc.get("files", []))

    def _lock(self):
        # heartbeat-renewed lease lock: a multi-second Spark job inside
        # the locked section never outlives its lease just for being slow
        return fsio.locked(fsio.join(self.path, "commit.lock"))

    def _save_meta(self) -> None:
        """The single atomic commit point: file manifest + version
        counter, written CONDITIONALLY on the doc version loaded at
        ``_reload_meta`` — a fenced-out holder (lease reaped during a
        pause) fails here instead of clobbering another process's commit
        (same protocol as ``MetadataStore.put_segments_doc``)."""
        current = fsio.read_json(self.meta_path, None)
        stored = current.get("version", 0) if current is not None else 0
        if current is not None and stored != self._meta_version:
            raise ConcurrentModificationException(
                f"kvt {self.scope}/{self.name} meta at version {stored}, "
                f"expected {self._meta_version} — concurrent commit won"
            )
        self._meta_version += 1
        fsio.write_json_atomic(
            self.meta_path,
            {
                "config": self.config.__dict__,
                "version": self._meta_version,
                "next_version": self._next_version,
                "files": sorted(self._files),
                "updated": time.time(),
            },
        )

    # ---------------- write path (K1) ----------------
    def _log(self) -> DataFrame | None:
        # always adopt the latest committed manifest: reads must see
        # other processes' commits (reference gets are server-side and
        # always current), and the meta doc is one small JSON read
        self._reload_meta()
        if not self._files:
            return None
        return self.spark.read.option("basePath", self.data_path).parquet(
            *[fsio.join(self.data_path, f) for f in self._files]
        )

    def _latest(self) -> DataFrame | None:
        log = self._log()
        if log is None:
            return None
        w = Window.partitionBy("pk", "sk").orderBy(F.desc("version"))
        return log.withColumn("_rk", F.row_number().over(w)).filter(F.col("_rk") == 1).drop("_rk")

    def update(self, entries: list[tuple], kinds: list[str], expected_versions: list[int] | None = None) -> int:
        """Atomic batch of Insert/Put/Remove modifications (one commit).

        ``entries`` = [(pk, sk, value)] (value ignored for Remove);
        ``kinds`` ∈ {insert, put, remove}; ``expected_versions`` aligns
        with entries (ANY_VERSION = unconditional, MUST_NOT_EXIST =
        insert-only). Raises BadKeyVersionException / NoSuchKeyException
        and commits nothing on conditional failure — matching the
        reference's all-or-nothing batch (KeyValueTable.java:173).
        Returns the version assigned to this batch.
        """
        with self._lock():
            self._reload_meta()  # serialize CAS against other processes
            return self._update_locked(entries, kinds, expected_versions)

    def _update_locked(self, entries: list[tuple], kinds: list[str],
                       expected_versions: list[int] | None = None) -> int:
        # normalize sk=None to "" up front: stored rows use "", so a
        # None-keyed CAS lookup would otherwise never match the stored
        # row and e.g. let an insert of (pk, None) succeed next to an
        # existing (pk, "") — two versions of one logical key
        entries = [(pk, sk if sk is not None else "", v) for pk, sk, v in entries]
        expected = expected_versions or [ANY_VERSION] * len(entries)
        keys = {(e[0], e[1]) for e in entries}
        # unconditional puts need no key-index lookup (the reference's
        # unconditional TableSegment update skips ContainerKeyIndex's
        # bucket-offset resolution, ContainerKeyIndex.java) — the CAS
        # read only runs when some entry is conditional, an insert, or
        # a remove (absent-key removes are no-ops, which needs current)
        needs_cas = any(
            kind != "put" or exp != ANY_VERSION for kind, exp in zip(kinds, expected)
        )
        current: dict[tuple, int] = {}
        if needs_cas:
            latest = self._bucket_pruned([k[0] for k in keys])  # CAS check reads only the keys' buckets
            if latest is not None:
                rows = latest.filter(F.col("pk").isin([k[0] for k in keys])).select("pk", "sk", "version").collect()
                for r in rows:
                    if (r["pk"], r["sk"]) in keys:
                        current[(r["pk"], r["sk"])] = r["version"]
        skip: set[int] = set()
        for i, ((pk, sk, _), kind, exp) in enumerate(zip(entries, kinds, expected)):
            cur = current.get((pk, sk))
            if kind == "insert" or exp == MUST_NOT_EXIST:
                if cur is not None:
                    raise BadKeyVersionException(f"key {pk!r}/{sk!r} exists at version {cur}")
            elif exp != ANY_VERSION:
                if cur is None:
                    raise NoSuchKeyException(f"key {pk!r}/{sk!r} does not exist")
                if cur != exp:
                    raise BadKeyVersionException(f"key {pk!r}/{sk!r}: expected {exp}, found {cur}")
            if kind == "remove" and cur is None and exp == ANY_VERSION:
                # removing an absent key unconditionally is a no-op in the
                # reference; keep the tombstone out of the log (the row
                # build below must actually SKIP it, not just note it —
                # a phantom tombstone would surface a delete event for a
                # key that never existed in entry_delta_iterator)
                skip.add(i)
        version = self._next_version
        n_buckets = self.config.partition_count
        rows = [
            {
                "pk": pk,
                "sk": sk if sk is not None else "",
                "value": value if kind != "remove" else None,
                "version": version,
                "deleted": kind == "remove",
            }
            for i, ((pk, sk, value), kind) in enumerate(zip(entries, kinds))
            if i not in skip
        ]
        if not rows:
            # a batch of pure no-ops mutates nothing: no version burned,
            # no file committed
            return self._next_version - 1
        tag = uuid.uuid4().hex[:8]
        if len(rows) <= KVT_HOT_MAX_ROWS:
            # hot path: per-bucket pyarrow writes, zero Spark jobs —
            # file schema identical to the distributed writer's
            new_files = self._write_rows_hot(rows, version, tag, n_buckets)
        else:
            df = self.spark.createDataFrame(
                rows, "pk string, sk string, value string, version long, deleted boolean"
            ).withColumn("bucket", hash_to_bucket("pk", n_buckets))
            # stage → move under unique names → manifest flip (atomic commit)
            tmp = f"{self.data_path}.commit.{tag}"
            df.write.mode("overwrite").partitionBy("bucket").parquet(tmp)
            new_files = []
            for rel in sorted(
                f for f in fsio.list_files_recursive(tmp)
                if f.endswith(".parquet") and not os.path.basename(f).startswith(("_", "."))
            ):
                part = rel.split(os.sep, 1)[0]
                if not part.startswith("bucket="):
                    continue
                dst_rel = os.path.join(part, f"v{version}-{tag}-{os.path.basename(rel)}")
                fsio.move(fsio.join(tmp, rel), fsio.join(self.data_path, dst_rel))
                new_files.append(dst_rel)
            fsio.rmtree(tmp)
        self._files = sorted(self._files + new_files)
        self._next_version = version + 1
        self._save_meta()  # data + version become visible together
        return version

    def _write_rows_hot(self, rows: list[dict], version: int, tag: str,
                        n_buckets: int) -> list[str]:
        """Driver-side commit of a small update batch: bucket routing
        via the scalar twin of the JVM hash, one parquet file per
        touched bucket, exactly the columns/types the Spark writer
        produces (bucket rides in the partition dir, not the file)."""
        import pyarrow as pa

        schema = pa.schema([
            ("pk", pa.string()), ("sk", pa.string()), ("value", pa.string()),
            ("version", pa.int64()), ("deleted", pa.bool_()),
        ])
        by_bucket: dict[int, list[dict]] = {}
        for r in rows:
            by_bucket.setdefault(bucket_for_key_py(r["pk"], n_buckets), []).append(r)
        out: list[str] = []
        for b, rs in sorted(by_bucket.items()):
            rel = os.path.join(f"bucket={b}", f"v{version}-{tag}-hot.parquet")
            fsio.parquet_write_table(pa.Table.from_pylist(rs, schema=schema),
                                     fsio.join(self.data_path, rel))
            out.append(rel)
        return out

    def insert(self, pk: str, value: str, sk: str = "") -> int:
        return self.update([(pk, sk, value)], ["insert"])

    def put(self, pk: str, value: str, sk: str = "", expected_version: int = ANY_VERSION) -> int:
        return self.update([(pk, sk, value)], ["put"], [expected_version])

    def remove(self, pk: str, sk: str = "", expected_version: int = ANY_VERSION) -> int:
        return self.update([(pk, sk, None)], ["remove"], [expected_version])

    # ---------------- read path (K2/K3/K4) ----------------
    def snapshot(self) -> DataFrame:
        """Latest live entries as a DataFrame (the MERGE result)."""
        latest = self._latest()
        if latest is None:
            return self.spark.createDataFrame([], "pk string, sk string, value string, version long")
        return latest.filter(~F.col("deleted")).select("pk", "sk", "value", "version")

    def _bucket_pruned(self, pks: list[str]) -> DataFrame | None:
        """Latest entries restricted to the pks' buckets — the bucket is
        computed driver-side from the same md5 hash the writer used, so
        the filter prunes whole ``bucket=N`` partitions before any scan
        (the table-segment key-index lookup, Spark-shaped)."""
        log = self._log()
        if log is None:
            return None
        buckets = sorted({bucket_for_key_py(pk, self.config.partition_count) for pk in pks})
        pruned = log.filter(F.col("bucket").isin(buckets))
        w = Window.partitionBy("pk", "sk").orderBy(F.desc("version"))
        return (
            pruned.withColumn("_rk", F.row_number().over(w))
            .filter((F.col("_rk") == 1) & ~F.col("deleted"))
            .drop("_rk")
        )

    def get(self, pk: str, sk: str = "") -> tuple[str, int] | None:
        latest = self._bucket_pruned([pk])
        if latest is None:
            return None
        rows = latest.filter((F.col("pk") == pk) & (F.col("sk") == sk)).collect()
        return (rows[0]["value"], rows[0]["version"]) if rows else None

    def get_all(self, keys: list[tuple[str, str]]) -> dict[tuple[str, str], tuple[str, int]]:
        pks = [k[0] for k in keys]
        latest = self._bucket_pruned(pks)
        if latest is None:
            return {}
        rows = latest.filter(F.col("pk").isin(pks)).collect()
        want = set(keys)
        return {
            (r["pk"], r["sk"]): (r["value"], r["version"])
            for r in rows
            if (r["pk"], r["sk"]) in want
        }

    def exists(self, pk: str, sk: str = "") -> bool:
        return self.get(pk, sk) is not None

    def iterate_all(self) -> DataFrame:
        return self.snapshot().orderBy("pk", "sk")

    def iterate_prefix(self, prefix: str) -> DataFrame:
        return self.snapshot().filter(F.col("pk").startswith(prefix)).orderBy("pk", "sk")

    def iterate_range(self, from_pk: str, to_pk: str) -> DataFrame:
        return (
            self.snapshot()
            .filter((F.col("pk") >= from_pk) & (F.col("pk") < to_pk))
            .orderBy("pk", "sk")
        )

    def iterate_primary_key(self, pk: str, sk_from: str | None = None, sk_to: str | None = None) -> DataFrame:
        df = self.snapshot().filter(F.col("pk") == pk)
        if sk_from is not None:
            df = df.filter(F.col("sk") >= sk_from)
        if sk_to is not None:
            df = df.filter(F.col("sk") < sk_to)
        return df.orderBy("sk")

    def entry_delta_iterator(self, from_version: int = 0) -> DataFrame:
        """Change feed: every modification (incl. tombstones) after a
        position (TableStore.entryDeltaIterator:311)."""
        log = self._log()
        if log is None:
            return self.spark.createDataFrame(
                [], "pk string, sk string, value string, version long, deleted boolean"
            )
        return (
            log.filter(F.col("version") > from_version)
            .select("pk", "sk", "value", "version", "deleted")
            .orderBy("version", "pk", "sk")
        )

    # ---------------- maintenance ----------------
    def compact(self) -> None:
        """Drop superseded versions + tombstones (TableCompactor.java:71):
        rewrite the log keeping only the live head per key, manifest-safe
        (readers see the old or the new file set, never neither)."""
        with self._lock():
            self._reload_meta()
            self._compact_locked()

    def _compact_locked(self) -> None:
        snap = self.snapshot()
        tag = uuid.uuid4().hex[:8]
        tmp = f"{self.data_path}.compact.{tag}"
        (
            snap.withColumn("deleted", F.lit(False))
            .withColumn("bucket", hash_to_bucket("pk", self.config.partition_count))
            .write.mode("overwrite")
            .partitionBy("bucket")
            .parquet(tmp)
        )
        new_files: list[str] = []
        for rel in sorted(
            f for f in fsio.list_files_recursive(tmp)
            if f.endswith(".parquet") and not os.path.basename(f).startswith(("_", "."))
        ):
            part = rel.split(os.sep, 1)[0]
            if not part.startswith("bucket="):
                continue
            dst_rel = os.path.join(part, f"compact-{tag}-{os.path.basename(rel)}")
            fsio.move(fsio.join(tmp, rel), fsio.join(self.data_path, dst_rel))
            new_files.append(dst_rel)
        fsio.rmtree(tmp)
        old_files = self._files
        self._files = sorted(new_files)
        self._save_meta()  # visibility flip
        for rel in old_files:  # now-invisible originals
            fsio.remove(fsio.join(self.data_path, rel))

    def fsck(self) -> list[str]:
        """Reap orphan parquet files from crashed commits/compactions.

        Takes the table lock and re-reads the committed manifest first:
        reaping against this instance's cached ``_files`` would delete
        files other processes committed since we last loaded the meta
        doc (and the lock keeps a concurrent commit's staged-but-not-
        yet-published files from being swept mid-flight — KVT commits
        stage and publish entirely under the lock)."""
        with self._lock():
            self._reload_meta()
            orphans = sorted(self._list_data_files() - set(self._files))
            for rel in orphans:
                fsio.remove(fsio.join(self.data_path, rel))
            return orphans


class KeyValueTableManager:
    """KVT DDL (reference: KeyValueTableManager.java / D8)."""

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root

    def create_key_value_table(self, scope: str, name: str,
                               config: KeyValueTableConfiguration | None = None) -> KeyValueTable:
        return KeyValueTable(self.spark, self.root, scope, name, config)

    def open(self, scope: str, name: str) -> KeyValueTable:
        return KeyValueTable(self.spark, self.root, scope, name)

    def list_key_value_tables(self, scope: str) -> list[str]:
        d = fsio.join(self.root, "kvt", scope)
        if not fsio.isdir(d):
            return []
        # a KVT exists iff its meta doc does; derive names from file paths
        names = {
            rel.split(os.sep, 1)[0]
            for rel in fsio.list_files_recursive(d)
            if os.sep in rel and rel.split(os.sep, 1)[1].startswith("_kvt_meta.json")
        }
        return sorted(names)

    def delete_key_value_table(self, scope: str, name: str) -> bool:
        p = fsio.join(self.root, "kvt", scope, name)
        if fsio.isdir(p):
            fsio.rmtree(p)
            return True
        return False
