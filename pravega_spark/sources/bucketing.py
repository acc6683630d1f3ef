"""Bucketed (co-located) table support — the shuffle-free big⋈big join.

At 100 TB the one shuffle left in TPC-H-shape plans is the
fact⋈fact join (e.g. lineitem⋈orders on orderkey — broadcast handles
every dim join, but neither fact side fits in memory). Spark's answer
is BUCKETING: both tables hash-clustered into the same number of
buckets on the join key at WRITE time; the join then reads
bucket-aligned splits and the Exchange disappears from the plan
entirely (verified by ``assert_no_exchange_join``). This is the same
idea as the stream layout itself — data pre-partitioned by key so
consumers never reshuffle — applied to derived analytical tables.

Usage::

    bucketize(spark, lineitem_df, "lineitem_b", keys=["l_orderkey"], n_buckets=64)
    bucketize(spark, orders_df,   "orders_b",   keys=["o_orderkey"], n_buckets=64)
    j = spark.table("lineitem_b").join(
            spark.table("orders_b"),
            F.col("l_orderkey") == F.col("o_orderkey"))
    # j's physical plan: two bucketed scans -> SortMergeJoin, NO Exchange

Bucket count guidance: total-table-bytes / 256 MB, identical on both
sides (Spark requires equal bucket counts for exchange elimination).
"""

from __future__ import annotations

import json
import os
import threading
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

# serializes every check-GC-build sequence in ensure_bucketed_index:
# two harness threads sharing one session could both see
# tableExists()==False and race rmtree/DROP/saveAsTable on the same
# warehouse location (r7 ADVICE; generalized to ALL bucketed builds in
# r8). One lock for every prefix — builds are rare and short, and a
# single lock can never deadlock.
_INDEX_BUILD_LOCK = threading.Lock()

# Written next to the bucketed files so a later session can re-register
# the copy as an external table with the SAME bucket/sort spec the
# writer used (bucketed.py re-attach) instead of hardcoding SORTED BY.
BUCKET_SPEC_MARKER = "_PVS_BUCKET_SPEC.json"


def read_bucket_spec(location: str) -> dict | None:
    """The writer's recorded spec for a bucketed copy, or None."""
    try:
        with open(os.path.join(location, BUCKET_SPEC_MARKER)) as fh:
            return json.load(fh)
    except (OSError, ValueError):
        return None


def bucketize(
    spark: SparkSession,
    df: DataFrame,
    table_name: str,
    keys: list[str],
    n_buckets: int,
    sort: bool = True,
    overwrite: bool = True,
    source_path: str | None = None,
) -> None:
    """Persist ``df`` as a bucketed (and bucket-sorted) catalog table."""
    if overwrite:
        spark.sql(f"DROP TABLE IF EXISTS {table_name}")
    writer = df.write.format("parquet").bucketBy(n_buckets, *keys)
    if sort:
        writer = writer.sortBy(*keys)
    writer.mode("overwrite").saveAsTable(table_name)
    # record the spec the files actually have, for cross-session
    # re-attach: the DDL there must declare sortedness from THIS
    # invariant, never assume it. ``source`` scopes sibling GC (r9): a
    # copy is reaped by a later build only when it derives from the
    # SAME source path (i.e. the source regenerated) — copies of other
    # sf_dirs survive a session that alternates between datasets.
    try:
        loc = (
            spark.sql(f"DESCRIBE TABLE EXTENDED {table_name}")
            .filter("col_name = 'Location'")
            .collect()[0]["data_type"]
        ).removeprefix("file:")
        with open(os.path.join(loc, BUCKET_SPEC_MARKER), "w") as fh:
            json.dump(
                {"keys": keys, "n_buckets": n_buckets, "sorted": bool(sort),
                 "source": source_path},
                fh,
            )
    except Exception:
        pass  # non-local warehouse: re-attach will rebuild instead


def is_shuffle_free_join(joined: DataFrame) -> bool:
    """True iff the physical plan contains a join but no shuffle
    Exchange (broadcast exchanges are fine — they're the point)."""
    plan = joined._jdf.queryExecution().executedPlan().toString()
    lines = [ln for ln in plan.splitlines() if "Exchange" in ln]
    shuffles = [ln for ln in lines if "BroadcastExchange" not in ln]
    return ("Join" in plan) and not shuffles


def ensure_bucketed_index(
    spark: SparkSession,
    prefix: str,
    tbl: str,
    build_df: Callable[[], DataFrame],
    keys: list[str],
    n_buckets: int,
    source_path: str | None = None,
) -> bool:
    """Idempotently materialize ``tbl`` (= ``prefix`` + content key) as
    a bucketed+sorted catalog table of ``build_df()``, GC'ing stale
    siblings under the same prefix. False = warehouse unwritable; the
    caller degrades to its unindexed (shuffling) twin.

    Names are keyed by source CONTENT fingerprint (per-file size+mtime),
    not just path — a regenerated corpus at the same path must mint a
    NEW index, never serve stale rows; every regeneration therefore
    also orphans the old name, so stale siblings (catalog entries AND
    warehouse dirs a previous session's in-memory catalog forgot) are
    dropped here before each build. A COMPLETE on-disk copy from a
    previous session (_SUCCESS + matching bucket-spec marker) is
    RE-ATTACHED as an external bucketed table instead of rebuilt —
    metadata-only, same as sources/bucketed.py's fact tables; the
    maintained index's whole point is that the standing corpus is
    processed once, not once per session."""
    import os as _os
    import shutil as _shutil

    with _INDEX_BUILD_LOCK:
        if spark.catalog.tableExists(tbl):
            return True
        wh = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
        wh_dir = wh.removeprefix("file:")
        loc = _os.path.join(wh_dir, tbl)

        def _stale_sibling(name: str) -> bool:
            """A same-prefix sibling is reaped only when it provably
            derives from OUR source (the source regenerated under the
            same path, so the old copy can never be served again) or
            carries no readable spec (legacy/mid-build debris). A
            sibling recording a DIFFERENT source path belongs to
            another dataset a session is alternating with — dropping
            it would force a full rebuild on every switch and its
            rmtree races that dataset's concurrent readers (r8 ADVICE).
            """
            if name == tbl or not name.startswith(prefix):
                return False
            sib_spec = read_bucket_spec(_os.path.join(wh_dir, name))
            if sib_spec is None:
                return True
            sib_src = sib_spec.get("source")
            return sib_src is None or source_path is None or sib_src == source_path

        def _gc_siblings() -> None:
            for t in spark.catalog.listTables():
                if _stale_sibling(t.name):
                    try:
                        spark.sql(f"DROP TABLE IF EXISTS {t.name}")
                    except Exception:
                        pass
            if _os.path.isdir(wh_dir):
                for d in _os.listdir(wh_dir):
                    if _stale_sibling(d):
                        _shutil.rmtree(_os.path.join(wh_dir, d), ignore_errors=True)

        spec = read_bucket_spec(loc)
        spec_ok = (
            spec is not None
            and spec.get("keys") == keys
            and spec.get("n_buckets") == n_buckets
        )
        if _os.path.isfile(_os.path.join(loc, "_SUCCESS")) and spec_ok:
            try:
                cols = ", ".join(
                    f"`{f.name}` {f.dataType.simpleString()}"
                    for f in build_df().schema.fields
                )
                sorted_by = f"SORTED BY ({', '.join(keys)}) " if spec.get("sorted") else ""
                spark.sql(
                    f"CREATE TABLE {tbl} ({cols}) USING parquet "
                    f"CLUSTERED BY ({', '.join(keys)}) {sorted_by}"
                    f"INTO {n_buckets} BUCKETS LOCATION '{_os.path.abspath(loc)}'"
                )
                _gc_siblings()
                return True
            except Exception as e:
                import warnings

                warnings.warn(f"index re-attach of {tbl} failed ({e!r}); rebuilding")
                try:
                    spark.sql(f"DROP TABLE IF EXISTS {tbl}")
                except Exception:
                    pass
        if _os.path.isdir(loc):
            _shutil.rmtree(loc, ignore_errors=True)
        _gc_siblings()
        try:
            # one file per bucket: sortBy sorts per FILE, so multi-file
            # buckets would force a merge Sort back into every reader
            bucketize(
                spark, build_df().repartition(n_buckets, *keys), tbl, keys, n_buckets,
                source_path=source_path,
            )
        except Exception:
            return False
    return True


# Exactly-once increment markers for maintained (appendable) indexes.
APPLIED_MARKER = "_PVS_APPLIED.json"


def applied_increments(spark: SparkSession, tbl: str) -> list[str]:
    """Increment ids already merged into ``tbl`` (empty if none)."""
    loc = _table_location(spark, tbl)
    if loc is None:
        return []
    try:
        with open(os.path.join(loc, APPLIED_MARKER)) as fh:
            return list(json.load(fh).get("applied", []))
    except (OSError, ValueError):
        return []


def _table_location(spark: SparkSession, tbl: str) -> str | None:
    try:
        return (
            spark.sql(f"DESCRIBE TABLE EXTENDED {tbl}")
            .filter("col_name = 'Location'")
            .collect()[0]["data_type"]
        ).removeprefix("file:")
    except Exception:
        return None


def increment_applied(spark: SparkSession, tbl: str, increment_id: str) -> bool:
    """True if ``append_bucketed_index(tbl, ..., increment_id)`` already
    ran — i.e. the standing index ALREADY CONTAINS that increment's rows
    and a rerun's append would be a marker no-op.

    Lets a maintained-loop rerun skip building the whole
    classify-the-increment lineage whose only consumer is the append
    (guide §1.2 "don't compute things you throw away": on a rerun that
    tree is dead — ~0.7 s of driver-side plan construction per call in
    the two-day dedup queries, never a job). Lock-free read is safe: the
    marker lands via write-temp + atomic rename, so a concurrent
    appender is seen either not-yet-applied (caller proceeds to
    append_bucketed_index, which re-checks under the cross-process
    lock — exactly-once holds) or applied (skip, identical table)."""
    return increment_id in applied_increments(spark, tbl)


def append_bucketed_index(
    spark: SparkSession,
    tbl: str,
    df: DataFrame,
    keys: list[str],
    n_buckets: int,
    increment_id: str,
) -> bool:
    """Close the index-maintenance loop: merge an increment's rows into
    a STANDING bucketed index — bucket-aligned files appended under the
    same CLUSTERED BY spec, NO index rebuild — so tomorrow's dedup run
    sees today's surviving documents. Returns True if the increment was
    applied now, False if a previous run already merged it (the
    ``increment_id`` marker is the writer_seqs analogue of the stream
    plane: reruns of the same daily job are no-ops).

    Crash window: a crash between the file append and the marker write
    makes a rerun append the increment's band rows twice. That is
    RESULT-SAFE for the dedup queries by construction — band postings
    feed a DISTINCT candidate stage, so duplicate postings change no
    output — and the next full rebuild (source regeneration) clears the
    physical duplication. The marker itself lands via write-temp +
    atomic rename (r10): a crash mid-marker-write can therefore never
    leave a TORN marker that loses the whole applied history — the
    rerun either sees the previous complete marker (appends once more,
    result-safe as above) or the new complete one (no-op); a future
    consumer that AGGREGATES postings (df counts) can rely on at most
    one duplicated increment, never a corrupted ledger. Readers of the
    appended table see multi-file buckets: Spark keeps the bucket
    co-location (no Exchange on the key), adding only a local
    per-bucket Sort where sortedness matters.
    """
    from pravega_spark import fsio

    with _INDEX_BUILD_LOCK:
        loc = _table_location(spark, tbl)
        if loc is None:
            raise ValueError(f"append_bucketed_index: no such table {tbl}")
        # cross-process exactly-once: the marker check-then-append must
        # serialize across daily-job PROCESSES sharing one warehouse,
        # not just threads of this session (a lost race double-appends —
        # result-safe for the dedup queries, but physical duplication
        # the next rebuild would have to carry)
        with fsio.locked(os.path.join(loc, "_PVS_APPEND.lock")):
            marker = os.path.join(loc, APPLIED_MARKER)
            try:
                with open(marker) as fh:
                    applied = list(json.load(fh).get("applied", []))
            except (OSError, ValueError):
                applied = []
            if increment_id in applied:
                return False
            (
                df.write.format("parquet")
                .bucketBy(n_buckets, *keys)
                .sortBy(*keys)
                .mode("append")
                .saveAsTable(tbl)
            )
            fsio.write_json_atomic(marker, {"applied": applied + [increment_id]})
            # the catalog caches file listings per table; a same-session
            # reader planned BEFORE this append must not miss the files
            spark.catalog.refreshTable(tbl)
    return True
