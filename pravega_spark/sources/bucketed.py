"""Bucketed fact-table variants: the no-shuffle path for fact-fact joins.

At 100 TB the lineitem ⋈ orders join on orderkey is the one shuffle
Catalyst cannot remove from Q5/Q8-shaped plans (dimensions broadcast,
but two facts co-partition only if STORED co-partitioned). Spark's
answer is bucketing: both facts written with ``bucketBy(N, orderkey)``
+ ``sortBy`` let SortMergeJoin read bucket-aligned splits directly —
no Exchange, no sort, on either side, at any scale. The bucket count
is sized by environment (16 locally; ~2048 at 100 TB so each bucket is
a few GB).

Tables are materialized once per (sf_dir, table) into the session
warehouse as ``pvs_<table>_b<N>_<sfhash>`` and reused; the in-memory
catalog forgets them across sessions, in which case the files are
rewritten (cheap at test SFs; at production scale bucketing is a
one-time ETL step into a persistent metastore).
"""

from __future__ import annotations

import hashlib
import os

from pyspark.sql import DataFrame, SparkSession

from pravega_spark.sources.tables import load_table

BUCKETS = int(os.environ.get("PRAVEGA_SPARK_BUCKETS", "16"))

_BUCKET_KEYS = {
    "lineitem": "l_orderkey",
    "orders": "o_orderkey",
}


def _source_fingerprint(sf_dir: str, name: str) -> str:
    """Hash of (abspath, per-file size+mtime) of the source parquet, so a
    regenerated source at the same path yields a NEW table name — a
    long-lived session / persistent metastore can't serve stale buckets."""
    src = os.path.join(os.path.abspath(sf_dir), f"{name}.parquet")
    h = hashlib.md5(src.encode())
    try:
        files = [src]
        if os.path.isdir(src):
            files = sorted(
                os.path.join(src, f) for f in os.listdir(src) if not f.startswith(".")
            )
        for f in files:
            st = os.stat(f)
            h.update(f"|{os.path.basename(f)}:{st.st_size}:{st.st_mtime_ns}".encode())
    except OSError:
        pass  # unreadable source: fall back to path-only keying
    return h.hexdigest()[:8]


def bucketed_table(spark: SparkSession, sf_dir: str, name: str, n_buckets: int | None = None) -> DataFrame:
    """Load ``name`` as a table bucketed+sorted on its join key.

    All mechanics (locked check-GC-build, cross-session re-attach of a
    complete on-disk copy via its recorded bucket-spec marker, stale
    content-keyed sibling GC, unwritable-warehouse degrade) live in
    ``bucketing.ensure_bucketed_index`` — one implementation for the
    fact tables and the maintained dedup/quantizer indexes (r8: the
    r7 build-race lock now covers this path too)."""
    from pravega_spark.sources.bucketing import ensure_bucketed_index

    n = n_buckets or BUCKETS
    key = _BUCKET_KEYS[name]
    sfh = _source_fingerprint(sf_dir, name)
    tbl = f"pvs_{name}_b{n}_{sfh}"
    if ensure_bucketed_index(
        spark, f"pvs_{name}_b{n}_", tbl,
        lambda: load_table(spark, sf_dir, name), [key], n,
        source_path=os.path.join(os.path.abspath(sf_dir), f"{name}.parquet"),
    ):
        return spark.table(tbl)
    # a host whose warehouse dir isn't writable can't hold the bucketed
    # copy — results must not depend on the plan demo, so degrade to
    # the plain (shuffling) table
    return load_table(spark, sf_dir, name)
