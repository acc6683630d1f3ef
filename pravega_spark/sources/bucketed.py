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

from pravega_spark.sources.bucketing import bucketize
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
    """Load ``name`` as a table bucketed+sorted on its join key."""
    n = n_buckets or BUCKETS
    key = _BUCKET_KEYS[name]
    sfh = _source_fingerprint(sf_dir, name)
    tbl = f"pvs_{name}_b{n}_{sfh}"
    if not spark.catalog.tableExists(tbl):
        wh = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
        loc = os.path.join(wh.removeprefix("file:"), tbl)
        # a previous SESSION may have left a complete bucketed copy on
        # disk that the in-memory catalog forgot. The bucket id lives in
        # each file's name, so re-registering the files as an external
        # bucketed table restores the no-shuffle join without rewriting
        # (the sf10 copy costs ~37 s to build; re-registration is
        # metadata-only). _SUCCESS gates against half-written crashes;
        # the fingerprinted name gates against stale sources.
        # the DDL must declare exactly the layout the files HAVE: the
        # writer records its spec in a marker, and re-attach derives
        # CLUSTERED/SORTED BY from it. A copy without a matching marker
        # (pre-marker leftovers, foreign spec) is rebuilt — declaring a
        # sort order the files lack would let a merge join silently
        # elide a needed sort.
        from pravega_spark.sources.bucketing import read_bucket_spec

        spec = read_bucket_spec(loc)
        spec_ok = spec is not None and spec.get("keys") == [key] and spec.get("n_buckets") == n
        if os.path.isfile(os.path.join(loc, "_SUCCESS")) and spec_ok:
            try:
                cols = ", ".join(
                    f"`{f.name}` {f.dataType.simpleString()}"
                    for f in load_table(spark, sf_dir, name).schema.fields
                )
                sorted_by = f"SORTED BY ({key}) " if spec.get("sorted") else ""
                spark.sql(
                    f"CREATE TABLE {tbl} ({cols}) USING parquet "
                    f"CLUSTERED BY ({key}) {sorted_by}INTO {n} BUCKETS "
                    f"LOCATION '{os.path.abspath(loc)}'"
                )
                return spark.table(tbl)
            except Exception as e:
                # loud fall-through: a systematic DDL failure would
                # otherwise silently demote every session to a rebuild
                import warnings

                warnings.warn(f"bucketed re-attach of {tbl} failed ({e!r}); rebuilding")
                try:
                    spark.sql(f"DROP TABLE IF EXISTS {tbl}")
                except Exception:
                    pass  # half-created entry may make DROP fail too; rebuild below
        # no reusable copy: clear any partial files so saveAsTable can't
        # collide, then build
        if os.path.isdir(loc):
            import shutil

            shutil.rmtree(loc, ignore_errors=True)
        try:
            bucketize(
                spark,
                # one file per bucket, not one per input split
                load_table(spark, sf_dir, name).repartition(n, key),
                tbl,
                keys=[key],
                n_buckets=n,
            )
        except Exception:
            # a host whose warehouse dir isn't writable can't hold the
            # bucketed copy — results must not depend on the plan demo,
            # so degrade to the plain (shuffling) table
            return load_table(spark, sf_dir, name)
    return spark.table(tbl)
