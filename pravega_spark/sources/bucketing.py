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
    # invariant, never assume it
    try:
        loc = (
            spark.sql(f"DESCRIBE TABLE EXTENDED {table_name}")
            .filter("col_name = 'Location'")
            .collect()[0]["data_type"]
        ).removeprefix("file:")
        with open(os.path.join(loc, BUCKET_SPEC_MARKER), "w") as fh:
            json.dump({"keys": keys, "n_buckets": n_buckets, "sorted": bool(sort)}, fh)
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

        def _gc_siblings() -> None:
            for t in spark.catalog.listTables():
                if t.name.startswith(prefix) and t.name != tbl:
                    try:
                        spark.sql(f"DROP TABLE IF EXISTS {t.name}")
                    except Exception:
                        pass
            if _os.path.isdir(wh_dir):
                for d in _os.listdir(wh_dir):
                    if d.startswith(prefix) and d != tbl:
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
                spark, build_df().repartition(n_buckets, *keys), tbl, keys, n_buckets
            )
        except Exception:
            return False
    return True
