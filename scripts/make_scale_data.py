"""Derive an sf1-scale dataset (10x sf0.1) for local scale validation.

The driver's testdata tops out at sf0.1 (600k lineitem); VERDICT r4
item 2 asks for evidence that the engine's plans scale ~linearly one
order of magnitude up. This generator unions 10 key-shifted copies of
sf0.1 so every table grows 10x while:

  * referential integrity holds per copy (orderkey/custkey/partkey/
    suppkey/user_id shift together by copy-indexed bases);
  * per-copy join selectivity and value distributions are IDENTICAL to
    sf0.1 (dates, prices, flags untouched), so a query's work grows
    linearly with rows;
  * duplicate/similarity structure stays bounded: documents and
    embeddings become 10-member exact-duplicate clusters (45 pairs per
    cluster), a realistic corpus shape that keeps LSH candidate counts
    linear.

nation/region are fixed dimension tables and stay single-copy.

Output is written OUTSIDE testdata (which is read-only) to
``.scale/sf1`` in the repo (gitignored). Usage:

    python scripts/make_scale_data.py [out_dir] [n_copies]
"""

from __future__ import annotations

import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from pravega_spark.session import get_spark  # noqa: E402
from pravega_spark.sources import load_table  # noqa: E402

SRC = "/root/testdata/sf0.1"

# copy-indexed key shift bases — all comfortably above sf0.1 max ids
BASES = {
    "orderkey": 10_000_000,
    "custkey": 1_000_000,
    "partkey": 1_000_000,
    "suppkey": 100_000,
    "user": 10_000_000,
    "event": 100_000_000,
    # documents queries synthesize in-query duplicates at doc_id +1M/+2M
    # (queries/text.py); copy shifts must stay clear of that band or two
    # DIFFERENT texts collide on one doc_id (breaks Jaccard invariants)
    "doc": 100_000_000,
    "vec": 100_000_000,
}

# table -> {column: base_name}
SHIFTS = {
    "lineitem": {"l_orderkey": "orderkey", "l_partkey": "partkey", "l_suppkey": "suppkey"},
    "orders": {"o_orderkey": "orderkey", "o_custkey": "custkey"},
    "customer": {"c_custkey": "custkey"},
    "part": {"p_partkey": "partkey"},
    "supplier": {"s_suppkey": "suppkey"},
    "events": {"event_id": "event", "user_id": "user"},
    "documents": {"doc_id": "doc"},
    "embeddings": {"vec_id": "vec"},
}

FIXED = ("nation", "region")


def main() -> None:
    out_dir = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".scale", "sf1"
    )
    n_copies = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    spark = get_spark("make-scale-data")
    os.makedirs(out_dir, exist_ok=True)
    for name in FIXED:
        dst = os.path.join(out_dir, f"{name}.parquet")
        shutil.rmtree(dst, ignore_errors=True)
        if os.path.isfile(dst):
            os.unlink(dst)
        load_table(spark, SRC, name).write.mode("overwrite").parquet(dst)
        print(f"{name}: copied", file=sys.stderr)
    # enough output files for realistic multi-split parallelism, more
    # when the expansion is large so single write tasks stay bounded
    parts = 32 if n_copies <= 100 else 128
    for name, shifts in SHIFTS.items():
        base_df = load_table(spark, SRC, name)
        # one crossJoin against a broadcast copy-index range instead of
        # an n-way unionByName: identical row multiset, but the plan is
        # ONE node at any n — a 1000-copy union (sf100) explodes
        # Catalyst planning, the range join doesn't. Repartition the
        # SMALL base BEFORE the expansion: shuffling after it moves
        # n_copies× the bytes (a 1000-copy lineitem post-expand shuffle
        # is ~60 GB of scratch; the pre-expand one is ~17 MB).
        out = base_df.repartition(parts).crossJoin(
            F.broadcast(spark.range(n_copies).withColumnRenamed("id", "_copy"))
        )
        for col, base_name in shifts.items():
            out = out.withColumn(
                col, (F.col(col) + F.col("_copy") * F.lit(BASES[base_name])).cast("long")
            )
        out = out.drop("_copy")
        dst = os.path.join(out_dir, f"{name}.parquet")
        shutil.rmtree(dst, ignore_errors=True)
        out.write.mode("overwrite").parquet(dst)
        n = spark.read.parquet(dst).count()
        print(f"{name}: {n} rows ({n_copies} copies)", file=sys.stderr)
    print(f"done -> {out_dir}", file=sys.stderr)


if __name__ == "__main__":
    main()
