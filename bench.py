"""Benchmark runner: headline queries at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line:
  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": <sf>}

Each query is timed to full materialization (collect) after a shared
session warm-up, on local[$SPARK_GRAFT_CPUS].
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q8_market_share",
    "q10_returned_items",
    "q18_large_volume_customers",
    "events_hourly_agg",
    "events_sessionization",
    "events_asof_purchase",
    "stream_tail_offsets",
    "streamcut_bounded_read",
    "kvt_latest_version",
    "text_quality_score",
    "dedup_minhash_pairs",
    "dedup_ngram_jaccard",
    "dedup_simhash",
    "similarity_topk_bruteforce",
    "similarity_lsh_bucketed",
    "multimodal_frame_samples",
]


def _bench_stream_write(spark, sf_dir: str) -> float:
    """Write-path throughput: the reference's own benchmark dimension
    (pravega-benchmark, BASELINE.md) — ingest the events table through
    the full engine write path (hash routing, offset assignment,
    atomic metadata commit) into a throwaway store."""
    import shutil
    import tempfile

    from pravega_spark.config import ScalingPolicy, StreamConfiguration
    from pravega_spark.sources import load_table
    from pravega_spark.store import StreamStore

    root = tempfile.mkdtemp(prefix="pvs_bench_")
    try:
        store = StreamStore(spark, root)
        store.create_scope("bench")
        store.create_stream("bench", "ev", StreamConfiguration(scaling=ScalingPolicy.fixed(8)))
        ev = load_table(spark, sf_dir, "events")
        n = ev.count()
        t0 = time.perf_counter()
        store.write_events("bench", "ev", ev, routing_key_col="user_id", event_time_col="ts")
        dt = time.perf_counter() - t0
        print(f"# stream_write_events: {dt:.3f}s rows={n} ({n/dt:,.0f} ev/s)", file=sys.stderr)
        return round(dt, 3)
    finally:
        shutil.rmtree(root, ignore_errors=True)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from pravega_spark.queries import queries
    from pravega_spark.session import get_spark

    spark = get_spark("bench")
    qs = queries()

    # warm up JVM/codegen/parquet-footer paths outside the timed region
    from pravega_spark.sources import load_table

    load_table(spark, sf_dir, "lineitem").count()
    qs["q1_pricing_summary"](spark, "/root/testdata/sf0.001").collect()

    timings: dict[str, float] = {}
    for name in HEADLINE:
        fn = qs[name]
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        n = len(df.collect())
        timings[name] = round(time.perf_counter() - t0, 3)
        print(f"# {name}: {timings[name]:.3f}s rows={n}", file=sys.stderr)

    timings["stream_write_events"] = _bench_stream_write(spark, sf_dir)

    sf = sf_dir.rstrip("/").split("sf")[-1]
    try:
        sf_val = float(sf)
    except ValueError:
        sf_val = sf
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall_clock",
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "queries": timings,
                "sf": sf_val,
            }
        )
    )


if __name__ == "__main__":
    main()
