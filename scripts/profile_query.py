"""Per-query profiler for the optimization rounds (guide §1).

For each named query: build the DataFrame, save .explain("formatted") to
plans/<tag>/<name>_<suffix>.txt, then time N repetitions to full
materialization (same methodology as bench.py — collect()), reporting
wall seconds and the Spark job/stage counts the run consumed (job count
is the fixed-overhead proxy at small SF: each job is ~0.1-0.3 s of
scheduling floor on tiny data).

Usage: python scripts/profile_query.py <sf_dir> <suffix> <query> [query ...]
Env:   PROFILE_REPS (default 3), PROFILE_PLANS_DIR (default plans/r11)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir, suffix = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    reps = int(os.environ.get("PROFILE_REPS", "3"))
    plans_dir = os.environ.get("PROFILE_PLANS_DIR", "plans/r11")
    os.makedirs(plans_dir, exist_ok=True)

    from pravega_spark.caching import release_result_caches
    from pravega_spark.queries import queries
    from pravega_spark.session import get_spark

    spark = get_spark("profile")
    qs = queries()
    # warm-up: JVM/codegen/parquet paths
    from pravega_spark.sources import load_table

    load_table(spark, sf_dir, "lineitem").count()
    qs["q1_pricing_summary"](spark, sf_dir).collect()
    release_result_caches()
    spark.catalog.clearCache()

    sc = spark.sparkContext

    for name in names:
        fn = qs[name]
        sc.setJobDescription(f"profile:{name}")
        # plan capture (un-timed, separate build)
        try:
            df = fn(spark, sf_dir)
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
            )
            with open(os.path.join(plans_dir, f"{name}_{suffix}.txt"), "w") as fh:
                fh.write(plan)
        except Exception as e:  # plan capture must not block timing
            print(f"# {name}: plan capture failed: {e}", file=sys.stderr)
        release_result_caches()
        spark.catalog.clearCache()

        samples = []
        jobs_used = []
        for _ in range(reps):
            before = int(sc._jsc.sc().dagScheduler().nextJobId())
            t0 = time.perf_counter()
            n = len(fn(spark, sf_dir).collect())
            dt = time.perf_counter() - t0
            after = int(sc._jsc.sc().dagScheduler().nextJobId())
            samples.append(round(dt, 3))
            jobs_used.append(after - before)
            release_result_caches()
            spark.catalog.clearCache()
        med = sorted(samples)[len(samples) // 2]
        print(f"{name}: median {med:.3f}s reps={samples} jobs={jobs_used} rows={n}")
        sc.setJobDescription(None)


if __name__ == "__main__":
    main()
