"""Run EVERY registered query at a given sf_dir; record time/rows/errors.

The scale twin of check_parity: no oracle (DuckDB at sf1+ is the slow
part), just proof that all 71 plans execute cleanly and how their wall
clock scales. Usage:

    python scripts/sweep_queries.py [sf_dir] [out.json] [only...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else ".scale/sf1"
    out_path = sys.argv[2] if len(sys.argv) > 2 else None
    only = set(sys.argv[3:])

    from pravega_spark.caching import release_result_caches
    from pravega_spark.queries import queries
    from pravega_spark.session import get_spark

    spark = get_spark("sweep")
    qs = queries()
    out: dict = {"sf_dir": sf_dir, "queries": {}, "errors": {}}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.perf_counter()
        try:
            # count(), not collect(): multi-million-row pair lists would
            # make the sweep time driver materialization, not the plan
            n = fn(spark, sf_dir).count()
            dt = round(time.perf_counter() - t0, 3)
            out["queries"][name] = {"s": dt, "rows": n}
            print(f"ok   {name}: {dt:.2f}s rows={n}")
        except Exception as e:
            out["errors"][name] = f"{type(e).__name__}: {e}"[:300]
            print(f"FAIL {name}: {out['errors'][name]}")
        release_result_caches()
        spark.catalog.clearCache()
    out["n_ok"] = len(out["queries"])
    out["n_err"] = len(out["errors"])
    print(f"\n{out['n_ok']} ok, {out['n_err']} errors")
    if out_path:
        with open(out_path, "w") as fh:
            json.dump(out, fh, indent=1)
    return 1 if out["errors"] else 0


if __name__ == "__main__":
    raise SystemExit(main())
