"""Local stand-in for the driver's correctness gate — STRICT edition.

The driver compares the Spark result and the DuckDB oracle as dataframes
(columns sorted by name, rows sorted, values hashed). Round-1 showed the
hash is sensitive to *representation*, not just value: DuckDB's pandas
conversion turns DECIMAL and HUGEINT (integer SUM) columns into float64
while Spark's ``toPandas`` yields ``decimal.Decimal`` objects and int64 —
value-equal, hash-different. This checker therefore enforces the
canonical output contract every gated query must satisfy:

  * only BIGINT / DOUBLE / VARCHAR / TIMESTAMP / BOOLEAN output columns
    (compute exactly in decimal *internally*, cast to double at the end);
  * dtypes must agree between the two pandas frames (int with int,
    float with float, ...); timestamps may differ in unit (ns vs us)
    but not value;
  * float cells must match BIT-EXACTLY (repr round-trip equality);
  * Decimal / bytes / bytearray cells are a hard failure on either side.

Usage: python scripts/check_parity.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import os
import sys
import time
from datetime import date, datetime

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_FORBIDDEN = "FORBIDDEN-TYPE"


def _norm_cell(v):
    """Canonical string for a cell; forbidden representations poison the row."""
    import decimal

    import numpy as np
    import pandas as pd

    if v is None or v is pd.NaT or (isinstance(v, float) and math.isnan(v)):
        return "NULL"
    if isinstance(v, (decimal.Decimal, bytes, bytearray, memoryview)):
        return f"{_FORBIDDEN}:{type(v).__name__}:{v!r}"
    if isinstance(v, (bool, np.bool_)):
        return str(bool(v)).lower()
    if isinstance(v, (np.floating, float)):
        # repr is shortest-round-trip: equal strings <=> equal bits
        return repr(float(v))
    if isinstance(v, (np.integer, int)):
        return str(int(v))
    if isinstance(v, pd.Timestamp):
        return v.to_pydatetime().replace(tzinfo=None).isoformat()
    if isinstance(v, datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, date):
        return v.isoformat()
    return str(v)


def _dtype_class(dt) -> str:
    import pandas as pd

    if pd.api.types.is_bool_dtype(dt):
        return "bool"
    if pd.api.types.is_integer_dtype(dt):
        return "int"
    if pd.api.types.is_float_dtype(dt):
        return "float"
    if pd.api.types.is_datetime64_any_dtype(dt):
        return "timestamp"
    return "object"


def _canon(pdf):
    """(sorted col names, dtype classes, sorted normalized rows)."""
    cols = sorted(pdf.columns)
    pdf = pdf[cols]
    classes = [_dtype_class(pdf[c].dtype) for c in cols]
    rows = sorted(
        tuple(_norm_cell(v) for v in row) for row in pdf.itertuples(index=False, name=None)
    )
    return cols, classes, rows


def compare_frames(name: str, spark_pdf, duck_pdf) -> list[str]:
    """Return a list of problems (empty = strict pass)."""
    problems: list[str] = []
    sc, scls, sr = _canon(spark_pdf)
    dc, dcls, dr = _canon(duck_pdf)
    if sc != dc:
        return [f"columns differ: spark={sc} duckdb={dc}"]
    for c, a, b in zip(sc, scls, dcls):
        if a != b:
            problems.append(f"dtype mismatch col={c}: spark={a} duckdb={b}")
    if len(sr) != len(dr):
        problems.append(f"row counts spark={len(sr)} duckdb={len(dr)}")
        return problems
    # full scan, not the first 1000 rows: a forbidden Decimal/bytes cell
    # sorting past a sample cutoff would silently violate the canonical
    # output contract the driver's hash gate depends on (gate frames are
    # small, so the full pass is cheap)
    forb = [cell for row in (sr + dr) for cell in row if cell.startswith(_FORBIDDEN)]
    if forb:
        problems.append(f"forbidden output type (decimal/bytes): {forb[0][:120]}")
    bad = [(a, b) for a, b in zip(sr, dr) if a != b]
    if bad:
        problems.append(f"{len(bad)}/{len(sr)} rows differ; first: spark={bad[0][0]} duckdb={bad[0][1]}")
    return problems


def main() -> int:
    import duckdb

    from pravega_spark.queries import oracle_sql, python_oracles, queries
    from pravega_spark.session import get_spark
    from pravega_spark.sources.tables import TABLES

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    spark = get_spark("parity")
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.isdir(p):
            # directory-shaped tables (part files) need a glob — DuckDB
            # can't read a bare directory path
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}/*.parquet'")
        elif os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    from pravega_spark.caching import release_result_caches

    qs, oracles, py_oracles = queries(), oracle_sql(), python_oracles()
    unknown = only - set(qs)
    if unknown:
        # a typo'd name must be a loud failure, not a silent 0-query
        # "pass" — the strict gate exiting 0 without running anything
        # is a false green
        print(f"FAIL unknown query names: {sorted(unknown)}")
        return 1
    n_pass = n_fail = 0
    failed: list[str] = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        release_result_caches()  # free the previous query's result cache
        t0 = time.time()
        try:
            spdf = fn(spark, sf_dir).toPandas()
        except Exception as e:
            print(f"FAIL {name}: spark error: {e}")
            failed.append(name)
            n_fail += 1
            continue
        sql = oracles.get(name)
        if sql is None and name in py_oracles:
            # non-SQL-expressible op: deterministic pure-Python oracle,
            # compared through the SAME canonical-frame pipeline
            try:
                dpdf = py_oracles[name](sf_dir)
            except Exception as e:
                print(f"FAIL {name}: python-oracle error: {e!r}")
                failed.append(name)
                n_fail += 1
                continue
            problems = compare_frames(name, spdf, dpdf)
            if problems:
                print(f"FAIL {name}: " + " | ".join(problems))
                failed.append(name)
                n_fail += 1
            else:
                print(f"PASS {name}: rows={len(spdf)} (python oracle) [{time.time()-t0:.1f}s]")
                n_pass += 1
            continue
        if sql is None:
            print(f"ok   {name}: rows={len(spdf)} (no oracle — rows-only) [{time.time()-t0:.1f}s]")
            n_pass += 1
            continue
        try:
            dpdf = con.sql(sql).df()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}")
            failed.append(name)
            n_fail += 1
            continue
        problems = compare_frames(name, spdf, dpdf)
        if problems:
            print(f"FAIL {name}: " + " | ".join(problems))
            failed.append(name)
            n_fail += 1
        else:
            print(f"PASS {name}: rows={len(spdf)} [{time.time()-t0:.1f}s]")
            n_pass += 1
    print(f"\n{n_pass} passed, {n_fail} failed")
    if failed:
        print("failed:", " ".join(failed))
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
