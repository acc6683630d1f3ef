"""Result-cache registry: end-of-query cleanup for persisted results.

Several pair-list kernels (minhash_lsh_pairs, embedding_near_dup_lsh,
dedup_ngram_jaccard, q11) return a PERSISTED DataFrame: the quadratic
verify stage materializes once while its upstream caches are hot, and
the caller reads the cached result instead of recomputing the lineage.
The input caches are freed inside the kernel; the RESULT cache must
outlive the kernel, so it cannot be.

In a long-lived session that runs many queries back-to-back (the
correctness gate, bench.py), those result caches would otherwise
accumulate executor storage. Kernels therefore register every
persisted result here, and harnesses call ``release_result_caches()``
between queries. Unpersisting is always safe: a consumer holding the
frame just falls back to lineage recompute.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_RESULT_CACHES: list[DataFrame] = []

# Self-limiting even when NO harness calls release_result_caches() (the
# driver's gate doesn't): keep at most this many result caches live —
# registering one more evicts the oldest. Evicting only costs a lineage
# recompute if that stale result is read again, which back-to-back query
# harnesses never do.
MAX_LIVE_RESULT_CACHES = 8


def register_result_cache(df: DataFrame) -> DataFrame:
    """Record a persisted result frame for later bulk release."""
    _RESULT_CACHES.append(df)
    while len(_RESULT_CACHES) > MAX_LIVE_RESULT_CACHES:
        old = _RESULT_CACHES.pop(0)
        try:
            old.unpersist()
        except Exception:
            pass
    return df


def release_result_caches() -> int:
    """Unpersist every registered result cache; returns how many."""
    n = 0
    while _RESULT_CACHES:
        df = _RESULT_CACHES.pop()
        try:
            df.unpersist()
            n += 1
        except Exception:
            pass  # session already stopped / frame already freed
    return n
