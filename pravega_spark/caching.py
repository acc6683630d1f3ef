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

Thread safety (r7 ADVICE fix): parallel harnesses sharing one session
register/release concurrently, so the list is guarded by a lock. Note
the eviction contract: evicting a frame another thread is still
consuming is CORRECT (lineage recompute on next access) but costs that
thread a recompute — callers wanting pinned results should hold their
own persist() reference instead of relying on the registry.
"""

from __future__ import annotations

import threading

from pyspark.sql import DataFrame

_RESULT_CACHES: list[DataFrame] = []
_LOCK = threading.Lock()

# Self-limiting even when NO harness calls release_result_caches() (the
# driver's gate doesn't): keep at most this many result caches live —
# registering one more evicts the oldest. Evicting only costs a lineage
# recompute if that stale result is read again, which back-to-back query
# harnesses never do.
MAX_LIVE_RESULT_CACHES = 8


def register_result_cache(df: DataFrame) -> DataFrame:
    """Record a persisted result frame for later bulk release."""
    evicted = []
    with _LOCK:
        _RESULT_CACHES.append(df)
        while len(_RESULT_CACHES) > MAX_LIVE_RESULT_CACHES:
            evicted.append(_RESULT_CACHES.pop(0))
    for old in evicted:  # unpersist OUTSIDE the lock: it can block on the JVM
        try:
            old.unpersist()
        except Exception:
            pass
    return df


def release_result_caches() -> int:
    """Unpersist every registered result cache; returns how many."""
    with _LOCK:
        drained = list(_RESULT_CACHES)
        _RESULT_CACHES.clear()
    n = 0
    for df in drained:
        try:
            df.unpersist()
            n += 1
        except Exception:
            pass  # session already stopped / frame already freed
    return n
