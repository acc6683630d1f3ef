"""Round-6 hardening: tier-boundary pins and loud failure modes.

The engine routes work across two driver/distributed seams — the store's
hot-append row cap (HOT_MAX_ROWS) and connected_components' local
union-find edge cap (PRAVEGA_SPARK_CC_LOCAL_MAX_EDGES). Both are
env-tunable, so a future refactor could silently diverge the tiers;
these tests pin result identity at cap±1 on each seam, plus the
convergence warning for label propagation (a >max_iters-diameter
component must fail loud, not return split clusters).
"""

import os

import pytest
from pyspark.sql import functions as F

from pravega_spark.functions.dedup import connected_components


def _cc_rows(spark, pairs_rows, **kw):
    df = spark.createDataFrame(pairs_rows, "id_a long, id_b long")
    out = connected_components(df, **kw)
    return sorted((r.id, r.cluster_id) for r in out.collect())


# -- CC tier boundary -------------------------------------------------------


def test_cc_tier_boundary_identical(spark, monkeypatch):
    """Local union-find and distributed label propagation must agree at
    the edge-cap boundary: the SAME graph run one edge under and one
    edge over the cap yields identical clusters."""
    # 3 components: a path, a triangle (with a redundant edge), a pair
    pairs = [(1, 2), (2, 3), (3, 4), (10, 11), (11, 12), (10, 12), (20, 21)]
    # edges frame doubles each pair and dedups: 7 pairs -> 14 edges
    n_edges = 14
    expected = [
        (1, 1), (2, 1), (3, 1), (4, 1),
        (10, 10), (11, 10), (12, 10),
        (20, 20), (21, 20),
    ]
    monkeypatch.setenv("PRAVEGA_SPARK_CC_LOCAL_MAX_EDGES", str(n_edges))
    local = _cc_rows(spark, pairs)  # n_probe == cap -> local tier
    monkeypatch.setenv("PRAVEGA_SPARK_CC_LOCAL_MAX_EDGES", str(n_edges - 1))
    dist = _cc_rows(spark, pairs)  # n_probe > cap -> distributed tier
    assert local == expected
    assert dist == expected


def test_cc_convergence_warning_and_strict(spark, monkeypatch):
    """Distributed label propagation that exhausts max_iters with labels
    still moving warns (default) or raises (PRAVEGA_SPARK_CC_STRICT=1);
    enough rounds converge silently."""
    monkeypatch.setenv("PRAVEGA_SPARK_CC_LOCAL_MAX_EDGES", "0")  # force distributed
    path = [(i, i + 1) for i in range(10)]  # diameter 10 > 2 rounds
    with pytest.warns(RuntimeWarning, match="did not converge"):
        _cc_rows(spark, path, max_iters=2)
    monkeypatch.setenv("PRAVEGA_SPARK_CC_STRICT", "1")
    with pytest.raises(RuntimeError, match="did not converge"):
        _cc_rows(spark, path, max_iters=2)
    monkeypatch.delenv("PRAVEGA_SPARK_CC_STRICT")
    # converged: one component labeled by its min id, no warning
    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("error")
        rows = _cc_rows(spark, path, max_iters=15)
    assert rows == [(i, 0) for i in range(11)]


# -- hot-append row-cap boundary -------------------------------------------


def _write_n(store, spark, events, n, stream, monkeypatch, cap):
    import pravega_spark.store as store_mod

    from pravega_spark.store import StreamStore

    monkeypatch.setattr(store_mod, "HOT_MAX_ROWS", cap)
    # force the counted-probe branch (the streaming-sink path, where
    # Catalyst has no stats): estimate reads as unknown
    monkeypatch.setattr(
        StreamStore, "_estimate_bytes", staticmethod(lambda df: store_mod._UNKNOWN_EST_BYTES)
    )
    env = (
        events.orderBy("event_id")
        .limit(n)
        .select(
            F.col("user_id").cast("string").alias("routing_key"),
            F.col("ts").alias("event_time"),
            F.to_json(F.struct("event_id")).cast("binary").alias("payload"),
        )
    )
    store.write_events("s", stream, env)


def test_hot_row_cap_boundary_identical(store, spark, events, monkeypatch):
    """A batch exactly at HOT_MAX_ROWS commits via the hot tier, one row
    over via the distributed tier — with identical read-back results and
    contiguous offsets either way."""
    from pravega_spark.config import ScalingPolicy, StreamConfiguration

    CAP = 40
    store.create_scope("s")
    for stream, n in (("at_cap", CAP), ("over_cap", CAP + 1)):
        store.create_stream(
            "s", stream, StreamConfiguration(scaling=ScalingPolicy.fixed(2))
        )
        _write_n(store, spark, events, n, stream, monkeypatch, CAP)

    def read_rows(stream):
        return sorted(
            (r.routing_key, r.segment_id, r.offset, bytes(r.payload))
            for r in store.read("s", stream).collect()
        )

    at_cap, over_cap = read_rows("at_cap"), read_rows("over_cap")
    # tier actually differed: hot files carry the -hot suffix
    from pravega_spark import fsio

    def files(stream):
        return fsio.list_files_recursive(store._stream_path("s", stream))

    assert any(f.endswith("-hot.parquet") for f in files("at_cap"))
    assert not any(f.endswith("-hot.parquet") for f in files("over_cap"))
    # identical routing for the shared events, regardless of tier
    route_at = {p: (rk, sid) for rk, sid, _off, p in at_cap}
    route_over = {p: (rk, sid) for rk, sid, _off, p in over_cap}
    assert set(route_at) <= set(route_over)
    assert all(route_over[p] == v for p, v in route_at.items())
    # per-segment offsets contiguous from 0 on both
    for rows in (at_cap, over_cap):
        by_seg = {}
        for _rk, sid, off, _p in rows:
            by_seg.setdefault(sid, []).append(off)
        for offs in by_seg.values():
            assert sorted(offs) == list(range(len(offs)))
    assert len(over_cap) == len(at_cap) + 1


# -- n-gram duplication-probe gate ------------------------------------------


def test_ngram_probe_paths_identical(spark, tmp_path):
    """The duplication probe (r6) must be output-invisible: on a
    dup-heavy corpus it selects the exact-collapse path, but forcing
    the uncollapsed formulation on the SAME corpus yields identical
    pairs — and a unique corpus selects the uncollapsed path."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    import pravega_spark.queries.text as text_mod
    from pravega_spark.caching import release_result_caches
    from pravega_spark.queries.text import dedup_ngram_jaccard
    from pravega_spark.sources.bucketed import _source_fingerprint

    words = "alpha bravo charlie delta echo foxtrot golf hotel india juliet".split()
    texts = [
        " ".join(words[(i + j) % len(words)] for j in range(30)) for i in range(10)
    ]
    # dup-heavy: 4 bit-identical copies of each text
    rows = [
        (i * 4 + c, "en" if i % 2 == 0 else "de", texts[i])
        for i in range(10)
        for c in range(4)
    ]
    dup_dir = tmp_path / "dup"
    dup_dir.mkdir()
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "lang": [r[1] for r in rows],
                "text": [r[2] for r in rows],
            }
        ),
        str(dup_dir / "documents.parquet"),
    )
    key = _source_fingerprint(str(dup_dir), "documents")
    collapsed = sorted(map(tuple, dedup_ngram_jaccard(spark, str(dup_dir)).collect()))
    assert text_mod._NGRAM_COLLAPSE_MEMO[key] is True, "dup-heavy corpus must collapse"
    release_result_caches()
    text_mod._NGRAM_COLLAPSE_MEMO[key] = False  # force the uncollapsed twin
    uncollapsed = sorted(map(tuple, dedup_ngram_jaccard(spark, str(dup_dir)).collect()))
    release_result_caches()
    text_mod._NGRAM_COLLAPSE_MEMO.pop(key, None)
    assert collapsed == uncollapsed
    assert collapsed, "planted duplicates must surface as pairs"
    # unique corpus: probe skips the collapse plumbing
    uniq_dir = tmp_path / "uniq"
    uniq_dir.mkdir()
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(list(range(10)), pa.int64()),
                "lang": ["en"] * 10,
                "text": texts,
            }
        ),
        str(uniq_dir / "documents.parquet"),
    )
    dedup_ngram_jaccard(spark, str(uniq_dir)).count()
    release_result_caches()
    ukey = _source_fingerprint(str(uniq_dir), "documents")
    assert text_mod._NGRAM_COLLAPSE_MEMO[ukey] is False


def test_short_doc_shingle_fallback_parity(spark, tmp_path):
    """Docs under 3 tokens emit one whole-text shingle on BOTH engines
    (the _SHINGLE_EXPR ELSE branch and the oracle CASE added in r6) —
    pinned with a corpus of empty/1/2-token docs where a benchmark doc
    and a train doc share a short text."""
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    from pravega_spark.queries.text import DECONTAMINATE_SQL, corpus_decontaminate

    rows = [
        (0, "en", "tiny text"),          # benchmark (0 % 97 == 0)
        (97, "en", "word alone"),        # benchmark
        (1, "en", "tiny text"),          # train: shares the 2-token text
        (2, "en", ""),                   # train: empty
        (3, "en", "one two three four"), # train: normal, no overlap
        (4, "en", "word alone"),         # train: shares 2-token text
    ]
    d = tmp_path / "short"
    d.mkdir()
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "lang": [r[1] for r in rows],
                "text": [r[2] for r in rows],
            }
        ),
        str(d / "documents.parquet"),
    )
    got = sorted(
        (r.doc_id, r.n_overlap) for r in corpus_decontaminate(spark, str(d)).collect()
    )
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{d}/documents.parquet'")
    want = sorted(tuple(r) for r in con.sql(DECONTAMINATE_SQL).fetchall())
    assert got == want
    assert (1, 1) in got and (4, 1) in got, "short-text overlap must be flagged"
