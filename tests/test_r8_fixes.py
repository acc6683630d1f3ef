"""Round-8 additions: incremental NEAR-dup via the maintained MinHash
band index (VERDICT r7 item 1) and its plan/fixture invariants."""

import os
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = "/root/testdata/sf0.001"


def _assert_band_join_shuffle_free(plan: str, n_buckets: int) -> None:
    """The corpus band index must never reshuffle: the only Exchange
    permitted on the band key is the INCREMENT side aligning itself to
    the index's bucket count (SMJ case) — and the usual executed shape
    has none at all (AQE broadcasts the small increment side). A
    parent-walk over the rendered tree is not robust here: persisted
    InMemoryRelations re-render their cached child plans with restarted
    indentation, which breaks depth-based ancestry."""
    import re

    for m in re.finditer(r"Exchange hashpartitioning\(band#\d+[^,]*, (\d+)\)", plan):
        if m.group(1) != str(n_buckets):
            raise AssertionError(
                f"band-key shuffle not bucket-aligned (n={m.group(1)}): corpus side moved"
            )


def test_minhash_incremental_classes_and_best_match(spark):
    """The re-crawl fixture discriminates three ways: byte-identical
    increment docs match at exactly 1.0, salted docs match their
    original near (but below) 1.0, synthetic docs match nothing."""
    from pravega_spark.queries.text import dedup_minhash_incremental

    rows = dedup_minhash_incremental(spark, SF_DIR).collect()
    assert rows, "empty increment"
    by_class = {0: [], 1: [], 2: []}
    for r in rows:
        by_class[r["doc_id"] % 3].append(r)
    # exact dups: matched, similarity exactly 1.0, matched to themselves
    assert by_class[0], "no exact-dup docs in fixture"
    for r in by_class[0]:
        assert r["is_near_dup"] and r["similarity"] == 1.0
        assert r["matched_doc"] == r["doc_id"]
    # salted docs: every MATCHED one is a genuine NEAR dup (0 < J < 1)
    matched_salted = [r for r in by_class[1] if r["is_near_dup"]]
    assert matched_salted, "no salted doc matched — fixture vacuous"
    for r in matched_salted:
        assert 0.0 < r["similarity"] < 1.0
        assert r["matched_doc"] == r["doc_id"]  # best match is its original
    # synthetic docs: never matched
    for r in by_class[2]:
        assert not r["is_near_dup"] and r["matched_doc"] is None


def test_minhash_incremental_corpus_side_shuffle_free(spark):
    """At-scale plan shape (broadcast off): the persisted band index is
    a bucketed scan that reaches its join with NO shuffle Exchange —
    only the increment's signatures move."""
    from pravega_spark.queries.text import dedup_minhash_incremental

    dedup_minhash_incremental(spark, SF_DIR)  # ensure index exists
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = (
            dedup_minhash_incremental(spark, SF_DIR)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    assert "Bucketed: true" in plan, "band index scan is not bucketed"
    assert "pvs_corpus_mh_b16" in plan, "band index not in the executed plan"
    _assert_band_join_shuffle_free(plan, 16)


def test_minhash_incremental_index_gc_and_fallback(spark, tmp_path, monkeypatch):
    """Stale sibling indexes are GC'd on rebuild, and an unwritable
    warehouse degrades to the shuffling twin with identical results."""
    from pravega_spark.queries import text as T

    want = {tuple(r) for r in T.dedup_minhash_incremental(spark, SF_DIR).collect()}
    # force the build to fail: results must come from the fallback path
    monkeypatch.setattr(T, "_ensure_bucketed_index", lambda *a, **k: False)
    got = {tuple(r) for r in T.dedup_minhash_incremental(spark, SF_DIR).collect()}
    assert got == want


def test_bpe_learned_tokenize_learns_and_compresses(spark):
    """The merge table is genuinely learned (frequency-ordered, can
    consume earlier merges' output) and applying it compresses: per
    language, n_words <= n_tokens < total characters."""
    from pravega_spark.queries.text import _BPE_STEPS, text_bpe_learned_tokenize

    rows = text_bpe_learned_tokenize(spark, SF_DIR).collect()
    merges = [r for r in rows if r["row_kind"] == "merge"]
    langs = [r for r in rows if r["row_kind"] == "lang"]
    assert len(merges) == _BPE_STEPS
    assert len({r["k"] for r in merges}) == _BPE_STEPS  # no repeated pair
    # selection is by max count: counts are non-increasing in step order
    cnts = [r["n_tokens"] for r in sorted(merges, key=lambda r: r["k"])]
    assert all(a >= b for a, b in zip(cnts, cnts[1:])), cnts
    assert langs
    # character totals per lang for the same word population
    from pyspark.sql import functions as F

    from pravega_spark.sources import load_table

    docs = load_table(spark, SF_DIR, "documents")
    chars = {
        r["lang"]: r["n_chars"]
        for r in docs.select(
            "lang", F.explode(F.split(F.lower(F.trim("text")), " +")).alias("w")
        )
        .filter(F.col("w").rlike("^[a-z]+$"))
        .groupBy("lang")
        .agg(F.sum(F.length("w")).alias("n_chars"))
        .collect()
    }
    for r in langs:
        assert r["n_words"] <= r["n_tokens"] < chars[r["k"]], r


def test_streaming_scale_epoch_read_exactly_once(spark):
    """The gated scale-epoch query equals the batch truth (the in-query
    assertion already proves >= 2 epochs were read; here we prove the
    drained union is exactly-once: per-user counts/sums/max match)."""
    from pravega_spark.queries.stream_ops import (
        _EPOCH_READ_MOD,
        streaming_scale_epoch_read,
    )
    from pravega_spark.sources import load_table

    got = {
        (r["user_id"], r["n_events"], r["total_value"], r["last_event"])
        for r in streaming_scale_epoch_read(spark, SF_DIR).collect()
    }
    ev = load_table(spark, SF_DIR, "events").filter(
        F.col("event_id") % _EPOCH_READ_MOD == 0
    )
    want = {
        (r["user_id"], r["n_events"], r["total_value"], r["last_event"])
        for r in ev.groupBy("user_id")
        .agg(
            F.count("*").alias("n_events"),
            (F.sum(F.floor(F.col("value") * 100).cast("long")).cast("double") / 100).alias(
                "total_value"
            ),
            F.max("event_id").alias("last_event"),
        )
        .collect()
    }
    assert got == want


def test_append_events_first_row_schema_semantics(store):
    """The column-wise Arrow build keeps Table.from_pylist's contract:
    the FIRST event's keys define the schema, later missing keys read
    as NULL, later extra keys are ignored (r8 write-path change)."""
    from pravega_spark.config import ScalingPolicy, StreamConfiguration

    store.create_scope("s")
    store.create_stream("s", "h", StreamConfiguration(scaling=ScalingPolicy.fixed(2)))
    store.append_events(
        "s", "h",
        [
            {"routing_key": "a", "val": 1, "tag": "x"},
            {"routing_key": "b", "val": 2},                 # tag -> NULL
            {"routing_key": "c", "val": 3, "extra": 99},    # extra ignored
        ],
        writer_id="w", batch_seq=0,
    )
    df = store.read("s", "h")
    rows = {r["routing_key"]: r for r in df.collect()}
    assert set(rows) == {"a", "b", "c"}
    assert "extra" not in df.columns
    assert rows["a"]["tag"] == "x" and rows["b"]["tag"] is None
    assert [rows[k]["val"] for k in "abc"] == [1, 2, 3]
