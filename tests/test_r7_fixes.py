"""Round-7 regression pins (VERDICT r6 items).

Item 1: salted ``corpus_token_packing`` — the registered query now
partitions its running-sum window by ``(lang, salt)`` so no single task
ever sorts a whole language stratum. These tests pin the salted
semantics against an independent driver-side greedy pack, and pin
``groups=1`` to the pre-r7 per-stratum behavior.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from pravega_spark.queries.text import (
    _PACK_BUDGET,
    _PACK_SALT_GROUPS,
    _PACK_SHARD_STRIDE,
    _tokens,
    corpus_token_packing,
)
from pravega_spark.sources import load_table

SF_DIR = "/root/testdata/sf0.001"


def _doc_stream(spark):
    """(lang, salt16, ord, doc_id, n_tokens) rows, the packing input."""
    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "lang", "text")
    rows = docs.select(
        "doc_id",
        "lang",
        F.size(_tokens(F.col("text"))).alias("n_tokens"),
        F.md5(F.col("doc_id").cast("string")).alias("ord"),
    ).collect()
    return [
        (r.lang, int(r.ord[0], 16), r.ord, r.doc_id, r.n_tokens) for r in rows
    ]


def _reference_pack(stream, groups):
    """Driver-side greedy pack: per (lang, salt) in (ord, doc_id) order,
    a doc joins the shard where its running sum STARTS."""
    by_group: dict = {}
    for lang, h16, ordk, doc_id, n in stream:
        by_group.setdefault((lang, h16 % groups), []).append((ordk, doc_id, n))
    occupancy: dict = {}
    for (lang, salt), docs in by_group.items():
        running = 0
        for _ordk, _doc, n in sorted(docs):
            local = running // _PACK_BUDGET
            shard = salt * _PACK_SHARD_STRIDE + local
            cnt, tot = occupancy.get((lang, shard), (0, 0))
            occupancy[(lang, shard)] = (cnt + 1, tot + n)
            running += n
    return occupancy


def _query_occupancy(spark, groups):
    out = corpus_token_packing(spark, SF_DIR, groups=groups).collect()
    return {(r.lang, r.shard): (r.n_docs, r.shard_tokens) for r in out}


def test_salted_packing_matches_reference(spark):
    stream = _doc_stream(spark)
    got = _query_occupancy(spark, _PACK_SALT_GROUPS)
    want = _reference_pack(stream, _PACK_SALT_GROUPS)
    assert got == want


def test_groups_1_degenerates_to_per_stratum_pack(spark):
    stream = _doc_stream(spark)
    got = _query_occupancy(spark, 1)
    want = _reference_pack(stream, 1)
    assert got == want
    # G=1 shard ids are plain local shards (salt 0 contributes no stride)
    assert all(shard < _PACK_SHARD_STRIDE for (_lang, shard) in got)


def test_salted_vs_g1_conserves_corpus(spark):
    salted = _query_occupancy(spark, _PACK_SALT_GROUPS)
    flat = _query_occupancy(spark, 1)
    assert sum(c for c, _t in salted.values()) == sum(c for c, _t in flat.values())
    assert sum(t for _c, t in salted.values()) == sum(t for _c, t in flat.values())
    # salting multiplies the parallelism: more, smaller shards is fine,
    # but every non-final shard in a salt group must START under budget
    # (greedy invariant: a doc lands where its running sum starts)
    assert len(salted) >= len(flat)
