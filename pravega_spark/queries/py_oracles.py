"""Deterministic pure-Python oracles for gated queries whose semantics
SQL cannot express (iterative training loops). scripts/check_parity.py
runs these through the same canonical-frame comparison as the DuckDB
oracles (columns sorted, rows sorted, values normalized) — the driver's
SQL-only gate records a rows-only check for these entries; the judge
re-verifies full value parity via check_parity.

Each oracle is a from-scratch reimplementation over the raw parquet
(pyarrow reads, stdlib algorithms) — it shares the SPEC with the Spark
query (the same derivation the SQL oracles mirror), not the code: no
imports from the query modules, no Spark."""

from __future__ import annotations

import hashlib
import os
import re
from collections import Counter, defaultdict


def _read_documents(sf_dir: str):
    import pyarrow.parquet as pq

    t = pq.read_table(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "lang", "text"]
    )
    return (
        t["doc_id"].to_pylist(),
        t["lang"].to_pylist(),
        t["text"].to_pylist(),
    )


# ---------------- text_bpe_vocab_scale ----------------

_N_MERGES = 512
_SAMPLE_CAP = 4096


def _units(text: str) -> list[str]:
    """SentencePiece-style units: adjacent word pairs joined by the
    space symbol; a trailing odd word stands alone."""
    w = re.split(" +", text.strip().lower())
    return [" ".join(w[i : i + 2]) for i in range(0, len(w), 2)]


def _merge_seq(s: list[str], a: str, b: str) -> list[str]:
    out, i, n = [], 0, len(s)
    while i < n:
        if i < n - 1 and s[i] == a and s[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(s[i])
            i += 1
    return out


def _train(units: list[tuple[str, int]], n_target: int) -> list[tuple[str, str]]:
    syms = [list(t) for t, _ in units]
    freqs = [f for _, f in units]
    counts: Counter = Counter()
    where: dict = defaultdict(set)
    for ui, s in enumerate(syms):
        f = freqs[ui]
        for i in range(len(s) - 1):
            p = (s[i], s[i + 1])
            counts[p] += f
            where[p].add(ui)
    merges: list[tuple[str, str]] = []
    for _ in range(n_target):
        best = min(((-c, p) for p, c in counts.items() if c >= 2), default=None)
        if best is None:
            break
        pair = best[1]
        merges.append(pair)
        for ui in sorted(where.get(pair, ())):
            s, f = syms[ui], freqs[ui]
            for i in range(len(s) - 1):
                q = (s[i], s[i + 1])
                counts[q] -= f
                if counts[q] <= 0:
                    del counts[q]
                where[q].discard(ui)
            s = _merge_seq(s, *pair)
            syms[ui] = s
            for i in range(len(s) - 1):
                q = (s[i], s[i + 1])
                counts[q] += f
                where[q].add(ui)
    return merges


def _encode_len(t: str, merges: list[tuple[str, str]], ranks: dict) -> int:
    s = list(t)
    while len(s) > 1:
        best = None
        for i in range(len(s) - 1):
            r = ranks.get((s[i], s[i + 1]))
            if r is not None and (best is None or r < best):
                best = r
        if best is None:
            break
        s = _merge_seq(s, *merges[best])
    return len(s)


def text_bpe_vocab_scale(sf_dir: str):
    import pandas as pd

    doc_ids, langs, texts = _read_documents(sf_dir)
    unit_freq: Counter = Counter()
    doc_units: list[list[str]] = []
    for t in texts:
        us = _units(t)
        doc_units.append(us)
        unit_freq.update(us)
    sample = sorted(
        unit_freq.items(),
        key=lambda kv: (-kv[1], hashlib.md5(kv[0].encode("utf-8")).hexdigest()),
    )[:_SAMPLE_CAP]
    merges = _train(list(sample), _N_MERGES)
    ranks = {p: i for i, p in enumerate(merges)}
    md5 = hashlib.md5(
        "\x1e".join(f"{a}\x1f{b}" for a, b in merges).encode("utf-8")
    ).hexdigest()
    tok_len = {u: _encode_len(u, merges, ranks) for u in unit_freq}
    agg: dict = {}
    for lang, us in zip(langs, doc_units):
        a = agg.setdefault(lang, [0, 0, 0])
        a[0] += 1
        a[1] += len(us)
        a[2] += sum(tok_len[u] for u in us)
    rows = [
        {
            "lang": lang,
            "n_docs": a[0],
            "n_units": a[1],
            "n_tokens": a[2],
            "avg_tokens_per_doc": a[2] / a[0],
            "merges_used": len(merges),
            "merges_md5": md5,
        }
        for lang, a in sorted(agg.items())
    ]
    return pd.DataFrame(rows)


PY_ORACLES = {
    "text_bpe_vocab_scale": text_bpe_vocab_scale,
}
