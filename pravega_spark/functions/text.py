"""Text kernels: tokenization utilities for the LLM-pipeline layer.

Whitespace tokenization lives inline in the gated queries
(queries/text.py); this module adds the BPE-ish regex tokenizer real
data pipelines use for token accounting — splitting letter runs, digit
runs, and punctuation runs separately (the GPT-2-style pre-tokenizer
shape, minus byte-level merges), so "don't stop!" counts 5 proto-tokens
rather than 2 whitespace words. Everything is a JVM regexp built-in
(whole-stage codegen, no UDF); the pattern sticks to a dialect subset
(character classes + quantifiers) that Java regex and Python `re`
evaluate identically, which the tests verify.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# letter runs | digit runs | single non-space-non-alnum marks (each
# punctuation char is its own proto-token, like byte-level BPE pre-split)
# \s is NOT dialect-identical (Java includes \x0B, RE2 excludes it,
# Python adds Unicode whitespace) — spell the ASCII whitespace set out
# so Spark(Java), DuckDB(RE2) and the Python twin tokenize identically
BPE_ISH_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9 \t\n\r\f\x0B]"


def bpe_ish_tokens(col: Column | str) -> Column:
    """Array of BPE-ish proto-tokens (letters / digits / marks)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_extract_all(c, F.lit(BPE_ISH_PATTERN), 0)


def bpe_ish_token_count(col: Column | str) -> Column:
    """Proto-token count — the LLM token-budget estimator column."""
    return F.size(bpe_ish_tokens(col))


def bpe_ish_tokens_py(text: str) -> list[str]:
    """Reference scalar twin (tests assert engine/py agreement)."""
    import re

    return re.findall(BPE_ISH_PATTERN, text)
