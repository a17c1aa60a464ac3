"""Analyzer v1 — the FROZEN tokenizer spec shared by index build, the
exhaustive scorer, the DuckDB oracle SQL, and all tests.

Grounded in the reference's tokenizers (``/root/reference/tlhop/library.py:541-571``:
whitespace split + length filter) and its cleaning pipeline's lowercasing
(``library.py:62-97``), generalized to Unicode word characters so accented
pt-BR terms survive as single tokens:

    tokens(text) = [ t for t in split(lower(text), NON_WORD_RE)
                     if len(t) >= MIN_TOKEN_LEN ]

Both Spark (Java regex) and DuckDB (RE2) accept ``[^\\p{L}\\p{N}]+`` with
identical semantics — verified by tests/test_analyzer.py.

Everything here is JVM-side (split/filter/explode): tokenization never
crosses into Python.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Frozen spec constants (version v1). Changing these invalidates indexes.
ANALYZER_VERSION = "v1"
NON_WORD_RE = r"[^\p{L}\p{N}]+"
MIN_TOKEN_LEN = 3

# Python-side equivalent (used by the corpus generator + numpy kernels for
# cross-checks; the engine itself tokenizes JVM-side).
_PY_NON_WORD_RE = re.compile(r"[^\w]+", re.UNICODE)


def py_tokens(text: str | None) -> list[str]:
    """Pure-Python reference implementation of the v1 analyzer."""
    if text is None:
        return []
    # \w includes underscore; the frozen spec does not. Strip it first.
    return [
        t
        for t in _PY_NON_WORD_RE.split(text.lower().replace("_", " "))
        if len(t) >= MIN_TOKEN_LEN
    ]


def tokens_col(col: Column) -> Column:
    """``array<string>`` of v1 tokens for a text column (JVM-side only)."""
    return F.filter(
        F.split(F.lower(col), NON_WORD_RE, -1),
        lambda t: F.length(t) >= MIN_TOKEN_LEN,
    )


def doc_len_col(col: Column) -> Column:
    """Document length ``dl`` = number of v1 tokens (int)."""
    return F.size(tokens_col(col))


def sql_tokens_duckdb(text_expr: str) -> str:
    """DuckDB expression producing the same token array (for oracles)."""
    return (
        f"list_filter(regexp_split_to_array(lower({text_expr}), "
        f"'[^\\p{{L}}\\p{{N}}]+'), t -> length(t) >= {MIN_TOKEN_LEN})"
    )
