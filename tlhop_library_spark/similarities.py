"""Pluggable ranking similarities beyond BM25 — frozen specs.

Lucene exposes per-field ``Similarity`` implementations (classic
TF-IDF, LM Dirichlet, BM25); this module is the engine's analogue.
The index stores raw (tf, dl) streams — similarity is a QUERY-TIME
choice, so one build serves every ranking model. Like ``bm25.py``,
each spec here is the ONE shared definition used by the numpy kernel,
the DuckDB oracle SQL, and the tests.

Block-max metadata (``block_max_w``) is computed from the BM25 tf
weight at encode time, so BMW pruning is only valid for BM25; the
alternative similarities score each doc range with the vectorized
exhaustive kernel instead (decode all blocks of the query terms'
chunks — the same work the BM25 ``mode='exhaustive'`` path does).
Everything else about the scale shape is unchanged: (bucket, tid)-
pruned segment scan, per-range kernels, ≤ k rows per range leave the
executors.

Specs (scores rounded to ``bm25.ROUND_DIGITS``; ordering
``round(score) DESC, doc_id ASC`` — identical to BM25):

classic (Lucene ClassicSimilarity shape, without queryNorm/coord,
which Lucene itself dropped in 6.x):

- ``idf(t)``   = 1 + ln(N / (df + 1))
- ``score(q,d)`` = Σ_{t ∈ unique(q) ∩ d} idf(t)² · sqrt(tf) / sqrt(dl)
  (idf appears squared: once as the query weight, once as the term
  weight — Lucene's TFIDFSimilarity composition)

lmdirichlet (Lucene LMDirichletSimilarity, μ = 2000):

- ``p(t|C)``   = cf(t) / total_tokens   (collection language model)
- ``contrib(t,d)`` = max(0, ln(1 + tf / (μ · p)) + ln(μ / (dl + μ)))
  summed over matched terms (the per-term clamp keeps rare-term docs
  from being dragged negative by common query terms, matching
  Lucene's non-negative-score contract)

lmjelinekmercer (Lucene LMJelinekMercerSimilarity, λ = 0.1 — the
Lucene-recommended value for short queries):

- ``contrib(t,d)`` = ln(1 + ((1-λ) · tf / dl) / (λ · p(t|C)))
  summed over matched terms — always positive when tf > 0, so no
  clamp is needed
"""

from __future__ import annotations

import math

import numpy as np

from tlhop_library_spark import bm25

MU = 2000.0


# --- classic TF-IDF ---------------------------------------------------
def classic_idf(n_docs: int, df: int) -> float:
    return 1.0 + math.log(n_docs / (df + 1.0))


def classic_weight_np(tfs: np.ndarray, dls: np.ndarray) -> np.ndarray:
    """sqrt(tf) / sqrt(dl) — idf² excluded (query-time factor)."""
    return np.sqrt(tfs.astype(np.float64)) / np.sqrt(
        dls.astype(np.float64)
    )


# --- LM Dirichlet -----------------------------------------------------
def lmd_weight_np(
    tfs: np.ndarray, dls: np.ndarray, cf: int, sum_dl: int, mu: float = MU
) -> np.ndarray:
    """Per-posting clamped Dirichlet contribution (self-contained —
    no query-time multiplier; the collection stats ride in)."""
    p = cf / float(sum_dl)
    raw = np.log1p(tfs.astype(np.float64) / (mu * p)) + np.log(
        mu / (dls.astype(np.float64) + mu)
    )
    return np.maximum(raw, 0.0)


# --- LM Jelinek-Mercer -------------------------------------------------
LAMBDA_JM = 0.1


def lmjm_weight_np(
    tfs: np.ndarray, dls: np.ndarray, cf: int, sum_dl: int,
    lam: float = LAMBDA_JM,
) -> np.ndarray:
    """Per-posting Jelinek-Mercer contribution (self-contained)."""
    p = cf / float(sum_dl)
    # operation order mirrors the oracle SQL exactly so the rounded
    # scores agree to the last ulp
    return np.log1p(
        ((1.0 - lam) * tfs.astype(np.float64) / dls.astype(np.float64))
        / (lam * p)
    )


def weight_fns(
    similarity: str,
    info: dict[str, tuple[int, int, int, int]],
    n_docs: int,
    sum_dl: int,
    avgdl: float | None = None,
    boosts: dict[str, float] | None = None,
):
    """tid → vectorized ``f(tfs, dls) -> per-posting score`` closures
    for a resolved query (``info``: term → (df, cf, bucket, tid)).

    ``similarity='bm25'`` (requires ``avgdl``) yields the frozen
    ``bm25.py`` weights — used by the boosted/dismax retrieval paths,
    which need per-term closures rather than the block-max kernel.
    ``boosts`` (term → multiplier, Lucene ``term^2.5`` query boosts)
    scales any similarity's per-term weight; missing terms default 1.
    """
    fns = {}
    for t, (df, cf, _b, tid) in info.items():
        boost = float(boosts.get(t, 1.0)) if boosts else 1.0
        if similarity == "classic":
            w = boost * classic_idf(n_docs, df) ** 2

            def f(tfs, dls, _w=w):
                return _w * classic_weight_np(tfs, dls)

        elif similarity == "lmdirichlet":

            def f(tfs, dls, _cf=cf, _bst=boost):
                return _bst * lmd_weight_np(tfs, dls, _cf, sum_dl)

        elif similarity == "lmjelinekmercer":

            def f(tfs, dls, _cf=cf, _bst=boost):
                return _bst * lmjm_weight_np(tfs, dls, _cf, sum_dl)

        elif similarity == "bm25":
            if avgdl is None:
                raise ValueError("bm25 weight_fns requires avgdl")
            w = boost * bm25.idf(n_docs, df)

            def f(tfs, dls, _w=w, _avgdl=float(avgdl)):
                return _w * bm25.tf_weight_np(tfs, dls, _avgdl)

        else:
            raise ValueError(f"unknown similarity: {similarity!r}")
        fns[tid] = f
    return fns


# --- DuckDB oracle SQL (driver correctness gate) ----------------------
def _oracle_shell(scored_term_expr: str, query_terms: list[str],
                  k: int, table: str, doc_col: str) -> str:
    terms_list = ", ".join(
        "'" + t.replace("'", "''") + "'" for t in query_terms
    )
    return f"""
WITH base AS (
  SELECT {doc_col} AS doc_id,
         list_filter(regexp_split_to_array(lower(text), '[^\\p{{L}}\\p{{N}}]+'),
                     t -> length(t) >= 3) AS tokens
  FROM {table} WHERE text IS NOT NULL
), base_dl AS (
  SELECT doc_id, len(tokens) AS dl, tokens FROM base
), stats AS (
  SELECT count(*) AS n, sum(dl) AS sum_dl FROM base_dl
), tok AS (
  SELECT doc_id, dl, unnest(tokens) AS term FROM base_dl
), coll AS (
  SELECT term, count(*) AS cf, count(DISTINCT doc_id) AS df
  FROM tok GROUP BY term
), tf AS (
  SELECT doc_id, term, count(*) AS tf, max(dl) AS dl
  FROM tok WHERE term IN ({terms_list}) GROUP BY doc_id, term
), scored AS (
  SELECT tf.doc_id,
         round(sum({scored_term_expr}), {bm25.ROUND_DIGITS}) AS score
  FROM tf, coll, stats WHERE tf.term = coll.term
  GROUP BY tf.doc_id
)
SELECT CAST(row_number() OVER (ORDER BY score DESC, doc_id ASC) AS INT) AS rank,
       doc_id, score
FROM scored
QUALIFY rank <= {k}
ORDER BY rank
"""


def oracle_sql_classic(query_text: str, k: int = 10,
                       table: str = "documents",
                       doc_col: str = "doc_id") -> str:
    """DuckDB replica of the classic TF-IDF spec above."""
    from tlhop_library_spark.analyzer import py_tokens

    terms = sorted(set(py_tokens(query_text)))
    expr = (
        "pow(1 + ln(stats.n / (coll.df + 1.0)), 2)"
        " * sqrt(tf.tf) / sqrt(tf.dl)"
    )
    return _oracle_shell(expr, terms, k, table, doc_col)


def oracle_sql_lmdirichlet(query_text: str, k: int = 10,
                           table: str = "documents",
                           doc_col: str = "doc_id") -> str:
    """DuckDB replica of the LM Dirichlet spec above."""
    from tlhop_library_spark.analyzer import py_tokens

    terms = sorted(set(py_tokens(query_text)))
    expr = (
        f"greatest(0, ln(1 + tf.tf / ({MU} * coll.cf / stats.sum_dl))"
        f" + ln({MU} / (tf.dl + {MU})))"
    )
    return _oracle_shell(expr, terms, k, table, doc_col)


def oracle_sql_lmjelinekmercer(query_text: str, k: int = 10,
                               table: str = "documents",
                               doc_col: str = "doc_id") -> str:
    """DuckDB replica of the LM Jelinek-Mercer spec above."""
    from tlhop_library_spark.analyzer import py_tokens

    terms = sorted(set(py_tokens(query_text)))
    expr = (
        f"ln(1 + ((1 - {LAMBDA_JM}) * tf.tf / tf.dl)"
        f" / ({LAMBDA_JM} * coll.cf / stats.sum_dl))"
    )
    return _oracle_shell(expr, terms, k, table, doc_col)
