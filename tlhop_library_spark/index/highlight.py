"""Search-result highlighting — Lucene/ES "plain highlighter" parity.

Given a page of hits and the docs table, produce per hit a snippet of
the document with every query-term occurrence wrapped in ``<em>`` tags.
Like Lucene's plain highlighter (and ES ``"type": "plain"``), the
snippet is built by RE-ANALYZING the stored text of the hit docs only —
no positional index required, so it works on plain and positional
indexes alike and its cost is O(k docs), independent of corpus size.

Frozen fragment spec (v1, deterministic — the DuckDB oracle mirrors it
token for token):

- tokens = analyzer-v1 tokens of ``text`` (positions are 0-based token
  positions; rendering is token-joined with single spaces, i.e. the
  snippet is normalized text, not a byte slice of the original — the
  re-analysis contract, stated in the ES docs for the plain
  highlighter, that offsets come from the analyzer not the source);
- match positions M = positions whose token ∈ the query's distinct
  v1 tokens;
- every m ∈ M anchors a candidate window [m, m+size-1]; its score is
  the number of match positions inside the window;
- fragments are chosen greedily by (score DESC, m ASC), skipping any
  anchor within ``size-1`` of an already-chosen one (windows never
  overlap), up to ``n_fragments``;
- chosen windows are rendered in position order, matched tokens
  wrapped in ``<em>…</em>``, fragments joined by ``" … "``. A hit doc
  with no match positions (possible under constant-score / filtered /
  MLT-style hit streams) renders NULL.

Scale shape: the hit page (≤ k rows) is broadcast-joined to the docs
scan, so the text of only k documents is ever read into the fragment
expression; everything below is Spark SQL higher-order functions
(transform / filter / aggregate / slice / array_join) — zero Python,
zero extra shuffle, and whole-stage codegen keeps it JVM-side.

Reference basis: the reference has no highlighting (its closest
surface is substring ``contains`` over banners,
/root/reference/tlhop/shodan_library.py:179-204); this is new engine
surface mandated by the fulltext north rule, spec'd against Lucene's
highlighter semantics from public docs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from tlhop_library_spark.analyzer import (
    MIN_TOKEN_LEN,
    py_tokens,
    tokens_col,
)

#: default window width, in tokens
FRAGMENT_SIZE = 8


def _em(tok: Column, qterms: Column) -> Column:
    return F.when(
        F.array_contains(qterms, tok),
        F.concat(F.lit("<em>"), tok, F.lit("</em>")),
    ).otherwise(tok)


def fragment_col(
    text: Column,
    query_terms: list[str],
    fragment_size: int = FRAGMENT_SIZE,
    n_fragments: int = 1,
) -> Column:
    """The v1 highlight fragment for ``text`` (NULL when no query term
    occurs). Pure JVM expression — safe to evaluate on any row count,
    but intended for an already-limited hit page."""
    if fragment_size < 1 or n_fragments < 1:
        raise ValueError("fragment_size and n_fragments must be >= 1")
    qterms = F.array(
        *[F.lit(t) for t in sorted(set(query_terms))]
    ).cast("array<string>")
    toks = tokens_col(text)
    # match positions, ascending
    mpos = F.filter(
        F.transform(toks, lambda t, i: F.when(
            F.array_contains(qterms, t), i
        ).otherwise(F.lit(-1))),
        lambda p: p >= 0,
    )
    # candidate anchors sorted by (score DESC, m ASC): array_sort on
    # struct(-score, m) is lexicographic ascending
    anchors = F.array_sort(
        F.transform(
            mpos,
            lambda m: F.struct(
                (-F.size(
                    F.filter(
                        mpos,
                        lambda p: (p >= m) & (p < m + fragment_size),
                    )
                )).alias("neg_score"),
                m.alias("m"),
            ),
        )
    )
    # greedy non-overlapping selection of up to n_fragments anchors
    chosen = F.aggregate(
        anchors,
        F.expr("array()").cast("array<int>"),
        lambda acc, a: F.when(
            (F.size(acc) < n_fragments)
            & ~F.exists(
                acc,
                lambda s: (a["m"] > s - fragment_size)
                & (a["m"] < s + fragment_size),
            ),
            F.concat(acc, F.array(a["m"])),
        ).otherwise(acc),
    )
    rendered = F.transform(
        F.array_sort(chosen),
        lambda m: F.array_join(
            F.transform(
                F.slice(toks, m + 1, fragment_size),
                lambda t: _em(t, qterms),
            ),
            " ",
        ),
    )
    return F.when(F.size(chosen) > 0, F.array_join(rendered, " … "))


def highlight_hits(
    hits: DataFrame,
    docs: DataFrame,
    query_text: str,
    fragment_size: int = FRAGMENT_SIZE,
    n_fragments: int = 1,
    text_col: str = "text",
) -> DataFrame:
    """Attach a ``fragment`` column to a hit page. ``hits`` must carry
    ``doc_id`` (``rank``/``score`` pass through when present) and be
    small (a top-k page) — it is broadcast against the docs scan so
    only the k hit texts are analyzed."""
    qterms = py_tokens(query_text)
    joined = F.broadcast(hits).join(
        docs.select("doc_id", text_col), "doc_id"
    )
    out = joined.withColumn(
        "fragment",
        fragment_col(
            F.col(text_col), qterms, fragment_size, n_fragments
        ),
    ).drop(text_col)
    order = [c for c in ("rank", "doc_id") if c in hits.columns]
    return out.orderBy(*order)


def py_fragment(
    text: str | None,
    query_terms: list[str],
    fragment_size: int = FRAGMENT_SIZE,
    n_fragments: int = 1,
) -> str | None:
    """Pure-Python reference implementation of the v1 fragment spec
    (test oracle for the multi-fragment path the SQL oracle doesn't
    cover)."""
    toks = py_tokens(text)
    qset = set(query_terms)
    mpos = [i for i, t in enumerate(toks) if t in qset]
    if not mpos:
        return None
    anchors = sorted(
        (
            -sum(1 for p in mpos if m <= p < m + fragment_size),
            m,
        )
        for m in mpos
    )
    chosen: list[int] = []
    for _, m in anchors:
        if len(chosen) >= n_fragments:
            break
        if any(abs(m - s) < fragment_size for s in chosen):
            continue
        chosen.append(m)
    frags = []
    for m in sorted(chosen):
        window = toks[m : m + fragment_size]
        frags.append(
            " ".join(
                f"<em>{t}</em>" if t in qset else t for t in window
            )
        )
    return " … ".join(frags)


def oracle_sql_highlight(
    query_text: str,
    k: int = 10,
    fragment_size: int = FRAGMENT_SIZE,
    table: str = "documents",
) -> str:
    """DuckDB SQL: BM25 top-k (the frozen scoring spec) + the v1
    single-fragment highlight per hit. Mirrors
    :func:`IndexReader.search_highlight` / ``highlight_hits`` with
    ``n_fragments=1`` (the greedy multi-fragment loop is sequential;
    its parity is pinned by ``py_fragment`` tests instead)."""
    from tlhop_library_spark.index.query import oracle_sql_bm25

    terms = sorted(set(py_tokens(query_text)))
    terms_list = ", ".join(
        "'" + t.replace("'", "''") + "'" for t in terms
    )
    base = oracle_sql_bm25(query_text, k=k, table=table).rstrip()
    return f"""
WITH hits AS (
{base}
), htoks AS (
  SELECT h.rank, h.doc_id, h.score,
         list_filter(regexp_split_to_array(lower(d.text), '[^\\p{{L}}\\p{{N}}]+'),
                     t -> length(t) >= {MIN_TOKEN_LEN}) AS tokens
  FROM hits h JOIN {table} d ON d.doc_id = h.doc_id
), tok AS (
  SELECT rank, doc_id, unnest(tokens) AS term,
         generate_subscripts(tokens, 1) - 1 AS pos
  FROM htoks
), matches AS (
  SELECT rank, doc_id, pos FROM tok WHERE term IN ({terms_list})
), anchors AS (
  SELECT a.rank, a.doc_id, a.pos AS m, count(*) AS mscore
  FROM matches a JOIN matches b
    ON b.doc_id = a.doc_id
   AND b.pos >= a.pos AND b.pos < a.pos + {fragment_size}
  GROUP BY a.rank, a.doc_id, a.pos
), best AS (
  SELECT rank, doc_id, m FROM (
    SELECT rank, doc_id, m,
           row_number() OVER (
             PARTITION BY doc_id ORDER BY mscore DESC, m ASC
           ) AS rn
    FROM anchors
  ) WHERE rn = 1
), frag AS (
  SELECT t.rank, t.doc_id,
         string_agg(
           CASE WHEN t.term IN ({terms_list})
                THEN '<em>' || t.term || '</em>' ELSE t.term END,
           ' ' ORDER BY t.pos
         ) AS fragment
  FROM tok t JOIN best b
    ON t.doc_id = b.doc_id
   AND t.pos >= b.m AND t.pos < b.m + {fragment_size}
  GROUP BY t.rank, t.doc_id
)
SELECT h.rank, h.doc_id, h.score, f.fragment
FROM hits h LEFT JOIN frag f ON f.doc_id = h.doc_id
ORDER BY h.rank
"""
