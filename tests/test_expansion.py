"""search_expanded (RM3-style pseudo-relevance feedback): identity
with a from-scratch numpy reference over the raw corpus text, plus
behavioral contracts."""

from __future__ import annotations

import numpy as np
import pytest

from tlhop_library_spark import bm25
from tlhop_library_spark.analyzer import py_tokens


@pytest.fixture(scope="module")
def reader(spark, index_dir):
    from tlhop_library_spark.index import IndexReader

    return IndexReader(spark, index_dir)


@pytest.fixture(scope="module")
def texts(corpus_df):
    return {
        r["doc_id"]: r["text"]
        for r in corpus_df.collect()
        if r["text"] is not None
    }


def _reference_expanded(texts, query, k, fb_docs, fb_terms, beta):
    toks = {d: py_tokens(t) for d, t in texts.items()}
    dls = {d: len(tk) for d, tk in toks.items()}
    n = len(texts)
    avgdl = sum(dls.values()) / n

    def bm25_topk(weighted_terms, kk):
        totals = {}
        for term, wt in weighted_terms.items():
            df = sum(1 for tk in toks.values() if term in tk)
            if not df:
                continue
            idf = bm25.idf(n, df)
            for d, tk in toks.items():
                tf = tk.count(term)
                if tf:
                    w = (
                        wt * idf * tf * (bm25.K1 + 1)
                        / (tf + bm25.K1
                           * (1 - bm25.B + bm25.B * dls[d] / avgdl))
                    )
                    totals[d] = totals.get(d, 0.0) + w
        ranked = sorted(
            ((round(s, bm25.ROUND_DIGITS), d) for d, s in totals.items()),
            key=lambda x: (-x[0], x[1]),
        )[:kk]
        return [(i + 1, d, s) for i, (s, d) in enumerate(ranked)]

    qterms = sorted(set(py_tokens(query)))
    top = bm25_topk({t: 1.0 for t in qterms}, fb_docs)
    fb_ids = [d for _, d, _ in top]
    w = {}
    for d in fb_ids:
        for term in set(toks[d]):
            w[term] = w.get(term, 0.0) + toks[d].count(term) / dls[d]
    picked = sorted(
        ((round(v, bm25.ROUND_DIGITS), t) for t, v in w.items()
         if t not in qterms),
        key=lambda x: (-x[0], x[1]),
    )[:fb_terms]
    weighted = {t: 1.0 for t in qterms}
    weighted.update({t: beta for _, t in picked})
    return bm25_topk(weighted, k)


def rows(df):
    return [
        (r["rank"], r["doc_id"], r["score"])
        for r in df.orderBy("rank").collect()
    ]


@pytest.mark.parametrize("q", ["bace cada", "informação"])
def test_expanded_matches_reference(spark, reader, texts, q):
    got = rows(
        reader.search_expanded(
            q, k=10, fb_docs=5, fb_terms=3, expansion_weight=0.5
        )
    )
    want = _reference_expanded(texts, q, 10, 5, 3, 0.5)
    assert got == want, q


def test_expansion_changes_ranking_vs_plain(spark, reader):
    """With a nonzero expansion weight the result generally differs
    from the plain query (expansion adds scoring terms); with weight 0
    the expansion terms contribute nothing and the ranking must equal
    the plain search exactly."""
    plain = rows(reader.search("bace cada", k=10))
    zero = rows(
        reader.search_expanded(
            "bace cada", k=10, fb_docs=5, fb_terms=3,
            expansion_weight=0.0,
        )
    )
    assert zero == plain
    exp = rows(
        reader.search_expanded(
            "bace cada", k=10, fb_docs=5, fb_terms=3,
            expansion_weight=0.5,
        )
    )
    assert exp != plain  # synthetic corpus: expansion always kicks in


def test_expanded_absent_and_empty(spark, reader):
    assert reader.search_expanded("zzznope", k=5).count() == 0
    assert reader.search_expanded("", k=5).count() == 0


def test_expanded_modes_agree(spark, reader):
    a = rows(reader.search_expanded("bace cada", k=10, mode="bmw"))
    b = rows(
        reader.search_expanded("bace cada", k=10, mode="exhaustive")
    )
    assert a == b
