"""Pluggable similarities (classic TF-IDF, LM Dirichlet): the indexed
kernel must equal an independent numpy brute-force implementation of
the frozen spec in tlhop_library_spark/similarities.py."""

import math

import numpy as np
import pytest

from tlhop_library_spark import bm25, similarities
from tlhop_library_spark.analyzer import py_tokens
from tlhop_library_spark.index.query import IndexReader


def _brute_force(corpus_rows, query, similarity, k):
    """Independent per-doc python scorer straight from the spec text."""
    terms = sorted(set(py_tokens(query)))
    docs = {
        r["doc_id"]: py_tokens(r["text"])
        for r in corpus_rows
        if r["text"] is not None
    }
    n = len(docs)
    sum_dl = sum(len(t) for t in docs.values())
    df = {t: sum(1 for tk in docs.values() if t in tk) for t in terms}
    cf = {
        t: sum(tk.count(t) for tk in docs.values()) for t in terms
    }
    scored = []
    for d, tk in docs.items():
        s = 0.0
        matched = False
        for t in terms:
            tf = tk.count(t)
            if tf == 0:
                continue
            matched = True
            dl = len(tk)
            if similarity == "classic":
                idf = 1.0 + math.log(n / (df[t] + 1.0))
                s += idf * idf * math.sqrt(tf) / math.sqrt(dl)
            elif similarity == "lmjelinekmercer":
                lam = similarities.LAMBDA_JM
                p = cf[t] / sum_dl
                s += math.log(1.0 + ((1.0 - lam) * tf / dl) / (lam * p))
            else:
                p = cf[t] / sum_dl
                s += max(
                    0.0,
                    math.log(1.0 + tf / (similarities.MU * p))
                    + math.log(similarities.MU / (dl + similarities.MU)),
                )
        if matched:
            scored.append((d, round(s, bm25.ROUND_DIGITS)))
    scored.sort(key=lambda x: (-x[1], x[0]))
    return scored[:k]


@pytest.mark.parametrize(
    "similarity", ["classic", "lmdirichlet", "lmjelinekmercer"]
)
def test_search_sim_matches_brute_force(
    spark, corpus_df, index_dir, similarity
):
    r = IndexReader(spark, index_dir)
    q = "informação segurança dados"
    rows = corpus_df.select("doc_id", "text").collect()
    expect = _brute_force(rows, q, similarity, 10)
    got = [
        (x["doc_id"], x["score"])
        for x in r.search_sim(q, 10, similarity=similarity)
        .orderBy("rank")
        .collect()
    ]
    assert got == expect


def test_similarities_rank_differently_from_bm25(spark, index_dir):
    """The plug is real: at depth the three models order docs
    differently on a mixed-df query (scores certainly differ)."""
    r = IndexReader(spark, index_dir)
    q = "informação segurança dados"
    bm = [x["score"] for x in r.search(q, 10).orderBy("rank").collect()]
    cl = [
        x["score"]
        for x in r.search_sim(q, 10, "classic").orderBy("rank").collect()
    ]
    lm = [
        x["score"]
        for x in r.search_sim(q, 10, "lmdirichlet").orderBy("rank").collect()
    ]
    jm = [
        x["score"]
        for x in r.search_sim(q, 10, "lmjelinekmercer")
        .orderBy("rank").collect()
    ]
    assert bm != cl and bm != lm and cl != lm
    assert jm != lm and jm != cl and jm != bm


def test_search_sim_absent_and_empty_queries(spark, index_dir):
    r = IndexReader(spark, index_dir)
    assert r.search_sim("zzznope", 10, "classic").count() == 0
    assert r.search_sim("", 10, "lmdirichlet").count() == 0
    with pytest.raises(ValueError):
        r.search_sim("informação", 10, similarity="nope")


def test_lmd_clamp_engages_for_common_terms():
    """A term occupying much of the collection predicts tf≈μp>tf — its
    raw contribution goes negative and must clamp to exactly 0."""
    tfs = np.array([1], dtype=np.int64)
    dls = np.array([100], dtype=np.int64)
    # cf/sum_dl = 0.05 → μp = 100 ≫ tf=1
    w = similarities.lmd_weight_np(tfs, dls, cf=5000, sum_dl=100_000)
    assert w[0] == 0.0
    # and a rare term stays positive
    w2 = similarities.lmd_weight_np(tfs, dls, cf=5, sum_dl=100_000)
    assert w2[0] > 0.0


# ---------------------------------------------------------------------
# ES-style rescoring (two-pass window re-rank)
# ---------------------------------------------------------------------
def test_rescore_zero_weight_equals_plain_search(spark, index_dir):
    from tlhop_library_spark.index import IndexReader

    r = IndexReader(spark, index_dir)
    q = "bace cada"
    a = [
        tuple(x)
        for x in r.search_rescore(
            q, k=10, window=50, rescore_weight=0.0
        ).collect()
    ]
    b = [tuple(x) for x in r.search(q, k=10).collect()]
    assert a == b and a


def test_rescore_query_zero_equals_sim_on_window(spark, index_dir):
    """query_weight=0 with a window covering every matching doc ≡ the
    secondary similarity's own top-k."""
    from tlhop_library_spark.index import IndexReader

    r = IndexReader(spark, index_dir)
    q = "bace cada"
    n_match = r.count_matches(q, match="any").collect()[0]["n_docs"]
    a = [
        tuple(x)
        for x in r.search_rescore(
            q, k=10, window=n_match, similarity="lmdirichlet",
            query_weight=0.0,
        ).collect()
    ]
    b = [
        tuple(x)
        for x in r.search_sim(q, k=10, similarity="lmdirichlet").collect()
    ]
    assert a == b and a


def test_rescore_window_bounds_candidates(spark, index_dir):
    """A doc ranked outside the first-pass window can never appear,
    even with a huge rescore weight (ES window semantics)."""
    from tlhop_library_spark.index import IndexReader

    r = IndexReader(spark, index_dir)
    q = "bace cada"
    window = 5
    first = {x["doc_id"] for x in r.search(q, window).collect()}
    out = {
        x["doc_id"]
        for x in r.search_rescore(
            q, k=5, window=window, rescore_weight=100.0
        ).collect()
    }
    assert out <= first
