"""search_synonyms (Lucene SynonymQuery semantics) and search_page."""

from __future__ import annotations

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


def rows(df):
    return [
        (r["rank"], r["doc_id"], r["score"])
        for r in df.orderBy("rank").collect()
    ]


def _reference_synonyms(texts, query, synonyms, k):
    toks = {d: py_tokens(t) for d, t in texts.items()}
    dls = {d: len(tk) for d, tk in toks.items()}
    n = len(texts)
    avgdl = sum(dls.values()) / n
    qterms = sorted(set(py_tokens(query)))
    term_group: dict[str, int] = {}
    for gi, t in enumerate(qterms):
        members = {t}
        for s in synonyms.get(t, []):
            members.update(py_tokens(s))
        for m in sorted(members):
            term_group[m] = gi
    groups: dict[int, list[str]] = {}
    for m, gi in term_group.items():
        groups.setdefault(gi, []).append(m)
    totals: dict[int, float] = {}
    for gi, members in groups.items():
        dfs = [
            sum(1 for tk in toks.values() if m in tk) for m in members
        ]
        dfs = [d for d in dfs if d]
        if not dfs:
            continue
        idf = bm25.idf(n, max(dfs))
        for d, tk in toks.items():
            tf = sum(tk.count(m) for m in members)
            if not tf:
                continue
            w = (
                idf * tf * (bm25.K1 + 1)
                / (tf + bm25.K1 * (1 - bm25.B + bm25.B * dls[d] / avgdl))
            )
            totals[d] = totals.get(d, 0.0) + w
    ranked = sorted(
        ((round(s, bm25.ROUND_DIGITS), d) for d, s in totals.items()),
        key=lambda x: (-x[0], x[1]),
    )[:k]
    return [(i + 1, d, s) for i, (s, d) in enumerate(ranked)]


def test_synonyms_match_reference(spark, reader, texts):
    syn = {"informação": ["segurança", "dade"], "bace": ["pili"]}
    for q in ["informação bace", "informação"]:
        got = rows(reader.search_synonyms(q, syn, k=10))
        want = _reference_synonyms(texts, q, syn, 10)
        assert got == want, q


def test_synonyms_empty_mapping_equals_plain(spark, reader):
    got = rows(reader.search_synonyms("bace cada", {}, k=10))
    want = rows(reader.search("bace cada", k=10))
    assert got == want


def test_synonyms_differ_from_plain_or(spark, reader):
    """Group scoring (summed tf, one idf) is NOT a plain OR over the
    members — scores must differ on the synthetic corpus."""
    syn = {"informação": ["segurança"]}
    grouped = rows(reader.search_synonyms("informação", syn, k=10))
    plain_or = rows(reader.search("informação segurança", k=10))
    assert grouped != plain_or


def test_synonyms_absent_terms(spark, reader):
    assert reader.search_synonyms("zzznope", {"zzznope": ["zzzno2"]},
                                  k=5).count() == 0
    # absent synonym of a present term: scores as the term alone
    got = rows(reader.search_synonyms("bace", {"bace": ["zzznope"]},
                                      k=10))
    want = rows(reader.search("bace", k=10))
    assert got == want


def test_search_page_slices_global_ranking(spark, reader):
    full = rows(reader.search("informação", k=15))
    assert len(full) == 15
    page = rows(
        reader.search_page("informação", page_size=10, offset=5)
    )
    assert page == full[5:15]
    page1 = rows(reader.search_page("informação", page_size=5, offset=0))
    assert page1 == full[:5]
