"""IndexReader.explain (Lucene-explain parity) and count_matches
(totalHits parity): component-level consistency with search() and
with a driver-side recomputation from the raw corpus text."""

from __future__ import annotations

import pytest

from tlhop_library_spark.analyzer import py_tokens
from tlhop_library_spark import bm25

QUERY = "bace cada"


@pytest.fixture(scope="module")
def reader(spark, index_dir):
    from tlhop_library_spark.index import IndexReader

    return IndexReader(spark, index_dir)


def test_explain_consistent_with_search(spark, reader):
    top = reader.search(QUERY, k=10).collect()
    ex = reader.explain(QUERY, k=10).collect()
    assert top and ex
    by_doc: dict[int, list] = {}
    for r in ex:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert set(by_doc) == {r["doc_id"] for r in top}
    tol = 10 ** -bm25.ROUND_DIGITS
    for t in top:
        rows = by_doc[t["doc_id"]]
        # rank and total score are carried verbatim from search()
        assert all(r["rank"] == t["rank"] for r in rows)
        assert all(r["score"] == t["score"] for r in rows)
        # per-term weights sum back to the doc score (each side
        # rounded independently → tolerance n_terms·ulp)
        assert sum(r["weight"] for r in rows) == pytest.approx(
            t["score"], abs=(len(rows) + 1) * tol
        )
        assert {r["term"] for r in rows} <= set(py_tokens(QUERY))


def test_explain_tf_dl_match_raw_text(spark, reader, corpus_df):
    ex = reader.explain(QUERY, k=5).collect()
    assert ex
    docs = {
        r["doc_id"]: r["text"]
        for r in corpus_df.where(
            corpus_df.doc_id.isin([e["doc_id"] for e in ex])
        ).collect()
    }
    for e in ex:
        toks = py_tokens(docs[e["doc_id"]])
        assert e["tf"] == toks.count(e["term"])
        assert e["dl"] == len(toks)


def test_explain_absent_and_empty(spark, reader):
    assert reader.explain("zzznope", k=5).count() == 0
    assert reader.explain("", k=5).count() == 0


def _truth_counts(corpus_rows, terms, match):
    n = 0
    for text in corpus_rows:
        toks = set(py_tokens(text))
        hit = (
            bool(toks & set(terms))
            if match == "any"
            else set(terms) <= toks
        )
        n += hit
    return n


@pytest.mark.parametrize("match", ["any", "all"])
@pytest.mark.parametrize("q", [QUERY, "informação", "bace zzznope"])
def test_count_matches_vs_raw_text(spark, reader, corpus_df, match, q):
    got = reader.count_matches(q, match=match).collect()[0]["n_docs"]
    texts = [
        r["text"]
        for r in corpus_df.select("text").collect()
        if r["text"] is not None
    ]
    terms = sorted(set(py_tokens(q)))
    want = _truth_counts(texts, terms, match) if terms else 0
    # 'all' with an absent term can never match any doc
    if match == "all" and "zzznope" in q:
        want = 0
    assert got == want, (match, q)


def test_count_matches_empty_and_invalid(spark, reader):
    assert reader.count_matches("", match="any").collect()[0]["n_docs"] == 0
    with pytest.raises(ValueError):
        reader.count_matches(QUERY, match="bogus")


def test_count_matches_respects_tombstones(spark, index_dir,
                                           tmp_path_factory):
    import shutil

    from tlhop_library_spark.index import IndexReader, delete_documents

    base = IndexReader(spark, index_dir)
    before = base.count_matches(QUERY, "any").collect()[0]["n_docs"]
    victim = base.search(QUERY, k=1).collect()
    if not victim:
        pytest.skip("no hits")
    cp = str(tmp_path_factory.mktemp("cnt") / "idx")
    shutil.copytree(index_dir, cp)
    delete_documents(spark, cp, [victim[0]["doc_id"]])
    after = IndexReader(spark, cp).count_matches(QUERY, "any").collect()[0][
        "n_docs"
    ]
    assert after == before - 1
