"""search_regexp (RegexpQuery) and more_like_this (MLT)."""

from __future__ import annotations

import pytest


@pytest.fixture(scope="module")
def reader(spark, index_dir):
    from tlhop_library_spark.index import IndexReader

    return IndexReader(spark, index_dir)


def rows(df):
    return [
        (r["rank"], r["doc_id"], r["score"])
        for r in df.orderBy("rank").collect()
    ]


def test_regexp_equals_explicit_or(spark, reader):
    """A regexp matching exactly {bace, pili} must equal the plain OR
    search over those terms (full-match semantics)."""
    got = rows(reader.search_regexp("bace|pili", k=10))
    want = rows(reader.search("bace pili", k=10))
    assert got == want and got


def test_regexp_full_match_not_substring(spark, reader):
    """'nformaçã' is a substring of 'informação' but no full match —
    zero hits (Lucene RegexpQuery anchors the whole term)."""
    assert reader.search_regexp("nformaçã", k=5).count() == 0
    # with explicit wildcards it matches again
    assert reader.search_regexp(".*nformaçã.*", k=5).count() > 0


def test_regexp_expansion_guard(spark, reader):
    with pytest.raises(ValueError, match="expands"):
        reader.search_regexp(".*", k=5, max_expansions=3)


def test_mlt_excludes_source_and_finds_related(spark, reader,
                                               corpus_df):
    # a doc guaranteed to have tokens: the top hit of a common term
    # (the corpus's min doc_id has empty-but-non-null text, for which
    # an empty MLT result is the correct answer — covered below)
    src = reader.search("informação", k=1).collect()[0]["doc_id"]
    got = rows(reader.more_like_this(int(src), k=10))
    assert got, "MLT found nothing for a live doc"
    assert int(src) not in [d for _, d, _ in got]
    assert [r for r, _, _ in got] == list(range(1, len(got) + 1))


def test_mlt_modes_agree(spark, reader, corpus_df):
    src = reader.search("informação", k=1).collect()[0]["doc_id"]
    a = rows(reader.more_like_this(int(src), k=10, mode="bmw"))
    b = rows(reader.more_like_this(int(src), k=10, mode="exhaustive"))
    assert a == b


def test_mlt_missing_doc_is_empty(spark, reader, corpus_df):
    assert reader.more_like_this(10**12, k=5).count() == 0
    # empty-text (tokenless) doc → empty term vector → empty result
    empty_doc = (
        corpus_df.where("text IS NOT NULL AND length(text) = 0")
        .agg({"doc_id": "min"})
        .collect()[0][0]
    )
    if empty_doc is not None:
        assert reader.more_like_this(int(empty_doc), k=5).count() == 0
