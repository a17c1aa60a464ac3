"""search_and: AND-semantics BM25 retrieval over the index."""

from pyspark.sql import functions as F

from tlhop_library_spark.analyzer import py_tokens
from tlhop_library_spark.index.query import IndexReader, score_exhaustive


def _ids(df):
    return [r["doc_id"] for r in df.orderBy("rank").collect()]


def test_and_results_contain_every_term(spark, corpus_df, index_dir):
    r = IndexReader(spark, index_dir)
    q = "informação segurança"
    terms = sorted(set(py_tokens(q)))
    hits = _ids(r.search_and(q, 10))
    assert hits, "conjunction should match on the test corpus"
    toks = {
        x["doc_id"]: set(x["toks"])
        for x in corpus_df.where(F.col("doc_id").isin(hits))
        .select(
            "doc_id",
            F.expr(
                "filter(split(lower(text), '[^\\\\p{L}\\\\p{N}]+'),"
                " t -> length(t) >= 3)"
            ).alias("toks"),
        )
        .collect()
    }
    for d in hits:
        assert set(terms) <= toks[d], d


def test_and_is_subset_of_or_with_same_scores(spark, index_dir):
    r = IndexReader(spark, index_dir)
    q = "informação segurança"
    or_scores = {
        x["doc_id"]: x["score"] for x in r.search(q, 1000).collect()
    }
    for x in r.search_and(q, 10).collect():
        # same BM25 score as the disjunctive engine assigns the doc
        assert or_scores[x["doc_id"]] == x["score"]


def test_and_empty_when_any_term_absent(spark, index_dir):
    r = IndexReader(spark, index_dir)
    assert r.search_and("bace zzznope", 10).count() == 0
    assert r.search_and("", 10).count() == 0


def test_and_matches_exhaustive_restriction(spark, corpus_df, index_dir):
    """Cross-engine: filter score_exhaustive's full ranking down to
    all-terms docs → must equal search_and's top-k."""
    r = IndexReader(spark, index_dir)
    q = "ação coração análise"
    terms = sorted(set(py_tokens(q)))
    full = score_exhaustive(corpus_df, q, 100_000)
    toks = corpus_df.select(
        "doc_id",
        F.expr(
            "filter(split(lower(text), '[^\\\\p{L}\\\\p{N}]+'),"
            " t -> length(t) >= 3)"
        ).alias("toks"),
    )
    cond = None
    for t in terms:
        c = F.array_contains("toks", t)
        cond = c if cond is None else (cond & c)
    allowed = {x["doc_id"] for x in toks.where(cond).collect()}
    expect = [
        (x["doc_id"], x["score"])
        for x in full.orderBy("rank").collect()
        if x["doc_id"] in allowed
    ][:10]
    got = [
        (x["doc_id"], x["score"])
        for x in r.search_and(q, 10).orderBy("rank").collect()
    ]
    assert got == expect
