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


# --- minimum-should-match (search_msm) --------------------------------

def test_msm_full_equals_and(spark, index_dir):
    """min_should_match = n_terms degenerates to search_and."""
    r = IndexReader(spark, index_dir)
    q = "informação segurança"
    got = [
        (x["doc_id"], x["score"])
        for x in r.search_msm(q, 10, min_should_match=2).orderBy("rank").collect()
    ]
    expect = [
        (x["doc_id"], x["score"])
        for x in r.search_and(q, 10).orderBy("rank").collect()
    ]
    assert got == expect


def test_msm_one_equals_plain_or(spark, index_dir):
    """min_should_match = 1 ≡ plain disjunctive search (rank + score)."""
    r = IndexReader(spark, index_dir)
    q = "informação segurança dados"
    got = [
        (x["doc_id"], x["score"])
        for x in r.search_msm(q, 10, min_should_match=1).orderBy("rank").collect()
    ]
    expect = [
        (x["doc_id"], x["score"])
        for x in r.search(q, 10).orderBy("rank").collect()
    ]
    assert got == expect


def test_msm_two_of_three_matches_exhaustive_restriction(
    spark, corpus_df, index_dir
):
    """Cross-engine: docs with ≥2 of 3 terms, scored over the terms
    they contain, must equal score_exhaustive filtered the same way."""
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
    n_hit = None
    for t in terms:
        c = F.array_contains("toks", t).cast("int")
        n_hit = c if n_hit is None else (n_hit + c)
    allowed = {
        x["doc_id"]
        for x in toks.where(n_hit >= 2).collect()
    }
    expect = [
        (x["doc_id"], x["score"])
        for x in full.orderBy("rank").collect()
        if x["doc_id"] in allowed
    ][:10]
    got = [
        (x["doc_id"], x["score"])
        for x in r.search_msm(q, 10, min_should_match=2)
        .orderBy("rank")
        .collect()
    ]
    assert got == expect
    # sanity: the 2-of-3 threshold is a real restriction on this corpus
    # (fewer qualifying docs than the plain OR match set)
    n_or = r.search(q, 100_000).count()
    n_msm = r.search_msm(q, 100_000, min_should_match=2).count()
    assert 0 < n_msm < n_or


def test_msm_threshold_above_present_terms_is_empty(spark, index_dir):
    r = IndexReader(spark, index_dir)
    # one real term + one absent term: threshold 2 can never be met
    assert r.search_msm("informação zzznope", 10, min_should_match=2).count() == 0
    assert r.search_msm("", 10).count() == 0
