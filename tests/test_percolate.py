"""Percolator (reverse search): brute-force identity over the corpus
fixture, msm edge semantics, and the broadcast plan shape."""

from pyspark.sql import functions as F

from tlhop_library_spark.analyzer import py_tokens
from tlhop_library_spark.operators.percolate import percolate

QUERIES = [
    (1, "bace cada", None),      # AND
    (2, "bace tesa", 1),         # OR
    (3, "dadu cadi bace", 2),    # 2 of 3
    (4, "bace bace bace", None), # dup terms collapse to 1 distinct
    (5, "zzznope", None),        # matches nothing
    (6, "a b", None),            # no analyzable tokens -> dropped
    (7, "informação", 5),        # msm clamped to term count (1)
]


def _qdf(spark):
    return spark.createDataFrame(
        QUERIES, "query_id long, query_text string, msm int"
    )


def test_percolate_matches_brute_force(spark, corpus_df):
    got = {
        (r["doc_id"], r["query_id"]): (r["matched"], r["required"])
        for r in percolate(corpus_df, _qdf(spark)).collect()
    }
    toks = {
        r["doc_id"]: set(py_tokens(r["text"]))
        for r in corpus_df.where(F.col("text").isNotNull()).collect()
    }
    want = {}
    for qid, qtext, msm in QUERIES:
        terms = set(py_tokens(qtext))
        if not terms:
            continue
        required = len(terms) if msm is None else min(msm, len(terms))
        for d, tk in toks.items():
            m = len(terms & tk)
            if m >= required:
                want[(d, qid)] = (m, required)
    assert got == want
    assert want, "fixture should produce matches"
    qids = {q for _, q in got}
    assert 5 not in qids and 6 not in qids
    assert any(q == 7 for _, q in got)  # clamped msm matches


def test_percolate_msm_defaults_and_duplicates(spark, corpus_df):
    """AND requires co-occurrence: register a query from two tokens of
    a REAL doc (guaranteed AND match) and verify required counts."""
    doc = next(
        r
        for r in corpus_df.where(F.col("text").isNotNull()).take(50)
        if len(set(py_tokens(r["text"]))) >= 2
    )
    t1, t2 = sorted(set(py_tokens(doc["text"])))[:2]
    queries = [
        (1, f"{t1} {t2}", None),          # AND, co-occurring pair
        (2, f"{t1} zzznope", 1),          # OR
        (4, f"{t1} {t1} {t1}", None),     # dup terms collapse to 1
        (7, t2, 5),                       # msm clamped to 1 term
    ]
    qdf = spark.createDataFrame(
        queries, "query_id long, query_text string, msm int"
    )
    rows = percolate(corpus_df, qdf).collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r["query_id"], set()).add(r["required"])
    assert by_q[1] == {2}   # AND over 2 distinct terms
    assert by_q[2] == {1}   # OR
    assert by_q[4] == {1}   # duplicate terms collapse
    assert by_q[7] == {1}   # msm=5 clamped to 1 term
    hits1 = {r["doc_id"] for r in rows if r["query_id"] == 1}
    assert doc["doc_id"] in hits1


def test_percolate_plan_broadcasts_queries(spark, corpus_df):
    """The registered-query side must broadcast: the doc stream's only
    shuffle is the partial-aggregated groupBy, never a sort-merge
    join."""
    plan = percolate(corpus_df, _qdf(spark))._jdf.queryExecution(
    ).executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
