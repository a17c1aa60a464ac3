"""search_snippets: first-match display windows over indexed hits."""

from pyspark.sql import functions as F

from tlhop_library_spark.analyzer import py_tokens
from tlhop_library_spark.index.query import IndexReader, snippet_col


def test_search_snippets_shape_and_content(spark, corpus_df, index_dir):
    r = IndexReader(spark, index_dir)
    q = "bace cada"
    hits = r.search(q, 10)
    snip = r.search_snippets(q, corpus_df, 10)
    rows = {x["doc_id"]: x for x in snip.collect()}
    assert set(rows) == {x["doc_id"] for x in hits.collect()}
    terms = sorted(set(py_tokens(q)))
    for x in rows.values():
        assert len(x["snippet"]) <= 100
        # every hit contains ≥1 query term; the window is anchored on
        # the first occurrence, so the snippet must show one unless the
        # match sits beyond the first occurrence's 100-char window
        assert any(t in x["snippet"].lower() for t in terms)


def test_snippet_join_is_broadcast_and_udf_free(spark, corpus_df, index_dir):
    r = IndexReader(spark, index_dir)
    plan = (
        r.search_snippets("bace", corpus_df, 5)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan.split(
        "ApplyInPandas"
    )[-1]


def test_snippet_col_no_match_falls_back_to_prefix(spark):
    df = spark.createDataFrame([("abcdef " * 30,)], "text string")
    out = df.select(
        snippet_col(F.col("text"), ["zzz"], before=40, width=50).alias("s")
    ).collect()[0]["s"]
    assert out == ("abcdef " * 30)[:50]
