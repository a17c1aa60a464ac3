"""Highlighting (plain-highlighter parity) — fragment spec v1.

Three layers of evidence:
- the Spark HOF expression == the pure-Python reference spec
  (``py_fragment``) on crafted edge cases AND real corpus docs;
- ``search_highlight`` is the plain ``search`` page + per-hit
  fragments (rank/score untouched);
- the DuckDB oracle (``oracle_sql_highlight``) reproduces the Spark
  result byte-for-byte on the corpus parquet (the same check the
  driver gate runs at sf0.01);
- federation: ``ShardedIndexReader.search_highlight`` == the union
  reader's.
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from tlhop_library_spark.analyzer import py_tokens
from tlhop_library_spark.index import IndexReader
from tlhop_library_spark.index.highlight import (
    fragment_col,
    highlight_hits,
    oracle_sql_highlight,
    py_fragment,
)

Q = "bace cada"


CASES = [
    # (text, query_terms, size, n_frags)
    ("the bace sat on the cada mat", ["bace", "cada"], 4, 1),
    ("bace bace bace unrelated words here cada", ["bace", "cada"], 3, 2),
    ("no match at all in this text", ["zzz"], 5, 1),
    ("", ["bace"], 5, 1),
    (None, ["bace"], 5, 1),
    # tie on score -> earliest anchor wins
    ("aaa bace xxx yyy cada bbb", ["bace", "cada"], 2, 1),
    # overlap suppression: two dense clusters closer than size
    ("bace cada bace zzz qqq bace cada", ["bace", "cada"], 4, 2),
    # window clipped at end of doc
    ("xxx yyy zzz bace", ["bace"], 6, 1),
    # accents + case through the analyzer
    ("Informação BACE segurança", ["bace", "informação"], 3, 1),
    # short tokens (<3 chars) are not tokens at all
    ("ab bace cd cada", ["bace", "cada"], 3, 1),
]


def test_fragment_col_matches_python_reference(spark):
    rows = [(i, t) for i, (t, _, _, _) in enumerate(CASES)]
    df = spark.createDataFrame(rows, "id long, text string")
    for i, (text, qterms, size, nf) in enumerate(CASES):
        got = (
            df.where(F.col("id") == i)
            .select(
                fragment_col(F.col("text"), qterms, size, nf).alias("f")
            )
            .collect()[0]["f"]
        )
        assert got == py_fragment(text, qterms, size, nf), (
            i,
            text,
            got,
        )


def test_fragment_col_on_corpus_docs_matches_python(spark, corpus_df):
    qterms = py_tokens(Q)
    sample = (
        corpus_df.where(F.lower(F.col("text")).contains("bace"))
        .orderBy("doc_id")
        .limit(20)
        .unionByName(corpus_df.orderBy("doc_id").limit(20))
    )
    got = sample.select(
        "doc_id",
        "text",
        fragment_col(F.col("text"), qterms, 8, 2).alias("f"),
    ).collect()
    assert any(r["f"] is not None for r in got)
    for r in got:
        assert r["f"] == py_fragment(r["text"], qterms, 8, 2), r["doc_id"]


def test_search_highlight_is_search_page_plus_fragments(
    spark, index_dir, corpus_df
):
    r = IndexReader(spark, index_dir)
    plain = r.search(Q, k=8).collect()
    hi = r.search_highlight(Q, corpus_df, k=8).orderBy("rank").collect()
    assert [(x["rank"], x["doc_id"], x["score"]) for x in hi] == [
        (x["rank"], x["doc_id"], x["score"]) for x in plain
    ]
    qterms = py_tokens(Q)
    texts = {
        x["doc_id"]: x["text"]
        for x in corpus_df.where(
            F.col("doc_id").isin([h["doc_id"] for h in hi])
        ).collect()
    }
    for h in hi:
        assert h["fragment"] == py_fragment(texts[h["doc_id"]], qterms)
        # every hit of an OR query contains >=1 query term -> non-NULL
        assert h["fragment"] is not None
        assert "<em>" in h["fragment"]


def test_highlight_duckdb_oracle_parity(spark, index_dir, corpus_path, corpus_df):
    r = IndexReader(spark, index_dir)
    got = [
        (x["rank"], x["doc_id"], x["score"], x["fragment"])
        for x in r.search_highlight(Q, corpus_df, k=10)
        .orderBy("rank")
        .collect()
    ]
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{corpus_path}'"
    )
    want = con.execute(oracle_sql_highlight(Q, k=10)).fetchall()
    assert got == [tuple(w) for w in want]


def test_highlight_federated_equals_union(spark, index_dir, corpus_df, tmp_path):
    from tlhop_library_spark.index.sharded import ShardedIndexReader

    half_a = corpus_df.where("doc_id % 2 = 0")
    half_b = corpus_df.where("doc_id % 2 = 1")
    from tlhop_library_spark.index.build import IndexBuilder

    da, db = str(tmp_path / "a"), str(tmp_path / "b")
    IndexBuilder(spark, da, n_buckets=4, n_ranges=4).build(half_a)
    IndexBuilder(spark, db, n_buckets=4, n_ranges=4).build(half_b)
    fed = ShardedIndexReader(spark, [da, db])
    union = IndexReader(spark, index_dir)
    got = [
        tuple(x)
        for x in fed.search_highlight(Q, corpus_df, k=6)
        .orderBy("rank")
        .collect()
    ]
    want = [
        tuple(x)
        for x in union.search_highlight(Q, corpus_df, k=6)
        .orderBy("rank")
        .collect()
    ]
    assert got == want


def test_highlight_no_python_udf_in_plan(spark, index_dir, corpus_df):
    """The fragment expression must stay JVM-side: the only Python in
    the plan is the index scorer's applyInPandas (FlatMapGroupsInPandas
    on the hit side), never a row-wise BatchEvalPython."""
    r = IndexReader(spark, index_dir)
    plan = (
        r.search_highlight(Q, corpus_df, k=5)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan


def test_fragment_rejects_bad_params(spark):
    with pytest.raises(ValueError):
        fragment_col(F.lit("x"), ["a"], 0, 1)
    with pytest.raises(ValueError):
        fragment_col(F.lit("x"), ["a"], 5, 0)


def test_highlight_hits_passthrough_columns(spark, corpus_df):
    hits = corpus_df.select("doc_id").limit(3)
    out = highlight_hits(hits, corpus_df, Q, 6, 1)
    assert set(out.columns) == {"doc_id", "fragment"}
