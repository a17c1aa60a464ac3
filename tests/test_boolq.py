"""Boolean (AND/OR/NOT) and metadata-filtered retrieval.

Identity web: indexed search_boolean ≡ declarative boolean_exhaustive
≡ the DuckDB oracle on the same parquet, across operator shapes
(nesting, negation, absent terms, implicit OR); search_filtered ≡
filter-the-full-ranking (search with k = corpus size).
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from tlhop_library_spark.index.boolq import (
    boolean_exhaustive,
    compile_query,
    oracle_sql_boolean,
    parse_query,
    to_nnf,
)
from tlhop_library_spark.index.query import IndexReader


# ---------------------------------------------------------------------
# parser (no spark)
# ---------------------------------------------------------------------
def test_parse_shapes():
    assert parse_query("bace") == ("term", "bace")
    assert parse_query("bace AND cada") == (
        "and", [("term", "bace"), ("term", "cada")]
    )
    # implicit adjacency = OR, explicit OR identical
    assert parse_query("bace cada") == parse_query("bace OR cada")
    # precedence: AND binds tighter than OR
    assert parse_query("a1x OR b1x AND c1x") == (
        "or", [("term", "a1x"), ("and", [("term", "b1x"), ("term", "c1x")])]
    )
    # parens override
    assert parse_query("(a1x OR b1x) AND c1x") == (
        "and", [("or", [("term", "a1x"), ("term", "b1x")]), ("term", "c1x")]
    )
    # lowercase operators are terms
    assert parse_query("bace and cada") == (
        "or", [("term", "bace"), ("term", "and"), ("term", "cada")]
    )


def test_parse_analysis():
    # analyzer splits hyphenated words -> AND of the tokens
    assert parse_query("state-of-the-art") == (
        "and",
        [("term", "state"), ("term", "the"), ("term", "art")],
    )
    # sub-min-length word is a never-matching atom
    assert parse_query("ab") == ("false",)


def test_parse_errors():
    for bad in ["", "AND", "bace AND", "(bace", "bace)", "NOT"]:
        with pytest.raises(ValueError):
            parse_query(bad)


def test_nnf_demorgan():
    assert to_nnf(parse_query("NOT (bace AND cada)")) == (
        "or", [("notterm", "bace"), ("notterm", "cada")]
    )
    assert to_nnf(parse_query("NOT (bace OR NOT cada)")) == (
        "and", [("notterm", "bace"), ("term", "cada")]
    )


def test_pure_negative_rejected():
    for q in ["NOT bace", "bace OR NOT cada", "NOT (bace AND cada)",
              "NOT ab"]:
        with pytest.raises(ValueError):
            compile_query(q)
    # bounded forms of the same atoms are fine
    for q in ["bace AND NOT cada", "NOT cada AND bace",
              "(bace OR cada) AND NOT tesa"]:
        compile_query(q)


# ---------------------------------------------------------------------
# engine identity
# ---------------------------------------------------------------------
BOOL_QUERIES = [
    "bace AND cada",
    "bace OR cada",
    "bace cada tesa",                       # implicit OR chain
    "bace AND NOT cada",
    "(bace OR cada) AND NOT (tesa OR dadu)",
    "NOT bace AND cada",
    "informação AND NOT zzznope",           # absent negated term
    "zzznope OR bace",                      # absent positive term
    "(bace AND cada) OR (tesa AND dadu)",
]


@pytest.fixture(scope="module")
def reader(spark, index_dir):
    return IndexReader(spark, index_dir)


def _rows(df):
    return [(r["rank"], r["doc_id"], r["score"]) for r in df.collect()]


def test_boolean_indexed_matches_exhaustive(reader, corpus_df):
    for q in BOOL_QUERIES:
        ix = _rows(reader.search_boolean(q, 10))
        ex = _rows(boolean_exhaustive(corpus_df, q, 10))
        assert ix == ex, q


def test_boolean_matches_duckdb(reader, corpus_path):
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{corpus_path}'"
    )
    for q in BOOL_QUERIES:
        got = _rows(reader.search_boolean(q, 10))
        want = [
            (r[0], r[1], r[2])
            for r in con.execute(oracle_sql_boolean(q, 10)).fetchall()
        ]
        assert got == want, q


def test_boolean_reduces_to_and_and_or(reader):
    assert _rows(reader.search_boolean("bace AND cada", 10)) == _rows(
        reader.search_and("bace cada", 10)
    )
    assert _rows(reader.search_boolean("bace OR cada", 10)) == _rows(
        reader.search("bace cada", 10)
    )


def test_boolean_not_excludes(reader, spark):
    with_not = {
        r[1] for r in _rows(reader.search_boolean("bace AND NOT cada", 50))
    }
    cada_docs = {
        r[1] for r in _rows(reader.search_boolean("bace AND cada", 1000))
    }
    assert with_not and not (with_not & cada_docs)


def test_boolean_pure_negative_raises(reader):
    with pytest.raises(ValueError):
        reader.search_boolean("NOT bace", 10)


# ---------------------------------------------------------------------
# filtered search
# ---------------------------------------------------------------------
def test_filtered_equals_filtered_full_ranking(reader, corpus_df):
    allowed = corpus_df.where(F.col("doc_id") % 3 == 0)
    got = _rows(reader.search_filtered("bace cada", allowed, 10))
    full = _rows(reader.search("bace cada", 10**6))
    ids = {r["doc_id"] for r in allowed.select("doc_id").collect()}
    keep = [(d, s) for _, d, s in full if d in ids][:10]
    want = [(i + 1, d, s) for i, (d, s) in enumerate(keep)]
    assert got == want
    assert got  # non-trivial


def test_filtered_with_all_docs_is_plain_search(reader, corpus_df):
    got = _rows(reader.search_filtered("bace cada", corpus_df, 10))
    assert got == _rows(reader.search("bace cada", 10))


def test_filtered_empty_allowlist(reader, corpus_df):
    got = _rows(
        reader.search_filtered(
            "bace cada", corpus_df.where(F.lit(False)), 10
        )
    )
    assert got == []
