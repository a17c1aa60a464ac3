"""rank_eval (ES _rank_eval parity) — hand-computed fixtures + oracle."""

from __future__ import annotations

import math

import duckdb
import pytest

from tlhop_library_spark.operators.rank_eval import (
    oracle_sql_rank_eval,
    rank_eval,
    rank_eval_summary,
)


@pytest.fixture(scope="module")
def fixtures(spark):
    # query 1: ranks [d1(g2), d2(g0 unjudged), d3(g1)]
    # query 2: ranks [d9(g0 unjudged)], judged relevant {d5}  -> zeros
    # query 3: judged only (engine returned nothing)          -> zeros
    rankings = spark.createDataFrame(
        [(1, 1, 1), (1, 2, 2), (1, 3, 3), (2, 1, 9)],
        "query_id long, rank int, doc_id long",
    )
    judgments = spark.createDataFrame(
        [(1, 1, 2.0), (1, 3, 1.0), (1, 7, 3.0), (2, 5, 1.0),
         (3, 6, 2.0)],
        "query_id long, doc_id long, grade double",
    )
    return rankings, judgments


def test_rank_eval_hand_computed(spark, fixtures):
    rankings, judgments = fixtures
    rows = {
        r["query_id"]: r
        for r in rank_eval(rankings, judgments, k=3).collect()
    }
    assert set(rows) == {1, 2, 3}
    r1 = rows[1]
    assert r1["precision_at_k"] == round(2 / 3, 4)
    assert r1["recall_at_k"] == round(2 / 3, 4)  # 2 of 3 judged found
    assert r1["mrr"] == 1.0
    dcg = (2**2 - 1) / math.log2(2) + (2**1 - 1) / math.log2(4)
    idcg = (2**3 - 1) / math.log2(2) + (2**2 - 1) / math.log2(
        3
    ) + (2**1 - 1) / math.log2(4)
    assert r1["ndcg_at_k"] == round(dcg / idcg, 4)
    for qid in (2, 3):
        r = rows[qid]
        assert (
            r["precision_at_k"], r["recall_at_k"], r["mrr"],
            r["ndcg_at_k"],
        ) == (0.0, 0.0, 0.0, 0.0)


def test_rank_eval_duckdb_oracle(spark, fixtures):
    rankings, judgments = fixtures
    got = [tuple(r) for r in rank_eval(rankings, judgments, 3).collect()]
    con = duckdb.connect()
    con.register("rk", rankings.toPandas())
    con.register("jd", judgments.toPandas())
    want = con.execute(
        oracle_sql_rank_eval("SELECT * FROM rk", "SELECT * FROM jd", 3)
    ).fetchall()
    assert got == [tuple(w) for w in want]


def test_rank_eval_summary_is_macro_average(spark, fixtures):
    rankings, judgments = fixtures
    per = rank_eval(rankings, judgments, 3).collect()
    s = rank_eval_summary(rankings, judgments, 3).collect()[0]
    assert s["n_queries"] == 3
    for m in ("precision_at_k", "recall_at_k", "mrr", "ndcg_at_k"):
        assert s[m] == round(
            sum(r[m] for r in per) / len(per), 4
        )


def test_rank_eval_perfect_ranking_is_all_ones(spark):
    rankings = spark.createDataFrame(
        [(1, 1, 10), (1, 2, 20)], "query_id long, rank int, doc_id long"
    )
    judgments = spark.createDataFrame(
        [(1, 10, 3.0), (1, 20, 1.0)],
        "query_id long, doc_id long, grade double",
    )
    r = rank_eval(rankings, judgments, k=2).collect()[0]
    assert (
        r["precision_at_k"], r["recall_at_k"], r["mrr"], r["ndcg_at_k"]
    ) == (1.0, 1.0, 1.0, 1.0)


def test_rank_eval_rejects_bad_k(spark, fixtures):
    rankings, judgments = fixtures
    with pytest.raises(ValueError):
        rank_eval(rankings, judgments, 0)


def test_bm25_self_eval_matches_naive_composition(spark):
    """The single-tokenize-pass pipeline must equal the naive
    composition (score_exhaustive per query + a judgments scan per
    query) row for row."""
    import os

    from pyspark.sql import functions as F

    from tlhop_library_spark.analyzer import py_tokens, tokens_col
    from tlhop_library_spark.index.query import score_exhaustive
    from tlhop_library_spark.operators.rank_eval import bm25_self_eval

    sf = os.environ.get("SPARK_GRAFT_SF_DIR_TEST", "/root/testdata/sf0.001")
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    queries = [(1, "spark join filter"), (2, "hash scan join")]
    rankings, judgments = None, None
    for qid, qtext in queries:
        rk = score_exhaustive(docs, qtext, k=10).select(
            F.lit(qid).cast("long").alias("query_id"), "rank", "doc_id"
        )
        terms = sorted(set(py_tokens(qtext)))
        jd = (
            docs.where(F.col("text").isNotNull())
            .select(
                F.lit(qid).cast("long").alias("query_id"),
                "doc_id",
                F.size(
                    F.array_intersect(
                        F.array_distinct(tokens_col(F.col("text"))),
                        F.array(*[F.lit(t) for t in terms]),
                    )
                ).cast("double").alias("grade"),
            )
            .where(F.col("grade") > 0)
        )
        rankings = rk if rankings is None else rankings.unionByName(rk)
        judgments = jd if judgments is None else judgments.unionByName(jd)
    naive = [tuple(r) for r in rank_eval(rankings, judgments, k=10).collect()]
    fused = [tuple(r) for r in bm25_self_eval(docs, queries, k=10).collect()]
    assert fused == naive and len(fused) == 2
