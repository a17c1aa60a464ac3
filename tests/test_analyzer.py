"""Analyzer v1 parity: Spark JVM expr == pure-Python == DuckDB SQL."""

import duckdb
import pandas as pd
from pyspark.sql import functions as F

from tlhop_library_spark.analyzer import (
    py_tokens,
    sql_tokens_duckdb,
    tokens_col,
)

CASES = [
    "Hello, Wörld ação x ab abc 123 a1b2c3",
    "",
    "   ",
    "under_score-dash.dot",
    "UPPER lower MiXeD",
    "ação coração informação",
    "a b c dd eee ffff",
    "tabs\tand\nnewlines  spaces",
    "número três çedilha ÀÉÎÕÜ",
]


def test_spark_vs_python(spark):
    df = spark.createDataFrame(pd.DataFrame({"text": CASES}))
    got = df.select(tokens_col(F.col("text")).alias("t")).collect()
    for row, case in zip(got, CASES):
        assert row["t"] == py_tokens(case), case


def test_duckdb_vs_python():
    for case in CASES:
        con = duckdb.connect()
        con.execute("create table t as select ? as text", [case])
        got = con.execute(
            f"select {sql_tokens_duckdb('text')} from t"
        ).fetchone()[0]
        assert got == py_tokens(case), case


def test_null_text(spark):
    df = spark.createDataFrame(pd.DataFrame({"text": pd.array([None], dtype="string")}))
    got = df.select(tokens_col(F.col("text")).alias("t")).collect()[0]["t"]
    assert got is None or got == []
    assert py_tokens(None) == []
