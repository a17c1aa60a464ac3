"""Schema registry, string functions, and prefix-match join tests."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from tlhop_library_spark.functions import strings as S
from tlhop_library_spark.operators.relational import prefix_match_join
from tlhop_library_spark.schemas import SchemaRegistry


def test_schema_registry_roundtrip(spark, tmp_path):
    reg = SchemaRegistry(str(tmp_path / "schemas"))
    df = spark.createDataFrame(
        [(1, '{"a": 5, "b": {"c": "x"}}'), (2, None)], "id int, payload string"
    )
    reg.infer_and_register(df, "payload")
    assert "payload" in reg.names()
    parsed = reg.parse_column(df, "payload")
    row = parsed.where(F.col("id") == 1).collect()[0]["payload"]
    assert row["a"] == 5 and row["b"]["c"] == "x"
    back = reg.stringify_column(parsed, "payload")
    assert back.schema["payload"].dataType.simpleString() == "string"


def test_prefix_match_join(spark):
    facts = spark.createDataFrame(
        [("cpe:2.3:a:apache:http_server:2.4",),
         ("cpe:2.3:a:nginx:nginx:1.2",)],
        "cpe string",
    )
    pats = spark.createDataFrame(
        [("cpe:2.3:a:apache", 9.8), ("cpe:2.3:a:nginx:nginx", 5.0),
         ("cpe:2.3:o:linux", 3.3)],
        "pattern string, score double",
    )
    out = prefix_match_join(facts, "cpe", pats, "pattern").collect()
    got = sorted((r["cpe"].split(":")[3], r["score"]) for r in out)
    assert got == [("apache", 9.8), ("nginx", 5.0)]


def test_http_status_and_lang_attr(spark):
    df = spark.createDataFrame(
        [("HTTP/1.1 404 Not Found\nServer: x",
          '<html lang="pt-BR"><body>x</body></html>')],
        "banner string, html string",
    )
    row = df.select(
        S.http_status_code(F.col("banner")).alias("code"),
        S.html_lang_attr(F.col("html")).alias("lang"),
    ).collect()[0]
    assert row["code"] == "404"
    assert row["lang"] == "pt-BR"


def test_normalize_lang_code(spark):
    df = spark.createDataFrame(
        [('"PT_br"',), ("en",), ("xx",), (None,)], "lang string"
    )
    got = [
        r["n"]
        for r in df.select(
            S.normalize_lang_code(F.col("lang")).alias("n")
        ).collect()
    ]
    assert got == ["Portuguese", "English", None, None]


def test_clean_string_pipeline(spark):
    df = spark.createDataFrame(
        [("CoraÃ§Ã£o  & Informação-LTDA!",), (None,)], "s string"
    )
    got = [
        r["c"]
        for r in df.select(S.clean_string(F.col("s")).alias("c")).collect()
    ]
    assert got[0] == "CORACAO INFORMACAO LTDA"
    assert got[1] is None


def test_normalize_string_nfkd(spark):
    df = spark.createDataFrame([("ação É ü",)], "s string")
    got = df.select(S.normalize_string(F.col("s")).alias("n")).collect()[0]["n"]
    assert got == "acao E u"


def test_check_unicode_symbols(spark):
    df = spark.createDataFrame([("abc",), ("aéb☃",)], "s string")
    got = [
        r["u"]
        for r in df.select(
            S.check_unicode_symbols(F.col("s")).alias("u")
        ).collect()
    ]
    assert got[0] is None
    assert set(got[1]) == {"é", "☃"}


def test_ip_subnet_and_json(spark):
    df = spark.createDataFrame(
        [("10.1.2.3", '{"k": 7, "z": [1]}')], "ip string, j string"
    )
    row = df.select(
        S.ip_to_subnet24(F.col("ip")).alias("net"),
        S.json_field(F.col("j"), "k").alias("k"),
        S.json_keys(F.col("j")).alias("keys"),
    ).collect()[0]
    assert row["net"] == "10.1.2.0/24"
    assert row["k"] == "7"
    assert row["keys"] == ["k", "z"]


def test_bucket_score(spark):
    df = spark.createDataFrame(
        [(0.95,), (0.5,), (0.05,), (None,)], "s double"
    )
    got = [
        r["b"]
        for r in df.select(S.bucket_score(F.col("s")).alias("b")).collect()
    ]
    assert got == ["0.9-1.0", "0.5-0.6", "0.0-0.1", None]


def test_markdown_summary(spark):
    df = spark.createDataFrame([(1, None)], "a int, b string")
    got = df.select(
        S.markdown_summary({"a": F.col("a"), "b": F.col("b")}).alias("md")
    ).collect()[0]["md"]
    assert got == "**a**: 1\n**b**: -\n"


def test_truncate_preview(spark):
    df = spark.createDataFrame([("x" * 1000,)], "s string")
    got = df.select(S.truncate_preview(F.col("s")).alias("t")).collect()[0]["t"]
    assert len(got) == 500


def test_asof_join_semantics(spark):
    from tlhop_library_spark.operators.relational import asof_join

    facts = spark.createDataFrame(
        [(1, 10, 100.0), (1, 20, 200.0), (2, 5, 50.0)],
        "k int, ts int, fval double",
    )
    dim = spark.createDataFrame(
        [(1, 10, "a"), (1, 15, "b"), (2, 9, "c")],
        "k int, ts int, state string",
    )
    out = {
        (r["k"], r["ts"]): r["state"]
        for r in asof_join(facts, dim, "k", "ts", ["state"]).collect()
    }
    assert out[(1, 10)] == "a"   # same-instant dim visible (tie rule)
    assert out[(1, 20)] == "b"   # latest dim <= ts
    assert out[(2, 5)] is None   # no dim yet -> NULL
