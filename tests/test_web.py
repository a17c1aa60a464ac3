"""URL/domain web-curation operators: semantics, cross-engine oracle
parity (the gate contract), and plan shape (no shuffle on the row-local
paths, broadcast on the blocklist join)."""

import duckdb
import pytest
from pyspark.sql import functions as F

from tlhop_library_spark.operators import web
from tlhop_library_spark.operators.corpus_stats import (
    kmv_distinct, sql_kmv_hash, sql_strata_hash,
)
from tlhop_library_spark.operators.cleaning import redact_pii, sql_redact_pii

URLS = [
    "HTTP://WWW.Site1.CO.UK:80/a/b?utm_source=x&id=3&utm_campaign=y#frag",
    "https://blog.example.com:443/",
    "https://shop.example.com.au/p/9?gclid=abc",
    "http://site2.io:8080",
    "https://www.example.org/path/?id=1&ref2=keep",
    "https://10.0.0.1/x?fbclid=1&a=2",
    "https://single/x",
    "https://a.b.c.co.jp/d?utm_=1",
    "https://www.example.org/path/?utm_source=a&id=1",
]


@pytest.fixture(scope="module")
def urls_df(spark):
    return spark.createDataFrame(
        [(i, u) for i, u in enumerate(URLS)], "doc_id bigint, url string"
    )


def test_normalize_url_semantics(urls_df):
    got = {
        r.doc_id: r.n
        for r in urls_df.select(
            "doc_id", web.normalize_url(F.col("url")).alias("n")
        ).collect()
    }
    assert got[0] == "http://site1.co.uk/a/b?id=3"
    assert got[1] == "https://blog.example.com/"
    assert got[2] == "https://shop.example.com.au/p/9"
    assert got[3] == "http://site2.io:8080/"  # non-default port kept
    assert got[4] == "https://example.org/path/?id=1&ref2=keep"
    assert got[5] == "https://10.0.0.1/x?a=2"
    # two tracking-variant urls of the same page normalize identically
    assert got[8] == "https://example.org/path/?id=1"


def test_registered_domain_and_ip_passthrough(urls_df):
    feat = web.with_url_features(urls_df)
    got = {r.doc_id: r.domain for r in feat.collect()}
    assert got[0] == "site1.co.uk"      # two-level public suffix
    assert got[1] == "example.com"
    assert got[2] == "example.com.au"
    assert got[5] == "10.0.0.1"         # IPv4 literal verbatim
    assert got[6] == "single"           # single label
    assert got[7] == "c.co.jp"


def test_cross_engine_url_parity(urls_df):
    """The gate contract: DuckDB running sql_url_norm/sql_host/
    sql_registered_domain must reproduce the Spark columns exactly."""
    sp = (
        web.with_url_features(urls_df)
        .select("doc_id", "url_norm", "host", "domain")
        .orderBy("doc_id")
        .collect()
    )
    con = duckdb.connect()
    vals = ",".join(f"({i}, '{u}')" for i, u in enumerate(URLS))
    con.execute(f"CREATE TABLE t AS SELECT * FROM (VALUES {vals}) v(doc_id, url)")
    host = web.sql_host("url")
    dk = con.execute(
        f"SELECT doc_id, {web.sql_url_norm('url')}, {host}, "
        f"{web.sql_registered_domain(host)} FROM t ORDER BY doc_id"
    ).fetchall()
    for s, d in zip(sp, dk):
        assert (s.url_norm, s.host, s.domain) == (d[1], d[2], d[3])


def test_url_dedup_merges_tracking_variants(spark):
    rows = [
        (1, "https://www.ex.com/p?utm_source=a"),
        (2, "https://ex.com/p"),
        (3, "HTTPS://EX.COM:443/p#x"),
        (4, "https://ex.com/q"),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, url string")
    got = {r.url_norm: (r.doc_id, r.n_variants)
           for r in web.url_dedup(df).collect()}
    assert got["https://ex.com/p"] == (1, 3)
    assert got["https://ex.com/q"] == (4, 1)


def test_domain_topk_and_stats(spark):
    rows = [(i, f"https://d{i % 3}.com/p/{i}", 100 + i)
            for i in range(30)]
    df = spark.createDataFrame(rows, "doc_id bigint, url string, n_chars bigint")
    top = web.domain_topk(df, k=2).collect()
    assert [r.domain for r in top] == ["d0.com", "d1.com"]
    assert top[0].n_docs == 10 and top[0].rank == 1


def test_blocklist_filter_broadcast_plan(spark):
    rows = [(i, f"https://d{i % 3}.com/p/{i}") for i in range(12)]
    df = spark.createDataFrame(rows, "doc_id bigint, url string")
    blocked = spark.createDataFrame([("d1.com",)], "domain string")
    out = web.blocklist_filter(df, blocked)
    assert out.count() == 8
    assert all(r.domain != "d1.com" for r in out.collect())
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan


def test_normalize_is_pure_projection(urls_df):
    """Row-local ops must not shuffle: no Exchange in the plan."""
    out = web.with_url_features(urls_df)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_temperature_sample_levels_head_domain(spark):
    # domain d0 has 1000 docs, d1 has 10 → alpha=0 keeps ~10 of d0
    rows = [(i, "https://d0.com/p/%d" % i) for i in range(1000)]
    rows += [(1000 + i, "https://d1.com/p/%d" % i) for i in range(10)]
    df = spark.createDataFrame(rows, "doc_id bigint, url string")
    kept = web.domain_temperature_sample(df, alpha=0.0)
    counts = {r.domain: r.c for r in
              kept.groupBy("domain").agg(F.count("*").alias("c")).collect()}
    assert counts["d1.com"] == 10
    assert 3 <= counts["d0.com"] <= 30  # ~10 expected, md5-binomial
    # alpha=1 keeps everything
    assert web.domain_temperature_sample(df, alpha=1.0).count() == 1010


def test_temperature_sample_cross_engine(spark):
    rows = [(i, f"https://d{int((i % 529) ** 0.5)}.com/p/{i}")
            for i in range(600)]
    df = spark.createDataFrame(rows, "doc_id bigint, url string")
    sp = sorted(
        r.doc_id
        for r in web.domain_temperature_sample(df, alpha=0.5).collect()
    )
    con = duckdb.connect()
    vals = ",".join(f"({i}, '{u}')" for i, u in rows)
    con.execute(f"CREATE TABLE t AS SELECT * FROM (VALUES {vals}) v(doc_id, url)")
    dom = web.sql_registered_domain(web.sql_host("url"))
    q = f"""WITH feat AS (SELECT doc_id, {dom} AS domain FROM t),
        c AS (SELECT domain, count(*) AS c_d FROM feat GROUP BY domain),
        m AS (SELECT min(c_d) AS c_min FROM c),
        p AS (SELECT domain, CAST(round(power(c_min::DOUBLE / c_d, 0.5)
              * 10000) AS INT) AS thresh FROM c, m)
        SELECT f.doc_id FROM feat f JOIN p USING (domain)
        WHERE {sql_strata_hash('f.domain', 'f.doc_id')} < p.thresh"""
    dk = sorted(r[0] for r in con.execute(q).fetchall())
    assert sp == dk and 0 < len(sp) < 600


def test_kmv_distinct_exact_below_k(spark):
    df = spark.createDataFrame([(f"w{i}",) for i in range(20)], "w string")
    row = kmv_distinct(df, "w", k=64).collect()[0]
    assert row.kmv_estimate == 20.0 and row.k_used == 20


def test_kmv_distinct_estimate_and_oracle(spark):
    vals = [f"term{i % 311}" for i in range(1500)]
    df = spark.createDataFrame([(v,) for v in vals], "w string")
    row = kmv_distinct(df, "w", k=64).collect()[0]
    assert abs(row.kmv_estimate - 311) / 311 < 0.25  # sketch tolerance
    con = duckdb.connect()
    uniq = ",".join(f"('{v}')" for v in sorted(set(vals)))
    con.execute(f"CREATE TABLE t AS SELECT * FROM (VALUES {uniq}) v(w)")
    h = sql_kmv_hash("w")
    d = con.execute(
        f"""WITH hs AS (SELECT DISTINCT {h} AS h FROM t WHERE {h} > 0),
        sm AS (SELECT h FROM hs ORDER BY h LIMIT 64)
        SELECT CASE WHEN count(*) < 64 THEN count(*)::DOUBLE
        ELSE round(63.0 / max(h), 4) END, count(*) FROM sm"""
    ).fetchall()[0]
    assert (row.kmv_estimate, row.k_used) == d


def test_redact_pii_semantics_and_oracle(spark):
    texts = [
        "mail a.b+c@Ex-ample.co.uk or 192.168.0.1 now +4915112345678",
        "no pii 1.2.3 and user@@x",
        "ip 10.0.0.255. end a@b.io",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "id int, text string"
    )
    sp = redact_pii(df).orderBy("id").collect()
    assert sp[0].n_emails == 1 and sp[0].n_ips == 1 and sp[0].n_phones == 1
    assert "<EMAIL>" in sp[0].text_redacted
    assert sp[1].n_emails == 0 and sp[1].n_ips == 0
    con = duckdb.connect()
    vals = ",".join(f"({i}, '{t}')" for i, t in enumerate(texts))
    con.execute(f"CREATE TABLE t AS SELECT * FROM (VALUES {vals}) v(id, text)")
    cols = sql_redact_pii("text")
    dk = con.execute(
        f"SELECT id, {cols['n_emails']}, {cols['n_ips']}, "
        f"{cols['n_phones']}, {cols['text_redacted']} FROM t ORDER BY id"
    ).fetchall()
    for s, d in zip(sp, dk):
        assert (s.n_emails, s.n_ips, s.n_phones, s.text_redacted) == d[1:]


def test_redact_is_pure_projection(spark):
    df = spark.createDataFrame([(1, "x")], "id int, text string")
    plan = redact_pii(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
