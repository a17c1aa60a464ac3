"""significant_terms (Elasticsearch significant_terms, JLH scoring).

Identity web: index-backed aggregation ≡ brute-force token-stream
reconstruction in Spark ≡ the DuckDB oracle; the query's own terms
are fully contained in their own matching set (fg_df == bg_df);
absent-term queries return empty; the
segment scan is pruned to hit ranges via a broadcast semi-join.
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from tlhop_library_spark.analyzer import tokens_col
from tlhop_library_spark.index.query import IndexReader

QUERY = "bace babi"


@pytest.fixture(scope="module")
def reader(spark, index_dir):
    return IndexReader(spark, index_dir)


def _rows(df):
    return [
        (r["rank"], r["term"], r["fg_df"], r["bg_df"], r["score"])
        for r in df.collect()
    ]


def _brute(corpus_df, query_terms, m=10, min_fg_df=2):
    """Token-stream reconstruction: same JLH spec, pure DataFrame."""
    tf = (
        corpus_df.where(F.col("text").isNotNull())
        .select("doc_id", F.explode(tokens_col(F.col("text"))).alias("t"))
        .groupBy("doc_id", "t")
        .count()
    )
    hits = (
        tf.where(F.col("t").isin(list(query_terms)))
        .select("doc_id")
        .distinct()
    )
    fg_n = hits.count()
    bg_n = (
        corpus_df.where(F.col("text").isNotNull()).count()
    )
    bg = tf.groupBy("t").agg(F.count("*").alias("bg_df"))
    fg = (
        tf.join(hits, "doc_id")
        .groupBy("t")
        .agg(F.count("*").alias("fg_df"))
    )
    out = (
        fg.join(bg, "t")
        .withColumn("fg_pct", F.col("fg_df") / F.lit(float(fg_n)))
        .withColumn("bg_pct", F.col("bg_df") / F.lit(float(bg_n)))
        .where(
            (F.col("fg_pct") > F.col("bg_pct"))
            & (F.col("fg_df") >= min_fg_df)
        )
        .withColumn(
            "score",
            F.round(
                (F.col("fg_pct") - F.col("bg_pct"))
                * (F.col("fg_pct") / F.col("bg_pct")),
                6,
            ),
        )
        .orderBy(F.desc("score"), F.asc("t"))
        .limit(m)
        .collect()
    )
    return [
        (i + 1, r["t"], r["fg_df"], r["bg_df"], r["score"])
        for i, r in enumerate(out)
    ]


def test_sig_terms_matches_brute_force(reader, corpus_df):
    out = _rows(reader.significant_terms(QUERY, m=10))
    assert out == _brute(corpus_df, ["bace", "babi"], m=10)


def test_sig_terms_matches_duckdb(reader, corpus_path):
    con = duckdb.connect()
    out = _rows(reader.significant_terms(QUERY, m=10))
    exp = con.execute(
        r"""
WITH tok AS (
  SELECT doc_id, unnest(list_filter(
    regexp_split_to_array(lower(text), '[^\p{L}\p{N}]+'),
    t -> length(t) >= 3)) AS term
  FROM read_parquet(?) WHERE text IS NOT NULL
), tf AS (SELECT doc_id, term FROM tok GROUP BY doc_id, term),
hits AS (SELECT DISTINCT doc_id FROM tf
         WHERE term IN ('bace', 'babi')),
fgn AS (SELECT count(*) AS fg_n FROM hits),
n AS (SELECT count(*) AS n FROM read_parquet(?) WHERE text IS NOT NULL),
bg AS (SELECT term, count(*) AS bg_df FROM tf GROUP BY term),
fg AS (SELECT t.term, count(*) AS fg_df
       FROM tf t JOIN hits h USING (doc_id) GROUP BY t.term)
SELECT CAST(row_number() OVER (ORDER BY score DESC, term ASC) AS INT)
       AS rank, term, fg_df, bg_df, score
FROM (
  SELECT fg.term, fg.fg_df, bg.bg_df,
    round(((CAST(fg.fg_df AS DOUBLE)/fg_n) - (CAST(bg.bg_df AS DOUBLE)/n.n))
        * ((CAST(fg.fg_df AS DOUBLE)/fg_n) / (CAST(bg.bg_df AS DOUBLE)/n.n)),
        6) AS score
  FROM fg JOIN bg USING (term), fgn, n
  WHERE (CAST(fg.fg_df AS DOUBLE)/fg_n) > (CAST(bg.bg_df AS DOUBLE)/n.n)
    AND fg.fg_df >= 2
) ORDER BY score DESC, term ASC LIMIT 10
""",
        [corpus_path, corpus_path],
    ).fetchall()
    assert out == [tuple(r) for r in exp]


def test_sig_terms_query_terms_present_and_contained(reader):
    """The query terms are fully contained in their own matching set
    (fg_df == bg_df), every reported fg_df ≤ bg_df, and the ranking
    is (score desc, term asc). (A co-occurring term can legitimately
    out-JLH the rarer query term — with fg == bg the JLH score grows
    with fg_df — so no stronger dominance claim holds.)"""
    out = _rows(reader.significant_terms(QUERY, m=10_000, min_fg_df=1))
    terms = {t: (fg, bg) for _, t, fg, bg, _ in out}
    assert "bace" in terms and "babi" in terms
    for t in ("bace", "babi"):
        fg, bg = terms[t]
        assert fg == bg
    for _, t, fg, bg, _ in out:
        assert fg <= bg
    keys = [(-s, t) for _, t, _, _, s in out]
    assert keys == sorted(keys)


def test_sig_terms_absent_and_guard(reader):
    assert reader.significant_terms("zzznope", m=10).count() == 0
    # a very high min_fg_df filters everything but the query terms
    out = _rows(reader.significant_terms(QUERY, m=10, min_fg_df=10**6))
    assert out == []


def test_sig_terms_hit_range_prune_plan(reader):
    """The full segment scan is semi-join-pruned to ranges containing
    a hit, and the prune side is broadcast (no corpus-sized shuffle
    to implement the filter)."""
    plan = (
        reader.significant_terms(QUERY, m=10)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan


def test_sharded_sig_terms_identical_to_single(
    spark, corpus_df, reader, tmp_path_factory
):
    """Federated significant_terms ≡ the single-index aggregation
    (fg partials and bg df are plain sums over disjoint shards)."""
    from pyspark.sql import functions as SF

    from tlhop_library_spark.index import ShardedIndexReader
    from tlhop_library_spark.index.build import IndexBuilder

    base = tmp_path_factory.mktemp("sigshards")
    dirs = []
    for i in range(2):
        d = str(base / f"s{i}")
        IndexBuilder(spark, d, n_buckets=4, n_ranges=4).build(
            corpus_df.where(SF.col("doc_id") % 2 == i)
        )
        dirs.append(d)
    sh = ShardedIndexReader(spark, dirs)
    for q in [QUERY, "bace"]:
        a = _rows(sh.significant_terms(q, m=10))
        b = _rows(reader.significant_terms(q, m=10))
        assert a == b and a, q
    assert sh.significant_terms("zzznope", m=5).count() == 0
