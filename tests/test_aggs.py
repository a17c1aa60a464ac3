"""ES ``stats``/``extended_stats`` and ``composite`` (paginated terms)
aggregations over the matching set — brute-force identity, pagination
tiling, sargable-resume pushdown, and sharded federation identity."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

Q = "informação segurança"


@pytest.fixture(scope="module")
def reader(spark, index_dir):
    from tlhop_library_spark.index.query import IndexReader

    return IndexReader(spark, index_dir)


@pytest.fixture(scope="module")
def docs(corpus_df):
    # the corpus table has no numeric metadata column — derive one
    return corpus_df.withColumn(
        "n_chars", F.length("text").cast("long")
    )


def _matching_vals(reader, docs, field):
    hits = {r["doc_id"] for r in reader._matching_scores(Q).collect()}
    assert hits, "weak fixture: query matches nothing"
    return [
        r[field]
        for r in docs.where(
            F.col("doc_id").isin(list(hits)) & F.col(field).isNotNull()
        ).collect()
    ]


def test_extended_stats_matches_bruteforce(reader, docs):
    vals = _matching_vals(reader, docs, "n_chars")
    got = reader.facet_stats(
        Q, docs, "n_chars", extended=True
    ).collect()[0]
    n = len(vals)
    s = float(sum(vals))
    ss = float(sum(v * v for v in vals))
    mean = s / n
    var = ss / n - mean * mean
    assert got["cnt"] == n
    assert got["min_v"] == float(min(vals))
    assert got["max_v"] == float(max(vals))
    assert got["sum_v"] == s
    assert got["avg_v"] == round(mean, 4)
    assert got["sum_sq"] == ss
    assert got["variance"] == round(var, 4)
    assert got["std_dev"] == round(math.sqrt(max(var, 0.0)), 4)


def test_plain_stats_column_contract(reader, docs):
    df = reader.facet_stats(Q, docs, "n_chars")
    assert df.columns == ["cnt", "min_v", "max_v", "sum_v", "avg_v"]


def test_stats_empty_matching_set(reader, docs):
    got = reader.facet_stats(
        "zzznope", docs, "n_chars", extended=True
    ).collect()[0]
    assert got["cnt"] == 0
    assert got["min_v"] is None and got["sum_v"] is None


def test_composite_pages_tile_full_bucket_list(reader, docs):
    """Walking pages with after=last key reconstructs the full
    key-ascending bucket list exactly once each (ES composite
    pagination contract), and counts match brute force."""
    vals = _matching_vals(reader, docs, "lang")
    want = {}
    for v in vals:
        want[v] = want.get(v, 0) + 1
    pages, after = [], None
    for _ in range(50):
        rows = reader.facet_composite(
            Q, docs, "lang", size=2, after=after
        ).orderBy("rank").collect()
        if not rows:
            break
        assert [r["rank"] for r in rows] == list(range(1, len(rows) + 1))
        pages.extend((r["key"], r["n_docs"]) for r in rows)
        after = rows[-1]["key"]
    assert pages == sorted(want.items())


def test_composite_after_is_sargable(reader, docs):
    """The resume predicate must reach the docs parquet scan as a
    pushed filter — deep pages never aggregate skipped buckets."""
    plan = reader.facet_composite(
        Q, docs, "lang", size=2, after="de"
    )._jdf.queryExecution().executedPlan().toString()
    assert "GreaterThan(lang,de)" in plan, plan


def test_sharded_stats_and_composite_identical(
    spark, corpus_df, docs, reader, tmp_path_factory
):
    from tlhop_library_spark.index import ShardedIndexReader
    from tlhop_library_spark.index.build import IndexBuilder

    base = tmp_path_factory.mktemp("agg_shards")
    dirs = []
    for i, (nb, nr) in enumerate([(4, 4), (8, 2)]):
        d = str(base / f"shard{i}")
        part = corpus_df.where(F.col("doc_id") % 2 == i)
        IndexBuilder(
            spark, d, n_buckets=nb, n_ranges=nr, n_jobs=2
        ).build(part)
        dirs.append(d)
    sharded = ShardedIndexReader(spark, dirs)

    single = reader.facet_stats(
        Q, docs, "n_chars", extended=True
    ).collect()
    fed = sharded.facet_stats(
        Q, docs, "n_chars", extended=True
    ).collect()
    assert [tuple(r) for r in fed] == [tuple(r) for r in single]

    single_c = reader.facet_composite(
        Q, docs, "lang", size=3, after="de"
    ).orderBy("rank").collect()
    fed_c = sharded.facet_composite(
        Q, docs, "lang", size=3, after="de"
    ).orderBy("rank").collect()
    assert [tuple(r) for r in fed_c] == [tuple(r) for r in single_c]
    assert single_c, "weak fixture: page empty"
