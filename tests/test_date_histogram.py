"""ES date_histogram aggregation over the matching set."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from tlhop_library_spark.index import IndexReader
from tlhop_library_spark.index.query import (
    date_histogram_hits,
    oracle_sql_date_histogram,
)

Q = "bace cada"


def test_date_histogram_duckdb_oracle(
    spark, index_dir, corpus_df, corpus_path
):
    r = IndexReader(spark, index_dir)
    got = [
        tuple(x)
        for x in r.facet_date_histogram(Q, corpus_df, "warc_ts", "day")
        .collect()
    ]
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{corpus_path}'"
    )
    want = con.execute(
        oracle_sql_date_histogram(Q, "warc_ts", "day")
    ).fetchall()
    assert got == [tuple(w) for w in want]
    assert got  # the corpus spans dates; buckets must exist


@pytest.mark.parametrize("interval", ["hour", "week", "month", "year"])
def test_date_histogram_intervals_agree_with_oracle(
    spark, index_dir, corpus_df, corpus_path, interval
):
    r = IndexReader(spark, index_dir)
    got = [
        tuple(x)
        for x in r.facet_date_histogram(
            Q, corpus_df, "warc_ts", interval
        ).collect()
    ]
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{corpus_path}'"
    )
    want = con.execute(
        oracle_sql_date_histogram(Q, "warc_ts", interval)
    ).fetchall()
    assert got == [tuple(w) for w in want]


def test_date_histogram_counts_cover_matching_set(
    spark, index_dir, corpus_df
):
    r = IndexReader(spark, index_dir)
    total = sum(
        x["n_docs"]
        for x in r.facet_date_histogram(
            Q, corpus_df, "warc_ts", "day"
        ).collect()
    )
    n_matching = r._matching_scores(Q).count()
    assert total == n_matching


def test_date_histogram_federated_equals_union(
    spark, index_dir, corpus_df, tmp_path
):
    from tlhop_library_spark.index.build import IndexBuilder
    from tlhop_library_spark.index.sharded import ShardedIndexReader

    da, db = str(tmp_path / "a"), str(tmp_path / "b")
    IndexBuilder(spark, da, n_buckets=4, n_ranges=4).build(
        corpus_df.where("doc_id % 2 = 0")
    )
    IndexBuilder(spark, db, n_buckets=4, n_ranges=4).build(
        corpus_df.where("doc_id % 2 = 1")
    )
    fed = ShardedIndexReader(spark, [da, db])
    union = IndexReader(spark, index_dir)
    got = [
        tuple(x)
        for x in fed.facet_date_histogram(
            Q, corpus_df, "warc_ts", "day"
        ).collect()
    ]
    want = [
        tuple(x)
        for x in union.facet_date_histogram(
            Q, corpus_df, "warc_ts", "day"
        ).collect()
    ]
    assert got == want


def test_date_histogram_rejects_bad_interval(spark, corpus_df):
    hits = corpus_df.select("doc_id").limit(1)
    with pytest.raises(ValueError):
        date_histogram_hits(hits, corpus_df, "warc_ts", "fortnight")


# ---------------------------------------------------------------------
# pipeline aggregations (round 5)
# ---------------------------------------------------------------------
def test_pipeline_aggs_hand_computed(spark, index_dir, corpus_df):
    """cumulative_sum / derivative / moving_avg / per_doc recomputed
    in python over the parent buckets."""
    r = IndexReader(spark, index_dir)
    docs = corpus_df.withColumn("n_chars", F.length("text").cast("long"))
    parent = {
        row["key"]: (row["n_docs"], None)
        for row in r.facet_date_histogram(
            Q, docs, "warc_ts", "day"
        ).collect()
    }
    rows = r.facet_pipeline(
        Q, docs, "warc_ts", "day", metric_field="n_chars", window=2
    ).collect()
    assert [x["key"] for x in rows] == sorted(parent)
    assert [x["n_docs"] for x in rows] == [
        parent[x["key"]][0] for x in rows
    ]
    cum = 0.0
    prev = None
    metrics = [x["metric"] for x in rows]
    for i, x in enumerate(rows):
        cum = round(cum + x["metric"], 4)
        assert x["cumulative_sum"] == cum
        if prev is None:
            assert x["derivative"] is None
        else:
            assert x["derivative"] == round(x["metric"] - prev, 4)
        prev = x["metric"]
        wnd = metrics[max(0, i - 1): i + 1]
        assert x["moving_avg"] == round(sum(wnd) / len(wnd), 4)
        assert x["per_doc"] == round(x["metric"] / x["n_docs"], 4)


def test_pipeline_selector_after_pipeline(spark, index_dir, corpus_df):
    """bucket_selector drops buckets AFTER the pipeline columns are
    computed: a surviving bucket keeps the cumulative/derivative
    values it had in the unfiltered list (ES execution order)."""
    r = IndexReader(spark, index_dir)
    docs = corpus_df.withColumn("n_chars", F.length("text").cast("long"))
    full = {
        x["key"]: tuple(x)
        for x in r.facet_pipeline(
            Q, docs, "warc_ts", "day", metric_field="n_chars"
        ).collect()
    }
    med = sorted(v[3] for v in full.values())[len(full) // 2]
    kept = r.facet_pipeline(
        Q, docs, "warc_ts", "day", metric_field="n_chars",
        min_metric=float(med),
    ).collect()
    assert 0 < len(kept) < len(full)
    for x in kept:
        assert tuple(x) == full[x["key"]]


def test_pipeline_bucket_sort(spark, index_dir, corpus_df):
    r = IndexReader(spark, index_dir)
    docs = corpus_df.withColumn("n_chars", F.length("text").cast("long"))
    total = len(
        r.facet_pipeline(
            Q, docs, "warc_ts", "day", metric_field="n_chars"
        ).collect()
    )
    rows = r.facet_pipeline(
        Q, docs, "warc_ts", "day", metric_field="n_chars",
        sort_by_metric=True, size=3,
    ).collect()
    assert len(rows) == min(3, total) and rows
    ms = [(x["metric"], x["key"]) for x in rows]
    assert ms == sorted(ms, key=lambda t: (-t[0], t[1]))


def test_pipeline_federated_equals_union(spark, index_dir, corpus_df, tmp_path):
    """Pipeline columns are computed on the MERGED bucket list — a
    per-shard cumulative sum would be wrong for buckets spanning
    shards; the federation must equal the union index exactly."""
    from tlhop_library_spark.index.build import IndexBuilder
    from tlhop_library_spark.index.sharded import ShardedIndexReader

    da, db = str(tmp_path / "a"), str(tmp_path / "b")
    IndexBuilder(spark, da, n_buckets=4, n_ranges=4).build(
        corpus_df.where("doc_id % 2 = 0")
    )
    IndexBuilder(spark, db, n_buckets=4, n_ranges=4).build(
        corpus_df.where("doc_id % 2 = 1")
    )
    docs = corpus_df.withColumn("n_chars", F.length("text").cast("long"))
    fed = ShardedIndexReader(spark, [da, db]).facet_pipeline(
        Q, docs, "warc_ts", "day", metric_field="n_chars", window=3
    )
    union = IndexReader(spark, index_dir).facet_pipeline(
        Q, docs, "warc_ts", "day", metric_field="n_chars", window=3
    )
    assert [tuple(x) for x in fed.collect()] == [
        tuple(x) for x in union.collect()
    ]


def test_pipeline_aggs_guards(spark, corpus_df):
    from tlhop_library_spark.index.query import pipeline_aggs_hits

    hits = corpus_df.select("doc_id").limit(1)
    with pytest.raises(ValueError):
        pipeline_aggs_hits(hits, corpus_df, "warc_ts", "fortnight")
    with pytest.raises(ValueError):
        pipeline_aggs_hits(hits, corpus_df, "warc_ts", "day", window=0)


def test_auto_date_histogram_picks_finest_fitting(spark, index_dir, corpus_df):
    """Ladder choice: with a huge budget the finest rung (hour) wins;
    with budget 1 it coarsens until the bucket list fits (or year)."""
    r = IndexReader(spark, index_dir)
    wide = r.facet_auto_date_histogram(
        Q, corpus_df, "warc_ts", max_buckets=10**6
    ).collect()
    assert wide and wide[0]["interval"] == "hour"
    hourly = r.facet_date_histogram(
        Q, corpus_df, "warc_ts", "hour"
    ).collect()
    assert [(x["key"], x["n_docs"]) for x in wide] == [
        (x["key"], x["n_docs"]) for x in hourly
    ]
    narrow = r.facet_auto_date_histogram(
        Q, corpus_df, "warc_ts", max_buckets=1
    ).collect()
    assert narrow and len(narrow) <= max(
        1, len(set(x["interval"] for x in narrow))
    ) * 10**6
    chosen = narrow[0]["interval"]
    n_at_chosen = len(
        r.facet_date_histogram(Q, corpus_df, "warc_ts", chosen).collect()
    )
    assert len(narrow) == n_at_chosen
    assert chosen == "year" or n_at_chosen <= 1


def test_auto_date_histogram_federated(spark, index_dir, corpus_df, tmp_path):
    from tlhop_library_spark.index.build import IndexBuilder
    from tlhop_library_spark.index.sharded import ShardedIndexReader

    da, db = str(tmp_path / "a"), str(tmp_path / "b")
    IndexBuilder(spark, da, n_buckets=4, n_ranges=4).build(
        corpus_df.where("doc_id % 2 = 0")
    )
    IndexBuilder(spark, db, n_buckets=4, n_ranges=4).build(
        corpus_df.where("doc_id % 2 = 1")
    )
    fed = ShardedIndexReader(spark, [da, db]).facet_auto_date_histogram(
        Q, corpus_df, "warc_ts", max_buckets=5
    )
    union = IndexReader(spark, index_dir).facet_auto_date_histogram(
        Q, corpus_df, "warc_ts", max_buckets=5
    )
    assert [tuple(x) for x in fed.collect()] == [
        tuple(x) for x in union.collect()
    ]


def test_auto_date_histogram_guard(spark, corpus_df):
    from tlhop_library_spark.index.query import (
        auto_date_histogram_hits,
    )

    with pytest.raises(ValueError):
        auto_date_histogram_hits(
            corpus_df.select("doc_id").limit(1), corpus_df,
            "warc_ts", max_buckets=0,
        )
