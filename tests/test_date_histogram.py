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
