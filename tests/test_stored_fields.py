"""Stored fields (Lucene DocValues analogue): metadata captured at
build time rides WITH the index, so sort/collapse/facet collectors
need no external docs table.

Identity web: every collector fed from stored_docs() must be
row-identical to the same collector fed from the original corpus
scan; appends extend the stored table batch-wise; guards fire on
missing fields / unstored indexes.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tlhop_library_spark.index import IndexReader
from tlhop_library_spark.index.build import IndexBuilder


@pytest.fixture(scope="module")
def stored_index(spark, corpus_df, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("stored") / "idx")
    IndexBuilder(
        spark, d, n_buckets=8, n_ranges=8,
        stored_fields=["lang", "url"],
    ).build(corpus_df)
    return d


def test_stored_docs_contents(spark, stored_index, corpus_df):
    r = IndexReader(spark, stored_index)
    got = {
        (x["doc_id"], x["lang"], x["url"])
        for x in r.stored_docs().collect()
    }
    want = {
        (x["doc_id"], x["lang"], x["url"])
        for x in corpus_df.where(F.col("text").isNotNull())
        .select("doc_id", "lang", "url")
        .collect()
    }
    assert got == want
    assert r.stats["stored_fields"] == ["lang", "url"]


def test_stored_collectors_identical_to_docs_table(
    spark, stored_index, corpus_df
):
    r = IndexReader(spark, stored_index)
    q = "bace cada"
    a = [tuple(x) for x in r.facet_counts(q, r.stored_docs(), "lang").collect()]
    b = [tuple(x) for x in r.facet_counts(q, corpus_df, "lang").collect()]
    assert a == b and a
    # n_chars is not stored on this index — derive a numeric sort key
    # from a stored column to exercise search_sorted_by end-to-end
    sd = r.stored_docs().withColumn("url_len", F.length("url"))
    cd = corpus_df.withColumn("url_len", F.length("url"))
    a = [tuple(x) for x in r.search_sorted_by(q, sd, "url_len", 10).collect()]
    b = [tuple(x) for x in r.search_sorted_by(q, cd, "url_len", 10).collect()]
    assert a == b and a
    a = [tuple(x) for x in r.search_collapse(q, sd, "lang", 5).collect()]
    b = [tuple(x) for x in r.search_collapse(q, cd, "lang", 5).collect()]
    assert a == b and a


def test_stored_fields_append_batches(spark, corpus_df, tmp_path):
    from tlhop_library_spark.index.append import add_documents

    d = str(tmp_path / "idx")
    lo = corpus_df.where(F.col("doc_id") < 400)
    hi = corpus_df.where(F.col("doc_id") >= 400)
    IndexBuilder(
        spark, d, n_buckets=8, n_ranges=8, stored_fields=["lang"]
    ).build(lo)
    add_documents(spark, d, hi)
    r = IndexReader(spark, d)
    got = {
        (x["doc_id"], x["lang"]) for x in r.stored_docs().collect()
    }
    want = {
        (x["doc_id"], x["lang"])
        for x in corpus_df.where(F.col("text").isNotNull())
        .select("doc_id", "lang")
        .collect()
    }
    assert got == want


def test_stored_fields_guards(spark, corpus_df, index_dir, tmp_path):
    from tlhop_library_spark.index.append import add_documents

    # unstored index → accessor refuses
    r = IndexReader(spark, index_dir)
    with pytest.raises(ValueError, match="without stored_fields"):
        r.stored_docs()
    # unknown column at build time
    with pytest.raises(ValueError, match="not in the input columns"):
        IndexBuilder(
            spark, str(tmp_path / "bad"), n_buckets=4, n_ranges=4,
            stored_fields=["nope"],
        ).build(corpus_df)
    # append batch missing a stored column
    d = str(tmp_path / "idx2")
    IndexBuilder(
        spark, d, n_buckets=4, n_ranges=4, stored_fields=["lang"]
    ).build(corpus_df.where(F.col("doc_id") < 100))
    with pytest.raises(ValueError, match="missing"):
        add_documents(
            spark, d,
            corpus_df.where(F.col("doc_id") >= 700).drop("lang"),
        )


def test_sharded_stored_docs_union(spark, corpus_df, tmp_path):
    from tlhop_library_spark.index import ShardedIndexReader

    dirs = []
    for i in range(2):
        d = str(tmp_path / f"s{i}")
        IndexBuilder(
            spark, d, n_buckets=4, n_ranges=4, stored_fields=["lang"]
        ).build(corpus_df.where(F.col("doc_id") % 2 == i))
        dirs.append(d)
    sh = ShardedIndexReader(spark, dirs)
    got = {(x["doc_id"], x["lang"]) for x in sh.stored_docs().collect()}
    want = {
        (x["doc_id"], x["lang"])
        for x in corpus_df.where(F.col("text").isNotNull())
        .select("doc_id", "lang")
        .collect()
    }
    assert got == want
    # mismatched stored schemas are a config error
    d2 = str(tmp_path / "nofields")
    IndexBuilder(spark, d2, n_buckets=4, n_ranges=4).build(
        corpus_df.where(F.col("doc_id") % 2 == 0)
    )
    bad = ShardedIndexReader(spark, [dirs[1], d2])
    with pytest.raises(ValueError, match="disagree"):
        bad.stored_docs()
