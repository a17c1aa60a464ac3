"""Offline range-merge optimize (index/merge.py): the merged index
must be search-identical to its source with ~factor× fewer chunks."""

import pytest
from pyspark.sql import functions as F

from tlhop_library_spark.index.merge import merge_index_ranges
from tlhop_library_spark.index.query import IndexReader

QUERIES = ["bace cada", "informação segurança", "tesa", "dadu cadi bace"]


@pytest.fixture(scope="module")
def merged_dir(spark, index_dir, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("merged") / "idx")
    stats = merge_index_ranges(spark, index_dir, out, factor=4)
    assert stats["merge_factor"] == 4
    return out


def test_merged_search_rank_identical(spark, index_dir, merged_dir):
    src = IndexReader(spark, index_dir)
    dst = IndexReader(spark, merged_dir)
    for q in QUERIES:
        for mode in ("exhaustive", "bmw"):
            a = [
                (r["rank"], r["doc_id"], r["score"])
                for r in src.search(q, k=10, mode=mode).collect()
            ]
            b = [
                (r["rank"], r["doc_id"], r["score"])
                for r in dst.search(q, k=10, mode=mode).collect()
            ]
            assert a == b, (q, mode)


def test_merged_index_has_fewer_chunks(spark, index_dir, merged_dir):
    n_src = spark.read.parquet(f"{index_dir}/segments").count()
    n_dst = spark.read.parquet(f"{merged_dir}/segments").count()
    assert n_dst < n_src
    # postings conserved exactly
    s = spark.read.parquet(f"{index_dir}/segments").agg(
        F.sum("n_postings"), F.sum("sum_tf")
    ).collect()[0]
    d = spark.read.parquet(f"{merged_dir}/segments").agg(
        F.sum("n_postings"), F.sum("sum_tf")
    ).collect()[0]
    assert tuple(s) == tuple(d)


def test_merged_ranges_coarsened(spark, index_dir, merged_dir):
    src_ranges = (
        spark.read.parquet(f"{index_dir}/segments")
        .select("range_id").distinct().count()
    )
    dst_ranges = (
        spark.read.parquet(f"{merged_dir}/segments")
        .select("range_id").distinct().count()
    )
    assert dst_ranges <= (src_ranges + 3) // 4


def test_merged_positional_phrase_identical(spark, corpus_df, tmp_path_factory):
    """Range-merge of a POSITIONAL index preserves phrase + proximity
    results exactly (pos streams concatenate with offset shifts)."""
    from tlhop_library_spark.index.build import IndexBuilder

    src = str(tmp_path_factory.mktemp("pmerge") / "src")
    out = str(tmp_path_factory.mktemp("pmerge") / "dst")
    IndexBuilder(spark, src, n_buckets=4, n_ranges=8, positions=True).build(
        corpus_df
    )
    stats = merge_index_ranges(spark, src, out, factor=4)
    assert stats["positions"] is True
    a_r, b_r = IndexReader(spark, src), IndexReader(spark, out)
    for phrase in ["coração ação", "análise tupere", "ação ação informação"]:
        a = [tuple(r) for r in a_r.search_phrase(phrase, k=10).collect()]
        b = [tuple(r) for r in b_r.search_phrase(phrase, k=10).collect()]
        assert a == b, phrase
        assert a, f"phrase {phrase!r} matched nothing — weak fixture"
    pa = [tuple(r) for r in a_r.search_proximity("análise tupere", 5, k=50).collect()]
    pb = [tuple(r) for r in b_r.search_proximity("análise tupere", 5, k=50).collect()]
    assert pa == pb and pa
