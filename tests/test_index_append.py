"""Incremental append (index/append.py): add_documents(build(A), B)
must answer every query rank-AND-score identically to build(A ∪ B).

The splits are chosen so the boundary doc-range holds chunks from two
segment groups (the multi-chunk case the scorers must merge), and one
test appends much-longer docs so avgdl GROWS — the case where stale
block_max_w bounds would under-state true weights and unguarded BMW
pruning could silently drop true top-k docs.
"""

import json
import os

import pytest
from pyspark.sql import functions as F

from tlhop_library_spark.index import (
    IndexBuilder,
    IndexReader,
    add_documents,
    merge_index_ranges,
)

QUERIES = [
    ("bace", 10),
    ("bace cada", 10),
    ("informação segurança", 10),
    ("dadu cadi bace", 15),
    ("tesa", 5),
]


def _rows(df):
    return [
        (r["rank"], r["doc_id"], r["score"])
        for r in df.orderBy("rank").collect()
    ]


def _dict_rows(spark, d):
    return {
        (r["term"]): (r["df"], r["cf"])
        for r in spark.read.parquet(os.path.join(d, "dictionary")).collect()
    }


@pytest.fixture(scope="module")
def split_indexes(spark, corpus_df, tmp_path_factory):
    """full = build(800); incr = build(first 500) + append(last 300)."""
    root = tmp_path_factory.mktemp("append")
    full_dir, incr_dir = str(root / "full"), str(root / "incr")
    kw = dict(n_buckets=8, n_ranges=8, n_jobs=2)
    IndexBuilder(spark, full_dir, **kw).build(corpus_df)
    base = corpus_df.where(F.col("doc_id") < 500)
    delta = corpus_df.where(F.col("doc_id") >= 500)
    IndexBuilder(spark, incr_dir, **kw).build(base)
    add_documents(spark, incr_dir, delta)
    return full_dir, incr_dir


def test_append_boundary_range_is_shared(spark, split_indexes):
    # the setup only exercises the multi-chunk path if the old build's
    # last range also holds delta docs — assert that premise
    full_dir, incr_dir = split_indexes
    with open(os.path.join(incr_dir, "stats.json")) as f:
        stats = json.load(f)
    rs = stats["range_size"]
    assert 499 // rs == 500 // rs, "split must share a boundary range"
    seg = spark.read.parquet(os.path.join(incr_dir, "segments"))
    multi = (
        seg.groupBy("tid", "range_id")
        .count()
        .where(F.col("count") > 1)
        .count()
    )
    assert multi > 0, "no (term, range) has chunks from both groups"


@pytest.mark.parametrize("mode", ["exhaustive", "bmw"])
def test_append_rank_identical_to_full_rebuild(spark, split_indexes, mode):
    full_dir, incr_dir = split_indexes
    rf = IndexReader(spark, full_dir)
    ri = IndexReader(spark, incr_dir)
    for q, k in QUERIES:
        assert _rows(ri.search(q, k, mode=mode)) == _rows(
            rf.search(q, k, mode=mode)
        ), (q, mode)


def test_append_stats_and_dictionary_match_full(spark, split_indexes):
    full_dir, incr_dir = split_indexes
    sf = IndexReader(spark, full_dir).stats
    si = IndexReader(spark, incr_dir).stats
    assert si["n_docs"] == sf["n_docs"]
    assert si["avgdl"] == pytest.approx(sf["avgdl"])
    assert si["max_doc"] == sf["max_doc"]
    assert _dict_rows(spark, incr_dir) == _dict_rows(spark, full_dir)


def test_append_is_idempotent(spark, corpus_df, split_indexes):
    _, incr_dir = split_indexes
    before = IndexReader(spark, incr_dir).stats
    after = add_documents(
        spark, incr_dir, corpus_df.where(F.col("doc_id") >= 500)
    )
    assert after["n_docs"] == before["n_docs"]
    assert after["delta_groups"] == before["delta_groups"]


def test_append_rejects_doc_id_overlap(spark, corpus_df, split_indexes):
    _, incr_dir = split_indexes
    with pytest.raises(ValueError, match="append-only"):
        add_documents(
            spark, incr_dir, corpus_df.where(F.col("doc_id") == 10)
        )


def test_append_longer_docs_keeps_bmw_exact(spark, corpus_df, tmp_path):
    """avgdl GROWS after the append (delta docs are 3× longer): the
    stored bounds of old chunks are stale-low; the reader's
    bound_scale must keep forced-BMW exact vs exhaustive."""
    d = str(tmp_path / "grow")
    base = corpus_df.where(F.col("doc_id") < 600)
    delta = (
        corpus_df.where(F.col("doc_id") >= 600)
        .where(F.col("text").isNotNull())
        .select(
            (F.col("doc_id") + 10_000).alias("doc_id"),
            F.concat_ws(" ", "text", "text", "text").alias("text"),
        )
    )
    IndexBuilder(spark, d, n_buckets=8, n_ranges=8).build(base)
    stats = add_documents(spark, d, delta)
    assert stats["avgdl"] > stats["min_encode_avgdl"]
    r = IndexReader(spark, d)
    assert r._bound_scale() > 1.0
    for q, k in QUERIES:
        assert _rows(r.search(q, k, mode="bmw")) == _rows(
            r.search(q, k, mode="exhaustive")
        ), q


def test_append_then_merge_ranges(spark, split_indexes, tmp_path):
    """Offline range-merge over an APPENDED index: the boundary range's
    two doc-disjoint chunks must byte-concat in doc order."""
    full_dir, incr_dir = split_indexes
    merged = str(tmp_path / "merged")
    merge_index_ranges(spark, incr_dir, merged, factor=4)
    rf = IndexReader(spark, full_dir)
    rm = IndexReader(spark, merged)
    for q, k in QUERIES:
        assert _rows(rm.search(q, k)) == _rows(rf.search(q, k)), q


def test_second_append_chains(spark, corpus_df, tmp_path):
    full_dir = str(tmp_path / "full")
    incr_dir = str(tmp_path / "incr")
    kw = dict(n_buckets=8, n_ranges=8)
    IndexBuilder(spark, full_dir, **kw).build(corpus_df)
    IndexBuilder(spark, incr_dir, **kw).build(
        corpus_df.where(F.col("doc_id") < 300)
    )
    add_documents(
        spark, incr_dir,
        corpus_df.where((F.col("doc_id") >= 300) & (F.col("doc_id") < 650)),
    )
    add_documents(spark, incr_dir, corpus_df.where(F.col("doc_id") >= 650))
    rf = IndexReader(spark, full_dir)
    ri = IndexReader(spark, incr_dir)
    assert len(ri.stats["delta_groups"]) == 2
    for q, k in QUERIES:
        assert _rows(ri.search(q, k)) == _rows(rf.search(q, k)), q


def test_append_positional_phrase_identical(spark, corpus_df, tmp_path):
    full_dir = str(tmp_path / "pfull")
    incr_dir = str(tmp_path / "pincr")
    kw = dict(n_buckets=8, n_ranges=8, positions=True)
    IndexBuilder(spark, full_dir, **kw).build(corpus_df)
    IndexBuilder(spark, incr_dir, **kw).build(
        corpus_df.where(F.col("doc_id") < 500)
    )
    add_documents(
        spark, incr_dir, corpus_df.where(F.col("doc_id") >= 500)
    )
    rf = IndexReader(spark, full_dir)
    ri = IndexReader(spark, incr_dir)
    for phrase in ["bace cada", "informação segurança"]:
        assert _rows(ri.search_phrase(phrase, 10)) == _rows(
            rf.search_phrase(phrase, 10)
        ), phrase
        assert _rows(ri.search_proximity(phrase, window=6, k=10)) == _rows(
            rf.search_proximity(phrase, window=6, k=10)
        ), phrase
