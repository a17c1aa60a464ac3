"""Deletes (index/delete.py): tombstone masking semantics + expunge
compaction equivalence to a cold rebuild of the survivors."""

import shutil

import pytest
from pyspark.sql import functions as F

from tlhop_library_spark.index import (
    IndexBuilder,
    IndexReader,
    delete_documents,
    expunge_deletes,
)

Q = [("bace", 10), ("informação segurança", 10), ("ação coração análise", 15)]


def _rows(df):
    return [
        (r["rank"], r["doc_id"], r["score"])
        for r in df.orderBy("rank").collect()
    ]


@pytest.fixture(scope="module")
def deleted_index(spark, corpus_df, tmp_path_factory):
    """A copy of the base index with every doc_id % 7 == 0 tombstoned."""
    src = tmp_path_factory.mktemp("del") / "idx"
    IndexBuilder(
        spark, str(src), n_buckets=8, n_ranges=8
    ).build(corpus_df)
    ids = [
        r["doc_id"]
        for r in corpus_df.where(
            (F.col("doc_id") % 7 == 0) & F.col("text").isNotNull()
        ).collect()
    ]
    delete_documents(spark, str(src), ids)
    return str(src), set(ids)


@pytest.mark.parametrize("mode", ["exhaustive", "bmw"])
def test_masked_search_drops_deleted_keeps_scores(
    spark, corpus_df, index_dir, deleted_index, mode
):
    """Lucene semantics: results exclude deleted docs; survivors keep
    their STALE-stats scores (identical to the pre-delete index), and
    ranks compact."""
    src, dead = deleted_index
    clean = IndexReader(spark, index_dir)  # no deletes, same corpus
    masked = IndexReader(spark, src)
    for q, k in Q:
        big = _rows(clean.search(q, 10_000, mode=mode))
        expect = [
            (i + 1, d, s)
            for i, (_, d, s) in enumerate(
                (r for r in big if r[1] not in dead)
            )
        ][:k]
        got = _rows(masked.search(q, k, mode=mode))
        assert got == expect, (q, mode)


def test_masked_phrase_and_conjunctive(spark, corpus_df, tmp_path):
    d = str(tmp_path / "pos")
    IndexBuilder(spark, d, n_buckets=8, n_ranges=8, positions=True).build(
        corpus_df
    )
    r0 = IndexReader(spark, d)
    phrase = "informação segurança"
    before_ph = _rows(r0.search_phrase(phrase, 10_000))
    before_and = _rows(r0.search_and("informação segurança", 10_000))
    assert before_ph and before_and
    # delete the top hit of each
    dead = {before_ph[0][1], before_and[0][1]}
    delete_documents(spark, d, sorted(dead))
    r1 = IndexReader(spark, d)
    after_ph = _rows(r1.search_phrase(phrase, 10_000))
    after_and = _rows(r1.search_and("informação segurança", 10_000))
    assert [x[1:] for x in after_ph] == [
        x[1:] for x in before_ph if x[1] not in dead
    ]
    assert [x[1:] for x in after_and] == [
        x[1:] for x in before_and if x[1] not in dead
    ]
    assert _rows(r1.search_proximity("informação segurança", window=6, k=10))


def test_delete_is_idempotent(spark, deleted_index):
    src, dead = deleted_index
    stats1 = IndexReader(spark, src).stats
    stats2 = delete_documents(spark, src, sorted(dead))
    assert stats2["tombstone_batches"] == stats1["tombstone_batches"]


def test_expunge_equals_cold_rebuild(
    spark, corpus_df, deleted_index, tmp_path
):
    src, dead = deleted_index
    out = str(tmp_path / "expunged")
    stats = expunge_deletes(spark, src, out)
    survivors = corpus_df.where(~F.col("doc_id").isin(sorted(dead)))
    rebuilt = str(tmp_path / "rebuilt")
    IndexBuilder(spark, rebuilt, n_buckets=8, n_ranges=8).build(survivors)
    re_stats = IndexReader(spark, rebuilt).stats
    assert stats["n_docs"] == re_stats["n_docs"]
    assert stats["avgdl"] == pytest.approx(re_stats["avgdl"])
    rx = IndexReader(spark, out)
    rr = IndexReader(spark, rebuilt)
    for q, k in Q:
        for mode in ("exhaustive", "bmw"):
            assert _rows(rx.search(q, k, mode=mode)) == _rows(
                rr.search(q, k, mode=mode)
            ), (q, mode)
    # dictionary df/cf now exclude deleted postings
    dx = {
        r["term"]: (r["df"], r["cf"])
        for r in spark.read.parquet(out + "/dictionary").collect()
    }
    dr = {
        r["term"]: (r["df"], r["cf"])
        for r in spark.read.parquet(rebuilt + "/dictionary").collect()
    }
    assert dx == dr
    shutil.rmtree(out, ignore_errors=True)


def test_expunge_positional_phrase(spark, corpus_df, tmp_path):
    d = str(tmp_path / "pos2")
    IndexBuilder(spark, d, n_buckets=8, n_ranges=8, positions=True).build(
        corpus_df
    )
    hits = _rows(IndexReader(spark, d).search_phrase("informação segurança", 10))
    dead = [hits[0][1]]
    delete_documents(spark, d, dead)
    out = str(tmp_path / "pos2_x")
    expunge_deletes(spark, d, out)
    rebuilt = str(tmp_path / "pos2_r")
    IndexBuilder(
        spark, rebuilt, n_buckets=8, n_ranges=8, positions=True
    ).build(corpus_df.where(~F.col("doc_id").isin(dead)))
    assert _rows(IndexReader(spark, out).search_phrase("informação segurança", 10)) == _rows(
        IndexReader(spark, rebuilt).search_phrase("informação segurança", 10)
    )


def test_delete_by_query_tombstones_whole_matching_set(
    spark, corpus_df, tmp_path
):
    """ES _delete_by_query: every doc matching the OR query is
    tombstoned — the deleted term disappears entirely, other queries
    become rank-identical to a cold build over the filtered corpus."""
    from tlhop_library_spark.analyzer import tokens_col
    from tlhop_library_spark.index.delete import delete_by_query

    d = str(tmp_path / "idx")
    IndexBuilder(spark, d, n_buckets=8, n_ranges=8).build(corpus_df)
    r0 = IndexReader(spark, d)
    n_matching = r0._matching_scores("bace").count()
    assert n_matching > 0
    stats = delete_by_query(spark, d, "bace")
    assert len(stats["tombstone_batches"]) == 1
    r = IndexReader(spark, d)
    assert _rows(r.search("bace", 10)) == []
    # survivors rank-identically to a cold index over the survivors
    survivors = corpus_df.where(
        ~F.array_contains(tokens_col(F.col("text")), "bace")
        & F.col("text").isNotNull()
    )
    cold = str(tmp_path / "cold")
    IndexBuilder(spark, cold, n_buckets=8, n_ranges=8).build(survivors)
    rc = IndexReader(spark, cold)
    got = [
        (x["rank"], x["doc_id"]) for x in
        r.search("informação segurança", 10).collect()
    ]
    want = [
        (x["rank"], x["doc_id"]) for x in
        rc.search("informação segurança", 10).collect()
    ]
    assert got == want
    # idempotent: re-running matches only already-dead docs -> the
    # surviving index is unchanged (a second batch may appear, but
    # queries are stable)
    delete_by_query(spark, d, "bace")
    r2 = IndexReader(spark, d)
    assert _rows(r2.search("informação segurança", 10)) == _rows(
        r.search("informação segurança", 10)
    )
