"""Streaming percolation (streaming/percolate_stream.py): the drained
match stream must equal the offline percolator over the union of
batches; replays (fresh checkpoint, same files) must overwrite rather
than duplicate; a later landing batch must be picked up incrementally
by the same checkpoint."""

import os

import pytest
from pyspark.sql import functions as F

from tlhop_library_spark.operators.percolate import percolate
from tlhop_library_spark.streaming.percolate_stream import (
    stream_percolate,
)

REGISTERED = [
    (1, "bace cada", None),   # AND: both terms
    (2, "bace", 1),           # OR
    (3, "tesa dadu lima", 2),  # 2-of-3
]


def _rows(df):
    return sorted(
        (r["doc_id"], r["query_id"], r["matched"], r["required"])
        for r in df.collect()
    )


@pytest.fixture(scope="module")
def queries_df(spark):
    return spark.createDataFrame(
        REGISTERED, "query_id long, query_text string, msm int"
    )


@pytest.fixture(scope="module")
def percolate_stream(spark, corpus_df, queries_df, tmp_path_factory):
    root = tmp_path_factory.mktemp("percstream")
    batches = str(root / "batches")
    matches = str(root / "matches")
    ckpt = str(root / "ckpt")
    os.makedirs(batches)
    for lo, hi in [(0, 300), (300, 600)]:
        corpus_df.where(
            (F.col("doc_id") >= lo) & (F.col("doc_id") < hi)
        ).select("doc_id", "text").coalesce(1).write.mode(
            "append"
        ).parquet(batches)
    seen = []
    q = stream_percolate(
        spark, batches, queries_df, matches, ckpt,
        on_batch=lambda bid, n: seen.append((bid, n)),
    )
    q.awaitTermination(300)
    return batches, matches, ckpt, seen


def test_streamed_equals_offline_percolate(
    spark, corpus_df, queries_df, percolate_stream
):
    _, matches, _, seen = percolate_stream
    streamed = spark.read.parquet(matches).select(
        "doc_id", "query_id", "matched", "required"
    )
    offline = percolate(
        corpus_df.where(F.col("doc_id") < 600), queries_df
    )
    assert _rows(streamed) == _rows(offline)
    assert len(seen) == 2 and all(n > 0 for _, n in seen)


def test_replay_overwrites_instead_of_duplicating(
    spark, corpus_df, queries_df, percolate_stream, tmp_path
):
    batches, matches, _, _ = percolate_stream
    before = _rows(spark.read.parquet(matches))
    q = stream_percolate(
        spark, batches, queries_df, matches,
        str(tmp_path / "ckpt_replay"),
    )
    q.awaitTermination(300)
    assert _rows(spark.read.parquet(matches)) == before


def test_new_batch_processed_incrementally(
    spark, corpus_df, queries_df, percolate_stream
):
    batches, matches, ckpt, seen = percolate_stream
    n_before = len(seen)
    corpus_df.where(F.col("doc_id") >= 600).select(
        "doc_id", "text"
    ).coalesce(1).write.mode("append").parquet(batches)
    q = stream_percolate(
        spark, batches, queries_df, matches, ckpt,
        on_batch=lambda bid, n: seen.append((bid, n)),
    )
    q.awaitTermination(300)
    assert len(seen) == n_before + 1  # only the new file ran
    streamed = spark.read.parquet(matches).select(
        "doc_id", "query_id", "matched", "required"
    )
    assert _rows(streamed) == _rows(percolate(corpus_df, queries_df))
