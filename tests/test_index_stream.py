"""Streaming index maintenance (streaming/index_stream.py): a
file-source stream of document batches drained through foreachBatch →
add_documents must leave the index rank-AND-score identical to a cold
build over the full corpus, and re-draining (fresh checkpoint, same
files) must be a recorded no-op (delta-group idempotence ≡ the
exactly-once contract under foreachBatch replay).
"""

import json
import os

import pytest
from pyspark.sql import functions as F

from tlhop_library_spark.index import IndexBuilder, IndexReader
from tlhop_library_spark.streaming.index_stream import (
    stream_append_documents,
)

QUERIES = [("bace", 10), ("bace cada", 10), ("tesa dadu", 15)]


def _rows(df):
    return [
        (r["rank"], r["doc_id"], r["score"])
        for r in df.orderBy("rank").collect()
    ]


@pytest.fixture(scope="module")
def streamed_index(spark, corpus_df, tmp_path_factory):
    root = tmp_path_factory.mktemp("idxstream")
    full_dir = str(root / "full")
    live_dir = str(root / "live")
    batches = str(root / "batches")
    ckpt = str(root / "ckpt")
    os.makedirs(batches)
    kw = dict(n_buckets=8, n_ranges=8, n_jobs=2)
    IndexBuilder(spark, full_dir, **kw).build(corpus_df)
    # base index over the first 400 docs; two landing batches cover the rest
    IndexBuilder(spark, live_dir, **kw).build(
        corpus_df.where(F.col("doc_id") < 400)
    )
    for lo, hi in [(400, 600), (600, 10**9)]:
        batch = corpus_df.where(
            (F.col("doc_id") >= lo) & (F.col("doc_id") < hi)
        ).select("doc_id", "text")
        batch.coalesce(1).write.mode("append").parquet(batches)
    seen = []
    q = stream_append_documents(
        spark, batches, live_dir, ckpt,
        on_batch=lambda bid, st: seen.append((bid, st["n_docs"])),
    )
    q.awaitTermination(300)
    return full_dir, live_dir, batches, seen


def test_streamed_equals_cold_build(spark, streamed_index):
    full_dir, live_dir, _, _ = streamed_index
    full = IndexReader(spark, full_dir)
    live = IndexReader(spark, live_dir)
    for qq, k in QUERIES:
        assert _rows(live.search(qq, k)) == _rows(full.search(qq, k)), qq
        assert _rows(live.search(qq, k, mode="bmw")) == _rows(
            full.search(qq, k, mode="bmw")
        ), qq


def test_stream_recorded_delta_groups(streamed_index):
    _, live_dir, _, seen = streamed_index
    with open(os.path.join(live_dir, "stats.json")) as f:
        st = json.load(f)
    assert len(st.get("delta_groups", [])) == 2
    # observer saw monotonically growing doc counts
    assert [n for _, n in seen] == sorted(n for _, n in seen)


def test_redrain_is_noop(spark, streamed_index, tmp_path):
    """Same files, FRESH checkpoint (simulated replay-after-crash):
    every batch hits the delta-group idempotence no-op; stats and
    rankings are unchanged."""
    full_dir, live_dir, batches, _ = streamed_index
    with open(os.path.join(live_dir, "stats.json")) as f:
        before = json.load(f)
    q = stream_append_documents(
        spark, batches, live_dir, str(tmp_path / "ckpt2")
    )
    q.awaitTermination(300)
    with open(os.path.join(live_dir, "stats.json")) as f:
        after = json.load(f)
    assert after["n_docs"] == before["n_docs"]
    assert after["delta_groups"] == before["delta_groups"]
    live = IndexReader(spark, live_dir)
    full = IndexReader(spark, full_dir)
    for qq, k in QUERIES:
        assert _rows(live.search(qq, k)) == _rows(full.search(qq, k)), qq
