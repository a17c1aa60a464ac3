"""Streaming percolation: route every incoming document batch to the
registered queries it matches (Elasticsearch percolate + watcher shape,
Lucene Monitor's streaming mode) via Structured Streaming +
``foreachBatch`` over :func:`tlhop_library_spark.operators.percolate.
percolate`.

This is the alerting/saved-search primitive of a crawl pipeline: as
pages land, each micro-batch is tokenized JVM-side and met by ONE
broadcast equi-join against the (term, query_id, required) triples of
the registered queries — the doc stream is never shuffled, and the
per-batch cost is O(batch tokens × avg queries per term) exactly like
the offline operator (its docstring carries the scale analysis).

Exactly-once story: ``foreachBatch`` replays a micro-batch after a
crash (at-least-once), and the sink is idempotent per batch — each
batch's matches land in a deterministic ``batch_id=N`` partition
written with overwrite mode, so a replay rewrites the same partition
byte-for-byte instead of appending duplicates. Together with the
stream checkpoint: exactly-once match emission.

Reference basis: the reference's alerting analogue is per-row regex
fingerprint loops over static frames
(/root/reference/tlhop/shodan_library.py:179-204); there is no
streaming or reverse-search capability to port — this is engine-new.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from tlhop_library_spark.operators.percolate import percolate
from tlhop_library_spark.streaming.index_stream import DOC_BATCH_SCHEMA

__all__ = ["stream_percolate"]


def stream_percolate(
    spark: SparkSession,
    batches_dir: str,
    queries_df: DataFrame,
    matches_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
    max_files_per_trigger: int = 1,
    on_batch=None,
):
    """Percolate every parquet doc batch landing in ``batches_dir``
    against ``queries_df`` (query_id, query_text[, msm]) and write
    match rows (doc_id, query_id, matched, required) under
    ``matches_dir/batch_id=N/``.

    ``available_now=True`` drains the currently-available files and
    stops (the scheduled-ingest mode); ``False`` keeps watching.
    Returns the StreamingQuery (caller owns stop/await). ``on_batch``
    is an optional callable(batch_id, n_matches) metrics observer.

    The registered-query side is analyzed once per micro-batch and
    broadcast (queries are tiny next to the stream; millions still
    fit as term triples) — re-registering queries between triggers is
    therefore picked up on the next batch, the ES percolator's
    refresh behavior."""
    stream = (
        spark.readStream.schema(DOC_BATCH_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(batches_dir)
    )

    def sink(batch_df, batch_id: int) -> None:
        out = percolate(batch_df, queries_df)
        # deterministic per-batch partition + overwrite = replay-safe
        target = os.path.join(matches_dir, f"batch_id={batch_id}")
        out.write.mode("overwrite").parquet(target)
        if on_batch is not None:
            n = spark.read.parquet(target).count()
            on_batch(batch_id, n)

    writer = stream.writeStream.foreachBatch(sink).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
