"""Streaming exact deduplication: drop re-landed duplicate documents
as batches arrive, via Structured Streaming's state-store-backed
``dropDuplicates`` — the streaming counterpart of
``operators/dedup.dedup_exact``.

Spark-first: the dedup state (one row per seen content hash) lives in
the executor state store with checkpointed lineage — no custom
stateful UDF is needed because exact dedup IS Spark's built-in
duplicate-drop, keyed on a derived ``md5(text)`` column. The
watermarked variant (``ttl_col``/``ttl``) bounds state for unbounded
streams via ``dropDuplicatesWithinWatermark``: a duplicate landing
within the TTL window is dropped, after it is admitted again —
the standard state-size/recall trade at 10^12-doc scale, where
"forever" state is a deliberate choice, not a default.

Survivor semantics: FIRST arrival wins (landing order under
``maxFilesPerTrigger=1``), versus offline ``dedup_exact`` which keeps
the min doc_id per content group. On a monotonically-id'd dump
sequence the two agree; the test asserts the content sets are
identical either way.

Scale shape: the shuffle is keyed by the content hash (uniform by
construction — md5), state rows are ~48 bytes each, and output files
append per micro-batch; nothing accumulates on the driver.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from tlhop_library_spark.streaming.index_stream import DOC_BATCH_SCHEMA


def stream_dedup_documents(
    spark: SparkSession,
    batches_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
    max_files_per_trigger: int = 1,
    ttl_col: str | None = None,
    ttl: str | None = None,
):
    """Start a stream that writes every FIRST-seen document landing in
    ``batches_dir`` (parquet files, doc_id/text schema) to
    ``output_dir``, dropping any document whose exact text content was
    already seen.

    With ``ttl_col`` (an event-time timestamp column present in the
    input) and ``ttl`` (e.g. ``"24 hours"``), uses
    ``dropDuplicatesWithinWatermark`` so dedup state expires — the
    bounded-state mode for continuous ingest. Otherwise state grows
    with distinct content (exactly one hash row per unique text).

    Returns the StreamingQuery (caller owns stop/await).
    """
    schema = DOC_BATCH_SCHEMA
    if ttl_col is not None:
        from pyspark.sql.types import StructField, TimestampType

        schema = schema.add(StructField(ttl_col, TimestampType()))

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(batches_dir)
    )
    hashed = stream.withColumn("content_md5", F.md5(F.col("text")))
    if ttl_col is not None and ttl is not None:
        deduped = hashed.withWatermark(ttl_col, ttl)
        deduped = deduped.dropDuplicatesWithinWatermark(["content_md5"])
    else:
        deduped = hashed.dropDuplicates(["content_md5"])

    writer = (
        deduped.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
