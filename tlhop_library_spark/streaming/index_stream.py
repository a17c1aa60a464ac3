"""Streaming index maintenance: keep the inverted index current as new
document batches land, via Structured Streaming + ``foreachBatch`` over
:func:`tlhop_library_spark.index.append.add_documents`.

Exactly-once story: ``foreachBatch`` replays a micro-batch after a
crash (at-least-once), and ``add_documents`` is idempotent per batch —
the delta-group name is derived from the batch content
(``delta_{min}_{max}_{n}``), so a replayed batch that already fully
appended is a recorded no-op. Together: exactly-once index updates
with no coordination beyond the stream checkpoint.

Ordering: the index append contract is an append-only doc space (each
batch's min doc_id must exceed the index's current max_doc — the
reference's dump-ingest contract, see
``reference/tlhop/converters/shodan_dataset_manager.py`` batch loop).
``maxFilesPerTrigger=1`` + file-source ordering make each landed file
one micro-batch in landing order, which satisfies the contract when
producers emit monotonically increasing id ranges (the normal
dump-sequence case).

Scale shape: each micro-batch runs the same salted single-shuffle
append as offline ``add_documents`` — no per-row Python, no driver
accumulation; the stream checkpoint holds only file-source progress.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

DOC_BATCH_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("text", StringType()),
    ]
)


def stream_append_documents(
    spark: SparkSession,
    batches_dir: str,
    index_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
    max_files_per_trigger: int = 1,
    on_batch=None,
):
    """Start a stream that appends every parquet file landing in
    ``batches_dir`` to the index at ``index_dir``.

    ``available_now=True`` drains the currently-available files and
    stops (batch-incremental refresh — the common scheduled-ingest
    mode); ``False`` keeps running on new files. Returns the
    StreamingQuery (caller owns stop/await). ``on_batch`` is an
    optional callable(batch_id, stats) observer for metrics.
    """
    from tlhop_library_spark.index.append import add_documents

    stream = (
        spark.readStream.schema(DOC_BATCH_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(batches_dir)
    )

    def sink(batch_df, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        stats = add_documents(
            batch_df.sparkSession, index_dir, batch_df
        )
        if on_batch is not None:
            on_batch(batch_id, stats)

    writer = stream.writeStream.foreachBatch(sink).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
