"""Raw web-dump → normalized documents-table converter.

Reference parity: ShodanDatasetManager's convert pipeline
(/root/reference/tlhop/converters/shodan_dataset_manager.py:89-113,
395-553) — two-pass schema read, empty→NULL normalization, derived
date/year columns, stable id, canonical column order, partitioned
append. Re-targeted at Common-Crawl-style JSON dumps of pages
(url, warc_ts, html, lang) producing the engine's input table
(doc_id, url, warc_ts, html, text, lang, fetch_date, year).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from tlhop_library_spark.extract import extract_text_udf
from tlhop_library_spark.sources.catalog import TableCatalog

#: fast_mode pinned schema (ref shodan_dataset_manager.py:400-460's
#: fixed-schema path; avoids the inference pass entirely)
DUMP_SCHEMA = StructType(
    [
        StructField("url", StringType()),
        StructField("warc_ts", StringType()),
        StructField("html", StringType()),
        StructField("lang", StringType()),
    ]
)

CANONICAL_COLUMNS = [
    "doc_id", "url", "warc_ts", "html", "text", "lang",
    "fetch_date", "year",
]


def read_dump(
    spark: SparkSession, path: str, fast_mode: bool = True
) -> DataFrame:
    """S1 — JSON-lines dump read: pinned schema (fast_mode) or the
    reference's two-pass infer-then-demote (strings-as-JSON escape
    hatch, shodan_dataset_manager.py:463-475)."""
    if fast_mode:
        return spark.read.schema(DUMP_SCHEMA).json(path)
    inferred = spark.read.option("primitivesAsString", True).json(path)
    demoted = StructType(
        [
            StructField(f.name, StringType())
            for f in inferred.schema.fields
        ]
    )
    return spark.read.schema(demoted).json(path)


def normalize(df: DataFrame) -> DataFrame:
    """Normalization chain (ref _convert, :483-553):

    - empty string → NULL (ref :275-300)
    - timestamp parse + non-null filter (ref :521)
    - html → binary payload; text extracted via the Arrow UDF
    - stable doc_id = xxhash64(url) (ref ULID derivation :523;
      hash-of-url is the at-scale choice, collision-checked in tests)
    - fetch_date/year partition columns (ref :523-524)
    - canonical column order (ref :530-536)
    """
    out = df
    for c in ("url", "html", "lang"):
        out = out.withColumn(
            c, F.when(F.trim(F.col(c)) == "", None).otherwise(F.col(c))
        )
    out = (
        out.withColumn("warc_ts", F.to_timestamp("warc_ts"))
        .where(F.col("warc_ts").isNotNull() & F.col("url").isNotNull())
        .withColumn("html", F.encode(F.col("html"), "utf-8").cast(BinaryType()))
        .withColumn("text", extract_text_udf(F.col("html")))
        .withColumn("doc_id", F.xxhash64("url"))
        .withColumn("fetch_date", F.to_date("warc_ts"))
        .withColumn("year", F.year("warc_ts"))
    )
    return out.select(*CANONICAL_COLUMNS)


def convert_dump(
    spark: SparkSession,
    dump_path: str,
    catalog: TableCatalog,
    table: str = "documents",
    fast_mode: bool = True,
) -> int:
    """Full pipeline: read → normalize → idempotent partitioned append
    keyed on (url, warc_ts) (ref MERGE idempotency,
    censys_dataset_manager.py:222-229). Returns rows appended."""
    normalized = normalize(read_dump(spark, dump_path, fast_mode))
    return catalog.merge_append(
        normalized, table, keys=["url", "warc_ts"],
        partition_cols=["year", "fetch_date"],
    )


def stream_convert_dumps(
    spark: SparkSession,
    dump_dir: str,
    catalog: TableCatalog,
    table: str = "documents",
    checkpoint_dir: str | None = None,
):
    """Incremental ingest: Structured Streaming file source over a dump
    directory → per-micro-batch normalize + idempotent MERGE append.

    End-to-end-exactly-once by composition: the file source +
    checkpoint give at-least-once batch delivery, and the
    (url, warc_ts)-keyed `merge_append` makes redelivery a no-op — the
    same RELEASE-file/MERGE idempotency the reference's crawlers use
    (/root/reference/tlhop/crawlers/nist_nvd.py:83-89,
    censys_dataset_manager.py:222-229), expressed as
    readStream.foreachBatch. Returns the StreamingQuery (caller owns
    stop())."""

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        catalog.merge_append(
            normalize(batch_df), table, keys=["url", "warc_ts"],
            partition_cols=["year", "fetch_date"],
        )

    stream = spark.readStream.schema(DUMP_SCHEMA).json(dump_dir)
    writer = stream.writeStream.foreachBatch(sink).trigger(
        processingTime="1 second"
    )
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    return writer.start()
