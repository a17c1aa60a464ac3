"""Sequence packing for LLM pretraining — concat-and-chunk block maps.

A pretraining loader does not feed one document per sample: documents
are concatenated (in a deterministic order) and the token stream is
chunked into fixed-length blocks of ``block_len`` tokens (the
GPT-style "concat and chunk" scheme). This module computes that
packing AS A QUERY — per document, where its tokens land — without
materializing a single token: everything is arithmetic over the v1
token counts.

Frozen spec (v1):

- tokens per doc = analyzer-v1 token count (docs with NULL text or
  zero tokens occupy no space and are excluded from the map);
- documents are packed within SHARDS of ``shard_docs`` consecutive
  doc_ids (``shard = floor(doc_id / shard_docs)``) in doc_id order —
  the deterministic unit a loader worker owns. Shards pack
  independently: block numbering restarts per shard and the last
  block of a shard is padded (this is what keeps the computation
  shuffle-bounded: the running sum is windowed PER SHARD, ≤
  ``shard_docs`` rows each, never a global single-partition funnel —
  and it is also what real loaders do, so workers need no cross-shard
  coordination);
- ``start_off`` = exclusive running sum of token counts within the
  shard; a doc's tokens span blocks
  ``floor(start_off / block_len) … floor((start_off + n_tokens - 1)
  / block_len)`` — docs DO cross block boundaries (no padding between
  docs, the concat-and-chunk property).

Scale shape: one narrow projection of (doc_id, n_tokens) off the
docs scan, one window over ≤ ``shard_docs``-row partitions, pure JVM
arithmetic. At 10^12 docs / 10^4-doc shards that is 10^8 independent
window partitions — embarrassingly parallel, no skew (shards are
equal-sized by construction).

Reference basis: the reference has no notion of training-data
packing (it is a scan-analytics library); this operator is part of
the LLM-pipeline surface the round brief adds on top of SURVEY §2.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from tlhop_library_spark.analyzer import doc_len_col

BLOCK_LEN = 2048
SHARD_DOCS = 10_000


def pack_blocks(
    docs: DataFrame,
    block_len: int = BLOCK_LEN,
    shard_docs: int = SHARD_DOCS,
    text_col: str = "text",
    id_col: str = "doc_id",
    shuffle_salt: str | None = None,
) -> DataFrame:
    """Per-document block map: (doc_id, shard, n_tokens, start_off,
    first_block, last_block), doc_id ascending within shard — or, with
    ``shuffle_salt`` set, a DETERMINISTIC pseudo-random order within
    each shard (docs sorted by ``md5(salt|doc_id)``): the
    shuffle-before-pack step a pretraining loader runs, reproducible
    across runs/clusters/partitionings and re-derivable per salt
    (epoch seed) without materializing a permutation."""
    if block_len < 1 or shard_docs < 1:
        raise ValueError("block_len and shard_docs must be >= 1")
    base = (
        docs.where(F.col(text_col).isNotNull())
        .select(
            F.col(id_col).cast("long").alias("doc_id"),
            doc_len_col(F.col(text_col)).cast("long").alias("n_tokens"),
        )
        .where(F.col("n_tokens") > 0)
        .withColumn(
            "shard", F.floor(F.col("doc_id") / shard_docs).cast("long")
        )
    )
    if shuffle_salt is None:
        order = [F.asc("doc_id")]
    else:
        order = [
            F.asc(
                F.md5(
                    F.concat_ws(
                        "|",
                        F.lit(shuffle_salt),
                        F.col("doc_id").cast("string"),
                    )
                )
            ),
            F.asc("doc_id"),
        ]
    w = (
        Window.partitionBy("shard")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    off = F.coalesce(F.sum("n_tokens").over(w), F.lit(0)).cast("long")
    return base.select(
        "doc_id",
        "shard",
        "n_tokens",
        off.alias("start_off"),
        F.floor(off / block_len).cast("long").alias("first_block"),
        F.floor(
            (off + F.col("n_tokens") - 1) / block_len
        ).cast("long").alias("last_block"),
    )


def packing_summary(
    docs: DataFrame,
    block_len: int = BLOCK_LEN,
    shard_docs: int = SHARD_DOCS,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-shard packing statistics — what a loader needs to size an
    epoch: (shard, n_docs, n_tokens, n_blocks, tail_padding,
    boundary_docs) where ``n_blocks = ceil(n_tokens / block_len)``,
    ``tail_padding`` is the pad of the shard's final block and
    ``boundary_docs`` counts documents spanning a block boundary.
    One groupBy over the block map — same shuffle bound."""
    m = pack_blocks(docs, block_len, shard_docs, text_col, id_col)
    agg = m.groupBy("shard").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("n_tokens"),
        F.sum(
            F.when(F.col("first_block") != F.col("last_block"), 1)
            .otherwise(0)
        ).cast("long").alias("boundary_docs"),
    )
    n_blocks = F.ceil(F.col("n_tokens") / block_len).cast("long")
    return agg.select(
        "shard",
        "n_docs",
        "n_tokens",
        n_blocks.alias("n_blocks"),
        (n_blocks * block_len - F.col("n_tokens")).cast("long").alias(
            "tail_padding"
        ),
        "boundary_docs",
    ).orderBy("shard")


def oracle_sql_pack_blocks(
    block_len: int = BLOCK_LEN,
    shard_docs: int = SHARD_DOCS,
    table: str = "documents",
    id_col: str = "doc_id",
) -> str:
    """DuckDB oracle for :func:`pack_blocks` (identical v1 token
    counts, identical windowed arithmetic)."""
    return f"""
WITH base AS (
  SELECT CAST({id_col} AS BIGINT) AS doc_id,
         CAST(len(list_filter(
           regexp_split_to_array(lower(text), '[^\\p{{L}}\\p{{N}}]+'),
           t -> length(t) >= 3)) AS BIGINT) AS n_tokens
  FROM {table} WHERE text IS NOT NULL
), nz AS (
  SELECT doc_id, n_tokens,
         CAST(doc_id // {shard_docs} AS BIGINT) AS shard
  FROM base WHERE n_tokens > 0
), offs AS (
  SELECT doc_id, shard, n_tokens,
         CAST(coalesce(sum(n_tokens) OVER (
           PARTITION BY shard ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
         ), 0) AS BIGINT) AS start_off
  FROM nz
)
SELECT doc_id, shard, n_tokens, start_off,
       CAST(start_off // {block_len} AS BIGINT) AS first_block,
       CAST((start_off + n_tokens - 1) // {block_len} AS BIGINT)
         AS last_block
FROM offs
ORDER BY doc_id
"""


def oracle_sql_packing_summary(
    block_len: int = BLOCK_LEN,
    shard_docs: int = SHARD_DOCS,
    table: str = "documents",
    id_col: str = "doc_id",
) -> str:
    """DuckDB oracle for :func:`packing_summary` (wraps the block-map
    oracle as a CTE)."""
    return f"""
WITH blockmap AS (
{oracle_sql_pack_blocks(block_len, shard_docs, table, id_col).rstrip()}
), per_shard AS (
  SELECT shard,
         CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
         CAST(sum(CASE WHEN first_block <> last_block THEN 1 ELSE 0
                  END) AS BIGINT) AS boundary_docs
  FROM blockmap GROUP BY shard
)
SELECT shard, n_docs, n_tokens,
       CAST(ceil(n_tokens / CAST({block_len} AS DOUBLE)) AS BIGINT)
         AS n_blocks,
       CAST(ceil(n_tokens / CAST({block_len} AS DOUBLE)) AS BIGINT)
         * {block_len} - n_tokens AS tail_padding,
       boundary_docs
FROM per_shard
ORDER BY shard
"""
