"""Percolator: reverse search — stream documents against REGISTERED
queries (Elasticsearch percolate query / Lucene Monitor a.k.a. Luwak).

Forward search asks "which docs match this query"; the percolator asks
"which of my stored queries match this doc" — the routing primitive of
alerting, saved-search notification, and training-data pipelines
(route every incoming page to the curation rules it satisfies).

Semantics (ES ``minimum_should_match``): a registered query is its
analyzed term set plus a per-query ``msm``; a doc matches iff at least
``msm`` DISTINCT query terms occur in the doc's analyzed tokens.
``msm`` NULL/absent → ALL terms (AND semantics), ``msm=1`` → OR, and
``msm`` is clamped to the term count (a 3-term query can't require 4).
Queries with zero analyzable tokens match nothing.

Spark-first shape (vs the reference's per-row regex loops,
reference/tlhop/shodan_library.py fingerprint scans): both sides are
tokenized JVM-side (``tokens_col``), de-duplicated, and met by ONE
equi-join on term — the registered-query side is broadcast (queries
are small next to a 10^12-doc stream; millions of registered queries
still fit executor memory as (term, query_id, required) triples), so
the doc stream is never shuffled: join → partial groupBy(doc, query)
count — map-side combinable — → filter matched ≥ required. No Python
in the hot path, no per-doc query loop; cost is O(doc tokens ×
avg queries per term), the inverted layout Lucene Monitor uses.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tlhop_library_spark.analyzer import py_tokens, tokens_col

__all__ = ["percolate", "oracle_sql_percolate"]


def percolate(
    docs: DataFrame, queries_df: DataFrame, doc_col: str = "doc_id"
) -> DataFrame:
    """Match every doc against every registered query.

    ``queries_df``: (query_id long, query_text string[, msm int]) —
    ``msm`` NULL or column absent means ALL terms must occur.
    Returns (doc_id, query_id, matched, required): one row per
    (doc, query) hit with the distinct-term match count.
    """
    if "msm" not in queries_df.columns:
        queries_df = queries_df.withColumn(
            "msm", F.lit(None).cast("int")
        )
    q = (
        queries_df.select(
            F.col("query_id").cast("long").alias("query_id"),
            F.array_distinct(
                tokens_col(F.col("query_text"))
            ).alias("__toks"),
            F.col("msm").cast("int").alias("msm"),
        )
        .where(F.size("__toks") > 0)
        .select(
            "query_id",
            F.explode("__toks").alias("term"),
            F.least(
                F.coalesce(F.col("msm"), F.size("__toks")),
                F.size("__toks"),
            ).alias("required"),
        )
    )
    d = docs.where(F.col("text").isNotNull()).select(
        F.col(doc_col).cast("long").alias("doc_id"),
        F.explode(
            F.array_distinct(tokens_col(F.col("text")))
        ).alias("term"),
    )
    # both sides are distinct per (key, term), so count(*) counts
    # distinct matched terms — no countDistinct shuffle needed
    return (
        d.join(F.broadcast(q), "term")
        .groupBy("doc_id", "query_id")
        .agg(
            F.count("*").alias("matched"),
            F.first("required").alias("required"),
        )
        .where(F.col("matched") >= F.col("required"))
        .select("doc_id", "query_id", "matched", "required")
    )


def oracle_sql_percolate(
    queries: list[tuple[int, str, "int | None"]],
    table: str = "documents", doc_col: str = "doc_id",
) -> str:
    """DuckDB oracle: the registered queries inline as VALUES of
    (query_id, term, required) — tokenized with the same frozen
    analyzer — joined to the doc-token CTE."""
    rows = []
    for qid, qtext, msm in queries:
        toks = sorted(set(py_tokens(qtext)))
        if not toks:
            continue
        required = len(toks) if msm is None else min(msm, len(toks))
        for t in toks:
            rows.append(
                f"({int(qid)}, '" + t.replace("'", "''")
                + f"', {required})"
            )
    assert rows, "no analyzable registered queries"
    values = ",\n         ".join(rows)
    return f"""
WITH base AS (
  SELECT {doc_col} AS doc_id,
         list_filter(regexp_split_to_array(lower(text), '[^\\p{{L}}\\p{{N}}]+'),
                     t -> length(t) >= 3) AS tokens
  FROM {table} WHERE text IS NOT NULL
), dt AS (
  SELECT DISTINCT doc_id, unnest(tokens) AS term FROM base
), q AS (
  SELECT * FROM (VALUES {values}) AS t(query_id, term, required)
)
SELECT dt.doc_id,
       CAST(q.query_id AS BIGINT) AS query_id,
       count(*) AS matched,
       CAST(max(q.required) AS INT) AS required
FROM dt JOIN q USING (term)
GROUP BY dt.doc_id, q.query_id
HAVING count(*) >= max(q.required)
ORDER BY doc_id, query_id
"""
