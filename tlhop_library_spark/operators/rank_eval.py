"""Ranking evaluation — ES ``_rank_eval`` API parity.

Given a table of RANKINGS (query_id, rank, doc_id — what the engine
returned) and a table of JUDGMENTS (query_id, doc_id, grade ≥ 0 —
human or synthetic relevance labels), compute the standard retrieval
quality metrics per query and their macro averages:

- ``precision_at_k``  — |relevant ∩ top-k| / k  (grade > 0 = relevant;
  ES divides by k, counting unjudged docs as non-relevant);
- ``recall_at_k``     — |relevant ∩ top-k| / |relevant|;
- ``mrr``             — 1 / rank of the first relevant hit (0 if none
  in the top-k; ES ``mean_reciprocal_rank``);
- ``ndcg_at_k``       — DCG@k / IDCG@k with the exponential gain
  ``(2^grade − 1) / log2(rank + 1)`` (ES ``dcg`` with
  ``normalize: true``); queries with no judged-relevant docs score 0.

Everything is joins + windows + one groupBy per metric family — no
UDFs, no driver loops; cardinality is |rankings| + |judgments|, never
corpus-sized. A query present in the rankings but absent from the
judgments evaluates to zeros (ES behavior for unjudged queries);
judged queries the engine returned nothing for likewise.

Reference basis: the reference library has no retrieval, hence no
retrieval evaluation; spec follows the public ES rank-eval API docs
and the standard IR definitions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def rank_eval(
    rankings: DataFrame,
    judgments: DataFrame,
    k: int = 10,
) -> DataFrame:
    """Per-query metrics: (query_id, precision_at_k, recall_at_k,
    mrr, ndcg_at_k), query_id ascending, each metric rounded to 4
    digits. ``rankings`` needs (query_id, rank, doc_id); ``judgments``
    needs (query_id, doc_id, grade)."""
    if k < 1:
        raise ValueError("k must be >= 1")
    r = rankings.select(
        F.col("query_id").cast("long").alias("query_id"),
        F.col("rank").cast("int").alias("rank"),
        F.col("doc_id").cast("long").alias("doc_id"),
    ).where(F.col("rank") <= k)
    j = judgments.select(
        F.col("query_id").cast("long").alias("query_id"),
        F.col("doc_id").cast("long").alias("doc_id"),
        F.col("grade").cast("double").alias("grade"),
    )
    # per (query, rank): the grade (0 when unjudged)
    joined = r.join(j, ["query_id", "doc_id"], "left").select(
        "query_id",
        "rank",
        F.coalesce(F.col("grade"), F.lit(0.0)).alias("grade"),
    )
    log2 = F.log(F.lit(2.0))
    got = joined.groupBy("query_id").agg(
        F.sum(F.when(F.col("grade") > 0, 1).otherwise(0)).alias("hits"),
        F.min(F.when(F.col("grade") > 0, F.col("rank"))).alias(
            "first_rel"
        ),
        F.sum(
            (F.pow(F.lit(2.0), F.col("grade")) - 1)
            / (F.log(F.col("rank") + 1.0) / log2)
        ).alias("dcg"),
    )
    # ideal DCG: top-k judged grades per query, grade desc
    w = Window.partitionBy("query_id").orderBy(
        F.desc("grade"), F.asc("doc_id")
    )
    ideal = (
        j.where(F.col("grade") > 0)
        .withColumn("irank", F.row_number().over(w))
        .where(F.col("irank") <= k)
        .groupBy("query_id")
        .agg(
            F.sum(
                (F.pow(F.lit(2.0), F.col("grade")) - 1)
                / (F.log(F.col("irank") + 1.0) / log2)
            ).alias("idcg"),
        )
    )
    n_rel = (
        j.where(F.col("grade") > 0)
        .groupBy("query_id")
        .agg(F.count("*").alias("n_rel"))
    )
    qids = (
        r.select("query_id")
        .union(j.select("query_id"))
        .distinct()
    )
    out = (
        qids.join(got, "query_id", "left")
        .join(ideal, "query_id", "left")
        .join(n_rel, "query_id", "left")
        .select(
            "query_id",
            F.round(
                F.coalesce(F.col("hits"), F.lit(0)) / k, 4
            ).alias("precision_at_k"),
            F.round(
                F.when(
                    F.col("n_rel").isNotNull(),
                    F.coalesce(F.col("hits"), F.lit(0))
                    / F.col("n_rel"),
                ).otherwise(F.lit(0.0)),
                4,
            ).alias("recall_at_k"),
            F.round(
                F.when(
                    F.col("first_rel").isNotNull(),
                    1.0 / F.col("first_rel"),
                ).otherwise(F.lit(0.0)),
                4,
            ).alias("mrr"),
            F.round(
                F.when(
                    F.col("idcg").isNotNull(),
                    F.coalesce(F.col("dcg"), F.lit(0.0))
                    / F.col("idcg"),
                ).otherwise(F.lit(0.0)),
                4,
            ).alias("ndcg_at_k"),
        )
        .orderBy("query_id")
    )
    return out


def rank_eval_summary(
    rankings: DataFrame, judgments: DataFrame, k: int = 10
) -> DataFrame:
    """Macro averages over queries: one row (n_queries,
    precision_at_k, recall_at_k, mrr, ndcg_at_k), each the mean of
    the per-query values re-rounded to 4 digits."""
    per = rank_eval(rankings, judgments, k)
    return per.agg(
        F.count("*").cast("long").alias("n_queries"),
        F.round(F.avg("precision_at_k"), 4).alias("precision_at_k"),
        F.round(F.avg("recall_at_k"), 4).alias("recall_at_k"),
        F.round(F.avg("mrr"), 4).alias("mrr"),
        F.round(F.avg("ndcg_at_k"), 4).alias("ndcg_at_k"),
    )


def oracle_sql_rank_eval(
    rankings_sql: str, judgments_sql: str, k: int = 10
) -> str:
    """DuckDB oracle: identical metric arithmetic over two inline
    relations (``rankings_sql`` / ``judgments_sql`` are any SELECTs
    producing the two tables' columns)."""
    return f"""
WITH r AS (
  SELECT CAST(query_id AS BIGINT) AS query_id,
         CAST(rank AS INT) AS rank,
         CAST(doc_id AS BIGINT) AS doc_id
  FROM ({rankings_sql}) WHERE rank <= {k}
), j AS (
  SELECT CAST(query_id AS BIGINT) AS query_id,
         CAST(doc_id AS BIGINT) AS doc_id,
         CAST(grade AS DOUBLE) AS grade
  FROM ({judgments_sql})
), joined AS (
  SELECT r.query_id, r.rank, coalesce(j.grade, 0.0) AS grade
  FROM r LEFT JOIN j
    ON j.query_id = r.query_id AND j.doc_id = r.doc_id
), got AS (
  SELECT query_id,
         sum(CASE WHEN grade > 0 THEN 1 ELSE 0 END) AS hits,
         min(CASE WHEN grade > 0 THEN rank END) AS first_rel,
         sum((pow(2.0, grade) - 1) / (ln(rank + 1.0) / ln(2.0)))
           AS dcg
  FROM joined GROUP BY query_id
), ideal AS (
  SELECT query_id,
         sum((pow(2.0, grade) - 1) / (ln(irank + 1.0) / ln(2.0)))
           AS idcg
  FROM (
    SELECT query_id, grade,
           row_number() OVER (
             PARTITION BY query_id ORDER BY grade DESC, doc_id ASC
           ) AS irank
    FROM j WHERE grade > 0
  ) WHERE irank <= {k} GROUP BY query_id
), n_rel AS (
  SELECT query_id, count(*) AS n_rel FROM j WHERE grade > 0
  GROUP BY query_id
), qids AS (
  SELECT DISTINCT query_id FROM (
    SELECT query_id FROM r UNION SELECT query_id FROM j
  )
)
SELECT q.query_id,
       round(coalesce(g.hits, 0) / CAST({k} AS DOUBLE), 4)
         AS precision_at_k,
       round(CASE WHEN n.n_rel IS NOT NULL
                  THEN coalesce(g.hits, 0) / CAST(n.n_rel AS DOUBLE)
                  ELSE 0.0 END, 4) AS recall_at_k,
       round(CASE WHEN g.first_rel IS NOT NULL
                  THEN 1.0 / g.first_rel ELSE 0.0 END, 4) AS mrr,
       round(CASE WHEN i.idcg IS NOT NULL
                  THEN coalesce(g.dcg, 0.0) / i.idcg
                  ELSE 0.0 END, 4) AS ndcg_at_k
FROM qids q
LEFT JOIN got g ON g.query_id = q.query_id
LEFT JOIN ideal i ON i.query_id = q.query_id
LEFT JOIN n_rel n ON n.query_id = q.query_id
ORDER BY q.query_id
"""
