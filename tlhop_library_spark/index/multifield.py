"""Multi-field search: per-field BM25 with query-time boosts, summed.

Lucene's `MultiFieldQueryParser` semantics: every query term is scored
independently per field (that FIELD's df/docCount idf, that field's
length normalization/avgdl), the per-field scores are weighted by
query-time boosts and summed per document:

    score(d) = Σ_f boost_f · Σ_t idf_{f,t} · tfnorm(tf_{f,t,d}, dl_{f,d}, avgdl_f)

Index layout: ONE standard index per field over the SAME doc-id space
(``build_index(spark, docs.select("doc_id", col(field).alias("text")),
dir_f)``) — reusing the whole single-field lifecycle (append, delete,
merge, fsck) per field instead of inventing a composite format.
Because the builder derives ``range_size`` from (max_doc, n_ranges),
fields built over the same corpus with the same ``n_ranges`` are
range-ALIGNED: all of a document's postings, in every field, live in
the same range_id. That makes a per-range kernel complete — each
range group sees every contribution to each of its docs' totals, so
per-range top-k → global top-k is exact (the same two-level merge the
single-field engine uses; only k·n_ranges rows leave the executors).

The kernel unions the fields' (bucket, tid)-pruned chunk scans with a
``field_id`` tag and scores each chunk with ITS field's idf/avgdl/
boost — one groupBy(range_id), no cross-field shuffle of per-doc
partials. Terms share tids across fields (content-hash xxhash64), so
scoring is keyed by (field_id, tid).

Scale notes (100 TB): decode volume = the query terms' postings across
the queried fields only — identical pruning to a single-field search
per field; the extra cost of multi-field is exactly the extra fields'
postings, never a rescan. Per-field tombstones apply at the decode
boundary like everywhere else.
"""

from __future__ import annotations

from functools import reduce

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tlhop_library_spark import bm25
from tlhop_library_spark.analyzer import py_tokens
from tlhop_library_spark.index.query import (
    SEGMENT_SCHEMA,
    _SCORE_SCHEMA,
    IndexReader,
)

__all__ = ["MultiFieldIndexReader", "oracle_sql_bm25_multifield"]


def _multifield_range_scorer(params: dict[int, tuple], k: int):
    """params: field_id → (idf_by_tid, avgdl, boost, deleted)."""
    from tlhop_library_spark.index.phrase import decode_chunk

    def score_range(key, pdf: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"doc_id": [], "score": []}).astype(
            {"doc_id": "int64", "score": "float64"}
        )
        parts_d, parts_s = [], []
        for ri in range(len(pdf)):
            row = pdf.iloc[ri]
            p = params.get(int(row["field_id"]))
            if p is None:
                continue
            idf_by_tid, avgdl, boost, deleted = p
            idf = idf_by_tid.get(int(row["tid"]))
            if idf is None:
                continue
            docs_, tfs_, dls_ = decode_chunk(row)
            if deleted is not None and deleted.size:
                from tlhop_library_spark.index.delete import mask_deleted

                docs_, tfs_, dls_, _ = mask_deleted(
                    docs_, tfs_, dls_, deleted
                )
            if not len(docs_):
                continue
            parts_d.append(docs_)
            parts_s.append(
                boost * idf * bm25.tf_weight_np(tfs_, dls_, avgdl)
            )
        if not parts_d:
            return empty
        alldocs = np.concatenate(parts_d)
        allsc = np.concatenate(parts_s)
        uniq, inv = np.unique(alldocs, return_inverse=True)
        sums = np.zeros(len(uniq), dtype=np.float64)
        np.add.at(sums, inv, allsc)
        r = np.round(sums, bm25.ROUND_DIGITS)
        order = np.lexsort((uniq, -r))[:k]
        return pd.DataFrame(
            {"doc_id": uniq[order].astype(np.int64), "score": r[order]}
        )

    return score_range


class MultiFieldIndexReader:
    """Reader over one index per field; see module docstring."""

    def __init__(
        self, spark: SparkSession, field_dirs: dict[str, str],
        preload_dictionary: int | None = 2_000_000,
    ):
        if not field_dirs:
            raise ValueError("need at least one field index")
        self.spark = spark
        self.readers = {
            f: IndexReader(spark, d, preload_dictionary)
            for f, d in field_dirs.items()
        }
        rs = list(self.readers.values())
        r0 = rs[0].stats
        for r in rs[1:]:
            for key in ("analyzer", "k1", "b"):
                if r.stats.get(key) != r0.get(key):
                    raise ValueError(f"field indexes disagree on {key!r}")
            if r.stats["range_size"] != r0["range_size"]:
                raise ValueError(
                    "field indexes are not range-aligned "
                    f"({r.stats['range_size']} vs {r0['range_size']}); "
                    "build every field over the same corpus with the "
                    "same n_ranges"
                )

    def search(
        self, query_text: str, k: int = 10,
        boosts: dict[str, float] | None = None,
    ) -> DataFrame:
        """Weighted-sum multi-field BM25 top-k.

        ``boosts``: field → query-time weight (default 1.0 each;
        fields absent from the dict get 1.0, fields with boost 0 are
        skipped entirely — their chunks are never scanned)."""
        boosts = boosts or {}
        terms = sorted(set(py_tokens(query_text)))
        empty = self.spark.createDataFrame(
            [], "rank int, doc_id long, score double"
        )
        if not terms:
            return empty
        segs = []
        params: dict[int, tuple] = {}
        for i, (f, r) in enumerate(sorted(self.readers.items())):
            boost = float(boosts.get(f, 1.0))
            if boost == 0.0:
                continue
            info = r.lookup_terms(terms)
            if not info:
                continue
            n_docs = r.stats["n_docs"]
            idf_by_tid = {
                tid: bm25.idf(n_docs, df)
                for (df, _, tid) in info.values()
            }
            params[i] = (
                idf_by_tid, float(r.stats["avgdl"]), boost, r._deleted,
            )
            buckets = sorted({b for _, b, _ in info.values()})
            tids = sorted(idf_by_tid)
            segs.append(
                r._segments.where(
                    F.col("bucket").isin(buckets)
                    & F.col("tid").isin(tids)
                )
                .select(*[fld.name for fld in SEGMENT_SCHEMA.fields])
                .withColumn("field_id", F.lit(i))
            )
        if not segs:
            return empty
        union = reduce(DataFrame.unionByName, segs)
        scorer = _multifield_range_scorer(params, k)
        local = union.groupBy("range_id").applyInPandas(
            lambda key, pdf: scorer(key, pdf), schema=_SCORE_SCHEMA
        )
        from tlhop_library_spark.operators.relational import ranked_topk

        return ranked_topk(
            local, [F.desc("score"), F.asc("doc_id")], k
        ).select("rank", "doc_id", "score")


def oracle_sql_bm25_multifield(
    query_text: str, field_exprs: dict[str, str],
    boosts: dict[str, float] | None = None, k: int = 10,
    table: str = "documents", doc_col: str = "doc_id",
) -> str:
    """DuckDB oracle: ``field_exprs`` maps field name → a SQL
    expression (over ``table``'s columns) producing that field's text;
    each field gets the full single-field BM25 CTE chain, contributions
    are boost-weighted and summed per doc."""
    boosts = boosts or {}
    terms = sorted(set(py_tokens(query_text)))
    terms_list = ", ".join("'" + t.replace("'", "''") + "'" for t in terms)
    blocks = []
    selects = []
    for f, expr in sorted(field_exprs.items()):
        boost = float(boosts.get(f, 1.0))
        if boost == 0.0:
            continue
        blocks.append(f"""
base_{f} AS (
  SELECT {doc_col} AS doc_id,
         list_filter(regexp_split_to_array(lower({expr}), '[^\\p{{L}}\\p{{N}}]+'),
                     t -> length(t) >= 3) AS tokens
  FROM {table} WHERE text IS NOT NULL
), base_dl_{f} AS (
  SELECT doc_id, len(tokens) AS dl, tokens FROM base_{f}
), stats_{f} AS (
  SELECT count(*) AS n, avg(dl) AS avgdl FROM base_dl_{f}
), tok_{f} AS (
  SELECT doc_id, dl, unnest(tokens) AS term FROM base_dl_{f}
), tf_{f} AS (
  SELECT doc_id, term, count(*) AS tf, max(dl) AS dl
  FROM tok_{f} WHERE term IN ({terms_list}) GROUP BY doc_id, term
), dfreq_{f} AS (
  SELECT term, count(*) AS df FROM tf_{f} GROUP BY term
), contrib_{f} AS (
  SELECT tf_{f}.doc_id,
         {boost} * ln(1 + (stats_{f}.n - dfreq_{f}.df + 0.5) / (dfreq_{f}.df + 0.5))
            * (tf_{f}.tf * ({bm25.K1} + 1)) /
              (tf_{f}.tf + {bm25.K1} * (1 - {bm25.B} + {bm25.B} * (tf_{f}.dl / stats_{f}.avgdl)))
         AS w
  FROM tf_{f}, dfreq_{f}, stats_{f} WHERE tf_{f}.term = dfreq_{f}.term
)""".strip())
        selects.append(f"SELECT doc_id, w FROM contrib_{f}")
    assert selects, "all fields zero-boosted"
    union = "\nUNION ALL\n".join(selects)
    return f"""
WITH {", ".join(blocks)},
allc AS (
{union}
), scored AS (
  SELECT doc_id, round(sum(w), {bm25.ROUND_DIGITS}) AS score
  FROM allc GROUP BY doc_id
)
SELECT CAST(row_number() OVER (ORDER BY score DESC, doc_id ASC) AS INT) AS rank,
       doc_id, score
FROM scored
QUALIFY rank <= {k}
ORDER BY rank
"""
