"""tlhop-style DataFrame extension accessor.

The reference monkey-patches a ``tlhop_extension`` property onto
``pyspark.sql.DataFrame`` exposing ~20 domain operators
(/root/reference/tlhop/tlhop_abstraction.py:21-136). Same ergonomics
here — ``df.tlhop.bm25_topk("spark join")`` — implemented as a small
accessor object over the operator library rather than per-call wrapper
generation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from tlhop_library_spark.index.query import score_exhaustive
from tlhop_library_spark.operators import dedup, relational
from tlhop_library_spark.operators import text as text_ops


class TlhopExtension:
    def __init__(self, df: DataFrame):
        self._df = df

    # full-text
    def bm25_topk(self, query: str, k: int = 10, doc_col: str = "doc_id"):
        return score_exhaustive(self._df, query, k, doc_col)

    # text analysis
    def token_stats(self):
        return text_ops.token_stats(self._df)

    def quality_score(self):
        return text_ops.quality_score(self._df)

    def lang_id(self):
        return text_ops.lang_id(self._df)

    def fingerprint(self):
        return text_ops.doc_fingerprint(self._df)

    def winnow_fingerprint(self, k: int = 4, window: int = 5):
        return text_ops.winnowing_fingerprint(self._df, k, window)

    def stopword_stats(self):
        return text_ops.stopword_stats(self._df)

    # dedup
    def dedup_exact(self):
        return dedup.dedup_exact(self._df)

    def near_dup_pairs(self, n: int = 3, threshold: float = 0.4, **kw):
        return dedup.ngram_jaccard_pairs(self._df, n, threshold, **kw)

    def near_dup_verified(self, n: int = 3, threshold: float = 0.4, **kw):
        return dedup.minhash_near_dup_pairs(self._df, n, threshold, **kw)

    def simhash(self):
        return dedup.simhash64(self._df)

    # training-data prep funnel
    def prepare_training_data(self, **kw):
        from tlhop_library_spark.pipeline import prepare_training_data

        return prepare_training_data(self._df, **kw)

    # relational conveniences (ref shodan_library frequency/cdf ops)
    def frequency(self, col: str, top: int | None = None):
        return relational.frequency(self._df, col, top)

    def gen_cdf_pdf(self, col: str):
        return relational.cdf_pdf(self._df, col)

    def null_profile(self):
        return relational.null_profile(self._df)

    def top1_per_group(self, group_cols, order_col, tie_col):
        return relational.top1_per_group(
            self._df, group_cols, order_col, tie_col
        )


def install() -> None:
    """Register ``DataFrame.tlhop`` (idempotent)."""
    if getattr(DataFrame, "tlhop", None) is None:
        DataFrame.tlhop = property(TlhopExtension)  # type: ignore[attr-defined]
