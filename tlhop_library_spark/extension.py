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

    # web-corpus cleaning (operators/cleaning.py)
    def gopher_repetition(self, n_top: int = 2, n_dup: int = 5):
        from tlhop_library_spark.operators import cleaning

        return cleaning.ngram_repetition_stats(self._df, n_top, n_dup)

    def gopher_quality(self, **kw):
        from tlhop_library_spark.operators import cleaning

        return cleaning.gopher_quality_flags(self._df, **kw)

    def c4_clean(self, **kw):
        from tlhop_library_spark.operators import cleaning

        return cleaning.c4_clean(self._df, **kw)

    def line_dedup(self, min_df: int = 2, **kw):
        from tlhop_library_spark.operators import cleaning

        return cleaning.line_dedup(self._df, min_df, **kw)

    def dup_span_stats(self, w: int = 8, min_df: int = 2, **kw):
        from tlhop_library_spark.operators import cleaning

        return cleaning.duplicated_span_stats(self._df, w, min_df, **kw)

    # SemDeDup over an embedding column (expects vec_id/embedding
    # unless overridden via id_col/vec_col)
    def semantic_dedup(self, threshold: float = 0.85, **kw):
        from tlhop_library_spark.operators import similarity

        return similarity.semantic_dedup(self._df, threshold, **kw)

    # training-data prep funnel
    def learn_bpe(self, n_merges: int = 100, **kw):
        from tlhop_library_spark.operators.bpe import learn_bpe

        return learn_bpe(self._df, n_merges, **kw)

    def bpe_token_count(self, merges, **kw):
        from tlhop_library_spark.operators.bpe import bpe_token_count

        return bpe_token_count(self._df, merges, **kw)

    def pack_blocks(self, block_len: int = 2048, **kw):
        from tlhop_library_spark.operators.packing import pack_blocks

        return pack_blocks(self._df, block_len, **kw)

    def packing_summary(self, block_len: int = 2048, **kw):
        from tlhop_library_spark.operators.packing import packing_summary

        return packing_summary(self._df, block_len, **kw)

    def prepare_training_data(self, **kw):
        from tlhop_library_spark.pipeline import prepare_training_data

        return prepare_training_data(self._df, **kw)

    # URL / domain curation (operators/web.py)
    def url_features(self, url_col: str = "url"):
        from tlhop_library_spark.operators import web

        return web.with_url_features(self._df, url_col)

    def url_dedup(self, url_col: str = "url", key_col: str = "doc_id"):
        from tlhop_library_spark.operators import web

        return web.url_dedup(self._df, url_col, key_col)

    def domain_topk(self, k: int = 10, url_col: str = "url"):
        from tlhop_library_spark.operators import web

        return web.domain_topk(self._df, k, url_col)

    def domain_blocklist(self, blocked, url_col: str = "url"):
        from tlhop_library_spark.operators import web

        return web.blocklist_filter(self._df, blocked, url_col)

    def domain_temperature_sample(self, alpha: float = 0.5, **kw):
        from tlhop_library_spark.operators import web

        return web.domain_temperature_sample(self._df, alpha, **kw)

    def redact_pii(self, text_col: str = "text"):
        from tlhop_library_spark.operators import cleaning

        return cleaning.redact_pii(self._df, text_col)

    def percolate(self, queries_df, doc_col: str = "doc_id"):
        from tlhop_library_spark.operators.percolate import percolate

        return percolate(self._df, queries_df, doc_col)

    # embedding-store quantization (round 4; frame = embeddings table)
    def pq_train(self, m: int = 4, k: int = 16, **kw):
        from tlhop_library_spark.operators.pq import train_pq

        return train_pq(self._df, m=m, k=k, **kw)

    def pq_encode(self, codebooks, **kw):
        from tlhop_library_spark.operators.pq import pq_encode

        return pq_encode(self._df, codebooks, **kw)

    def pq_topk(self, codebooks, qvec, k: int = 10):
        """Frame = a pq_encode output (vec_id, codes)."""
        from tlhop_library_spark.operators.pq import pq_topk

        return pq_topk(self._df, codebooks, qvec, k)

    def pq_store_write(self, path: str, codebooks, coarse, **kw):
        """Frame = embeddings table; residual-encode once and persist
        the cell-partitioned code store (operators/pq_store.py).
        Returns the lineage manifest."""
        from tlhop_library_spark.operators.pq_store import (
            write_pq_store,
        )

        return write_pq_store(self._df, path, codebooks, coarse, **kw)

    # webpage / screenshot wrappers (ref shodan_library.py:95-215,
    # tlhop_abstraction.py:61-82)
    def describe_html(self, html_col: str = "html",
                      title_col: str = "title"):
        """Adds ``webpage_stats`` (CODE_AND_TITLE/ONLY_CODE/ONLY_TITLE/
        BOTH_EMPTY). The reference wrapper is broken (calls a
        nonexistent function); this is the working equivalent."""
        from pyspark.sql import functions as F

        from tlhop_library_spark.functions import strings

        return self._df.withColumn(
            "webpage_stats",
            strings.webpage_stats(F.col(html_col), F.col(title_col)),
        )

    def filter_valid_html_page(self, hash_col: str = "html_hash",
                               status_col: str = "http_code"):
        """ref shodan_library.py:104-116: non-zero/non-null page hash
        AND 200 status."""
        from pyspark.sql import functions as F

        return self._df.filter(
            (F.col(hash_col) != "0")
            & F.col(hash_col).isNotNull()
            & (F.col(status_col) == "200_HTTP_OK")
        )

    def get_html_lang(self, input_col: str = "html",
                      output_col: str = "html_lang"):
        """ref shodan_library.py:118-130: lang attr regexp → ISO-639
        normalized name, all JVM-side."""
        from pyspark.sql import functions as F

        from tlhop_library_spark.functions import strings

        return self._df.withColumn(
            output_col,
            strings.normalize_lang_code(
                strings.html_lang_attr(F.col(input_col))
            ),
        )

    def filter_banners_with_screenshot(self, opts_col: str = "opts"):
        """ref shodan_library.py:168-175: rows whose opts JSON carries
        a screenshot payload."""
        from pyspark.sql import functions as F

        return self._df.filter(F.col(opts_col).contains("screenshot"))

    def extract_screenshot(self, opts_col: str = "opts"):
        """ref shodan_library.py:177-200: opts JSON → screenshot_labels
        + screenshot_img (inline <img> tag). from_json + JVM concat —
        the reference does this via a scalar get_fields UDF."""
        from pyspark.sql import functions as F

        from tlhop_library_spark.functions import strings

        shot = F.from_json(
            F.get_json_object(F.col(opts_col), "$.screenshot"),
            "labels array<string>, mime string, data string",
        )
        return (
            self._df.withColumn("__shot", shot)
            .withColumn("screenshot_labels", F.col("__shot.labels"))
            .withColumn(
                "screenshot_img",
                strings.screenshot_img_tag(
                    F.col("__shot.mime"), F.col("__shot.data")
                ),
            )
            .drop("__shot")
        )

    def to_html(self, size: int = 1000) -> str:
        """ref shodan_library.py:203-215 print_screenshot: first
        ``size`` rows (hard-capped at 1000 like the reference) as an
        unescaped HTML table string (IPython-free: returns the HTML;
        wrap in IPython.display.HTML yourself if in a notebook)."""
        return self._df.limit(min(size, 1000)).toPandas().to_html(
            escape=False
        )

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
