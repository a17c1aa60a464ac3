"""tlhop_library_spark — a PySpark-native inverted-index + BM25 engine.

A from-scratch re-expression of the query and data-processing
capabilities of the reference ``lucasmsp/tlhop-library`` (studied at
/root/reference, see SURVEY.md) as an idiomatic Spark-first engine:

- ``analyzer``   — frozen tokenizer spec (v1), identical in Spark and SQL.
- ``bm25``       — BM25 scoring math (k1=1.2, b=0.75), one shared module.
- ``codecs``     — vectorized numpy varint / delta-gap posting codecs.
- ``corpus``     — deterministic Common-Crawl-style corpus generator.
- ``extract``    — vectorized (Arrow) HTML → text extraction, matching the
                   reference's ``parser_html_code_udf`` body semantics.
- ``index``      — inverted-index build (salted, block-max segments),
                   manifest/resume, and the query engine (exhaustive +
                   block-max pruned top-k).
- ``operators``  — relational / dedup / similarity / text-analysis /
                   multimodal operator library (SURVEY.md §2 parity).
- ``sources``    — table IO abstraction (parquet locally; Iceberg when a
                   catalog is configured).

No scalar (row-wise) Python UDFs anywhere: Python compute is confined to
Arrow-batched ``pandas_udf`` / ``mapInArrow`` / ``applyInPandas`` kernels.
"""

__version__ = "0.1.0"
