"""Benchmark harness (driver contract).

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS], plus the engine's
own index-build + indexed-BM25-query benchmark on the deterministic
synthetic corpus, and prints ONE JSON line:

    {"metric": ..., "value": <total sec>, "unit": "sec",
     "queries": {name: sec, ...}, "sf": ...,
     "index": {"build_docs_per_sec": ..., "query_p50_sec": ...}}

The N-vs-4N scaling study (local[8] vs local[32]) is a separate,
longer run: tools/bench_scaling.py → BENCH.md.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

import __spark_entry__ as entry_mod
from tlhop_library_spark.session import get_spark

HEADLINE = [
    "bm25_topk",
    "bm25_topk_head",
    "term_df",
    "term_topk_freq",
    "doc_lengths",
    "token_stats",
    "text_quality",
    "lang_id",
    "doc_fingerprint",
    "dedup_exact",
    "ngram_jaccard_pairs",
    "minhash_lsh_pairs",
    "cosine_topk",
    "q1_pricing_summary",
    "top1_order_per_cust",
    "nation_revenue",
    "multi_distinct_orders",
    "range_join_qty",
    "pivot_events",
    "hourly_events",
    "semi_filter_customers",
    "topn_orders",
    "explode_regroup_docs",
    "sessionize_events",
    "corr_lineitem",
    "embedding_near_dup",
    "extract_html_info",
    "lsh_topk",
    "knn_join_topk",
    "ngram_jaccard_capped",
    "minhash_verified_pairs",
    "ivf_topk",
    "winnow_fingerprint",
    "training_data_prep",
    "tfidf_keywords",
    "pmi_collocations",
    "contamination",
    "stratified_sample",
    "url_normalize",
    "url_dedup",
    "domain_topk",
    "domain_temperature",
    "kmv_distinct_terms",
    "redact_pii",
    "span_near",
    "sig_terms",
    "term_autocomplete",
    "phrase_prefix",
    "phrase_suggest",
    "hybrid_rrf",
    "facet_lang_stored",
    "bm25_rescored",
    "bm25_best_fields",
    "bm25_decay",
    "bm25_group_topk",
    "percolate_matches",
    "span_not",
    "bm25_boosting",
    "bm25_random_page",
    "terms_set_msm",
    "facet_stats_nchars",
    "facet_composite_page2",
    "slice_scan_docs",
    "bm25_highlight",
    "facet_date_histogram",
    "packing_summary",
    "bm25_combined_fields",
    "rank_eval_bm25",
    "bm25_scan_slice",
    "embedding_quantize",
]

BENCH_CORPUS_DOCS = int(os.environ.get("SPARK_GRAFT_BENCH_DOCS", "30000"))
BENCH_QUERIES = [
    ("bace cada", 10),
    ("informação segurança", 10),
    ("dadu cadi bace", 10),
    ("tesa", 10),
    ("bace cada dade lano", 20),
    ("coração", 5),
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        "bench", master=f"local[{cpus}]", shuffle_partitions=int(cpus)
    )
    spark.sparkContext.setLogLevel("ERROR")

    # Warm the session with NON-headline work (a scan count + a
    # trivial pandas_udf) so per-query timings measure the query, not
    # JVM codegen warmup / Python-worker pool spin-up / FS cache fill.
    from pyspark.sql import functions as F

    for t in ("documents", "embeddings", "lineitem", "orders", "events"):
        spark.read.parquet(f"{sf_dir}/{t}.parquet").count()
    spark.range(10000).repartition(int(cpus)).select(
        F.pandas_udf(lambda s: s, "long")(F.col("id")).alias("x")
    ).count()

    qs = entry_mod.queries()
    # One NON-headline search gate through the exhaustive-scoring plan
    # shape: its first execution pays the plan-specific JVM codegen /
    # JIT warm-up that would otherwise land on bm25_topk's first
    # sample (measured 4x decay over repeats of the same plan).
    qs["bm25_conjunctive"](spark, sf_dir).collect()
    per_query: dict[str, float] = {}
    samples: dict[str, list[float]] = {}
    total = 0.0
    # Median-of-N timing (round-2 verdict "what's wrong #3"): a single
    # pass conflates a query's cost with the JVM/GC/host state the
    # preceding queries left behind (q1_pricing_summary read 4.1x its
    # isolated cost in r02). Each query runs up to 3 times and the
    # MEDIAN is recorded; queries whose first run exceeds the budget
    # run once (re-running an 11s funnel 3x would triple bench wall
    # time to re-measure queries that were never flagged). The budget
    # sits ABOVE the heaviest cold-start decay observed (bm25_topk's
    # first run costs up to 4x its steady state from plan-specific
    # codegen + Arrow buffer warmup: 6.2->3.3->2.3->1.5s isolated), so
    # warm-up-dominated queries get their repeats; only genuinely
    # heavy multi-stage funnels (>10s steady) run once.
    REPEAT_BUDGET_SEC = 10.0
    for name in HEADLINE:
        runs = []
        n = 0
        for it in range(3):
            t0 = time.time()
            n = len(qs[name](spark, sf_dir).collect())
            runs.append(time.time() - t0)
            if it == 0 and runs[0] > REPEAT_BUDGET_SEC:
                break
        med = sorted(runs)[len(runs) // 2]
        per_query[name] = round(med, 3)
        samples[name] = [round(x, 3) for x in runs]
        total += med
        print(
            f"# {name}: {med:.2f}s median of "
            f"{[round(x, 2) for x in runs]} ({n} rows)",
            file=sys.stderr,
        )

    # index build + query benchmark on the deterministic corpus
    import shutil
    import tempfile

    from tlhop_library_spark.corpus import write_corpus_parquet
    from tlhop_library_spark.index import IndexReader, build_index

    workdir = tempfile.mkdtemp(prefix="tlhop_bench_")
    try:
        corpus_path = os.path.join(workdir, "docs.parquet")
        write_corpus_parquet(corpus_path, n_docs=BENCH_CORPUS_DOCS)
        docs = spark.read.parquet(corpus_path)
        t0 = time.time()
        stats = build_index(
            spark, docs, os.path.join(workdir, "idx"), n_jobs=2
        )
        build_sec = time.time() - t0
        docs_per_sec = stats["n_docs"] / build_sec
        per_query["index_build"] = round(build_sec, 3)
        total += build_sec
        print(
            f"# index_build: {build_sec:.2f}s "
            f"({docs_per_sec:.0f} docs/sec, {stats['n_docs']} docs)",
            file=sys.stderr,
        )

        reader = IndexReader(spark, os.path.join(workdir, "idx")).cache()
        lat = []
        # warm with a REAL indexed term: an absent term short-circuits
        # before applyInPandas, leaving the Python scorer workers cold
        reader.search("bace", 10).collect()
        for q, k in BENCH_QUERIES:
            t0 = time.time()
            reader.search(q, k).collect()
            lat.append(time.time() - t0)
        lat.sort()
        p50 = lat[len(lat) // 2]
        per_query["index_query_p50"] = round(p50, 3)
        total += sum(lat)
        print(f"# index_query latencies: {[round(x,2) for x in lat]}", file=sys.stderr)

        # round-2.1 query modes over the same warm index
        t0 = time.time()
        reader.search_and("bace cada", 10).collect()
        per_query["index_query_and"] = round(time.time() - t0, 3)
        total += per_query["index_query_and"]
        t0 = time.time()
        reader.search_snippets("bace cada", docs, 10).collect()
        per_query["index_query_snippets"] = round(time.time() - t0, 3)
        total += per_query["index_query_snippets"]
        t0 = time.time()
        reader.search_boolean("(bace OR cada) AND NOT tesa", 10).collect()
        per_query["index_query_boolean"] = round(time.time() - t0, 3)
        total += per_query["index_query_boolean"]
        t0 = time.time()
        reader.search_filtered(
            "bace cada", docs.where(F.col("doc_id") % 2 == 0), 10
        ).collect()
        per_query["index_query_filtered"] = round(time.time() - t0, 3)
        total += per_query["index_query_filtered"]
        # serving path: driver-side pyarrow scan of just the query's
        # chunks + the same numpy kernel — no Spark job per query
        reader.search_local("bace", 10).collect()  # warm dataset handle
        slat = []
        for q, kk in BENCH_QUERIES:
            t0 = time.time()
            reader.search_serve(q, kk).collect()
            slat.append(time.time() - t0)
        slat.sort()
        per_query["index_query_serve_p50"] = round(
            slat[len(slat) // 2], 3
        )
        total += sum(slat)
        print(
            f"# serving-path latencies: {[round(x, 3) for x in slat]}",
            file=sys.stderr,
        )
        t0 = time.time()
        reader.search_fuzzy("bce cda", 10).collect()
        per_query["index_query_fuzzy"] = round(time.time() - t0, 3)
        total += per_query["index_query_fuzzy"]
        t0 = time.time()
        reader.facet_counts("bace cada", docs, "lang").collect()
        per_query["index_facets"] = round(time.time() - t0, 3)
        total += per_query["index_facets"]
        # round-2.3 modes over the same warm index
        t0 = time.time()
        reader.search_expanded("bace cada", 10).collect()
        per_query["index_query_expanded"] = round(time.time() - t0, 3)
        total += per_query["index_query_expanded"]
        t0 = time.time()
        reader.search_synonyms(
            "informação", {"informação": ["segurança"]}, 10
        ).collect()
        per_query["index_query_synonyms"] = round(time.time() - t0, 3)
        total += per_query["index_query_synonyms"]
        t0 = time.time()
        reader.explain("bace cada", 10).collect()
        per_query["index_query_explain"] = round(time.time() - t0, 3)
        total += per_query["index_query_explain"]
        t0 = time.time()
        reader.count_matches("bace cada", "any").collect()
        per_query["index_count_any"] = round(time.time() - t0, 3)
        total += per_query["index_count_any"]
        t0 = time.time()
        reader.search_wildcard("bac* cada", 10).collect()
        per_query["index_query_wildcard"] = round(time.time() - t0, 3)
        total += per_query["index_query_wildcard"]
        # round-2.4 modes: collector-style operators + rescoring models
        t0 = time.time()
        reader.search_dismax("bace cada", 10, tie_breaker=0.3).collect()
        per_query["index_query_dismax"] = round(time.time() - t0, 3)
        total += per_query["index_query_dismax"]
        t0 = time.time()
        reader.search_sim("bace cada", 10, "lmdirichlet").collect()
        per_query["index_query_lmdirichlet"] = round(time.time() - t0, 3)
        total += per_query["index_query_lmdirichlet"]
        t0 = time.time()
        reader.search_collapse("bace cada", docs, "lang", 10).collect()
        per_query["index_query_collapse"] = round(time.time() - t0, 3)
        total += per_query["index_query_collapse"]

        batch_in = [(i, q, k) for i, (q, k) in enumerate(BENCH_QUERIES)]
        t0 = time.time()
        reader.search_many(batch_in).collect()
        batch_sec = time.time() - t0
        per_query["index_query_batch"] = round(batch_sec, 3)
        total += batch_sec
        qps = len(BENCH_QUERIES) / batch_sec
        print(f"# batch mode: {qps:.1f} queries/sec", file=sys.stderr)
        t0 = time.time()
        reader.search_many_local(batch_in).collect()
        sbatch = time.time() - t0
        per_query["index_query_batch_serve"] = round(sbatch, 3)
        total += sbatch
        print(
            f"# batch serving mode: {len(BENCH_QUERIES) / sbatch:.1f} "
            "queries/sec",
            file=sys.stderr,
        )
    finally:
        shutil.rmtree(workdir, ignore_errors=True)

    print(
        json.dumps(
            {
                "metric": "headline_queries_plus_index_total",
                "value": round(total, 3),
                "unit": "sec",
                "queries": per_query,
                "samples": samples,
                "timing": "median of <=3 runs per headline query "
                "(1 run if first exceeds 5s); index modes 1 run",
                "sf": sf_dir.rstrip("/").split("sf")[-1],
                "index": {
                    "corpus_docs": stats["n_docs"],
                    "build_docs_per_sec": round(docs_per_sec, 1),
                    "query_p50_sec": round(p50, 3),
                    "serve_p50_sec": per_query["index_query_serve_p50"],
                },
            }
        )
    )


if __name__ == "__main__":
    main()
