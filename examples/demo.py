"""End-to-end demo: corpus → convert → index → query → dedup → report.

Run locally:          PYTHONPATH=. python examples/demo.py
Run on a cluster:     zip -r tlhop.zip tlhop_library_spark
                      spark-submit --py-files tlhop.zip examples/demo.py
"""

import json
import tempfile
import time

from pyspark.sql import functions as F

from tlhop_library_spark.corpus import write_corpus_parquet
from tlhop_library_spark.extension import install
from tlhop_library_spark.index import IndexReader, build_index, score_exhaustive
from tlhop_library_spark.operators import dedup, similarity
from tlhop_library_spark.reports import CorpusReport
from tlhop_library_spark.session import get_spark


def main() -> None:
    spark = get_spark("demo")
    spark.sparkContext.setLogLevel("ERROR")
    work = tempfile.mkdtemp(prefix="tlhop_demo_")
    print(f"workdir: {work}")

    # 1. deterministic Common-Crawl-style corpus (url, warc_ts, html, text, lang)
    corpus = f"{work}/documents.parquet"
    write_corpus_parquet(corpus, n_docs=5000)
    docs = spark.read.parquet(corpus)
    print(f"corpus: {docs.count()} docs")

    # 2. verify the extraction invariant on a sample (html -> text)
    from tlhop_library_spark.extract import extract_text_udf

    mismatches = (
        docs.where(F.col("html").isNotNull())
        .withColumn("extracted", extract_text_udf(F.col("html")))
        .where(F.col("extracted") != F.col("text"))
        .count()
    )
    print(f"extraction byte-identity mismatches: {mismatches}")

    # 3. build the inverted index (salted, block-max, varint)
    t0 = time.time()
    stats = build_index(spark, docs, f"{work}/idx")
    print(
        f"index built: {stats['n_docs'] / (time.time() - t0):.0f} docs/sec, "
        f"phases={json.dumps(stats['phases'])}"
    )

    # 4. query: indexed block-max vs exhaustive (rank-identical)
    reader = IndexReader(spark, f"{work}/idx").cache()
    q = "informação segurança"
    print(f"\ntop-5 for {q!r}:")
    idx_rows = reader.search(q, k=5).collect()
    for r in idx_rows:
        print(f"  #{r['rank']}: doc {r['doc_id']} score {r['score']}")
    ex_rows = score_exhaustive(docs, q, 5).collect()
    assert [(r["doc_id"], r["score"]) for r in idx_rows] == [
        (r["doc_id"], r["score"]) for r in ex_rows
    ], "index and exhaustive paths disagree!"
    print("  (identical to the exhaustive declarative scorer)")

    # 4b. the round-2.2 query surface over the same index
    t0 = time.time()
    serve_rows = reader.search_serve(q, k=5).collect()
    assert [(r["doc_id"], r["score"]) for r in serve_rows] == [
        (r["doc_id"], r["score"]) for r in idx_rows
    ]
    print(f"serving path: same top-5 in {time.time() - t0:.3f}s "
          "(driver-side chunk scan, no Spark job)")
    nb = reader.search_boolean(
        "(informação OR segurança) AND NOT zzznope", k=3
    ).count()
    nf = reader.search_fuzzy("seguranca", k=3, max_edits=1).count()
    facets = {
        r["facet"]: r["n_docs"]
        for r in reader.facet_counts(q, docs, "lang").collect()
    }
    print(f"boolean hits: {nb}; fuzzy('seguranca') hits: {nf}; "
          f"facets: {facets}")

    # 4c. round-2.3: explain / total-hits / fsck / federation
    top_ex = reader.explain(q, k=3).collect()
    print(f"explain rows for top-3 (term components): {len(top_ex)}; "
          f"first: {top_ex[0].asDict() if top_ex else None}")
    n_any = reader.count_matches(q, "any").collect()[0]["n_docs"]
    n_all = reader.count_matches(q, "all").collect()[0]["n_docs"]
    print(f"total hits: any={n_any} all={n_all}")
    from tlhop_library_spark.index import (
        ShardedIndexReader,
        verify_index,
    )

    checks = {r["check"]: r["status"] for r in
              verify_index(spark, f"{work}/idx").collect()}
    print(f"fsck: {checks}")
    for i in range(2):
        build_index(
            spark, docs.where(F.col("doc_id") % 2 == i),
            f"{work}/shard{i}", n_buckets=4,
        )
    sharded = ShardedIndexReader(
        spark, [f"{work}/shard0", f"{work}/shard1"]
    )
    sh_rows = sharded.search(q, k=5).collect()
    assert [(r["doc_id"], r["score"]) for r in sh_rows] == [
        (r["doc_id"], r["score"]) for r in idx_rows
    ], "federated shards disagree with the single index!"
    print("sharded federation (2 shards, global Σ-stats): "
          "rank-identical to the single index")

    # 5. the tlhop-style extension accessor
    install()
    print("\nlanguage frequency (df.tlhop.frequency):")
    for r in docs.tlhop.frequency("lang", top=3).collect():
        print(f"  {r['lang']}: {r['count']}")

    # 6. dedup: exact + near-dup (hashed 128-bit shingle keys — the
    # at-scale join, identical results to the string path) + a
    # boilerplate-shingle skew guard
    n_exact = dedup.exact_dup_groups(docs).count()
    pairs = dedup.ngram_jaccard_pairs(
        docs, threshold=0.8, max_shingle_df=1000, hashed_shingles=True
    ).count()
    print(f"\nexact dup groups: {n_exact}; jaccard>=0.8 pairs: {pairs}")

    # 7. fingerprints with difflib confidence weighting (reference's
    # hyperscan+difflib pipeline, Arrow-batched)
    from tlhop_library_spark.operators.fingerprints import (
        match_arrow_weighted,
    )

    corpus_patterns = [
        ("bace-page", r"\bbace\b", 0.9),
        ("cada-page", r"\bcada\w*", 0.7),
    ]
    fp = match_arrow_weighted(docs, "text", corpus_patterns)
    n_fp = fp.where(F.size("fingerprints") > 0).count()
    print(f"docs with weighted fingerprint hits: {n_fp}")

    # 8. embedding near-dup via multi-table LSH with per-bucket matmul
    # verification (no driver collect)
    import numpy as np

    rng = np.random.default_rng(3)
    vecs = [rng.standard_normal(64) for _ in range(500)]
    vecs.append(vecs[0] + 0.05 * rng.standard_normal(64))  # planted near-dup
    emb = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<double>",
    )
    nd = similarity.embedding_near_dup_lsh(
        emb, threshold=0.9, n_planes=4, n_tables=4, dim=64
    ).count()
    print(f"embedding near-dup pairs (cos>=0.9): {nd}")

    # 9. training-data prep funnel (quality → exact dedup → near-dup)
    from tlhop_library_spark.pipeline import training_data_summary

    funnel = training_data_summary(docs).collect()[0]
    print(f"\ntraining-data funnel: {funnel.asDict()}")

    # 10. offline index optimize: coarsen the range salt 4×, searches
    # stay rank-identical with fewer chunks per query
    from tlhop_library_spark.index import merge_index_ranges

    merge_index_ranges(spark, f"{work}/idx", f"{work}/idx_merged", factor=4)
    merged = IndexReader(spark, f"{work}/idx_merged")
    m_rows = merged.search(q, k=5).collect()
    assert [(r["doc_id"], r["score"]) for r in m_rows] == [
        (r["doc_id"], r["score"]) for r in idx_rows
    ], "merged index diverged!"
    print("merged index (factor 4): search rank-identical")

    # 11. corpus report suite
    rep = CorpusReport(spark, f"{work}/report").run_all(docs)
    print("\nreport summary:", rep["summary"].collect()[0].asDict())

    # 12. round-2.4: collector operators + ranking models on the same
    # index — boosts, DisMax, pluggable similarities, cursor paging,
    # field sort, collapse, range facets
    reader = IndexReader(spark, f"{work}/idx")
    print(
        "\nboosted:",
        [r["doc_id"] for r in reader.search_boosted(f"{q}^2", k=3).collect()],
    )
    print(
        "dismax:",
        [r["doc_id"] for r in reader.search_dismax(q, 3, 0.3).collect()],
    )
    print(
        "lmdirichlet:",
        [r["doc_id"] for r in reader.search_sim(q, 3, "lmdirichlet").collect()],
    )
    cur = reader.search(q, k=3).collect()[-1]
    print(
        "page-2 via searchAfter:",
        [
            r["doc_id"]
            for r in reader.search_after(
                q, (cur["score"], cur["doc_id"]), k=3
            ).collect()
        ],
    )
    docs_n = docs.withColumn("n_chars", F.length("text"))
    print(
        "shortest matching docs:",
        [
            (r["doc_id"], r["n_chars"])
            for r in reader.search_sorted_by(q, docs_n, "n_chars", 3).collect()
        ],
    )
    print(
        "best per lang:",
        [
            (r["lang"], r["doc_id"])
            for r in reader.search_collapse(q, docs, "lang", 3).collect()
        ],
    )

    # 13. corpus statistics for a training-data pipeline
    from tlhop_library_spark.operators import corpus_stats

    kw = corpus_stats.tfidf_keywords(docs.limit(50), m=2).count()
    print(f"\ntfidf keyword rows (50 docs, m=2): {kw}")
    samp = corpus_stats.stratified_sample(
        docs, "lang", {"pt": 0.5, "en": 0.5}
    ).count()
    print(f"deterministic stratified sample: {samp} docs kept")


if __name__ == "__main__":
    main()
