"""End-to-end rank identity: indexed paths == exhaustive DataFrame path
== numpy brute-force oracle, on the deterministic Zipfian corpus.

Query mix per FIXTURES.md §2: single head term, single tail term,
all-tail conjunction, head+tail, absent term, term only in NULL-html
docs, k=1, k > matches.
"""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from tlhop_library_spark import bm25
from tlhop_library_spark.analyzer import py_tokens
from tlhop_library_spark.corpus import build_vocab, generate_corpus
from tlhop_library_spark.index.build import IndexBuilder
from tlhop_library_spark.index.query import IndexReader, score_exhaustive


def numpy_oracle(corpus, query, k):
    """Brute-force BM25 on the raw corpus dict (independent impl)."""
    docs = [
        (d, py_tokens(t))
        for d, t in zip(corpus["doc_id"], corpus["text"])
        if t is not None
    ]
    n = len(docs)
    avgdl = sum(len(t) for _, t in docs) / n
    qterms = sorted(set(py_tokens(query)))
    df = {
        q: sum(1 for _, t in docs if q in t) for q in qterms
    }
    out = []
    for d, toks in docs:
        dl = len(toks)
        s = 0.0
        hit = False
        for q in qterms:
            tf = toks.count(q)
            if tf == 0 or df[q] == 0:
                continue
            hit = True
            idf = math.log(1 + (n - df[q] + 0.5) / (df[q] + 0.5))
            s += idf * tf * (bm25.K1 + 1) / (
                tf + bm25.K1 * (1 - bm25.B + bm25.B * dl / avgdl)
            )
        if hit:
            out.append((d, round(s, bm25.ROUND_DIGITS)))
    out.sort(key=lambda x: (-x[1], x[0]))
    return [(i + 1, d, s) for i, (d, s) in enumerate(out[:k])]


@pytest.fixture(scope="module")
def corpus():
    return generate_corpus(800)


@pytest.fixture(scope="module")
def queries(corpus):
    vocab = build_vocab()
    head = vocab[10]  # frequent (skip accented seeds at 0-9)
    tail = None
    # find a df=1 term
    from collections import Counter

    c = Counter()
    for t in corpus["text"]:
        if t:
            c.update(set(py_tokens(t)))
    for w, n in c.items():
        if n == 1:
            tail = w
            break
    mid = next(w for w, n in c.items() if 5 <= n <= 20)
    return [
        (head, 10),
        (tail, 10),
        (f"{tail} {mid}", 10),
        (f"{head} {tail}", 10),
        ("zzzznotaterm", 10),
        (f"{head} {mid}", 1),
        (tail, 100),  # k > matches
        (f"{head} {mid} {tail}", 25),
        ("ação informação", 10),  # accented
    ]


def _rows(df):
    return [(r["rank"], r["doc_id"], r["score"]) for r in df.orderBy("rank").collect()]


def test_exhaustive_vs_numpy_oracle(spark, corpus_df, corpus, queries):
    for q, k in queries:
        got = _rows(score_exhaustive(corpus_df, q, k))
        want = numpy_oracle(corpus, q, k)
        assert got == pytest.approx(want), f"query={q!r} k={k}"


@pytest.mark.parametrize("mode", ["exhaustive", "bmw"])
def test_indexed_vs_numpy_oracle(spark, index_dir, corpus, queries, mode):
    reader = IndexReader(spark, index_dir)
    for q, k in queries:
        got = _rows(reader.search(q, k, mode=mode))
        want = numpy_oracle(corpus, q, k)
        assert got == pytest.approx(want), f"mode={mode} query={q!r} k={k}"


def test_index_stats(spark, index_dir, corpus):
    reader = IndexReader(spark, index_dir)
    n_expected = sum(1 for t in corpus["text"] if t is not None)
    assert reader.stats["n_docs"] == n_expected
    assert reader.stats["analyzer"] == "v1"
    # dictionary df matches brute force for a few terms
    from collections import Counter

    c = Counter()
    for t in corpus["text"]:
        if t:
            c.update(set(py_tokens(t)))
    some = list(c.items())[:20]
    info = reader.lookup_terms([w for w, _ in some])
    for w, n in some:
        assert info[w][0] == n, w


def test_search_many_equals_sequential(spark, index_dir, queries):
    reader = IndexReader(spark, index_dir)
    batch_in = [(i, q, k) for i, (q, k) in enumerate(queries)]
    rows = reader.search_many(batch_in).collect()
    got = {}
    for r in rows:
        got.setdefault(r["query_id"], []).append(
            (r["rank"], r["doc_id"], r["score"])
        )
    for i, (q, k) in enumerate(queries):
        seq = _rows(reader.search(q, k))
        assert sorted(got.get(i, [])) == sorted(seq), f"query={q!r}"


def test_manifest_metrics(spark, index_dir):
    m = spark.read.parquet(f"{index_dir}/manifest")
    rows = m.collect()
    assert {r["status"] for r in rows} == {"complete"}
    assert all(r["postings_written"] > 0 for r in rows)
    assert all(r["skew_ratio"] >= 1.0 for r in rows)
    assert all(r["bytes_written"] > 0 for r in rows)


def test_resume_skips_completed_and_is_identical(
    spark, corpus_df, index_dir, tmp_path
):
    """Kill-and-resume ≡ cold build (segment-group granularity)."""
    import shutil

    d2 = str(tmp_path / "idx2")
    b = IndexBuilder(spark, d2, n_buckets=8, n_ranges=8, n_jobs=2)
    b.build(corpus_df)
    # simulate a crash after group_0: drop group_1 + its manifest rows
    shutil.rmtree(f"{d2}/segments/bucket_group=1")
    man = spark.read.parquet(f"{d2}/manifest").where(
        F.col("segment_group") != "group_1"
    )
    pdf = man.toPandas()
    shutil.rmtree(f"{d2}/manifest")
    spark.createDataFrame(pdf).write.mode("overwrite").parquet(f"{d2}/manifest")

    b.build(corpus_df, resume=True)

    cold = spark.read.parquet(f"{index_dir}/segments").select(
        "tid", "range_id", "n_postings", "doc_bytes", "tf_bytes"
    )
    warm = spark.read.parquet(f"{d2}/segments").select(
        "tid", "range_id", "n_postings", "doc_bytes", "tf_bytes"
    )
    assert cold.exceptAll(warm).count() == 0
    assert warm.exceptAll(cold).count() == 0


def test_bmw_pruning_engages_on_deep_chunks(spark, tmp_path):
    """With one doc range (deepest chunks), the bmw scan must skip a
    nonzero fraction of blocks on a high-df query, while staying
    rank-identical to the exhaustive mode."""
    from tlhop_library_spark.corpus import write_corpus_parquet

    p = str(tmp_path / "docs8k.parquet")
    write_corpus_parquet(p, n_docs=8000)
    docs = spark.read.parquet(p)
    d = str(tmp_path / "deep_idx")
    IndexBuilder(spark, d, n_buckets=8, n_ranges=1).build(docs)
    reader = IndexReader(spark, d)
    # 'coração' is among the Zipf-head seeds → large df, deep chunks
    q = "coração tesa"
    bmw = _rows(reader.search(q, k=5, mode="bmw", with_pruning_stats=True))
    stats = reader.last_pruning_stats()
    ex = _rows(reader.search(q, k=5, mode="exhaustive"))
    assert bmw == ex
    assert stats["blocks_total"] > 50
    assert stats["blocks_decoded"] < stats["blocks_total"], stats


def test_auto_mode_identical(spark, index_dir, queries):
    reader = IndexReader(spark, index_dir)
    for q, k in queries:
        assert _rows(reader.search(q, k, mode="auto")) == _rows(
            reader.search(q, k, mode="exhaustive")
        ), q


@pytest.mark.parametrize("seed", [7, 99])
def test_random_seed_corpora_rank_identity(spark, tmp_path, seed):
    """FIXTURES §4 property check: on random seeded corpora,
    index(query) ≡ numpy oracle."""
    from tlhop_library_spark.corpus import generate_corpus, write_corpus_parquet

    p = str(tmp_path / f"c{seed}.parquet")
    write_corpus_parquet(p, n_docs=400, seed=seed)
    corpus = generate_corpus(400, seed=seed)
    docs = spark.read.parquet(p)
    d = str(tmp_path / f"i{seed}")
    IndexBuilder(spark, d, n_buckets=4, n_ranges=4).build(docs)
    reader = IndexReader(spark, d)
    # derive two queries from the corpus itself
    toks = py_tokens(corpus["text"][10])[:3]
    queries = [" ".join(toks), toks[0], "coração " + toks[-1]]
    for q in queries:
        got = _rows(reader.search(q, 10))
        want = numpy_oracle(corpus, q, 10)
        assert got == pytest.approx(want), f"seed={seed} q={q!r}"


def test_default_range_sizing(spark, corpus_df, tmp_path):
    """n_ranges defaults from CORPUS SIZE (~RANGE_DOCS docs per range),
    not from shuffle partitions. Round-4 stress finding at a realistic
    364k-term vocabulary: 64 fixed ranges at 1M docs shredded the
    postings into 11.4M chunks (p50 = 1 posting/chunk — every tail
    term split across every range) and kept torso chunks too shallow
    for block-max pruning to engage. Sizing by docs-per-range bounds
    both: tail terms get ≤ df chunks, torso chunks cross the BMW
    depth, and the encoder group (one stopword × one range) stays a
    few MB at any corpus size."""
    from tlhop_library_spark.index import build_index
    from tlhop_library_spark.index.build import RANGE_DOCS, default_n_ranges

    assert default_n_ranges(800) == 1
    assert default_n_ranges(RANGE_DOCS) == 1
    assert default_n_ranges(RANGE_DOCS + 1) == 2
    assert default_n_ranges(1_000_000) == math.ceil(1_000_000 / RANGE_DOCS)
    assert default_n_ranges(10**12) == math.ceil(10**12 / RANGE_DOCS)
    assert default_n_ranges(10**13) == 1 << 22  # range_id stays bounded
    d = str(tmp_path / "idx_default")
    build_index(spark, corpus_df, d)
    reader = IndexReader(spark, d)
    assert int(reader.stats["n_ranges"]) == 1
    got = _rows(reader.search("coração tesa", 5, mode="bmw"))
    assert got == _rows(reader.search("coração tesa", 5, mode="exhaustive"))


def test_bursty_corpus_bmw_identity(spark, tmp_path):
    """On a burst-heavy corpus (within-doc tf up to ~100 concentrated
    in single blocks) the stored block-max bounds must remain true
    upper bounds: bmw pruning stays exactly rank- and score-identical
    to the exhaustive scan, for bursty pool terms and stopwords."""
    from tlhop_library_spark.corpus import write_corpus_parquet_fast

    p = str(tmp_path / "bursty.parquet")
    write_corpus_parquet_fast(p, 4000, vocab_size=20_000)
    docs = spark.read.parquet(p)
    d = str(tmp_path / "bidx")
    IndexBuilder(spark, d, n_buckets=8, n_ranges=1).build(docs)
    reader = IndexReader(spark, d)
    vocab = build_vocab(20_000)
    for q in (vocab[60], f"coração {vocab[60]}", f"{vocab[55]} {vocab[90]}"):
        got = _rows(reader.search(q, 10, mode="bmw"))
        assert got == _rows(reader.search(q, 10, mode="exhaustive")), q


def test_per_partition_metrics_table(spark, index_dir):
    """The per-bucket metrics table (north-star per-partition
    contract): one row per (segment_group, bucket); partition sums
    must reconcile with the per-group manifest rows."""
    from tlhop_library_spark.index import IndexReader

    met = IndexReader(spark, index_dir).build_metrics()
    rows = met.collect()
    assert rows
    assert all(r["postings_written"] > 0 for r in rows)
    assert all(r["bytes_written"] > 0 for r in rows)
    assert all(r["skew_ratio"] >= 1.0 for r in rows)
    keys = [(r["segment_group"], r["bucket"]) for r in rows]
    assert len(keys) == len(set(keys))
    man = {
        r["segment_group"]: r
        for r in spark.read.parquet(f"{index_dir}/manifest").collect()
    }
    from collections import defaultdict

    sums = defaultdict(lambda: [0, 0, 0])
    for r in rows:
        s = sums[r["segment_group"]]
        s[0] += r["n_chunks"]
        s[1] += r["postings_written"]
        s[2] += r["bytes_written"]
    for g, (nc, pw, bw) in sums.items():
        assert man[g]["n_chunks"] == nc
        assert man[g]["postings_written"] == pw
        assert man[g]["bytes_written"] == bw
