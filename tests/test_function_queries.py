"""ES boosting query, seeded random_score, and terms_set query —
degenerate-parameter identities, brute-force checks, and sharded
federation identity."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

Q = "informação segurança"
NEG = "bace"


@pytest.fixture(scope="module")
def reader(spark, index_dir):
    from tlhop_library_spark.index.query import IndexReader

    return IndexReader(spark, index_dir)


def rows(df):
    return [
        (r["rank"], r["doc_id"], r["score"])
        for r in df.orderBy("rank").collect()
    ]


# ------------------------------------------------------------------
# boosting
# ------------------------------------------------------------------
def test_boosting_unit_boost_is_plain_search(reader):
    assert rows(reader.search_boosting(Q, NEG, k=10,
                                       negative_boost=1.0)) == rows(
        reader.search(Q, k=10, mode="exhaustive")
    )


def test_boosting_absent_negative_is_plain_search(reader):
    assert rows(reader.search_boosting(Q, "zzznope", k=10)) == rows(
        reader.search(Q, k=10, mode="exhaustive")
    )


def test_boosting_demotes_never_filters(reader, corpus_df):
    """Every positive match stays retrievable; matched-negative docs'
    scores are exactly score·nb."""
    plain = {
        r["doc_id"]: r["score"]
        for r in reader._matching_scores(Q).collect()
    }
    neg_ids = {
        r["doc_id"] for r in reader._matching_scores(NEG).collect()
    }
    assert plain and (neg_ids & set(plain)), "weak fixture"
    got = rows(reader.search_boosting(Q, NEG, k=len(plain),
                                      negative_boost=0.25))
    assert {d for _, d, _ in got} == set(plain)
    from decimal import ROUND_HALF_UP, Decimal

    def r4(x):  # Spark F.round semantics: HALF_UP on the shortest repr
        return float(
            Decimal(repr(x)).quantize(
                Decimal("0.0001"), rounding=ROUND_HALF_UP
            )
        )

    for _, d, s in got:
        want = plain[d] * 0.25 if d in neg_ids else plain[d]
        assert s == pytest.approx(r4(want))


def test_boosting_guard(reader):
    with pytest.raises(ValueError):
        reader.search_boosting(Q, NEG, negative_boost=1.5)


# ------------------------------------------------------------------
# random_score
# ------------------------------------------------------------------
def test_random_score_is_seeded_and_uniform_range(reader):
    a = rows(reader.search_random(Q, k=10, seed=7))
    b = rows(reader.search_random(Q, k=10, seed=7))
    c = rows(reader.search_random(Q, k=10, seed=8))
    assert a == b
    assert a != c  # a different seed reorders
    assert all(0.0 <= s < 1.0 for _, _, s in a)


def test_random_score_matches_python_lcg(reader):
    from tlhop_library_spark.index.query import _RND_A, _RND_C, _RND_M

    match = [r["doc_id"] for r in reader._matching_scores(Q).collect()]
    assert match

    def sc(d, seed):
        h1 = ((d % _RND_M) * _RND_A + seed) % _RND_M
        h2 = (h1 * _RND_A + _RND_C) % _RND_M
        return round(h2 / _RND_M, 6)

    want = sorted(((sc(d, 7), d) for d in match),
                  key=lambda t: (-t[0], t[1]))[:10]
    got = rows(reader.search_random(Q, k=10, seed=7))
    assert [(d, s) for s, d in want] == [(d, s) for _, d, s in got]


def test_random_score_no_int64_overflow_at_huge_doc_ids(spark):
    # round-3 ADVICE: doc_id * _RND_A overflows int64 for doc_id >
    # ~8.36e9 (non-ANSI Spark wraps silently, the DuckDB oracle
    # errors). doc_id is now reduced mod 2^31 first — verify the
    # Spark kernel matches exact Python integer arithmetic at
    # 10^12-scale doc_ids.
    from tlhop_library_spark.index.query import (
        _RND_A,
        _RND_C,
        _RND_M,
        random_rank_hits,
    )

    ids = [3, 8_400_000_000, 10**12, 10**12 + 7, 2**62 // _RND_A + 99]
    hits = spark.createDataFrame(
        [(d, 1.0) for d in ids], "doc_id long, score double"
    )

    def sc(d, seed):
        h1 = ((d % _RND_M) * _RND_A + seed) % _RND_M
        h2 = (h1 * _RND_A + _RND_C) % _RND_M
        return round(h2 / _RND_M, 6)

    want = sorted(((sc(d, 7), d) for d in ids),
                  key=lambda t: (-t[0], t[1]))
    got = [
        (r["doc_id"], r["score"])
        for r in random_rank_hits(hits, k=5, seed=7).collect()
    ]
    assert got == [(d, s) for s, d in want]


# ------------------------------------------------------------------
# terms_set
# ------------------------------------------------------------------
def test_terms_set_req1_is_plain_or_search(reader, corpus_df):
    docs = corpus_df.withColumn("req", F.lit(1))
    assert rows(reader.search_terms_set(Q, docs, "req", k=10)) == rows(
        reader.search(Q, k=10, mode="exhaustive")
    )


def test_terms_set_req_nterms_is_conjunctive(reader, corpus_df):
    from tlhop_library_spark.analyzer import py_tokens

    n = len(set(py_tokens(Q)))
    docs = corpus_df.withColumn("req", F.lit(n))
    assert rows(
        reader.search_terms_set(Q, docs, "req", k=10)
    ) == rows(reader.search_and(Q, k=10))


def test_terms_set_null_req_never_matches(reader, corpus_df):
    docs = corpus_df.withColumn("req", F.lit(None).cast("int"))
    assert reader.search_terms_set(Q, docs, "req", k=10).count() == 0


def test_terms_set_per_doc_threshold_bruteforce(reader, corpus_df):
    from tlhop_library_spark.analyzer import py_tokens

    terms = set(py_tokens(Q))
    docs = corpus_df.withColumn(
        "req", (F.col("doc_id") % 2 + 1).cast("int")
    )
    toks = {
        r["doc_id"]: len(terms & set(py_tokens(r["text"] or "")))
        for r in corpus_df.collect()
    }
    want = {d for d, c in toks.items() if c >= (d % 2 + 1) and c > 0}
    got = reader.search_terms_set(Q, docs, "req", k=10_000)
    assert {r["doc_id"] for r in got.collect()} == want
    assert want, "weak fixture"


# ------------------------------------------------------------------
# federation
# ------------------------------------------------------------------
def test_sharded_identities(spark, corpus_df, reader, tmp_path_factory):
    from tlhop_library_spark.index import ShardedIndexReader
    from tlhop_library_spark.index.build import IndexBuilder

    base = tmp_path_factory.mktemp("fq_shards")
    dirs = []
    for i, (nb, nr) in enumerate([(4, 4), (8, 2)]):
        d = str(base / f"shard{i}")
        IndexBuilder(
            spark, d, n_buckets=nb, n_ranges=nr, n_jobs=2
        ).build(corpus_df.where(F.col("doc_id") % 2 == i))
        dirs.append(d)
    sharded = ShardedIndexReader(spark, dirs)
    docs = corpus_df.withColumn(
        "req", (F.col("doc_id") % 2 + 1).cast("int")
    )
    assert rows(sharded.search_boosting(Q, NEG, k=10)) == rows(
        reader.search_boosting(Q, NEG, k=10)
    )
    assert rows(sharded.search_random(Q, k=10, seed=7)) == rows(
        reader.search_random(Q, k=10, seed=7)
    )
    assert rows(
        sharded.search_terms_set(Q, docs, "req", k=10)
    ) == rows(reader.search_terms_set(Q, docs, "req", k=10))
