"""Sharded (federated) search: rank/score identity with one big index.

The invariant under test: ShardedIndexReader over per-partition
indexes with GLOBAL (Σ-across-shards) n_docs/sum_dl/df statistics is
rank- AND score-identical to a single IndexReader over one index built
on the union of the shards' corpora — which is itself rank-identical
to score_exhaustive (covered elsewhere)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

QUERIES = [
    "bace cada",            # mid-frequency pair
    "informação",           # accented single term
    "de",                   # head term (block-max pruning engages)
    "bace zzznope",         # one absent term
    "zzznope",              # fully absent
    "",                     # empty query
    "pili página conteúdo tesa",  # wide OR
]


def rows(df):
    return [
        (r["rank"], r["doc_id"], r["score"])
        for r in df.orderBy("rank").collect()
    ]


@pytest.fixture(scope="module")
def sharded(spark, corpus_df, index_dir, tmp_path_factory):
    """Three shards over doc_id % 3 (disjoint doc-id spaces), with
    DIFFERENT bucket/range counts per shard — federation must not
    depend on homogeneous shard layout."""
    from tlhop_library_spark.index import ShardedIndexReader
    from tlhop_library_spark.index.build import IndexBuilder

    base = tmp_path_factory.mktemp("shards")
    dirs = []
    for i, (nb, nr) in enumerate([(8, 8), (4, 4), (8, 2)]):
        d = str(base / f"shard{i}")
        part = corpus_df.where(F.col("doc_id") % 3 == i)
        IndexBuilder(spark, d, n_buckets=nb, n_ranges=nr, n_jobs=2).build(
            part
        )
        dirs.append(d)
    return ShardedIndexReader(spark, dirs)


def test_global_stats_match_single_index(spark, sharded, index_dir):
    from tlhop_library_spark.index import IndexReader

    single = IndexReader(spark, index_dir)
    assert sharded.n_docs == single.stats["n_docs"]
    assert sharded.sum_dl == single.stats["sum_dl"]
    assert sharded.avgdl == pytest.approx(single.stats["avgdl"])


@pytest.mark.parametrize("mode", ["exhaustive", "bmw", "auto"])
def test_sharded_rank_identical_to_single(spark, sharded, index_dir, mode):
    from tlhop_library_spark.index import IndexReader

    single = IndexReader(spark, index_dir)
    hit_any = False
    for q in QUERIES:
        got = rows(sharded.search(q, k=10, mode=mode))
        want = rows(single.search(q, k=10, mode=mode))
        assert got == want, (mode, q)
        hit_any = hit_any or bool(got)
    assert hit_any


def test_sharded_serving_twin_identical(spark, sharded):
    for q in QUERIES:
        assert rows(sharded.search_local(q, k=10)) == rows(
            sharded.search(q, k=10)
        ), q


def test_sharded_counts_identical_to_single(spark, sharded, index_dir):
    from tlhop_library_spark.index import IndexReader

    single = IndexReader(spark, index_dir)
    for q in QUERIES:
        for match in ("any", "all"):
            got = sharded.count_matches(q, match).collect()[0]["n_docs"]
            want = single.count_matches(q, match).collect()[0]["n_docs"]
            assert got == want, (q, match)
    assert (
        sharded.count_matches("bace cada", "any").collect()[0]["n_docs"] > 0
    )


def test_sharded_explain_identical_to_single(spark, sharded, index_dir):
    from tlhop_library_spark.index import IndexReader

    single = IndexReader(spark, index_dir)

    def ex_rows(df):
        return [tuple(r) for r in df.orderBy("rank", "term").collect()]

    for q in ["bace cada", "informação", "zzznope"]:
        got = ex_rows(sharded.explain(q, k=10))
        want = ex_rows(single.explain(q, k=10))
        assert got == want, q


def test_local_stats_would_misrank(spark, corpus_df, tmp_path_factory):
    """The reason federation needs global stats: a term whose df is
    skewed across shards gets a different idf from local stats. Build
    a 2-shard split where some query term's df differs by shard and
    check that global-df idf ≠ either local idf (so scoring locally
    could not be score-identical)."""
    from tlhop_library_spark import bm25
    from tlhop_library_spark.index import ShardedIndexReader
    from tlhop_library_spark.index.build import IndexBuilder

    base = tmp_path_factory.mktemp("skewshards")
    dirs = []
    for i in range(2):
        d = str(base / f"s{i}")
        IndexBuilder(spark, d, n_buckets=4, n_ranges=4, n_jobs=2).build(
            corpus_df.where(F.col("doc_id") % 2 == i)
        )
        dirs.append(d)
    sh = ShardedIndexReader(spark, dirs)
    infos, idf_by_term = sh._resolve("bace cada de")
    skewed = [
        t
        for t in idf_by_term
        if len({info[t][0] for info in infos if t in info}) > 1
    ]
    assert skewed, "expected at least one term with shard-skewed df"
    t = skewed[0]
    for info, r in zip(infos, sh.readers):
        if t in info:
            local_idf = bm25.idf(r.stats["n_docs"], info[t][0])
            assert local_idf != pytest.approx(idf_by_term[t])


def test_deletes_respected_per_shard(spark, sharded, index_dir,
                                     tmp_path_factory, corpus_df):
    """Tombstoning a doc in ONE shard must drop it from federated
    results exactly as deleting it from the single index does."""
    import shutil

    from tlhop_library_spark.index import (
        IndexReader,
        ShardedIndexReader,
        delete_documents,
    )

    victim = rows(sharded.search("bace cada", k=1))
    if not victim:
        pytest.skip("no hits to delete")
    doc = victim[0][1]

    # copy the shard holding `doc` and the single index, tombstone both
    shard_src = sharded.readers[doc % 3].index_dir
    base = tmp_path_factory.mktemp("delshards")
    shard_cp = str(base / "shard_cp")
    single_cp = str(base / "single_cp")
    shutil.copytree(shard_src, shard_cp)
    shutil.copytree(index_dir, single_cp)
    delete_documents(spark, shard_cp, [doc])
    delete_documents(spark, single_cp, [doc])

    dirs = [
        shard_cp if i == doc % 3 else r.index_dir
        for i, r in enumerate(sharded.readers)
    ]
    sh2 = ShardedIndexReader(spark, dirs)
    single2 = IndexReader(spark, single_cp)
    got = rows(sh2.search("bace cada", k=10))
    assert doc not in [d for _, d, _ in got]
    assert got == rows(single2.search("bace cada", k=10))


def test_sharded_phrase_proximity_identical(spark, corpus_df,
                                            tmp_path_factory):
    """Federated phrase/proximity over positional shards ≡ one
    positional union index. Also: non-positional shards are rejected."""
    from tlhop_library_spark.index import (
        IndexReader,
        ShardedIndexReader,
    )
    from tlhop_library_spark.index.build import IndexBuilder

    base = tmp_path_factory.mktemp("posshards")
    single_dir = str(base / "single")
    IndexBuilder(
        spark, single_dir, n_buckets=4, n_ranges=4, positions=True
    ).build(corpus_df)
    dirs = []
    for i in range(2):
        d = str(base / f"s{i}")
        IndexBuilder(
            spark, d, n_buckets=4, n_ranges=4, positions=True
        ).build(corpus_df.where(F.col("doc_id") % 2 == i))
        dirs.append(d)
    single = IndexReader(spark, single_dir)
    sh = ShardedIndexReader(spark, dirs)
    hit = False
    for ph in ["bace cada", "informação segurança", "zzznope x", ""]:
        got = rows(sh.search_phrase(ph, k=10))
        want = rows(single.search_phrase(ph, k=10))
        assert got == want, ph
        hit = hit or bool(got)
    assert hit
    for q, w in [("informação segurança", 6), ("bace pili", 9)]:
        assert rows(sh.search_proximity(q, w, k=10)) == rows(
            single.search_proximity(q, w, k=10)
        ), q
    for q, s in [("informação segurança", 4), ("análise tupere", 3),
                 ("zzznope x", 2)]:
        assert rows(sh.search_span_near(q, s, k=10)) == rows(
            single.search_span_near(q, s, k=10)
        ), q
    for q in ["análise tup", "ba", "informação se", "zzzunseen tup"]:
        assert rows(
            sh.search_phrase_prefix(q, k=10, max_expansions=1000)
        ) == rows(
            single.search_phrase_prefix(q, k=10, max_expansions=1000)
        ), q

    plain = str(base / "plain")
    IndexBuilder(spark, plain, n_buckets=4, n_ranges=4).build(corpus_df)
    bad = ShardedIndexReader(spark, [dirs[0], plain])
    with pytest.raises(ValueError, match="positional"):
        bad.search_phrase("bace cada")


def test_random_split_property(spark, corpus_df, index_dir,
                               tmp_path_factory):
    """Property: for RANDOM (seeded) shard assignments — unbalanced,
    possibly empty-ish shards — federation stays rank-identical to
    the single index. Catches global-stat bugs that a clean modular
    split can hide."""
    import random

    from tlhop_library_spark.index import (
        IndexReader,
        ShardedIndexReader,
    )
    from tlhop_library_spark.index.build import IndexBuilder

    single = IndexReader(spark, index_dir)
    rng = random.Random(1234)
    for trial in range(2):
        # weighted assignment: shard 0 gets ~70%, shard 1 ~25%,
        # shard 2 ~5% — deterministic per doc via a seeded hash
        salt = rng.randrange(1 << 30)
        base = tmp_path_factory.mktemp(f"prop{trial}")
        dirs = []
        exprs = [
            F.pmod(F.xxhash64(F.col("doc_id") + F.lit(salt)), F.lit(20)),
        ]
        bounds = [(0, 13), (14, 18), (19, 19)]
        for i, (lo, hi) in enumerate(bounds):
            d = str(base / f"s{i}")
            part = corpus_df.where(
                exprs[0].between(lo, hi)
            )
            IndexBuilder(
                spark, d, n_buckets=4, n_ranges=4, n_jobs=1
            ).build(part)
            dirs.append(d)
        sh = ShardedIndexReader(spark, dirs)
        assert sh.n_docs == single.stats["n_docs"]
        for q in ["bace cada", "informação", "de"]:
            assert rows(sh.search(q, k=10)) == rows(
                single.search(q, k=10)
            ), (trial, q)


def test_mismatched_shard_config_rejected(spark, corpus_df,
                                          tmp_path_factory, index_dir):
    import json
    import os
    import shutil

    from tlhop_library_spark.index import ShardedIndexReader

    base = tmp_path_factory.mktemp("badshard")
    bad = str(base / "bad")
    shutil.copytree(index_dir, bad)
    sp = os.path.join(bad, "stats.json")
    with open(sp) as f:
        st = json.load(f)
    st["k1"] = 9.9
    with open(sp, "w") as f:
        json.dump(st, f)
    with pytest.raises(ValueError, match="k1"):
        ShardedIndexReader(spark, [index_dir, bad])
    with pytest.raises(ValueError):
        ShardedIndexReader(spark, [])


def test_sharded_weighted_modes_identical_to_single(
    spark, sharded, index_dir
):
    """Round-2.4 ranking modes federate with global collection stats:
    each must be rank- AND score-identical to the single union index."""
    from tlhop_library_spark.index import IndexReader

    single = IndexReader(spark, index_dir)
    q = "informação segurança dados"
    for sim in ("classic", "lmdirichlet"):
        assert rows(sharded.search_sim(q, 10, sim)) == rows(
            single.search_sim(q, 10, sim)
        ), sim
    assert rows(sharded.search_dismax(q, 10, 0.3)) == rows(
        single.search_dismax(q, 10, 0.3)
    )
    bq = "informação^3 segurança dados^0.5"
    assert rows(sharded.search_boosted(bq, 10)) == rows(
        single.search_boosted(bq, 10)
    )
    cur = rows(single.search(q, k=10))[-1]
    assert rows(sharded.search_after(q, (cur[2], cur[1]), 10)) == rows(
        single.search_after(q, (cur[2], cur[1]), 10)
    )
    # and the page really is ranks 11..20 of the union ranking
    full = rows(single.search(q, k=20))
    got = rows(sharded.search_after(q, (cur[2], cur[1]), 10))
    assert [(d, s) for _, d, s in got] == [(d, s) for _, d, s in full[10:]]
    # two-pass rescore federates through the same global-stats path
    assert rows(
        sharded.search_rescore(q, 10, window=25, similarity="lmdirichlet")
    ) == rows(
        single.search_rescore(q, 10, window=25, similarity="lmdirichlet")
    )


def test_sharded_term_vectors_identical_to_single(
    spark, sharded, index_dir
):
    from tlhop_library_spark.index import IndexReader

    single = IndexReader(spark, index_dir)
    ids = [2, 9, 31, 100]
    got = sorted(
        map(tuple, sharded.term_vectors(ids).collect())
    )
    want = sorted(map(tuple, single.term_vectors(ids).collect()))
    assert got == want and got


def test_sharded_dictionary_suggesters_identical(spark, corpus_df,
                                                 tmp_path_factory):
    """Federated autocomplete/did-you-mean ≡ the same scans on one
    union index (terms are content-addressed; global cf/df are plain
    sums over disjoint shards)."""
    from tlhop_library_spark.index import (
        IndexReader,
        ShardedIndexReader,
    )
    from tlhop_library_spark.index.build import IndexBuilder

    base = tmp_path_factory.mktemp("dictshards")
    single_dir = str(base / "single")
    IndexBuilder(spark, single_dir, n_buckets=4, n_ranges=4).build(
        corpus_df
    )
    dirs = []
    for i in range(2):
        d = str(base / f"s{i}")
        IndexBuilder(spark, d, n_buckets=4, n_ranges=4).build(
            corpus_df.where(F.col("doc_id") % 2 == i)
        )
        dirs.append(d)
    single = IndexReader(spark, single_dir)
    sh = ShardedIndexReader(spark, dirs)
    for p in ["ba", "co", "zzz"]:
        a = [tuple(r) for r in sh.autocomplete(p, n=8).collect()]
        b = [tuple(r) for r in single.autocomplete(p, n=8).collect()]
        assert a == b, p
    for t, e in [("bce", 1), ("analise", 2), ("zzznope", 1)]:
        a = [tuple(r) for r in sh.suggest_df(t, e, n=8).collect()]
        b = [tuple(r) for r in single.suggest_df(t, e, n=8).collect()]
        assert a == b, t


def test_sharded_suggest_phrase_identical(spark, corpus_df,
                                          tmp_path_factory):
    """Federated phrase suggester ≡ single union index (candidates
    from the federated dictionary, LM scoring corpus-side)."""
    from tlhop_library_spark.index import (
        IndexReader,
        ShardedIndexReader,
    )
    from tlhop_library_spark.index.build import IndexBuilder

    base = tmp_path_factory.mktemp("sugshards")
    single_dir = str(base / "single")
    IndexBuilder(spark, single_dir, n_buckets=4, n_ranges=4).build(
        corpus_df
    )
    dirs = []
    for i in range(2):
        d = str(base / f"s{i}")
        IndexBuilder(spark, d, n_buckets=4, n_ranges=4).build(
            corpus_df.where(F.col("doc_id") % 2 == i)
        )
        dirs.append(d)
    single = IndexReader(spark, single_dir)
    sh = ShardedIndexReader(spark, dirs)
    for q in ["bce cda", "bace babi"]:
        a = [
            tuple(r)
            for r in sh.suggest_phrase(q, corpus_df, n=5).collect()
        ]
        b = [
            tuple(r)
            for r in single.suggest_phrase(q, corpus_df, n=5).collect()
        ]
        assert a == b and a, q


def test_sharded_decay_and_group_topk_identical(spark, corpus_df,
                                                sharded, index_dir):
    """Federated decay re-rank and top_hits grouping ≡ the single
    union index (both consume only the global-stats hit stream)."""
    from tlhop_library_spark.index import IndexReader

    single, sh = IndexReader(spark, index_dir), sharded
    docs = corpus_df.withColumn("n_chars", F.length("text"))
    for q in ["bace cada", "informação"]:
        a = [
            tuple(r)
            for r in sh.search_decay(
                q, docs, "n_chars", origin=400.0, scale=250.0,
                k=10, decay=0.5, fn="gauss",
            ).collect()
        ]
        b = [
            tuple(r)
            for r in single.search_decay(
                q, docs, "n_chars", origin=400.0, scale=250.0,
                k=10, decay=0.5, fn="gauss",
            ).collect()
        ]
        assert a == b and a, q
        a = [
            tuple(r)
            for r in sh.search_group_topk(
                q, docs, "lang", n_groups=3, per_group=2
            ).collect()
        ]
        b = [
            tuple(r)
            for r in single.search_group_topk(
                q, docs, "lang", n_groups=3, per_group=2
            ).collect()
        ]
        assert a == b and a, q


def test_sharded_facets_and_cardinality_identical(spark, corpus_df,
                                                  sharded, index_dir):
    """Federated facet histogram and cardinality agg ≡ single union
    index (both modes; KMV merges across shards like partitions)."""
    from tlhop_library_spark.index import IndexReader

    single = IndexReader(spark, index_dir)
    key = lambda t: (t[0] is None, t)  # noqa: E731 — NULL facet sorts last
    for q in ["bace cada", "informação"]:
        a = sorted(
            map(tuple, sharded.facet_counts(q, corpus_df, "lang").collect()),
            key=key,
        )
        b = sorted(
            map(tuple, single.facet_counts(q, corpus_df, "lang").collect()),
            key=key,
        )
        assert a == b and a, q
        for k in (None, 16):
            a = [
                tuple(r)
                for r in sharded.facet_cardinality(
                    q, corpus_df, "lang", k=k
                ).collect()
            ]
            b = [
                tuple(r)
                for r in single.facet_cardinality(
                    q, corpus_df, "lang", k=k
                ).collect()
            ]
            assert a == b, (q, k)
