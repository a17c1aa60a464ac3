"""ES ``diversified_sampler`` / ``rank_feature`` / ``pinned``
retrieval and the ``multi_terms`` / ``adjacency_matrix`` aggregations
— brute-force identity, NULL/missing edge cases, guards, and sharded
federation identity."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

Q = "informação segurança"


@pytest.fixture(scope="module")
def reader(spark, index_dir):
    from tlhop_library_spark.index.query import IndexReader

    return IndexReader(spark, index_dir)


@pytest.fixture(scope="module")
def docs(corpus_df):
    return corpus_df.withColumn(
        "n_chars", F.length("text").cast("long")
    ).withColumn(
        # the test corpus has no second categorical column — derive a
        # deterministic 7-ary site key for the composite-bucket tests
        "site",
        F.concat(F.lit("s"), (F.col("doc_id") % 7).cast("string")),
    )


@pytest.fixture(scope="module")
def hits_map(reader):
    m = {
        r["doc_id"]: r["score"]
        for r in reader._matching_scores(Q).collect()
    }
    assert len(m) > 30, "weak fixture: too few matches"
    return m


@pytest.fixture(scope="module")
def meta_map(docs):
    return {
        r["doc_id"]: (r["lang"], r["site"], r["n_chars"])
        for r in docs.collect()
    }


def _ranked(rows):
    return [(r["rank"], r["doc_id"], r["score"]) for r in rows]


# ---------------------------------------------------------------------
# diversified_sampler
# ---------------------------------------------------------------------
def _brute_diversified(hits_map, key_of, max_per_key, k):
    """Walk the global (score DESC, doc_id ASC) order applying per-key
    counters — equivalent to per-key top-m then global top-k."""
    seen: dict = {}
    out = []
    for doc, sc in sorted(hits_map.items(), key=lambda t: (-t[1], t[0])):
        key = key_of(doc)
        if key is not None:
            seen[key] = seen.get(key, 0) + 1
            if seen[key] > max_per_key:
                continue
        out.append((len(out) + 1, doc, sc))
        if len(out) == k:
            break
    return out


def test_diversified_matches_bruteforce(reader, docs, hits_map, meta_map):
    for m in (1, 2):
        got = _ranked(
            reader.search_diversified(
                Q, docs, "lang", max_per_key=m, k=10
            ).collect()
        )
        want = _brute_diversified(
            hits_map, lambda d: meta_map[d][0], m, 10
        )
        assert got == want
    # the cap must actually bind for the fixture to mean anything
    langs = [meta_map[d][0] for _, d, _ in _brute_diversified(
        hits_map, lambda d: None, 1, 10)]
    assert len(set(langs)) < len(langs), "weak fixture: cap never binds"


def test_diversified_null_keys_never_capped(reader, docs, hits_map):
    nulled = docs.withColumn(
        "lang_n",
        F.when(F.col("doc_id") % 2 == 0, F.col("lang")),
    )
    got = reader.search_diversified(
        Q, nulled, "lang_n", max_per_key=1, k=10
    ).collect()
    null_docs = [r["doc_id"] for r in got if r["doc_id"] % 2 == 1]
    assert len(null_docs) > 1, "NULL-key docs should bypass the cap"


def test_diversified_guard(reader, docs):
    with pytest.raises(ValueError):
        reader.search_diversified(Q, docs, "lang", max_per_key=0)


# ---------------------------------------------------------------------
# rank_feature
# ---------------------------------------------------------------------
def _brute_rank_feature(hits_map, feat_of, fn, pivot, boost, k):
    scored = []
    for doc, sc in hits_map.items():
        f = feat_of(doc)
        if f is None or f < 0:
            clause = 0.0
        elif fn == "saturation":
            clause = boost * (float(f) / (float(f) + pivot))
        else:
            clause = boost * math.log(1.0 + float(f))
        scored.append((doc, round(sc + clause, 4)))
    scored.sort(key=lambda t: (-t[1], t[0]))
    return [(i + 1, d, s) for i, (d, s) in enumerate(scored[:k])]


def test_rank_feature_saturation_bruteforce(
    reader, docs, hits_map, meta_map
):
    got = _ranked(
        reader.search_rank_feature(
            Q, docs, "n_chars", k=10, function="saturation",
            pivot=300.0, boost=5.0,
        ).collect()
    )
    want = _brute_rank_feature(
        hits_map, lambda d: meta_map[d][2], "saturation", 300.0, 5.0, 10
    )
    assert got == want
    plain = _brute_rank_feature(
        hits_map, lambda d: meta_map[d][2], "saturation", 300.0, 0.0, 10
    )
    assert got != plain, "weak fixture: feature never reorders"


def test_rank_feature_log_bruteforce(reader, docs, hits_map, meta_map):
    got = _ranked(
        reader.search_rank_feature(
            Q, docs, "n_chars", k=10, function="log", boost=0.5,
        ).collect()
    )
    want = _brute_rank_feature(
        hits_map, lambda d: meta_map[d][2], "log", 1.0, 0.5, 10
    )
    assert got == want


def test_rank_feature_zero_boost_is_plain(reader, docs):
    got = _ranked(
        reader.search_rank_feature(
            Q, docs, "n_chars", k=10, boost=0.0, pivot=1.0,
        ).collect()
    )
    plain = _ranked(reader.search(Q, k=10).collect())
    assert got == plain


def test_rank_feature_missing_feature_contributes_zero(
    reader, docs, hits_map
):
    nulled = docs.withColumn(
        "n_chars", F.when(F.col("doc_id") % 2 == 0, F.col("n_chars"))
    )
    got = reader.search_rank_feature(
        Q, nulled, "n_chars", k=len(hits_map) + 5,
        pivot=100.0, boost=10.0,
    ).collect()
    by_doc = {r["doc_id"]: r["score"] for r in got}
    odd = [d for d in by_doc if d % 2 == 1]
    assert odd, "weak fixture"
    for d in odd:
        assert by_doc[d] == round(hits_map[d], 4)


def test_rank_feature_guards(reader, docs):
    with pytest.raises(ValueError):
        reader.search_rank_feature(Q, docs, "n_chars", function="nope")
    with pytest.raises(ValueError):
        reader.search_rank_feature(Q, docs, "n_chars", pivot=0.0)


# ---------------------------------------------------------------------
# pinned
# ---------------------------------------------------------------------
def test_pinned_order_missing_and_organic(reader, docs, hits_map):
    organic = sorted(hits_map.items(), key=lambda t: (-t[1], t[0]))
    pin_match = organic[3][0]      # a matching doc, pinned
    pin_nomatch = next(
        d for d in range(800) if d not in hits_map
    )                               # a live doc outside the matching set
    missing = 10**9                 # not in the corpus — skipped
    got = _ranked(
        reader.search_pinned(
            Q, docs, [pin_nomatch, missing, pin_match], k=10
        ).collect()
    )
    # pins first, in list order, missing id skipped
    assert [r[1] for r in got[:2]] == [pin_nomatch, pin_match]
    assert got[0][2] > got[1][2] > 1.0e8
    # organic tail: the plain ranking with pinned docs removed
    rest = [d for d, _ in organic if d != pin_match][: 10 - 2]
    assert [r[1] for r in got[2:]] == rest
    # no duplicates
    assert len({r[1] for r in got}) == len(got)


def test_pinned_empty_is_plain(reader, docs):
    got = _ranked(reader.search_pinned(Q, docs, [], k=10).collect())
    plain = _ranked(reader.search(Q, k=10).collect())
    assert got == plain


def test_pinned_duplicate_raises(reader, docs):
    with pytest.raises(ValueError):
        reader.search_pinned(Q, docs, [1, 2, 1], k=10)


# ---------------------------------------------------------------------
# multi_terms
# ---------------------------------------------------------------------
def test_multi_terms_matches_bruteforce(reader, docs, hits_map, meta_map):
    got = [
        (r["rank"], r["lang"], r["site"], r["doc_count"])
        for r in reader.facet_multi_terms(
            Q, docs, ["lang", "site"], size=5
        ).collect()
    ]
    counts: dict = {}
    for d in hits_map:
        lang, src, _ = meta_map[d]
        if lang is None or src is None:
            continue
        counts[(lang, src)] = counts.get((lang, src), 0) + 1
    want = sorted(counts.items(), key=lambda t: (-t[1], t[0]))[:5]
    assert got == [
        (i + 1, k[0], k[1], c) for i, (k, c) in enumerate(want)
    ]


def test_multi_terms_guard(reader, docs):
    with pytest.raises(ValueError):
        reader.facet_multi_terms(Q, docs, ["lang"], size=5)


# ---------------------------------------------------------------------
# adjacency_matrix
# ---------------------------------------------------------------------
def test_adjacency_matches_bruteforce(reader):
    named = {"x": "informação", "y": "segurança", "z": "análise tecnologia"}
    sets = {
        n: {
            r["doc_id"]
            for r in reader._matching_scores(q).collect()
        }
        for n, q in named.items()
    }
    got = {
        (r["key1"], r["key2"]): r["doc_count"]
        for r in reader.facet_adjacency_matrix(named).collect()
    }
    want = {}
    for a in sorted(sets):
        for b in sorted(sets):
            if a <= b:
                n = len(sets[a] & sets[b]) if a != b else len(sets[a])
                if n:
                    want[(a, b)] = n
    assert got == want
    assert any(a != b for a, b in got), "weak fixture: no intersections"


def test_adjacency_absent_filter_contributes_nothing(reader):
    got = {
        (r["key1"], r["key2"]): r["doc_count"]
        for r in reader.facet_adjacency_matrix(
            {"x": "informação", "ghost": "zzzzzzunseen"}
        ).collect()
    }
    assert set(got) == {("x", "x")}


# ---------------------------------------------------------------------
# sharded federation identity
# ---------------------------------------------------------------------
def test_sharded_identical_to_single(
    spark, corpus_df, docs, reader, tmp_path_factory
):
    from tlhop_library_spark.index import ShardedIndexReader
    from tlhop_library_spark.index.build import IndexBuilder

    base = tmp_path_factory.mktemp("div_shards")
    dirs = []
    for i, (nb, nr) in enumerate([(4, 4), (8, 2)]):
        d = str(base / f"shard{i}")
        part = corpus_df.where(F.col("doc_id") % 2 == i)
        IndexBuilder(
            spark, d, n_buckets=nb, n_ranges=nr, n_jobs=2
        ).build(part)
        dirs.append(d)
    sharded = ShardedIndexReader(spark, dirs)

    pairs = [
        (
            reader.search_diversified(Q, docs, "lang", 2, k=10),
            sharded.search_diversified(Q, docs, "lang", 2, k=10),
        ),
        (
            reader.search_rank_feature(
                Q, docs, "n_chars", k=10, pivot=300.0, boost=5.0
            ),
            sharded.search_rank_feature(
                Q, docs, "n_chars", k=10, pivot=300.0, boost=5.0
            ),
        ),
        (
            reader.search_pinned(Q, docs, [11, 7], k=10),
            sharded.search_pinned(Q, docs, [11, 7], k=10),
        ),
        (
            reader.facet_multi_terms(Q, docs, ["lang", "site"], 5),
            sharded.facet_multi_terms(Q, docs, ["lang", "site"], 5),
        ),
        (
            reader.facet_adjacency_matrix(
                {"x": "informação", "y": "segurança"}
            ).orderBy("key1", "key2"),
            sharded.facet_adjacency_matrix(
                {"x": "informação", "y": "segurança"}
            ).orderBy("key1", "key2"),
        ),
    ]
    for single, fed in pairs:
        assert [tuple(r) for r in fed.collect()] == [
            tuple(r) for r in single.collect()
        ]
