"""Collector-style retrieval extras: query boosts, DisjunctionMax,
field sort, collapse/grouping, numeric range facets. Each is checked
against either the plain search path (degenerate-parameter identity)
or an independent reconstruction from the full hit stream."""

import pytest
from pyspark.sql import functions as F

from tlhop_library_spark.index.query import (
    IndexReader,
    parse_boosted_query,
)

Q = "informação segurança dados"
BOUNDS = [0.0, 300.0, 600.0, 1200.0, 1e9]


def _ranks(df):
    return [
        (x["rank"], x["doc_id"], x["score"])
        for x in df.orderBy("rank").collect()
    ]


def test_parse_boosted_query():
    b = parse_boosted_query("Spark^2.5 JOIN filter^0.5")
    assert b == {"spark": 2.5, "join": 1.0, "filter": 0.5}
    # multi-token clause spreads its boost; last boost wins on dup
    assert parse_boosted_query("a-big-phrase^2 big^3") == {
        "big": 3.0,
        "phrase": 2.0,
    }
    assert parse_boosted_query("") == {}


def test_boosted_all_ones_equals_plain_search(spark, index_dir):
    r = IndexReader(spark, index_dir)
    assert _ranks(r.search_boosted(Q, k=10)) == _ranks(r.search(Q, k=10))


def test_boosted_weights_shift_ranking(spark, index_dir):
    """Boosting one term reweights: scores change, and a doc strong in
    the boosted term overtakes the plain-BM25 winner ordering."""
    r = IndexReader(spark, index_dir)
    plain = _ranks(r.search(Q, k=10))
    boosted = _ranks(r.search_boosted("informação^5 segurança dados", 10))
    assert [x[1] for x in boosted] != [] and boosted != plain


def test_dismax_tie_one_equals_plain_search(spark, index_dir):
    """tie_breaker=1.0 → max + (sum − max) = sum = plain OR BM25."""
    r = IndexReader(spark, index_dir)
    assert _ranks(r.search_dismax(Q, k=10, tie_breaker=1.0)) == _ranks(
        r.search(Q, k=10)
    )


def test_dismax_tie_zero_is_max_term_weight(spark, index_dir, corpus_df):
    """tie=0 top-k equals a python brute force taking each doc's single
    best per-term BM25 contribution (spec identity, not just shape)."""
    from tlhop_library_spark import bm25
    from tlhop_library_spark.analyzer import py_tokens

    r = IndexReader(spark, index_dir)
    got = _ranks(r.search_dismax(Q, k=5, tie_breaker=0.0))
    assert got
    rows = corpus_df.select("doc_id", "text").collect()
    docs = {
        x["doc_id"]: py_tokens(x["text"])
        for x in rows
        if x["text"] is not None
    }
    terms = sorted(set(py_tokens(Q)))
    n = len(docs)
    avgdl = sum(len(t) for t in docs.values()) / n
    df = {t: sum(1 for tk in docs.values() if t in tk) for t in terms}
    scored = []
    for d, tk in docs.items():
        ws = []
        for t in terms:
            tf = tk.count(t)
            if tf:
                dl = len(tk)
                w = bm25.idf(n, df[t]) * (
                    tf * (bm25.K1 + 1)
                ) / (tf + bm25.K1 * (1 - bm25.B + bm25.B * dl / avgdl))
                ws.append(w)
        if ws:
            scored.append((d, round(max(ws), bm25.ROUND_DIGITS)))
    scored.sort(key=lambda x: (-x[1], x[0]))
    expect = [
        (i + 1, d, s) for i, (d, s) in enumerate(scored[:5])
    ]
    assert got == expect


def test_sorted_by_is_topk_of_matching_by_field(spark, index_dir, corpus_df):
    r = IndexReader(spark, index_dir)
    docs = corpus_df.withColumn("n_chars", F.length("text"))
    got = r.search_sorted_by(Q, docs, "n_chars", k=8, ascending=True)
    rows = got.orderBy("rank").collect()
    assert len(rows) == 8
    fields = [x["n_chars"] for x in rows]
    assert fields == sorted(fields)
    # the k smallest among ALL matching docs, not just the score top-k
    hits = {x["doc_id"] for x in r._matching_scores(Q).collect()}
    all_fields = sorted(
        (x["n_chars"], x["doc_id"])
        for x in docs.where(F.col("doc_id").isin(list(hits)))
        .select("doc_id", "n_chars")
        .collect()
    )
    assert [(f, d) for f, d in all_fields[:8]] == [
        (x["n_chars"], x["doc_id"]) for x in rows
    ]


def test_sorted_by_null_fields_sort_last_ascending(
    spark, index_dir, corpus_df
):
    """NULL sort fields must land LAST on ascending (DuckDB/ANSI
    default, what the oracle computes) — Spark's bare F.asc would put
    them FIRST and a matching doc with a NULL field would top the
    result (round-2 ADVICE)."""
    r = IndexReader(spark, index_dir)
    hits = [x["doc_id"] for x in r._matching_scores(Q).collect()]
    assert len(hits) > 3
    # null out the field for two matching docs
    nulled = set(hits[:2])
    docs = corpus_df.withColumn(
        "n_chars",
        F.when(
            F.col("doc_id").isin(list(nulled)), F.lit(None)
        ).otherwise(F.length("text")),
    )
    k = len(hits)  # fetch ALL matches so the nulled docs are in range
    rows = r.search_sorted_by(Q, docs, "n_chars", k=k).orderBy(
        "rank"
    ).collect()
    assert {x["doc_id"] for x in rows} == set(hits)
    null_ranks = [x["rank"] for x in rows if x["n_chars"] is None]
    assert sorted(null_ranks) == [k - 1, k]  # the two NULLs rank last
    # descending: DuckDB ≥0.8 puts NULLs LAST on DESC too (verified
    # against duckdb 1.0 in this container) — not FIRST as ANSI
    # NULLS-are-largest engines would
    rows_d = r.search_sorted_by(
        Q, docs, "n_chars", k=k, ascending=False
    ).orderBy("rank").collect()
    assert sorted(
        x["rank"] for x in rows_d if x["n_chars"] is None
    ) == [k - 1, k]


def test_collapse_one_best_doc_per_group(spark, index_dir, corpus_df):
    r = IndexReader(spark, index_dir)
    docs = corpus_df.withColumn(
        "grp", (F.col("doc_id") % 7).cast("string")
    )
    got = r.search_collapse(Q, docs, "grp", k=5).orderBy("rank").collect()
    assert got
    groups = [x["grp"] for x in got]
    assert len(groups) == len(set(groups))
    # each returned doc is the argmax of its group over the hit stream
    hit_rows = r._matching_scores(Q).collect()
    gmap = {
        x["doc_id"]: x["grp"]
        for x in docs.select("doc_id", "grp").collect()
    }
    best = {}
    for h in hit_rows:
        g = gmap[h["doc_id"]]
        cand = (-h["score"], h["doc_id"])
        if g not in best or cand < best[g]:
            best[g] = cand
    for row in got:
        assert best[row["grp"]] == (-row["score"], row["doc_id"])
    # ranks follow group-best scores descending
    scores = [x["score"] for x in got]
    assert scores == sorted(scores, reverse=True)


def test_facet_ranges_counts_partition_matching_set(
    spark, index_dir, corpus_df
):
    r = IndexReader(spark, index_dir)
    docs = corpus_df.withColumn("n_chars", F.length("text"))
    got = {
        x["bucket"]: x["cnt"]
        for x in r.facet_ranges(Q, docs, "n_chars", BOUNDS).collect()
    }
    n_hits = r._matching_scores(Q).count()
    # bounds cover [0, 1e9) → every matching doc lands in one bucket
    assert sum(got.values()) == n_hits
    assert all(c > 0 for c in got.values())


def test_boosted_dismax_absent_query(spark, index_dir):
    r = IndexReader(spark, index_dir)
    assert r.search_boosted("zzznope^2", k=5).count() == 0
    assert r.search_dismax("zzznope", k=5).count() == 0


def test_search_after_equals_page_slice(spark, index_dir):
    """searchAfter with the rank-10 row as cursor ≡ ranks 11..20 of a
    k=20 search (scores re-ranked 1..10), and chains across pages."""
    r = IndexReader(spark, index_dir)
    full = _ranks(r.search(Q, k=30))
    assert len(full) == 30
    cur = full[9]
    page2 = _ranks(r.search_after(Q, (cur[2], cur[1]), k=10))
    assert [(d, s) for _, d, s in page2] == [
        (d, s) for _, d, s in full[10:20]
    ]
    assert [rk for rk, _, _ in page2] == list(range(1, 11))
    cur2 = page2[-1]
    page3 = _ranks(r.search_after(Q, (cur2[2], cur2[1]), k=10))
    assert [(d, s) for _, d, s in page3] == [
        (d, s) for _, d, s in full[20:30]
    ]


def test_search_after_past_end_and_absent(spark, index_dir):
    r = IndexReader(spark, index_dir)
    # cursor below every score → empty page
    assert r.search_after(Q, (-1.0, 0), k=10).count() == 0
    assert r.search_after("zzznope", (100.0, 0), k=10).count() == 0


def test_term_vectors_match_tokenizer(spark, index_dir, corpus_df):
    """TermVectors from the index ≡ per-doc tf/dl recomputed with the
    frozen analyzer on raw text."""
    from collections import Counter

    from tlhop_library_spark.analyzer import py_tokens

    ids = [3, 11, 27]
    r = IndexReader(spark, index_dir)
    got = {}
    for row in r.term_vectors(ids).collect():
        got[(row["doc_id"], row["term"])] = (row["tf"], row["dl"])
    rows = {
        x["doc_id"]: x["text"]
        for x in corpus_df.where(F.col("doc_id").isin(ids)).collect()
    }
    expect = {}
    for d, text in rows.items():
        toks = py_tokens(text) if text is not None else []
        for t, c in Counter(toks).items():
            expect[(d, t)] = (c, len(toks))
    assert got == expect and got


def test_term_vectors_empty_and_dedup_ids(spark, index_dir):
    r = IndexReader(spark, index_dir)
    assert r.term_vectors([]).count() == 0
    a = r.term_vectors([5]).count()
    assert r.term_vectors([5, 5, 5]).count() == a


def test_constant_score_is_matching_set_by_docid(spark, index_dir):
    """ConstantScore = the k smallest matching doc_ids, every score
    exactly the boost."""
    r = IndexReader(spark, index_dir)
    got = r.search_constant_score(Q, k=8, boost=3.5).orderBy("rank").collect()
    assert len(got) == 8
    assert all(x["score"] == 3.5 for x in got)
    hits = sorted(x["doc_id"] for x in r._matching_scores(Q).collect())
    assert [x["doc_id"] for x in got] == hits[:8]
    assert r.search_constant_score("zzznope", 5).count() == 0


# ---------------------------------------------------------------------
# reciprocal-rank fusion (hybrid retrieval combiner)
# ---------------------------------------------------------------------
def test_rrf_fuse_hand_computed(spark):
    from tlhop_library_spark.operators.similarity import rrf_fuse

    r1 = spark.createDataFrame(
        [(1, 10), (2, 20), (3, 30)], "rank int, doc_id long"
    )
    r2 = spark.createDataFrame(
        [(1, 20), (2, 40)], "rank int, doc_id long"
    )
    out = {
        r["doc_id"]: (r["rank"], r["rrf"])
        for r in rrf_fuse([r1, r2], k=10, c=60).collect()
    }
    # doc 20: 1/62 + 1/61 ; doc 10: 1/61 ; doc 40: 1/62 ; doc 30: 1/63
    assert out[20][0] == 1
    assert out[10][0] == 2
    assert out[40][0] == 3
    assert out[30][0] == 4
    assert out[20][1] == round(1 / 62 + 1 / 61, 6)
    assert out[10][1] == round(1 / 61, 6)


def test_rrf_fuse_single_ranking_preserves_order(spark):
    from tlhop_library_spark.operators.similarity import rrf_fuse

    r1 = spark.createDataFrame(
        [(1, 5), (2, 9), (3, 2)], "rank int, doc_id long"
    )
    out = [r["doc_id"] for r in rrf_fuse([r1], k=3).collect()]
    assert out == [5, 9, 2]
    import pytest as _pt

    with _pt.raises(ValueError, match="at least one"):
        rrf_fuse([], k=3)


def test_rrf_fuse_fusion_moves_no_corpus(spark):
    """Plan check: fusion aggregates the union of the (tiny) ranked
    inputs only — the plan contains no scan wider than the inputs and
    the final top-k is a TakeOrderedAndProject."""
    from tlhop_library_spark.operators.similarity import rrf_fuse

    r1 = spark.createDataFrame([(1, 1)], "rank int, doc_id long")
    r2 = spark.createDataFrame([(1, 2)], "rank int, doc_id long")
    plan = (
        rrf_fuse([r1, r2], k=5)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in plan


def test_decay_matches_python_recomputation(spark, index_dir, corpus_df):
    """gauss / exp / linear decay: every matching doc's score equals
    round(bm25 · factor, 4) recomputed in Python from the hit
    stream."""
    import math

    r = IndexReader(spark, index_dir)
    docs = corpus_df.withColumn("n_chars", F.length("text"))
    hits = {
        x["doc_id"]: x["score"]
        for x in r._matching_scores(Q).collect()
    }
    flen = {
        x["doc_id"]: x["n_chars"]
        for x in docs.select("doc_id", "n_chars").collect()
    }
    origin, scale, decay, offset = 400.0, 250.0, 0.5, 50.0
    for fn in ("gauss", "exp", "linear"):
        want = {}
        for d_id, s in hits.items():
            dd = max(0.0, abs(flen[d_id] - origin) - offset)
            if fn == "gauss":
                sigma2 = -(scale**2) / (2 * math.log(decay))
                f = math.exp(-(dd**2) / (2 * sigma2))
            elif fn == "exp":
                f = math.exp(dd * math.log(decay) / scale)
            else:
                sl = scale / (1 - decay)
                f = max(0.0, (sl - dd) / sl)
            want[d_id] = round(s * f, 4)
        ranked = sorted(want.items(), key=lambda x: (-x[1], x[0]))[:10]
        got = _ranks(
            r.search_decay(
                Q, docs, "n_chars", origin=origin, scale=scale,
                k=10, decay=decay, offset=offset, fn=fn,
            )
        )
        assert got == [
            (i + 1, d, s) for i, (d, s) in enumerate(ranked)
        ], fn


def test_decay_null_field_not_decayed(spark, index_dir, corpus_df):
    """ES semantics: a doc missing the decay field keeps its raw BM25
    score (factor 1) — with every other doc decayed hard, the nulled
    doc must come out on top if its raw score is the max."""
    r = IndexReader(spark, index_dir)
    top = r.search(Q, k=1).collect()[0]
    docs = corpus_df.withColumn(
        "n_chars",
        F.when(F.col("doc_id") == top["doc_id"], F.lit(None))
        .otherwise(F.length("text")),
    )
    got = r.search_decay(
        Q, docs, "n_chars", origin=-1e9, scale=10.0, k=5,
        decay=0.001, fn="gauss",
    ).collect()
    assert got[0]["doc_id"] == top["doc_id"]
    assert got[0]["score"] == top["score"]


def test_decay_param_validation(spark, index_dir, corpus_df):
    r = IndexReader(spark, index_dir)
    with pytest.raises(ValueError, match="decay"):
        r.search_decay(Q, corpus_df, "doc_id", 0.0, 1.0, decay=1.0)
    with pytest.raises(ValueError, match="fn"):
        r.search_decay(Q, corpus_df, "doc_id", 0.0, 1.0, fn="step")


def test_group_topk_projects_to_collapse(spark, index_dir, corpus_df):
    """per_group=1 rows of top_hits ≡ search_collapse on the same
    field (group_rank/doc pairs), and within-group hits are the
    group's best-scoring docs in order."""
    r = IndexReader(spark, index_dir)
    # NULL group keys form no bucket (ES terms-agg semantics) while
    # collapse keeps NULL as a group — compare on the non-null subset
    docs = corpus_df.select("doc_id", "lang").where(
        F.col("lang").isNotNull()
    )
    g = r.search_group_topk(Q, docs, "lang", n_groups=4, per_group=3)
    rows = g.collect()
    firsts = [
        (x["group_rank"], x["lang"], x["doc_id"], x["score"])
        for x in rows
        if x["hit_rank"] == 1
    ]
    coll = [
        (x["rank"], x["lang"], x["doc_id"], x["score"])
        for x in r.search_collapse(Q, docs, "lang", k=4)
        .orderBy("rank")
        .collect()
    ]
    assert sorted(firsts) == coll
    # within-group ordering: scores non-increasing, ranks contiguous
    by_group = {}
    for x in rows:
        by_group.setdefault(x["lang"], []).append(
            (x["hit_rank"], x["score"], x["doc_id"])
        )
    full = {
        x["doc_id"]: x["score"] for x in r._matching_scores(Q).collect()
    }
    lang_of = {
        x["doc_id"]: x["lang"] for x in docs.collect()
    }
    full = {d: s for d, s in full.items() if d in lang_of}
    for lang, hs in by_group.items():
        hs.sort()
        assert [h[0] for h in hs] == list(range(1, len(hs) + 1))
        # the group's top hits among ALL matching docs of that group
        want = sorted(
            (
                (-s, d)
                for d, s in full.items()
                if lang_of[d] == lang
            ),
        )[: len(hs)]
        assert [(round(-w[0], 4), w[1]) for w in want] == [
            (h[1], h[2]) for h in hs
        ], lang


def test_group_topk_null_keys_form_no_bucket(spark, index_dir,
                                             corpus_df):
    """A doc with a NULL group key never appears and never claims a
    group slot (ES terms aggregation drops missing keys)."""
    r = IndexReader(spark, index_dir)
    docs = corpus_df.select("doc_id", "lang")
    with_null = r.search_group_topk(
        Q, docs, "lang", n_groups=10, per_group=2
    ).collect()
    assert all(x["lang"] is not None for x in with_null)
    ranks = sorted({x["group_rank"] for x in with_null})
    assert ranks == list(range(1, len(ranks) + 1))  # no gaps
