"""Positional index: phrase + proximity query correctness.

Three-way identity for phrase: indexed kernel ≡ declarative DataFrame
path ≡ pure-Python oracle (tokenize with py_tokens, scan for the slot
sequence, score with the frozen BM25 spec). Proximity is checked
against a brute-force Python cover scan. Plain BM25 on a positional
index must be rank-identical to the non-positional index AND must not
read the position streams (plan-level assertion).
"""

from __future__ import annotations

import numpy as np
import pytest

from tlhop_library_spark import bm25
from tlhop_library_spark.analyzer import py_tokens


@pytest.fixture(scope="session")
def pos_index_dir(spark, corpus_df, tmp_path_factory):
    from tlhop_library_spark.index.build import IndexBuilder

    d = str(tmp_path_factory.mktemp("pindex") / "idx")
    IndexBuilder(
        spark, d, n_buckets=8, n_ranges=8, positions=True
    ).build(corpus_df)
    return d


@pytest.fixture(scope="session")
def tokenized(corpus_df):
    rows = corpus_df.select("doc_id", "text").collect()
    return {
        int(r["doc_id"]): py_tokens(r["text"])
        for r in rows
        if r["text"] is not None
    }


def _py_phrase_topk(tokenized: dict, phrase: str, k: int):
    """Pure-Python phrase oracle implementing the frozen spec."""
    slots = py_tokens(phrase)
    terms = sorted(set(slots))
    n = len(tokenized)
    avgdl = sum(len(t) for t in tokenized.values()) / n
    df = {
        t: sum(1 for toks in tokenized.values() if t in toks) for t in terms
    }
    m = len(slots)
    out = []
    for doc, toks in tokenized.items():
        hit = any(
            toks[i : i + m] == slots for i in range(len(toks) - m + 1)
        )
        if not hit:
            continue
        dl = len(toks)
        s = sum(
            bm25.idf(n, df[t])
            * (toks.count(t) * (bm25.K1 + 1))
            / (
                toks.count(t)
                + bm25.K1 * (1 - bm25.B + bm25.B * dl / avgdl)
            )
            for t in terms
        )
        out.append((doc, round(s, bm25.ROUND_DIGITS)))
    out.sort(key=lambda x: (-x[1], x[0]))
    return out[:k]


def _py_proximity_docs(tokenized: dict, query: str, window: int):
    terms = sorted(set(py_tokens(query)))
    out = set()
    for doc, toks in tokenized.items():
        pos = {t: [i for i, x in enumerate(toks) if x == t] for t in terms}
        if any(not p for p in pos.values()):
            continue
        anchors = sorted({p for ps in pos.values() for p in ps})
        for a in anchors:
            if all(
                any(a <= p < a + window for p in ps) for ps in pos.values()
            ):
                out.add(doc)
                break
    return out


PHRASES = [
    "coração ação",            # frequent head bigram
    "ação ação informação",    # trigram with a duplicated slot term
    "análise análise",         # duplicate-term bigram
    "análise tupere",          # mid-frequency bigram (~9 occurrences)
]


@pytest.mark.parametrize("phrase", PHRASES)
def test_phrase_indexed_vs_python_oracle(
    spark, pos_index_dir, tokenized, phrase
):
    from tlhop_library_spark.index import IndexReader

    reader = IndexReader(spark, pos_index_dir)
    got = [
        (int(r["doc_id"]), float(r["score"]))
        for r in reader.search_phrase(phrase, k=10).collect()
    ]
    want = _py_phrase_topk(tokenized, phrase, 10)
    assert got == want, f"phrase {phrase!r}: {got} != {want}"
    assert want, f"phrase {phrase!r} matched nothing — weak fixture"


@pytest.mark.parametrize("phrase", PHRASES[:2])
def test_phrase_indexed_vs_exhaustive(spark, pos_index_dir, corpus_df, phrase):
    from tlhop_library_spark.index import IndexReader
    from tlhop_library_spark.index.phrase import phrase_exhaustive

    reader = IndexReader(spark, pos_index_dir)
    a = reader.search_phrase(phrase, k=10).collect()
    b = phrase_exhaustive(corpus_df, phrase, k=10).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]


def test_phrase_missing_term_empty(spark, pos_index_dir):
    from tlhop_library_spark.index import IndexReader

    reader = IndexReader(spark, pos_index_dir)
    assert reader.search_phrase("ação zzzunseen", k=5).count() == 0
    assert reader.search_phrase("", k=5).count() == 0


def test_phrase_requires_positions(spark, index_dir):
    from tlhop_library_spark.index import IndexReader

    reader = IndexReader(spark, index_dir)
    with pytest.raises(ValueError, match="positional"):
        reader.search_phrase("spark join")


@pytest.mark.parametrize(
    "query,window", [("análise tupere", 5), ("pili página conteúdo", 8)]
)
def test_proximity_indexed_vs_python(
    spark, pos_index_dir, tokenized, query, window
):
    from tlhop_library_spark.index import IndexReader

    reader = IndexReader(spark, pos_index_dir)
    got_rows = reader.search_proximity(query, window=window, k=1000).collect()
    got = {int(r["doc_id"]) for r in got_rows}
    want = _py_proximity_docs(tokenized, query, window)
    assert got == want
    assert want, "proximity fixture matched nothing — weak fixture"


def test_plain_search_identical_on_positional_index(
    spark, pos_index_dir, index_dir
):
    from tlhop_library_spark.index import IndexReader

    rp = IndexReader(spark, pos_index_dir)
    rn = IndexReader(spark, index_dir)
    for q in ["ação", "coração informação", "análise segurança índice"]:
        a = rp.search(q, k=10).collect()
        b = rn.search(q, k=10).collect()
        assert [tuple(r) for r in a] == [tuple(r) for r in b]


def test_plain_search_prunes_position_streams(spark, pos_index_dir):
    from tlhop_library_spark.index import IndexReader

    reader = IndexReader(spark, pos_index_dir)
    df = reader.search("ação coração", k=5)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "doc_bytes" in plan, "expected a real chunk scan in the plan"
    assert "pos_bytes" not in plan, "plain BM25 read the position stream"


# ---------------------------------------------------------------------
# serving-path twins (driver-side pyarrow scan, same kernels)
# ---------------------------------------------------------------------
def test_phrase_serving_identical(spark, pos_index_dir):
    from tlhop_library_spark.index import IndexReader

    reader = IndexReader(spark, pos_index_dir)

    def rows(df):
        return [
            (r["rank"], r["doc_id"], r["score"])
            for r in df.orderBy("rank").collect()
        ]

    hit_any = False
    for phrase in PHRASES + ["ação zzzunseen", ""]:
        got = rows(reader.search_phrase_local(phrase, 10))
        assert got == rows(reader.search_phrase(phrase, 10)), phrase
        hit_any = hit_any or bool(got)
    assert hit_any


def test_proximity_serving_identical(spark, pos_index_dir):
    from tlhop_library_spark.index import IndexReader

    reader = IndexReader(spark, pos_index_dir)

    def rows(df):
        return [
            (r["rank"], r["doc_id"], r["score"])
            for r in df.orderBy("rank").collect()
        ]

    for q, w in [("análise tupere", 5), ("pili página conteúdo", 8)]:
        got = rows(reader.search_proximity_local(q, w, 10))
        assert got == rows(reader.search_proximity(q, w, 10)), q


def test_positional_serving_requires_positions(spark, index_dir):
    from tlhop_library_spark.index import IndexReader

    reader = IndexReader(spark, index_dir)
    with pytest.raises(ValueError):
        reader.search_phrase_local("bace cada")
    with pytest.raises(ValueError):
        reader.search_proximity_local("bace cada", 5)


@pytest.mark.parametrize("term,end", [("informação", 15), ("tupere", 40)])
def test_span_first_matches_brute_force(
    spark, pos_index_dir, tokenized, term, end
):
    """SpanFirst ≡ python brute force: docs whose first occurrence of
    the term sits at 0-based position < end, BM25-scored on the term."""
    from tlhop_library_spark.index import IndexReader

    matched = {
        d: tk for d, tk in tokenized.items() if term in tk[:end]
    }
    assert matched, "weak fixture — term never early enough"
    n = len(tokenized)
    avgdl = sum(len(t) for t in tokenized.values()) / n
    df = sum(1 for tk in tokenized.values() if term in tk)
    idf = bm25.idf(n, df)
    scored = sorted(
        (
            (
                d,
                round(
                    idf
                    * (tk.count(term) * (bm25.K1 + 1))
                    / (
                        tk.count(term)
                        + bm25.K1
                        * (1 - bm25.B + bm25.B * len(tk) / avgdl)
                    ),
                    bm25.ROUND_DIGITS,
                ),
            )
            for d, tk in matched.items()
        ),
        key=lambda x: (-x[1], x[0]),
    )[:10]
    expect = [(i + 1, d, s) for i, (d, s) in enumerate(scored)]
    reader = IndexReader(spark, pos_index_dir)
    got = [
        (r["rank"], r["doc_id"], r["score"])
        for r in reader.search_span_first(term, end, 10)
        .orderBy("rank")
        .collect()
    ]
    assert got == expect


def test_span_first_end_zero_and_missing(spark, pos_index_dir):
    from tlhop_library_spark.index import IndexReader

    reader = IndexReader(spark, pos_index_dir)
    assert reader.search_span_first("informação", 0, 5).count() == 0
    assert reader.search_span_first("zzznope", 10, 5).count() == 0
    with pytest.raises(ValueError):
        reader.search_span_first("two terms", 10)


# ---------------------------------------------------------------------
# ordered span-near (SpanNearQuery inOrder=true)
# ---------------------------------------------------------------------
def _py_span_near_docs(tokenized: dict, query: str, slop: int):
    """Brute-force ordered-span oracle: greedy minimal chain per
    start position (provably minimal end for each start)."""
    import bisect

    clauses = py_tokens(query)
    out = set()
    for doc, toks in tokenized.items():
        lists = [
            [i for i, x in enumerate(toks) if x == c] for c in clauses
        ]
        if any(not lst for lst in lists):
            continue
        for p0 in lists[0]:
            prev, ok = p0, True
            for lst in lists[1:]:
                j = bisect.bisect_right(lst, prev)
                if j >= len(lst):
                    ok = False
                    break
                prev = lst[j]
            if ok and prev - p0 - (len(clauses) - 1) <= slop:
                out.add(doc)
                break
    return out


SPAN_NEAR_CASES = [
    ("análise tupere", 3),
    ("tupere análise", 3),       # reversed — order must matter
    ("pili página conteúdo", 5),
    ("análise análise", 10),     # repeated clause: two distinct positions
]


@pytest.mark.parametrize("query,slop", SPAN_NEAR_CASES)
def test_span_near_indexed_vs_python(
    spark, pos_index_dir, tokenized, query, slop
):
    from tlhop_library_spark.index import IndexReader

    reader = IndexReader(spark, pos_index_dir)
    got = {
        int(r["doc_id"])
        for r in reader.search_span_near(query, slop=slop, k=10_000).collect()
    }
    assert got == _py_span_near_docs(tokenized, query, slop), (query, slop)


def test_span_near_order_matters(tokenized):
    fwd = _py_span_near_docs(tokenized, "análise tupere", 3)
    rev = _py_span_near_docs(tokenized, "tupere análise", 3)
    assert fwd, "forward fixture matched nothing — weak fixture"
    assert fwd != rev, "fixture cannot distinguish ordered from unordered"


def test_span_near_slop0_equals_phrase(spark, pos_index_dir):
    from tlhop_library_spark.index import IndexReader

    reader = IndexReader(spark, pos_index_dir)
    for q in ["coração ação", "análise tupere"]:
        a = [tuple(r) for r in reader.search_span_near(q, 0, 10).collect()]
        b = [tuple(r) for r in reader.search_phrase(q, 10).collect()]
        assert a == b, q


def test_span_near_subset_of_proximity(spark, pos_index_dir):
    """An ordered span of width ≤ slop + (n−1) sits inside an
    unordered window of slop + n tokens."""
    from tlhop_library_spark.index import IndexReader

    reader = IndexReader(spark, pos_index_dir)
    q, slop = "análise tupere", 3
    n = 2
    near = {
        int(r["doc_id"])
        for r in reader.search_span_near(q, slop, 10_000).collect()
    }
    prox = {
        int(r["doc_id"])
        for r in reader.search_proximity(q, window=slop + n, k=10_000)
        .collect()
    }
    assert near <= prox


def test_span_near_matches_duckdb(spark, pos_index_dir, corpus_path):
    import duckdb

    from tlhop_library_spark.index import IndexReader
    from tlhop_library_spark.index.phrase import oracle_sql_span_near

    reader = IndexReader(spark, pos_index_dir)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{corpus_path}'"
    )
    for q, slop in SPAN_NEAR_CASES:
        got = [
            (r["rank"], r["doc_id"], r["score"])
            for r in reader.search_span_near(q, slop, 10).collect()
        ]
        exp = [
            tuple(r)
            for r in con.execute(
                oracle_sql_span_near(q, slop, 10)
            ).fetchall()
        ]
        assert got == exp, (q, slop)


def test_span_near_absent_term_and_empty(spark, pos_index_dir):
    from tlhop_library_spark.index import IndexReader

    reader = IndexReader(spark, pos_index_dir)
    assert reader.search_span_near("ação zzzunseen", 5, 10).count() == 0
    assert reader.search_span_near("", 5, 10).count() == 0


# ---------------------------------------------------------------------
# match-phrase-prefix (ES search-as-you-type)
# ---------------------------------------------------------------------
PHRASE_PREFIX_QUERIES = [
    "análise tup",       # exact term + multi/uni-candidate prefix
    "coração aç",        # accented prefix
    "ba",                # bare prefix (no exact slots)
    "análise zzznope",   # prefix with no completions → empty
    "zzzunseen tup",     # missing exact term → empty
]


@pytest.mark.parametrize("query", PHRASE_PREFIX_QUERIES)
def test_phrase_prefix_matches_duckdb(
    spark, pos_index_dir, corpus_path, query
):
    import duckdb

    from tlhop_library_spark.index import IndexReader
    from tlhop_library_spark.index.phrase import oracle_sql_phrase_prefix

    reader = IndexReader(spark, pos_index_dir)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{corpus_path}'")
    got = [
        (r["rank"], r["doc_id"], r["score"])
        for r in reader.search_phrase_prefix(
            query, k=10, max_expansions=1000
        ).collect()
    ]
    exp = [
        tuple(r)
        for r in con.execute(oracle_sql_phrase_prefix(query, 10)).fetchall()
    ]
    assert got == exp, query


def test_phrase_prefix_single_candidate_equals_phrase(
    spark, pos_index_dir
):
    """When the trailing prefix expands to EXACTLY the one dictionary
    term, the synonym group degenerates to that term (summed tf = its
    tf, max df = its df) and the result must be rank+score-identical
    to the exact phrase."""
    from tlhop_library_spark.index import IndexReader

    reader = IndexReader(spark, pos_index_dir)
    # find a corpus term whose prefix-to-itself expansion is unique
    assert set(reader.lookup_terms_prefix(["tupere"])) == {"tupere"}
    a = [
        tuple(r)
        for r in reader.search_phrase_prefix("análise tupere", 10).collect()
    ]
    b = [tuple(r) for r in reader.search_phrase("análise tupere", 10).collect()]
    assert a == b and a


def test_phrase_prefix_guards(spark, pos_index_dir, index_dir):
    from tlhop_library_spark.index import IndexReader

    reader = IndexReader(spark, pos_index_dir)
    # a leading token below the analyzer's min length cannot be an
    # exact phrase slot
    with pytest.raises(ValueError, match="analyzable"):
        reader.search_phrase_prefix("ab cde")
    # Lucene-style expansion guard
    with pytest.raises(ValueError, match="expands"):
        reader.search_phrase_prefix("análise b", max_expansions=1)
    # plain (non-positional) index rejected
    plain = IndexReader(spark, index_dir)
    with pytest.raises(ValueError, match="positional"):
        plain.search_phrase_prefix("bace ca")
    # empty query → empty result
    assert reader.search_phrase_prefix("", 10).count() == 0


# ---------------------------------------------------------------------
# span_not (Lucene SpanNotQuery)
# ---------------------------------------------------------------------
def _py_span_not_docs(tokenized, include, excl, slop, pre, post):
    """All-ordered-tuples reference (NOT the kernel's minimal-chain
    shortcut — this independently verifies the minimal-chain theorem):
    a doc matches iff SOME in-order tuple within slop has no exclude
    occurrence in [p0-pre, plast+post]."""
    import itertools

    from tlhop_library_spark.analyzer import py_tokens

    clauses = py_tokens(include)
    ex = py_tokens(excl)[0]
    out = set()
    for doc, toks in tokenized.items():
        lists = [
            [i for i, x in enumerate(toks) if x == c] for c in clauses
        ]
        if any(not lst for lst in lists):
            continue
        xpos = [i for i, x in enumerate(toks) if x == ex]
        for tup in itertools.product(*lists):
            if any(tup[i] <= tup[i - 1] for i in range(1, len(tup))):
                continue
            if tup[-1] - tup[0] - (len(tup) - 1) > slop:
                continue
            if not any(
                tup[0] - pre <= q <= tup[-1] + post for q in xpos
            ):
                out.add(doc)
                break
    return out


SPAN_NOT_CASES = [
    ("análise tupere", "ação", 3, 1, 1),
    ("análise tupere", "coração", 3, 2, 2),
    ("pili página conteúdo", "tecnologia", 5, 2, 2),
    # self-exclusion: the include term's own occurrence sits inside
    # every span window, so NOTHING can match (Lucene agrees)
    ("análise tupere", "análise", 3, 0, 0),
]


@pytest.mark.parametrize("inc,ex,slop,pre,post", SPAN_NOT_CASES)
def test_span_not_indexed_vs_python(
    spark, pos_index_dir, tokenized, inc, ex, slop, pre, post
):
    from tlhop_library_spark.index import IndexReader

    reader = IndexReader(spark, pos_index_dir)
    got = {
        int(r["doc_id"])
        for r in reader.search_span_not(
            inc, ex, slop=slop, k=10_000, pre=pre, post=post
        ).collect()
    }
    assert got == _py_span_not_docs(tokenized, inc, ex, slop, pre, post)


def test_span_not_actually_rejects(spark, pos_index_dir, tokenized):
    """At least one case must reject ≥1 span-near doc, or the fixture
    proves nothing about the exclusion."""
    from tlhop_library_spark.index import IndexReader

    reader = IndexReader(spark, pos_index_dir)
    rejected = 0
    for inc, ex, slop, pre, post in SPAN_NOT_CASES:
        near = {
            int(r["doc_id"])
            for r in reader.search_span_near(inc, slop, k=10_000).collect()
        }
        notq = {
            int(r["doc_id"])
            for r in reader.search_span_not(
                inc, ex, slop=slop, k=10_000, pre=pre, post=post
            ).collect()
        }
        assert notq <= near, (inc, ex)
        rejected += len(near - notq)
    assert rejected > 0, "no case rejects anything — weak fixture"


def test_span_not_absent_exclude_is_span_near(spark, pos_index_dir):
    from tlhop_library_spark.index import IndexReader

    reader = IndexReader(spark, pos_index_dir)
    a = [
        (r["rank"], r["doc_id"], r["score"])
        for r in reader.search_span_not(
            "análise tupere", "zzznope", slop=3, k=10
        ).collect()
    ]
    b = [
        (r["rank"], r["doc_id"], r["score"])
        for r in reader.search_span_near(
            "análise tupere", slop=3, k=10
        ).collect()
    ]
    assert a == b and a


def test_span_not_matches_duckdb(spark, pos_index_dir, corpus_path):
    import duckdb

    from tlhop_library_spark.index import IndexReader
    from tlhop_library_spark.index.phrase import oracle_sql_span_not

    reader = IndexReader(spark, pos_index_dir)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{corpus_path}'"
    )
    for inc, ex, slop, pre, post in SPAN_NOT_CASES:
        got = [
            (r["rank"], r["doc_id"], r["score"])
            for r in reader.search_span_not(
                inc, ex, slop=slop, k=10, pre=pre, post=post
            ).collect()
        ]
        exp = [
            tuple(r)
            for r in con.execute(
                oracle_sql_span_not(inc, ex, slop, pre, post, 10)
            ).fetchall()
        ]
        assert got == exp, (inc, ex)


def test_span_not_guards(spark, pos_index_dir):
    from tlhop_library_spark.index import IndexReader

    reader = IndexReader(spark, pos_index_dir)
    with pytest.raises(ValueError, match="exactly one term"):
        reader.search_span_not("análise tupere", "two words")
    with pytest.raises(ValueError, match="exactly one term"):
        # "de" is sub-min-length — the analyzer yields zero terms
        reader.search_span_not("análise tupere", "de")
    assert reader.search_span_not("", "tesa").count() == 0


def test_span_not_sharded_identical(
    spark, corpus_df, pos_index_dir, tmp_path_factory
):
    from pyspark.sql import functions as F

    from tlhop_library_spark.index import (
        IndexReader,
        ShardedIndexReader,
    )
    from tlhop_library_spark.index.build import IndexBuilder

    base = tmp_path_factory.mktemp("span_not_shards")
    dirs = []
    for i, (nb, nr) in enumerate([(4, 4), (8, 2)]):
        d = str(base / f"shard{i}")
        IndexBuilder(
            spark, d, n_buckets=nb, n_ranges=nr, n_jobs=2,
            positions=True,
        ).build(corpus_df.where(F.col("doc_id") % 2 == i))
        dirs.append(d)
    sharded = ShardedIndexReader(spark, dirs)
    single = IndexReader(spark, pos_index_dir)
    for inc, ex, slop, pre, post in SPAN_NOT_CASES:
        a = [
            tuple(r)
            for r in sharded.search_span_not(
                inc, ex, slop=slop, k=10, pre=pre, post=post
            ).orderBy("rank").collect()
        ]
        b = [
            tuple(r)
            for r in single.search_span_not(
                inc, ex, slop=slop, k=10, pre=pre, post=post
            ).orderBy("rank").collect()
        ]
        assert a == b, (inc, ex)
