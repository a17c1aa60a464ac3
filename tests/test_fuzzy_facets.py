"""Fuzzy (edit-distance) retrieval and facet counts.

Identity web: indexed search_fuzzy ≡ declarative fuzzy_exhaustive ≡
the DuckDB oracle on the same parquet; facet_counts ≡ declarative
facet_exhaustive ≡ DuckDB, including NULL facet values; fuzzy at
max_edits=0 reduces to plain search.
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from tlhop_library_spark.index.query import (
    IndexReader,
    facet_exhaustive,
    fuzzy_exhaustive,
    oracle_sql_bm25_fuzzy,
    oracle_sql_facets,
)

FUZZY_QUERIES = [
    "bace",        # exact corpus term — expansion adds its 1-edit kin
    "bXce",        # pure typo: only fuzzy matching can hit
    "bace cda",    # one exact, one typo
    "zzznope",     # nothing within 1 edit
]


@pytest.fixture(scope="module")
def reader(spark, index_dir):
    return IndexReader(spark, index_dir)


def _rows(df):
    return [(r["rank"], r["doc_id"], r["score"]) for r in df.collect()]


def _facets(df):
    return sorted(
        ((r["facet"], r["n_docs"]) for r in df.collect()),
        key=lambda t: (t[0] is None, t[0] or "", t[1]),
    )


# ---------------------------------------------------------------------
# fuzzy
# ---------------------------------------------------------------------
def test_fuzzy_indexed_matches_exhaustive(reader, corpus_df):
    for q in FUZZY_QUERIES:
        ix = _rows(reader.search_fuzzy(q, 10))
        ex = _rows(fuzzy_exhaustive(corpus_df, q, 10))
        assert ix == ex, q


def test_fuzzy_matches_duckdb(reader, corpus_path):
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{corpus_path}'")
    for q in FUZZY_QUERIES:
        got = _rows(reader.search_fuzzy(q, 10))
        want = [
            (r[0], r[1], r[2])
            for r in con.execute(oracle_sql_bm25_fuzzy(q, 10)).fetchall()
        ]
        assert got == want, q


def test_fuzzy_zero_edits_is_plain_search(reader):
    assert _rows(reader.search_fuzzy("bace cada", 10, max_edits=0)) == _rows(
        reader.search("bace cada", 10)
    )


def test_fuzzy_expansion_superset(reader):
    """The expanded term set contains the exact terms plus only terms
    within the edit budget."""
    info = reader.lookup_terms_fuzzy(["bace"], max_edits=1)
    assert "bace" in info
    exact = reader.lookup_terms(["bace"])
    assert info["bace"] == exact["bace"]
    for t in info:
        assert abs(len(t) - 4) <= 1


def test_fuzzy_typo_recovers_results(reader, corpus_df):
    """A 1-edit typo of a high-df corpus term must return hits even
    though the literal term is absent."""
    assert _rows(reader.search("bXce", 10)) == []
    assert _rows(reader.search_fuzzy("bXce", 10))


# ---------------------------------------------------------------------
# wildcard
# ---------------------------------------------------------------------
WILDCARD_QUERIES = ["bac*", "bac* cada", "informaç*", "zzz*"]


def test_wildcard_indexed_matches_exhaustive_and_duckdb(
    reader, corpus_df, corpus_path
):
    from tlhop_library_spark.index.query import (
        oracle_sql_bm25_wildcard,
        wildcard_exhaustive,
    )

    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{corpus_path}'")
    for q in WILDCARD_QUERIES:
        ix = _rows(reader.search_wildcard(q, 10))
        assert ix == _rows(wildcard_exhaustive(corpus_df, q, 10)), q
        want = [
            (r[0], r[1], r[2])
            for r in con.execute(oracle_sql_bm25_wildcard(q, 10)).fetchall()
        ]
        assert ix == want, q


def test_wildcard_no_star_is_plain_search(reader):
    assert _rows(reader.search_wildcard("bace cada", 10)) == _rows(
        reader.search("bace cada", 10)
    )


def test_wildcard_guards(reader):
    import pytest as _pt

    with _pt.raises(ValueError):
        reader.search_wildcard("ba*", 10)       # stem too short
    with _pt.raises(ValueError):
        reader.search_wildcard("bace cad*", 10, max_expansions=1)


def test_suggest_ranks_by_distance_then_df(reader):
    out = reader.suggest("bace", max_edits=1, n=5)
    assert out and out[0][0] == "bace" and out[0][1] == 0
    dists = [d for _, d, _ in out]
    assert dists == sorted(dists)
    from itertools import groupby

    for _, grp in groupby(out, key=lambda x: x[1]):
        dfs = [g[2] for g in grp]
        assert dfs == sorted(dfs, reverse=True)


def test_suggest_rejects_multi_term(reader):
    with pytest.raises(ValueError):
        reader.suggest("bace cada")


# ---------------------------------------------------------------------
# facets
# ---------------------------------------------------------------------
def test_facets_indexed_matches_exhaustive(reader, corpus_df):
    for q in ["bace", "bace cada", "zzznope"]:
        ix = _facets(reader.facet_counts(q, corpus_df, "lang"))
        ex = _facets(facet_exhaustive(corpus_df, q, "lang"))
        assert ix == ex, q
    assert _facets(reader.facet_counts("bace", corpus_df, "lang"))


def test_facets_match_duckdb(reader, corpus_df, corpus_path):
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{corpus_path}'")
    got = _facets(reader.facet_counts("bace cada", corpus_df, "lang"))
    want = sorted(
        ((r[0], r[1]) for r in
         con.execute(oracle_sql_facets("bace cada", "lang")).fetchall()),
        key=lambda t: (t[0] is None, t[0] or "", t[1]),
    )
    assert got == want


def test_facets_total_equals_matching_docs(reader, corpus_df):
    """Per-facet counts sum to the number of matching docs (each doc
    counted exactly once despite multi-term matches)."""
    fc = reader.facet_counts("bace cada", corpus_df, "lang")
    total = fc.agg(F.sum("n_docs")).collect()[0][0]
    matching = (
        corpus_df.where(F.col("text").isNotNull())
        .where(
            F.col("text").rlike("(?i)\\bbace\\b")
            | F.col("text").rlike("(?i)\\bcada\\b")
        )
        .count()
    )
    assert total == matching


def test_autocomplete_prefix_ranking(reader, corpus_df):
    from pyspark.sql import functions as F

    out = [(r["term"], r["cf"], r["df"])
           for r in reader.autocomplete("ba", n=5).collect()]
    assert out and all(t.startswith("ba") for t, _, _ in out)
    cfs = [c for _, c, _ in out]
    assert cfs == sorted(cfs, reverse=True)
    # brute force over the corpus token stream
    from tlhop_library_spark.analyzer import tokens_col

    brute = (
        corpus_df.where(F.col("text").isNotNull())
        .select("doc_id", F.explode(tokens_col(F.col("text"))).alias("t"))
        .where(F.col("t").startswith("ba"))
        .groupBy("t")
        .agg(F.count("*").alias("cf"), F.countDistinct("doc_id").alias("df"))
        .orderBy(F.desc("cf"), F.desc("df"), F.asc("t"))
        .limit(5)
        .collect()
    )
    assert out == [(r["t"], r["cf"], r["df"]) for r in brute]


def test_autocomplete_pushdown_and_guards(reader):
    plan = reader.autocomplete("ba")._jdf.queryExecution().executedPlan(
    ).toString()
    assert "StartsWith" in plan  # predicate reaches the parquet scan
    with pytest.raises(ValueError):
        reader.autocomplete("two words")
    with pytest.raises(ValueError):
        reader.autocomplete("")
    assert reader.autocomplete("zzznope").count() == 0


# ---------------------------------------------------------------------
# phrase suggester (multi-word did-you-mean, bigram-LM ranked)
# ---------------------------------------------------------------------
def test_suggest_phrase_matches_duckdb(reader, corpus_df, corpus_path):
    import duckdb

    from tlhop_library_spark.index.query import oracle_sql_suggest_phrase

    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{corpus_path}'")
    # ASCII-only typo pairs: DuckDB's levenshtein is byte-level so the
    # oracle replay is exact only over ASCII candidate sets (documented
    # in oracle_sql_suggest_phrase)
    for q in ["bce cda", "tupre pili", "bace cada"]:
        got = [
            (r["rank"], r["suggestion"], r["score"])
            for r in reader.suggest_phrase(q, corpus_df, n=5).collect()
        ]
        exp = [
            tuple(r)
            for r in con.execute(oracle_sql_suggest_phrase(q, 5)).fetchall()
        ]
        assert got == exp, q
        assert got, f"{q!r} produced no suggestions — weak fixture"


def test_suggest_phrase_prefers_fluent_sequence(reader, corpus_df):
    """The LM must rank a corpus-attested bigram above a sequence of
    the same edit quality whose words never co-occur adjacently: for
    the exact query 'bace cada' (both terms in the dictionary) the
    top suggestion contains the original words only if their bigram
    is at least as likely — and the winning score must be the max of
    the candidate-sequence scores (sanity of the ranking order).
    Both query terms are IN the dictionary (dist-0 candidates), so
    the identity sequence must appear among the combinations."""
    out = [
        (r["suggestion"], r["score"])
        for r in reader.suggest_phrase(
            "bace babi", corpus_df, n=50, per_token=3
        ).collect()
    ]
    scores = [s for _, s in out]
    assert scores == sorted(scores, reverse=True)
    assert any(s == "bace babi" for s, _ in out)


def test_suggest_phrase_guards(reader, corpus_df):
    with pytest.raises(ValueError, match="2-4"):
        reader.suggest_phrase("bace", corpus_df)
    with pytest.raises(ValueError, match="2-4"):
        reader.suggest_phrase("a b c d e f", corpus_df)
    # a token with no dictionary candidate within max_edits → empty
    assert (
        reader.suggest_phrase("bace qqqqqqq", corpus_df, n=3).count() == 0
    )


def test_facet_cardinality_exact_and_sketch(spark, index_dir, corpus_df):
    """Exact mode = countDistinct among matching docs (NULLs
    ignored); sketch mode = the oracle-reproducible KMV estimate,
    exact below k."""
    from tlhop_library_spark.index.query import IndexReader

    r = IndexReader(spark, index_dir)
    q = "informação segurança"
    hits = {x["doc_id"] for x in r._matching_scores(q).collect()}
    assert hits
    langs = {
        x["lang"]
        for x in corpus_df.where(
            F.col("doc_id").isin(list(hits)) & F.col("lang").isNotNull()
        ).collect()
    }
    got = r.facet_cardinality(q, corpus_df, "lang").collect()
    assert got[0]["cardinality"] == len(langs)
    # sketch mode: below k the KMV answer is exact
    sk = r.facet_cardinality(q, corpus_df, "lang", k=64).collect()[0]
    assert sk["kmv_estimate"] == float(len(langs))
    assert sk["k_used"] == len(langs)
