"""Multi-field search: per-field BM25 with query-time boosts, summed.

Identity oracles:
- a single-field MultiFieldIndexReader ≡ plain IndexReader.search
- two-field scores ≡ a numpy recomputation from the raw corpus text
- boost linearity: doubling every boost doubles every score, ranks fixed
- zero-boosted fields are skipped entirely
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from tlhop_library_spark import bm25
from tlhop_library_spark.analyzer import py_tokens

TITLE_TOKENS = 6
QUERIES = ["bace cada", "informação", "de", "zzznope", ""]


def title_expr():
    return F.array_join(
        F.slice(F.split(F.col("text"), " "), 1, TITLE_TOKENS), " "
    )


def py_title(text: str) -> str:
    return " ".join(text.split(" ")[:TITLE_TOKENS])


def rows(df):
    return [
        (r["rank"], r["doc_id"], r["score"])
        for r in df.orderBy("rank").collect()
    ]


@pytest.fixture(scope="module")
def mf(spark, corpus_df, tmp_path_factory):
    from tlhop_library_spark.index import (
        MultiFieldIndexReader,
        build_index,
    )

    base = tmp_path_factory.mktemp("mfidx")
    dirs = {}
    for field, col in [
        ("title", title_expr()), ("body", F.col("text")),
    ]:
        d = str(base / field)
        build_index(
            spark,
            corpus_df.select("doc_id", col.alias("text")),
            d, n_buckets=4, n_ranges=8,
        )
        dirs[field] = d
    return MultiFieldIndexReader(spark, dirs)


def test_single_field_equals_plain_search(spark, corpus_df, index_dir,
                                          tmp_path_factory):
    from tlhop_library_spark.index import (
        IndexReader,
        MultiFieldIndexReader,
    )

    single = IndexReader(spark, index_dir)
    mf1 = MultiFieldIndexReader(spark, {"body": index_dir})
    for q in QUERIES:
        assert rows(mf1.search(q, k=10)) == rows(
            single.search(q, k=10)
        ), q


def _numpy_multifield_topk(texts: dict[int, str], terms, boosts, k):
    """Reference recomputation of the weighted-sum spec."""
    fields = {
        "title": {d: py_title(t) for d, t in texts.items()},
        "body": texts,
    }
    totals: dict[int, float] = {}
    for f, fd in fields.items():
        toks = {d: py_tokens(t) for d, t in fd.items()}
        dls = {d: len(tk) for d, tk in toks.items()}
        n = len(fd)
        avgdl = sum(dls.values()) / n
        for term in terms:
            df = sum(1 for tk in toks.values() if term in tk)
            if not df:
                continue
            idf = bm25.idf(n, df)
            for d, tk in toks.items():
                tf = tk.count(term)
                if not tf:
                    continue
                w = (
                    boosts[f] * idf * tf * (bm25.K1 + 1)
                    / (tf + bm25.K1 * (1 - bm25.B + bm25.B * dls[d] / avgdl))
                )
                totals[d] = totals.get(d, 0.0) + w
    ranked = sorted(
        ((round(s, bm25.ROUND_DIGITS), d) for d, s in totals.items()),
        key=lambda x: (-x[0], x[1]),
    )[:k]
    return [
        (i + 1, d, s) for i, (s, d) in enumerate(ranked)
    ]


def test_two_field_scores_match_reference_spec(spark, corpus_df, mf):
    texts = {
        r["doc_id"]: r["text"]
        for r in corpus_df.where(F.col("text").isNotNull()).collect()
    }
    boosts = {"title": 2.5, "body": 1.0}
    for q in ["bace cada", "informação"]:
        got = rows(mf.search(q, k=10, boosts=boosts))
        want = _numpy_multifield_topk(
            texts, sorted(set(py_tokens(q))), boosts, 10
        )
        assert got == want, q


def test_boost_linearity_and_title_promotion(spark, mf):
    base = rows(mf.search("bace cada", k=10))
    doubled = rows(
        mf.search("bace cada", k=10, boosts={"title": 2.0, "body": 2.0})
    )
    assert [(r, d) for r, d, _ in base] == [(r, d) for r, d, _ in doubled]
    for (_, _, s1), (_, _, s2) in zip(base, doubled):
        assert s2 == pytest.approx(2 * s1, abs=2e-4)


def test_zero_boost_skips_field(spark, mf, corpus_df, index_dir,
                                tmp_path_factory):
    """boost 0 on title must equal a body-only search — and must not
    even scan the title index."""
    got = rows(mf.search("bace cada", k=10, boosts={"title": 0.0}))
    body_only = rows(
        mf.search("bace cada", k=10, boosts={"title": 0.0, "body": 1.0})
    )
    assert got == body_only
    from tlhop_library_spark.index import MultiFieldIndexReader

    mf_body = MultiFieldIndexReader(
        spark, {"body": mf.readers["body"].index_dir}
    )
    assert got == rows(mf_body.search("bace cada", k=10))


def test_misaligned_ranges_rejected(spark, corpus_df, tmp_path_factory):
    from tlhop_library_spark.index import (
        MultiFieldIndexReader,
        build_index,
    )

    base = tmp_path_factory.mktemp("mfbad")
    a = str(base / "a")
    b = str(base / "b")
    build_index(
        spark, corpus_df.select("doc_id", "text"), a,
        n_buckets=4, n_ranges=8,
    )
    build_index(
        spark, corpus_df.select("doc_id", "text"), b,
        n_buckets=4, n_ranges=2,
    )
    with pytest.raises(ValueError, match="range-aligned"):
        MultiFieldIndexReader(spark, {"a": a, "b": b})
    with pytest.raises(ValueError):
        MultiFieldIndexReader(spark, {})


def _field_totals(texts: dict[int, str], terms, boosts):
    """Per-field per-doc query totals (unrounded) for the spec
    recomputations below."""
    fields = {
        "title": {d: py_title(t) for d, t in texts.items()},
        "body": texts,
    }
    out: dict[str, dict[int, float]] = {}
    stats = {}
    for f, fd in fields.items():
        toks = {d: py_tokens(t) for d, t in fd.items()}
        dls = {d: len(tk) for d, tk in toks.items()}
        n = len(fd)
        avgdl = sum(dls.values()) / n
        stats[f] = (toks, dls, n, avgdl)
        tot: dict[int, float] = {}
        for term in terms:
            df = sum(1 for tk in toks.values() if term in tk)
            if not df:
                continue
            idf = bm25.idf(n, df)
            for d, tk in toks.items():
                tf = tk.count(term)
                if not tf:
                    continue
                w = (
                    boosts[f] * idf * tf * (bm25.K1 + 1)
                    / (tf + bm25.K1 * (1 - bm25.B + bm25.B * dls[d] / avgdl))
                )
                tot[d] = tot.get(d, 0.0) + w
        out[f] = tot
    return out, stats


def _rank(totals: dict[int, float], k: int):
    ranked = sorted(
        ((round(s, bm25.ROUND_DIGITS), d) for d, s in totals.items()),
        key=lambda x: (-x[0], x[1]),
    )[:k]
    return [(i + 1, d, s) for i, (s, d) in enumerate(ranked)]


def test_best_fields_tie1_equals_most_fields(spark, mf):
    """tie_breaker=1.0 degenerates DisMax to the plain sum."""
    for q in QUERIES:
        assert rows(
            mf.search_best_fields(q, k=10, tie_breaker=1.0)
        ) == rows(mf.search(q, k=10)), q


def test_best_fields_matches_reference_spec(spark, corpus_df, mf):
    texts = {
        r["doc_id"]: r["text"]
        for r in corpus_df.where(F.col("text").isNotNull()).collect()
    }
    boosts = {"title": 2.0, "body": 1.0}
    for q in ["bace cada", "informação"]:
        terms = sorted(set(py_tokens(q)))
        per_field, _ = _field_totals(texts, terms, boosts)
        for tie in (0.0, 0.4):
            want_tot: dict[int, float] = {}
            docs = {d for t in per_field.values() for d in t}
            for d in docs:
                ss = [t[d] for t in per_field.values() if d in t]
                want_tot[d] = max(ss) + tie * (sum(ss) - max(ss))
            got = rows(
                mf.search_best_fields(q, k=10, boosts=boosts,
                                      tie_breaker=tie)
            )
            assert got == _rank(want_tot, 10), (q, tie)


def test_cross_fields_matches_reference_spec(spark, corpus_df, mf):
    texts = {
        r["doc_id"]: r["text"]
        for r in corpus_df.where(F.col("text").isNotNull()).collect()
    }
    boosts = {"title": 2.0, "body": 1.0}
    for q in ["bace cada", "informação"]:
        terms = sorted(set(py_tokens(q)))
        _, stats = _field_totals(texts, terms, boosts)
        n_blend = max(n for _, _, n, _ in stats.values())
        for tie in (0.0, 0.3):
            want_tot: dict[int, float] = {}
            for term in terms:
                dfb = max(
                    sum(1 for tk in toks.values() if term in tk)
                    for toks, _, _, _ in stats.values()
                )
                if not dfb:
                    continue
                idf = bm25.idf(n_blend, dfb)
                per_doc: dict[int, list[float]] = {}
                for f, (toks, dls, _, avgdl) in stats.items():
                    for d, tk in toks.items():
                        tf = tk.count(term)
                        if not tf:
                            continue
                        w = (
                            boosts[f] * idf * tf * (bm25.K1 + 1)
                            / (tf + bm25.K1
                               * (1 - bm25.B + bm25.B * dls[d] / avgdl))
                        )
                        per_doc.setdefault(d, []).append(w)
                for d, ws in per_doc.items():
                    v = max(ws) + tie * (sum(ws) - max(ws))
                    want_tot[d] = want_tot.get(d, 0.0) + v
            got = rows(
                mf.search_cross_fields(q, k=10, boosts=boosts,
                                       tie_breaker=tie)
            )
            assert got == _rank(want_tot, 10), (q, tie)


def test_cross_fields_duplicate_field_degenerates(spark, index_dir):
    """Two copies of the SAME index: per-(term, doc) dismax over two
    equal weights is one of them and the blended df is the field df,
    so cross_fields ≡ plain single-field search; best_fields(tie=0)
    likewise."""
    from tlhop_library_spark.index import (
        IndexReader,
        MultiFieldIndexReader,
    )

    single = IndexReader(spark, index_dir)
    mf2 = MultiFieldIndexReader(
        spark, {"a": index_dir, "b": index_dir}
    )
    for q in ["bace cada", "informação", "zzznope"]:
        want = rows(single.search(q, k=10))
        assert rows(mf2.search_cross_fields(q, k=10)) == want, q
        assert rows(
            mf2.search_best_fields(q, k=10, tie_breaker=0.0)
        ) == want, q


@pytest.fixture(scope="module")
def mf_sharded(spark, corpus_df, tmp_path_factory):
    """Two shards (doc_id parity split) × two fields each."""
    from tlhop_library_spark.index import (
        ShardedMultiFieldIndexReader,
        build_index,
    )

    base = tmp_path_factory.mktemp("mfshards")
    shard_dirs = []
    for i in range(2):
        part = corpus_df.where(F.col("doc_id") % 2 == i)
        dirs = {}
        for field, col in [
            ("title", title_expr()), ("body", F.col("text")),
        ]:
            d = str(base / f"s{i}" / field)
            build_index(
                spark, part.select("doc_id", col.alias("text")),
                d, n_buckets=4, n_ranges=4,
            )
            dirs[field] = d
        shard_dirs.append(dirs)
    return ShardedMultiFieldIndexReader(spark, shard_dirs)


def test_sharded_multifield_identical_to_union(spark, mf, mf_sharded):
    """Every multi-field mode federates rank- AND score-identically
    to the single reader over union-built field indexes."""
    boosts = {"title": 2.0, "body": 1.0}
    for q in ["bace cada", "informação", "zzznope"]:
        assert rows(mf_sharded.search(q, k=10, boosts=boosts)) == rows(
            mf.search(q, k=10, boosts=boosts)
        ), ("most", q)
        for tie in (0.0, 0.3):
            assert rows(
                mf_sharded.search_best_fields(
                    q, k=10, boosts=boosts, tie_breaker=tie
                )
            ) == rows(
                mf.search_best_fields(
                    q, k=10, boosts=boosts, tie_breaker=tie
                )
            ), ("best", q, tie)
            assert rows(
                mf_sharded.search_cross_fields(
                    q, k=10, boosts=boosts, tie_breaker=tie
                )
            ) == rows(
                mf.search_cross_fields(
                    q, k=10, boosts=boosts, tie_breaker=tie
                )
            ), ("cross", q, tie)


def test_sharded_multifield_field_set_guard(spark, mf_sharded,
                                            tmp_path_factory):
    from tlhop_library_spark.index import ShardedMultiFieldIndexReader

    s0 = {
        f: r.index_dir for f, r in mf_sharded.shards[0].readers.items()
    }
    s1_missing = {
        "body": mf_sharded.shards[1].readers["body"].index_dir
    }
    with pytest.raises(ValueError, match="field set"):
        ShardedMultiFieldIndexReader(spark, [s0, s1_missing])
    with pytest.raises(ValueError):
        ShardedMultiFieldIndexReader(spark, [])


# ---------------------------------------------------------------------
# CombinedFieldQuery (simplified BM25F) — round 3
# ---------------------------------------------------------------------
def _py_combined_topk(texts, terms, weights, k):
    """Pure-python reference of the combined-fields spec."""
    fields = {
        "title": {d: py_title(t) for d, t in texts.items()},
        "body": dict(texts),
    }
    toks = {
        f: {d: py_tokens(t) for d, t in ft.items()}
        for f, ft in fields.items()
    }
    dlc = {
        d: sum(weights[f] * len(toks[f][d]) for f in fields)
        for d in texts
    }
    n = len(texts)
    avgdl = sum(dlc.values()) / n
    totals: dict[int, float] = {}
    for term in terms:
        dfb = max(
            sum(1 for tk in ft.values() if term in tk)
            for ft in toks.values()
        )
        if not dfb:
            continue
        idf = bm25.idf(n, dfb)
        for d in texts:
            tfc = sum(
                weights[f] * toks[f][d].count(term) for f in fields
            )
            if not tfc:
                continue
            w = idf * tfc * (bm25.K1 + 1) / (
                tfc + bm25.K1
                * (1 - bm25.B + bm25.B * dlc[d] / avgdl)
            )
            totals[d] = totals.get(d, 0.0) + w
    return _rank(totals, k)


def test_combined_fields_matches_reference_spec(spark, corpus_df, mf):
    texts = {
        r["doc_id"]: r["text"]
        for r in corpus_df.where(F.col("text").isNotNull()).collect()
    }
    weights = {"title": 2.0, "body": 1.0}
    for q in ["bace cada", "informação"]:
        terms = sorted(set(py_tokens(q)))
        want = _py_combined_topk(texts, terms, weights, 10)
        got = rows(mf.search_combined_fields(q, k=10, weights=weights))
        assert got == want, q


def test_combined_fields_duckdb_oracle(spark, corpus_path, mf):
    import duckdb

    from tlhop_library_spark.index.multifield import (
        oracle_sql_bm25_combined_fields,
    )

    field_exprs = {
        "title": (
            f"array_to_string(list_slice(string_split(text, ' '), "
            f"1, {TITLE_TOKENS}), ' ')"
        ),
        "body": "text",
    }
    weights = {"title": 2.0, "body": 1.0}
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{corpus_path}'"
    )
    for q in ["bace cada", "informação"]:
        got = rows(mf.search_combined_fields(q, k=10, weights=weights))
        want = con.execute(
            oracle_sql_bm25_combined_fields(
                q, field_exprs, weights, k=10
            )
        ).fetchall()
        assert got == [tuple(w) for w in want], q


def test_combined_fields_single_field_degenerates(spark, index_dir):
    """One field at weight 1: tf~=tf, dl_c=dl, df_c=df — identically
    plain BM25."""
    from tlhop_library_spark.index import (
        IndexReader,
        MultiFieldIndexReader,
    )

    single = IndexReader(spark, index_dir)
    mf1 = MultiFieldIndexReader(spark, {"body": index_dir})
    for q in QUERIES:
        assert rows(
            mf1.search_combined_fields(q, k=10)
        ) == rows(single.search(q, k=10)), q


def test_combined_fields_saturates_once(spark, mf):
    """The defining BM25F property: a term spread across fields
    saturates once, so combined != the per-field-sum (most_fields)
    ranking in general — assert the score VECTORS differ while both
    remain self-consistent."""
    q = "bace cada"
    combined = rows(mf.search_combined_fields(q, k=10,
                                              weights={"title": 2.0}))
    most = rows(mf.search(q, k=10, boosts={"title": 2.0}))
    assert combined and most
    assert [s for _, _, s in combined] != [s for _, _, s in most]
