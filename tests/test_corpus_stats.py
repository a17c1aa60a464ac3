"""Corpus-statistics operators: invariants independent of the DuckDB
oracles (which already pin exact values at the gate)."""

import hashlib

from pyspark.sql import functions as F

from tlhop_library_spark.operators import corpus_stats


def test_tfidf_keywords_per_doc_topm(spark, corpus_df):
    got = corpus_stats.tfidf_keywords(corpus_df, m=2)
    rows = got.collect()
    assert rows
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append((r["pos"], r["score"]))
    for doc, entries in by_doc.items():
        entries.sort()
        assert len(entries) <= 2
        assert [p for p, _ in entries] == list(range(1, len(entries) + 1))
        scores = [s for _, s in entries]
        assert scores == sorted(scores, reverse=True)


def test_pmi_favors_exclusive_bigram(spark):
    """A bigram whose parts only ever co-occur outranks one whose
    parts are everywhere."""
    rows = []
    for i in range(30):
        rows.append((i, "zephyr quartz common common"))
    for i in range(30, 60):
        rows.append((i, "common filler common words common stuff"))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = corpus_stats.pmi_collocations(docs, min_count=5, top=5).collect()
    assert got[0]["w1"] == "zephyr" and got[0]["w2"] == "quartz"
    pmis = [r["pmi"] for r in got]
    assert pmis == sorted(pmis, reverse=True)


def test_contamination_bounds_and_self(spark, corpus_df):
    docs = corpus_df.limit(50)
    # benchmark == train → every shingle contaminated
    full = corpus_stats.contamination_score(docs, docs, n=5).collect()
    assert full and all(r["contamination"] == 1.0 for r in full)
    # disjoint benchmark built from synthetic text → zero overlap
    bench = spark.createDataFrame(
        [(999999, " ".join(f"uniquetok{i}" for i in range(40)))],
        "doc_id long, text string",
    )
    zero = corpus_stats.contamination_score(docs, bench, n=5).collect()
    assert zero and all(r["contamination"] == 0.0 for r in zero)
    for r in zero:
        assert 0 < r["n_shingles"] and r["n_contaminated"] == 0


def test_stratified_sample_deterministic_and_consistent(spark, corpus_df):
    docs = corpus_df.select("doc_id", "lang")
    frac = {"en": 0.5, "de": 0.2}
    a = sorted(
        r["doc_id"]
        for r in corpus_stats.stratified_sample(docs, "lang", frac).collect()
    )
    b = sorted(
        r["doc_id"]
        for r in corpus_stats.stratified_sample(
            docs.repartition(7), "lang", frac
        ).collect()
    )
    assert a == b and a  # layout-independent
    # matches the frozen md5 formula row-for-row
    rows = docs.collect()
    expect = sorted(
        r["doc_id"]
        for r in rows
        if r["lang"] in frac
        and int(
            hashlib.md5(
                f"v1|{r['lang']}|{r['doc_id']}".encode()
            ).hexdigest()[:8],
            16,
        )
        % 10000
        < frac[r["lang"]] * 10000
    )
    assert a == expect
    # excluded strata are dropped entirely
    kept_langs = {
        r["lang"]
        for r in corpus_stats.stratified_sample(docs, "lang", frac)
        .select("lang")
        .distinct()
        .collect()
    }
    assert kept_langs <= set(frac)


def test_stratified_sample_no_shuffle(spark, corpus_df):
    plan = (
        corpus_stats.stratified_sample(
            corpus_df, "lang", {"en": 0.5}
        )
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan


def test_connected_components_chain_and_clusters(spark):
    """Chain a-b-c-d collapses to one component (min id); disjoint
    clusters keep distinct labels; isolated pair stays its own."""
    from tlhop_library_spark.operators.dedup import connected_components

    pairs = spark.createDataFrame(
        [
            (2, 3), (3, 4), (4, 5),        # chain -> component 2
            (10, 11),                      # pair  -> component 10
            (20, 22), (21, 22),            # star  -> component 20
        ],
        "doc_a long, doc_b long",
    )
    got = {
        r["doc_id"]: r["component"]
        for r in connected_components(pairs).collect()
    }
    assert got == {
        2: 2, 3: 2, 4: 2, 5: 2,
        10: 10, 11: 10,
        20: 20, 21: 20, 22: 20,
    }


def test_connected_components_long_chain_converges(spark):
    """A 30-hop chain needs ~diameter rounds — the fixpoint loop must
    keep going until sum(labels) stabilizes, not stop early."""
    from tlhop_library_spark.operators.dedup import connected_components

    n = 30
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(n)], "doc_a long, doc_b long"
    )
    got = {
        r["doc_id"]: r["component"]
        for r in connected_components(pairs, max_iter=64).collect()
    }
    assert got == {i: 0 for i in range(n + 1)}


def test_connected_components_raises_on_max_iter_exhausted(spark):
    """When the graph diameter exceeds max_iter the labels are only
    PARTIALLY propagated — returning them silently would make cluster
    dedup keep two representatives of one cluster (round-2 ADVICE).
    Must raise, never under-merge quietly."""
    import pytest as _pytest

    from tlhop_library_spark.operators.dedup import connected_components

    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(12)], "doc_a long, doc_b long"
    )
    with _pytest.raises(RuntimeError, match="did not converge"):
        connected_components(pairs, max_iter=3).collect()


def test_lm_perplexity_matches_hand_computation(spark):
    """Frozen-spec check on a corpus small enough to do by hand:
    docs {0: 'aaa bbb aaa bbb', 1: 'aaa bbb'} give bigram counts
    c12(aaa,bbb)=3, c12(bbb,aaa)=1; contexts c1(aaa)=3, c1(bbb)=1;
    V=2, k=0.5."""
    import math

    docs = spark.createDataFrame(
        [(0, "aaa bbb aaa bbb"), (1, "aaa bbb")],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: r
        for r in corpus_stats.lm_perplexity(docs).collect()
    }
    lp_ab = math.log2((3 + 0.5) / (3 + 0.5 * 2))   # P(bbb|aaa)=0.875
    lp_ba = math.log2((1 + 0.5) / (1 + 0.5 * 2))   # P(aaa|bbb)=0.75
    avg0 = (2 * lp_ab + lp_ba) / 3
    assert got[0]["n_bigrams"] == 3
    assert got[0]["avg_logp"] == round(avg0, 4)
    assert got[0]["perplexity"] == round(2 ** (-avg0), 4)
    assert got[1]["n_bigrams"] == 1
    assert got[1]["perplexity"] == round(1 / 0.875, 4)


def test_lm_perplexity_unseen_scores_one_over_v(spark):
    """Held-out doc whose tokens never occur in training: every
    bigram backs off to P = k / (k·V) = 1/V, so perplexity = V
    exactly — the add-k floor, not a crash or a null."""
    train = spark.createDataFrame(
        [(0, "aaa bbb aaa")], "doc_id long, text string"
    )  # V = 2
    held = spark.createDataFrame(
        [(9, "xxx yyy xxx")], "doc_id long, text string"
    )
    model = corpus_stats.train_bigram_lm(train)
    got = corpus_stats.lm_perplexity(held, model=model).collect()
    assert len(got) == 1
    assert got[0]["avg_logp"] == -1.0
    assert got[0]["perplexity"] == 2.0


def test_lm_perplexity_short_docs_absent_and_noise_ranks_higher(spark):
    """Docs with <2 tokens have no bigrams and are absent; under a
    model trained on repetitive text, a noise doc scores strictly
    higher perplexity than an in-distribution doc."""
    rows = [(i, "the cat sat on the mat") for i in range(20)]
    rows += [(100, "zzz qqq vvv kkk www"), (101, "one"), (102, None)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: r["perplexity"]
        for r in corpus_stats.lm_perplexity(docs).collect()
    }
    assert 101 not in got and 102 not in got
    assert got[100] > got[0]
