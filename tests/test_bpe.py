"""BPE tokenizer training/application — Sennrich merge semantics."""

from __future__ import annotations

from pyspark.sql import functions as F

from tlhop_library_spark.analyzer import py_tokens
from tlhop_library_spark.operators.bpe import (
    END,
    apply_bpe_word,
    bpe_token_count,
    learn_bpe,
    learn_bpe_from_counts,
    word_counts,
)


def test_learn_bpe_hand_computed_merges():
    merges = learn_bpe_from_counts([("abab", 3)], n_merges=10)
    assert merges == [
        ("a", "b"),
        ("ab", END),
        ("ab", "ab" + END),
    ]


def test_learn_bpe_tie_break_is_lexicographic():
    # "ab" x2 and "cd" x2: pairs (a,b), (c,d), (b,</w>), (d,</w>) all
    # count 2 -> lexicographically smallest pair first
    merges = learn_bpe_from_counts([("ab", 2), ("cd", 2)], n_merges=1)
    assert merges == [("a", "b")]


def test_learn_bpe_stops_below_count_two():
    merges = learn_bpe_from_counts([("xy", 1)], n_merges=10)
    assert merges == []


def test_apply_bpe_word_roundtrip_and_partial():
    merges = [("a", "b"), ("ab", END), ("ab", "ab" + END)]
    ranks = {p: i for i, p in enumerate(merges)}
    assert apply_bpe_word("abab", ranks) == ["abab" + END]
    assert apply_bpe_word("aba", ranks) == ["ab", "a", END]
    assert "".join(apply_bpe_word("abxab", ranks)) == "abxab" + END


def test_distributed_learn_matches_counts_path(spark, corpus_df):
    m_dist = learn_bpe(corpus_df, n_merges=30, max_words=2000)
    wc = [
        (r["word"], r["n"])
        for r in word_counts(corpus_df, max_words=2000).collect()
    ]
    wc.sort(key=lambda x: (-x[1], x[0]))
    assert m_dist == learn_bpe_from_counts(wc, 30)
    assert len(m_dist) == 30


def test_word_counts_cap_keeps_most_frequent(spark, corpus_df):
    full = {
        r["word"]: r["n"] for r in word_counts(corpus_df).collect()
    }
    capped = {
        r["word"]: r["n"]
        for r in word_counts(corpus_df, max_words=50).collect()
    }
    assert len(capped) == 50
    floor = min(capped.values())
    dropped = [n for w, n in full.items() if w not in capped]
    assert all(n <= floor for n in dropped)


def test_bpe_token_count_matches_driver_recount(spark, corpus_df):
    merges = learn_bpe(corpus_df, n_merges=40, max_words=2000)
    ranks = {p: i for i, p in enumerate(merges)}
    sample = corpus_df.orderBy("doc_id").limit(25)
    got = {
        r["doc_id"]: (r["n_words"], r["n_bpe_tokens"])
        for r in bpe_token_count(sample, merges).collect()
    }
    checked = 0
    for r in sample.collect():
        if r["text"] is None:
            assert r["doc_id"] not in got  # null text rows excluded
            continue
        toks = py_tokens(r["text"])
        want = sum(len(apply_bpe_word(w, ranks)) for w in toks)
        assert got[r["doc_id"]] == (len(toks), want)
        checked += 1
    assert checked > 10


def test_more_merges_never_increase_token_count(spark, corpus_df):
    sample = corpus_df.orderBy("doc_id").limit(40)
    m80 = learn_bpe(corpus_df, n_merges=80, max_words=2000)
    t20 = bpe_token_count(sample, m80[:20]).agg(
        F.sum("n_bpe_tokens")
    ).collect()[0][0]
    t80 = bpe_token_count(sample, m80).agg(
        F.sum("n_bpe_tokens")
    ).collect()[0][0]
    assert t80 <= t20
