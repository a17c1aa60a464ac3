"""Web-corpus cleaning operators: Gopher repetition stats, Gopher
quality flags, boilerplate line dedup (operators/cleaning.py)."""

import pytest
from pyspark.sql import functions as F

from tlhop_library_spark.operators import cleaning


def rows(df):
    return {r["doc_id"]: r.asDict() for r in df.collect()}


def test_ngram_repetition_hand_computed(spark):
    # toks (len>=3 analyzer): aaa bbb aaa bbb ccc -> bigrams:
    # "aaa bbb" x2 (6 ch), "bbb aaa" x1, "bbb ccc" x1; total 15 ch
    docs = spark.createDataFrame(
        [(1, "aaa bbb aaa bbb ccc")], "doc_id long, text string"
    )
    r = rows(cleaning.ngram_repetition_stats(docs, n_top=2, n_dup=2))
    assert r[1]["top_ngram_char_frac"] == pytest.approx(12 / 15, abs=1e-4)
    # dup bigram "aaa bbb" covers positions {0,1,2,3} -> 12 ch of 15
    assert r[1]["dup_ngram_char_frac"] == pytest.approx(12 / 15, abs=1e-4)


def test_ngram_dup_positions_union_not_double_counted(spark):
    # "aaa aaa aaa aaa": bigram "aaa aaa" x3 -> every position covered
    # exactly once despite overlapping occurrences -> frac 1.0
    docs = spark.createDataFrame(
        [(1, "aaa aaa aaa aaa"), (2, "one two three four")],
        "doc_id long, text string",
    )
    r = rows(cleaning.ngram_repetition_stats(docs, n_top=2, n_dup=2))
    assert r[1]["dup_ngram_char_frac"] == 1.0
    assert r[2]["dup_ngram_char_frac"] == 0.0  # all bigrams unique


def test_ngram_short_doc_yields_zero_not_missing(spark):
    docs = spark.createDataFrame(
        [(1, "solo"), (2, None)], "doc_id long, text string"
    )
    r = rows(cleaning.ngram_repetition_stats(docs, n_top=2, n_dup=5))
    assert r[1] == {
        "doc_id": 1,
        "top_ngram_char_frac": 0.0,
        "dup_ngram_char_frac": 0.0,
    }
    assert 2 not in r  # null text excluded, like every text operator


def test_quality_flags_rule_boundaries(spark):
    # 50 words, mean len 3.6, alpha 1.0, stopword "the" x10
    long_ok = " ".join(["the cats sat upon mats"] * 10)
    docs = spark.createDataFrame(
        [
            (1, long_ok),
            (2, "the cat"),  # too few words
            (3, " ".join(["a"] * 60)),  # mean word len 1 < 3
            (4, " ".join(["12345"] * 60)),  # no alpha words
        ],
        "doc_id long, text string",
    )
    r = rows(cleaning.gopher_quality_flags(docs))
    assert r[1]["keep"] is True and r[1]["n_words"] == 50
    assert r[2]["ok_n_words"] is False and r[2]["keep"] is False
    assert r[3]["ok_word_len"] is False
    assert r[4]["ok_alpha"] is False and r[4]["alpha_word_frac"] == 0.0


def test_line_dedup_counts_distinct_docs_not_occurrences(spark):
    # "dup line" twice inside ONE doc -> df=1 -> NOT boilerplate
    docs = spark.createDataFrame(
        [(1, "dup line\nmiddle\ndup line"), (2, "other\ntext")],
        "doc_id long, text string",
    )
    r = rows(cleaning.line_dedup(docs, min_df=2))
    assert r[1]["text"] == "dup line\nmiddle\ndup line"
    assert r[1]["n_lines_dropped"] == 0


def test_line_dedup_blank_lines_structural(spark):
    # blank lines are kept and never counted as boilerplate
    docs = spark.createDataFrame(
        [(1, "nav\n\nbody A"), (2, "nav\n\nbody B"), (3, "\n\n")],
        "doc_id long, text string",
    )
    r = rows(cleaning.line_dedup(docs, min_df=2))
    assert r[1]["text"] == "\nbody A" and r[1]["n_lines_dropped"] == 1
    assert r[3]["text"] == "\n\n" and r[3]["n_lines_kept"] == 3


def test_line_dedup_all_dropped_survives_empty(spark):
    docs = spark.createDataFrame(
        [(1, "nav"), (2, "nav"), (3, "nav\nkeep me")],
        "doc_id long, text string",
    )
    r = rows(cleaning.line_dedup(docs, min_df=2))
    assert r[1]["text"] == "" and r[1]["n_lines_kept"] == 0
    assert r[3]["text"] == "keep me"


def test_line_dedup_per_source_scopes_df(spark):
    docs = spark.createDataFrame(
        [
            (1, "nav\nA", "x.com"),
            (2, "nav\nB", "x.com"),
            (3, "nav\nC", "y.com"),
        ],
        "doc_id long, text string, source string",
    )
    g = rows(cleaning.line_dedup(docs, min_df=2))
    s = rows(cleaning.line_dedup(docs, min_df=2, per_source=True))
    assert g[3]["text"] == "C"  # global df=3 drops nav everywhere
    assert s[3]["text"] == "nav\nC"  # y.com alone: df=1 keeps nav
    assert s[1]["text"] == "A" and s[2]["text"] == "B"


def test_line_dedup_plan_has_no_global_exchange(spark):
    """Reassembly must aggregate per doc_id, never through a single
    partition; the boilerplate side joins broadcast-or-hash, both fine
    — we assert no SinglePartition exchange anywhere in the plan."""
    docs = spark.createDataFrame(
        [(1, "a\nb"), (2, "a\nc")], "doc_id long, text string"
    )
    plan = cleaning.line_dedup(docs, min_df=2)._jdf.queryExecution(
    ).executedPlan().toString()
    assert "SinglePartition" not in plan


def test_ngram_stats_plan_windows_are_doc_partitioned(spark):
    docs = spark.createDataFrame(
        [(1, "aaa bbb ccc ddd eee fff")], "doc_id long, text string"
    )
    plan = cleaning.ngram_repetition_stats(docs)._jdf.queryExecution(
    ).executedPlan().toString()
    assert "SinglePartition" not in plan


def test_c4_clean_line_and_doc_rules(spark):
    docs = spark.createDataFrame(
        [
            # survives: 3 lines ending in punctuation, >=5 words each
            (1, 'One two three four five.\nSix seven eight nine ten!\n'
                'Is this a real question? yes "quoted line it ends."'),
            # line rules: short line + no-punct line + javascript line
            (2, "Too short.\nno terminal punctuation here at all\n"
                "enable JavaScript to view this page.\n"
                "One two three four five.\nSix seven eight nine ten.\n"
                "Ok fine this one stays too."),
            # doc rules: lorem ipsum anywhere kills the whole doc
            (3, "Lorem Ipsum dolor sit amet consectetur.\n"
                "One two three four five.\nSix seven eight nine ten.\n"
                "Another good line right here."),
            # doc rules: too few surviving lines (min_lines=3)
            (4, "One two three four five.\nSix seven eight nine ten."),
        ],
        "doc_id long, text string",
    )
    r = rows(cleaning.c4_clean(docs))
    assert set(r) == {1, 2}
    assert r[1]["n_lines_kept"] == 3 and r[1]["n_lines_dropped"] == 0
    assert r[2]["n_lines_kept"] == 3 and r[2]["n_lines_dropped"] == 3
    assert r[2]["text"] == ("One two three four five.\n"
                            "Six seven eight nine ten.\n"
                            "Ok fine this one stays too.")


def test_c4_clean_plan_is_shuffle_free(spark):
    docs = spark.createDataFrame(
        [(1, "a line here.")], "doc_id long, text string"
    )
    plan = cleaning.c4_clean(docs)._jdf.queryExecution(
    ).executedPlan().toString()
    assert "Exchange" not in plan


# ---- duplicated_span_stats (cross-doc dup w-gram coverage) ----

def test_dup_span_hand_computed(spark):
    # docs 1+2 share the 3-gram "aaa bbb ccc" once each; doc 3 repeats
    # a 3-gram only WITHIN itself (min_df counts distinct docs -> not
    # duplicated)
    docs = spark.createDataFrame(
        [
            (1, "aaa bbb ccc ddd eee"),
            (2, "xxx aaa bbb ccc yyy zzz"),
            (3, "ppp qqq rrr sss ppp qqq rrr"),
        ],
        "doc_id long, text string",
    )
    r = rows(cleaning.duplicated_span_stats(docs, w=3, min_df=2))
    assert r[1] == {
        "doc_id": 1, "n_tokens": 5, "n_dup_windows": 1,
        "n_covered": 3, "dup_frac": 0.6,
    }
    assert r[2]["n_covered"] == 3 and r[2]["dup_frac"] == 0.5
    assert r[3]["n_dup_windows"] == 0 and r[3]["dup_frac"] == 0.0


def test_dup_span_overlapping_windows_union(spark):
    # 4 shared consecutive tokens -> two overlapping dup 3-windows,
    # coverage is the UNION (4 positions, not 6)
    docs = spark.createDataFrame(
        [
            (1, "kkk lll mmm nnn tail one"),
            (2, "head kkk lll mmm nnn other"),
        ],
        "doc_id long, text string",
    )
    r = rows(cleaning.duplicated_span_stats(docs, w=3, min_df=2))
    assert r[1]["n_dup_windows"] == 2 and r[1]["n_covered"] == 4
    assert r[2]["n_dup_windows"] == 2 and r[2]["n_covered"] == 4


def test_dup_span_short_and_null_docs(spark):
    docs = spark.createDataFrame(
        [(1, "one two"), (2, None), (3, "aaa bbb ccc"), (4, "aaa bbb ccc")],
        "doc_id long, text string",
    )
    r = rows(cleaning.duplicated_span_stats(docs, w=3, min_df=2))
    # doc 1: only 2 tokens >= len 3? "one","two" -> 2 tokens < w
    assert r[1]["n_dup_windows"] == 0 and r[1]["dup_frac"] == 0.0
    assert 2 not in r
    assert r[3]["dup_frac"] == 1.0 and r[4]["dup_frac"] == 1.0


def test_dup_span_hashed_grams_identity(spark):
    docs = spark.createDataFrame(
        [(i, f"tok{i % 3} aaa bbb ccc ddd tok{i}") for i in range(12)],
        "doc_id long, text string",
    )
    a = sorted(
        cleaning.duplicated_span_stats(docs, w=3, min_df=2).collect()
    )
    b = sorted(
        cleaning.duplicated_span_stats(
            docs, w=3, min_df=2, hashed_grams=True
        ).collect()
    )
    assert a == b
