"""Skew guards in dedup candidate generation.

At 10^12 docs one boilerplate shingle shared by 10^7 docs makes the
shingle self-join quadratic in that bucket; `max_shingle_df` must cap
the per-shingle fan-out BEFORE the join (VERDICT r1 §wrong #2).
"""

import pytest
from pyspark.sql import functions as F

from tlhop_library_spark.operators import dedup


@pytest.fixture(scope="module")
def hot_corpus(spark):
    """60 docs sharing one boilerplate sentence + a unique tail.

    The boilerplate's shingles have df=60; each doc's own shingles have
    df=1. Without the guard the boilerplate contributes 60·59/2 = 1770
    candidate pairs; with max_shingle_df < 60 it contributes none.
    """
    boiler = "all rights reserved terms of service apply here"
    rows = [
        (i, f"{boiler} unique{i}a unique{i}b unique{i}c unique{i}d")
        for i in range(60)
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_max_shingle_df_drops_hot_shingles(spark, hot_corpus):
    sh_all = dedup.shingles(hot_corpus, n=3)
    sh_capped = dedup.shingles(hot_corpus, n=3, max_shingle_df=10)
    hot = (
        sh_all.groupBy("shingle")
        .agg(F.count("*").alias("df"))
        .where(F.col("df") > 10)
        .count()
    )
    assert hot > 0  # the fixture really plants hot shingles
    capped_max = (
        sh_capped.groupBy("shingle")
        .agg(F.count("*").alias("df"))
        .agg(F.max("df"))
        .collect()[0][0]
    )
    assert capped_max <= 10


def test_max_shingle_df_bounds_candidate_pairs(spark, hot_corpus):
    uncapped = dedup.ngram_jaccard_pairs(
        hot_corpus, n=3, threshold=0.0
    ).count()
    capped = dedup.ngram_jaccard_pairs(
        hot_corpus, n=3, threshold=0.0, max_shingle_df=10
    ).count()
    # boilerplate-only pairs vanish: docs share nothing but the hot
    # shingles, so the capped candidate set is empty while the
    # uncapped one is quadratic in the hot-bucket size
    assert uncapped == 60 * 59 / 2
    assert capped == 0


def test_hashed_shingles_match_string_path(spark, hot_corpus):
    """The 128-bit hashed-shingle join (at-scale key) must produce the
    identical pair set + jaccard values as the string join."""
    a = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in dedup.ngram_jaccard_pairs(
            hot_corpus, n=3, threshold=0.3
        ).collect()
    }
    b = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in dedup.ngram_jaccard_pairs(
            hot_corpus, n=3, threshold=0.3, hashed_shingles=True
        ).collect()
    }
    assert a == b and len(a) > 0


def test_auto_cap_engages_relative_to_corpus_size(
    spark, hot_corpus, monkeypatch
):
    """max_shingle_df="auto" derives the cap from corpus size:
    max(FLOOR, ceil(FRAC * n_docs)). With FLOOR=5, FRAC=0.1 on the
    60-doc fixture the cap is ceil(6)=6 < 60, so the df=60 boilerplate
    shingles are dropped exactly like an explicit cap."""
    monkeypatch.setattr(dedup, "SHINGLE_DF_AUTO_FLOOR", 5)
    monkeypatch.setattr(dedup, "SHINGLE_DF_AUTO_FRAC", 0.1)
    sh_auto = dedup.shingles(hot_corpus, n=3, max_shingle_df="auto")
    max_df = (
        sh_auto.groupBy("shingle")
        .agg(F.count("*").alias("df"))
        .agg(F.max("df"))
        .collect()[0][0]
    )
    assert max_df <= 6


def test_auto_cap_floor_keeps_small_corpora_uncapped(spark, hot_corpus):
    """With the production FLOOR (100) the auto cap is inert on a
    60-doc corpus — low-SF gate results are unchanged vs uncapped."""
    a = dedup.shingles(hot_corpus, n=3, max_shingle_df="auto").count()
    b = dedup.shingles(hot_corpus, n=3).count()
    assert a == b


def test_funnel_defaults_cap_on(spark, hot_corpus, monkeypatch):
    """prepare_training_data defaults max_shingle_df='auto'; with a
    tiny monkeypatched floor, boilerplate-only near-dups survive the
    funnel (their only shared shingles are dropped → not near-dups),
    while passing max_shingle_df=None drops them as near-dups."""
    from tlhop_library_spark.pipeline import prepare_training_data

    monkeypatch.setattr(dedup, "SHINGLE_DF_AUTO_FLOOR", 5)
    monkeypatch.setattr(dedup, "SHINGLE_DF_AUTO_FRAC", 0.01)
    survivors_auto = prepare_training_data(
        hot_corpus, min_quality=0.0, jaccard_threshold=0.3
    ).count()
    survivors_uncapped = prepare_training_data(
        hot_corpus, min_quality=0.0, jaccard_threshold=0.3,
        max_shingle_df=None,
    ).count()
    assert survivors_auto > survivors_uncapped


def test_minhash_capped_signatures_ignore_boilerplate(spark, hot_corpus):
    """With the hot shingles dropped, each doc's signature derives only
    from its unique tail → LSH bands disagree → no candidate pairs."""
    pairs = dedup.minhash_lsh_candidates(
        hot_corpus, n=3, max_shingle_df=10
    ).count()
    assert pairs == 0
    # sanity: uncapped, the shared boilerplate dominates the min-hashes
    # and produces candidates
    assert dedup.minhash_lsh_candidates(hot_corpus, n=3).count() > 0
