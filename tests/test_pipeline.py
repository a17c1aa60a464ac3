"""Training-data preparation funnel (pipeline.py)."""

from pyspark.sql import functions as F

from tlhop_library_spark.pipeline import (
    prepare_training_data,
    training_data_summary,
)


def test_funnel_monotone_and_deterministic(spark, corpus_df):
    out1 = prepare_training_data(corpus_df).collect()
    out2 = prepare_training_data(corpus_df).collect()
    key = lambda rows: sorted((r["doc_id"], r["n_tokens"], r["quality"]) for r in rows)
    assert key(out1) == key(out2)
    n_in = corpus_df.where(F.col("text").isNotNull()).count()
    assert 0 < len(out1) <= n_in


def test_funnel_stages_actually_drop(spark, corpus_df):
    """Each stage must bite on the synthetic corpus (it plants exact
    dups and near-dups): quality-only > +exact-dedup > +near-dup."""
    loose = prepare_training_data(
        corpus_df, min_quality=0.0, jaccard_threshold=1.1
    ).count()  # only exact dedup active (jaccard 1.1 unreachable)
    full = prepare_training_data(
        corpus_df, min_quality=0.55, jaccard_threshold=0.5
    ).count()
    n_in = corpus_df.where(F.col("text").isNotNull()).count()
    assert loose < n_in  # exact dups removed
    assert full < loose  # quality + near-dup stages removed more


def test_survivors_have_min_quality(spark, corpus_df):
    out = prepare_training_data(corpus_df, min_quality=0.58)
    assert out.where(F.col("quality") < 0.58).count() == 0


def test_summary_row(spark, corpus_df):
    row = training_data_summary(corpus_df).collect()[0]
    assert row["docs_out"] <= row["docs_in"]
    assert row["tokens_out"] > 0 and 0.0 < row["avg_quality"] <= 1.0


def test_cluster_policy_is_subset_and_transitive(spark):
    """Cluster policy keeps exactly one representative per near-dup
    component: planted triangle a~b~c (pairwise near-dups) keeps only
    the min id under BOTH policies; a chain where only (a,b) and (b,c)
    are pairs keeps {a} under cluster but {a, c} could never differ
    here — so also plant a case where greedy and cluster diverge:
    pairs (1,2) and (3,2)... with a<b ordering both drop 2 — instead
    the divergence case is a chain 1-2, 2-3: greedy drops {2, 3}
    (both appear as doc_b), cluster drops {2, 3} too (component 1).
    True divergence needs a doc_b that links two components: pairs
    (10,30), (20,30): greedy drops {30} keeping {10, 20}; cluster
    merges all three into one component keeping only {10}."""
    from tlhop_library_spark.pipeline import prepare_training_data

    base = "palavra" + " comum segura dados rede capital" * 30
    rows = [
        (10, base + " azul"),
        (20, base + " verde"),
        (30, base + " rosa"),
        (99, " ".join(f"unico{i}" for i in range(120))),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    greedy = {
        r["doc_id"]
        for r in prepare_training_data(
            docs, min_quality=0.0, jaccard_threshold=0.5
        ).collect()
    }
    cluster = {
        r["doc_id"]
        for r in prepare_training_data(
            docs, min_quality=0.0, jaccard_threshold=0.5,
            near_dup_policy="cluster",
        ).collect()
    }
    assert cluster <= greedy
    assert 10 in cluster and 99 in cluster
    assert 20 not in cluster and 30 not in cluster


def test_lm_stage_drops_only_high_perplexity_and_keeps_short(spark):
    """max_perplexity drops exactly the docs whose self-trained bigram
    perplexity exceeds the cap; docs too short to score (<2 tokens)
    pass through; a huge cap is the identity funnel."""
    from tlhop_library_spark.operators import corpus_stats

    rows = [(i, "the cat sat on the mat and the cat sat again")
            for i in range(30)]
    rows += [(200, "zzz qqq vvv kkk www yyy xxx"), (201, "solo")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    base = {r["doc_id"] for r in prepare_training_data(
        docs, min_quality=0.0, max_perplexity=None).collect()}
    capped_ids = {r["doc_id"] for r in prepare_training_data(
        docs, min_quality=0.0, max_perplexity=1e9).collect()}
    assert capped_ids == base  # huge cap ≡ no LM stage

    # compute the stage's own view of who is noisy, then assert the
    # funnel dropped exactly those (among base survivors)
    ppl = {r["doc_id"]: r["perplexity"]
           for r in corpus_stats.lm_perplexity(docs).collect()}
    cap = sorted(ppl.values())[len(ppl) // 2]  # median as the cap
    expect_noisy = {d for d, p in ppl.items() if p > cap}
    got = {r["doc_id"] for r in prepare_training_data(
        docs, min_quality=0.0, max_perplexity=cap).collect()}
    assert got == base - expect_noisy
    assert 201 in got  # 1-token doc unscorable -> kept
