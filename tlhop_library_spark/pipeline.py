"""Training-data preparation pipeline — the end-to-end composition a
100 TB pretraining corpus actually runs, as one declarative operator:

    quality filter → exact dedup → LSH-verified near-dup drop → stats

Every stage is one of the library's gated operators, so the composed
plan inherits their scale properties: quality scoring is pure JVM
expressions; exact dedup is a hash groupBy; near-dup candidates come
from MinHash banding (never an all-pairs join) with exact jaccard
verification on candidates only; nothing collects to the driver.

Drop rule for near-dup pairs is the deterministic greedy one: for every
verified pair (a < b), doc b is dropped. Not a transitive closure — a
chain a-b-c drops b and c and keeps a — which is the standard
keep-first policy and is exactly reproducible in SQL (the oracle
mirrors it).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tlhop_library_spark.analyzer import tokens_col
from tlhop_library_spark.operators import dedup, text


def prepare_training_data(
    docs: DataFrame,
    min_quality: float = 0.55,
    jaccard_threshold: float = 0.5,
    max_shingle_df: int | str | None = "auto",
    near_dup_policy: str = "greedy",
    cc_max_iter: int = 25,
    max_perplexity: float | None = None,
) -> DataFrame:
    """(doc_id, n_tokens, quality) for the surviving documents.

    ``max_shingle_df`` defaults to ``"auto"`` — at real scale the
    boilerplate-shingle cap must be ON (an uncapped hot shingle with
    df=D contributes D² candidate rows); the auto rule drops shingles
    with df > max(dedup.SHINGLE_DF_AUTO_FLOOR,
    ceil(dedup.SHINGLE_DF_AUTO_FRAC · n_docs)). Recall cost: only
    pairs similar EXCLUSIVELY through boilerplate shingles are missed
    (see COVERAGE.md for the measured delta). Pass ``None`` for the
    uncapped semantics pin.

    Stages:
      1. quality ≥ min_quality (text.quality_score features);
      1b. (when ``max_perplexity`` is set) CCNet-style LM filter:
          bigram perplexity under a model self-trained on the
          post-quality corpus must be ≤ the cap (unscorable short
          docs are kept);
      2. exact dedup — keep the min doc_id per md5(text);
      3. near-dup drop over MinHash-banded candidates with exact
         jaccard ≥ jaccard_threshold verification, under one of two
         policies:
         - ``'greedy'`` (default): doc_b of each (a < b) pair dropped
           — the standard keep-first rule; a chain a-b-c keeps only a.
         - ``'cluster'``: connected components over the verified pair
           graph (``dedup.connected_components``), keep the minimum
           doc_id of each CLUSTER — the transitive semantics (a chain
           a-b-c still keeps only a, but a doc near-dup to two
           different kept docs can't survive by pair-order luck).
    """
    q = text.quality_score(docs).select("doc_id", "n_tokens", "quality")
    keep_q = q.where(F.col("quality") >= min_quality).select("doc_id")
    d1 = docs.join(keep_q, "doc_id", "left_semi")

    if max_perplexity is not None:
        # CCNet-style LM stage: bigram model self-trained on the
        # post-quality corpus; drop docs whose (rounded) perplexity
        # exceeds the cap. Docs too short to score (<2 tokens) are
        # KEPT — no perplexity evidence is not evidence of noise.
        from tlhop_library_spark.operators import corpus_stats

        noisy = (
            corpus_stats.lm_perplexity(d1)
            .where(F.col("perplexity") > max_perplexity)
            .select("doc_id")
        )
        d1 = d1.join(noisy, "doc_id", "left_anti")

    reps = dedup.dedup_exact(d1).select("doc_id")
    d2 = d1.join(reps, "doc_id", "left_semi")

    pairs = dedup.minhash_near_dup_pairs(
        d2, threshold=jaccard_threshold, max_shingle_df=max_shingle_df
    )
    if near_dup_policy == "cluster":
        # cc_max_iter bounds label-propagation rounds = cluster graph
        # diameter; connected_components raises (never silently
        # under-merges) if it is exhausted before the fixpoint
        comp = dedup.connected_components(pairs, max_iter=cc_max_iter)
        drop = comp.where(
            F.col("doc_id") != F.col("component")
        ).select("doc_id")
    elif near_dup_policy == "greedy":
        drop = pairs.select(F.col("doc_b").alias("doc_id")).distinct()
    else:
        raise ValueError(f"unknown near_dup_policy: {near_dup_policy!r}")
    d3 = d2.join(drop, "doc_id", "left_anti")

    return d3.select("doc_id").join(q, "doc_id").select(
        "doc_id", "n_tokens", "quality"
    )


def training_data_summary(docs: DataFrame, **kw) -> DataFrame:
    """One-row funnel summary: docs in, docs out, tokens out, mean
    quality of survivors."""
    out = prepare_training_data(docs, **kw)
    n_in = docs.where(F.col("text").isNotNull()).select(
        F.count("*").alias("docs_in")
    )
    agg = out.agg(
        F.count("*").alias("docs_out"),
        F.sum("n_tokens").alias("tokens_out"),
        F.round(F.avg("quality"), 4).alias("avg_quality"),
    )
    return n_in.crossJoin(agg)
