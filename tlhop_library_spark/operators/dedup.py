"""Deduplication operators over a documents table.

Scale design: every op is a join/groupBy on a derived key (hash,
shingle, band bucket) — never a cross join. At 10^12 docs the
candidate generation is the standard shingle/LSH-band equi-join whose
shuffle key is the shingle/band hash; AQE skew-join splits hot
shingles (stopword-like shingles are pre-dropped by `max_shingle_df`).

All hashes derive from md5 (available identically in Spark and
DuckDB), so every op here is oracle-checkable in SQL.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType

from tlhop_library_spark.analyzer import tokens_col

MINHASH_PERMS = 16
LSH_BANDS = 4  # 4 rows/band × 4 bands = 16 perms


def _tok(docs: DataFrame) -> DataFrame:
    return docs.where(F.col("text").isNotNull()).select(
        "doc_id", tokens_col(F.col("text")).alias("toks")
    )


def exact_dup_groups(docs: DataFrame) -> DataFrame:
    """md5(text) groups with >1 member: (text_hash, n_docs, doc_ids)."""
    return (
        docs.where(F.col("text").isNotNull())
        .select(F.md5("text").alias("text_hash"), "doc_id")
        .groupBy("text_hash")
        .agg(
            F.count("*").alias("n_docs"),
            F.sort_array(F.collect_list("doc_id")).alias("doc_ids"),
        )
        .where(F.col("n_docs") > 1)
    )


def dedup_exact(docs: DataFrame) -> DataFrame:
    """Keep the min-doc_id representative of each exact-text group."""
    return (
        docs.where(F.col("text").isNotNull())
        .groupBy(F.md5("text").alias("text_hash"))
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id", "text_hash")
    )


def shingles(docs: DataFrame, n: int = 3) -> DataFrame:
    """(doc_id, shingle) — distinct n-gram token shingles per doc."""
    t = _tok(docs)
    idx = F.sequence(F.lit(0), F.size("toks") - n)
    sh = F.transform(
        idx, lambda i: F.array_join(F.slice("toks", i + 1, n), " ")
    )
    return (
        t.where(F.size("toks") >= n)
        .select("doc_id", F.explode(F.array_distinct(sh)).alias("shingle"))
    )


def ngram_jaccard_pairs(
    docs: DataFrame, n: int = 3, threshold: float = 0.4
) -> DataFrame:
    """Exact n-gram Jaccard near-dup pairs via shingle equi-join.

    (doc_a, doc_b, jaccard) for doc_a < doc_b with jaccard ≥ threshold.
    Scalable shape: |pairs sharing ≥1 shingle|, not |docs|².
    """
    sh = shingles(docs, n)
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(b, F.col("a.shingle") == F.col("b.shingle"))
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
        )
        .agg(F.count("*").alias("n_inter"))
    )
    sa = sizes.select(
        F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("n_a")
    )
    sb = sizes.select(
        F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("n_b")
    )
    return (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("n_inter")
                / (F.col("n_a") + F.col("n_b") - F.col("n_inter")),
                4,
            ),
        )
        .where(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


def minhash_signatures(docs: DataFrame, n: int = 3) -> DataFrame:
    """(doc_id, sig_i, min_hash) for i in 0..MINHASH_PERMS-1.

    Permutation i's hash of a shingle is md5(i || '|' || shingle) —
    deterministic, engine-portable, uniformly distributed; the min over
    a doc's shingles is the classic MinHash estimator.
    """
    sh = shingles(docs, n)
    per_perm = sh.select(
        "doc_id",
        F.explode(
            F.array(*[F.lit(i) for i in range(MINHASH_PERMS)])
        ).alias("sig_i"),
        "shingle",
    )
    return (
        per_perm.withColumn(
            "h",
            F.md5(
                F.concat(
                    F.col("sig_i").cast("string"), F.lit("|"), F.col("shingle")
                )
            ),
        )
        .groupBy("doc_id", "sig_i")
        .agg(F.min("h").alias("min_hash"))
    )


def minhash_lsh_candidates(docs: DataFrame, n: int = 3) -> DataFrame:
    """LSH banding: pairs sharing ≥1 band bucket (doc_a, doc_b, n_bands).

    Bands of MINHASH_PERMS/LSH_BANDS signature rows each; bucket key =
    md5 of the band's concatenated min-hashes. Candidate generation is
    an equi-join on (band, bucket) — the at-scale path whose output
    feeds exact jaccard verification.
    """
    rows_per_band = MINHASH_PERMS // LSH_BANDS
    sig = minhash_signatures(docs, n).withColumn(
        "band", (F.col("sig_i") / rows_per_band).cast("int")
    )
    buckets = (
        sig.groupBy("doc_id", "band")
        .agg(
            F.md5(
                F.array_join(
                    F.array_sort(
                        F.collect_list(
                            F.concat_ws(":", "sig_i", "min_hash")
                        )
                    ),
                    ",",
                )
            ).alias("bucket")
        )
    )
    a = buckets.alias("a")
    b = buckets.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket")),
        )
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
        )
        .agg(F.count("*").alias("n_bands"))
    )


def simhash64(docs: DataFrame) -> DataFrame:
    """(doc_id, simhash) — 64-bit SimHash over distinct tokens.

    Arrow-batched kernel (pandas_udf): per token a 64-bit hash (md5
    prefix), each bit votes ±1; the sign vector is the fingerprint.
    Near-dups then cluster by Hamming distance on `simhash` (bit-band
    join at scale). Deterministic but not SQL-portable → rows-only
    correctness check (no DuckDB oracle).
    """
    @F.pandas_udf(LongType())
    def _simhash(toks: pd.Series) -> pd.Series:
        out = np.zeros(len(toks), dtype=np.int64)
        for i, arr in enumerate(toks):
            if arr is None or len(arr) == 0:
                continue
            votes = np.zeros(64, dtype=np.int64)
            shifts = np.arange(64, dtype=np.uint64)
            for tok in set(arr):
                h = np.uint64(
                    int.from_bytes(hashlib.md5(tok.encode()).digest()[:8], "big")
                )
                bits = ((h >> shifts) & np.uint64(1)).astype(np.int64)
                votes += 2 * bits - 1
            sig = np.uint64(0)
            for j in range(64):
                if votes[j] > 0:
                    sig |= np.uint64(1) << np.uint64(j)
            out[i] = np.int64(sig.astype(np.int64))
        return pd.Series(out)

    t = _tok(docs)
    return t.select("doc_id", _simhash(F.col("toks")).alias("simhash"))


def simhash_near_dup_pairs(
    docs: DataFrame, max_hamming: int = 8
) -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance ≤ max_hamming.

    Candidate generation by 16-bit band equi-join (4 bands; any pair
    within Hamming ≤ 3·16 shares ≥1 exact band by pigeonhole for
    distance < 4 bands), then exact popcount verification — the
    standard scalable SimHash join, no cross product.
    """
    sig = simhash64(docs)
    bands = sig.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band"),
                        F.shiftrightunsigned("simhash", 16 * i)
                        .bitwiseAND(F.lit(0xFFFF))
                        .alias("val"),
                    )
                    for i in range(4)
                ]
            )
        ).alias("bv"),
    ).select("doc_id", "simhash", "bv.band", "bv.val")
    a, b = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.val") == F.col("b.val"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.simhash").alias("sig_a"),
            F.col("b.simhash").alias("sig_b"),
        )
        .distinct()
    )
    return (
        cand.withColumn(
            "hamming", F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b")))
        )
        .where(F.col("hamming") <= max_hamming)
        .select("doc_a", "doc_b", "hamming")
    )
