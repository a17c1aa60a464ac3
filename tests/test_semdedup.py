"""SemDeDup-style embedding dedup (operators/similarity.py:
semantic_cell_pairs / semantic_dedup)."""

import numpy as np

from tlhop_library_spark.operators import similarity


def _emb_df(spark, vecs):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in vecs],
        "vec_id long, embedding array<double>",
    )


def test_identical_vectors_collapse_to_min_id(spark):
    rng = np.random.default_rng(3)
    v = rng.standard_normal(16)
    noise = [(i, rng.standard_normal(16)) for i in range(5)]
    dups = [(10, v), (20, v), (30, v)]
    df = _emb_df(spark, noise + dups)
    pairs = {
        (r["vec_a"], r["vec_b"])
        for r in similarity.semantic_cell_pairs(
            df, threshold=0.99, n_centroids=4, dim=16, seed=11
        ).collect()
    }
    # identical vectors share the argmax cell by construction
    assert {(10, 20), (10, 30), (20, 30)} <= pairs
    keep = {
        r["vec_id"]
        for r in similarity.semantic_dedup(
            df, threshold=0.99, n_centroids=4, dim=16, seed=11
        ).collect()
    }
    assert 10 in keep and 20 not in keep and 30 not in keep
    assert {i for i, _ in noise} <= keep  # noise vectors untouched


def test_cell_pairs_subset_of_exact_pairs(spark):
    # the cell restriction may MISS cross-cell pairs but must never
    # invent one: every emitted pair is also an exact-matmul pair at
    # the same (rounded) threshold
    rng = np.random.default_rng(7)
    base = rng.standard_normal((6, 16))
    vecs = []
    for i in range(30):
        vecs.append((i, base[i % 6] + 0.25 * rng.standard_normal(16)))
    df = _emb_df(spark, vecs)
    cell = {
        (r["vec_a"], r["vec_b"], r["cosine"])
        for r in similarity.semantic_cell_pairs(
            df, threshold=0.8, n_centroids=4, dim=16, seed=11
        ).collect()
    }
    exact = {
        (r["vec_a"], r["vec_b"], r["cosine"])
        for r in similarity.embedding_near_dup_exact(
            df, threshold=0.8
        ).collect()
    }
    assert cell <= exact
    assert cell  # non-trivial on clustered data


def test_no_pairs_keeps_everything(spark):
    # orthogonal unit vectors: no cosine above threshold anywhere
    vecs = [(i, np.eye(8)[i % 8]) for i in range(8)]
    df = _emb_df(spark, vecs)
    assert (
        similarity.semantic_cell_pairs(
            df, threshold=0.5, n_centroids=4, dim=8, seed=11
        ).count()
        == 0
    )
    keep = similarity.semantic_dedup(
        df, threshold=0.5, n_centroids=4, dim=8, seed=11
    )
    assert keep.count() == 8
