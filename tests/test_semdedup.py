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


# ---------------------------------------------------------------------
# int8 scalar quantization (round 3)
# ---------------------------------------------------------------------
import os

import pytest

EMB_PATH = os.environ.get(
    "SPARK_GRAFT_SF_DIR_TEST", "/root/testdata/sf0.001"
) + "/embeddings.parquet"


@pytest.fixture(scope="module")
def emb_path():
    return EMB_PATH


@pytest.fixture(scope="module")
def emb_df(spark, emb_path):
    return spark.read.parquet(emb_path)


def test_quantize_roundtrip_error_bound(spark, emb_df):
    import numpy as np

    from tlhop_library_spark.operators.similarity import (
        quantize_embeddings,
    )

    orig = {
        r["vec_id"]: np.array(r["embedding"], dtype=np.float64)
        for r in emb_df.collect()
    }
    qz = {
        r["vec_id"]: (r["scale"], np.array(r["q"], dtype=np.float64))
        for r in quantize_embeddings(emb_df).collect()
    }
    assert set(qz) == set(orig)
    for vid, (s, q) in qz.items():
        x = orig[vid]
        assert np.all(np.abs(q) <= 127)
        if s == 0.0:
            assert np.all(x == 0)
            continue
        # per-coordinate absolute error <= scale/2
        assert np.max(np.abs(q * s - x)) <= s / 2 + 1e-12


def test_quantized_cosine_close_to_exact(spark, emb_df):
    from tlhop_library_spark.operators.similarity import (
        cosine_topk,
        quantized_cosine_topk,
    )

    dim = len(emb_df.select("embedding").first()["embedding"])
    qv = [float((i * 37 % 19) - 9) / 10.0 for i in range(dim)]
    exact = cosine_topk(emb_df, qv, k=5).collect()
    quant = quantized_cosine_topk(emb_df, qv, k=5).collect()
    assert quant[0]["vec_id"] == exact[0]["vec_id"]
    by_id = {r["vec_id"]: r["cosine"] for r in quant}
    for r in exact:
        if r["vec_id"] in by_id:
            assert abs(by_id[r["vec_id"]] - r["cosine"]) < 0.02


def test_quantize_duckdb_oracle(spark, emb_df, emb_path):
    import duckdb

    from tlhop_library_spark.operators.similarity import (
        oracle_sql_quantize,
        quantize_embeddings,
    )

    got = sorted(
        (r["vec_id"], round(r["scale"], 10), tuple(r["q"]))
        for r in quantize_embeddings(emb_df).collect()
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM '{emb_path}'"
    )
    want = sorted(
        (v, round(s, 10), tuple(q))
        for v, s, q in con.execute(oracle_sql_quantize()).fetchall()
    )
    assert got == want
