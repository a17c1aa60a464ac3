"""Persisted + sharded PQ/IVFADC code store (operators/pq_store.py):
store topk ≡ in-memory residual IVFADC, federated topk ≡ single
store, partition pruning at the parquet scan, lineage manifest,
codebook-compatibility guard, and the DuckDB oracle."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from tlhop_library_spark.operators.pq import (
    deterministic_codebooks,
    ivf_pq_topk_residual,
    oracle_sql_ivf_pq_topk_residual,
    pq_encode_residual,
)
from tlhop_library_spark.operators.pq_store import (
    PQStoreReader,
    ShardedPQStoreReader,
    write_pq_store,
)

SF_EMB = "/root/testdata/sf0.001/embeddings.parquet"

CB = deterministic_codebooks(64, 4, 8, seed=7)
COARSE = np.random.default_rng(29).standard_normal((8, 64)).round(6)
QV = np.random.default_rng(11).standard_normal(64).round(6)


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(SF_EMB)


@pytest.fixture(scope="module")
def store(spark, emb, tmp_path_factory):
    p = str(tmp_path_factory.mktemp("pqstore") / "s")
    man = write_pq_store(emb, p, CB, COARSE)
    return p, man


@pytest.fixture(scope="module")
def shards(spark, emb, tmp_path_factory):
    base = tmp_path_factory.mktemp("pqshards")
    paths = []
    for i in range(2):
        p = str(base / f"shard{i}")
        write_pq_store(
            emb.where(F.col("vec_id") % 2 == i), p, CB, COARSE
        )
        paths.append(p)
    return paths


def test_store_topk_equals_inmemory_residual_ivfadc(spark, emb, store):
    p, _ = store
    r = PQStoreReader(spark, p)
    got = [tuple(x) for x in r.topk(QV, k=10, n_probe=4).collect()]
    enc = pq_encode_residual(emb, CB, COARSE)
    want = [
        tuple(x)
        for x in ivf_pq_topk_residual(
            enc, CB, COARSE, QV, k=10, n_probe=4
        ).collect()
    ]
    assert got == want and len(got) == 10


def test_sharded_topk_identical_to_single_store(spark, store, shards):
    p, _ = store
    single = [
        tuple(x)
        for x in PQStoreReader(spark, p)
        .topk(QV, k=10, n_probe=4)
        .collect()
    ]
    fed = [
        tuple(x)
        for x in ShardedPQStoreReader(spark, shards)
        .topk(QV, k=10, n_probe=4)
        .collect()
    ]
    assert fed == single


def test_store_scan_is_partition_pruned(spark, store):
    """The probed-cell filter must reach the parquet scan as a
    partition filter — at 10^12 vectors this is the difference
    between reading n_probe/n_cells of the code store and all of
    it."""
    p, _ = store
    r = PQStoreReader(spark, p)
    plan = r.topk(QV, k=10, n_probe=2)._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    assert "cell" in plan.split("PartitionFilters", 1)[1][:200]


def test_manifest_lineage(spark, emb, store, shards):
    p, man = store
    n = emb.count()
    assert man["n_vectors"] == n
    assert sum(c["rows"] for c in man["cells"].values()) == n
    assert all(c["bytes"] > 0 for c in man["cells"].values())
    assert man["skew_ratio"] >= 1.0
    merged = ShardedPQStoreReader(spark, shards).manifest()
    assert merged["n_vectors"] == n
    assert merged["n_shards"] == 2
    single_cells = {k: v["rows"] for k, v in man["cells"].items()}
    merged_cells = {k: v["rows"] for k, v in merged["cells"].items()}
    assert merged_cells == single_cells


def test_incompatible_codebooks_raise(spark, emb, shards, tmp_path_factory):
    other = str(tmp_path_factory.mktemp("pqother") / "s")
    write_pq_store(
        emb, other, deterministic_codebooks(64, 4, 8, seed=99), COARSE
    )
    with pytest.raises(ValueError, match="different codebooks"):
        ShardedPQStoreReader(spark, [shards[0], other])


def test_store_topk_duckdb_oracle(spark, store):
    import duckdb

    p, _ = store
    got = [
        (x["rank"], x["vec_id"], round(x["adc_dist"], 4))
        for x in PQStoreReader(spark, p)
        .topk(QV, k=10, n_probe=4)
        .collect()
    ]
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM '{SF_EMB}'"
    )
    want = [
        (r[0], r[1], round(r[2], 4))
        for r in con.execute(
            oracle_sql_ivf_pq_topk_residual(
                CB, COARSE, QV, n_probe=4, topk=10
            )
        ).fetchall()
    ]
    assert got == want


def test_cli_pqstore_roundtrip(spark, tmp_path, capsys):
    """pqstore-build trains + writes N shards; pqstore-query
    federates them — end-to-end through the CLI entry point."""
    import json

    from tlhop_library_spark.__main__ import main

    out = str(tmp_path / "cli")
    rc = main([
        "pqstore-build", "--embeddings", SF_EMB, "--out", out,
        "--m", "4", "--k", "8", "--cells", "8", "--shard-mod", "2",
        "--sample-n", "200",
    ])
    assert rc == 0
    built = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert len(built["shards"]) == 2
    assert sum(s["n_vectors"] for s in built["shards"]) == 500
    qv = ",".join(str(round(float(x), 6)) for x in QV)
    rc = main([
        "pqstore-query", "--store", f"{out}/shard0",
        "--store", f"{out}/shard1", "--qvec", qv,
        "--k", "5", "--n-probe", "4",
    ])
    assert rc == 0
    rows = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert [r["rank"] for r in rows] == [1, 2, 3, 4, 5]
    assert rows == sorted(rows, key=lambda r: (r["adc_dist"], r["vec_id"]))
