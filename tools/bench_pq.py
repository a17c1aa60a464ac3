"""PQ / ADC / IVFADC stress probe — measured evidence for the
compression and read-path claims at a corpus the sandbox can hold
(default 1M × 64-dim vectors, clustered so recall is meaningful).

Reports, as one JSON line: encode throughput, code-store vs
float-store bytes, p50 latency of exact cosine vs ADC vs IVFADC over
the same queries, and recall@10 of both approximate paths against the
exact L2 ranking.

Usage: python tools/bench_pq.py [--vectors 1000000] [--m 8] [--k 256]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def gen_vectors(path: str, n: int, dim: int, n_clusters: int,
                seed: int = 3) -> None:
    """Clustered gaussian vectors written as parquet in chunks."""
    import pyarrow as pa
    import pyarrow.parquet as pq_pa

    rng = np.random.default_rng(seed)
    centers = rng.standard_normal((n_clusters, dim)) * 3.0
    schema = pa.schema([
        ("vec_id", pa.int64()),
        ("embedding", pa.list_(pa.float32())),
    ])
    writer = pq_pa.ParquetWriter(path, schema)
    chunk = 100_000
    for lo in range(0, n, chunk):
        hi = min(lo + chunk, n)
        cid = rng.integers(0, n_clusters, size=hi - lo)
        X = centers[cid] + rng.standard_normal((hi - lo, dim))
        writer.write_table(pa.table({
            "vec_id": pa.array(range(lo, hi), type=pa.int64()),
            "embedding": pa.array(
                [row for row in X.astype(np.float32)],
                type=pa.list_(pa.float32()),
            ),
        }, schema=schema))
    writer.close()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--vectors", type=int, default=1_000_000)
    ap.add_argument("--dim", type=int, default=64)
    ap.add_argument("--m", type=int, default=8)
    ap.add_argument("--k", type=int, default=256)
    ap.add_argument("--clusters", type=int, default=256)
    ap.add_argument("--queries", type=int, default=5)
    ap.add_argument("--shortlist", type=int, default=100)
    ap.add_argument("--cpus", type=int,
                    default=int(os.environ.get("SPARK_GRAFT_CPUS", 32)))
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from tlhop_library_spark.operators.pq import (
        ivf_pq_topk,
        ivf_pq_topk_residual,
        pq_encode,
        pq_encode_residual,
        pq_topk,
        pq_topk_rerank,
        rerank_exact,
        train_coarse,
        train_pq,
        train_pq_residual,
    )
    from tlhop_library_spark.operators.similarity import cosine_topk
    from tlhop_library_spark.session import get_spark

    work = tempfile.mkdtemp(prefix="pq_bench_")
    vec_path = os.path.join(work, "vectors.parquet")
    t0 = time.time()
    gen_vectors(vec_path, args.vectors, args.dim, args.clusters)
    gen_sec = time.time() - t0
    float_bytes = os.path.getsize(vec_path)

    spark = get_spark(
        "bench_pq", master=f"local[{args.cpus}]",
        shuffle_partitions=args.cpus,
    )
    emb = spark.read.parquet(vec_path)

    t0 = time.time()
    cb = train_pq(emb, m=args.m, k=args.k, iters=6, seed=7,
                  sample_n=10_000)
    train_sec = time.time() - t0

    codes_path = os.path.join(work, "codes.parquet")
    t0 = time.time()
    pq_encode(emb, cb).write.mode("overwrite").parquet(codes_path)
    encode_sec = time.time() - t0
    code_bytes = sum(
        f.stat().st_size for f in Path(codes_path).rglob("*.parquet")
    )
    enc = spark.read.parquet(codes_path)

    # deployment shape: cell assignment materialized once at ingest
    from tlhop_library_spark.operators.similarity import ivf_assign

    # residual IVFADC (the actual Jégou pipeline): coarse cell
    # absorbs cluster structure, PQ bits encode the residual
    t0 = time.time()
    coarse = train_coarse(emb, n_centroids=args.clusters, iters=8,
                          seed=23, sample_n=10_000)
    rcb = train_pq_residual(emb, coarse, m=args.m, k=args.k,
                            iters=6, seed=7, sample_n=10_000)
    rtrain_sec = time.time() - t0
    rcodes_path = os.path.join(work, "rcodes.parquet")
    t0 = time.time()
    pq_encode_residual(emb, rcb, coarse).write.mode(
        "overwrite"
    ).parquet(rcodes_path)
    rencode_sec = time.time() - t0
    renc = spark.read.parquet(rcodes_path)

    cells_path = os.path.join(work, "cells.parquet")
    t0 = time.time()
    ivf_assign(emb, 64, args.dim, 11).write.mode(
        "overwrite"
    ).parquet(cells_path)
    assign_sec = time.time() - t0
    cells = spark.read.parquet(cells_path)

    # exact L2 reference, one in-memory pass (float32, n x dim)
    import pyarrow.parquet as pq_pa

    tbl = pq_pa.read_table(vec_path)
    E = np.array(
        [np.asarray(v) for v in tbl["embedding"].to_pylist()],
        dtype=np.float32,
    )
    ids_np = np.asarray(tbl["vec_id"].to_pylist(), dtype=np.int64)

    # queries from the data distribution (the ANN-benchmark norm):
    # actual vectors perturbed with small noise — an out-of-
    # distribution query near the origin has no meaningful NNs and
    # reads as recall 0 for ANY quantizer
    rng = np.random.default_rng(17)
    qidx = rng.integers(0, len(E), size=args.queries)
    centers_probe = (
        E[qidx].astype(np.float64)
        + 0.3 * rng.standard_normal((args.queries, args.dim))
    )
    exact_ms, adc_ms, ivf_ms, rr_ms, res_ms, resr_ms = \
        [], [], [], [], [], []
    adc_recall, ivf_recall, rr_recall, res_recall, resr_recall = \
        [], [], [], [], []
    # warm both paths once
    cosine_topk(emb, centers_probe[0].tolist(), 10).collect()
    pq_topk(enc, cb, centers_probe[0], 10).collect()
    for qv in centers_probe:
        t0 = time.time()
        ex = [r["vec_id"] for r in
              cosine_topk(emb, qv.tolist(), 10).collect()]
        exact_ms.append((time.time() - t0) * 1000)
        t0 = time.time()
        ad = [r["vec_id"] for r in pq_topk(enc, cb, qv, 10).collect()]
        adc_ms.append((time.time() - t0) * 1000)
        t0 = time.time()
        iv = [r["vec_id"] for r in
              ivf_pq_topk(emb, cb, qv, 10, n_centroids=64,
                          n_probe=8, encoded=enc,
                          cells=cells).collect()]
        ivf_ms.append((time.time() - t0) * 1000)
        t0 = time.time()
        rr = [r["vec_id"] for r in
              pq_topk_rerank(emb, enc, cb, qv, 10,
                             shortlist=args.shortlist).collect()]
        rr_ms.append((time.time() - t0) * 1000)
        t0 = time.time()
        rs = [r["vec_id"] for r in
              ivf_pq_topk_residual(renc, rcb, coarse, qv, 10,
                                   n_probe=8).collect()]
        res_ms.append((time.time() - t0) * 1000)
        t0 = time.time()
        rsr = [r["vec_id"] for r in rerank_exact(
            emb, ivf_pq_topk_residual(renc, rcb, coarse, qv,
                                      args.shortlist,
                                      n_probe=8), qv, 10).collect()]
        resr_ms.append((time.time() - t0) * 1000)
        # exact L2 reference (ADC approximates L2 distance)
        d2 = ((E - qv.astype(np.float32)[None]) ** 2).sum(axis=1)
        ex_l2 = set(ids_np[np.argsort(d2)][:10].tolist())
        adc_recall.append(len(set(ad) & ex_l2) / 10)
        ivf_recall.append(len(set(iv) & ex_l2) / 10)
        rr_recall.append(len(set(rr) & ex_l2) / 10)
        res_recall.append(len(set(rs) & ex_l2) / 10)
        resr_recall.append(len(set(rsr) & ex_l2) / 10)

    out = {
        "vectors": args.vectors,
        "shortlist": args.shortlist,
        "dim": args.dim,
        "m": args.m,
        "k": args.k,
        "gen_sec": round(gen_sec, 1),
        "train_sec": round(train_sec, 1),
        "encode_sec": round(encode_sec, 1),
        "encode_vecs_per_sec": round(args.vectors / encode_sec, 1),
        "cell_assign_sec": round(assign_sec, 1),
        "float_store_mb": round(float_bytes / 1e6, 1),
        "code_store_mb": round(code_bytes / 1e6, 1),
        "compression_x": round(float_bytes / code_bytes, 1),
        "exact_p50_ms": round(float(np.median(exact_ms)), 1),
        "adc_p50_ms": round(float(np.median(adc_ms)), 1),
        "ivfadc_p50_ms": round(float(np.median(ivf_ms)), 1),
        "adc_recall10_vs_l2": round(float(np.mean(adc_recall)), 3),
        "ivfadc_recall10_vs_l2": round(
            float(np.mean(ivf_recall)), 3
        ),
        "rerank_p50_ms": round(float(np.median(rr_ms)), 1),
        "rerank_recall10_vs_l2": round(
            float(np.mean(rr_recall)), 3
        ),
        "residual_train_sec": round(rtrain_sec, 1),
        "residual_encode_sec": round(rencode_sec, 1),
        "residual_ivfadc_p50_ms": round(float(np.median(res_ms)), 1),
        "residual_ivfadc_recall10_vs_l2": round(
            float(np.mean(res_recall)), 3
        ),
        "residual_rerank_p50_ms": round(
            float(np.median(resr_ms)), 1
        ),
        "residual_rerank_recall10_vs_l2": round(
            float(np.mean(resr_recall)), 3
        ),
    }
    print(json.dumps(out))
    spark.stop()
    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
