"""Serve-path routing at the 10M-doc stress index (round-4 VERDICT
ask #4): run `search_serve` over the stress tool's df-band query
classes and report, per class, the route taken (driver-side local vs
distributed Spark job), the serve latency, and the batch
(`search_many_local`) throughput for the locally-served set.

The point at 10M docs: the distributed path pays a ~1.0-1.2 s Spark
job floor regardless of term df, which dominates p50 for tail/torso
queries whose postings are tiny; `search_serve`'s posting-volume
estimate (sum df x bytes/posting vs --max-local-bytes) routes those
driver-side while HEAD terms (df ~ 10^7, tens of MB of postings per
term) correctly fall back to the distributed scan.

Usage:
  python tools/bench_serve_10m.py --workdir /tmp/stress10m \
      [--max-local-bytes 67108864] [--cores 32]

Reads <workdir>/idx and <workdir>/stress_result.json (for the exact
query classes + dfs the stress run used); writes
<workdir>/serve_result.json and prints it.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", required=True)
    ap.add_argument("--max-local-bytes", type=int, default=64 << 20)
    ap.add_argument("--cores", type=int, default=32)
    args = ap.parse_args()

    from tlhop_library_spark.index import IndexReader
    from tlhop_library_spark.session import get_spark

    with open(os.path.join(args.workdir, "stress_result.json")) as f:
        stress = json.load(f)
    queries = {
        name: info["query"] for name, info in stress["queries"].items()
    }

    spark = get_spark(
        "serve10m", master=f"local[{args.cores}]",
        shuffle_partitions=args.cores,
    )
    spark.sparkContext.setLogLevel("ERROR")
    reader = IndexReader(
        spark, os.path.join(args.workdir, "idx")
    ).cache()
    bpp = reader._avg_bytes_per_posting()
    # warm both paths (first distributed query pays codegen/worker
    # spin-up; first local query pays dictionary/manifest open)
    reader.search(queries["torso1"], 10).collect()
    reader.search_local(queries["tail2"], 10).collect()

    out: dict = {"max_local_bytes": args.max_local_bytes,
                 "avg_bytes_per_posting": round(bpp, 3),
                 "load1": round(os.getloadavg()[0], 2),
                 "queries": {}}
    local_named = []
    for name, q in queries.items():
        info = reader.lookup_terms(sorted(set(q.split())))
        est = sum(df for (df, _, _) in info.values()) * bpp
        route = "local" if est <= args.max_local_bytes else "distributed"
        runs = []
        rows = []
        for _ in range(3):
            t0 = time.time()
            rows = reader.search_serve(
                q, 10, max_local_bytes=args.max_local_bytes
            ).collect()
            runs.append(time.time() - t0)
        med = sorted(runs)[1]
        # rank identity serve vs distributed (the contract)
        dist_rows = reader.search(q, 10).collect()
        identical = [
            (r["rank"], r["doc_id"], r["score"]) for r in rows
        ] == [
            (r["rank"], r["doc_id"], r["score"]) for r in dist_rows
        ]
        out["queries"][name] = {
            "query": q,
            "route": route,
            "est_mb": round(est / (1 << 20), 2),
            "sec": round(med, 3),
            "samples": [round(x, 3) for x in runs],
            "rank_identical_to_distributed": identical,
        }
        if route == "local":
            local_named.append((name, q))
    lat = sorted(v["sec"] for v in out["queries"].values())
    out["serve_p50_sec"] = lat[len(lat) // 2]
    out["routing"] = {
        "local": sum(
            1 for v in out["queries"].values() if v["route"] == "local"
        ),
        "distributed": sum(
            1 for v in out["queries"].values()
            if v["route"] == "distributed"
        ),
    }

    # batch serving over the locally-routable classes
    if local_named:
        batch = [(i, q, 10) for i, (_, q) in enumerate(local_named)]
        t0 = time.time()
        n = len(reader.search_many_local(batch).collect())
        dt = time.time() - t0
        out["batch_local"] = {
            "queries": len(batch),
            "sec": round(dt, 3),
            "q_per_sec": round(len(batch) / dt, 1),
        }

    path = os.path.join(args.workdir, "serve_result.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print(json.dumps(out, indent=1, sort_keys=True))


if __name__ == "__main__":
    main()
