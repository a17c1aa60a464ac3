"""N-vs-4N scaling study (sandbox stand-in for two cluster sizes).

Runs the SAME index build + query workload at local[8] and local[32]
on the SAME deterministic corpus, each in a fresh subprocess (own JVM),
median of `--runs` runs after a warmup, and writes the throughputs +
scaling efficiency into BENCH.md.

Efficiency definition (BASELINE.md): eff = throughput_32 / (4 × throughput_8).
North rule requires eff ≥ 0.8 ... note that a *perfectly* scaling job
has eff = 1.0; eff is also capped by the machine actually having 32
physical cores available.
"""

from __future__ import annotations

import argparse
import json
import statistics
import subprocess
import sys
import tempfile
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

CHILD = r"""
import json, os, shutil, sys, time
sys.path.insert(0, {repo!r})
from tlhop_library_spark.session import get_spark
from tlhop_library_spark.index import build_index, IndexReader

n = int(sys.argv[1]); corpus = sys.argv[2]; workdir = sys.argv[3]
spark = get_spark("scale", master=f"local[{{n}}]", shuffle_partitions=max(2*n, 16))
spark.sparkContext.setLogLevel("ERROR")
docs = spark.read.parquet(corpus)
docs.count()  # warm FS cache / JIT before timing
idx = os.path.join(workdir, f"idx_{{n}}")
shutil.rmtree(idx, ignore_errors=True)
t0 = time.time()
stats = build_index(spark, docs, idx, n_jobs=2)
build_sec = time.time() - t0
reader = IndexReader(spark, idx)
reader.search("warmup", 10).collect()
qs = [("bace cada", 10), ("informação segurança", 10),
      ("dadu cadi bace", 10), ("tesa", 10), ("bace cada dade lano", 20)]
lat = []
for q, k in qs:
    t0 = time.time(); reader.search(q, k).collect(); lat.append(time.time() - t0)
lat.sort()
print("RESULT " + json.dumps({{
    "cores": n, "build_sec": build_sec,
    "docs_per_sec": stats["n_docs"] / build_sec,
    "query_p50_sec": lat[len(lat)//2],
    "n_docs": stats["n_docs"],
}}))
"""


def run_once(n_cores: int, corpus: str, workdir: str) -> dict:
    script = CHILD.format(repo=str(REPO))
    out = subprocess.run(
        [sys.executable, "-c", script, str(n_cores), corpus, workdir],
        capture_output=True, text=True, timeout=1800,
    )
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(
        f"child failed (cores={n_cores}):\n{out.stdout[-2000:]}\n{out.stderr[-2000:]}"
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=200_000)
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--out", default=str(REPO / "BENCH.md"))
    args = ap.parse_args()

    from tlhop_library_spark.corpus import write_corpus_parquet

    workdir = tempfile.mkdtemp(prefix="tlhop_scale_")
    corpus = f"{workdir}/docs.parquet"
    print(f"generating {args.docs} docs ...", file=sys.stderr)
    write_corpus_parquet(corpus, n_docs=args.docs)

    results: dict[int, list[dict]] = {8: [], 32: []}
    for r in range(args.runs):
        for n in (8, 32):
            res = run_once(n, corpus, workdir)
            results[n].append(res)
            print(
                f"run {r+1}/{args.runs} local[{n}]: "
                f"{res['docs_per_sec']:.0f} docs/sec, "
                f"p50={res['query_p50_sec']:.2f}s",
                file=sys.stderr,
            )

    med8 = statistics.median(x["docs_per_sec"] for x in results[8])
    med32 = statistics.median(x["docs_per_sec"] for x in results[32])
    p50_8 = statistics.median(x["query_p50_sec"] for x in results[8])
    p50_32 = statistics.median(x["query_p50_sec"] for x in results[32])
    eff = med32 / (4 * med8)

    lines = [
        "# BENCH — index-build throughput + BM25 query latency, N vs 4N scaling",
        "",
        f"Deterministic corpus: {args.docs} docs (seed=42), identical input for",
        "both parallelism levels; each cell is the median of "
        f"{args.runs} runs, fresh JVM per run; all runs listed below.",
        "",
        "| parallelism | build docs/sec (median) | query p50 (sec) |",
        "| --- | --- | --- |",
        f"| local[8]  (N)  | {med8:.0f} | {p50_8:.3f} |",
        f"| local[32] (4N) | {med32:.0f} | {p50_32:.3f} |",
        "",
        f"**Scaling efficiency** = throughput_4N / (4 × throughput_N) = "
        f"{med32:.0f} / (4 × {med8:.0f}) = **{eff:.3f}**",
        "",
        "All runs (docs/sec):",
        "",
        f"- local[8]: {[round(x['docs_per_sec'], 1) for x in results[8]]}",
        f"- local[32]: {[round(x['docs_per_sec'], 1) for x in results[32]]}",
        "",
        "Query p50 per run (sec):",
        "",
        f"- local[8]: {[round(x['query_p50_sec'], 3) for x in results[8]]}",
        f"- local[32]: {[round(x['query_p50_sec'], 3) for x in results[32]]}",
        "",
        "Note: this sandbox has one 32-core host; local[8] vs local[32] is the",
        "stand-in for N vs 4N executor clusters per the round instructions.",
        "Efficiency is capped by shared-JVM effects (GC, memory bandwidth) that",
        "a real multi-executor cluster does not share.",
    ]
    Path(args.out).write_text("\n".join(lines) + "\n")
    print("\n".join(lines))
    print(f"\nwrote {args.out}")


if __name__ == "__main__":
    main()
