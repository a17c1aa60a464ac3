"""Repeated 2→8 scaling studies across separated host windows.

Round-2 verdict asked for the efficiency DISTRIBUTION, not single
studies: run the identical CPU-pinned local[2]-vs-local[8] study
(the sub-bandwidth-ceiling stand-in for the north rule's N-vs-4N
executor clusters) several times through the session and report
min / median / max over studies, plus the per-study JVM CPU-second
invariance that separates host tenancy from engine behavior.

Each invocation appends ONE study record to tools/scaling_studies.jsonl:

    {"study": k, "t_wall": <unix>, "docs": N, "runs": R,
     "local2": {"docs_per_sec": [..], "cpu_sec": [..], "wall_sec": [..]},
     "local8": {...}, "eff_median": e,
     "eff_per_run": [thr8_i/(4*thr2_i) ...]}

Run `python tools/bench_scaling_multi.py --report` to print the
distribution table for BENCH.md.

Reuses run_once from bench_scaling (spark-submit --py-files child,
taskset-pinned to exactly n cores, event-log CPU-second parsing).
"""

from __future__ import annotations

import argparse
import json
import statistics
import sys
import tempfile
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tools"))

from bench_scaling import run_once  # noqa: E402

OUT = REPO / "tools" / "scaling_studies.jsonl"


def run_study(docs: int, runs: int) -> dict:
    from tlhop_library_spark.corpus import write_corpus_parquet

    workdir = tempfile.mkdtemp(prefix="tlhop_scale_", dir="/dev/shm")
    corpus = f"{workdir}/docs.parquet"
    write_corpus_parquet(corpus, n_docs=docs)
    res: dict[int, list[dict]] = {2: [], 8: []}
    for r in range(runs):
        for n in (2, 8):
            x = run_once(n, corpus, workdir)
            res[n].append(x)
            print(
                f"run {r + 1}/{runs} local[{n}]: "
                f"{x['docs_per_sec']:.0f} docs/s "
                f"cpu={x['cpu_seconds_total']}s "
                f"wall={x['task_seconds_total']}s",
                file=sys.stderr,
            )
    import shutil

    shutil.rmtree(workdir, ignore_errors=True)
    thr2 = [x["docs_per_sec"] for x in res[2]]
    thr8 = [x["docs_per_sec"] for x in res[8]]
    eff_runs = [round(b / (4.0 * a), 3) for a, b in zip(thr2, thr8)]
    record = {
        "t_wall": int(time.time()),
        "docs": docs,
        "runs": runs,
        "local2": {
            "docs_per_sec": thr2,
            "cpu_sec": [x["cpu_seconds_total"] for x in res[2]],
            "wall_sec": [x["task_seconds_total"] for x in res[2]],
        },
        "local8": {
            "docs_per_sec": thr8,
            "cpu_sec": [x["cpu_seconds_total"] for x in res[8]],
            "wall_sec": [x["task_seconds_total"] for x in res[8]],
        },
        "eff_median": round(
            statistics.median(thr8) / (4.0 * statistics.median(thr2)), 3
        ),
        "eff_per_run": eff_runs,
    }
    with open(OUT, "a") as f:
        f.write(json.dumps(record) + "\n")
    print(json.dumps(record))
    return record


def report() -> None:
    recs = [json.loads(x) for x in open(OUT)] if OUT.exists() else []
    if not recs:
        print("no studies recorded")
        return
    effs = [r["eff_median"] for r in recs]
    per_run = [e for r in recs for e in r["eff_per_run"]]
    effs_s = sorted(effs)
    print(f"studies: {len(recs)}")
    print(
        f"study-median efficiency: min={effs_s[0]:.3f} "
        f"median={statistics.median(effs_s):.3f} max={effs_s[-1]:.3f}"
    )
    print(
        f"per-run pairs (n={len(per_run)}): "
        f"min={min(per_run):.3f} median={statistics.median(per_run):.3f} "
        f"max={max(per_run):.3f}; "
        f">=0.8 in {sum(1 for e in per_run if e >= 0.8)}/{len(per_run)}"
    )
    print()
    print("| study | when (unix) | local[2] med docs/s | local[8] med docs/s |"
          " eff (median) | per-run eff | cpu-sec 2 / 8 (med) |")
    print("| --- | --- | --- | --- | --- | --- | --- |")
    for i, r in enumerate(recs):
        m2 = statistics.median(r["local2"]["docs_per_sec"])
        m8 = statistics.median(r["local8"]["docs_per_sec"])
        c2 = statistics.median(r["local2"]["cpu_sec"])
        c8 = statistics.median(r["local8"]["cpu_sec"])
        print(
            f"| {i + 1} | {r['t_wall']} | {m2:.0f} | {m8:.0f} | "
            f"**{r['eff_median']:.3f}** | "
            f"{', '.join(f'{e:.2f}' for e in r['eff_per_run'])} | "
            f"{c2:.0f} / {c8:.0f} |"
        )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=300_000)
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--report", action="store_true")
    args = ap.parse_args()
    if args.report:
        report()
    else:
        run_study(args.docs, args.runs)


if __name__ == "__main__":
    main()
