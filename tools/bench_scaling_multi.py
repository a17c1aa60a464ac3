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


def wait_quiet(
    max_load: float = 0.5,
    interval: int = 60,
    timeout: int = 7200,
    settle: int = 2,
) -> float | None:
    """Block until the host is measurably quiet: 1-min loadavg ≤
    ``max_load`` on ``settle`` consecutive probes ``interval`` s apart
    (one low reading right after a heavy job ends is not yet quiet —
    round-3 forensics showed build-CPU inflation decaying over several
    minutes as the memory subsystem drains). Returns the final load, or
    None on timeout. This is the round-4 campaign gate: studies carry
    their measured pre-study load in the record, and contended windows
    are never entered instead of being explained after the fact."""
    import os

    deadline = time.time() + timeout
    streak = 0
    load = None
    while time.time() < deadline:
        load = os.getloadavg()[0]
        if load <= max_load:
            streak += 1
            if streak >= settle:
                return load
        else:
            streak = 0
        print(f"quiet-gate: load1={load:.2f} (need ≤{max_load} "
              f"x{settle}); waiting {interval}s", file=sys.stderr)
        time.sleep(interval)
    return None


def run_study(docs: int, runs: int, lo: int = 2,
              pre_load: float | None = None) -> dict:
    """One N-vs-4N study at parallelism pair (lo, 4*lo). The default
    2→8 pair is the primary criterion cell; 1→4 runs entirely below
    the host's bandwidth ceiling (extra headroom evidence) and 8→32
    crosses it (ceiling gradient)."""
    from tlhop_library_spark.corpus import write_corpus_parquet

    hi = 4 * lo
    workdir = tempfile.mkdtemp(prefix="tlhop_scale_", dir="/dev/shm")
    corpus = f"{workdir}/docs.parquet"
    write_corpus_parquet(corpus, n_docs=docs)
    res: dict[int, list[dict]] = {lo: [], hi: []}
    for r in range(runs):
        for n in (lo, hi):
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
    thr2 = [x["docs_per_sec"] for x in res[lo]]
    thr8 = [x["docs_per_sec"] for x in res[hi]]
    eff_runs = [round(b / (4.0 * a), 3) for a, b in zip(thr2, thr8)]

    def _lvl(rs: list[dict]) -> dict:
        out = {
            "docs_per_sec": [x["docs_per_sec"] for x in rs],
            "cpu_sec": [x["cpu_seconds_total"] for x in rs],
            "wall_sec": [x["task_seconds_total"] for x in rs],
        }
        # workload-v2 children additionally report the build-phase CPU
        # split + batched-query throughput; .get keeps old replays valid
        if rs and "cpu_seconds_build" in rs[0]:
            out["cpu_sec_build"] = [x["cpu_seconds_build"] for x in rs]
            out["wall_sec_build"] = [x["task_seconds_build"] for x in rs]
            out["queries_per_sec"] = [x["queries_per_sec"] for x in rs]
        return out

    record = {
        "t_wall": int(time.time()),
        "docs": docs,
        "runs": runs,
        "pre_load": pre_load,
        "pair": [lo, hi],
        "local2": _lvl(res[lo]),
        "local8": _lvl(res[hi]),
        "eff_median": round(
            statistics.median(thr8) / (4.0 * statistics.median(thr2)), 3
        ),
        "eff_per_run": eff_runs,
    }
    if "queries_per_sec" in record["local2"]:
        q2 = record["local2"]["queries_per_sec"]
        q8 = record["local8"]["queries_per_sec"]
        record["q_eff_median"] = round(
            statistics.median(q8) / (4.0 * statistics.median(q2)), 3
        )
        record["q_eff_per_run"] = [
            round(b / (4.0 * a), 3) for a, b in zip(q2, q8)
        ]
        record["workload"] = 2
    with open(OUT, "a") as f:
        f.write(json.dumps(record) + "\n")
    print(json.dumps(record))
    return record


def report() -> None:
    recs = [json.loads(x) for x in open(OUT)] if OUT.exists() else []
    if not recs:
        print("no studies recorded")
        return
    # distribution is over the PRIMARY 2→8 cell; other pairs (1→4,
    # 8→32) are listed in the table as gradient evidence
    prim = [r for r in recs if r.get("pair", [2, 8]) == [2, 8]]
    effs = [r["eff_median"] for r in prim]
    per_run = [e for r in prim for e in r["eff_per_run"]]
    effs_s = sorted(effs)
    print(f"studies: {len(recs)} total, {len(prim)} at the 2→8 cell")
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
    q_effs = [r["q_eff_median"] for r in prim if "q_eff_median" in r]
    if q_effs:
        qs = sorted(q_effs)
        print(
            f"batched-query throughput efficiency (n={len(qs)} studies): "
            f"min={qs[0]:.3f} median={statistics.median(qs):.3f} "
            f"max={qs[-1]:.3f}"
        )
    print()
    print("| study | when (unix) | pair | docs | N med docs/s | "
          "4N med docs/s | eff (median) | per-run eff | "
          "build cpu-sec N / 4N (med) | q-eff |")
    print("| --- | --- | --- | --- | --- | --- | --- | --- | --- | --- |")
    for i, r in enumerate(recs):
        lo, hi = r.get("pair", [2, 8])
        m2 = statistics.median(r["local2"]["docs_per_sec"])
        m8 = statistics.median(r["local8"]["docs_per_sec"])
        c2 = statistics.median(
            r["local2"].get("cpu_sec_build", r["local2"]["cpu_sec"])
        )
        c8 = statistics.median(
            r["local8"].get("cpu_sec_build", r["local8"]["cpu_sec"])
        )
        qe = f"{r['q_eff_median']:.3f}" if "q_eff_median" in r else "—"
        print(
            f"| {i + 1} | {r['t_wall']} | {lo}→{hi} | {r['docs']} | "
            f"{m2:.0f} | {m8:.0f} | "
            f"**{r['eff_median']:.3f}** | "
            f"{', '.join(f'{e:.2f}' for e in r['eff_per_run'])} | "
            f"{c2:.0f} / {c8:.0f} | {qe} |"
        )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=300_000)
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument(
        "--lo", type=int, default=2,
        help="low parallelism level N of the N-vs-4N pair (2 is the "
        "primary criterion cell; 1 stays below the bandwidth ceiling, "
        "8 crosses it)",
    )
    ap.add_argument("--report", action="store_true")
    ap.add_argument(
        "--quiet-gate", type=float, default=None, metavar="MAX_LOAD",
        help="block until 1-min loadavg ≤ MAX_LOAD on consecutive "
        "probes before starting; abort (exit 3) on gate timeout",
    )
    ap.add_argument("--gate-timeout", type=int, default=7200)
    ap.add_argument(
        "--studies", type=int, default=1,
        help="number of gated studies to run back-to-back (each "
        "re-waits for the gate)",
    )
    args = ap.parse_args()
    if args.report:
        report()
        return
    for _ in range(args.studies):
        load = None
        if args.quiet_gate is not None:
            load = wait_quiet(args.quiet_gate, timeout=args.gate_timeout)
            if load is None:
                print("quiet-gate: timeout — not running in a contended "
                      "window", file=sys.stderr)
                sys.exit(3)
        run_study(args.docs, args.runs, lo=args.lo, pre_load=load)


if __name__ == "__main__":
    main()
