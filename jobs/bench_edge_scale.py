"""Data-scale linearity evidence: throughput as the graph grows 16x.

The north rule's operating point is a 10^12-document crawl — far beyond
any single box — so what CAN be evidenced here is that per-core
throughput (edges traversed/sec) holds as |V|,|E| grow together at the
crawl's shape (|E| ~= 50|V|, power-law skew), i.e. that superstep cost is
O(|E|/cores) with no superlinear term (no per-superstep work that scales
with anything but the data, no accumulating driver state, no plan
regrowth). Combined with the 1->4 executor protocol (bench_cluster.py)
this is the sandbox decomposition of "runs at 10^12 documents on 1000
executors": per-executor throughput flat in data size x throughput scales
with executor count.

Levels run at FIXED local[32] parallelism and FIXED 64 partitions (2
waves), same estimators as the other protocols. Appends an "Edge-scale
linearity" section to BENCH/BASELINE.md.

Usage: python jobs/bench_edge_scale.py [--repeats 2] [--iters 10]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

LEVELS = [
    (250_000, 12_500_000),
    (1_000_000, 50_000_000),
    (4_000_000, 200_000_000),
]


def run_level(v: int, e: int, args, tries: int = 2) -> dict:
    env = dict(os.environ, SPARK_GRAFT_CPUS="32")
    env.pop("SPARK_GRAFT_MASTER", None)  # single-JVM local[32]
    cmd = [
        sys.executable, os.path.join(REPO, "jobs", "bench_pagerank.py"),
        "--vertices", str(v), "--edges", str(e),
        "--iters", str(args.iters), "--kernel", args.kernel,
        "--partitions", str(args.partitions),
    ]
    if args.kernel == "sem":
        # stable per-shape el2fg image: built by the first repeat, reused
        # after; the manifest activates the host-local compiled-block store
        # (same deployment model as the local-cluster protocol)
        cmd += [
            "--layout-dir",
            f"/tmp/lg_edgescale_sem_{v}_{e}_{args.partitions}",
        ]
    last_err = ""
    for attempt in range(tries):
        out = subprocess.run(cmd, env=env, capture_output=True, text=True, cwd=REPO)
        if out.returncode == 0:
            for line in reversed(out.stdout.strip().splitlines()):
                if line.startswith("{"):
                    return json.loads(line)
            last_err = "no JSON line in bench_pagerank stdout"
        else:
            # one retry: a transient failure at the 200M-edge level must not
            # discard the completed levels of a multi-hour protocol
            last_err = "\n".join(out.stderr.strip().splitlines()[-30:])
        print(f"run_level v={v} attempt {attempt + 1}/{tries} failed", flush=True)
    raise RuntimeError(
        f"bench_pagerank failed at |V|={v} after {tries} tries; stderr tail:\n{last_err}"
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--kernel", default="sql")
    ap.add_argument("--partitions", type=int, default=64)
    ap.add_argument("--repeats", type=int, default=2)
    ap.add_argument("--out", default=os.path.join(REPO, "BENCH", "BASELINE.md"))
    args = ap.parse_args()

    rows = []
    for v, e in LEVELS:
        runs = [run_level(v, e, args) for _ in range(args.repeats)]
        best = min(runs, key=lambda r: r["steady_sec_per_iter"])
        best["_repeats_min"] = [r["steady_sec_per_iter"] for r in runs]
        rows.append(best)
        print(f"[{args.kernel}] |V|={v:,} |E|~{best['n_edges']:,} "
              f"min={best['steady_sec_per_iter']}s/iter "
              f"edges/sec={best['edges_per_sec']:,.0f}", flush=True)

    base = rows[0]["edges_per_sec"]
    lines = [
        "",
        "## Edge-scale linearity: throughput vs graph size (fixed parallelism)",
        "",
        "Same kernel, same local[32] parallelism, same 64 partitions; the",
        "graph grows 16x at the crawl shape (|E| ~= 50|V|, power-law dst",
        "skew). The claim under test: superstep cost is O(|E|/cores) — no",
        "superlinear term, no accumulating state — so per-box throughput",
        "(edges traversed/sec, min estimator) holds as data grows. This is",
        "the per-executor half of the 10^12-document argument; the",
        "executor-count half is the 1 -> 4 executor protocol above.",
        "",
        "| kernel | vertices | ~edges | min s/superstep | edges/sec (min) | vs smallest |",
        "| --- | --- | --- | --- | --- | --- |",
    ]
    for (v, _), r in zip(LEVELS, rows):
        rel = r["edges_per_sec"] / base
        lines.append(
            f"| {args.kernel} | {v:,} | {r['n_edges']:,} | "
            f"{r['steady_sec_per_iter']} | {r['edges_per_sec']:,.0f} | {rel:.2f}x |"
        )
    lines += ["", "Raw JSON:", "", "```json"]
    for r in rows:
        lines.append(json.dumps(r))
    lines += ["```", ""]
    with open(args.out, "a") as f:
        f.write("\n".join(lines))
    print(f"appended edge-scale section to {args.out}")


if __name__ == "__main__":
    main()
