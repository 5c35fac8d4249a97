"""Scaling-efficiency evidence runner (BASELINE.json north_rule).

The rule's acceptance is throughput scaling efficiency >= 0.8 between
cluster sizes N and 4N executors. No real cluster exists in this sandbox,
so (per the task brief) the evidence is the SAME PageRank job on the SAME
input at two parallelism levels: local[N] and local[4N] cores, reported as
throughput at both plus efficiency = (T_N / T_4N) / 4.

Each level runs in its own subprocess (fresh JVM — parallelism is fixed at
session start). A pure-compute control job (xxhash over spark.range) is
also run at both levels to document the host's own scaling ceiling
(frequency scaling / memory bandwidth on a shared VM), so the PageRank
number can be read against what the hardware permits.

Usage: python jobs/bench_scaling.py [--n 2] [--vertices 1000000]
       [--edges 20000000] [--iters 8] [--out BENCH/BASELINE.md]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_pagerank(cpus: int, args, kernel: str) -> dict:
    env = dict(os.environ, SPARK_GRAFT_CPUS=str(cpus))
    cmd = [
        sys.executable,
        os.path.join(REPO, "jobs", "bench_pagerank.py"),
        "--vertices", str(args.vertices),
        "--edges", str(args.edges),
        "--iters", str(args.iters),
        "--kernel", kernel,
    ]
    last_err = None
    for attempt in range(2):  # one retry: transient JVM/host failures happen
        out = subprocess.run(cmd, env=env, capture_output=True, text=True, cwd=REPO)
        if out.returncode == 0:
            return json.loads(out.stdout.strip().splitlines()[-1])
        err_lines = out.stderr.strip().splitlines()
        caused = [i for i, l in enumerate(err_lines) if "Caused by" in l or "Error" in l]
        start = max(0, (caused[0] - 5) if caused else len(err_lines) - 60)
        last_err = "\n".join(err_lines[start:start + 80])
        print(f"[{kernel} local[{cpus}]] attempt {attempt + 1} failed:\n{last_err}",
              file=sys.stderr, flush=True)
    raise RuntimeError(f"bench_pagerank failed twice ({kernel}, local[{cpus}])")


def run_cpu_control(cpus: int) -> float:
    """Pure-compute control: seconds for a fixed xxhash scan."""
    code = f"""
import time
from pyspark.sql import SparkSession, functions as F
spark = (SparkSession.builder.master("local[{cpus}]").appName("cpu-control")
    .config("spark.ui.enabled","false")
    .config("spark.driver.memory","8g")
    .config("spark.driver.extraJavaOptions","-XX:+UseParallelGC")
    .config("spark.ui.showConsoleProgress","false").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
expr = F.sum(F.pmod(F.xxhash64(F.col("id")+1), F.lit(1000)) + F.pmod(F.xxhash64(F.col("id")+2), F.lit(1000)))
spark.range(0, 10_000_000, numPartitions={cpus}*2).select(expr).collect()
t0=time.monotonic()
spark.range(0, 2_000_000_000, numPartitions={cpus}*2).select(expr).collect()
print(time.monotonic()-t0)
"""
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True, check=True
    )
    return float(out.stdout.strip().splitlines()[-1])


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=2, help="small parallelism N (big = 4N)")
    ap.add_argument("--vertices", type=int, default=1_000_000)
    ap.add_argument("--edges", type=int, default=20_000_000)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--kernels", default="sql,csr")
    ap.add_argument("--out", default=os.path.join(REPO, "BENCH", "BASELINE.md"))
    args = ap.parse_args()

    n, n4 = args.n, 4 * args.n
    results: dict[str, dict] = {}
    for kernel in args.kernels.split(","):
        lo = run_pagerank(n, args, kernel)
        hi = run_pagerank(n4, args, kernel)
        eff = (lo["steady_sec_per_iter"] / hi["steady_sec_per_iter"]) / 4.0
        results[kernel] = {"lo": lo, "hi": hi, "efficiency": round(eff, 3)}
        print(f"[{kernel}] local[{n}]={lo['steady_sec_per_iter']}s/iter "
              f"local[{n4}]={hi['steady_sec_per_iter']}s/iter eff={eff:.2f}", flush=True)

    cpu_lo = run_cpu_control(n)
    cpu_hi = run_cpu_control(n4)
    cpu_eff = (cpu_lo / cpu_hi) / 4.0
    print(f"[cpu-control] local[{n}]={cpu_lo:.2f}s local[{n4}]={cpu_hi:.2f}s eff={cpu_eff:.2f}")

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        f.write(render_md(n, n4, args, results, cpu_lo, cpu_hi, cpu_eff))
    print(f"wrote {args.out}")


def render_md(n, n4, args, results, cpu_lo, cpu_hi, cpu_eff) -> str:
    lines = [
        "# BENCH/BASELINE — measured PageRank throughput & scaling evidence",
        "",
        "North rule (BASELINE.json): throughput scaling efficiency >= 0.8 from",
        "N to 4N executors. Sandbox protocol (task brief): same job, same",
        "input, two parallelism levels; efficiency = (T_N / T_4N) / 4.",
        "",
        f"- Input: deterministic power-law digraph, |V|={args.vertices:,}, "
        f"~|E|={args.edges:,} (linkgraph/benchgen.py)",
        f"- Job: PageRank, {args.iters} supersteps, eps=0 (fixed work per iter);",
        "  steady-state sec/superstep = MIN after 2 warmup iterations (noise",
        "  floor: the sandbox VM shows bursty hypervisor CPU-steal stalls of",
        "  10-50 s on random supersteps — visible as outliers in the raw",
        "  per-iteration JSON below; each superstep does identical work, so",
        "  the minimum estimates true cost, same rationale as timeit)",
        f"- Host: 32 physical cores (1 thread/core), 125 GiB RAM, PySpark 4.1.2,",
        "  OpenJDK 17, tmpfs shuffle dirs; single-JVM local mode",
        "",
        "| kernel | config | sec/superstep | edges/sec | iters/hour |",
        "| --- | --- | --- | --- | --- |",
    ]
    for kernel, r in results.items():
        for side, label in (("lo", f"local[{n}]"), ("hi", f"local[{n4}]")):
            d = r[side]
            lines.append(
                f"| {kernel} | {label} | {d['steady_sec_per_iter']} | "
                f"{d['edges_per_sec']:,.0f} | {d['iters_per_hour']} |"
            )
    lines += ["", "## Scaling efficiency (N -> 4N)", ""]
    lines.append("| job | efficiency | meets >= 0.8? |")
    lines.append("| --- | --- | --- |")
    for kernel, r in results.items():
        ok = "YES" if r["efficiency"] >= 0.8 else "no"
        lines.append(f"| pagerank/{kernel} | {r['efficiency']} | {ok} |")
    lines.append(
        f"| pure-compute control (xxhash scan) | {cpu_eff:.2f} | "
        f"(host ceiling: {cpu_lo:.1f}s -> {cpu_hi:.1f}s) |"
    )
    lines += [
        "",
        "The pure-compute control documents the host's own scaling ceiling",
        "(shared VM; per-core frequency drops as more cores load). PageRank",
        "efficiency should be read against that ceiling: an efficiency equal",
        "to the control's means the engine adds no scaling bottleneck of its",
        "own. On a real multi-executor cluster each executor brings its own",
        "memory bandwidth and shuffle disks, which is the regime the >= 0.8",
        "criterion targets.",
        "",
        "Raw per-iteration JSON:",
        "",
        "```json",
    ]
    for kernel, r in results.items():
        lines.append(json.dumps({"kernel": kernel, **r}))
    lines += ["```", ""]
    return "\n".join(lines)


if __name__ == "__main__":
    main()
