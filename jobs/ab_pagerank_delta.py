"""Interleaved A/B: delta/frontier PageRank vs full power iteration.

Question (round 5): what does the V4 delta kernel (push-the-change,
frontier-restricted gather — FlashGraph's activation model) buy on the
convergence TAIL versus the V1 sql kernel, at matched stopping bands?
Both arms run to their natural stop on the bench graph (|V|=500k,
|E|=5M power-law): V1 stops on max|Δr| < eps, V4 on an empty frontier
(no |Δ| above θ), with eps = θ so the bands match. Arms are asserted
equal on RELATIVE rank error within θ·R/(1-d) (R = rounds) — the
kernel's dropped-mass bound (pagerank_delta docstring): on a hub-heavy
power-law graph the ABSOLUTE gap concentrates on high-in-degree hubs
(first run of this job measured max|Δ|=0.033 on a hub at θ=1e-6 —
exactly the indeg-scaled term the bound predicts), while relative error
stays uniformly bounded.

Cross-session deltas on this VM are noise (BENCH/BASELINE.md
"Build-stage regression"), so the comparison is interleaved A/B/A/B in
ONE session.

Usage: python jobs/ab_pagerank_delta.py [--repeats 2] [--eps 1e-6]
Prints one JSON line; the verdict is recorded in BENCH/BASELINE.md.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--repeats", type=int, default=2)
    ap.add_argument("--eps", type=float, default=1e-6)
    ap.add_argument("--vertices", type=int, default=500_000)
    ap.add_argument("--edges", type=int, default=5_000_000)
    args = ap.parse_args()

    import numpy as np
    from pyspark.sql import functions as F

    from linkgraph.algos import pagerank, pagerank_delta
    from linkgraph.benchgen import gen_bench_edges
    from linkgraph.session import get_spark

    spark = get_spark(
        app_name="ab-pagerank-delta",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    edges = gen_bench_edges(spark, args.vertices, args.edges).persist()
    edges.count()

    # warm-up arm (JIT/codegen), result discarded
    pagerank(spark, edges, eps=args.eps, max_iters=5)

    times: dict[str, list[float]] = {"power": [], "delta": [], "delta_sem": []}
    iters: dict[str, list[int]] = {"power": [], "delta": [], "delta_sem": []}
    active_series: list[int] = []
    for _ in range(args.repeats):
        t0 = time.monotonic()
        rp = pagerank(spark, edges, eps=args.eps, max_iters=500)
        ap_pdf = rp.state.select("id", "rank").toPandas().set_index("id").sort_index()
        times["power"].append(round(time.monotonic() - t0, 3))
        iters["power"].append(rp.iterations)

        t0 = time.monotonic()
        rd = pagerank_delta(spark, edges, threshold=args.eps, max_iters=500)
        bd_pdf = rd.state.select("id", "rank").toPandas().set_index("id").sort_index()
        times["delta"].append(round(time.monotonic() - t0, 3))
        iters["delta"].append(rd.iterations)
        active_series = [
            int(m["active"]) for m in rd.metrics if m.get("active") is not None
        ]

        t0 = time.monotonic()
        rs = pagerank_delta(
            spark, edges, threshold=args.eps, max_iters=500, kernel="sem"
        )
        sd_pdf = rs.state.select("id", "rank").toPandas().set_index("id").sort_index()
        times["delta_sem"].append(round(time.monotonic() - t0, 3))
        iters["delta_sem"].append(rs.iterations)
        # deactivation is a θ-boundary decision on fp sums, so the two
        # delta arms can legitimately differ by the same dropped-mass
        # bound as delta-vs-power — compare RELATIVE, same formula
        sem_sql_gap = float(
            (np.abs(sd_pdf["rank"] - bd_pdf["rank"]) / bd_pdf["rank"]).max()
        )
        sem_bound = args.eps * max(rs.iterations, rd.iterations) / 0.15
        assert sem_sql_gap < 2 * sem_bound, (
            f"sem vs sql delta arms diverged: rel={sem_sql_gap} vs {sem_bound}"
        )

        abs_diff = float(np.abs(ap_pdf["rank"] - bd_pdf["rank"]).max())
        rel_diff = float(
            (np.abs(ap_pdf["rank"] - bd_pdf["rank"]) / ap_pdf["rank"]).max()
        )
        rounds = max(rp.iterations, rd.iterations)
        rel_bound = args.eps * rounds / (1.0 - 0.85)
        assert rel_diff < 2 * rel_bound, (
            f"arms diverged beyond the dropped-mass bound: rel={rel_diff} "
            f"vs bound {rel_bound}"
        )

    out = {
        "metric": "pagerank delta-frontier vs power-iteration, matched bands",
        "eps": args.eps,
        "vertices": args.vertices,
        "edges": args.edges,
        "power_runs_s": times["power"],
        "delta_runs_s": times["delta"],
        "delta_sem_runs_s": times["delta_sem"],
        "power_iters": iters["power"][-1],
        "delta_iters": iters["delta"][-1],
        "delta_sem_iters": iters["delta_sem"][-1],
        "power_min_s": min(times["power"]),
        "delta_min_s": min(times["delta"]),
        "delta_sem_min_s": min(times["delta_sem"]),
        "speedup_min": round(min(times["power"]) / min(times["delta"]), 3),
        "max_abs_diff": abs_diff,
        "sem_sql_rel_gap": sem_sql_gap,
        "max_rel_diff": rel_diff,
        "rel_bound": rel_bound,
        "frontier_head": active_series[:3],
        "frontier_tail": active_series[-5:],
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
