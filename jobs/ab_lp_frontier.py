"""Interleaved A/B: LP frontier-restricted gather vs unrestricted.

The r6 frontier gather (labelprop.py) only engages once the per-round
changed fraction drops under the gate, so a 3-round run never exercises
it — this A/B runs LP to convergence length (default 20 rounds) on the
5M-edge bench graph, arms interleaved with per-round order rotation,
VERIFIES the arms produce identical (id, label) results, and reports
per-arm wall runs + the per-round changed counts (which rounds were
frontier-eligible is reproducible from them: changed <= gate * |V|).

Usage: python jobs/ab_lp_frontier.py [--rounds 3] [--iters 20]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--vertices", type=int, default=500_000)
    ap.add_argument("--edges", type=int, default=5_000_000)
    ap.add_argument("--gate", type=float, default=0.2)
    ap.add_argument("--cpus", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from linkgraph.algos import label_propagation
    from linkgraph.benchgen import gen_bench_edges
    from linkgraph.session import get_spark

    spark = get_spark(
        app_name="ab-lp-frontier",
        master=f"local[{args.cpus}]",
        shuffle_partitions=2 * args.cpus,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    edges = gen_bench_edges(spark, args.vertices, args.edges).persist()
    n = edges.count()

    def checksum(state) -> tuple:
        row = state.select(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.xxhash64("id", "label").cast("decimal(38,0)"))
            .cast("string")
            .alias("h"),
        ).collect()[0]
        return (row["n"], row["h"])

    ARMS = ("frontier", "full")
    runs: dict[str, list[float]] = {a: [] for a in ARMS}
    sums: dict[str, tuple] = {}
    changed: dict[str, list[int]] = {}
    label_propagation(spark, edges, iters=3)  # warmup
    for r in range(args.rounds):
        order = ARMS if r % 2 == 0 else tuple(reversed(ARMS))
        for name in order:
            t0 = time.monotonic()
            res = label_propagation(
                spark,
                edges,
                iters=args.iters,
                frontier=args.gate if name == "frontier" else None,
            )
            runs[name].append(round(time.monotonic() - t0, 3))
            if r == 0:
                sums[name] = checksum(res.state)
                changed[name] = [int(m.get("changed_labels") or 0) for m in res.metrics]

    out = {
        "edges": n,
        "iters": args.iters,
        "gate": args.gate,
        "results_equal": len(set(sums.values())) == 1,
        "changed_per_round": changed.get("frontier"),
        "changed_equal": changed.get("frontier") == changed.get("full"),
    }
    for name in ARMS:
        s = sorted(runs[name])
        out[name] = {"runs": runs[name], "min": s[0], "median": s[len(s) // 2]}
    out["min_ratio_frontier_vs_full"] = round(out["frontier"]["min"] / out["full"]["min"], 3)
    print(json.dumps(out))
    if not out["results_equal"]:
        raise SystemExit(1)


if __name__ == "__main__":
    main()
