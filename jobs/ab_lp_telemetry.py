"""Interleaved A/B: does LP's per-round telemetry action explain the
round-3 lp_3iter bench regression (10.6s -> 15.5s)?

Round-3's change added ``make_changed_stop(stop_on_zero=False)`` as an
always-on per-superstep telemetry action (one extra Spark job per round:
sum of the boolean ``changed`` column over the localCheckpoint'd state).
Cross-session bench deltas on this VM are noise (host CPU steal), so the
only valid measurement is interleaved arms within ONE session — this
script runs telemetry=True / telemetry=False alternately on the identical
persisted bench graph and prints per-arm runs + min/median.

Usage: python jobs/ab_lp_telemetry.py [--rounds 3] [--iters 3]
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
    ap.add_argument("--rounds", type=int, default=3, help="A/B pairs to run")
    ap.add_argument("--iters", type=int, default=3, help="LP supersteps per run")
    ap.add_argument("--vertices", type=int, default=500_000)
    ap.add_argument("--edges", type=int, default=5_000_000)
    ap.add_argument("--cpus", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    args = ap.parse_args()

    from linkgraph.algos import label_propagation
    from linkgraph.benchgen import gen_bench_edges
    from linkgraph.session import get_spark

    spark = get_spark(
        app_name="ab-lp-telemetry",
        master=f"local[{args.cpus}]",
        shuffle_partitions=2 * args.cpus,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    edges = gen_bench_edges(spark, args.vertices, args.edges).persist()
    n = edges.count()

    arms: dict[str, list[float]] = {"telemetry_on": [], "telemetry_off": []}
    # warmup run (JIT/shuffle-service/page-cache) not attributed to either arm
    label_propagation(spark, edges, iters=args.iters, telemetry=False)
    for _ in range(args.rounds):
        for name, flag in (("telemetry_on", True), ("telemetry_off", False)):
            t0 = time.monotonic()
            label_propagation(spark, edges, iters=args.iters, telemetry=flag)
            arms[name].append(round(time.monotonic() - t0, 3))

    def stats(xs: list[float]) -> dict:
        s = sorted(xs)
        return {"runs": xs, "min": s[0], "median": s[len(s) // 2]}

    on, off = stats(arms["telemetry_on"]), stats(arms["telemetry_off"])
    print(json.dumps({
        "edges": n,
        "iters": args.iters,
        "telemetry_on": on,
        "telemetry_off": off,
        "min_ratio_on_over_off": round(on["min"] / off["min"], 3),
    }))


if __name__ == "__main__":
    main()
