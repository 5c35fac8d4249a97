"""Interleaved A/B/C: LP per-superstep aggregation kernels.

Round-4 verdict flagged LP's N->4N efficiency (0.52 trimmed) as the
weakest of the four north-rule programs relative to the same-session
shuffle control (0.68) — consistent with its superstep carrying TWO
~|E|-row exchanges in early rounds (see linkgraph/algos/labelprop.py
module docstring). The two single-exchange alternatives are "mode"
(deterministic F.mode collapses count+argmax into one ObjectHashAggregate)
and "repart" (explicit dst repartition makes both aggs partition-local).

Cross-session bench deltas on this VM are noise (host CPU steal), so the
only valid measurement is interleaved arms within ONE session: this runs
the three kernels alternately on the identical persisted bench graph,
VERIFIES all arms produce identical (id, label) results (the convention
is pinned — a faster kernel with different ties is a wrong kernel), and
prints per-arm runs + min/median.

Usage: python jobs/ab_lp_agg.py [--rounds 3] [--iters 3]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ARMS = ("two_level", "mode", "repart")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rounds", type=int, default=3, help="interleaved rounds")
    ap.add_argument("--iters", type=int, default=3, help="LP supersteps per run")
    ap.add_argument("--vertices", type=int, default=500_000)
    ap.add_argument("--edges", type=int, default=5_000_000)
    ap.add_argument("--cpus", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from linkgraph.algos import label_propagation
    from linkgraph.benchgen import gen_bench_edges
    from linkgraph.session import get_spark

    spark = get_spark(
        app_name="ab-lp-agg",
        master=f"local[{args.cpus}]",
        shuffle_partitions=2 * args.cpus,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    edges = gen_bench_edges(spark, args.vertices, args.edges).persist()
    n = edges.count()

    def checksum(state) -> tuple:
        # order-insensitive exact fingerprint of (id, label). xxhash64 in
        # decimal space, NOT id * 1_000_003 + label: under Spark 4's
        # default ANSI mode the multiply overflows long for large
        # --vertices runs and aborts the A/B (r5 ADVICE); the decimal sum
        # of full-range hashes is the repo-wide convention
        # (build.edge_fingerprint).
        row = state.select(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.xxhash64("id", "label").cast("decimal(38,0)"))
            .cast("string")
            .alias("h"),
        ).collect()[0]
        return (row["n"], row["h"])

    arms: dict[str, list[float]] = {a: [] for a in ARMS}
    sums: dict[str, tuple] = {}
    # warmup (JIT/page-cache) not attributed to any arm
    label_propagation(spark, edges, iters=args.iters, telemetry=False)
    for r in range(args.rounds):
        # rotate the arm order per round so monotone host drift (warming
        # page cache, CPU-steal phases) cancels instead of systematically
        # biasing the first-listed arm (r5 ADVICE)
        order = ARMS[r % len(ARMS):] + ARMS[: r % len(ARMS)]
        for name in order:
            t0 = time.monotonic()
            res = label_propagation(
                spark, edges, iters=args.iters, telemetry=False, agg=name
            )
            arms[name].append(round(time.monotonic() - t0, 3))
            if r == 0:
                sums[name] = checksum(res.state)

    if len(set(sums.values())) != 1:
        print(json.dumps({"ERROR": "arms disagree", "checksums": {k: list(v) for k, v in sums.items()}}))
        raise SystemExit(1)

    def stats(xs: list[float]) -> dict:
        s = sorted(xs)
        return {"runs": xs, "min": s[0], "median": s[len(s) // 2]}

    out = {"edges": n, "iters": args.iters, "results_equal": True}
    for name in ARMS:
        out[name] = stats(arms[name])
    base = out["two_level"]["min"]
    out["min_ratio_vs_two_level"] = {a: round(out[a]["min"] / base, 3) for a in ARMS}
    print(json.dumps(out))


if __name__ == "__main__":
    main()
