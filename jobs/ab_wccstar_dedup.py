"""Interleaved A/B: wcc_star's intermediate large-star distinct.

Question (round 4): is the per-round `distinct()` between large-star and
small-star worth its shuffle, or do the duplicate rows it removes cost
less than the extra exchange? Cross-session bench deltas on this VM are
noise (BENCH/BASELINE.md "Build-stage regression"), so the comparison is
interleaved A/B/A/B in ONE session on the bench.py graph (|V|=500k,
|E|=5M power-law), equality of results asserted each arm.

Usage: python jobs/ab_wccstar_dedup.py [--repeats 2]
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
    ap.add_argument("--vertices", type=int, default=500_000)
    ap.add_argument("--edges", type=int, default=5_000_000)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from linkgraph.algos import wcc_star
    from linkgraph.benchgen import gen_bench_edges
    from linkgraph.session import get_spark

    spark = get_spark(
        app_name="ab-wccstar-dedup",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    edges = gen_bench_edges(spark, args.vertices, args.edges).persist()
    edges.count()

    def comp_checksum(res) -> str:
        return res.state.agg(
            F.sum(F.xxhash64("id", "comp").cast("decimal(38,0)")).cast("string")
        ).first()[0]

    times: dict[bool, list[float]] = {True: [], False: []}
    sums: set[str] = set()
    # warm-up arm (JIT/codegen), result discarded
    wcc_star(spark, edges, dedup_intermediate=True)
    for _ in range(args.repeats):
        for dedup in (True, False):
            t0 = time.monotonic()
            res = wcc_star(spark, edges, dedup_intermediate=dedup)
            dt = time.monotonic() - t0
            times[dedup].append(round(dt, 3))
            sums.add(comp_checksum(res))
    assert len(sums) == 1, f"arms disagree: {sums}"
    print(
        json.dumps(
            {
                "vertices": args.vertices,
                "edges": args.edges,
                "dedup_true_sec": times[True],
                "dedup_false_sec": times[False],
                "min_true": min(times[True]),
                "min_false": min(times[False]),
                "results_equal": True,
            }
        )
    )


if __name__ == "__main__":
    main()
