"""Interleaved A/B: triangle closure — wedge-row join vs packed array_intersect.

Question (round 5): the tc kernel is the weakest N->4N scaler (0.45
efficiency, 0.66x the session's shuffle control — BENCH/BASELINE.md),
attributed to the O(wedges) row intermediate four JVMs hash on one DRAM
interface. The ``adj`` kernel keeps the same candidate set packed in
sorted long arrays intersected JVM-side (array_intersect), trading
per-row shuffle/hash overhead for duplicated adjacency payloads. Same
degree-ordered orientation in both arms; per-vertex counts asserted
equal (checksummed) every arm.

Cross-session bench deltas on this VM are noise, so the comparison is
interleaved A/B/A/B in ONE session on the bench.py-style graph.

Usage: python jobs/ab_triangles_adj.py [--repeats 2]
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
    ap.add_argument("--vertices", type=int, default=1_000_000)
    ap.add_argument("--edges", type=int, default=2_000_000)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from linkgraph.algos import triangle_counts
    from linkgraph.benchgen import gen_bench_edges
    from linkgraph.session import get_spark

    spark = get_spark(
        app_name="ab-triangles-adj",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    edges = gen_bench_edges(spark, args.vertices, args.edges).persist()
    edges.count()

    def tri_checksum(df) -> str:
        return df.agg(
            F.sum(F.xxhash64("id", "tri").cast("decimal(38,0)")).cast("string")
        ).first()[0]

    times: dict[str, list[float]] = {"wedge": [], "adj": []}
    sums: set[str] = set()
    # warm-up arm (JIT/codegen), result discarded
    triangle_counts(spark, edges, kernel="wedge").count()
    for _ in range(args.repeats):
        for kernel in ("wedge", "adj"):
            t0 = time.monotonic()
            res = triangle_counts(spark, edges, kernel=kernel)
            cs = tri_checksum(res)
            dt = time.monotonic() - t0
            times[kernel].append(round(dt, 3))
            sums.add(cs)
    assert len(sums) == 1, f"arms disagree: {sums}"
    print(
        json.dumps(
            {
                "vertices": args.vertices,
                "edges": args.edges,
                "wedge_sec": times["wedge"],
                "adj_sec": times["adj"],
                "min_wedge": min(times["wedge"]),
                "min_adj": min(times["adj"]),
                "results_equal": True,
            }
        )
    )


if __name__ == "__main__":
    main()
